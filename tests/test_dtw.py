"""DTW kernel parity: JAX wavefront and native C++ vs the reference's
numba DP (run as pure python via the numba stub) and the numpy oracle."""
import numpy as np
import pytest

from ste_gan_tpu.ops.dtw import (
    align_from_distances, dtw_alignment, dtw_alignment_np, dtw_matrix,
    dtw_matrix_np)

from ref_loader import import_reference


@pytest.fixture(scope="module")
def ref_utils():
    return import_reference("ste_gan.emg_encoder.utils")


@pytest.mark.parametrize("shape", [(12, 17), (30, 30), (25, 60)])
def test_dtw_matrix_matches_reference(ref_utils, shape, rng):
    costs = rng.random(shape).astype(np.float32)
    want = ref_utils.time_warp(costs.astype(np.float64))
    got_jax = np.asarray(dtw_matrix(costs))
    got_np = dtw_matrix_np(costs)
    mask = np.isfinite(want)
    np.testing.assert_allclose(got_jax[mask], want[mask], rtol=1e-4)
    np.testing.assert_allclose(got_np[mask], want[mask], rtol=1e-6)
    assert np.all(np.isinf(got_jax[~mask]))


@pytest.mark.parametrize("shape", [(12, 17), (30, 30), (25, 60), (60, 25)])
def test_dtw_alignment_matches_reference(ref_utils, shape, rng):
    costs = rng.random(shape).astype(np.float32)
    want = ref_utils.align_from_distances(costs.astype(np.float64))
    got_jax = np.asarray(dtw_alignment(costs)).tolist()
    got_np = dtw_alignment_np(costs)
    assert got_np == list(want)
    assert got_jax == list(want)


def test_native_cpp_kernel_matches(ref_utils, rng):
    native = pytest.importorskip("ste_gan_tpu.native.dtw")
    costs = rng.random((40, 55)).astype(np.float32)
    want_matrix = ref_utils.time_warp(costs.astype(np.float64))
    got_matrix = native.dtw_matrix(costs)
    mask = np.isfinite(want_matrix)
    np.testing.assert_allclose(got_matrix[mask], want_matrix[mask], rtol=1e-4)

    want_align = list(ref_utils.align_from_distances(costs.astype(np.float64)))
    assert native.align_from_distances(costs) == want_align
    # The dispatching front-end picks the native kernel transparently.
    assert align_from_distances(costs) == want_align


def test_alignment_is_monotonic(rng):
    costs = rng.random((50, 70)).astype(np.float32)
    align = np.asarray(dtw_alignment(costs))
    assert np.all(np.diff(align[1:]) >= 0)
    assert align.min() >= 0 and align.max() <= 69
