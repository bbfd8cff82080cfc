"""Time-sharded generator inference matches single-device synthesis exactly
on the 8-device virtual CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ste_gan_tpu.infer import EMGSynthesizer
from ste_gan_tpu.models.generator import EMGGeneratorGanTTS
from ste_gan_tpu.parallel.mesh import create_mesh
from ste_gan_tpu.parallel.sequence_parallel import synthesize_time_sharded


@pytest.fixture(scope="module")
def small_gen():
    gen = EMGGeneratorGanTTS(num_sessions=4, channels=32)
    feats = jnp.zeros((1, 8, 256))
    ids = jnp.zeros((1,), jnp.int32)
    params = gen.init(jax.random.PRNGKey(0), feats, ids, ids)["params"]
    return gen, params


@pytest.mark.parametrize("frames", [512, 1000])  # 1000: round-up padding path
def test_matches_single_device(small_gen, rng, frames):
    gen, params = small_gen
    feats = rng.normal(size=(frames, 256)).astype(np.float32)
    want = EMGSynthesizer(gen, params).synthesize(feats, session_idx=2)

    mesh = create_mesh(8)
    got = synthesize_time_sharded(gen, params, feats, session_idx=2, mesh=mesh)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4)
