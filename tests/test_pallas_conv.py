"""Correctness of the Pallas grouped-conv1d kernel (interpret mode on the
CPU mesh) against the XLA grouped conv it replaces — values AND gradients.

Covers the scale-discriminator geometries (reference:
ste_gan/models/discriminator.py:47-67,96-119) at reduced sizes plus edge
cases: stride 1/2/4, groups 1/4/16, non-divisible stride tails, and odd
output lengths (single-tile fallback).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ste_gan_tpu.ops.pallas_conv import (
    blockdiag_weights, grouped_conv1d, lax_grouped_conv1d)

CASES = [
    # (B, T, Cin, Cout, K, stride, pad, groups)  — scale-disc-like geometries
    (2, 64, 16, 32, 15, 1, 7, 1),     # dense k15 (layer 0 analogue)
    (2, 64, 32, 64, 9, 2, 4, 4),      # grouped s2 (layer 1 analogue)
    (2, 64, 32, 64, 9, 2, 4, 16),     # groups=16 (layer 2 analogue)
    (2, 64, 32, 64, 9, 4, 4, 8),      # stride 4 (full-variant layers)
    (1, 50, 16, 16, 5, 2, 2, 4),      # odd t_out (25) -> single tile
    (2, 64, 32, 256, 5, 1, 2, 2),     # og=128 -> R=1 (no block-diag)
]


@pytest.mark.parametrize("case", CASES)
def test_forward_matches_lax(case, rng):
    b, t, cin, cout, k, stride, pad, groups = case
    x = jnp.asarray(rng.normal(size=(b, t, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, cin // groups, cout)) * 0.1,
                    jnp.float32)
    bias = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    got = grouped_conv1d(x, w, bias, stride=stride, padding=(pad, pad),
                         groups=groups, interpret=True)
    want = lax_grouped_conv1d(x, w, bias, stride=stride, padding=(pad, pad),
                              groups=groups)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("case", CASES[:4])
def test_gradients_match_lax(case, rng):
    b, t, cin, cout, k, stride, pad, groups = case
    x = jnp.asarray(rng.normal(size=(b, t, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, cin // groups, cout)) * 0.1,
                    jnp.float32)
    # A non-trivial cotangent (squared loss) exercises dx and dw jointly.
    tgt = jnp.asarray(rng.normal(size=(b,)), jnp.float32)

    def loss(fn):
        def f(x_, w_):
            y = fn(x_, w_, None, stride=stride, padding=(pad, pad),
                   groups=groups)
            return jnp.sum(jnp.square(jnp.mean(y, axis=(1, 2)) - tgt))
        return f

    got_l, (got_dx, got_dw) = jax.value_and_grad(
        loss(lambda *a, **kw: grouped_conv1d(*a, interpret=True, **kw)),
        argnums=(0, 1))(x, w)
    want_l, (want_dx, want_dw) = jax.value_and_grad(
        loss(lax_grouped_conv1d), argnums=(0, 1))(x, w)

    np.testing.assert_allclose(float(got_l), float(want_l), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_dx), np.asarray(want_dx),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_dw), np.asarray(want_dw),
                               rtol=1e-4, atol=1e-5)


def test_blockdiag_weights_roundtrip(rng):
    k, cg, cout, groups, r = 3, 4, 24, 6, 2
    w = jnp.asarray(rng.normal(size=(k, cg, cout)), jnp.float32)
    wb = blockdiag_weights(w, groups, r)
    og = cout // groups
    assert wb.shape == (groups // r, k * r * cg, r * og)
    # Each output column must see exactly its own group's weights.
    wb6 = np.asarray(wb).reshape(groups // r, k, r, cg, r, og)
    w4 = np.asarray(w).reshape(k, cg, groups // r, r, og)
    for s in range(groups // r):
        for r1 in range(r):
            for r2 in range(r):
                blk = wb6[s, :, r1, :, r2, :]
                if r1 == r2:
                    np.testing.assert_array_equal(blk, w4[:, :, s, r1, :])
                else:
                    assert not blk.any()


def test_scale_discriminator_impl_equivalence(rng):
    """The full ScaleDiscriminator (WN/SN wrappers included) produces the
    same fmaps under conv_impl='pallas' (interpret) and 'xla'."""
    from ste_gan_tpu.models.discriminator import ScaleDiscriminator

    spec = ((32, 5, 1, 1, 2), (64, 9, 2, 4, 4), (128, 9, 2, 16, 4),
            (128, 5, 1, 1, 2))
    x = jnp.asarray(rng.normal(size=(2, 64, 8)), jnp.float32)
    ref = ScaleDiscriminator(norm="weight_norm", layer_spec=spec)
    var = ref.init(jax.random.PRNGKey(0), x, train=False)
    got_m = ScaleDiscriminator(norm="weight_norm", layer_spec=spec,
                               conv_impl="pallas")
    want = ref.apply(var, x, train=False)
    got = got_m.apply(var, x, train=False)
    assert len(got) == len(want)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)


def test_bf16_forward_close(rng):
    b, t, cin, cout, k, stride, pad, groups = (2, 64, 32, 64, 9, 2, 4, 4)
    x = jnp.asarray(rng.normal(size=(b, t, cin)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(k, cin // groups, cout)) * 0.1,
                    jnp.bfloat16)
    got = grouped_conv1d(x, w, stride=stride, padding=(pad, pad),
                         groups=groups, interpret=True)
    want = lax_grouped_conv1d(x, w, stride=stride, padding=(pad, pad),
                              groups=groups)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               rtol=0.05, atol=0.05)
