"""Unit tests for the conv/framing ops, verified against PyTorch oracles and
the reference implementation where applicable."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ste_gan_tpu.ops.conv import (
    SNConv, WNConv, avg_pool1d, moving_average, upsample_nearest)
from ste_gan_tpu.ops.framing import frame_reduce

from ref_loader import import_reference


def to_jax(t: torch.Tensor) -> jnp.ndarray:
    # .copy() matters: the CPU backend can zero-copy the torch buffer, and
    # torch mutates e.g. spectral-norm u/v in place during forwards.
    return jnp.asarray(t.detach().numpy().copy())


def conv1d_weight_to_jax(w: torch.Tensor) -> jnp.ndarray:
    # torch [out, in, k] -> jax WIO [k, in, out]
    return to_jax(w).transpose(2, 1, 0)


class TestWNConv:
    @pytest.mark.parametrize("dilation,padding,stride,groups", [
        (1, 1, 1, 1), (3, 3, 1, 1), (1, 18, 2, 4), (27, 27, 1, 1),
    ])
    def test_matches_torch_weight_norm(self, dilation, padding, stride, groups):
        torch.manual_seed(0)
        cin, cout, k = 8, 16, 3 if dilation > 1 else 5
        conv = torch.nn.utils.weight_norm(torch.nn.Conv1d(
            cin, cout, k, stride=stride, padding=padding, dilation=dilation,
            groups=groups))
        x = torch.randn(2, cin, 64)
        with torch.no_grad():
            want = conv(x).numpy()

        params = {
            "v": conv1d_weight_to_jax(conv.weight_v),
            "g": to_jax(conv.weight_g).reshape(-1),
            "bias": to_jax(conv.bias),
        }
        mod = WNConv(cout, (k,), strides=stride, padding=padding,
                     dilation=dilation, groups=groups)
        got = mod.apply({"params": params}, to_jax(x).transpose(0, 2, 1))
        np.testing.assert_allclose(got.transpose(0, 2, 1), want,
                                   rtol=1e-4, atol=1e-5)

    def test_identity_at_init(self):
        mod = WNConv(4, (3,), padding=1)
        x = jnp.ones((1, 16, 2))
        variables = mod.init(jax.random.PRNGKey(0), x)
        v = variables["params"]["v"]
        g = variables["params"]["g"]
        norm = jnp.sqrt(jnp.sum(v ** 2, axis=(0, 1)))
        np.testing.assert_allclose(g, norm, rtol=1e-6)


class TestSNConv:
    def test_matches_torch_spectral_norm(self):
        torch.manual_seed(1)
        cin, cout, k = 6, 12, 5
        conv = torch.nn.utils.spectral_norm(
            torch.nn.Conv1d(cin, cout, k, padding=2))
        x = torch.randn(2, cin, 48)
        conv.train()
        with torch.no_grad():
            want = conv(x).numpy()  # runs one power iteration

        mod = SNConv(cout, (k,), padding=2)
        xj = to_jax(x).transpose(0, 2, 1)
        variables = mod.init(jax.random.PRNGKey(0), xj, update_stats=False)
        params = dict(variables["params"])
        params["kernel"] = conv1d_weight_to_jax(conv.weight_orig)
        params["bias"] = to_jax(conv.bias)
        # Seed our u with torch's pre-iteration u: torch has already updated
        # _u during the forward above, so rebuild the pre-forward u by
        # re-registering. Instead, re-create the torch module fresh.
        torch.manual_seed(1)
        conv2 = torch.nn.utils.spectral_norm(
            torch.nn.Conv1d(cin, cout, k, padding=2))
        with torch.no_grad():
            conv2.weight_orig.copy_(conv.weight_orig)
            conv2.bias.copy_(conv.bias)
        u0 = to_jax(conv2.weight_u)
        spectral = {"u": u0, "v": jnp.zeros_like(variables["spectral"]["v"])}
        conv2.train()
        with torch.no_grad():
            want = conv2(x).numpy()

        got, new_state = mod.apply(
            {"params": params, "spectral": spectral}, xj, update_stats=True,
            mutable=["spectral"])
        np.testing.assert_allclose(got.transpose(0, 2, 1), want,
                                   rtol=1e-3, atol=1e-4)
        # u must have been updated.
        assert not np.allclose(new_state["spectral"]["u"], u0)

    def test_eval_does_not_update_state(self):
        mod = SNConv(4, (3,), padding=1)
        x = jnp.ones((1, 16, 2))
        variables = mod.init(jax.random.PRNGKey(0), x, update_stats=False)
        out = mod.apply(variables, x, update_stats=False)
        assert out.shape == (1, 16, 4)

    def test_spectral_norm_bounds_singular_value(self):
        mod = SNConv(8, (3,), padding=1)
        x = jnp.ones((1, 32, 4))
        variables = mod.init(jax.random.PRNGKey(2), x, update_stats=False)
        params, spectral = variables["params"], variables["spectral"]
        # Scale the kernel hugely; after iterations the effective spectral
        # norm should still be ~1.
        params = dict(params, kernel=params["kernel"] * 100.0)
        state = {"params": params, "spectral": spectral}
        for _ in range(50):
            _, upd = mod.apply(state, x, update_stats=True, mutable=["spectral"])
            state = {"params": params, "spectral": upd["spectral"]}
        kernel = params["kernel"]
        mat = kernel.reshape(-1, kernel.shape[-1]).T
        u, v = state["spectral"]["u"], state["spectral"]["v"]
        sigma = u @ mat @ v
        top_sv = jnp.linalg.norm(mat @ v)
        np.testing.assert_allclose(sigma, top_sv, rtol=1e-3)


class TestPooling:
    def test_avg_pool1d_matches_torch(self):
        torch.manual_seed(0)
        x = torch.randn(3, 8, 100)
        want = torch.nn.AvgPool1d(4, 2, 1)(x).numpy()
        got = avg_pool1d(to_jax(x).transpose(0, 2, 1), 4, 2, 1)
        np.testing.assert_allclose(got.transpose(0, 2, 1), want,
                                   rtol=1e-5, atol=1e-6)

    def test_moving_average_matches_reference_filter(self):
        ref_avg = import_reference("ste_gan.layers.average_filter")
        torch.manual_seed(0)
        x = torch.randn(2, 8, 200)
        filt = ref_avg.AverageFilter(8, window_size=9)
        want = filt(x).detach().numpy()
        got = moving_average(to_jax(x).transpose(0, 2, 1), 9)
        np.testing.assert_allclose(got.transpose(0, 2, 1), want,
                                   rtol=1e-4, atol=1e-5)

    def test_upsample_nearest(self):
        x = jnp.arange(6.0).reshape(1, 3, 2)
        got = upsample_nearest(x, 2)
        want = torch.nn.Upsample(scale_factor=2)(
            torch.tensor(np.asarray(x)).permute(0, 2, 1)).permute(0, 2, 1).numpy()
        np.testing.assert_allclose(got, want)


class TestFrameReduce:
    @pytest.mark.parametrize("window,stride", [(20, 8), (51, 13), (80, 16), (21, 8)])
    def test_matches_unfold(self, window, stride):
        torch.manual_seed(0)
        x = torch.randn(2, 130, 4)
        unfolded = x.unfold(1, window, stride)  # [B, F, C, W]
        want_mean = unfolded.mean(-1).numpy()
        want_sum = (unfolded ** 2).sum(-1).numpy()
        xj = to_jax(x)
        np.testing.assert_allclose(frame_reduce(xj, window, stride, "mean"),
                                   want_mean, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(frame_reduce(jnp.square(xj), window, stride, "sum"),
                                   want_sum, rtol=1e-4, atol=1e-5)


class TestGroupedConvSafeGrad:
    """The default grouped-conv path (_grouped_conv1d_safe_grad) must be
    bit-identical to XLA's grouped lowering in the forward, match its
    gradients on a single device, and — the reason it exists — stay correct
    where the native lowering's kernel gradient miscompiles under SPMD:
    a scanned microbatch whose batch rows cover only part of the data mesh
    (gradient exactly 2x; reproduced with XLA's raw conv too)."""

    ARGS = ((2,), ((2, 2),), (1,), 4)  # strides, padding, dilation, groups

    def _data(self, b=4, t=32, cin=8, cout=16, k=5, groups=4):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(b, t, cin)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(k, cin // groups, cout)), jnp.float32)
        return x, w

    @pytest.mark.parametrize("args", [
        ((2,), ((2, 2),), (1,), 4),
        ((1,), ((7, 7),), (3,), 4),
        ((2,), ((0, 3),), (1,), 2),
    ])
    def test_matches_native_single_device(self, args):
        from ste_gan_tpu.ops.conv import (
            _grouped_conv1d_safe_grad, _lax_grouped_conv1d)
        x, w = self._data(groups=args[3])
        y_native = _lax_grouped_conv1d(x, w, *args)
        y_safe = _grouped_conv1d_safe_grad(x, w, *args)
        np.testing.assert_array_equal(np.asarray(y_native), np.asarray(y_safe))

        def loss(f):
            return lambda w, x: jnp.mean(jnp.square(f(x, w, *args)))

        gw_n, gx_n = jax.grad(loss(_lax_grouped_conv1d), (0, 1))(w, x)
        gw_s, gx_s = jax.grad(loss(_grouped_conv1d_safe_grad), (0, 1))(w, x)
        np.testing.assert_allclose(gw_n, gw_s, rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(gx_n, gx_s, rtol=1e-4, atol=1e-6)

    def test_kernel_grad_correct_under_microbatch_sharding(self):
        """Scan over 2 microbatches of 2 with the batch axis laid out over a
        4-device mesh: the native lowering returns exactly 2x gradients here
        (upstream SPMD bug); the safe path must match the unsharded oracle."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from ste_gan_tpu.ops.conv import _grouped_conv1d_safe_grad
        x, w = self._data()
        args = self.ARGS

        def loss_scan(w, xs):
            def body(acc, mb):
                y = _grouped_conv1d_safe_grad(mb, w, *args)
                return acc + jnp.mean(jnp.square(y)), None
            return jax.lax.scan(body, jnp.zeros(()), xs)[0]

        g_ref = jax.grad(loss_scan)(w, x.reshape(2, 2, *x.shape[1:]))
        mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
        xs = jax.device_put(x, NamedSharding(mesh, P("data"))
                            ).reshape(2, 2, *x.shape[1:])
        wr = jax.device_put(w, NamedSharding(mesh, P()))
        g = jax.jit(jax.grad(loss_scan))(wr, xs)
        np.testing.assert_allclose(np.asarray(jax.device_get(g)),
                                   np.asarray(g_ref), rtol=1e-4, atol=1e-6)
