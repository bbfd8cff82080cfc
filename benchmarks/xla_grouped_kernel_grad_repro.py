"""Standalone repro: XLA's SPMD partitioner miscompiles the KERNEL
gradient of a grouped convolution (feature_group_count > 1) when the
convolution's batch rows cover only part of the mesh the program is
partitioned over — the gradient comes back an exact integer multiple
(2x here) of the correct value.

This is the sharding pattern gradient accumulation creates: the global
batch is laid out over a ``data`` mesh axis, then reshaped to
``[K, B/K, ...]`` microbatches, so each microbatch's rows live on a
subset of the devices. The forward and the data gradient are correct;
dense convs (feature_group_count == 1) and matmuls are correct in the
same position; ``lax.scan`` is not required (an unrolled python loop
fails identically). Only the grouped kernel-grad conv — XLA's
``batch_group_count`` lowering — doubles.

Run (no TPU needed; any multi-device layout reproduces it):

    python benchmarks/xla_grouped_kernel_grad_repro.py

Expected output on affected versions (jax 0.8.x / jaxlib 0.8.x):

    dense  conv kernel-grad max ratio sharded/unsharded: 1.000000
    grouped conv kernel-grad max ratio sharded/unsharded: 2.000000

ste_gan_tpu works around this in ``ops/conv.py::_grouped_conv1d_safe_grad``
(native forward + native data grad under ``jax.custom_vjp``; the kernel
grad recomputed as per-tap batched matmuls, which partition correctly).
The GAN trainer auto-selects it when ``train.grad_accum > 1``
(models/discriminator.py); ``tests/test_ops.py::TestGroupedConvSafeGrad``
guards the fix.
"""
import os

os.environ.setdefault(
    "XLA_FLAGS",
    "--xla_force_host_platform_device_count=4 "
    + os.environ.get("XLA_FLAGS", ""))

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

jax.config.update("jax_platforms", "cpu")


def conv(x, w, groups):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=((1, 1),),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups)


def loss_two_microbatches(w, xs, groups):
    # xs: [2, B/2, T, C] — two microbatches, as gradient accumulation
    # forms them. An unrolled loop, no scan needed.
    return (jnp.mean(jnp.square(conv(xs[0], w, groups)))
            + jnp.mean(jnp.square(conv(xs[1], w, groups))))


def main() -> None:
    rng = np.random.default_rng(0)
    b, t, cin, cout, k = 4, 32, 8, 16, 5
    x = jnp.asarray(rng.normal(size=(b, t, cin)), jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))

    for groups, name in ((1, "dense  conv"), (4, "grouped conv")):
        w = jnp.asarray(rng.normal(size=(k, cin // groups, cout)),
                        jnp.float32)
        grad = jax.grad(loss_two_microbatches)
        g_ref = grad(w, x.reshape(2, 2, t, cin), groups)
        xs = jax.device_put(x, NamedSharding(mesh, P("data"))
                            ).reshape(2, 2, t, cin)
        ws = jax.device_put(w, NamedSharding(mesh, P()))
        g_sharded = jax.jit(grad, static_argnums=2)(ws, xs, groups)
        ratio = np.asarray(jax.device_get(g_sharded)) / np.asarray(g_ref)
        print(f"{name} kernel-grad max ratio sharded/unsharded: "
              f"{np.max(np.abs(ratio)):.6f}")


if __name__ == "__main__":
    main()
