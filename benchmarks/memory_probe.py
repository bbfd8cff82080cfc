"""Peak-HBM probe for the fused GAN train step's memory knobs.

AOT-compiles the fused step (never executes it — compilation alone yields
the XLA memory plan) for each knob combination and prints the compiled
program's actual HBM reservations from ``compiled.memory_analysis()``:

* ``temp``   — scratch for activations/residuals/workspace: the number the
  remat (``train.remat``) and gradient-accumulation (``train.grad_accum``)
  knobs exist to shrink;
* ``args`` / ``out`` — parameter+batch inputs and results (donation aliases
  the state, so these largely overlap);
* ``peak``  — argument + temp + output (what must fit).

Run on the real chip (each cold compile is minutes through the tunnel;
the persistent cache makes reruns fast):

    python benchmarks/memory_probe.py                 # default variants
    python benchmarks/memory_probe.py --batch 64      # scaling regime

Writes ``benchmarks/memory_probe.json`` next to this file and prints one
JSON line per variant. Measured numbers are quoted in PARITY.md.
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


VARIANTS = (
    # (label, grad_accum, remat)
    ("baseline", 1, False),
    ("remat", 1, True),
    ("accum2", 2, False),
    ("accum4", 4, False),
    ("accum4+remat", 4, True),
)


def probe(batch_size: int, grad_accum: int, remat: bool) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ste_gan_tpu import constants as C
    from ste_gan_tpu.config import Config
    from ste_gan_tpu.train.gan import build_models, init_state, make_train_step

    cfg = Config()
    cfg.train.batch_size = batch_size
    cfg.train.grad_accum = grad_accum
    cfg.train.remat = remat

    models = build_models(cfg)
    rng = jax.random.PRNGKey(0)
    encoder_variables = jax.jit(lambda r: models.encoder.init(
        r, jnp.zeros((1, cfg.train.chunk_size, cfg.data.num_emg_channels)),
        train=False))(rng)
    state = init_state(cfg, models, rng)

    b, chunk = cfg.train.batch_size, cfg.train.chunk_size
    frames = chunk // C.HOPSIZE
    rng_np = np.random.default_rng(0)
    batch = {
        C.DataType.REAL_EMG: jnp.asarray(
            np.tanh(rng_np.normal(0, 0.4, (b, chunk, 8))), jnp.float32),
        C.DataType.SPEECH_UNITS: jnp.asarray(
            rng_np.normal(size=(b, frames, 256)), jnp.float32),
        C.DataType.PHONEMES: jnp.asarray(
            rng_np.integers(0, C.NUM_PHONEMES, (b, frames)), jnp.int32),
        C.DataType.SESSION_INDEX: jnp.asarray(
            rng_np.integers(0, C.NUM_EMG_SESSIONS, (b,)), jnp.int32),
        C.DataType.SPEAKING_MODE_INDEX: jnp.zeros((b,), jnp.int32),
    }

    step = jax.jit(make_train_step(cfg, models), donate_argnums=0)
    compiled = step.lower(state, batch, encoder_variables).compile()
    mem = compiled.memory_analysis()
    if mem is None:
        return {"error": "memory_analysis unavailable on this backend"}
    temp = int(mem.temp_size_in_bytes)
    args = int(mem.argument_size_in_bytes)
    out = int(mem.output_size_in_bytes)
    alias = int(getattr(mem, "alias_size_in_bytes", 0))
    mib = 1024 * 1024
    return {
        "temp_mib": round(temp / mib, 1),
        "args_mib": round(args / mib, 1),
        "out_mib": round(out / mib, 1),
        "alias_mib": round(alias / mib, 1),
        # What must fit in HBM while the step runs (donated state aliases
        # its output, so args+out double-counts `alias` bytes).
        "peak_mib": round((temp + args + out - alias) / mib, 1),
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--out", type=str,
                        default=str(Path(__file__).parent
                                    / "memory_probe.json"))
    args = parser.parse_args()

    from ste_gan_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    import jax

    results = {"batch_size": args.batch,
               "platform": jax.devices()[0].platform, "variants": {}}
    for label, accum, remat in VARIANTS:
        r = probe(args.batch, accum, remat)
        results["variants"][label] = r
        print(json.dumps({"variant": label, "batch": args.batch, **r}))
    Path(args.out).write_text(json.dumps(results, indent=2) + "\n")


if __name__ == "__main__":
    main()
