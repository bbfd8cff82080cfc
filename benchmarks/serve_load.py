"""Sustained-load benchmark of the serving subsystem (VERDICT r2 #6).

Drives the real HTTP micro-batching server with N concurrent clients x M
requests of ``--frames``-frame utterances against the full-size generator
on the local accelerator, then reports client-side latency percentiles,
server-side /stats (p50/p95/p99, batch occupancy, rejections), and
end-to-end throughput. Writes ``benchmarks/serve_load.json``.

Usage:
    python benchmarks/serve_load.py                 # random-init generator
    python benchmarks/serve_load.py --run_dir <gan_run>   # trained model
    python benchmarks/serve_load.py --clients 8 --requests 100
"""
from __future__ import annotations

import argparse
import io
import json
import threading
import time
import urllib.error
import urllib.request
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def client_worker(port: int, feats: np.ndarray, session: int, n_requests: int,
                  latencies: list, rejected: list, barrier: threading.Barrier):
    buf = io.BytesIO()
    np.savez(buf, feats=feats, session=np.asarray(session))
    payload = buf.getvalue()
    barrier.wait()
    for _ in range(n_requests):
        start = time.perf_counter()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesize", data=payload,
            method="POST")
        try:
            with urllib.request.urlopen(req, timeout=900) as resp:
                np.load(io.BytesIO(resp.read()))
            latencies.append((time.perf_counter() - start) * 1e3)
        except urllib.error.HTTPError as exc:
            if exc.code == 503:
                rejected.append(1)
                time.sleep(0.05)  # honor backpressure, then continue
            else:
                raise


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run_dir", type=Path, default=None)
    ap.add_argument("--artifact", type=Path, default=None,
                    help="StableHLO serving export; measures the "
                         "checkpoint-free artifact-serving path")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=100)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    ap.add_argument("--out", type=Path, default=None,
                    help="output JSON (default: serve_load.json, or "
                         "serve_load_artifact.json in --artifact mode so "
                         "the two committed records never clobber each "
                         "other)")
    args = ap.parse_args()
    if args.out is None:
        name = ("serve_load_artifact.json" if args.artifact is not None
                else "serve_load.json")
        args.out = Path(__file__).parent / name

    import jax
    import jax.numpy as jnp

    from ste_gan_tpu.serve import SynthesisService, make_http_server
    from ste_gan_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()

    if args.artifact is not None:
        service = SynthesisService.from_artifact(
            args.artifact, max_batch=args.max_batch,
            max_wait_ms=args.max_wait_ms, bucket=args.frames)
    elif args.run_dir is not None:
        service = SynthesisService.from_run_dir(
            args.run_dir, tag="latest", max_batch=args.max_batch,
            max_wait_ms=args.max_wait_ms, bucket=args.frames)
    else:
        # Random-init full-size generator: serving perf is weight-agnostic.
        from ste_gan_tpu.config import Config
        from ste_gan_tpu.infer import EMGSynthesizer
        from ste_gan_tpu.models.generator import init_emg_generator

        cfg = Config()
        gen = init_emg_generator(cfg, dtype=jnp.bfloat16)
        feats0 = jnp.zeros((1, 8, gen.speech_input_dim), jnp.float32)
        ids = jnp.zeros((1,), jnp.int32)
        params = jax.jit(lambda r: gen.init(r, feats0, ids, ids))(
            jax.random.PRNGKey(0))["params"]
        service = SynthesisService(
            EMGSynthesizer(gen, params), {},
            max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
            bucket=args.frames)

    dim = service._synth.generator.speech_input_dim
    print(f"warming up batch sizes 1..{args.max_batch} "
          f"(bucket={args.frames})...", flush=True)
    for b in range(1, args.max_batch + 1):
        service.warmup(num_frames=args.frames, batch_sizes=(b,))

    server = make_http_server(service, port=0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()

    rng = np.random.default_rng(0)
    latencies: list = []
    rejected: list = []
    barrier = threading.Barrier(args.clients + 1)
    threads = []
    for i in range(args.clients):
        feats = rng.normal(size=(args.frames, dim)).astype(np.float32)
        threads.append(threading.Thread(
            target=client_worker,
            args=(port, feats, 0, args.requests, latencies, rejected,
                  barrier)))
        threads[-1].start()
    barrier.wait()
    start = time.perf_counter()
    for t in threads:
        t.join()
    wall = time.perf_counter() - start
    server.shutdown()

    stats = service.batcher.stats_snapshot()
    service.close()
    lat = np.asarray(latencies)
    completed = len(lat)
    result = {
        "clients": args.clients,
        "requests_per_client": args.requests,
        "frames_per_request": args.frames,
        "completed": completed,
        "rejected_503": len(rejected),
        "wall_secs": round(wall, 2),
        "requests_per_sec": round(completed / wall, 1),
        "emg_seconds_per_sec": round(
            completed * args.frames / 50.0 / wall, 1),
        "client_latency_ms": {
            "p50": round(float(np.percentile(lat, 50)), 1),
            "p95": round(float(np.percentile(lat, 95)), 1),
            "p99": round(float(np.percentile(lat, 99)), 1),
            "mean": round(float(lat.mean()), 1),
        },
        "server_stats": {k: (round(v, 2) if isinstance(v, float) else v)
                         for k, v in stats.items()},
        "platform": jax.devices()[0].platform,
    }
    args.out.write_text(json.dumps(result, indent=2))
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
