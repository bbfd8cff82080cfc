"""Speech->EMG synthesis serving: dynamic micro-batching + HTTP front-end.

The reference has no serving surface at all (synthesis happens inline in
its train loop; ste_gan/train.py:383-414). This module is the production
analogue for the TPU build:

* :class:`MicroBatcher` — a request queue whose worker thread coalesces
  concurrent requests into one device call: it blocks on the first request,
  drains whatever else arrives within ``max_wait_ms`` (up to
  ``max_batch``), pads the batch to a shared bucketed length, and runs ONE
  generator forward with per-row valid-length masks (exact — see
  ``EMGSynthesizer.synthesize_padded``). Single compiled program per
  (bucket, batch-size) pair, so the jit cache stays tiny under load.
* :class:`SynthesisService` — checkpoint/vocab loading, warmup, stats.
* :func:`main` — ``python -m ste_gan_tpu.serve --run_dir <gan_run>``:
  a stdlib ThreadingHTTPServer speaking npz/npy bytes:

      POST /synthesize   body: np.savez({feats[T,D] f32, session_id,
                         speaking_mode}) -> npy bytes of [16*T, C] EMG
                         (503 + Retry-After when the bounded queue is full)
      POST /reload       hot-swap weights without downtime: JSON
                         {run_dir?, tag?, artifact?}, defaults re-read the
                         current source (e.g. a newer 'best' checkpoint
                         mid-training); checkpoint mode swaps the param
                         pytree under the SAME compiled program
      GET  /healthz      liveness
      GET  /stats        counters + p50/p95/p99 latency, batch occupancy,
                         queue depth, rejected count, reloads + source

NumPy byte payloads (not JSON) keep the host path at memcpy speed; the
dynamic batcher is what turns N concurrent RTF-0.007 requests into ~1
device call instead of N.

A :class:`HostMemoryWatchdog` (``--host_rss_restart_gb``, default 48)
bounds the process lifetime under per-transfer host-memory leaks (the
remote-TPU tunnel pathology documented in utils/hostmem.py): past the
limit the server drains in-flight requests (new ones get 503 +
Retry-After, ``/healthz`` turns not-ready) and exec-restarts itself on
the *current* model source — hot-reloaded weights survive the restart.
"""
from __future__ import annotations

import argparse
import io
import json
import logging
import queue
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from ste_gan_tpu import constants as C


def _round_up(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


class LatencyWindow:
    """Thread-safe recent-window latency reservoir + percentile snapshot —
    shared by the micro-batcher and the decoder service."""

    def __init__(self, maxlen: int = 4096):
        self._lat = deque(maxlen=maxlen)
        self._lock = threading.Lock()

    def record(self, ms: float) -> None:
        with self._lock:
            self._lat.append(ms)

    def extend(self, ms_values) -> None:
        with self._lock:
            self._lat.extend(ms_values)

    def percentiles(self) -> Dict:
        with self._lock:
            lats = np.asarray(self._lat, np.float64)
        if not len(lats):
            return {}
        p50, p95, p99 = np.percentile(lats, [50, 95, 99])
        return {"latency_ms_p50": float(p50), "latency_ms_p95": float(p95),
                "latency_ms_p99": float(p99)}


class ServiceOverloadedError(RuntimeError):
    """Raised by :meth:`MicroBatcher.submit` when the bounded request
    queue is full — backpressure instead of silent unbounded growth. The
    HTTP front-end maps it to 503 + Retry-After."""


class HostMemoryWatchdog:
    """Bounds the serving process's lifetime under host-memory leaks.

    Some PJRT transports leak host memory per H2D transfer and their
    dispatch latency grows with RSS (utils/hostmem.py documents the
    measured pathology), so a server that ships one features buffer to the
    device per request degrades without ever crashing. This watchdog
    checks RSS after each completed request; past ``limit_gb`` it flips to
    *draining* — new work gets 503 + Retry-After (load balancers also see
    ``/healthz`` turn not-ready), in-flight requests finish — and once
    idle it fires ``restart_fn`` (production: stop the server loop so
    ``main`` exec-restarts the process; the persistent compilation cache
    makes the replacement's warmup a cache hit, and ``main`` re-serves the
    *current* model source, surviving earlier ``/reload`` hot-swaps).

    ``limit_gb <= 0`` disables every check. RSS is only checked after a
    completed request, so even an over-budget baseline serves at least
    one request per incarnation — degenerate limits degrade throughput
    rather than livelock. ``rss_fn``/``restart_fn`` are injectable for
    tests.
    """

    def __init__(self, limit_gb: float, rss_fn=None, restart_fn=None,
                 drain_timeout_s: float = 900.0):
        from ste_gan_tpu.utils.hostmem import host_rss_gb
        self.limit_gb = float(limit_gb)
        self.rss_fn = rss_fn or host_rss_gb
        self.restart_fn = restart_fn  # may be bound after server creation
        self.drain_timeout_s = drain_timeout_s
        self.draining = threading.Event()
        self.restart_fired = threading.Event()
        self._lock = threading.Lock()
        self._inflight = 0
        self._served = 0
        self.last_rss_gb = 0.0

    def request_starts(self) -> bool:
        """Admission check; False means reject with 503 (draining).

        The draining check and the in-flight increment are one atomic
        section: the drain thread reads ``_inflight`` under the same lock
        and ``draining`` is only ever set under it (``request_ends``), so
        it can never observe in-flight == 0 while an admission is mid-way
        — an admitted request is always drained, never killed by the
        restart."""
        with self._lock:
            if self.draining.is_set():
                return False
            self._inflight += 1
        return True

    def request_ends(self) -> None:
        with self._lock:
            self._inflight -= 1
            self._served += 1
            served = self._served
        if self.limit_gb <= 0 or self.draining.is_set():
            return
        rss = self.rss_fn()
        self.last_rss_gb = rss
        if rss > self.limit_gb:
            # Compare-and-set under the lock: two requests completing
            # concurrently can both see rss > limit, but only one trips
            # the drain (restart_fn fires exactly once).
            with self._lock:
                if self.draining.is_set():
                    return
                self.draining.set()
            logging.warning(
                "serve: host RSS %.1f GiB > %.1f GiB after %d requests — "
                "draining for restart", rss, self.limit_gb, served)
            threading.Thread(target=self._drain_then_restart,
                             daemon=True).start()

    def _drain_then_restart(self) -> None:
        deadline = time.monotonic() + self.drain_timeout_s
        while time.monotonic() < deadline:
            with self._lock:
                if self._inflight == 0:
                    break
            time.sleep(0.05)
        self.restart_fired.set()
        if self.restart_fn is not None:
            self.restart_fn()

    def snapshot(self) -> Dict:
        with self._lock:
            inflight = self._inflight
        return {
            "host_rss_gb": round(self.rss_fn(), 3),
            "host_rss_limit_gb": self.limit_gb,
            "draining": self.draining.is_set(),
            "inflight": inflight,
        }


def _restart_argv(argv: List[str], source: Dict) -> List[str]:
    """CLI args for the post-restart incarnation: ``argv`` (this process's
    args after the program name) with the model-source flags rewritten to
    the service's *current* source, so weights hot-swapped via ``/reload``
    survive the exec-restart.

    When ``/reload`` switched the source mode (run_dir -> artifact), flags
    that only make sense in checkpoint mode must not leak into the
    restarted incarnation or it dies on ``main``'s guards instead of
    recycling: ``--data_parallel`` is dropped (artifact = fixed
    single-device program), and ``--run_dir`` is *kept* when
    ``--decoder_ckpt`` is present (the decoder still reads the run's
    config.yaml for the encoder architecture; ``main`` serves synthesis
    from ``--artifact`` regardless)."""
    artifact_mode = source.get("mode") == "artifact"
    has_flag = lambda flag: any(
        a == flag or a.startswith(f"{flag}=") for a in argv)
    drop = ["--tag", "--artifact"]
    if not (artifact_mode and has_flag("--decoder_ckpt")):
        drop.append("--run_dir")
    if artifact_mode:
        drop.append("--data_parallel")
    out: List[str] = []
    skip = False
    for arg in argv:
        if skip:
            skip = False
            continue
        if arg in drop:
            skip = True
            continue
        if any(arg.startswith(f"{flag}=") for flag in drop):
            continue
        out.append(arg)
    if artifact_mode:
        out += ["--artifact", str(source["artifact"])]
    else:
        out += ["--run_dir", str(source["run_dir"])]
        if source.get("tag"):
            out += ["--tag", str(source["tag"])]
    return out


@dataclass
class _Request:
    feats: np.ndarray           # [T, D] float32
    session_idx: int
    mode_idx: int
    done: threading.Event = field(default_factory=threading.Event)
    result: Optional[np.ndarray] = None
    error: Optional[Exception] = None
    enqueued_at: float = field(default_factory=time.perf_counter)


class MicroBatcher:
    """Coalesce concurrent synthesis requests into single device calls."""

    def __init__(self, synthesizer, max_batch: int = 8,
                 max_wait_ms: float = 5.0, bucket: int = 64,
                 max_queue: int = 64):
        self._synth = synthesizer
        self.max_batch = max(1, max_batch)
        self.max_wait = max_wait_ms / 1e3
        self.bucket = max(1, bucket)
        # Bounded queue = backpressure high-water mark: a burst beyond
        # device throughput rejects instead of growing latency unbounded.
        self._queue: "queue.Queue[_Request]" = queue.Queue(
            maxsize=max(1, max_queue))
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self.stats = {
            "requests": 0, "batches": 0, "batched_requests": 0,
            "max_batch_seen": 0, "latency_ms_sum": 0.0, "rejected": 0,
        }
        # Recent-window reservoirs for percentile/occupancy reporting.
        self._lat_ms = LatencyWindow()
        self._batch_sizes = deque(maxlen=4096)
        self._stats_lock = threading.Lock()
        self._thread.start()

    # ------------------------------------------------------------------
    def submit(self, feats: np.ndarray, session_idx: int,
               mode_idx: int = 0, timeout: float = 900.0) -> np.ndarray:
        """Blocking call from any thread; returns [upsample*T, C] EMG.

        The default timeout tolerates a cold XLA compile of a new
        (bucket, batch) program (minutes through a remote-TPU tunnel);
        warmed-up servers answer in milliseconds. Raises
        :class:`ServiceOverloadedError` when the bounded queue is full."""
        req = _Request(np.asarray(feats, np.float32), int(session_idx),
                       int(mode_idx))
        try:
            self._queue.put_nowait(req)
        except queue.Full:
            with self._stats_lock:
                self.stats["rejected"] += 1
            raise ServiceOverloadedError(
                f"request queue full ({self._queue.maxsize} pending); "
                "retry later") from None
        if not req.done.wait(timeout):
            raise TimeoutError("synthesis request timed out")
        if req.error is not None:
            raise req.error
        return req.result

    def close(self):
        self._stop.set()
        self._thread.join(timeout=5)

    # ------------------------------------------------------------------
    def _drain(self) -> List[_Request]:
        try:
            first = self._queue.get(timeout=0.1)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.perf_counter() + self.max_wait
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                batch.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _worker(self):
        import jax.numpy as jnp

        while not self._stop.is_set():
            batch = self._drain()
            if not batch:
                continue
            try:
                up = self._synth.upsample
                t_pad = _round_up(max(len(r.feats) for r in batch),
                                  self.bucket)
                dim = batch[0].feats.shape[-1]
                feats = np.zeros((len(batch), t_pad, dim), np.float32)
                valid = np.zeros((len(batch),), np.int32)
                sess = np.zeros((len(batch),), np.int32)
                mode = np.zeros((len(batch),), np.int32)
                for row, r in enumerate(batch):
                    feats[row, : len(r.feats)] = r.feats
                    valid[row] = len(r.feats)
                    sess[row] = r.session_idx
                    mode[row] = r.mode_idx
                emg = np.asarray(self._synth.synthesize_padded(
                    jnp.asarray(feats), jnp.asarray(sess), jnp.asarray(mode),
                    jnp.asarray(valid)))
                now = time.perf_counter()
                for row, r in enumerate(batch):
                    r.result = emg[row, : up * valid[row]]
                    r.done.set()
                with self._stats_lock:
                    s = self.stats
                    s["requests"] += len(batch)
                    s["batches"] += 1
                    s["batched_requests"] += len(batch) if len(batch) > 1 else 0
                    s["max_batch_seen"] = max(s["max_batch_seen"], len(batch))
                    lats = [(now - r.enqueued_at) * 1e3 for r in batch]
                    s["latency_ms_sum"] += sum(lats)
                    self._batch_sizes.append(len(batch))
                self._lat_ms.extend(lats)
            except Exception as exc:  # propagate to every waiter
                for r in batch:
                    r.error = exc
                    r.done.set()

    def stats_snapshot(self) -> Dict:
        with self._stats_lock:
            s = dict(self.stats)
            sizes = np.asarray(self._batch_sizes, np.float64)
        s["mean_latency_ms"] = (s["latency_ms_sum"] / s["requests"]
                                if s["requests"] else 0.0)
        s.update(self._lat_ms.percentiles())
        if len(sizes):
            s.update(batch_occupancy_mean=float(sizes.mean()),
                     batch_occupancy_max=int(sizes.max()))
        s["queue_depth"] = self._queue.qsize()
        return s


class SynthesisService:
    """Loaded model + session vocabulary + micro-batcher."""

    def __init__(self, synthesizer, session_id_to_idx: Dict[str, int],
                 max_batch: int = 8, max_wait_ms: float = 5.0,
                 bucket: int = 64, max_queue: int = 64):
        self.session_id_to_idx = dict(session_id_to_idx)
        self.batcher = MicroBatcher(synthesizer, max_batch=max_batch,
                                    max_wait_ms=max_wait_ms, bucket=bucket,
                                    max_queue=max_queue)
        self._synth = synthesizer
        # Hot-reload bookkeeping (POST /reload): where the weights came
        # from, how often they were swapped, serialized under one lock.
        self._source: Dict = {}
        self._reload_lock = threading.Lock()
        self.reload_count = 0

    @classmethod
    def from_artifact(cls, artifact: Path, max_batch: int = 8,
                      max_wait_ms: float = 5.0, bucket: int = 64,
                      max_queue: int = 64) -> "SynthesisService":
        """Serve from a StableHLO serving export
        (``scripts/export_generator.py --serving``) — no checkpoint, no
        Flax, no config; session vocab JSON is read from the artifact's
        directory when present. The streaming endpoint is unavailable in
        this mode (501)."""
        from ste_gan_tpu.export import ExportedSynthesizer

        artifact = Path(artifact)
        synth = ExportedSynthesizer(artifact)
        session_id_to_idx = {}
        vocab_path = artifact.parent / "session_idx_to_id.json"
        if vocab_path.exists():
            idx_to_id = json.loads(vocab_path.read_text())
            session_id_to_idx = {v: int(k) for k, v in idx_to_id.items()}
        service = cls(synth, session_id_to_idx, max_batch=max_batch,
                      max_wait_ms=max_wait_ms, bucket=bucket,
                      max_queue=max_queue)
        service._source = {"mode": "artifact", "artifact": str(artifact)}
        return service

    @classmethod
    def from_run_dir(cls, run_dir: Path, tag: str = "best",
                     max_batch: int = 8, max_wait_ms: float = 5.0,
                     bucket: int = 64, max_queue: int = 64,
                     data_parallel: int = 0) -> "SynthesisService":
        """Load config snapshot + checkpoint + session vocab from a GAN
        training run directory (the same layout scripts/generate_emg.py
        consumes). ``data_parallel > 1`` serves over a 1-D device mesh:
        each coalesced micro-batch's rows are sharded across the mesh
        (scale-out serving; exact — see EMGSynthesizer)."""
        from ste_gan_tpu.infer import EMGSynthesizer
        from ste_gan_tpu.parallel.mesh import create_mesh
        from ste_gan_tpu.train.gan import (eval_generator_params,
                                           load_trained_state)

        run_dir = Path(run_dir)
        _, models, state = load_trained_state(run_dir, tag)
        vocab_path = run_dir / "session_idx_to_id.json"
        session_id_to_idx = {}
        if vocab_path.exists():
            idx_to_id = json.loads(vocab_path.read_text())
            session_id_to_idx = {v: int(k) for k, v in idx_to_id.items()}
        mesh = create_mesh(data_parallel) if data_parallel > 1 else None
        synth = EMGSynthesizer(models.generator, eval_generator_params(state),
                               mesh=mesh)
        service = cls(synth, session_id_to_idx, max_batch=max_batch,
                      max_wait_ms=max_wait_ms, bucket=bucket,
                      max_queue=max_queue)
        service._source = {"mode": "run_dir", "run_dir": str(run_dir),
                           "tag": tag}
        return service

    # ------------------------------------------------------------------
    @staticmethod
    def _load_vocab(path: Path) -> Optional[Dict[str, int]]:
        if path.exists():
            idx_to_id = json.loads(path.read_text())
            return {v: int(k) for k, v in idx_to_id.items()}
        return None

    def reload(self, run_dir=None, tag=None, artifact=None) -> Dict:
        """Hot-swap the served weights without downtime.

        Checkpoint mode: re-reads the (possibly newer) checkpoint ``tag``
        from ``run_dir`` (defaults: the current source), validates that the
        new parameter tree has the identical structure and leaf shapes
        (same architecture), then atomically swaps the synthesizer's
        ``params`` — the jitted forward takes params as an argument, so NO
        recompilation happens and in-flight batches finish on the old
        weights. Artifact mode (or passing ``artifact``): loads the new
        StableHLO export, warms it on the service bucket BEFORE the swap
        (the old model keeps serving through the warm-up), then swaps the
        whole synthesizer under the micro-batcher. The reference has no
        serving layer at all (SURVEY §1: inference is netG.generate inline,
        ste_gan/train.py:394); this is production machinery on top."""
        import jax

        with self._reload_lock:
            if artifact is not None or self._source.get("mode") == "artifact":
                from ste_gan_tpu.export import ExportedSynthesizer

                artifact = Path(artifact if artifact is not None
                                else self._source["artifact"])
                new_synth = ExportedSynthesizer(artifact)
                # Warm the new program while the old one keeps serving.
                dim = new_synth.generator.speech_input_dim
                b = self.batcher.bucket
                new_synth.synthesize_padded(
                    np.zeros((1, b, dim), np.float32),
                    np.zeros((1,), np.int32), np.zeros((1,), np.int32),
                    np.asarray([b], np.int32))
                vocab = self._load_vocab(
                    artifact.parent / "session_idx_to_id.json")
                self._synth = new_synth
                self.batcher._synth = new_synth
                if vocab is not None:
                    self.session_id_to_idx = vocab
                self._source = {"mode": "artifact", "artifact": str(artifact)}
            else:
                from ste_gan_tpu.train.gan import (eval_generator_params,
                                                   load_trained_state)

                run_dir = Path(run_dir if run_dir is not None
                               else self._source["run_dir"])
                tag = tag if tag is not None else self._source.get(
                    "tag", "best")
                _, _, state = load_trained_state(run_dir, tag)
                new_params = eval_generator_params(state)
                old_params = self._synth.params
                if (jax.tree_util.tree_structure(new_params)
                        != jax.tree_util.tree_structure(old_params)):
                    raise ValueError(
                        "checkpoint parameter tree structure does not match "
                        "the served model — not swapping")
                mism = [str(p) for (p, a), b in zip(
                    jax.tree_util.tree_flatten_with_path(new_params)[0],
                    jax.tree_util.tree_leaves(old_params))
                    if a.shape != b.shape]
                if mism:
                    raise ValueError(
                        f"checkpoint leaf shapes differ from the served "
                        f"model at {mism[:3]} — not swapping")
                vocab = self._load_vocab(run_dir / "session_idx_to_id.json")
                # Atomic swap, no recompile (set_params re-replicates over
                # the serving mesh when one is active).
                self._synth.set_params(new_params)
                if vocab is not None:
                    self.session_id_to_idx = vocab
                self._source = {"mode": "run_dir", "run_dir": str(run_dir),
                                "tag": tag}
            self.reload_count += 1
            return {"reloaded": True, "reloads": self.reload_count,
                    **self._source}

    # ------------------------------------------------------------------
    def resolve_session(self, session) -> int:
        if isinstance(session, (int, np.integer)):
            return int(session)
        if session in self.session_id_to_idx:
            return self.session_id_to_idx[session]
        raise KeyError(f"unknown session id {session!r}; known: "
                       f"{sorted(self.session_id_to_idx)}")

    def synthesize(self, feats: np.ndarray, session, mode_idx: int = 0
                   ) -> np.ndarray:
        return self.batcher.submit(feats, self.resolve_session(session),
                                   mode_idx)

    def synthesize_stream(self, feats: np.ndarray, session,
                          mode_idx: int = 0, chunk_frames: int = 64):
        """Yield EMG chunks as they are synthesized (receptive-field-exact
        chunking: interiors match the full-utterance result; see
        ``EMGSynthesizer.synthesize_streaming``). Latency-oriented path —
        bypasses the micro-batcher. Returns the chunk iterator directly
        (NOT a generator wrapper) so an artifact-mode synthesizer's
        NotImplementedError surfaces at call time, before the HTTP handler
        has committed response headers."""
        return self._synth.synthesize_streaming(
            np.asarray(feats, np.float32), self.resolve_session(session),
            chunk_frames=chunk_frames, mode_idx=mode_idx)

    def warmup(self, num_frames: int = 64, batch_sizes=(1,)) -> None:
        """Pre-compile the (bucket, batch) programs the server will hit."""
        dim = self._synth.generator.speech_input_dim
        for b in batch_sizes:
            reqs = [threading.Thread(
                target=lambda: self.batcher.submit(
                    np.zeros((num_frames, dim), np.float32), 0))
                for _ in range(b)]
            for t in reqs:
                t.start()
            for t in reqs:
                t.join()

    def close(self):
        self.batcher.close()


class EMGDecoderService:
    """EMG → (soft speech units, phoneme logits) from an exported encoder
    artifact (``scripts/export_emg_encoder.py``) — the silent-speech
    *decoding* direction, served next to synthesis. Lengths are bucketed
    (multiples of ``bucket`` 50 Hz frames, floor ``min_frames`` — the
    artifact's windowed rel-pos regime) so the compiled-program cache
    stays tiny.

    Caveat: the encoder has no valid-length mask input (as in the
    reference, which only ever evaluates exact-length batch-1 signals),
    and its rel-pos attention window spans ±(distance−1) frames, so
    zero-padding to the bucket perturbs the valid frames within that
    window of the pad — the same effect as decoding a zero-padded
    recording. ``bucket=1`` (pad only to the 16-sample hop) minimizes it
    at the cost of one compiled program per distinct length; the
    synthesis-quality benchmark decodes 64-frame-bucketed signals at
    99.95% phoneme accuracy, so the default is fine in practice. (For
    offline exact chunked decoding use `infer.EMGDecoder`.)"""

    def __init__(self, artifact: Path, bucket: int = 64,
                 min_frames: Optional[int] = None, max_concurrent: int = 4):
        from ste_gan_tpu.export import load_exported

        self._exported = load_exported(artifact)
        # Geometry from the artifact itself: channels from the concrete
        # input aval; the minimum frame count from the meta sidecar the
        # export CLI writes (it tracks the encoder's
        # relative_positional_distance — see export_emg_encoder).
        self._call = self._exported.call
        channels = int(self._exported.in_avals[0].shape[-1])
        meta_path = Path(str(artifact) + ".meta.json")
        if min_frames is None:
            if meta_path.exists():
                min_frames = int(json.loads(
                    meta_path.read_text())["min_frames"])
            else:
                min_frames = 101  # the default encoder's rel-pos window + 1
        self._init_common(channels, bucket, min_frames, max_concurrent)

    @classmethod
    def from_checkpoint(cls, cfg, ckpt_path: Path, bucket: int = 64,
                        min_frames: Optional[int] = None,
                        max_concurrent: int = 4) -> "EMGDecoderService":
        """Serve the decode direction straight from an encoder training
        checkpoint (no export step) — the checkpoint twin of the artifact
        constructor. ``cfg`` supplies the encoder architecture
        (``cfg.emg_encoder.params``), e.g. the served run's config.yaml."""
        from ste_gan_tpu.infer import EMGDecoder

        decoder = EMGDecoder.from_checkpoint(cfg, ckpt_path)
        self = cls.__new__(cls)
        self._exported = None
        self._call = lambda padded: decoder._forward(decoder.variables,
                                                     padded)
        if min_frames is None:
            min_frames = decoder.model.relative_positional_distance + 1
        self._init_common(cfg.data.num_emg_channels, bucket, min_frames,
                          max_concurrent)
        return self

    def _init_common(self, channels: int, bucket: int, min_frames: int,
                     max_concurrent: int) -> None:
        self.channels = channels
        self.bucket = max(1, bucket)
        self.min_frames = min_frames
        # Bounded concurrency = the /synthesize queue's backpressure
        # analogue: excess concurrent decodes 503 instead of piling N
        # device calls (and N cold compiles) onto the handler threads.
        self._slots = threading.Semaphore(max(1, max_concurrent))
        self._lat_ms = LatencyWindow()
        self.stats = {"requests": 0, "rejected": 0}
        self._lock = threading.Lock()

    def decode(self, emg: np.ndarray):
        """[T, C] float32 EMG → (units [t, 256], phoneme_logits [t, 48])
        with t = T // 16 (trailing partial frame dropped). Raises
        :class:`ServiceOverloadedError` beyond ``max_concurrent``."""
        emg = np.asarray(emg, np.float32)
        frames = len(emg) // C.HOPSIZE
        if frames < 1:
            raise ValueError(f"EMG too short: {len(emg)} samples "
                             f"(< {C.HOPSIZE})")
        if emg.shape[1] != self.channels:
            raise ValueError(f"expected {self.channels} EMG channels, "
                             f"got {emg.shape[1]}")
        # Bucket AFTER applying the floor so short requests land on the
        # same compiled shape the warmup built.
        pad = _round_up(max(frames, self.min_frames), self.bucket)
        if not self._slots.acquire(blocking=False):
            with self._lock:
                self.stats["rejected"] += 1
            raise ServiceOverloadedError(
                "decoder at max concurrency; retry later")
        try:
            start = time.perf_counter()
            padded = np.zeros((1, pad * C.HOPSIZE, emg.shape[1]), np.float32)
            padded[0, : frames * C.HOPSIZE] = emg[: frames * C.HOPSIZE]
            units, ph = self._call(padded)
            out = (np.asarray(units[0, :frames]), np.asarray(ph[0, :frames]))
        finally:
            self._slots.release()
        with self._lock:
            self.stats["requests"] += 1
        self._lat_ms.record((time.perf_counter() - start) * 1e3)
        return out

    def warmup(self) -> None:
        self.decode(np.zeros((self.min_frames * C.HOPSIZE, self.channels),
                             np.float32))

    def stats_snapshot(self) -> Dict:
        with self._lock:
            s = dict(self.stats)
        s.update(self._lat_ms.percentiles())
        return s


# ---------------------------------------------------------------------------
# HTTP front-end (stdlib; npz in, npy out)
# ---------------------------------------------------------------------------


def make_http_server(service: SynthesisService, host: str = "127.0.0.1",
                     port: int = 8571,
                     decoder: Optional[EMGDecoderService] = None,
                     watchdog: Optional[HostMemoryWatchdog] = None):
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _send_503(self, message: str) -> None:
            body = json.dumps({"error": message}).encode()
            self.send_response(503)
            self.send_header("Content-Type", "application/json")
            self.send_header("Retry-After", "1")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code: int, obj) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_bytes(self, data: bytes) -> None:
            self.send_response(200)
            self.send_header("Content-Type", "application/octet-stream")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def _read_npz(self):
            length = int(self.headers.get("Content-Length", 0))
            return np.load(io.BytesIO(self.rfile.read(length)),
                           allow_pickle=False)

        def do_GET(self):
            if self.path == "/healthz":
                draining = (watchdog is not None
                            and watchdog.draining.is_set())
                # Not-ready during a drain so load balancers stop routing
                # here before the restart closes the socket.
                self._json(503 if draining else 200,
                           {"ok": not draining, "draining": draining})
            elif self.path == "/stats":
                stats = service.batcher.stats_snapshot()
                stats["reloads"] = service.reload_count
                stats["model_source"] = dict(service._source)
                if decoder is not None:
                    stats["decode"] = decoder.stats_snapshot()
                if watchdog is not None:
                    stats["host_memory"] = watchdog.snapshot()
                self._json(200, stats)
            else:
                self._json(404, {"error": "not found"})

        def _read_payload(self):
            payload = self._read_npz()
            feats = payload["feats"]
            session = payload["session"].item() if "session" in payload else 0
            mode = int(payload["mode"].item()) if "mode" in payload else 0
            return feats, session, mode

        def do_POST(self):
            if watchdog is not None:
                if not watchdog.request_starts():
                    self._send_503("server draining to reclaim host "
                                   "memory; restarting — retry shortly")
                    return
            try:
                self._do_post_inner()
            finally:
                if watchdog is not None:
                    watchdog.request_ends()

        def _do_post_inner(self):
            try:
                if self.path == "/synthesize":
                    feats, session, mode = self._read_payload()
                    emg = service.synthesize(feats, session, mode)
                    buf = io.BytesIO()
                    np.save(buf, emg)
                    self._send_bytes(buf.getvalue())
                elif self.path == "/decode":
                    # EMG -> (units, phoneme logits): npz {emg [T,C] f32}
                    # in, npz {units, phoneme_logits} out.
                    if decoder is None:
                        self._json(404, {"error": "no decoder loaded "
                                         "(--decoder_artifact)"})
                        return
                    units, ph = decoder.decode(self._read_npz()["emg"])
                    buf = io.BytesIO()
                    np.savez(buf, units=units, phoneme_logits=ph)
                    self._send_bytes(buf.getvalue())
                elif self.path == "/reload":
                    # Hot-swap weights: JSON body with optional run_dir /
                    # tag / artifact (defaults re-read the current source —
                    # e.g. pick up a newer 'best' checkpoint mid-training).
                    length = int(self.headers.get("Content-Length", 0))
                    body = json.loads(self.rfile.read(length) or b"{}")
                    self._json(200, service.reload(
                        run_dir=body.get("run_dir"), tag=body.get("tag"),
                        artifact=body.get("artifact")))
                elif self.path == "/synthesize_stream":
                    # Length-prefixed f32 chunk frames: each chunk is
                    # 8-byte big-endian byte count + raw float32 [n, C]
                    # bytes; a zero length terminates the stream.
                    feats, session, mode = self._read_payload()
                    # Obtain the iterator BEFORE committing headers — an
                    # artifact-mode service raises NotImplementedError here
                    # and must still be able to answer 501.
                    chunks = service.synthesize_stream(feats, session, mode)
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "application/octet-stream")
                    self.send_header(
                        "X-Emg-Channels",
                        str(service._synth.generator.num_emg_channels))
                    self.end_headers()
                    for chunk in chunks:
                        raw = np.ascontiguousarray(chunk, np.float32).tobytes()
                        self.wfile.write(len(raw).to_bytes(8, "big"))
                        self.wfile.write(raw)
                        self.wfile.flush()
                    self.wfile.write((0).to_bytes(8, "big"))
                else:
                    self._json(404, {"error": "not found"})
            except NotImplementedError as exc:
                self._json(501, {"error": str(exc)})
            except ServiceOverloadedError as exc:
                try:
                    self._send_503(str(exc))
                except Exception:
                    pass
            except Exception as exc:
                try:
                    self._json(400, {"error": f"{type(exc).__name__}: {exc}"})
                except Exception:
                    pass  # headers already sent mid-stream

    return ThreadingHTTPServer((host, port), Handler)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--run_dir", type=Path,
                     help="GAN training run directory (checkpoint mode)")
    src.add_argument("--artifact", type=Path,
                     help="StableHLO serving export "
                          "(scripts/export_generator.py --serving); no "
                          "checkpoint/config needed, streaming disabled")
    ap.add_argument("--tag", default="best")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8571)
    ap.add_argument("--max_batch", type=int, default=8)
    ap.add_argument("--max_wait_ms", type=float, default=5.0)
    ap.add_argument("--bucket", type=int, default=64)
    ap.add_argument("--max_queue", type=int, default=64,
                    help="backpressure high-water mark (503 beyond it)")
    ap.add_argument("--data_parallel", type=int, default=0,
                    help="serve over an N-device 1-D mesh: micro-batch "
                         "rows sharded across devices (checkpoint mode "
                         "only; exact)")
    ap.add_argument("--device", type=str, default="default",
                    choices=("default", "cpu"),
                    help="backend to serve on; multi-platform artifacts "
                         "run on CPU hosts with --device cpu")
    ap.add_argument("--decoder_artifact", type=Path, default=None,
                    help="exported EMG-encoder artifact "
                         "(scripts/export_emg_encoder.py); enables "
                         "POST /decode (EMG -> units + phonemes)")
    ap.add_argument("--decoder_ckpt", type=Path, default=None,
                    help="EMG-encoder training checkpoint (e.g. "
                         "<enc_run>/best_val_loss_model); enables "
                         "POST /decode straight from the checkpoint, no "
                         "export step (requires --run_dir for the encoder "
                         "architecture config)")
    ap.add_argument("--decode_min_frames", type=int, default=None,
                    help="override the decoder's minimum 50 Hz frame "
                         "count (normally read from the artifact's "
                         ".meta.json sidecar: the encoder's rel-pos "
                         "window + 1)")
    ap.add_argument("--host_rss_restart_gb", type=float, default=48.0,
                    help="host-RSS watchdog: past this, drain in-flight "
                         "requests (new ones get 503) and exec-restart "
                         "the process to shed leaked H2D buffers "
                         "(utils/hostmem.py); 0 disables")
    args = ap.parse_args()

    from ste_gan_tpu.utils.jax_setup import enable_compilation_cache

    if args.device == "cpu":
        from ste_gan_tpu.utils.jax_setup import force_platform
        force_platform("cpu")
    enable_compilation_cache()
    if args.artifact is not None:
        if args.data_parallel > 1:
            raise SystemExit("--data_parallel requires checkpoint mode "
                             "(--run_dir): a StableHLO artifact is a fixed "
                             "single-device program")
        service = SynthesisService.from_artifact(
            args.artifact, max_batch=args.max_batch,
            max_wait_ms=args.max_wait_ms, bucket=args.bucket,
            max_queue=args.max_queue)
    else:
        service = SynthesisService.from_run_dir(
            args.run_dir, tag=args.tag, max_batch=args.max_batch,
            max_wait_ms=args.max_wait_ms, bucket=args.bucket,
            max_queue=args.max_queue, data_parallel=args.data_parallel)
    decoder = None
    if args.decoder_artifact is not None:
        decoder = EMGDecoderService(args.decoder_artifact,
                                    bucket=args.bucket,
                                    min_frames=args.decode_min_frames)
    elif args.decoder_ckpt is not None:
        if args.run_dir is None:
            raise SystemExit("--decoder_ckpt needs --run_dir (the run's "
                             "config.yaml supplies the encoder "
                             "architecture); with --artifact use "
                             "--decoder_artifact instead")
        from ste_gan_tpu.config import load_config
        decoder = EMGDecoderService.from_checkpoint(
            load_config(config=Path(args.run_dir) / "config.yaml"),
            args.decoder_ckpt, bucket=args.bucket,
            min_frames=args.decode_min_frames)
    print(f"warming up (bucket={args.bucket})...", flush=True)
    service.warmup(num_frames=args.bucket, batch_sizes=(1,))
    if decoder is not None:
        decoder.warmup()
    watchdog = None
    if args.host_rss_restart_gb > 0:
        watchdog = HostMemoryWatchdog(args.host_rss_restart_gb)
    server = make_http_server(service, args.host, args.port, decoder=decoder,
                              watchdog=watchdog)
    if watchdog is not None:
        # Once drained, stop the accept loop; the exec-restart below then
        # replaces this leaked process on the main thread.
        watchdog.restart_fn = server.shutdown
    endpoints = ("POST /synthesize, POST /reload"
                 + (", POST /decode" if decoder else ""))
    print(f"serving speech->EMG on http://{args.host}:{args.port} "
          f"({endpoints}, GET /healthz, GET /stats)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        service.close()
    if watchdog is not None and watchdog.restart_fired.is_set():
        import os
        import sys

        argv = [sys.executable, "-m", "ste_gan_tpu.serve",
                *_restart_argv(sys.argv[1:], service._source)]
        server.server_close()  # free the port for the next incarnation
        logging.warning("serve: exec-restart at RSS %.1f GiB: %s",
                        watchdog.last_rss_gb, " ".join(argv))
        os.execv(sys.executable, argv)


if __name__ == "__main__":
    main()
