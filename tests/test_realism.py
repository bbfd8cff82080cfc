"""Distribution-level realism metrics (ste_gan_tpu/realism.py).

These metrics exist to measure what no training loss optimises directly
(VERDICT r3 #1): Fréchet distance over frozen-encoder embeddings, pooled
TD-feature Wasserstein distances, and the log-spectral distance. Tests pin
the analytic cases, the identity-is-zero property, ordering under
increasing corruption, and the evaluate-CLI wiring."""
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ste_gan_tpu import realism as R
from ste_gan_tpu.config import Config
from ste_gan_tpu.models.emg_encoder import init_emg_encoder

from tests.test_evaluate import corpus, gan_run  # noqa: F401 (fixtures)


class TestFrechet:
    def test_identical_gaussians_zero(self, rng):
        x = rng.normal(size=(2000, 8))
        mu, cov = R.gaussian_stats(x)
        assert abs(R.frechet_distance(mu, cov, mu, cov)) < 1e-8

    def test_analytic_diagonal_case(self):
        # For diagonal covariances the distance is
        # |mu1-mu2|^2 + sum((sigma1-sigma2)^2).
        mu1, mu2 = np.zeros(3), np.array([1.0, 0.0, -2.0])
        s1, s2 = np.array([1.0, 2.0, 0.5]), np.array([2.0, 1.0, 0.5])
        got = R.frechet_distance(mu1, np.diag(s1**2), mu2, np.diag(s2**2))
        want = float(np.sum((mu1 - mu2) ** 2) + np.sum((s1 - s2) ** 2))
        assert abs(got - want) < 1e-9

    def test_from_frames_orders_corruption(self, rng):
        base = rng.normal(size=(3000, 6))
        near = base + 0.1 * rng.normal(size=base.shape)
        far = base + 1.5 * rng.normal(size=base.shape) + 1.0
        d_near = R.frechet_from_frames(base, near)
        d_far = R.frechet_from_frames(base, far)
        assert 0 <= d_near < d_far


class TestWasserstein:
    def test_shift_recovered(self, rng):
        a = rng.normal(size=5000)
        assert abs(R.wasserstein1(a, a + 3.0) - 3.0) < 0.05

    def test_identical_zero(self, rng):
        a = rng.normal(size=1000)
        assert R.wasserstein1(a, a) < 1e-12


def _sine_emg(rng, t=2048, channels=8, noise=0.0):
    phase = np.cumsum(np.full((t, 1), 2 * np.pi * 60 / 800.0), axis=0)
    x = 0.5 * np.sin(phase + rng.uniform(0, 2 * np.pi, size=(1, channels)))
    return np.tanh(x + noise * rng.normal(size=(t, channels))).astype(
        np.float32)


class TestSignalMetrics:
    def test_td_and_lsd_identity_zero(self, rng):
        sigs = [_sine_emg(rng) for _ in range(3)]
        report = R.realism_from_signals(sigs, [s.copy() for s in sigs])
        assert report["td_wasserstein"]["mean"] < 1e-9
        assert report["log_spectral_distance"]["mean_db"] < 1e-9
        assert "fed" not in report  # no embed_fn given

    def test_corruption_ordering(self, rng):
        real = [_sine_emg(rng) for _ in range(4)]
        near = [np.tanh(s + 0.05 * rng.normal(size=s.shape)).astype(
            np.float32) for s in real]
        far = [np.tanh(rng.normal(size=s.shape)).astype(np.float32)
               for s in real]
        rep_near = R.realism_from_signals(real, near)
        rep_far = R.realism_from_signals(real, far)
        assert (rep_near["td_wasserstein"]["mean"]
                < rep_far["td_wasserstein"]["mean"])
        assert (rep_near["log_spectral_distance"]["mean_db"]
                < rep_far["log_spectral_distance"]["mean_db"])


class TestEncoderEmbedding:
    def test_embed_is_prehead_space(self, rng):
        """w_out(embed(x)) must equal the __call__ speech-unit output —
        embeddings are exactly the pre-head space the losses never see."""
        cfg = Config()
        cfg.emg_encoder.params = {
            "model_size": 32, "num_extra_res_blocks": 3,
            "num_transformer_layers": 2, "dropout": 0.0,
        }
        model = init_emg_encoder(cfg)
        x = jnp.asarray(rng.normal(size=(2, 512, 8)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
        emb = model.apply(variables, x, method="embed")
        assert emb.shape == (2, 512 // 16, 32)
        su, _ = model.apply(variables, x, train=False)
        w = variables["params"]["w_out"]
        su_from_emb = emb @ w["kernel"] + w["bias"]
        np.testing.assert_allclose(np.asarray(su_from_emb), np.asarray(su),
                                   rtol=1e-5, atol=1e-5)

    def test_frame_embeddings_only_valid_frames(self, rng):
        cfg = Config()
        cfg.emg_encoder.params = {
            "model_size": 32, "num_extra_res_blocks": 3,
            "num_transformer_layers": 1, "dropout": 0.0,
        }
        model = init_emg_encoder(cfg)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 256, 8)), train=False)
        embed_fn = jax.jit(lambda e: model.apply(variables, e,
                                                 method="embed"))
        sigs = [rng.normal(size=(400, 8)).astype(np.float32),
                rng.normal(size=(656, 8)).astype(np.float32)]
        frames = R.encoder_frame_embeddings(embed_fn, sigs,
                                            bucket_frames=16)
        assert frames.shape == (400 // 16 + 656 // 16, 32)
        assert np.isfinite(frames).all()


class TestEvaluateWiring:
    def test_cli_flag_writes_realism_report(self, gan_run, tmp_path):  # noqa: F811
        from ste_gan_tpu import evaluate as ev

        run_dir, enc_ckpt = gan_run
        out = tmp_path / "report.json"
        report = ev.main(["gan", "--run_dir", str(run_dir),
                          "--emg_enc_ckpt", str(enc_ckpt),
                          "--bucket_frames", "16", "--realism",
                          "--out", str(out)])
        on_disk = json.loads(out.read_text())
        assert on_disk["realism"]["fed"] == report["realism"]["fed"]

    def test_evaluate_gan_realism_section(self, gan_run):  # noqa: F811
        from ste_gan_tpu import evaluate as ev

        run_dir, enc_ckpt = gan_run
        report = ev.evaluate_gan(run_dir, enc_ckpt, partition="valid",
                                 realism=True, bucket_frames=16)
        rl = report["realism"]
        assert rl["num_utterances"] == 2
        assert np.isfinite(rl["fed"]) and rl["fed"] >= 0
        assert np.isfinite(rl["td_wasserstein"]["mean"])
        assert np.isfinite(rl["log_spectral_distance"]["mean_db"])
        assert len(rl["log_spectral_distance"]["per_channel_db"]) == 8


class TestMomentPathConsistency:
    """The bootstrap machinery's moment-statistics path must agree exactly
    with the direct-computation path it resamples (VERDICT r4 #1)."""

    def _embed(self):
        # A cheap linear "embedding": mean over each hop window + a fixed
        # projection, shaped like embed_fn ([1,T,C] -> [1,T/hop,D]).
        proj = np.random.default_rng(5).normal(size=(8, 16)).astype(np.float32)

        def fn(emg):
            x = np.asarray(emg)
            b, t, c = x.shape
            frames = x.reshape(b, t // 16, 16, c).mean(axis=2)
            return frames @ proj

        return fn

    def test_fed_from_moments_matches_frames(self, rng):
        emg_a = [rng.normal(size=(320, 8)).astype(np.float32) for _ in range(6)]
        emg_b = [rng.normal(0.2, 1.1, size=(320, 8)).astype(np.float32)
                 for _ in range(6)]
        fn = self._embed()
        frames_a = R.encoder_frame_embeddings(fn, emg_a, bucket_frames=4)
        frames_b = R.encoder_frame_embeddings(fn, emg_b, bucket_frames=4)
        want = R.frechet_from_frames(frames_a, frames_b)
        got = R.fed_from_moments(
            R.embedding_moment_stats(fn, emg_a, bucket_frames=4),
            R.embedding_moment_stats(fn, emg_b, bucket_frames=4))
        np.testing.assert_allclose(got, want, rtol=1e-8)

    def test_lsd_from_psds_matches_average_psd(self, rng):
        emg_a = [rng.normal(size=(300 + 40 * i, 8)) for i in range(5)]
        emg_b = [rng.normal(0, 1.3, size=(300 + 40 * i, 8)) for i in range(5)]
        want = R.log_spectral_distance(
            R.average_psd(emg_a), R.average_psd(emg_b))["mean_db"]
        psd_a, w = R.per_utterance_psds(emg_a)
        psd_b, _ = R.per_utterance_psds(emg_b)
        got = R.lsd_from_psds(psd_a, psd_b, w)
        np.testing.assert_allclose(got, want, rtol=1e-10)

    def test_bootstrap_paired_delta_identical_systems_is_zero(self, rng):
        emg_real = [rng.normal(size=(320, 8)).astype(np.float32)
                    for _ in range(8)]
        emg_fake = [rng.normal(0.1, 1.0, size=(320, 8)).astype(np.float32)
                    for _ in range(8)]
        fn = self._embed()
        m_real = R.embedding_moment_stats(fn, emg_real, bucket_frames=4)
        m_fake = R.embedding_moment_stats(fn, emg_fake, bucket_frames=4)
        psd_r, w = R.per_utterance_psds(emg_real)
        psd_f, _ = R.per_utterance_psds(emg_fake)
        out = R.bootstrap_paired_realism_delta(
            m_real, m_fake, m_fake, psd_r, psd_f, psd_f, w, n_boot=25)
        assert out["fed"]["delta"] == 0.0
        assert out["fed"]["ci95"] == [0.0, 0.0]
        assert out["lsd_db"]["ci95"] == [0.0, 0.0]

    def test_bootstrap_detects_a_clear_winner(self, rng):
        emg_real = [rng.normal(size=(320, 8)).astype(np.float32)
                    for _ in range(10)]
        close = [x + rng.normal(0, 0.1, x.shape).astype(np.float32)
                 for x in emg_real]
        far = [rng.normal(2.0, 3.0, size=(320, 8)).astype(np.float32)
               for _ in range(10)]
        fn = self._embed()
        m_real = R.embedding_moment_stats(fn, emg_real, bucket_frames=4)
        m_a = R.embedding_moment_stats(fn, close, bucket_frames=4)
        m_b = R.embedding_moment_stats(fn, far, bucket_frames=4)
        psd_r, w = R.per_utterance_psds(emg_real)
        psd_a, _ = R.per_utterance_psds(close)
        psd_b, _ = R.per_utterance_psds(far)
        out = R.bootstrap_paired_realism_delta(
            m_real, m_a, m_b, psd_r, psd_a, psd_b, w, n_boot=50)
        # A (close) beats B (far): delta < 0, CI excludes 0, every
        # resample agrees.
        assert out["fed"]["delta"] < 0 and out["fed"]["ci95"][1] < 0
        assert out["lsd_db"]["ci95"][1] < 0
        assert out["fed"]["frac_a_better"] == 1.0
