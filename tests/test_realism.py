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
