"""The MFCC input variant: x8 upsampling generator + fused train step
(reference: upsample_last=1; ste_gan/models/generator.py:116)."""
import jax
import jax.numpy as jnp
import numpy as np

from ste_gan_tpu import constants as C
from ste_gan_tpu.config import Config
from ste_gan_tpu.models.discriminator import DiscriminatorEnsemble
from ste_gan_tpu.models.emg_encoder import EMGEncoderTransformer
from ste_gan_tpu.models.generator import EMGGeneratorGanTTS
from ste_gan_tpu.train.gan import GANModels, init_state, make_train_step

TINY_PERIOD_SPEC = ((8, 3, 1, 2), (16, 3, 3, 2))
TINY_SCALE_SPEC = ((8, 15, 1, 1, 7), (16, 5, 2, 4, 2))


def test_mfcc_train_step_runs_and_decreases():
    cfg = Config()
    cfg.model.speech_feature_type = C.DataType.MFCCS
    cfg.train.chunk_size = 512
    cfg.train.batch_size = 4
    cfg.train.mixed_precision = False
    cfg.data.num_emg_sessions = 4

    models = GANModels(
        generator=EMGGeneratorGanTTS(
            speech_feature_type=C.DataType.MFCCS,
            speech_input_dim=C.NUM_MFCCS, num_sessions=4, channels=32),
        discriminator=DiscriminatorEnsemble(
            num_multi_pool=2, num_multi_scale=2,
            period_spec_override=TINY_PERIOD_SPEC,
            scale_spec_override=TINY_SCALE_SPEC),
        encoder=EMGEncoderTransformer(
            model_size=32, num_extra_res_blocks=3, num_transformer_layers=1,
            num_heads=4, dim_feedforward=64, dropout=0.0),
    )
    rng = jax.random.PRNGKey(0)
    enc_vars = models.encoder.init(rng, jnp.zeros((1, 512, 8)), train=False)
    state = init_state(cfg, models, rng)

    b = cfg.train.batch_size
    su_frames = cfg.train.chunk_size // C.HOPSIZE       # 32 at 50 Hz
    mfcc_frames = 2 * su_frames                          # 64 at 100 Hz
    rng_np = np.random.default_rng(0)
    batch = {
        C.DataType.REAL_EMG: jnp.asarray(
            np.tanh(rng_np.normal(0, 0.4, (b, 512, 8))), jnp.float32),
        C.DataType.MFCCS: jnp.asarray(
            rng_np.normal(size=(b, mfcc_frames, C.NUM_MFCCS)), jnp.float32),
        C.DataType.SPEECH_UNITS: jnp.asarray(
            rng_np.normal(size=(b, su_frames, 256)), jnp.float32),
        C.DataType.PHONEMES: jnp.asarray(
            rng_np.integers(0, C.NUM_PHONEMES, (b, su_frames)), jnp.int32),
        C.DataType.SESSION_INDEX: jnp.zeros((b,), jnp.int32),
        C.DataType.SPEAKING_MODE_INDEX: jnp.zeros((b,), jnp.int32),
    }

    # The x8 generator maps 64 MFCC frames -> 512 EMG samples.
    fake = models.generator.apply({"params": state.gen_params},
                                  batch[C.DataType.MFCCS],
                                  batch[C.DataType.SESSION_INDEX],
                                  batch[C.DataType.SPEAKING_MODE_INDEX])
    assert fake.shape == (b, 512, 8)

    step = jax.jit(make_train_step(cfg, models), donate_argnums=0)
    losses = []
    for _ in range(12):
        state, metrics = step(state, batch, enc_vars)
        losses.append(float(metrics["loss/generator"]))
    assert losses[-1] < losses[0]
