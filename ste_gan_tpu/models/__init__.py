from ste_gan_tpu.models.generator import EMGGeneratorGanTTS, init_emg_generator  # noqa: F401
from ste_gan_tpu.models.discriminator import (  # noqa: F401
    DiscriminatorEnsemble,
    init_emg_discriminators,
)
from ste_gan_tpu.models.emg_encoder import EMGEncoderTransformer, init_emg_encoder  # noqa: F401
