from ste_gan_tpu.losses.td_loss import (  # noqa: F401
    DEFAULT_TD_WINDOWS,
    multi_time_domain_loss,
    time_domain_features,
    time_domain_loss,
)
from ste_gan_tpu.losses.gan_loss import (  # noqa: F401
    discriminator_loss,
    feature_matching_loss,
    generator_adversarial_loss,
)
from ste_gan_tpu.losses.encoder_loss import (  # noqa: F401
    emg_encoder_loss,
    phoneme_count_metrics,
    speech_unit_distance,
)
