from ste_gan_tpu.data.dataset import EMGDataset  # noqa: F401
from ste_gan_tpu.data.collate import ste_gan_collate  # noqa: F401
from ste_gan_tpu.data.loader import loaders, loaders_via_config  # noqa: F401
from ste_gan_tpu.data.synthetic import generate_synthetic_corpus  # noqa: F401
