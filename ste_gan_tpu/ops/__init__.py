from ste_gan_tpu.ops.conv import (  # noqa: F401
    Conv,
    SNConv,
    WNConv,
    avg_pool1d,
    moving_average,
    reflect_pad_time,
    upsample_nearest,
)
from ste_gan_tpu.ops.framing import frame_reduce  # noqa: F401
