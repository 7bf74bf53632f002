from ic_gan_tpu.ops.spectral_norm import power_iteration, spectral_normalize
from ic_gan_tpu.ops.resample import (
    upsample_nearest_2x,
    avg_pool_2x,
    max_pool_2x,
    upfirdn2d,
    setup_filter,
)
from ic_gan_tpu.ops.bias_act import bias_act, activation_funcs

__all__ = [
    "power_iteration",
    "spectral_normalize",
    "upsample_nearest_2x",
    "avg_pool_2x",
    "max_pool_2x",
    "upfirdn2d",
    "setup_filter",
    "bias_act",
    "activation_funcs",
]
