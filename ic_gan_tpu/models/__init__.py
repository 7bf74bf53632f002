from ic_gan_tpu.models import biggan, biggan_deep, stylegan2
from ic_gan_tpu.models.biggan import BigGANConfig
from ic_gan_tpu.models.biggan_deep import BigGANDeepConfig
from ic_gan_tpu.models.stylegan2 import StyleGAN2Config

__all__ = [
    "biggan",
    "biggan_deep",
    "stylegan2",
    "BigGANConfig",
    "BigGANDeepConfig",
    "StyleGAN2Config",
]
