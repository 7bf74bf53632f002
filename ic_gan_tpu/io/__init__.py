from ic_gan_tpu.io import checkpoint, deploy, stylegan_import, torch_import
from ic_gan_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from ic_gan_tpu.io.deploy import cast_params, fold_spectral_norm

__all__ = ["checkpoint", "deploy", "stylegan_import", "torch_import",
           "load_checkpoint", "save_checkpoint", "cast_params",
           "fold_spectral_norm"]
