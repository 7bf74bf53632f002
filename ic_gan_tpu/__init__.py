"""ic_gan_tpu — a TPU-native (JAX / pjit / Pallas) re-design of IC-GAN.

Instance-Conditioned GAN (arXiv:2109.05070) rebuilt from scratch for TPU:

- ``ops``       fused/elementary ops: spectral norm (explicit power-iteration state),
                cross-replica batch norm (global-batch semantics under pjit),
                upfirdn2d / bias_act (XLA reference + Pallas kernels).
- ``models``    BigGAN and StyleGAN2-ADA generator/discriminator graphs (Flax, NHWC).
- ``data``      conditioning distributions, instance-feature banks with on-TPU
                k-NN / k-means, dataset readers, DiffAugment/ADA.
- ``train``     unified GAN train step: hinge/non-saturating losses, microbatch
                gradient accumulation via ``lax.scan``, EMA, pjit data parallelism.
- ``eval``      Inception features, FID/IS/PRDC/stratified-FID.
- ``io``        native pytree checkpoints + converters for the reference's
                PyTorch ``.pth`` bundles and StyleGAN2 pickles.
- ``parallel``  mesh / sharding helpers.

Capability map mirrors facebookresearch/ic_gan (see SURVEY.md for the component
inventory); the architecture does not — everything here is designed for XLA's
compilation model and the TPU memory hierarchy.
"""

__version__ = "0.1.0"
