"""Convert a TFHub BigGAN variable dump to framework checkpoints.

Front-end for ``io/tfhub_import.py`` mirroring the reference's
``BigGAN_PyTorch/TFHub/converter.py`` CLI: input is the intermediate
variable-dump HDF5 (``biggan-{res}.h5`` — its producer needs TFHub/TF, see
``dump_tfhub_to_hdf5``, converter.py:49-81), output is our native msgpack
checkpoint and/or a reference-layout ``.pth``-style state dict (saved via
torch) so both toolchains can consume the converted model.

    python -m ic_gan_tpu.cli.convert_tfhub --set dump=biggan-128.h5 \
        resolution=128 out=tfhub_biggan128.msgpack pth_out=biggan-128.pth \
        sample_grid=samples.png
"""

from __future__ import annotations

import numpy as np

from ic_gan_tpu.cli.config import parse_args


def main(argv=None):
    cfg = parse_args(argv)
    res = cfg.get("resolution", 128)

    from ic_gan_tpu.io.tfhub_import import load_tfhub_generator

    variables, model_cfg = load_tfhub_generator(
        cfg["dump"], res, load_ema=not cfg.get("no_ema", False))
    print(f"converted TFHub biggan-{res}: "
          f"{sum(np.prod(x.shape) for x in __import__('jax').tree.leaves(variables['params'])):,} G params")

    if cfg.get("out"):
        import dataclasses
        import os

        from ic_gan_tpu.io.checkpoint import save_checkpoint

        path = save_checkpoint(
            os.path.dirname(cfg["out"]) or ".", os.path.basename(cfg["out"]),
            variables,
            config={k: v for k, v in dataclasses.asdict(model_cfg).items()
                    if k != "dtype"})
        print("wrote", path)

    if cfg.get("pth_out"):
        import torch

        from ic_gan_tpu.io.torch_import import export_generator_state_dict

        sd = {k: torch.from_numpy(np.asarray(v)) for k, v in
              export_generator_state_dict(variables, model_cfg).items()}
        torch.save(sd, cfg["pth_out"])
        print("wrote", cfg["pth_out"])

    if cfg.get("sample_grid"):
        # Reference generates test samples after conversion
        # (converter.py:462-476); same smoke here, σ-folded.
        import jax
        import jax.numpy as jnp

        from ic_gan_tpu.io.deploy import cast_params, fold_spectral_norm
        from ic_gan_tpu.models.biggan import Generator
        from ic_gan_tpu.cli.inference import save_image_grid

        g = Generator(model_cfg)
        folded = cast_params(fold_spectral_norm(variables))
        n = cfg.get("sample_batch", 16)
        z = jax.random.normal(jax.random.PRNGKey(cfg.get("seed", 0)),
                              (n, model_cfg.effective_dim_z))
        y = jax.random.randint(jax.random.PRNGKey(1), (n,), 0,
                               model_cfg.n_classes)
        imgs = jax.jit(
            lambda v: g.apply(v, z, y, None, train=False))(folded)
        save_image_grid(np.asarray(imgs), cfg["sample_grid"])
        print("wrote", cfg["sample_grid"])

    return variables, model_cfg


if __name__ == "__main__":
    main()
