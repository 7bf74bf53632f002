"""Qualitative generation from stored instance features
(reference: ``inference/generate_images.py``).

Usage:
    python -m ic_gan_tpu.cli.generate_images --json_config cfg.json \
        --set stored_features=path.npy num_imgs_gen=5 out_path=out.png
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ic_gan_tpu.cli.config import parse_args
from ic_gan_tpu.cli.inference import (
    get_conditionings,
    load_model_inference,
    load_stored_features,
    save_image_grid,
)


def main(argv=None):
    cfg = parse_args(argv)
    apply_fn, model_cfg = load_model_inference(cfg)

    # Stored 1000-k-means instance features (ref generate_images.py:25-45).
    features, labels = load_stored_features(cfg["stored_features"])

    num_instances = cfg.get("num_conditionings_gen", 5)
    num_imgs_gen = cfg.get("num_imgs_gen", 5)
    dim_z = getattr(model_cfg, "effective_dim_z", getattr(model_cfg, "z_dim", 128))
    z, lab, f = get_conditionings(
        num_instances, num_imgs_gen, features, labels, dim_z,
        z_var=cfg.get("z_var", 1.0),
        swap_target=cfg.get("swap_target"),
        seed=cfg.get("seed", 0),
    )
    batch = cfg.get("batch_size", 32)
    outs = []
    for lo in range(0, len(z), batch):
        imgs = apply_fn(
            jnp.asarray(z[lo : lo + batch]),
            None if lab is None else jnp.asarray(lab[lo : lo + batch]),
            jnp.asarray(f[lo : lo + batch]),
        )
        outs.append(np.asarray(imgs))
    images = np.concatenate(outs)
    out_path = cfg.get("out_path", "generated.png")
    save_image_grid(images, out_path, nrow=num_imgs_gen)
    print(f"wrote {len(images)} images to {out_path}")


if __name__ == "__main__":
    main()
