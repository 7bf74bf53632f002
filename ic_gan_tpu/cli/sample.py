"""Dump generated samples as individual JPEGs
(reference: ``inference/sample.py:35-137``).

    python -m ic_gan_tpu.cli.sample --json_config cfg.json \
        --set num_imgs=1000 out_dir=samples/
"""

from __future__ import annotations

import os

import numpy as np

import jax
import jax.numpy as jnp

from ic_gan_tpu.cli.config import parse_args, split_config
from ic_gan_tpu.cli.inference import load_model_inference


def main(argv=None):
    cfg = parse_args(argv)
    apply_fn, model_cfg = load_model_inference(cfg)

    from ic_gan_tpu.data.datasets import get_dataset_hdf5

    _, _, _, data_kwargs = split_config(cfg)
    dataset = get_dataset_hdf5(**data_kwargs)

    from PIL import Image

    out_dir = cfg.get("out_dir", "samples")
    os.makedirs(out_dir, exist_ok=True)
    num = cfg.get("num_imgs", 100)
    batch = cfg.get("batch_size", 32)
    dim_z = model_cfg.effective_dim_z
    count = 0
    while count < num:
        b = min(batch, num - count)
        rng = jax.random.PRNGKey(cfg.get("seed", 0) + count)
        labels, feats = dataset.sample_conditioning_instance_balance(b)
        z = jax.random.normal(rng, (b, dim_z)) * np.sqrt(cfg.get("z_var", 1.0))
        imgs = apply_fn(
            z,
            jnp.asarray(labels) if model_cfg.class_cond else None,
            jnp.asarray(feats) if model_cfg.instance_cond else None,
        )
        arr = ((np.asarray(imgs) + 1) / 2 * 255).clip(0, 255).astype(np.uint8)
        for i in range(b):
            Image.fromarray(arr[i]).save(
                os.path.join(out_dir, f"{count + i:06d}.jpg")
            )
        count += b
    print(f"wrote {count} JPEGs to {out_dir}")


if __name__ == "__main__":
    main()
