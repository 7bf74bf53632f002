"""Dump generated samples as individual JPEGs
(reference: ``inference/sample.py:35-137``).

    python -m ic_gan_tpu.cli.sample --json_config cfg.json \
        --set num_imgs=1000 out_dir=samples/
"""

from __future__ import annotations

import os

import numpy as np


from ic_gan_tpu.cli.config import parse_args, split_config
from ic_gan_tpu.cli.inference import (
    conditioning_flags,
    load_model_inference,
    make_conditioned_sampler,
)


def main(argv=None):
    cfg = parse_args(argv)
    apply_fn, model_cfg = load_model_inference(cfg)

    from ic_gan_tpu.data.datasets import get_dataset_hdf5

    _, _, _, data_kwargs = split_config(cfg)
    # The network decides the conditioning the dataset must serve (SG2
    # configs carry h_dim/c_dim, not BigGAN's class_cond/instance_cond).
    class_cond, instance_cond = conditioning_flags(cfg, model_cfg)
    data_kwargs["class_cond"] |= class_cond
    data_kwargs["instance_cond"] |= instance_cond
    dataset = get_dataset_hdf5(**data_kwargs)
    sample = make_conditioned_sampler(cfg, apply_fn, model_cfg, dataset)

    from PIL import Image

    out_dir = cfg.get("out_dir", "samples")
    os.makedirs(out_dir, exist_ok=True)
    num = cfg.get("num_imgs", 100)
    batch = cfg.get("batch_size", 32)
    count = 0
    while count < num:
        b = min(batch, num - count)
        imgs, _ = sample(b)
        arr = ((np.asarray(imgs) + 1) / 2 * 255).clip(0, 255).astype(np.uint8)
        for i in range(b):
            Image.fromarray(arr[i]).save(
                os.path.join(out_dir, f"{count + i:06d}.jpg")
            )
        count += b
    print(f"wrote {count} JPEGs to {out_dir}")


if __name__ == "__main__":
    main()
