"""Qualitative generation from stored instance features
(reference: ``inference/generate_images.py``).

Usage:
    python -m ic_gan_tpu.cli.generate_images --json_config cfg.json \
        --set stored_features=path.npy num_imgs_gen=5 out_path=out.png

The stored-features npy can instead be located by the reference's filename
convention (``generate_images.py:25-37``) from ``root_path`` +
``which_dataset`` + ``resolution`` [+ ``model``].  ``index`` pins every row
to one k-means center; ``visualize_instance_images`` prepends the
ground-truth instance image column (center-crop-long-edge + resize, 20-px
white gutter — ``generate_images.py:198-215``), resolving each stored
``image_path`` against ``dataset_path``.
"""

from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp

from ic_gan_tpu.cli.config import parse_args
from ic_gan_tpu.cli.inference import (
    get_conditionings,
    load_model_inference,
    load_stored_instances,
    stored_instances_path,
)


def _load_gt_instances(image_paths, idxs, dataset_path: str, resolution: int):
    """Ground-truth instance images as one (N*res, res, 3) uint8 column
    (ref ``generate_images.py:198-210``)."""
    from PIL import Image

    from ic_gan_tpu.data.image_datasets import _center_crop_resize

    rows = []
    for i in idxs:
        p = str(image_paths[int(i)])
        if isinstance(image_paths[int(i)], (list, tuple, np.ndarray)):
            p = str(np.asarray(image_paths[int(i)]).reshape(-1)[0])
        img = Image.open(os.path.join(dataset_path, p)).convert("RGB")
        rows.append(np.asarray(_center_crop_resize(img, resolution),
                               np.uint8))
    return np.concatenate(rows, axis=0)


def main(argv=None):
    cfg = parse_args(argv)
    apply_fn, model_cfg = load_model_inference(cfg)
    resolution = getattr(model_cfg, "resolution",
                         getattr(model_cfg, "img_resolution", None))

    # Stored 1000-k-means instance features: explicit path, or the
    # reference's convention under root_path (ref generate_images.py:25-45).
    feats_path = cfg.get("stored_features")
    if not feats_path:
        feats_path = stored_instances_path(
            cfg.get("root_path", "."), cfg.get("which_dataset", "imagenet"),
            resolution, cfg.get("model", "icgan"),
        )
    features, labels, image_paths = load_stored_instances(feats_path)

    num_instances = cfg.get("num_conditionings_gen", 5)
    num_imgs_gen = cfg.get("num_imgs_gen", 5)
    dim_z = getattr(model_cfg, "effective_dim_z", getattr(model_cfg, "z_dim", 128))
    z, lab, f, idxs = get_conditionings(
        num_instances, num_imgs_gen, features, labels, dim_z,
        z_var=cfg.get("z_var", 1.0),
        swap_target=cfg.get("swap_target"),
        seed=cfg.get("seed", 0),
        index=cfg.get("index"),
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
    images = np.concatenate(outs)  # (rows*cols, H, W, 3) in [-1, 1]

    # Row-major grid: one row per conditioning, num_imgs_gen columns
    # (ref generate_images.py:187-196).
    images = np.clip((images + 1) * 127.5, 0, 255).astype(np.uint8)
    n, h, w, c = images.shape
    rows = images.reshape(len(idxs), num_imgs_gen, h, w, c)
    big_plot = np.concatenate(
        [np.concatenate(list(r), axis=1) for r in rows], axis=0
    )

    if cfg.get("visualize_instance_images", False):
        if image_paths is None:
            raise ValueError(
                "visualize_instance_images needs a stored-features npy with "
                "an 'image_path' entry"
            )
        gt = _load_gt_instances(
            image_paths, idxs, cfg.get("dataset_path", ""), h
        )
        gutter = np.full((gt.shape[0], 20, gt.shape[2]), 255, np.uint8)
        big_plot = np.concatenate([gt, gutter, big_plot], axis=1)

    out_path = cfg.get("out_path", "generated.png")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    from PIL import Image

    Image.fromarray(big_plot).save(out_path)
    print(f"wrote {len(images)} images to {out_path}")
    return out_path


if __name__ == "__main__":
    main()
