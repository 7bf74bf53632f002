"""Data preparation: build the HDF5s, feature banks, k-NN tables, reference
moments, and k-means instance selections.

Reference pipeline (``data_utils/prepare_data.sh`` + ``make_hdf5.py`` +
``make_hdf5_nns.py`` + ``store_kmeans_indexes.py`` +
``calculate_inception_moments.py``), unified in one CLI:

    python -m ic_gan_tpu.cli.prepare_data --set data_root=... out_path=... \
        resolution=64 which_dataset=imagenet feature_extractor=selfsupervised

Feature extraction runs the Flax ResNet-50 on device (224² bicubic, ref
``make_hdf5.py:232-243``); k-NN/k-means run as TPU matmuls (faiss
replacement).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ic_gan_tpu.cli.config import parse_args
from ic_gan_tpu.data.datasets import hdf5_filenames, kmeans_filename


def iter_image_folder(root: str, resolution: int, batch: int = 256):
    """Walk an ImageNet-layout directory (class subdirs) and yield
    ``(uint8 CHW images, labels)`` batches at the target resolution
    (center-crop + resize, ref ``make_hdf5.py`` CenterCropLongEdge)."""
    from PIL import Image

    classes = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    class_to_idx = {c: i for i, c in enumerate(classes)}
    imgs, labels = [], []
    for c in classes:
        cdir = os.path.join(root, c)
        for fname in sorted(os.listdir(cdir)):
            if not fname.lower().endswith((".jpg", ".jpeg", ".png")):
                continue
            img = Image.open(os.path.join(cdir, fname)).convert("RGB")
            w, h = img.size
            s = min(w, h)
            img = img.crop(((w - s) // 2, (h - s) // 2,
                            (w + s) // 2, (h + s) // 2))
            img = img.resize((resolution, resolution), Image.BILINEAR)
            imgs.append(np.transpose(np.asarray(img, np.uint8), (2, 0, 1)))
            labels.append(class_to_idx[c])
            if len(imgs) == batch:
                yield np.stack(imgs), np.asarray(labels, np.int64)
                imgs, labels = [], []
    if imgs:
        yield np.stack(imgs), np.asarray(labels, np.int64)


def build_xy_hdf5(image_iter, out_path: str, chunk: int = 500):
    """Stream images/labels into ``*_xy.hdf5`` (uint8 CHW + int64, chunked —
    ref ``make_hdf5.py:254-330``; same chunk-500 layout, which benchmarks
    fastest for batch gathers once reads go through
    ``HDF5Dataset._read_h5_rows`` — see ``benchmarks/bench_dataloader.py``)."""
    import os

    import h5py

    # Write to a temp file and rename: an interrupted run must not leave a
    # truncated hdf5 that later runs mistake for a finished one.
    tmp_path = out_path + ".tmp"
    with h5py.File(tmp_path, "w") as f:
        imgs_ds = labels_ds = None
        n = 0
        for imgs, labels in image_iter:
            if imgs_ds is None:
                shape = imgs.shape[1:]
                imgs_ds = f.create_dataset(
                    "imgs", (0,) + shape, maxshape=(None,) + shape,
                    dtype=np.uint8, chunks=(min(chunk, 500),) + shape,
                )
                labels_ds = f.create_dataset(
                    "labels", (0,), maxshape=(None,), dtype=np.int64,
                    chunks=(min(chunk, 500),),
                )
            imgs_ds.resize(n + len(imgs), 0)
            labels_ds.resize(n + len(imgs), 0)
            imgs_ds[n:] = imgs
            labels_ds[n:] = labels
            n += len(imgs)
    os.replace(tmp_path, out_path)
    return n


def extract_features(
    xy_path: str,
    out_path: str,
    weights_path: Optional[str] = None,
    batch: int = 128,
    hflip_bank: bool = True,
):
    """ResNet-50 features at 224² bicubic (+ the hflip bank used for feature
    augmentation; ref ``make_hdf5.py:232-330``)."""
    import h5py

    from ic_gan_tpu.models.resnet import ResNet50, load_torch_resnet50, preprocess

    net = ResNet50()
    if weights_path and os.path.exists(weights_path):
        import torch

        sd = torch.load(weights_path, map_location="cpu")
        sd = sd.get("state_dict", sd)
        variables = load_torch_resnet50(
            {k: v.numpy() for k, v in sd.items()}
        )
    else:
        print("WARNING: no feature-extractor weights; using random init "
              "(pipeline-test only).")
        variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))

    fwd = jax.jit(lambda v, x: net.apply(v, preprocess(x))[0])

    tmp_path = out_path + ".tmp"
    with h5py.File(xy_path, "r") as fin, h5py.File(tmp_path, "w") as fout:
        n = len(fin["labels"])
        feats_ds = fout.create_dataset("feats", (n, 2048), dtype=np.float32)
        hflip_ds = (
            fout.create_dataset("feats_hflip", (n, 2048), dtype=np.float32)
            if hflip_bank else None
        )
        for lo in range(0, n, batch):
            hi = min(lo + batch, n)
            imgs = fin["imgs"][lo:hi]
            x = jnp.asarray(
                np.transpose(imgs, (0, 2, 3, 1)).astype(np.float32) / 255.0
            )
            feats_ds[lo:hi] = np.asarray(fwd(variables, x))
            if hflip_ds is not None:
                hflip_ds[lo:hi] = np.asarray(fwd(variables, x[:, :, ::-1]))
    os.replace(tmp_path, out_path)
    return out_path


def build_nns(feats_path: str, out_path: str, k_nn: int = 50):
    """k-NN table over the (L2-normalized) feature bank — on-TPU matmul
    top-k (faiss replacement; ref ``make_hdf5_nns.py:97-172``)."""
    import h5py

    from ic_gan_tpu.data.feature_bank import knn

    with h5py.File(feats_path, "r") as f:
        feats = f["feats"][:].astype(np.float32)
    feats = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    idx, radii = knn(feats, k=k_nn + 1)
    tmp_path = out_path + ".tmp"
    with h5py.File(tmp_path, "w") as f:
        f.create_dataset("sample_nns", data=idx)
        f.create_dataset("sample_nns_radius", data=radii)
    os.replace(tmp_path, out_path)
    return out_path


def build_kmeans(feats_path: str, out_path: str, num_clusters: int = 1000,
                 num_iters: int = 100, seed: int = 0):
    """k-means instance selection (ref ``store_kmeans_indexes.py``)."""
    import h5py

    from ic_gan_tpu.data.feature_bank import closest_real_to_centroids, kmeans

    with h5py.File(feats_path, "r") as f:
        feats = f["feats"][:].astype(np.float32)
    centroids, _ = kmeans(feats, num_clusters=num_clusters,
                          num_iters=num_iters, seed=seed)
    centers = closest_real_to_centroids(feats, centroids)
    np.save(out_path, {"center_examples": centers[:, None]}, allow_pickle=True)
    return out_path


def main(argv=None):
    cfg = parse_args(argv)
    res = cfg.get("resolution", 64)
    which = cfg.get("which_dataset", "imagenet")
    out_dir = cfg.get("out_path", cfg.get("data_root", "data"))
    os.makedirs(out_dir, exist_ok=True)
    names = hdf5_filenames(
        res, which,
        longtail=cfg.get("longtail", False),
        split=cfg.get("split", "train"),
        feature_extractor=cfg.get("feature_extractor", "selfsupervised"),
        k_nn=cfg.get("k_nn", 50),
    )
    xy = os.path.join(out_dir, names["xy"])
    if not os.path.exists(xy):
        # Archive sources (zip / CIFAR tarball / MNIST idx-gz / LSUN lmdb)
        # dispatch like the reference dataset tool; a plain directory means
        # the labeled ImageNet-layout folder walker.
        from ic_gan_tpu.data.archive_readers import as_chw_batches, open_source

        src = cfg["image_root"]
        reader = open_source(src, max_images=cfg.get("max_images"))
        image_iter = (
            iter_image_folder(src, res) if reader is None
            else as_chw_batches(reader, res)
        )
        n = build_xy_hdf5(image_iter, xy, chunk=cfg.get("chunk_size", 500))
        print(f"wrote {n} images to {xy}")
    feats = os.path.join(out_dir, names["feats"])
    if not os.path.exists(feats):
        extract_features(
            xy, feats, cfg.get("feature_extractor_weights"),
            hflip_bank=cfg.get("feature_augmentation", True),
        )
        print(f"wrote features to {feats}")
    nns = os.path.join(out_dir, names["nns"])
    if not os.path.exists(nns):
        build_nns(feats, nns, k_nn=cfg.get("k_nn", 50))
        print(f"wrote k-NN table to {nns}")
    if cfg.get("kmeans_subsampled", -1) > 0:
        km = os.path.join(
            out_dir,
            kmeans_filename(res, which, cfg.get("feature_extractor",
                                                "selfsupervised"),
                            cfg["kmeans_subsampled"]),
        )
        if not os.path.exists(km):
            build_kmeans(feats, km, num_clusters=cfg["kmeans_subsampled"])
            print(f"wrote k-means selection to {km}")
    # Reference inception moments for FID.
    if cfg.get("compute_moments", True):
        from ic_gan_tpu.data.datasets import HDF5Dataset
        from ic_gan_tpu.eval.pipeline import (
            InceptionEvaluator,
            compute_dataset_moments,
            moments_filename,
            save_moments,
        )

        ds = HDF5Dataset(root=xy, load_labels=True, load_features=False)
        ev = InceptionEvaluator(cfg.get("inception_weights"))
        moments = compute_dataset_moments(ds, ev)
        mu, sigma, _ = moments[""]
        save_moments(
            out_dir,
            moments_filename(res, which, cfg.get("longtail", False),
                             cfg.get("split", "train")),
            mu, sigma,
        )
        print("wrote inception moments")


if __name__ == "__main__":
    main()
