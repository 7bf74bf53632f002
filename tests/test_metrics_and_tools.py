import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ic_gan_tpu.eval.metrics import (
    calc_metric,
    is_valid_metric,
    kid_from_features,
    list_metrics,
    ppl_w,
    slerp,
)
from ic_gan_tpu.parallel.stats import Collector, report


def test_metric_registry():
    for name in ("fid50k_full", "kid50k_full", "is50k", "pr50k3", "ppl2_wend"):
        assert is_valid_metric(name)
    assert not is_valid_metric("nope")


def test_kid_identical_near_zero_and_shifted_positive():
    rng = np.random.RandomState(0)
    real = rng.randn(512, 64)
    same = kid_from_features(real, real + rng.randn(512, 64) * 0.01,
                             num_subsets=10, max_subset_size=128)
    far = kid_from_features(real, real + 3.0, num_subsets=10,
                            max_subset_size=128)
    assert abs(same) < 0.05
    assert far > same + 0.5


def test_slerp_endpoints():
    a = jnp.asarray([[1.0, 0.0]])
    b = jnp.asarray([[0.0, 1.0]])
    np.testing.assert_allclose(np.asarray(slerp(a, b, 0.0)), np.asarray(a),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(slerp(a, b, 1.0)), np.asarray(b),
                               atol=1e-6)


def test_ppl_linear_generator_constant():
    # For a linear "generator" the path length is constant = |A (w1-w0)|²
    # scaled; mainly check the plumbing produces a finite positive scalar.
    A = jnp.asarray(np.random.RandomState(0).randn(8, 32).astype(np.float32))

    def map_ws(z):
        return z[:, None, :]  # (b, num_ws=1, w_dim) like a mapping network

    def synth(w):
        return (w[:, 0] @ A).reshape(w.shape[0], 4, 4, 2)

    val = ppl_w(synth, map_ws, z_dim=8, num_samples=64, batch=16, space="w")
    assert np.isfinite(val) and val > 0


def test_training_stats_collector():
    stats = {}
    stats = report(stats, "Loss/G", jnp.asarray([1.0, 3.0]))
    stats = report(stats, "Loss/D", jnp.asarray(2.0))
    stats = report(stats, "Loss/G", jnp.asarray([5.0]))
    c = Collector(r"Loss/.*")
    c.update(stats)
    assert c.num("Loss/G") == 3
    assert abs(c.mean("Loss/G") - 3.0) < 1e-6
    assert abs(c.std("Loss/G") - np.std([1, 3, 5])) < 1e-6
    only_g = Collector(r"Loss/G")
    only_g.update(stats)
    assert "Loss/D" not in only_g.moments


def test_image_folder_dataset(tmp_path):
    from PIL import Image

    from ic_gan_tpu.data.image_datasets import ImageFolderDataset

    rng = np.random.RandomState(0)
    for c in ("a", "b"):
        (tmp_path / c).mkdir()
        for i in range(3):
            Image.fromarray(
                rng.randint(0, 255, (20, 30, 3), dtype=np.uint8)
            ).save(tmp_path / c / f"{i}.png")
    ds = ImageFolderDataset(str(tmp_path), resolution=16)
    assert len(ds) == 6
    imgs, labels, idxs = ds.batch([0, 4])
    assert imgs.shape == (2, 16, 16, 3)
    assert imgs.min() >= -1 and imgs.max() <= 1
    assert labels.tolist() == [0, 1]


def test_imagenet_lt_split_file(tmp_path):
    from PIL import Image

    from ic_gan_tpu.data.image_datasets import ImageFolderDataset

    (tmp_path / "train" / "n01").mkdir(parents=True)
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(
        tmp_path / "train" / "n01" / "x.jpg"
    )
    split = tmp_path / "lt.txt"
    split.write_text("train/n01/x.jpg 7\n")
    ds = ImageFolderDataset(str(tmp_path), resolution=8, longtail=True,
                            split_file=str(split))
    assert len(ds) == 1
    assert ds.labels[0] == 7


def test_cocostuff_filters(tmp_path):
    import json

    from PIL import Image

    from ic_gan_tpu.data.image_datasets import CocoStuffDataset

    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    images, annotations = [], []
    for i in range(4):
        fname = f"im{i}.jpg"
        Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(imgdir / fname)
        images.append({"id": i, "file_name": fname, "width": 32, "height": 32})
    # image 0: 2 objects (too few), image 1: 3 objects (ok),
    # image 2: 3 objects but tiny boxes (filtered -> too few),
    # image 3: 9 objects (too many).
    def ann(img_id, n, size=16):
        for k in range(n):
            annotations.append({
                "image_id": img_id, "bbox": [0, 0, size, size],
                "category_id": 1, "iscrowd": 0,
            })
    ann(0, 2)
    ann(1, 3)
    ann(2, 3, size=1)
    ann(3, 9)
    data = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "thing"}],
    }
    inst = tmp_path / "instances.json"
    inst.write_text(json.dumps(data))
    ds = CocoStuffDataset(str(imgdir), str(inst), stuff_json=None,
                          stuff_only=False, resolution=16)
    assert len(ds) == 1  # only image 1 passes all filters
    imgs, labels, _ = ds.batch([0])
    assert imgs.shape == (1, 16, 16, 3)
    assert labels[0] == 0  # void label


def test_sample_and_interp_sheets():
    from ic_gan_tpu.cli.visualize import interp_sheet, sample_sheet

    def fake_apply(z, label, feats):
        base = jnp.mean(z, axis=1)[:, None, None, None]
        return jnp.broadcast_to(base, (z.shape[0], 8, 8, 3))

    conds = [(None, np.ones(4, np.float32)), (None, np.zeros(4, np.float32))]
    sheet = sample_sheet(fake_apply, dim_z=6, conditionings=conds,
                         samples_per_cond=3)
    assert sheet.shape == (6, 8, 8, 3)

    imgs = interp_sheet(fake_apply, dim_z=6, num_midpoints=2, num_rows=2,
                        feats_bank=np.eye(4, dtype=np.float32))
    assert imgs.shape == (2 * 4, 8, 8, 3)
    # fix_z: every image in a row identical (z constant, apply ignores feats).
    imgs_fz = interp_sheet(fake_apply, dim_z=6, num_midpoints=2, num_rows=1,
                           fix_z=True, feats_bank=np.eye(4, dtype=np.float32))
    row = imgs_fz.reshape(4, -1)
    assert np.allclose(row, row[0])

    # Class-conditional: one label per row, constant across the row.
    seen = []

    def labeled_apply(z, label, feats):
        assert label is not None and label.shape == (z.shape[0],)
        seen.append(np.asarray(label))
        return fake_apply(z, label, feats)

    imgs_lab = interp_sheet(labeled_apply, dim_z=6, num_midpoints=2,
                            num_rows=2, labels_bank=np.arange(5))
    assert imgs_lab.shape == (2 * 4, 8, 8, 3)
    per_row = seen[0].reshape(2, 4)
    assert (per_row == per_row[:, :1]).all()
