"""COCO-Stuff hamming-index builder + ground-truth dumper.

The builder is the missing producer of the reference's precomputed
``coco_stuff_val_indexes/*.npy`` blobs (consumed at ``utils.py:639-680``);
``filter_by_hd`` is the existing consumer — the test closes the loop
builder → npys → filter against a brute-force oracle.
"""

import os

import numpy as np
import pytest

from ic_gan_tpu.data.image_datasets import build_hd_indexes, filter_by_hd


def _brute_hd(a, b):
    return len(set(a) ^ set(b))


def test_build_hd_indexes_matches_bruteforce(tmp_path):
    rng = np.random.RandomState(0)
    vocab = list(range(20))
    train_sets = [set(rng.choice(vocab, rng.randint(2, 6), replace=False))
                  for _ in range(40)]
    eval_sets = [set(rng.choice(vocab, rng.randint(2, 6), replace=False))
                 for _ in range(15)]
    # Guarantee at least one exact (hd=0) match.
    eval_sets[3] = set(train_sets[7])
    eval_ids = [1000 + i for i in range(len(eval_sets))]

    all_idxs, by_hd = build_hd_indexes(
        eval_ids, eval_sets, train_sets, str(tmp_path)
    )
    np.testing.assert_array_equal(all_idxs, eval_ids)

    want_min = [min(_brute_hd(e, t) for t in train_sets) for e in eval_sets]
    got_min = {}
    for d, ids in enumerate(by_hd):
        for img_id in ids:
            got_min[img_id] = d
    assert got_min == {eval_ids[i]: want_min[i] for i in range(len(eval_ids))}


def test_filter_by_hd_roundtrip(tmp_path):
    rng = np.random.RandomState(1)
    vocab = list(range(12))
    train_sets = [set(rng.choice(vocab, 3, replace=False)) for _ in range(25)]
    eval_sets = [set(rng.choice(vocab, 3, replace=False)) for _ in range(10)]
    eval_sets[0] = set(train_sets[0])
    eval_ids = list(range(500, 510))
    build_hd_indexes(eval_ids, eval_sets, train_sets, str(tmp_path))

    all_f = os.path.join(str(tmp_path), "cocostuff_val2_all_idxs.npy")
    hd_f = os.path.join(str(tmp_path), "val2_image_ids_by_hd_75ktraining_im.npy")

    seen = filter_by_hd(0, all_f, hd_f)
    unseen = filter_by_hd(1, all_f, hd_f)
    want_seen = [i for i, e in enumerate(eval_sets)
                 if any(e == t for t in train_sets)]
    np.testing.assert_array_equal(sorted(seen), want_seen)
    # seen ∪ unseen = everything, disjoint.
    assert sorted(set(seen) | set(unseen)) == list(range(10))
    assert not set(seen) & set(unseen)


def test_store_gt_images_with_filter(tmp_path):
    h5py = pytest.importorskip("h5py")
    from PIL import Image

    from ic_gan_tpu.cli.store_coco_images import store_gt_images

    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 255, (6, 3, 16, 16), np.uint8)  # CHW like the ref
    data_root = tmp_path / "data"
    data_root.mkdir()
    with h5py.File(data_root / "COCO16_val_test_xy.hdf5", "w") as f:
        f.create_dataset("imgs", data=imgs)

    # Index files selecting images 1, 3, 4 as hd=0.
    idx_dir = tmp_path / "idx"
    build_hd_indexes(
        eval_ids=[10, 11, 12, 13, 14, 15],
        eval_class_sets=[{1}, {2}, {1}, {2}, {2}, {3}],
        train_class_sets=[{2}],
        out_dir=str(idx_dir),
    )
    out = tmp_path / "gt"
    n = store_gt_images({
        "data_root": str(data_root), "resolution": 16, "split": "val",
        "filter_hd": 0, "index_dir": str(idx_dir), "out_path": str(out),
    })
    assert n == 3
    files = sorted(os.listdir(out))
    assert files == ["000000.jpg", "000001.jpg", "000002.jpg"]
    got = np.asarray(Image.open(out / "000000.jpg"))
    assert got.shape == (16, 16, 3)
