import os

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from ic_gan_tpu.data.datasets import (
    HDF5Dataset,
    get_dataset_hdf5,
    hdf5_filenames,
    kmeans_filename,
)


N, RES, F, K = 64, 16, 32, 5


@pytest.fixture(scope="module")
def hdf5_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, size=(N, 3, RES, RES), dtype=np.uint8)
    labels = rng.randint(0, 4, size=(N,)).astype(np.int64)
    feats = rng.randn(N, F).astype(np.float32)
    feats_hflip = rng.randn(N, F).astype(np.float32)
    names = hdf5_filenames(RES, "imagenet", feature_extractor="selfsupervised",
                           backbone="resnet50", k_nn=K)
    with h5py.File(d / names["xy"], "w") as f:
        f.create_dataset("imgs", data=imgs)
        f.create_dataset("labels", data=labels)
    with h5py.File(d / names["feats"], "w") as f:
        f.create_dataset("feats", data=feats)
        f.create_dataset("feats_hflip", data=feats_hflip)
    nrm = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    d2 = ((nrm[:, None] - nrm[None]) ** 2).sum(-1)
    nns = np.argsort(d2, axis=1)[:, : K + 1]
    radius = np.sqrt(d2[np.arange(N), nns[:, -1]])
    with h5py.File(d / names["nns"], "w") as f:
        f.create_dataset("sample_nns", data=nns)
        f.create_dataset("sample_nns_radius", data=radius)
    # kmeans subset file (reference .npy format: dict with center_examples)
    km = {"center_examples": np.arange(0, N, 8)[:, None]}
    np.save(d / kmeans_filename(RES, "imagenet", "selfsupervised", 8), km,
            allow_pickle=True)
    return str(d)


def make_ds(hdf5_dir, **kw):
    return get_dataset_hdf5(
        RES, hdf5_dir, feature_extractor="selfsupervised", k_nn=K, seed=1, **kw
    )


def test_batch_shapes_and_norm(hdf5_dir):
    ds = make_ds(hdf5_dir)
    b = ds.sample_batch(8)
    assert b.images.shape == (8, RES, RES, 3)
    assert b.images.min() >= -1.0 and b.images.max() <= 1.0
    assert b.labels.shape == (8,)
    assert b.features.shape == (8, F)
    np.testing.assert_allclose(
        np.linalg.norm(b.features, axis=1), 1.0, rtol=1e-5
    )
    assert b.radii.shape == (8,)


def test_neighbor_structure(hdf5_dir):
    # The image returned must be one of the instance's k+1 neighbours.
    ds = make_ds(hdf5_dir)
    assert ds.sample_nns.shape == (N, K + 1)
    # First neighbour of each point is itself (distance 0).
    assert (ds.sample_nns[:, 0] == np.arange(N)).all()


def test_conditioning_instance_balance(hdf5_dir):
    ds = make_ds(hdf5_dir)
    labels, feats = ds.sample_conditioning_instance_balance(16)
    assert feats.shape == (16, F)
    assert labels.shape == (16,)
    w = np.zeros(N)
    w[3] = 1.0  # force instance 3
    labels, feats = ds.sample_conditioning_instance_balance(4, weights=w)
    expected = ds.feats[3]
    np.testing.assert_allclose(feats, np.tile(expected, (4, 1)), rtol=1e-5)


def test_conditioning_nnclass_balance(hdf5_dir):
    ds = make_ds(hdf5_dir, which_nn_balance="nnclass_balance")
    labels, feats = ds.sample_conditioning_nnclass_balance(16, num_classes=4)
    assert labels.shape == (16,)
    assert set(np.unique(labels)).issubset({0, 1, 2, 3})
    w = np.zeros(4)
    w[2] = 1.0
    labels, _ = ds.sample_conditioning_nnclass_balance(8, weights=w, num_classes=4)
    assert (labels == 2).all()


def test_kmeans_subset(hdf5_dir):
    ds = make_ds(hdf5_dir, kmeans_subsampled=8)
    assert ds.num_imgs == 8
    assert set(ds.possible_sampling_idxs) == set(range(0, N, 8))
    b = ds.sample_batch(4)
    assert b.images.shape == (4, RES, RES, 3)


def test_subsampled_data(hdf5_dir):
    ds = make_ds(hdf5_dir, n_subsampled_data=10)
    assert ds.num_imgs == 10


def test_feature_augmentation_uses_hflip_bank(hdf5_dir):
    ds = make_ds(hdf5_dir, feature_augmentation=True)
    idxs = np.zeros(64, np.int64)
    feats = ds.get_instance_features(idxs)
    # With 50% flip prob over 64 draws both variants should appear.
    assert len(np.unique(np.round(feats[:, 0], 6))) == 2


def test_onehot_labels(hdf5_dir):
    ds = make_ds(hdf5_dir, label_dim=4, label_onehot=True)
    b = ds.sample_batch(6)
    assert b.labels.shape == (6, 4)
    np.testing.assert_allclose(b.labels.sum(axis=1), 1.0)


def test_unconditional_images_only(hdf5_dir):
    ds = make_ds(hdf5_dir, class_cond=False, instance_cond=False)
    b = ds.sample_batch(5)
    assert b.images.shape == (5, RES, RES, 3)
    assert b.features is None


def test_compute_nns_on_the_fly(hdf5_dir):
    ds = make_ds(hdf5_dir, compute_nns=True)
    assert ds.sample_nns.shape[1] == K + 1
    assert (ds.sample_nns[:, 0] == np.arange(N)).all()


def test_sample_batch_conditioning_invariant(hdf5_dir):
    # Invariant from the reference semantics (_get_instance_features_and_nn):
    # the returned features belong to an instance whose neighbour list
    # contains the returned image's index.
    ds = make_ds(hdf5_dir)
    for _ in range(5):
        b = ds.sample_batch(8)
        for i in range(8):
            # Match feature row back to the bank (rows are unique).
            dists = np.linalg.norm(ds.feats - b.features[i], axis=1)
            idx_h = int(np.argmin(dists))
            assert dists[idx_h] < 1e-5
            # Find the image index by pixel match against candidates.
            nns = ds.sample_nns[idx_h]
            imgs = ds._norm(ds._get_images(nns))
            diffs = np.abs(imgs - b.images[i]).reshape(len(nns), -1).max(1)
            assert diffs.min() < 1e-5  # image is one of idx_h's neighbours
            # And the radius matches that instance.
            assert abs(b.radii[i] - ds.sample_nn_radius[idx_h]) < 1e-5


def test_nnclass_balance_neighbors_come_from_chosen_class(hdf5_dir):
    """Vectorized sampler property: each returned feature must be the
    feature of a k-NN neighbor of SOME member of the drawn class
    (ref datasets_common.py:578-622 semantics)."""
    ds = make_ds(hdf5_dir, which_nn_balance="nnclass_balance")
    labels_all = ds.labels.reshape(-1)
    labels, feats = ds.sample_conditioning_nnclass_balance(32, num_classes=4)
    for lab, f in zip(labels, feats):
        members = np.nonzero(labels_all == lab)[0]
        neighbor_ids = np.unique(ds.sample_nns[members])
        cand = ds.feats[neighbor_ids]
        dists = np.abs(cand - f[None]).sum(axis=1)
        assert dists.min() < 1e-4, f"feature not from class {lab} neighborhood"


def test_cached_real_features_roundtrip(hdf5_dir, tmp_path, monkeypatch):
    from ic_gan_tpu.eval.pipeline import InceptionEvaluator, cached_real_features

    ds = make_ds(hdf5_dir)
    ev = InceptionEvaluator(batch=8)

    first = cached_real_features(ds, ev, str(tmp_path), n_items=12, batch=8)
    assert first.shape == (12, 2048)

    # Second call must hit the disk cache: poison the image fetch (normal
    # attribute lookup, unlike __call__ which bypasses instance attrs).
    def boom(idxs):
        raise AssertionError("dataset re-read despite cache")

    monkeypatch.setattr(ds, "_get_images", boom)
    second = cached_real_features(ds, ev, str(tmp_path), n_items=12, batch=8)
    np.testing.assert_array_equal(first, second)
    # Different subset size -> different key -> recompute attempt (boom).
    import pytest as _pytest

    with _pytest.raises(AssertionError, match="re-read"):
        cached_real_features(ds, ev, str(tmp_path), n_items=8, batch=8)

    # Different compute dtype (eval_bf16) -> different key: a bf16
    # evaluator must NOT silently reuse f32-computed pool features (the
    # documented ~2% pool drift would leak into FID with no warning).
    ev_bf16 = InceptionEvaluator(batch=8, deploy_bf16=True)
    with _pytest.raises(AssertionError, match="re-read"):
        cached_real_features(ds, ev_bf16, str(tmp_path), n_items=12, batch=8)


def test_disk_backed_features_match_in_mem(hdf5_dir):
    """load_in_mem_feats=False reads feature rows from the hdf5 per batch
    (ref datasets_common keeps per-worker h5 handles) — values must equal
    the pre-normalized in-mem bank, duplicates and random order included."""
    mem = make_ds(hdf5_dir, load_in_mem_feats=True)
    disk = make_ds(hdf5_dir, load_in_mem_feats=False)
    idxs = np.asarray([5, 1, 5, 9, 0])  # unsorted + duplicate
    np.testing.assert_allclose(
        disk.get_instance_features(idxs), mem.get_instance_features(idxs),
        rtol=1e-6)
    # hflip augmentation path also runs from disk
    disk_aug = make_ds(hdf5_dir, load_in_mem_feats=False,
                       feature_augmentation=True)
    out = disk_aug.get_instance_features(idxs)
    assert out.shape == (5, F)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)
