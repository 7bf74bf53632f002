"""End-to-end CLI workflow: prepare_data → train → generate_images → test.

Mirrors the reference's user journey (prepare_data.sh → run.py →
generate_images.py → test.py) on a tiny synthetic dataset with the
random-init feature extractor / inception (no pretrained weights in CI).
"""

import json
import os

import numpy as np
import pytest

pytest.importorskip("h5py")
pytest.importorskip("PIL")

from PIL import Image


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("e2e")
    # Tiny image-folder dataset: 3 classes x 8 images.
    rng = np.random.RandomState(0)
    for c in range(3):
        cdir = d / "images" / f"class_{c}"
        os.makedirs(cdir)
        for i in range(8):
            arr = rng.randint(0, 255, (40, 48, 3), dtype=np.uint8)
            Image.fromarray(arr).save(cdir / f"img_{i}.jpg")
    return d


def base_cfg(workdir):
    return {
        "resolution": 32,
        "which_dataset": "imagenet",
        "data_root": str(workdir / "data"),
        "out_path": str(workdir / "data"),
        "image_root": str(workdir / "images"),
        "feature_extractor": "selfsupervised",
        "k_nn": 3,
        "n_classes": 3,
        "experiment_name": "e2e_exp",
        "weights_root": str(workdir / "weights"),
        "logs_root": str(workdir / "logs"),
        "G_ch": 4, "D_ch": 4, "dim_z": 8,
        "G_attn": "0", "D_attn": "0",
        "shared_dim": 8, "shared_dim_feat": 8,
        "class_cond": False, "instance_cond": True,
        "batch_size": 4,
        "num_epochs": 1,
        "test_every": 1,
        "save_every": 1,
        "num_inception_images": 16,
        "eval_batch_size": 8,
        "ema_start": 0,
    }


def run_cli(mod, cfg, **extra):
    cfg = dict(cfg, **extra)
    argv = ["--set"] + [f"{k}={json.dumps(v)}" for k, v in cfg.items()]
    return mod.main(argv)


run_cli_ret = run_cli


def test_01_prepare_data(workdir):
    from ic_gan_tpu.cli import prepare_data

    run_cli(prepare_data, base_cfg(workdir), kmeans_subsampled=4)
    data = workdir / "data"
    assert (data / "ILSVRC32_xy.hdf5").exists()
    assert (data / "ILSVRC32_feats_selfsupervised_resnet50.hdf5").exists()
    assert (data / "ILSVRC32_feats_selfsupervised_resnet50_nn_k3.hdf5").exists()
    assert (data / "IN_res32_rn50_selfsupervised_kmeans_k4.npy").exists()
    assert (data / "I32_inception_moments.npz").exists()
    import h5py

    with h5py.File(data / "ILSVRC32_xy.hdf5", "r") as f:
        assert f["imgs"].shape == (24, 3, 32, 32)
        assert f["labels"].shape == (24,)
    with h5py.File(
        data / "ILSVRC32_feats_selfsupervised_resnet50.hdf5", "r"
    ) as f:
        assert f["feats"].shape == (24, 2048)
        assert f["feats_hflip"].shape == (24, 2048)


def test_02_train(workdir):
    from ic_gan_tpu.cli import train

    run_cli(train, base_cfg(workdir))
    assert (workdir / "weights" / "e2e_exp").is_dir()
    log = workdir / "logs" / "e2e_exp" / "e2e_exp_test_log.jsonl"
    assert log.exists()
    rec = json.loads(log.read_text().splitlines()[-1])
    assert np.isfinite(rec["FID"])


def test_03_generate_images(workdir):
    from ic_gan_tpu.cli import generate_images

    # Use the k-means-selected instance features like the reference's stored
    # conditioning sets.
    import h5py

    data = workdir / "data"
    km = np.load(data / "IN_res32_rn50_selfsupervised_kmeans_k4.npy",
                 allow_pickle=True).item()["center_examples"][:, 0]
    with h5py.File(
        data / "ILSVRC32_feats_selfsupervised_resnet50.hdf5", "r"
    ) as f:
        feats = f["feats"][:][km]
    feats = feats / np.linalg.norm(feats, axis=1, keepdims=True)
    feats_path = str(workdir / "stored_feats.npy")
    np.save(feats_path, feats)

    out = str(workdir / "grid.png")
    run_cli(
        generate_images, base_cfg(workdir),
        stored_features=feats_path, num_conditionings_gen=2, num_imgs_gen=3,
        out_path=out,
    )
    img = np.asarray(Image.open(out))
    assert img.shape == (2 * 32, 3 * 32, 3)  # 6 images in a 2x3 grid


def test_03b_generate_images_instance_column(workdir):
    """Dict-npy conditioning with ``index`` + ``visualize_instance_images``
    (ref generate_images.py:84-87, 198-215): every row pinned to one k-means
    center, ground-truth instance column + 20-px gutter prepended."""
    from ic_gan_tpu.cli import generate_images

    gt_root = workdir / "jpegs"
    gt_root.mkdir(exist_ok=True)
    rng = np.random.RandomState(7)
    paths = []
    for i in range(3):
        p = f"cls/{i}.jpg"
        (gt_root / "cls").mkdir(exist_ok=True)
        Image.fromarray(
            rng.randint(0, 255, (48, 40, 3), dtype=np.uint8)
        ).save(gt_root / p)
        paths.append(p)
    feats = rng.randn(3, 2048).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=1, keepdims=True)
    stored = {
        "instance_features": feats,
        "labels": np.arange(3),
        "image_path": np.asarray(paths, dtype=object),
    }
    feats_path = str(workdir / "stored_dict.npy")
    np.save(feats_path, stored, allow_pickle=True)

    out = str(workdir / "grid_gt.png")
    run_cli(
        generate_images, base_cfg(workdir),
        stored_features=feats_path, num_conditionings_gen=2, num_imgs_gen=3,
        index=1, visualize_instance_images=True, dataset_path=str(gt_root),
        out_path=out,
    )
    img = np.asarray(Image.open(out))
    # 2 rows (same pinned instance), cols = gt(32) + gutter(20) + 3*32.
    assert img.shape == (2 * 32, 32 + 20 + 3 * 32, 3)
    # gutter is white
    assert (img[:, 32:52] == 255).all()
    # both gt rows show the same (index=1) instance
    np.testing.assert_array_equal(img[:32, :32], img[32:, :32])


def test_04_quantitative_eval(workdir):
    from ic_gan_tpu.cli import test as cli_test

    run_cli(
        cli_test, base_cfg(workdir),
        num_inception_images=16, eval_prdc=True, prdc_ref_images=16,
        sample_npz=True, sample_num_npz=8,
        npz_path=str(workdir / "samples.npz"),
        metrics_out=str(workdir / "metrics.npy"),
        sample_trunc_curves="0.5_0.5_1.0",
    )
    m = np.load(workdir / "metrics.npy", allow_pickle=True).item()
    for key in ("IS_mean", "FID", "precision", "recall", "density", "coverage"):
        assert key in m
    curve = m["trunc_curves"]
    assert [p["z_var"] for p in curve] == [0.5, 1.0]
    assert all(np.isfinite(p["FID"]) and np.isfinite(p["IS_mean"])
               for p in curve)
    npz = np.load(workdir / "samples.npz")
    assert npz["x"].shape == (8, 3, 32, 32)
    assert npz["x"].dtype == np.uint8


def test_05_calc_metrics(workdir):
    """calc_metrics CLI (ref ``stylegan2_ada_pytorch/calc_metrics.py``):
    registry metrics against the trained checkpoint, jsonl result files."""
    from ic_gan_tpu.cli import calc_metrics

    run_dir = str(workdir / "metric_runs")
    out = run_cli_ret(
        calc_metrics, base_cfg(workdir),
        metrics="fid50k_full,is50k,kid50k_full,pr50k3,fid50k,kid50k,"
                "pr50k3_full",
        num_inception_images=16, max_real_images=16, run_dir=run_dir,
    )
    for key in ("fid50k_full", "is50k_mean", "kid50k_full",
                "pr50k3_precision", "pr50k3_recall", "fid50k", "kid50k",
                "pr50k3_full_precision", "pr50k3_full_recall"):
        assert key in out and np.isfinite(out[key])
    rec = json.loads(
        (workdir / "metric_runs" / "metric-fid50k_full.jsonl")
        .read_text().splitlines()[-1]
    )
    assert rec["metric"] == "fid50k_full"
    assert np.isfinite(rec["results"]["fid50k_full"])


def test_06_visualize_cli(workdir):
    """Sheet CLI (ref ``BigGAN_PyTorch/sample.py`` sheet flags): all three
    sheet kinds against the trained checkpoint + stored k-means features."""
    from ic_gan_tpu.cli import visualize

    out_dir = workdir / "sheets"
    written = run_cli_ret(
        visualize, base_cfg(workdir),
        stored_features=str(workdir / "stored_feats.npy"),
        sample_sheets=True, sample_interps=True, sample_random=True,
        num_conditionings_gen=2, num_imgs_gen=3, num_midpoints=2, num_rows=2,
        num_samples=8, out_dir=str(out_dir),
    )
    names = {os.path.basename(p) for p in written}
    assert names == {"sample_sheet.png", "interp_zfeats.png", "interp_z.png",
                     "interp_feats.png", "random.png"}
    sheet = np.asarray(Image.open(out_dir / "sample_sheet.png"))
    assert sheet.shape == (2 * 32, 3 * 32, 3)  # 2 conds x 3 samples
    interp = np.asarray(Image.open(out_dir / "interp_zfeats.png"))
    assert interp.shape == (2 * 32, 4 * 32, 3)  # 2 rows x (2 mid + 2 ends)
