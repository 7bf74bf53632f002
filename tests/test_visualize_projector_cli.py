"""Command-shaped front-ends for the StyleGAN2 tools: ``cli.visualize
--mode style_mixing`` (ref ``stylegan2_ada_pytorch/style_mixing.py``) and
``cli.projector`` (ref ``projector.py:147-186``), driven against a synthetic
TF-era network pickle (the builder from test_tf_legacy_import)."""

import json

import numpy as np
import pytest

pytest.importorskip("torch")
pytest.importorskip("PIL")

from PIL import Image

from test_tf_legacy_import import (  # noqa: E402
    RES,
    WDIM,
    ZDIM,
    _make_tf_discriminator,
    _make_tf_generator,
)


@pytest.fixture(scope="module")
def network_pkl(tmp_path_factory):
    import pickle

    rng = np.random.RandomState(0)
    path = tmp_path_factory.mktemp("viz") / "net.pkl"
    with open(path, "wb") as f:
        pickle.dump(
            (_make_tf_generator(rng), _make_tf_discriminator(rng),
             _make_tf_generator(np.random.RandomState(1))),
            f,
        )
    return str(path)


def _argv(cfg):
    return ["--set"] + [f"{k}={json.dumps(v)}" for k, v in cfg.items()]


def test_style_mixing_cli(network_pkl, tmp_path):
    from ic_gan_tpu.cli import visualize

    out_dir = tmp_path / "sheets"
    written = visualize.main(_argv({
        "backbone": "stylegan2", "network_pkl": network_pkl,
        "mode": "style_mixing", "row_seeds": "0,1", "col_seeds": "2,3",
        "col_styles": "0-3", "out_dir": str(out_dir), "batch_size": 4,
    }))
    assert written == [str(out_dir / "style_mixing.png")]
    img = np.asarray(Image.open(written[0]))
    assert img.shape == (2 * RES, 2 * RES, 3)  # 2x2 seed grid


def test_visualize_random_cli_stylegan2(network_pkl, tmp_path):
    from ic_gan_tpu.cli import visualize

    out_dir = tmp_path / "sheets"
    written = visualize.main(_argv({
        "backbone": "stylegan2", "network_pkl": network_pkl,
        "mode": "random", "num_samples": 8, "out_dir": str(out_dir),
        "batch_size": 8,
    }))
    img = np.asarray(Image.open(written[0]))
    assert img.shape == (RES, 8 * RES, 3)


def test_calc_metrics_conditional_stylegan2(tmp_path):
    """Regression: icgan-calc-metrics on a conditional (h_dim>0) StyleGAN2
    network must draw dataset conditioning — the BigGAN-only class_cond/
    instance_cond gating used to pass feats=None into the mapping network.
    Covers is50k (the shared sampler) and ppl2_wend (cond_sampler wiring)."""
    import pickle
    import sys

    import h5py

    sys.path.insert(0, "/root/reference/stylegan2_ada_pytorch")
    from training import networks

    H_DIM = 12
    G = networks.Generator(
        z_dim=ZDIM, c_dim=0, w_dim=WDIM, h_dim=H_DIM, img_resolution=RES,
        img_channels=3,
        mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(channel_base=512, channel_max=64,
                              num_fp16_res=0, conv_clamp=None),
    )
    pkl = tmp_path / "cond-net.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"G_ema": G}, f)

    # Tiny dataset with the reference filename conventions (feats dim = h_dim).
    from ic_gan_tpu.data.datasets import hdf5_filenames

    rng = np.random.RandomState(0)
    N, K = 8, 3
    names = hdf5_filenames(RES, "imagenet", k_nn=K,
                           feature_extractor="selfsupervised")
    with h5py.File(tmp_path / names["xy"], "w") as f:
        f.create_dataset(
            "imgs", data=rng.randint(0, 255, (N, 3, RES, RES), dtype=np.uint8)
        )
        f.create_dataset("labels", data=rng.randint(0, 3, (N,)).astype(np.int64))
    with h5py.File(tmp_path / names["feats"], "w") as f:
        f.create_dataset("feats", data=rng.randn(N, H_DIM).astype(np.float32))
    nns = np.stack([np.arange(N)] * (K + 1), axis=1).astype(np.int64)
    with h5py.File(tmp_path / names["nns"], "w") as f:
        f.create_dataset("sample_nns", data=nns)
        f.create_dataset("sample_nns_radius", data=np.ones(N, np.float32))

    from ic_gan_tpu.cli import calc_metrics

    out = calc_metrics.main(_argv({
        "backbone": "stylegan2", "network_pkl": str(pkl),
        # comma-space: names get stripped; ppl_wend exercises the legacy
        # crop+wend registration (ref metric_main.py:232-241).
        "metrics": "is50k, ppl2_wend, ppl_wend",
        "resolution": RES, "data_root": str(tmp_path), "k_nn": K,
        "feature_extractor": "selfsupervised",
        "num_inception_images": 8, "ppl_num_samples": 4,
        "eval_batch_size": 4, "batch_size": 4,
    }))
    assert np.isfinite(out["is50k_mean"])
    assert np.isfinite(out["ppl2_wend"])
    assert np.isfinite(out["ppl_wend"])
    assert out["ppl_distance"] == "pixel"  # no VGG weights in this env


def test_projector_cli(network_pkl, tmp_path):
    from ic_gan_tpu.cli import projector

    target = tmp_path / "target.png"
    Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (40, 48, 3), np.uint8)
    ).save(target)

    out_dir = tmp_path / "proj"
    history = projector.main(_argv({
        "network_pkl": network_pkl, "target": str(target),
        "num_steps": 3, "w_avg_samples": 16, "out_dir": str(out_dir),
    }))
    assert len(history) == 3 and np.isfinite(history).all()
    w = np.load(out_dir / "projected_w.npz")["w"]
    assert w.shape[0] == 1 and w.shape[2] == WDIM
    for name in ("target.png", "proj.png"):
        img = np.asarray(Image.open(out_dir / name))
        assert img.shape == (RES, RES, 3)


def test_visualize_class_conditional_stylegan2(tmp_path):
    """Regression: sheet tools on a class-conditional (c_dim>0) StyleGAN2
    network draw integer labels — the deployment sampler must one-hot them
    for the mapping network (previously a shape crash in every sheet mode)."""
    import pickle
    import sys

    sys.path.insert(0, "/root/reference/stylegan2_ada_pytorch")
    from training import networks

    G = networks.Generator(
        z_dim=ZDIM, c_dim=3, w_dim=WDIM, h_dim=0, img_resolution=RES,
        img_channels=3,
        mapping_kwargs=dict(num_layers=2),
        synthesis_kwargs=dict(channel_base=512, channel_max=64,
                              num_fp16_res=0, conv_clamp=None),
    )
    pkl = tmp_path / "cc-net.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"G_ema": G}, f)

    from PIL import Image

    from ic_gan_tpu.cli import visualize

    out_dir = tmp_path / "sheets"
    written = visualize.main(_argv({
        "backbone": "stylegan2", "network_pkl": str(pkl),
        "mode": "random", "num_samples": 8, "out_dir": str(out_dir),
        "batch_size": 8,
    }))
    img = np.asarray(Image.open(written[0]))
    assert img.shape == (RES, 8 * RES, 3)

    written = visualize.main(_argv({
        "backbone": "stylegan2", "network_pkl": str(pkl),
        "mode": "interp", "num_rows": 2, "num_midpoints": 2,
        "out_dir": str(out_dir), "batch_size": 8,
    }))
    img = np.asarray(Image.open(written[0]))
    assert img.shape[0] == 2 * RES  # 2 rows of (midpoints+2) steps
