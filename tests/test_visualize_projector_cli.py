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
