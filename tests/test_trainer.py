import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

h5py = pytest.importorskip("h5py")

from ic_gan_tpu.data.datasets import HDF5Dataset, hdf5_filenames
from ic_gan_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from ic_gan_tpu.models.biggan import BigGANConfig
from ic_gan_tpu.train.step import TrainConfig
from ic_gan_tpu.train.trainer import Trainer, TrainerConfig


@pytest.fixture()
def tiny_env(tmp_path):
    rng = np.random.RandomState(0)
    names = hdf5_filenames(32, "imagenet", feature_extractor="selfsupervised",
                           k_nn=3)
    with h5py.File(tmp_path / names["xy"], "w") as f:
        f.create_dataset(
            "imgs", data=rng.randint(0, 255, (24, 3, 32, 32), dtype=np.uint8)
        )
        f.create_dataset("labels", data=rng.randint(0, 4, (24,)).astype(np.int64))
    with h5py.File(tmp_path / names["feats"], "w") as f:
        f.create_dataset("feats", data=rng.randn(24, 16).astype(np.float32))
    ds = HDF5Dataset(
        root=str(tmp_path / names["xy"]),
        root_feats=str(tmp_path / names["feats"]),
        load_labels=False,
        load_features=True,
        k_nn=3,
        feature_dim=16,
    )
    mcfg = BigGANConfig(
        resolution=32, n_classes=4, G_ch=4, D_ch=4, dim_z=8, G_attn="0",
        D_attn="0", shared_dim=8, shared_dim_feat=8, instance_sz=16,
    )
    tcfg = TrainConfig(num_D_accumulations=1, num_G_accumulations=1, ema_start=0)
    trcfg = TrainerConfig(
        experiment_name="t",
        weights_root=str(tmp_path / "weights"),
        logs_root=str(tmp_path / "logs"),
        num_epochs=1,
        test_every=1,
        save_every=1,
        batch_size=4,
    )
    return ds, mcfg, tcfg, trcfg, tmp_path


def test_trainer_one_epoch_saves_and_logs(tiny_env):
    ds, mcfg, tcfg, trcfg, tmp = tiny_env
    calls = []

    def fake_eval(trainer):
        imgs, _, _ = trainer.sample_fn(4, jax.random.PRNGKey(0))
        assert imgs.shape == (4, 32, 32, 3)
        calls.append(1)
        return {"IS_mean": 2.0, "IS_std": 0.1, "FID": 100.0 - len(calls)}

    tr = Trainer(mcfg, tcfg, trcfg, ds, eval_fn=fake_eval)
    tr.run(steps_per_epoch=2)
    assert tr.history["itr"] == 2
    assert calls  # eval ran
    assert os.path.isdir(os.path.join(trcfg.weights_root, "t"))
    assert os.path.isdir(os.path.join(trcfg.weights_root, "t_best0"))
    log_dir = os.path.join(trcfg.logs_root, "t")
    assert os.path.exists(os.path.join(log_dir, "t_test_log.jsonl"))
    assert os.path.exists(os.path.join(log_dir, "FID.log"))


def test_trainer_resume_roundtrip(tiny_env):
    ds, mcfg, tcfg, trcfg, tmp = tiny_env
    tr = Trainer(mcfg, tcfg, trcfg, ds)
    tr.run(steps_per_epoch=1)
    itr = tr.history["itr"]
    step_val = int(tr.state.step)

    tr2 = Trainer(mcfg, tcfg, trcfg, ds)
    tr2.resume()
    assert tr2.history["itr"] == itr
    assert int(tr2.state.step) == step_val
    for a, b in zip(jax.tree.leaves(tr.state.g_params),
                    jax.tree.leaves(tr2.state.g_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_logs_sn_spectra(tiny_env):
    """log_G_spectra/log_D_spectra select which net's singular values land
    in the per-metric logs (ref utils.py:857-876, 1590-1598)."""
    import dataclasses
    import json

    ds, mcfg, tcfg, trcfg, tmp = tiny_env
    trcfg = dataclasses.replace(
        trcfg, experiment_name="sv", log_G_spectra=True, sv_log_interval=1,
        test_every=100, save_every=100,
    )
    tr = Trainer(mcfg, tcfg, trcfg, ds)
    assert tr._sv_nets() == ("G",)
    assert tr._sv_interval() == 1
    tr.run(steps_per_epoch=1)
    log_path = os.path.join(trcfg.logs_root, "sv", "sv_log.jsonl")
    records = [json.loads(l) for l in open(log_path)]
    sv_records = [r for r in records if any(k.startswith("G_sv/") for k in r)]
    assert sv_records, records
    rec = sv_records[-1]
    assert not any(k.startswith("D_sv/") for k in rec)
    g_keys = [k for k in rec if k.startswith("G_sv/")]
    # One sv per spectrally-normalized G module, finite, near 1 at ortho init.
    assert len(g_keys) >= 4
    assert all(np.isfinite(rec[k]) for k in g_keys)
    # Values must come from the live sn collection.
    live = tr._sv_metrics(("G",))
    for k in g_keys:
        assert k in live

    # Flag without interval falls back to the reference default of 10.
    trcfg2 = dataclasses.replace(trcfg, sv_log_interval=0)
    tr2 = Trainer(mcfg, tcfg, trcfg2, ds)
    assert tr2._sv_interval() == 10
    # Bare sv_log_interval logs both nets (upstream train.py behavior).
    trcfg3 = dataclasses.replace(
        trcfg, log_G_spectra=False, sv_log_interval=2)
    tr3 = Trainer(mcfg, tcfg, trcfg3, ds)
    assert tr3._sv_nets() == ("G", "D")


def test_checkpoint_atomic_and_best_selection(tmp_path):
    from ic_gan_tpu.io.checkpoint import find_best_checkpoint

    state = {"a": jnp.ones((3,)), "b": {"c": jnp.zeros((2, 2))}}
    save_checkpoint(str(tmp_path), "exp", state, {"best_FID": 10.0},
                    suffix="best0")
    save_checkpoint(str(tmp_path), "exp", state, {"best_FID": 5.0},
                    suffix="best1")
    path, fid = find_best_checkpoint(str(tmp_path), "exp")
    assert path.endswith("best1") and fid == 5.0
    loaded, cfg = load_checkpoint(str(tmp_path), "exp", state, suffix="best1")
    np.testing.assert_array_equal(np.asarray(loaded["a"]), np.ones((3,)))
    assert cfg["best_FID"] == 5.0


def test_cli_config_split_accepts_reference_json():
    import json

    from ic_gan_tpu.cli.config import split_config

    with open(
        "/root/reference/BigGAN_PyTorch/config_files/ImageNet/IC-GAN/icgan_res64.json"
    ) as f:
        cfg = json.load(f)
    model, train, trainer, data = split_config(cfg)
    assert model.resolution == 64
    assert model.instance_cond and not model.class_cond
    assert model.shared_dim_feat == 512
    assert train.G_lr == 1e-4 and train.D_lr == 1e-4
    assert trainer.experiment_name == "icgan_biggan_imagenet_res64"
    assert data["k_nn"] == 50
    assert data["feature_extractor"] == "selfsupervised"


def test_trainer_with_deep_backbone(tiny_env):
    ds, _, tcfg, trcfg, tmp = tiny_env
    from ic_gan_tpu.cli.config import split_config

    mcfg, _, _, _ = split_config({
        "model": "BigGANdeep", "resolution": 32, "n_classes": 4,
        "G_ch": 4, "D_ch": 4, "dim_z": 8, "G_attn": "0", "D_attn": "0",
        "shared_dim": 8, "class_cond": False, "instance_cond": True,
        "shared_dim_feat": 8,
    })
    mcfg = mcfg.replace(instance_sz=16)
    import dataclasses

    trcfg = dataclasses.replace(trcfg, experiment_name="deep")
    tr = Trainer(mcfg, tcfg, trcfg, ds)
    tr.run(steps_per_epoch=1)
    assert tr.history["itr"] == 1


def test_trainer_class_only_longtail_gen(tmp_path):
    """Class-conditional-only models (the published ImageNet[-LT] BigGAN and
    COCO unconditional configs): generator labels come from the y
    distribution (ref ``sample_conditioning_values``, utils.py:879-890),
    NOT from instance sampling — this path used to crash (the trainer always
    called the feature-based conditioning samplers)."""
    rng = np.random.RandomState(0)
    names = hdf5_filenames(32, "imagenet")
    # Long-tail labels over 4 classes: 12/6/4/2 samples.
    labels = np.repeat(np.arange(4), [12, 6, 4, 2]).astype(np.int64)
    with h5py.File(tmp_path / names["xy"], "w") as f:
        f.create_dataset(
            "imgs", data=rng.randint(0, 255, (24, 3, 32, 32), dtype=np.uint8)
        )
        f.create_dataset("labels", data=labels)
    ds = HDF5Dataset(
        root=str(tmp_path / names["xy"]), load_labels=True,
        load_features=False,
    )
    mcfg = BigGANConfig(
        resolution=32, n_classes=4, G_ch=4, D_ch=4, dim_z=8, G_attn="0",
        D_attn="0", shared_dim=8, class_cond=True, instance_cond=False,
    )
    tcfg = TrainConfig(num_D_accumulations=1, num_G_accumulations=1,
                       ema_start=0, class_cond=True, instance_cond=False)
    trcfg = TrainerConfig(
        experiment_name="lt", weights_root=str(tmp_path / "w"),
        logs_root=str(tmp_path / "l"), num_epochs=1, test_every=100,
        save_every=100, batch_size=4, longtail=True, longtail_gen=True,
        log_every=1,  # reference-exact per-itr jsonl (ref trainer.py:468)
    )
    tr = Trainer(mcfg, tcfg, trcfg, ds)

    batch = tr.make_batch()
    assert "gen_label" in batch and "gen_feats" not in batch
    assert np.asarray(batch["gen_label"]).dtype.kind == "i"

    # longtail_gen: labels follow the empirical class distribution.
    draws = tr._sample_gen_labels(4000)
    got = np.bincount(draws, minlength=4) / 4000.0
    np.testing.assert_allclose(got, labels.shape[0] and
                               np.bincount(labels, minlength=4) / 24.0,
                               atol=0.04)

    # custom_distrib_gen with a high temperature flattens the distribution.
    tr.cfg.custom_distrib_gen = True
    tr.cfg.longtail_temperature = 1e6
    flat = np.bincount(tr._sample_gen_labels(4000), minlength=4) / 4000.0
    np.testing.assert_allclose(flat, 0.25, atol=0.04)

    # constant_conditioning: all zeros (ref utils.py:884-885).
    tr.cfg.constant_conditioning = True
    assert (tr._sample_gen_labels(64) == 0).all()
    tr.cfg.constant_conditioning = False
    tr.cfg.custom_distrib_gen = False

    tr.run(steps_per_epoch=2)
    assert tr.history["itr"] == 2
    imgs, lab, feats = tr.sample_fn(4, jax.random.PRNGKey(0))
    assert imgs.shape == (4, 32, 32, 3) and feats is None
    assert lab is not None

    # log_every=1 → one jsonl row per iteration (ref trainer.py:468).
    import json
    log = tmp_path / "l" / "lt" / "lt_log.jsonl"
    rows = [json.loads(s) for s in open(log)]
    assert [r["itr"] for r in rows] == [1, 2]
