"""Projector, demo ranking, sample CLI, and SG2 train CLI config mapping."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ic_gan_tpu.models import stylegan2 as sg2


def test_projector_reduces_loss():
    cfg = sg2.StyleGAN2Config(
        img_resolution=16, z_dim=8, c_dim=0, h_dim=0, w_dim=16,
        channel_base=512, channel_max=32, num_fp16_res=0, conv_clamp=None,
        num_mapping_layers=2,
    )
    g = sg2.Generator(cfg)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}
    variables = g.init(rngs, jnp.zeros((1, 8)), None, None)

    # Target: an actual generator output (so a good w exists).
    target = g.apply(
        variables, jax.random.normal(jax.random.PRNGKey(5), (1, 8)), None,
        None, noise_mode="const",
    )[0]

    from ic_gan_tpu.cli.projector import project

    def feat(imgs):
        return imgs.reshape(imgs.shape[0], -1)  # pixel features for the test

    w, history = project(
        g, variables, target, num_steps=30, w_avg_samples=64,
        feature_fn=feat, initial_learning_rate=0.05,
    )
    assert w.shape[0] == g.apply(
        variables, jnp.zeros((1, 8)), None, None, method=g.map_ws
    ).shape[1]
    assert history[-1] < history[0] * 0.9  # optimization made progress


def test_demo_rank_by_cosine():
    from ic_gan_tpu.cli.demo import rank_by_cosine

    target = np.array([1.0, 0.0, 0.0])
    gen = np.array([[0.0, 1.0, 0.0], [1.0, 0.1, 0.0], [0.5, 0.5, 0.0]])
    order = rank_by_cosine(gen, target)
    assert order[0] == 1  # most aligned first
    assert order[-1] == 0


def test_sg2_cli_config_presets():
    from ic_gan_tpu.cli.train_stylegan2 import setup_configs

    model, train, loop = setup_configs(
        {"resolution": 128, "cfg": "paper256", "experiment_name": "x"}
    )
    assert model.img_resolution == 128
    assert model.channel_base == 16384  # fmaps 0.5
    assert train.r1_gamma == 1
    assert loop.batch_size == 64

    model, train, loop = setup_configs({"resolution": 256, "cfg": "auto"})
    assert train.r1_gamma == pytest.approx(0.0002 * 256 ** 2 / loop.batch_size)

    # Reference stylegan2 IC-GAN config keys pass through.
    import json

    with open(
        "/root/reference/stylegan2_ada_pytorch/config_files/COCO_Stuff/"
        "IC-GAN/icgan_stylegan_res128.json"
    ) as f:
        ref_cfg = json.load(f)
    model, train, loop = setup_configs(ref_cfg)
    assert model.img_resolution == ref_cfg.get("resolution", 256)


def test_sample_cli_writes_jpegs(tmp_path):
    import h5py

    from ic_gan_tpu.cli import sample as cli_sample
    from ic_gan_tpu.data.datasets import hdf5_filenames

    rng = np.random.RandomState(0)
    names = hdf5_filenames(32, "imagenet", feature_extractor="selfsupervised",
                           k_nn=3)
    data = tmp_path / "data"
    data.mkdir()
    with h5py.File(data / names["xy"], "w") as f:
        f.create_dataset("imgs", data=rng.randint(0, 255, (12, 3, 32, 32),
                                                  dtype=np.uint8))
        f.create_dataset("labels", data=rng.randint(0, 2, (12,)).astype(np.int64))
    with h5py.File(data / names["feats"], "w") as f:
        f.create_dataset("feats", data=rng.randn(12, 2048).astype(np.float32))
    with h5py.File(data / names["nns"], "w") as f:
        f.create_dataset("sample_nns",
                         data=np.tile(np.arange(12)[:, None], (1, 4)))
        f.create_dataset("sample_nns_radius", data=np.ones(12, np.float32))

    # Tiny generator checkpoint via the trainer state machinery.
    from ic_gan_tpu.models.biggan import BigGANConfig, Generator, Discriminator
    from ic_gan_tpu.train.state import GANTrainState
    from ic_gan_tpu.train.step import TrainConfig
    from ic_gan_tpu.io.checkpoint import save_checkpoint

    mcfg = BigGANConfig(resolution=32, n_classes=2, G_ch=4, D_ch=4, dim_z=8,
                        G_attn="0", D_attn="0", shared_dim=8,
                        shared_dim_feat=8)
    g = Generator(mcfg)
    d = Discriminator(mcfg)
    z = jnp.zeros((1, mcfg.effective_dim_z))
    feats = jnp.zeros((1, 2048))
    gv = g.init(jax.random.PRNGKey(0), z, None, feats)
    dv = d.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), None, feats)
    tcfg = TrainConfig()
    state = GANTrainState.create(gv, dv, tcfg.g_optimizer(), tcfg.d_optimizer())
    save_checkpoint(str(tmp_path / "w"), "exp", state, {})

    import json

    argv = ["--set"] + [
        f"{k}={json.dumps(v)}"
        for k, v in {
            "resolution": 32, "n_classes": 2, "G_ch": 4, "D_ch": 4,
            "dim_z": 8, "G_attn": "0", "D_attn": "0", "shared_dim": 8,
            "shared_dim_feat": 8, "k_nn": 3,
            # split_config now mirrors the reference parser defaults
            # (instance_cond/hier/G_shared_feat default False) — state the
            # geometry explicitly like the published JSONs do.
            "instance_cond": True, "G_shared_feat": True, "hier": True,
            "feature_extractor": "selfsupervised",
            "data_root": str(data), "experiment_name": "exp",
            "weights_root": str(tmp_path / "w"), "load_weights": "",
            "out_dir": str(tmp_path / "out"), "num_imgs": 5, "batch_size": 3,
        }.items()
    ]
    cli_sample.main(argv)
    files = sorted(os.listdir(tmp_path / "out"))
    assert len(files) == 5
    from PIL import Image

    img = np.asarray(Image.open(tmp_path / "out" / files[0]))
    assert img.shape == (32, 32, 3)


def test_reference_demo_conventions(tmp_path):
    """Path/name conventions of the reference demo: experiment-name derivation
    (generate_images.py:126-140), stored-instances filename
    (generate_images.py:25-37), best0/best1 .pth selection
    (inference/utils.py:285-308)."""
    from ic_gan_tpu.cli.inference import (
        reference_exp_name,
        stored_instances_path,
    )
    from ic_gan_tpu.io.torch_import import select_best_pth_suffix

    assert reference_exp_name(
        {"model": "icgan", "backbone": "biggan",
         "trained_dataset": "imagenet", "resolution": 256}
    ) == "icgan_biggan_imagenet_res256_nofeataug"
    assert reference_exp_name(
        {"model": "cc_icgan", "model_backbone": "stylegan2",
         "trained_dataset": "coco", "resolution": 128}
    ) == "cc_icgan_stylegan2_coco_res128"

    assert stored_instances_path("/r", "imagenet", 64) == (
        "/r/stored_instances/imagenet_res64_rn50_selfsupervised"
        "_kmeans_k1000_instance_features.npy"
    )
    assert "classification" in stored_instances_path(
        "/r", "coco", 128, model="cc_icgan")

    import torch

    torch.save({"best_FID": 30.0}, tmp_path / "state_dict_best0.pth")
    torch.save({"best_FID": 12.5}, tmp_path / "state_dict_best1.pth")
    assert select_best_pth_suffix(str(tmp_path)) == "best1"
    assert select_best_pth_suffix(str(tmp_path / "nope")) == ""


def test_get_conditionings_index_pinning():
    """``index`` pins every conditioning row to one stored instance
    (ref generate_images.py:84-87)."""
    from ic_gan_tpu.cli.inference import get_conditionings

    feats = np.arange(12, dtype=np.float32).reshape(4, 3)
    labels = np.arange(4)
    z, lab, f, idxs = get_conditionings(3, 2, feats, labels, dim_z=5, index=2)
    assert z.shape == (6, 5)
    np.testing.assert_array_equal(idxs, [2, 2, 2])
    assert (np.asarray(f) == feats[2]).all()
    assert (np.asarray(lab) == 2).all()

    z, lab, f, idxs = get_conditionings(3, 2, feats, labels, dim_z=5,
                                        swap_target=1)
    np.testing.assert_array_equal(idxs, [0, 1, 2])
    assert (np.asarray(lab) == 1).all()


def test_conditioned_sampler_class_only():
    """Class-only models draw eval labels from the y distribution (ref
    ``get_sampling_funct``, inference/utils.py:29-173) — the dataset
    instance samplers must not be touched (no features exist)."""
    from ic_gan_tpu.cli.inference import make_conditioned_sampler
    from ic_gan_tpu.models.biggan import BigGANConfig

    mcfg = BigGANConfig(
        resolution=32, n_classes=7, class_cond=True, instance_cond=False,
    )
    seen = {}

    def apply_fn(z, label, feats, device_output=False):
        seen["label"] = label
        seen["feats"] = feats
        return jnp.zeros((z.shape[0], 32, 32, 3))

    cfg = {"seed": 3, "batch_size": 16}
    sample = make_conditioned_sampler(cfg, apply_fn, mcfg, dataset=None)
    imgs, labels = sample(16)
    assert labels is not None and len(labels) == 16
    assert np.asarray(labels).dtype.kind == "i"
    assert 0 <= int(np.min(labels)) and int(np.max(labels)) < 7
    assert seen["feats"] is None

    # constant_conditioning: every label zero (ref utils.py:884-885).
    sample0 = make_conditioned_sampler(
        {"seed": 3, "constant_conditioning": True}, apply_fn, mcfg,
        dataset=None)
    _, labels0 = sample0(8)
    assert (np.asarray(labels0) == 0).all()
