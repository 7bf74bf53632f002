"""Config plumbing: reference-style flag surface + JSON overlay.

The reference drives everything from ~130 argparse flags overlaid with a JSON
config (``BigGAN_PyTorch/run.py:30-43``, 28 published JSONs under
``config_files/**``).  This module accepts those same JSON files/keys and
splits them into the three dataclass configs of this framework.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from typing import Any, Dict, Tuple

import jax.numpy as jnp

from ic_gan_tpu.models.biggan import BigGANConfig
from ic_gan_tpu.train.step import TrainConfig
from ic_gan_tpu.train.trainer import TrainerConfig


def split_config(cfg: Dict[str, Any]) -> Tuple[BigGANConfig, TrainConfig, TrainerConfig, Dict]:
    """Split a reference-style flat config dict into typed configs.

    Reference JSON keys map directly; ``batch_size`` in the reference JSON is
    the per-accumulation microbatch (``run.py:40-43`` re-derives the total as
    ``bs·D_acc·D_steps`` — we keep the microbatch meaning).
    Returns (model_cfg, train_cfg, trainer_cfg, data_kwargs).
    """
    g = cfg.get

    if g("model", "BigGAN") == "BigGANdeep":
        # Deep backbone selection, reference trainer.py:122
        # (__import__(config["model"])).
        from ic_gan_tpu.models.biggan_deep import BigGANDeepConfig

        model = BigGANDeepConfig(
            resolution=g("resolution", 64),
            n_classes=g("n_classes", 1000),
            G_ch=g("G_ch", 64),
            D_ch=g("D_ch", 64),
            dim_z=g("dim_z", 128),
            G_depth=g("G_depth", 2),
            D_depth=g("D_depth", 2),
            G_attn=str(g("G_attn", "64")),
            D_attn=str(g("D_attn", "64")),
            G_shared=g("G_shared", True),
            shared_dim=g("shared_dim", 128),
            hier=g("hier", True),
            class_cond=g("class_cond", True),
            instance_cond=g("instance_cond", False),
            G_shared_feat=g("G_shared_feat", True),
            shared_dim_feat=g("shared_dim_feat", 2048),
            dtype=jnp.bfloat16 if g("bf16", False) else jnp.float32,
        )
        return (model,) + _split_train_and_data(cfg)

    model = BigGANConfig(
        resolution=g("resolution", 64),
        n_classes=g("n_classes", 1000),
        G_ch=g("G_ch", 64),
        D_ch=g("D_ch", 64),
        dim_z=g("dim_z", 120),
        bottom_width=g("bottom_width", 4),
        G_attn=str(g("G_attn", "64")),
        D_attn=str(g("D_attn", "64")),
        G_shared=g("G_shared", True),
        shared_dim=g("shared_dim", 128),
        hier=g("hier", True),
        class_cond=g("class_cond", False),
        instance_cond=g("instance_cond", True),
        G_shared_feat=g("G_shared_feat", True),
        shared_dim_feat=g("shared_dim_feat", 512),
        dtype=jnp.bfloat16 if g("bf16", False) else jnp.float32,
    )
    return (model,) + _split_train_and_data(cfg)


def _split_train_and_data(cfg: Dict[str, Any]):
    g = cfg.get
    train = TrainConfig(
        num_D_steps=g("num_D_steps", 1),
        num_D_accumulations=g("num_D_accumulations", 1),
        num_G_accumulations=g("num_G_accumulations", 1),
        G_lr=g("G_lr", 5e-5),
        D_lr=g("D_lr", 2e-4),
        G_B1=g("G_B1", 0.0),
        G_B2=g("G_B2", 0.999),
        D_B1=g("D_B1", 0.0),
        D_B2=g("D_B2", 0.999),
        adam_eps=g("adam_eps", 1e-6),
        loss=g("which_loss", "hinge"),
        ema=g("ema", True),
        ema_decay=g("ema_decay", 0.9999),
        ema_start=g("ema_start", 20000),
        G_ortho=g("G_ortho", 0.0),
        D_ortho=g("D_ortho", 0.0),
        DiffAugment=g("DiffAugment", "") if g("DA", False) else "",
        z_var=g("z_var", 1.0),
        class_cond=g("class_cond", False),
        instance_cond=g("instance_cond", True),
    )
    trainer = TrainerConfig(
        experiment_name=g("experiment_name", "icgan_experiment"),
        weights_root=g("weights_root", "weights"),
        logs_root=g("logs_root", "logs"),
        num_epochs=g("num_epochs", 100),
        test_every=g("test_every", 5),
        save_every=g("save_every", 1),
        num_save_copies=g("num_save_copies", 2),
        num_best_copies=g("num_best_copies", 2),
        which_best=g("which_best", "FID"),
        es_patience=g("es_patience", 50),
        seed=g("seed", 0),
        deterministic_run=g("deterministic_run", True),
        batch_size=g("batch_size", 64),
    )
    data_kwargs = dict(
        resolution=g("resolution", 64),
        data_path=g("data_root", g("data_path", "data")),
        which_dataset=g("which_dataset", "imagenet"),
        longtail=g("longtail", False),
        class_cond=g("class_cond", False),
        instance_cond=g("instance_cond", True),
        feature_extractor=g("feature_extractor", "selfsupervised"),
        backbone_feature_extractor=g("backbone_feature_extractor", "resnet50"),
        which_nn_balance=g("which_nn_balance", "instance_balance"),
        kmeans_subsampled=g("kmeans_subsampled", -1),
        n_subsampled_data=g("n_subsampled_data", -1),
        feature_augmentation=g("feature_augmentation", False),
        k_nn=g("k_nn", 50),
        hflip=g("hflips", False),
        load_in_mem_feats=g("load_in_mem_feats", True),
    )
    return train, trainer, data_kwargs


def parse_args(argv=None) -> Dict[str, Any]:
    """CLI: ``--json_config path`` overlaid with ``--set key=value`` pairs
    (reference pattern: run.py:30-43)."""
    p = argparse.ArgumentParser(description="ic_gan_tpu")
    p.add_argument("--json_config", type=str, default="")
    p.add_argument(
        "--set", nargs="*", default=[],
        help="key=value overrides (JSON-decoded values)",
    )
    args, _ = p.parse_known_args(argv)
    cfg: Dict[str, Any] = {}
    if args.json_config:
        with open(args.json_config) as f:
            cfg.update(json.load(f))
    for kv in args.set:
        k, v = kv.split("=", 1)
        try:
            cfg[k] = json.loads(v)
        except json.JSONDecodeError:
            cfg[k] = v
    return cfg
