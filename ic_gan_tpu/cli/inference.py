"""Inference utilities: model loading and unified sampling.

Reference: ``inference/utils.py`` — best-checkpoint selection
(``:285-308``), config resurrection (``:334-368``), backbone-agnostic
``sample()`` (``:176-265``) and ``get_sampling_funct`` (``:29-173``).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


def load_model_inference(cfg: Dict[str, Any]):
    """Load a generator for inference.

    Supports three sources:
    - native checkpoints (``weights_root``/``experiment_name`` dirs, best-FID
      selection like ``inference/utils.py:285-308``);
    - reference BigGAN ``.pth`` bundles (``backbone='biggan'`` +
      ``pth_dir``);
    - reference StyleGAN2 pickles (``backbone='stylegan2'`` + ``network_pkl``).

    Returns ``(apply_fn, model_cfg)`` where
    ``apply_fn(z, label, feats, **kw) -> images NHWC in [-1, 1]``.
    """
    backbone = cfg.get("backbone", "biggan")
    if backbone == "biggan":
        from ic_gan_tpu.cli.config import split_config
        from ic_gan_tpu.models.biggan_deep import (
            BigGANDeepConfig,
            Generator as DeepGenerator,
        )
        from ic_gan_tpu.models.biggan import Generator

        model_cfg, _, _, _ = split_config(cfg)
        deep = isinstance(model_cfg, BigGANDeepConfig)
        g = DeepGenerator(model_cfg) if deep else Generator(model_cfg)
        if cfg.get("pth_dir"):
            from ic_gan_tpu.io.torch_import import (
                load_deep_generator_variables,
                load_generator_variables,
                load_pth_bundle,
            )

            which = cfg.get("which_model", "G_ema")
            sd = load_pth_bundle(cfg["pth_dir"], which, cfg.get("suffix", ""))
            variables = (
                load_deep_generator_variables(sd, model_cfg)
                if deep
                else load_generator_variables(sd, model_cfg)
            )
        else:
            from ic_gan_tpu.io.checkpoint import (
                find_best_checkpoint,
                load_checkpoint,
            )
            from ic_gan_tpu.train.state import GANTrainState

            # Build a template state to restore into.
            rng = jax.random.PRNGKey(0)
            z = jnp.zeros((1, model_cfg.effective_dim_z))
            feats = (
                jnp.zeros((1, model_cfg.instance_sz))
                if model_cfg.instance_cond else None
            )
            label = jnp.zeros((1,), jnp.int32) if model_cfg.class_cond else None
            g_vars = g.init(rng, z, label, feats)
            root = cfg.get("weights_root", "weights")
            name = cfg["experiment_name"]
            suffix = cfg.get("load_weights", "")
            if not suffix:
                best, _ = find_best_checkpoint(root, name)
                suffix = os.path.basename(best)[len(name) + 1:] if best else ""
            from ic_gan_tpu.models.biggan import Discriminator
            from ic_gan_tpu.models.biggan_deep import (
                Discriminator as DeepDiscriminator,
            )
            from ic_gan_tpu.train.step import TrainConfig

            tcfg = TrainConfig()
            d_cls = DeepDiscriminator if deep else Discriminator
            d_vars = d_cls(model_cfg).init(
                rng, jnp.zeros((1, model_cfg.resolution, model_cfg.resolution, 3)),
                label, feats,
            )
            template = GANTrainState.create(
                g_vars, d_vars, tcfg.g_optimizer(), tcfg.d_optimizer()
            )
            state, _ = load_checkpoint(root, name, template, suffix)
            use_ema = cfg.get("use_ema", True)
            variables = {
                "params": state.g_ema_params if use_ema else state.g_params,
                **(state.g_ema_state if use_ema else state.g_state),
            }

        def apply_fn(z, label=None, feats=None, **kw):
            return g.apply(variables, z, label, feats, train=False)

        return apply_fn, model_cfg

    elif backbone == "stylegan2":
        from ic_gan_tpu.models import stylegan2 as sg2

        if cfg.get("network_pkl"):
            from ic_gan_tpu.io.stylegan_import import load_network_pkl

            nets = load_network_pkl(cfg["network_pkl"])
            variables, init_kwargs = nets.get("G_ema", nets.get("G"))
            model_cfg = sg2.StyleGAN2Config(
                img_resolution=init_kwargs.get("img_resolution", 256),
                z_dim=init_kwargs.get("z_dim", 512),
                c_dim=init_kwargs.get("c_dim", 0),
                h_dim=init_kwargs.get("h_dim", 2048),
                w_dim=init_kwargs.get("w_dim", 512),
            )
        else:
            raise ValueError("stylegan2 inference needs network_pkl")
        g = sg2.Generator(model_cfg)

        def apply_fn(z, label=None, feats=None, truncation_psi=1.0, **kw):
            return g.apply(
                variables, z, label, feats, truncation_psi=truncation_psi,
                noise_mode=kw.get("noise_mode", "const"),
            )

        return apply_fn, model_cfg
    raise ValueError(f"unknown backbone {backbone}")


def get_conditionings(
    num_instances: int,
    num_imgs_gen: int,
    stored_features: np.ndarray,
    stored_labels: Optional[np.ndarray],
    dim_z: int,
    z_var: float = 1.0,
    swap_target: Optional[int] = None,
    seed: int = 0,
):
    """Replicate ``generate_images.py:68-124``: for each stored instance,
    draw ``num_imgs_gen`` z's; optionally override the class label."""
    rng = jax.random.PRNGKey(seed)
    feats = np.repeat(stored_features[:num_instances], num_imgs_gen, axis=0)
    z = jax.random.normal(
        rng, (num_instances * num_imgs_gen, dim_z)
    ) * np.sqrt(z_var)
    labels = None
    if stored_labels is not None:
        labels = np.repeat(stored_labels[:num_instances], num_imgs_gen, axis=0)
    if swap_target is not None:
        labels = np.full(num_instances * num_imgs_gen, swap_target, np.int64)
    return z, labels, feats


def save_image_grid(images: np.ndarray, path: str, nrow: int = 8):
    """[-1,1] NHWC float → PNG grid."""
    from PIL import Image

    n, h, w, c = images.shape
    ncol = (n + nrow - 1) // nrow
    grid = np.zeros((ncol * h, nrow * w, c), np.float32)
    for i in range(n):
        r, col = divmod(i, nrow)
        grid[r * h : (r + 1) * h, col * w : (col + 1) * w] = images[i]
    grid = np.clip((grid + 1) / 2, 0, 1)
    Image.fromarray((grid * 255).astype(np.uint8)).save(path)
    return path
