"""Convert reference PyTorch BigGAN checkpoints (.pth state dicts) into
ic_gan_tpu Flax variable trees.

The reference saves per-module ``.pth`` bundles (``G.pth``/``G_ema.pth``/
``D.pth`` + ``state_dict.pth`` carrying the config — ``BigGAN_PyTorch/
utils.py:1116-1167``).  Module names map 1:1 from the torch module tree
(``BigGAN.py:88-642``); this file holds the name/layout mapping:

  torch                                  ours
  -----------------------------------   -------------------------------------
  shared.weight            (N, D)       params/shared                (N, D)
  shared_feat.weight       (D, 2048)    params/shared_feat/kernel    (2048, D)ᵀ
  linear.weight            (O, I)       params/linear/kernel         (I, O)ᵀ
  blocks.{i}.0.conv1.weight (O,I,kh,kw) params/block_{i}/conv1/kernel (kh,kw,I,O)
  blocks.{i}.0.bn1.gain.weight          params/block_{i}/bn1/gain/kernel ᵀ
  blocks.{i}.0.bn1.stored_mean          batch_stats/block_{i}/bn1/bn/mean
  blocks.{i}.1.theta.weight (attention) params/attn_{i}/theta/kernel
  output_layer.0.{gain,bias,stored_*}   params|batch_stats/output_bn/...
  output_layer.2.weight                 params/output_conv/kernel
  *.u0 / *.sv0                          sn/<module>/u / sn/<module>/sv

Spectral-norm ``u`` vectors transfer directly: σ is invariant to the
matricization order difference (torch flattens OIHW as (O, I·kh·kw), we
flatten HWIO as (O, kh·kw·I)) and ``u`` lives in the O-dimensional space.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from ic_gan_tpu.models.biggan import BigGANConfig, d_arch, g_arch


def _t_linear(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _t_conv(w):
    return np.ascontiguousarray(np.transpose(np.asarray(w), (2, 3, 1, 0)))


def _ident(w):
    return np.asarray(w)


def _sn_entries(dst: Dict, tree_path: Tuple[str, ...], torch_prefix: str):
    """u0/sv0 buffers → sn collection."""
    dst[("sn",) + tree_path + ("u",)] = (f"{torch_prefix}.u0", _ident)
    dst[("sn",) + tree_path + ("sv",)] = (f"{torch_prefix}.sv0", _ident)


def _dense(dst, tree_path, torch_prefix, bias=True):
    dst[("params",) + tree_path + ("kernel",)] = (f"{torch_prefix}.weight", _t_linear)
    if bias:
        dst[("params",) + tree_path + ("bias",)] = (f"{torch_prefix}.bias", _ident)
    _sn_entries(dst, tree_path, torch_prefix)


def _conv(dst, tree_path, torch_prefix, bias=True):
    dst[("params",) + tree_path + ("kernel",)] = (f"{torch_prefix}.weight", _t_conv)
    if bias:
        dst[("params",) + tree_path + ("bias",)] = (f"{torch_prefix}.bias", _ident)
    _sn_entries(dst, tree_path, torch_prefix)


def _ccbn(dst, tree_path, torch_prefix):
    _dense(dst, tree_path + ("gain",), f"{torch_prefix}.gain", bias=False)
    _dense(dst, tree_path + ("bias",), f"{torch_prefix}.bias", bias=False)
    dst[("batch_stats",) + tree_path + ("bn", "mean")] = (
        f"{torch_prefix}.stored_mean", _ident,
    )
    dst[("batch_stats",) + tree_path + ("bn", "var")] = (
        f"{torch_prefix}.stored_var", _ident,
    )


def _attention(dst, tree_path, torch_prefix):
    for name in ("theta", "phi", "g", "o"):
        _conv(dst, tree_path + (name,), f"{torch_prefix}.{name}", bias=False)
    dst[("params",) + tree_path + ("gamma",)] = (f"{torch_prefix}.gamma", _ident)


def generator_key_map(cfg: BigGANConfig) -> Dict[Tuple[str, ...], Tuple[str, Any]]:
    """Mapping: our flattened variable path -> (torch key, transform)."""
    arch = g_arch(cfg.resolution, cfg.G_ch, cfg.G_attn)
    m: Dict[Tuple[str, ...], Tuple[str, Any]] = {}
    if cfg.class_cond:
        m[("params", "shared")] = ("shared.weight", _ident)
    if cfg.instance_cond and cfg.G_shared_feat:
        _dense(m, ("shared_feat",), "shared_feat")
    _dense(m, ("linear",), "linear")
    for i in range(len(arch["out_channels"])):
        p = ("block_%d" % i,)
        t = f"blocks.{i}.0"
        _ccbn(m, p + ("bn1",), f"{t}.bn1")
        _ccbn(m, p + ("bn2",), f"{t}.bn2")
        _conv(m, p + ("conv1",), f"{t}.conv1")
        _conv(m, p + ("conv2",), f"{t}.conv2")
        if arch["in_channels"][i] != arch["out_channels"][i] or arch["upsample"][i]:
            _conv(m, p + ("conv_sc",), f"{t}.conv_sc")
        if arch["attention"][i]:
            _attention(m, ("attn_%d" % i,), f"blocks.{i}.1")
    m[("params", "output_bn", "gain")] = ("output_layer.0.gain", _ident)
    m[("params", "output_bn", "bias")] = ("output_layer.0.bias", _ident)
    m[("batch_stats", "output_bn", "bn", "mean")] = (
        "output_layer.0.stored_mean", _ident,
    )
    m[("batch_stats", "output_bn", "bn", "var")] = (
        "output_layer.0.stored_var", _ident,
    )
    _conv(m, ("output_conv",), "output_layer.2")
    return m


def discriminator_key_map(cfg: BigGANConfig) -> Dict[Tuple[str, ...], Tuple[str, Any]]:
    arch = d_arch(cfg.resolution, cfg.D_ch, cfg.D_attn)
    m: Dict[Tuple[str, ...], Tuple[str, Any]] = {}
    for i in range(len(arch["out_channels"])):
        p = ("block_%d" % i,)
        t = f"blocks.{i}.0"
        _conv(m, p + ("conv1",), f"{t}.conv1")
        _conv(m, p + ("conv2",), f"{t}.conv2")
        if arch["in_channels"][i] != arch["out_channels"][i] or arch["downsample"][i]:
            _conv(m, p + ("conv_sc",), f"{t}.conv_sc")
        if arch["attention"][i]:
            _attention(m, ("attn_%d" % i,), f"blocks.{i}.1")
    _dense(m, ("linear",), "linear")
    if cfg.class_cond:
        m[("params", "embed", "embedding")] = ("embed.weight", _ident)
        _sn_entries(m, ("embed",), "embed")
    if cfg.instance_cond:
        _dense(m, ("linear_feat",), "linear_feat")
    return m


def deep_generator_key_map(cfg) -> Dict[Tuple[str, ...], Tuple[str, Any]]:
    """BigGAN-deep G (ref ``BigGANdeep.py``).  Torch flattens the per-stage
    depth stack as ``blocks.{stage*G_depth+g}.0`` with attention appended to
    the last sublist of the stage (``blocks.{...}.1``)."""
    from ic_gan_tpu.models.biggan import g_arch

    arch = g_arch(cfg.resolution, cfg.G_ch, cfg.G_attn)
    m: Dict[Tuple[str, ...], Tuple[str, Any]] = {}
    if cfg.class_cond:
        m[("params", "shared")] = ("shared.weight", _ident)
    if cfg.instance_cond and cfg.G_shared_feat:
        _dense(m, ("shared_feat",), "shared_feat")
    _dense(m, ("linear",), "linear")
    for i in range(len(arch["out_channels"])):
        for g in range(cfg.G_depth):
            p = (f"block_{i}_{g}",)
            t = f"blocks.{i * cfg.G_depth + g}.0"
            for b in range(1, 5):
                _ccbn(m, p + (f"bn{b}",), f"{t}.bn{b}")
            for c in range(1, 5):
                _conv(m, p + (f"conv{c}",), f"{t}.conv{c}")
        if arch["attention"][i]:
            _attention(
                m, (f"attn_{i}",),
                f"blocks.{i * cfg.G_depth + cfg.G_depth - 1}.1",
            )
    m[("params", "output_bn", "gain")] = ("output_layer.0.gain", _ident)
    m[("params", "output_bn", "bias")] = ("output_layer.0.bias", _ident)
    m[("batch_stats", "output_bn", "bn", "mean")] = (
        "output_layer.0.stored_mean", _ident,
    )
    m[("batch_stats", "output_bn", "bn", "var")] = (
        "output_layer.0.stored_var", _ident,
    )
    _conv(m, ("output_conv",), "output_layer.2")
    return m


def deep_discriminator_key_map(cfg) -> Dict[Tuple[str, ...], Tuple[str, Any]]:
    """BigGAN-deep D: ``blocks.{stage}.{d_index}``, attention at
    ``blocks.{stage}.{D_depth}``, stem ``input_conv``."""
    from ic_gan_tpu.models.biggan_deep import deep_d_arch

    arch = deep_d_arch(cfg.resolution, cfg.D_ch, cfg.D_attn)
    m: Dict[Tuple[str, ...], Tuple[str, Any]] = {}
    _conv(m, ("input_conv",), "input_conv")
    for i in range(len(arch["out_channels"])):
        for d in range(cfg.D_depth):
            p = (f"block_{i}_{d}",)
            t = f"blocks.{i}.{d}"
            for c in range(1, 5):
                _conv(m, p + (f"conv{c}",), f"{t}.conv{c}")
            in_f = arch["in_channels"][i] if d == 0 else arch["out_channels"][i]
            if in_f != arch["out_channels"][i]:
                _conv(m, p + ("conv_sc",), f"{t}.conv_sc")
        if arch["attention"][i]:
            _attention(m, (f"attn_{i}",), f"blocks.{i}.{cfg.D_depth}")
    _dense(m, ("linear",), "linear")
    if cfg.class_cond:
        m[("params", "embed", "embedding")] = ("embed.weight", _ident)
        _sn_entries(m, ("embed",), "embed")
    if cfg.instance_cond:
        _dense(m, ("linear_feat",), "linear_feat")
    return m


def _build_variables(key_map, torch_sd: Dict[str, np.ndarray]):
    from flax.traverse_util import unflatten_dict
    import jax.numpy as jnp

    flat = {}
    missing = []
    for path, (tkey, transform) in key_map.items():
        if tkey not in torch_sd:
            missing.append(tkey)
            continue
        flat[path] = jnp.asarray(transform(torch_sd[tkey]))
    if missing:
        raise KeyError(f"torch state dict is missing keys: {missing[:10]}"
                       f" (+{max(0, len(missing)-10)} more)")
    variables = unflatten_dict(flat)
    # accum_counter buffers (standing stats) have no torch counterpart.
    def add_counters(d):
        for k, v in list(d.items()):
            if isinstance(v, dict):
                if "mean" in v and "var" in v:
                    v.setdefault("accum_counter", jnp.zeros((1,)))
                else:
                    add_counters(v)
    if "batch_stats" in variables:
        add_counters(variables["batch_stats"])
    return variables


def _validate_shapes(variables, cfg: BigGANConfig, which: str):
    """Cross-check converted tensor shapes against the model the config
    builds — catches config/checkpoint mismatches at load time instead of as
    an XLA shape error deep inside apply."""
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict

    from ic_gan_tpu.models import biggan

    z = jnp.zeros((1, cfg.effective_dim_z))
    feats = jnp.zeros((1, cfg.instance_sz)) if cfg.instance_cond else None
    label = jnp.zeros((1,), jnp.int32) if cfg.class_cond else None
    if which == "G":
        mod = biggan.Generator(cfg)
        expected = jax.eval_shape(
            lambda: mod.init(jax.random.PRNGKey(0), z, label, feats, train=False)
        )
    else:
        mod = biggan.Discriminator(cfg)
        x = jnp.zeros((1, cfg.resolution, cfg.resolution, 3))
        expected = jax.eval_shape(
            lambda: mod.init(jax.random.PRNGKey(0), x, label, feats, train=False)
        )
    exp_flat = flatten_dict(jax.tree.map(lambda s: s.shape, expected))
    got_flat = flatten_dict(jax.tree.map(lambda a: a.shape, variables))
    mismatched = [
        (k, got_flat.get(k), v)
        for k, v in exp_flat.items()
        if k in got_flat and tuple(got_flat[k]) != tuple(v)
    ]
    missing = [k for k in exp_flat if k not in got_flat]
    if mismatched or missing:
        msg = []
        if mismatched:
            msg.append(
                "shape mismatches (checkpoint vs config): "
                + ", ".join(f"{'/'.join(k)}: {g} != {e}" for k, g, e in mismatched[:8])
            )
        if missing:
            msg.append("missing entries: " + ", ".join("/".join(k) for k in missing[:8]))
        raise ValueError(
            f"{which} checkpoint does not match config "
            f"(resolution={cfg.resolution}, ch={cfg.G_ch if which=='G' else cfg.D_ch}): "
            + "; ".join(msg)
        )


def load_generator_variables(
    torch_sd: Dict[str, np.ndarray], cfg: BigGANConfig, validate: bool = True
):
    """torch ``G.state_dict()`` (tensors as numpy) → Flax variables."""
    variables = _build_variables(generator_key_map(cfg), torch_sd)
    if validate:
        _validate_shapes(variables, cfg, "G")
    return variables


def load_discriminator_variables(
    torch_sd: Dict[str, np.ndarray], cfg: BigGANConfig, validate: bool = True
):
    variables = _build_variables(discriminator_key_map(cfg), torch_sd)
    if validate:
        _validate_shapes(variables, cfg, "D")
    return variables


def load_deep_generator_variables(torch_sd: Dict[str, np.ndarray], cfg):
    """BigGAN-deep ``G.state_dict()`` → Flax variables."""
    return _build_variables(deep_generator_key_map(cfg), torch_sd)


def load_deep_discriminator_variables(torch_sd: Dict[str, np.ndarray], cfg):
    return _build_variables(deep_discriminator_key_map(cfg), torch_sd)


def _inv_linear(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _inv_conv(w):
    return np.ascontiguousarray(np.transpose(np.asarray(w), (3, 2, 0, 1)))


_INVERSES = {}  # populated below once the forward transforms exist


def export_generator_state_dict(variables, cfg: BigGANConfig,
                                deep: bool = False) -> Dict[str, np.ndarray]:
    """Inverse conversion: Flax variables → reference torch ``state_dict``
    layout (numpy values), so models trained here can be consumed by the
    reference tooling.  Round-trip safe with ``load_generator_variables``."""
    key_map = (
        deep_generator_key_map(cfg) if deep else generator_key_map(cfg)
    )
    return _export(variables, key_map)


def export_discriminator_state_dict(variables, cfg: BigGANConfig,
                                    deep: bool = False) -> Dict[str, np.ndarray]:
    key_map = (
        deep_discriminator_key_map(cfg) if deep else discriminator_key_map(cfg)
    )
    return _export(variables, key_map)


def _export(variables, key_map) -> Dict[str, np.ndarray]:
    from flax.traverse_util import flatten_dict

    inverses = {_t_linear: _inv_linear, _t_conv: _inv_conv, _ident: _ident}
    flat = flatten_dict(variables)
    out = {}
    for path, (tkey, transform) in key_map.items():
        if path not in flat:
            raise KeyError(f"variables missing {'/'.join(path)}")
        out[tkey] = np.asarray(inverses[transform](flat[path]))
    return out


def config_from_state_dict(state_dict_config: Dict[str, Any]) -> BigGANConfig:
    """Resurrect a model config from the reference's saved ``state_dict``
    config blob, mirroring ``inference/utils.py:311-368``."""
    c = state_dict_config
    return BigGANConfig(
        resolution=c.get("resolution", 128),
        n_classes=c.get("n_classes", 1000),
        G_ch=c.get("G_ch", 96),
        D_ch=c.get("D_ch", 96),
        dim_z=c.get("dim_z", 120),
        bottom_width=c.get("bottom_width", 4),
        G_attn=str(c.get("G_attn", "64")),
        D_attn=str(c.get("D_attn", "64")),
        G_shared=c.get("G_shared", True),
        shared_dim=c.get("shared_dim", 128),
        hier=c.get("hier", True),
        class_cond=c.get("class_cond", True),
        instance_cond=c.get("instance_cond", False),
        G_shared_feat=c.get("G_shared_feat", True),
        shared_dim_feat=c.get("shared_dim_feat", 2048),
        SN_eps=c.get("SN_eps", 1e-6),
        BN_eps=c.get("BN_eps", 1e-5),
    )


def select_best_pth_suffix(weights_dir: str, num_best: int = 2) -> str:
    """Pick the ``best%d`` copy with the lowest recorded FID from the
    reference's ``state_dict_best{i}.pth`` files (``inference/utils.py:
    285-308``).  Returns "" when no best copies exist."""
    import os
    import torch

    best, best_fid = "", float("inf")
    for i in range(num_best):
        path = os.path.join(weights_dir, f"state_dict_best{i}.pth")
        if not os.path.exists(path):
            continue
        sd = torch.load(path, map_location="cpu")
        fid = float(sd.get("best_FID", float("inf")))
        if fid < best_fid:
            best_fid, best = fid, f"best{i}"
    return best


def load_pth_bundle(weights_dir: str, name: str = "G_ema", suffix: str = ""):
    """Load one ``.pth`` file from a reference checkpoint directory as a
    numpy state dict (requires torch; ref layout ``utils.py:1116-1265``)."""
    import os
    import torch

    fname = f"{name}{('_' + suffix) if suffix else ''}.pth"
    sd = torch.load(os.path.join(weights_dir, fname), map_location="cpu")
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
