"""int8 serving mode: post-training quantization of a generator's convs.

The v5e MXU runs int8×int8→int32 at 1.56-1.67× its bf16 rate at the
sampler's hot geometries (probe: ``benchmarks/bench_quant_sample.py``), so
deployment sampling gains a quantized mode on top of ``io/deploy``'s
σ-folded bf16 path.  Not a reference feature (the reference serves eager
fp32 torch); this is TPU-native serving depth.

Scheme — standard symmetric post-training quantization:
  - per-output-channel absmax weight scales (int8 kernels),
  - per-conv per-tensor activation scales from a calibration run
    (max |input| across the provided calibration batches),
  - int32 MXU accumulation, dequant folded into the consumer's
    elementwise chain (CBN/bias/activation stay bf16),
  - the polyphase up-convs quantize their four *transformed* 2×2 phase
    kernels (quantizing the raw 3×3 first would double rounding error),
  - ``down2x`` convs and all non-conv layers are untouched (serving only
    runs the generator).

Calibration capture uses ``nn.intercept_methods`` to read every SNConv's
input absmax inside ONE jitted trace (un-jitted per-op dispatch is minutes
on the relay TPU — CLAUDE.md), keyed by the module path, which matches the
variables-tree nesting exactly.

Quality caveat (honest): with zero egress there are no trained weights to
validate perceptual quality against; ``benchmarks/bench_quant_sample.py``
pins the numeric drift vs the bf16 sampler on the random-init model, and
``tests/test_quant.py`` pins the quantization math bit-exactly.  A user
deploying real checkpoints should validate FID in int8 mode before
serving (the bench measures the machinery for doing so).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import linen as nn

from ic_gan_tpu.io.deploy import fold_spectral_norm
from ic_gan_tpu.ops.resample import polyphase_up_kernels


def _quantize_kernel(w: jax.Array) -> tuple:
    """Per-output-channel symmetric int8: returns (qkernel, wscale)."""
    w = w.astype(jnp.float32)
    s = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1))) / 127.0
    s = jnp.maximum(s, 1e-30)
    q = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return q, s


def calibrate_conv_scales(g_module, variables, *apply_args, **apply_kwargs):
    """One jitted forward pass recording every SNConv's input absmax and its
    resampling mode; returns {path tuple: (absmax, up2x, down2x)}."""
    from ic_gan_tpu.models.layers import SNConv

    meta = {}

    def run(v, *args):
        records = {}

        def interceptor(next_fn, a, kw, ctx):
            mod = ctx.module
            if isinstance(mod, SNConv) and ctx.method_name == "__call__":
                path = tuple(mod.path)
                x = a[0]
                m = jnp.max(jnp.abs(x.astype(jnp.float32)))
                records[path] = jnp.maximum(records.get(path, 0.0), m)
                meta[path] = (mod.up2x, mod.down2x)
            return next_fn(*a, **kw)

        with nn.intercept_methods(interceptor):
            g_module.apply(v, *args, **apply_kwargs)
        return records

    from ic_gan_tpu.models import layers as _layers

    # The attention θ/φ/g fusion skips the child SNConv calls in folded
    # deployment mode — disable it for the calibration trace so every conv
    # is intercepted (serving re-fuses from the per-conv quant records).
    _layers._ATTN_FUSION[0] = False
    try:
        absmax = jax.jit(run)(variables, *apply_args)
    finally:
        _layers._ATTN_FUSION[0] = True
    return {
        path: (float(absmax[path]), up2x, down2x)
        for path, (up2x, down2x) in meta.items()
    }


def quantize_variables(g_module, variables, *calib_args,
                       skip_attention: bool = True, **apply_kwargs):
    """σ-fold ``variables`` and add a ``quant`` collection holding int8
    kernels + scales for every SNConv the generator runs (except ``down2x``).

    ``calib_args`` are one representative ``g_module.apply`` input tuple
    (z, label, feats, ...); pass several batches by calling
    ``calibrate_conv_scales`` yourself and widening the scales.

    ``skip_attention`` (default True) leaves the SA-GAN attention blocks'
    θ/φ/g/o 1×1 projections in bf16: the block's FLOPs sit in the two
    softmax dots which stay bf16 either way, so int8 projections only add
    quant/dequant elementwise traffic on the 64² tensor — measured **0.88×**
    (slower than bf16) at the 256² sampler's attention block
    (``benchmarks/results/quant_attribution.json``).
    """
    if "sn" in variables:
        variables = fold_spectral_norm(variables)
    scales = calibrate_conv_scales(
        g_module, variables, *calib_args, **apply_kwargs
    )

    def get_node(tree, path):
        for p in path:
            tree = tree[p]
        return tree

    def build_all(params):
        quant: Dict[str, Any] = {}
        for path, (absmax, up2x, down2x) in scales.items():
            if down2x:
                continue
            if skip_attention and any(p.startswith("attn") for p in path):
                continue
            kernel = get_node(params, path)["kernel"].astype(jnp.float32)
            if up2x:
                qs = [_quantize_kernel(k)
                      for k in polyphase_up_kernels(kernel)]
                qk = jnp.stack([q for q, _ in qs])    # (4, 2, 2, cin, cout)
                ws = jnp.stack([s for _, s in qs])    # (4, cout)
            else:
                qk, ws = _quantize_kernel(kernel)
            node = quant
            for p in path[:-1]:
                node = node.setdefault(p, {})
            node[path[-1]] = {
                "act_scale": jnp.float32(max(absmax, 1e-30) / 127.0),
                "qkernel": qk,
                "wscale": ws,
            }
        return quant

    out = dict(variables)
    out["quant"] = jax.jit(build_all)(variables["params"])
    return out


def quantize_stylegan2_variables(g_module, variables, *calib_args,
                                 resample_filter=(1, 3, 3, 1),
                                 per_channel_act: bool = True,
                                 act_dynamic: bool = False,
                                 **apply_kwargs):
    """int8 serving mode for the StyleGAN2 backbone.

    Modulated convs put the per-sample style scaling on the *activations*
    (``modulated_conv2d``: ``conv(x·s, w)`` then demod), so the weight is
    static per checkpoint and quantizes exactly like a plain conv:
      - per-output-channel int8 weight scales,
      - per-layer **per-input-channel** activation scales calibrated on the
        **modulated** input ``x·s`` (sown by ``_layer_quant`` during a
        calibration forward).  The channel scale is folded into the weight
        before weight quantization (``conv(x·s, w) == conv((x·s)/a, w·a)``),
        so serving still dequantizes with one per-output-channel multiply.
        Per-channel is the default because per-sample style modulation makes
        per-tensor absmax collapse most channels onto few int8 levels
        (measured 7.1% image drift per-tensor; ``per_channel_act=False``
        restores the old scheme),
      - per-sample **dynamic** range adaptation (``act_dynamic``, opt-in
        quality knob): serving computes one scalar per sample,
        ``g_n = 127/max|x_n/a|``, boosts the pre-quant input by it and
        undoes it in the dequant epilogue.  The static absmax covers the
        hottest calibration sample; a per-sample scalar commutes with the
        conv's channel contraction (a per-sample-per-channel scale would
        not), so samples with smaller style magnitudes get the full int8
        range and out-of-calibration samples never clip.  Measured at the
        256² serving geometry: drift 4.97% → 3.96%, but the extra
        reduce-max pass over every pre-quant tensor costs 1.91× → 1.68×
        e2e (``benchmarks/results/quant_sg2.json``), so static per-channel
        stays the default,
      - ``up=2`` layers quantize the four *composite polyphase* kernels
        (w ⊛ FIR, phase-split — ``ops/conv_resample._conv_up2_polyphase``),
        so FIR filtering rides the int8 MXU pass too and the transformed
        taps are rounded once,
      - demod/noise/bias/act stay bf16; the bf16 overflow pre-norm is
        skipped (it cancels mathematically; int32 accumulation can't
        overflow).

    ``calib_args``/``apply_kwargs`` are one representative ``apply`` input
    (z, c, feats, noise_mode="const", ...).  ``resample_filter`` must match
    the synthesis layers' config (the calibration sow doesn't carry it).
    """
    import numpy as np

    from ic_gan_tpu.ops.conv_resample import _compose_kernel
    from ic_gan_tpu.ops.resample import setup_filter

    def calib(v, *args):
        _, mut = g_module.apply(
            v, *args, **apply_kwargs, mutable=["quant_calib"]
        )
        return mut["quant_calib"]

    calib_tree = jax.device_get(
        jax.jit(calib)(variables, *calib_args)
    )

    f = jnp.asarray(
        setup_filter(jnp.asarray(np.asarray(resample_filter, np.float32)))
    )
    f2d = (jnp.outer(f, f) if f.ndim == 1 else f) * 4.0  # gain = up²

    def leaves(tree, path=()):
        if isinstance(tree, dict) and "absmax" in tree:
            yield path, tree
            return
        if isinstance(tree, dict):
            for k, v in tree.items():
                yield from leaves(v, path + (k,))

    entries = [(path, np.asarray(node["absmax"], np.float32),
                int(np.asarray(node["up"])))
               for path, node in leaves(calib_tree)]

    def get_node(tree, path):
        for p in path:
            tree = tree[p]
        return tree

    def build_all(params):
        quant: Dict[str, Any] = {}
        for path, absmax, up in entries:
            w = get_node(params, path)["weight"].astype(jnp.float32)
            if per_channel_act:
                # Per-input-channel activation scale (vector over I); fold
                # it into the weight so dequant stays per-output-channel.
                av = jnp.asarray(np.maximum(absmax, 1e-30) / 127.0)
                w = w * av[None, None, :, None]
                act_scale = av
            else:
                act_scale = jnp.float32(
                    max(float(absmax.max()), 1e-30) / 127.0)
            if up == 1:
                qk, ws = _quantize_kernel(w)
            elif up == 2 and w.shape[0] == 3 and w.shape[1] == 3:
                # flip_weight=False for up=2 (conv semantics) → compose the
                # FLIPPED kernel with the FIR, exactly as conv2d_resample.
                # (Per-input-channel folding commutes with the spatial
                # composition — a scales the I axis, the FIR the H/W axes.)
                K = _compose_kernel(jnp.flip(w, axis=(0, 1)), f2d)
                qs = [
                    _quantize_kernel(K[(3 - a) % 2:: 2, (3 - b) % 2:: 2])
                    for a in (0, 1) for b in (0, 1)
                ]
                qk = jnp.concatenate([q for q, _ in qs], axis=-1)
                ws = jnp.stack([s for _, s in qs])  # (4, O)
            else:  # unsupported geometry: leave this layer unquantized
                continue
            node = quant
            for p in path[:-1]:
                node = node.setdefault(p, {})
            node[path[-1]] = {
                "act_scale": act_scale,
                "qkernel": qk,
                "wscale": ws,
            }
            if act_dynamic:
                # Marker leaf: its presence in the layer's quant dict is the
                # (trace-static) switch for the per-sample dynamic path.
                node[path[-1]]["act_dynamic"] = jnp.int8(1)
        return quant

    out = dict(variables)
    out["quant"] = jax.jit(build_all)(variables["params"])
    return out
