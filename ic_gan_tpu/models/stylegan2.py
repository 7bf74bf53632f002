"""StyleGAN2-ADA generator/discriminator with IC-GAN instance conditioning
(Flax, NHWC, TPU-native).

Re-design of ``stylegan2_ada_pytorch/training/networks.py``:

- ``modulated_conv2d`` (ref ``networks.py:37-117``) — implemented in the
  *unfused* formulation (scale activations → conv → demodulate): on TPU the
  grouped-conv "fused" trick buys nothing (XLA already fuses the scales into
  the conv), and the demod coefficients reduce to a (N,I)·(I,O) matmul
  instead of materializing per-sample kernels.
- ``MappingNetwork`` with the IC-GAN ``h`` path: instance features embedded,
  concatenated with the class embedding and 2nd-moment-normalized
  (ref ``networks.py:238-354``).
- Synthesis: const input, skip/resnet/orig architectures, per-layer noise,
  lazy upfirdn2d resampling, optional bf16 for the top resolutions (the
  reference's fp16, ``networks.py:492-703``).
- Discriminator whose conditioning map runs ``MappingNetwork(z=0, c, h)`` →
  ``cmap`` projection in the epilogue (ref ``networks.py:978-1100``).

Parameter layouts: FC kernels ``(in, out)``; conv kernels ``(kh, kw, in,
out)``; the pkl converter transposes from torch.  All runtime equalized-lr
scalings match the reference exactly (weights stored unscaled).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from ic_gan_tpu.ops.bias_act import activation_funcs, bias_act
from ic_gan_tpu.ops.conv_resample import conv2d_resample
from ic_gan_tpu.ops.resample import setup_filter, upfirdn2d, upsample2d, downsample2d

Dtype = Any


def normalize_2nd_moment(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) + eps)


def _f32p(x: jax.Array) -> jax.Array:
    """At-least-f32: promote, never demote.  Identical to ``astype(float32)``
    for the production f32/bf16 dtypes; keeps f64 intact so the x64
    sharded-vs-single equivalence checks (``__graft_entry__``) are exact."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


def modulated_conv2d(
    x: jax.Array,          # (N, H, W, I)
    weight: jax.Array,     # (kh, kw, I, O)
    styles: jax.Array,     # (N, I)
    noise: Optional[jax.Array] = None,
    up: int = 1,
    down: int = 1,
    padding: int = 0,
    resample_filter: Optional[jax.Array] = None,
    demodulate: bool = True,
    flip_weight: bool = True,
    quant: Optional[dict] = None,
) -> jax.Array:
    """Style modulation + conv + demodulation (ref ``networks.py:37-117``).

    ``quant`` enables the int8 serving path (``io/quant.py``): a dict with
    ``act_scale`` (per-tensor scale for the *modulated* input, from
    calibration), ``qkernel`` and ``wscale`` (int8 weights + per-channel
    scales — for ``up=2`` the four *composite-polyphase* kernels, see
    ``quantize_stylegan2_variables``).  The bf16 overflow pre-normalization
    is skipped in quant mode: it cancels exactly between the conv output and
    the demod coefficients, and int8/int32 accumulation can't overflow the
    way bf16 can.
    """
    kh, kw, in_ch, out_ch = weight.shape

    # Pre-normalize to avoid low-precision overflow (ref :56-63, fp16 path).
    if x.dtype == jnp.bfloat16 and demodulate and quant is None:
        weight = weight * (
            1.0
            / np.sqrt(in_ch * kh * kw)
            / jnp.max(jnp.abs(weight), axis=(0, 1, 2), keepdims=True)
        )
        styles = styles / jnp.max(jnp.abs(styles), axis=-1, keepdims=True)

    dcoefs = None
    if demodulate:
        w2 = jnp.sum(jnp.square(_f32p(weight)), axis=(0, 1))  # (I, O)
        dcoefs = jax.lax.rsqrt(
            jnp.square(_f32p(styles)) @ w2 + 1e-8
        )  # (N, O)

    if quant is not None:
        xm = x * styles.astype(x.dtype)[:, None, None, :]
        sx = quant["act_scale"]
        qk = quant["qkernel"]
        ws = quant["wscale"]
        # Per-channel activation scales (sx: vector over input channels):
        # the per-input-channel scale is folded into the weights at
        # calibration time (conv(xm, w) == conv(xm/a, w·a)), so the dequant
        # multiplier is the weight scale alone.  Per-tensor (sx: scalar):
        # dequant carries sx explicitly.  Per-channel spends the int8 range
        # per channel — the fix for per-sample style modulation blowing up
        # a single per-tensor absmax (README: 7.1% image drift in r4).
        per_channel = getattr(sx, "ndim", 0) >= 1
        # Dynamic per-SAMPLE range adaptation (marker leaf in the quant
        # collection, ``io/quant.quantize_stylegan2_variables(act_dynamic)``):
        # the static absmax covers the hottest calibration sample, so a
        # sample whose style magnitudes are smaller uses only a fraction of
        # the int8 levels.  A per-sample scalar g_n = 127/max|x_n/sx| is
        # exact algebra (it commutes with the conv's I-contraction, unlike a
        # per-sample-per-channel scale) and also removes clipping for
        # out-of-calibration samples (t_n > 127 → g_n < 1).  The reduction
        # runs over |xm| per (sample, channel) FIRST and meets the scales on
        # the tiny (N, I) result — max commutes exactly with the positive
        # per-channel divide (IEEE division is monotone), and reducing the
        # raw tensor lets XLA fuse the pass with xm's producer instead of
        # materializing the divided tensor twice.
        dyn = "act_dynamic" in quant
        if dyn:
            m = jnp.max(jnp.abs(_f32p(xm)), axis=(1, 2))        # (N, I)
            t = jnp.maximum(jnp.max(m / sx, axis=-1), 1e-30)    # (N,)
            t = t[:, None, None, None]
            xs = (_f32p(xm) / sx) * (127.0 / t)
        else:
            xs = _f32p(xm) / sx
        xq = jnp.clip(jnp.round(xs), -127, 127).astype(jnp.int8)
        if up == 1 and down == 1:
            deq = ws if per_channel else ws * sx
            y = jax.lax.conv_general_dilated(
                xq, qk, (1, 1), ((padding, padding), (padding, padding)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            ).astype(x.dtype) * deq.astype(x.dtype)
        else:  # up == 2 composite polyphase (qk: (3,3,I,4O), ws: (4,O))
            deq = ws.reshape(-1) if per_channel else ws.reshape(-1) * sx
            y = jax.lax.conv_general_dilated(
                xq, qk, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            ).astype(x.dtype) * deq.astype(x.dtype)
            n, h, wd = xm.shape[0], xm.shape[1], xm.shape[2]
            y = y.reshape(n, h, wd, 2, 2, out_ch)
            y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
            y = y.reshape(n, 2 * h, 2 * wd, out_ch)
        if dyn:
            # Undo the per-sample boost: scalar per sample, fuses into the
            # dequant elementwise chain.
            y = y * (t * (1.0 / 127.0)).astype(x.dtype)
        x = y
    else:
        x = x * styles.astype(x.dtype)[:, None, None, :]
        x = conv2d_resample(
            x, weight.astype(x.dtype), f=resample_filter, up=up, down=down,
            padding=padding, flip_weight=flip_weight,
        )
    if demodulate and noise is not None:
        x = x * dcoefs.astype(x.dtype)[:, None, None, :] + noise.astype(x.dtype)
    elif demodulate:
        x = x * dcoefs.astype(x.dtype)[:, None, None, :]
    elif noise is not None:
        x = x + noise.astype(x.dtype)
    return x


def _layer_quant(mod: nn.Module, x, styles, up: int):
    """int8 serving support for a modulated-conv layer (``io/quant.py``).

    Returns the layer's quant dict when the ``quant`` collection is present
    (serving mode), else ``None``.  Always sows the calibration signals —
    the modulated-input absmax and the layer's resample mode — into the
    ``quant_calib`` collection; the sow is a no-op (and the absmax compute
    dead code) unless an apply makes that collection mutable.
    """
    if not mod.is_initializing() and mod.has_variable("quant", "act_scale"):
        q = {
            "act_scale": mod.get_variable("quant", "act_scale"),
            "qkernel": mod.get_variable("quant", "qkernel"),
            "wscale": mod.get_variable("quant", "wscale"),
        }
        if mod.has_variable("quant", "act_dynamic"):
            q["act_dynamic"] = mod.get_variable("quant", "act_dynamic")
        return q
    if not mod.is_initializing():
        # Per-INPUT-CHANNEL absmax of the modulated input: the style scale
        # s varies per sample per channel, so a single per-tensor absmax is
        # dominated by the hottest channel and starves the rest of int8
        # levels; the per-channel vector lets the quantizer spend the full
        # range on every channel (folded into the weights downstream).
        n_ch = x.shape[-1]
        m = jnp.max(
            jnp.abs(_f32p(x * styles.astype(x.dtype)[:, None, None, :])),
            axis=(0, 1, 2),
        )
        mod.sow("quant_calib", "absmax", m,
                init_fn=lambda: jnp.zeros((n_ch,), jnp.float32),
                reduce_fn=jnp.maximum)
        mod.sow("quant_calib", "up", jnp.float32(up),
                init_fn=lambda: jnp.float32(up), reduce_fn=lambda a, b: b)
    return None


class FullyConnected(nn.Module):
    """Equalized-lr dense layer (ref ``FullyConnectedLayer``,
    ``networks.py:124-159``)."""

    features: int
    use_bias: bool = True
    activation: str = "linear"
    lr_multiplier: float = 1.0
    bias_init: float = 0.0

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        w = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0 / self.lr_multiplier),
            (in_features, self.features),
            jnp.float32,
        )
        gain = self.lr_multiplier / np.sqrt(in_features)
        y = x @ (w.astype(x.dtype) * gain)
        b = None
        if self.use_bias:
            b = self.param(
                "bias",
                nn.initializers.constant(self.bias_init),
                (self.features,),
                jnp.float32,
            ).astype(x.dtype)
            if self.lr_multiplier != 1.0:
                b = b * self.lr_multiplier
        return bias_act(y, b, act=self.activation)


class Conv2d(nn.Module):
    """Equalized-lr conv with optional up/down (ref ``Conv2dLayer``,
    ``networks.py:166-239``)."""

    features: int
    kernel_size: int = 3
    use_bias: bool = True
    activation: str = "linear"
    up: int = 1
    down: int = 1
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    trainable: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, gain: float = 1.0):
        k = self.kernel_size
        in_ch = x.shape[-1]
        init = nn.initializers.normal(stddev=1.0)
        if self.trainable:
            w = self.param("weight", init, (k, k, in_ch, self.features), jnp.float32)
        else:
            w = self.variable(
                "buffers", "weight",
                lambda key, s: jax.random.normal(key, s),
                self.make_rng("params") if self.is_initializing() else None,
                (k, k, in_ch, self.features),
            ).value
        w = w * (1.0 / np.sqrt(in_ch * k * k))
        f = jnp.asarray(setup_filter(jnp.asarray(self.resample_filter)))
        x = conv2d_resample(
            x.astype(self.dtype), w.astype(self.dtype), f=f, up=self.up,
            down=self.down, padding=k // 2, flip_weight=(self.up == 1),
        )
        b = None
        if self.use_bias:
            if self.trainable:
                b = self.param("bias", nn.initializers.zeros, (self.features,),
                               jnp.float32)
            else:
                b = self.variable(
                    "buffers", "bias", lambda _, s: jnp.zeros(s), None,
                    (self.features,),
                ).value
        act_gain = activation_funcs[self.activation].def_gain * gain
        clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(
            x, None if b is None else b.astype(x.dtype),
            act=self.activation, gain=act_gain, clamp=clamp,
        )


class MappingNetwork(nn.Module):
    """z/c/h → w mapping with IC-GAN instance path (ref ``networks.py:238-354``)."""

    z_dim: int
    c_dim: int
    h_dim: int
    w_dim: int
    num_ws: Optional[int]
    num_layers: int = 8
    embed_features: Optional[int] = None
    embed_features_feat: Optional[int] = None
    layer_features: Optional[int] = None
    activation: str = "lrelu"
    lr_multiplier: float = 0.01
    w_avg_beta: Optional[float] = 0.995

    @nn.compact
    def __call__(
        self,
        z: Optional[jax.Array],
        c: Optional[jax.Array],
        h: Optional[jax.Array],
        truncation_psi: float = 1.0,
        truncation_cutoff: Optional[int] = None,
        train: bool = False,
        skip_w_avg_update: bool = False,
    ):
        embed_features = self.embed_features or self.w_dim
        embed_features_feat = self.embed_features_feat or self.w_dim

        x = None
        if self.z_dim > 0:
            x = normalize_2nd_moment(_f32p(z))
        if self.c_dim > 0 and self.h_dim > 0:
            y = jnp.concatenate(
                [
                    FullyConnected(embed_features, name="embed")(
                        _f32p(c)
                    ),
                    FullyConnected(embed_features_feat, name="embed_feats")(
                        _f32p(h)
                    ),
                ],
                axis=-1,
            )
            y = normalize_2nd_moment(y)
            x = jnp.concatenate([x, y], axis=-1) if x is not None else y
        elif self.c_dim > 0:
            y = normalize_2nd_moment(
                FullyConnected(embed_features, name="embed")(_f32p(c))
            )
            x = jnp.concatenate([x, y], axis=-1) if x is not None else y
        elif self.h_dim > 0:
            y = normalize_2nd_moment(
                FullyConnected(embed_features_feat, name="embed_feats")(
                    _f32p(h)
                )
            )
            x = jnp.concatenate([x, y], axis=-1) if x is not None else y

        layer_features = self.layer_features or self.w_dim
        for idx in range(self.num_layers):
            out_f = layer_features if idx < self.num_layers - 1 else self.w_dim
            x = FullyConnected(
                out_f,
                activation=self.activation,
                lr_multiplier=self.lr_multiplier,
                name=f"fc{idx}",
            )(x)

        w_avg = None
        if self.num_ws is not None and self.w_avg_beta is not None:
            w_avg = self.variable(
                "batch_stats", "w_avg", lambda _, s: jnp.zeros(s), None,
                (self.w_dim,),
            )
            if train and not skip_w_avg_update and not self.is_initializing():
                mean_w = jax.lax.stop_gradient(jnp.mean(x, axis=0))
                w_avg.value = (
                    mean_w + (w_avg.value - mean_w) * self.w_avg_beta
                )

        if self.num_ws is not None:
            x = jnp.repeat(x[:, None, :], self.num_ws, axis=1)

        if truncation_psi != 1.0:
            assert w_avg is not None
            if self.num_ws is None or truncation_cutoff is None:
                x = w_avg.value + (x - w_avg.value) * truncation_psi
            else:
                head = w_avg.value + (
                    x[:, :truncation_cutoff] - w_avg.value
                ) * truncation_psi
                x = jnp.concatenate([head, x[:, truncation_cutoff:]], axis=1)
        return x


class SynthesisLayer(nn.Module):
    """Modulated conv + noise + bias/act (ref ``networks.py:360-444``)."""

    features: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    up: int = 1
    use_noise: bool = True
    activation: str = "lrelu"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, w, noise_mode: str = "random", gain: float = 1.0):
        assert noise_mode in ("random", "const", "none")
        in_ch = x.shape[-1]
        styles = FullyConnected(in_ch, bias_init=1.0, name="affine")(w)
        weight = self.param(
            "weight",
            nn.initializers.normal(stddev=1.0),
            (self.kernel_size, self.kernel_size, in_ch, self.features),
            jnp.float32,
        )
        noise = None
        if self.use_noise:
            strength = self.param("noise_strength", nn.initializers.zeros, (),
                                  jnp.float32)
            noise_const = self.variable(
                "noise", "noise_const",
                lambda key, s: jax.random.normal(key, s),
                self.make_rng("params") if self.is_initializing() else None,
                (self.resolution, self.resolution),
            )
            if noise_mode == "random":
                noise = (
                    jax.random.normal(
                        self.make_rng("noise"),
                        (x.shape[0], self.resolution, self.resolution, 1),
                    )
                    * strength
                )
            elif noise_mode == "const":
                noise = (noise_const.value * strength)[None, :, :, None]

        f = jnp.asarray(setup_filter(jnp.asarray(self.resample_filter)))
        quant = _layer_quant(self, x, styles, up=self.up)
        x = modulated_conv2d(
            x, weight, styles, noise=noise, up=self.up,
            padding=self.kernel_size // 2, resample_filter=f,
            flip_weight=(self.up == 1), quant=quant,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        act_gain = activation_funcs[self.activation].def_gain * gain
        clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, b.astype(x.dtype), act=self.activation, gain=act_gain,
                        clamp=clamp)


class ToRGB(nn.Module):
    """1×1 modulated conv to image channels (ref ``networks.py:453-486``)."""

    img_channels: int
    w_dim: int
    conv_clamp: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, w):
        in_ch = x.shape[-1]
        styles = FullyConnected(in_ch, bias_init=1.0, name="affine")(w)
        styles = styles * (1.0 / np.sqrt(in_ch))
        weight = self.param(
            "weight", nn.initializers.normal(stddev=1.0),
            (1, 1, in_ch, self.img_channels), jnp.float32,
        )
        # ToRGB is never int8-quantized: its 1×1 conv to img_channels is
        # FLOP-negligible (~I·3 vs the 3×3 convs' 9·I·O MACs per pixel) and
        # it feeds the image sum directly, so quantizing it is all numeric
        # drift for no throughput — measured 3.7% → 3.0% image drift from
        # leaving it bf16 (io/quant.py scheme).
        x = modulated_conv2d(x, weight, styles, demodulate=False)
        b = self.param("bias", nn.initializers.zeros, (self.img_channels,),
                       jnp.float32)
        return bias_act(x, b.astype(x.dtype), clamp=self.conv_clamp)


class SynthesisBlock(nn.Module):
    """One resolution level (ref ``networks.py:492-618``)."""

    in_features: int  # 0 = first (const) block
    out_features: int
    w_dim: int
    resolution: int
    img_channels: int
    is_last: bool
    architecture: str = "skip"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    use_fp16: bool = False

    @property
    def num_conv(self):
        return 1 if self.in_features == 0 else 2

    @property
    def num_torgb(self):
        return 1 if (self.is_last or self.architecture == "skip") else 0

    @nn.compact
    def __call__(self, x, img, ws, noise_mode: str = "random",
                 force_fp32: bool = False):
        dtype = (jnp.bfloat16 if (self.use_fp16 and not force_fp32)
                 else jnp.promote_types(ws.dtype, jnp.float32))
        w_idx = 0

        def next_w():
            nonlocal w_idx
            w = ws[:, w_idx]
            w_idx += 1
            return w

        layer = lambda feats, up, name: SynthesisLayer(
            feats, w_dim=self.w_dim, resolution=self.resolution, up=up,
            resample_filter=self.resample_filter, conv_clamp=self.conv_clamp,
            dtype=dtype, name=name,
        )

        if self.in_features == 0:
            const = self.param(
                "const", nn.initializers.normal(stddev=1.0),
                (self.resolution, self.resolution, self.out_features), jnp.float32,
            )
            x = jnp.broadcast_to(
                const.astype(dtype)[None],
                (ws.shape[0],) + const.shape,
            )
            x = layer(self.out_features, 1, "conv1")(x, next_w(), noise_mode)
        elif self.architecture == "resnet":
            x = x.astype(dtype)
            y = Conv2d(
                self.out_features, kernel_size=1, use_bias=False, up=2,
                resample_filter=self.resample_filter, dtype=dtype, name="skip",
            )(x, gain=np.sqrt(0.5))
            x = layer(self.out_features, 2, "conv0")(x, next_w(), noise_mode)
            x = layer(self.out_features, 1, "conv1")(
                x, next_w(), noise_mode, gain=np.sqrt(0.5)
            )
            x = y + x
        else:
            x = x.astype(dtype)
            x = layer(self.out_features, 2, "conv0")(x, next_w(), noise_mode)
            x = layer(self.out_features, 1, "conv1")(x, next_w(), noise_mode)

        if img is not None:
            f = jnp.asarray(setup_filter(jnp.asarray(self.resample_filter)))
            img = upsample2d(img, f)
        if self.is_last or self.architecture == "skip":
            y = ToRGB(
                self.img_channels, w_dim=self.w_dim, conv_clamp=self.conv_clamp,
                dtype=dtype, name="torgb",
            )(x, next_w())
            y = _f32p(y)
            img = img + y if img is not None else y
        return x, img


class SynthesisNetwork(nn.Module):
    """Stack of blocks 4×4 → img_resolution (ref ``networks.py:625-703``)."""

    w_dim: int
    img_resolution: int
    img_channels: int = 3
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 0
    architecture: str = "skip"
    conv_clamp: Optional[float] = None

    @property
    def block_resolutions(self):
        return [2 ** i for i in range(2, int(np.log2(self.img_resolution)) + 1)]

    def channels(self, res):
        return min(self.channel_base // res, self.channel_max)

    @property
    def num_ws(self):
        n = 0
        for res in self.block_resolutions:
            n += 1 if res == 4 else 2
            if res == self.img_resolution:
                n += 1
        return n

    @nn.compact
    def __call__(self, ws, noise_mode: str = "random", force_fp32: bool = False):
        fp16_res = max(2 ** (int(np.log2(self.img_resolution)) + 1 - self.num_fp16_res), 8)
        ws = _f32p(ws)
        x = img = None
        w_idx = 0
        for res in self.block_resolutions:
            in_feats = 0 if res == 4 else self.channels(res // 2)
            block = SynthesisBlock(
                in_features=in_feats,
                out_features=self.channels(res),
                w_dim=self.w_dim,
                resolution=res,
                img_channels=self.img_channels,
                is_last=(res == self.img_resolution),
                architecture=self.architecture,
                conv_clamp=self.conv_clamp,
                use_fp16=(res >= fp16_res and self.num_fp16_res > 0),
                name=f"b{res}",
            )
            # Each block consumes num_conv+num_torgb ws but the index advances
            # by num_conv only — an intermediate skip-arch block's torgb reuses
            # the next block's first w (ref networks.py:669-675).
            block_ws = ws[:, w_idx : w_idx + block.num_conv + block.num_torgb]
            x, img = block(x, img, block_ws, noise_mode=noise_mode,
                           force_fp32=force_fp32)
            w_idx += block.num_conv
        return img


@dataclasses.dataclass(frozen=True)
class StyleGAN2Config:
    """Generator/discriminator hyperparameters (reference flag surface:
    ``train.py:220-296`` cfg presets + ``networks.py`` ctor args)."""

    img_resolution: int = 256
    img_channels: int = 3
    z_dim: int = 512
    c_dim: int = 0       # one-hot class dim (0 = unconditional)
    h_dim: int = 2048    # instance-feature dim (IC-GAN)
    w_dim: int = 512
    channel_base: int = 32768
    channel_max: int = 512
    num_mapping_layers: int = 8
    num_fp16_res: int = 4
    conv_clamp: Optional[float] = 256.0
    architecture_g: str = "skip"
    architecture_d: str = "resnet"
    mbstd_group_size: int = 4
    mbstd_num_channels: int = 1

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


class Generator(nn.Module):
    """mapping + synthesis (ref ``networks.py:710-757``)."""

    cfg: StyleGAN2Config

    def setup(self):
        cfg = self.cfg
        self.synthesis = SynthesisNetwork(
            w_dim=cfg.w_dim,
            img_resolution=cfg.img_resolution,
            img_channels=cfg.img_channels,
            channel_base=cfg.channel_base,
            channel_max=cfg.channel_max,
            num_fp16_res=cfg.num_fp16_res,
            architecture=cfg.architecture_g,
            conv_clamp=cfg.conv_clamp,
        )
        self.mapping = MappingNetwork(
            z_dim=cfg.z_dim,
            c_dim=cfg.c_dim,
            h_dim=cfg.h_dim,
            w_dim=cfg.w_dim,
            num_ws=self.synthesis.num_ws,
            num_layers=cfg.num_mapping_layers,
        )

    def __call__(
        self,
        z,
        c=None,
        feats=None,
        truncation_psi: float = 1.0,
        truncation_cutoff: Optional[int] = None,
        noise_mode: str = "random",
        train: bool = False,
        force_fp32: bool = False,
    ):
        ws = self.mapping(
            z, c, feats, truncation_psi=truncation_psi,
            truncation_cutoff=truncation_cutoff, train=train,
        )
        return self.synthesis(ws, noise_mode=noise_mode, force_fp32=force_fp32)

    def map_ws(self, z, c=None, feats=None, train: bool = False, **kw):
        return self.mapping(z, c, feats, train=train, **kw)

    def synthesize(self, ws, noise_mode: str = "random", force_fp32: bool = False):
        return self.synthesis(ws, noise_mode=noise_mode, force_fp32=force_fp32)


def minibatch_std(x, group_size: Optional[int] = 4, num_channels: int = 1):
    """Minibatch stddev channel (ref ``networks.py:900-927``), NHWC."""
    N, H, W, C = x.shape
    G = min(group_size, N) if group_size is not None else N
    F = num_channels
    c = C // F
    y = _f32p(x.reshape(G, N // G, H, W, F, c))
    y = y - jnp.mean(y, axis=0, keepdims=True)
    y = jnp.mean(jnp.square(y), axis=0)
    y = jnp.sqrt(y + 1e-8)
    y = jnp.mean(y, axis=(1, 2, 4))  # (n, F)
    y = jnp.tile(y[:, None, None, :], (G, H, W, 1)).reshape(N, H, W, F)
    return jnp.concatenate([x, y.astype(x.dtype)], axis=-1)


class DiscriminatorBlock(nn.Module):
    """(ref ``networks.py:762-889``)."""

    in_features: int  # 0 = first block (fromrgb)
    tmp_features: int
    out_features: int
    resolution: int
    img_channels: int
    architecture: str = "resnet"
    activation: str = "lrelu"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: Optional[float] = None
    use_fp16: bool = False

    @nn.compact
    def __call__(self, x, img, force_fp32: bool = False):
        base = img.dtype if img is not None else x.dtype
        dtype = (jnp.bfloat16 if (self.use_fp16 and not force_fp32)
                 else jnp.promote_types(base, jnp.float32))
        if x is not None:
            x = x.astype(dtype)
        if self.in_features == 0 or self.architecture == "skip":
            img = img.astype(dtype)
            y = Conv2d(
                self.tmp_features, kernel_size=1, activation=self.activation,
                conv_clamp=self.conv_clamp, dtype=dtype, name="fromrgb",
            )(img)
            x = x + y if x is not None else y
            if self.architecture == "skip":
                f = jnp.asarray(setup_filter(jnp.asarray(self.resample_filter)))
                img = downsample2d(img, f)
            else:
                img = None

        if self.architecture == "resnet":
            y = Conv2d(
                self.out_features, kernel_size=1, use_bias=False, down=2,
                resample_filter=self.resample_filter, dtype=dtype, name="skip",
            )(x, gain=np.sqrt(0.5))
            x = Conv2d(
                self.tmp_features, kernel_size=3, activation=self.activation,
                conv_clamp=self.conv_clamp, dtype=dtype, name="conv0",
            )(x)
            x = Conv2d(
                self.out_features, kernel_size=3, activation=self.activation,
                down=2, resample_filter=self.resample_filter,
                conv_clamp=self.conv_clamp, dtype=dtype, name="conv1",
            )(x, gain=np.sqrt(0.5))
            x = y + x
        else:
            x = Conv2d(
                self.tmp_features, kernel_size=3, activation=self.activation,
                conv_clamp=self.conv_clamp, dtype=dtype, name="conv0",
            )(x)
            x = Conv2d(
                self.out_features, kernel_size=3, activation=self.activation,
                down=2, resample_filter=self.resample_filter,
                conv_clamp=self.conv_clamp, dtype=dtype, name="conv1",
            )(x)
        return x, img


class DiscriminatorEpilogue(nn.Module):
    """(ref ``networks.py:934-1006``)."""

    in_features: int
    cmap_dim: int
    resolution: int = 4
    img_channels: int = 3
    architecture: str = "resnet"
    mbstd_group_size: Optional[int] = 4
    mbstd_num_channels: int = 1
    activation: str = "lrelu"
    conv_clamp: Optional[float] = None

    @nn.compact
    def __call__(self, x, img, cmap):
        x = _f32p(x)
        if self.architecture == "skip":
            x = x + Conv2d(
                self.in_features, kernel_size=1, activation=self.activation,
                dtype=x.dtype, name="fromrgb",
            )(_f32p(img))
        if self.mbstd_num_channels > 0:
            x = minibatch_std(x, self.mbstd_group_size, self.mbstd_num_channels)
        x = Conv2d(
            self.in_features, kernel_size=3, activation=self.activation,
            conv_clamp=self.conv_clamp, dtype=x.dtype, name="conv",
        )(x)
        # Flatten matching torch NCHW.flatten(1) ordering: (C,H,W).
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        x = FullyConnected(self.in_features, activation=self.activation,
                           name="fc")(x)
        x = FullyConnected(1 if self.cmap_dim == 0 else self.cmap_dim,
                           name="out")(x)
        if self.cmap_dim > 0:
            x = jnp.sum(x * cmap, axis=-1, keepdims=True) * (
                1.0 / np.sqrt(self.cmap_dim)
            )
        return x


class Discriminator(nn.Module):
    """(ref ``networks.py:1015-1101``)."""

    cfg: StyleGAN2Config

    @nn.compact
    def __call__(self, img, c=None, feats=None, train: bool = False,
                 force_fp32: bool = False):
        cfg = self.cfg
        res_log2 = int(np.log2(cfg.img_resolution))
        block_res = [2 ** i for i in range(res_log2, 2, -1)]
        channels = {
            res: min(cfg.channel_base // res, cfg.channel_max)
            for res in block_res + [4]
        }
        fp16_res = max(2 ** (res_log2 + 1 - cfg.num_fp16_res), 8)
        cmap_dim = channels[4]
        if cfg.c_dim == 0 and cfg.h_dim == 0:
            cmap_dim = 0

        x = None
        for res in block_res:
            x, img = DiscriminatorBlock(
                in_features=channels[res] if res < cfg.img_resolution else 0,
                tmp_features=channels[res],
                out_features=channels[res // 2],
                resolution=res,
                img_channels=cfg.img_channels,
                architecture=cfg.architecture_d,
                conv_clamp=cfg.conv_clamp,
                use_fp16=(res >= fp16_res and cfg.num_fp16_res > 0),
                name=f"b{res}",
            )(x, img, force_fp32=force_fp32)

        cmap = None
        if cfg.c_dim > 0 or cfg.h_dim > 0:
            cmap = MappingNetwork(
                z_dim=0, c_dim=cfg.c_dim, h_dim=cfg.h_dim, w_dim=cmap_dim,
                num_ws=None, w_avg_beta=None,
                num_layers=cfg.num_mapping_layers, name="mapping",
            )(None, c, feats, train=train)
        return DiscriminatorEpilogue(
            in_features=channels[4],
            cmap_dim=cmap_dim,
            img_channels=cfg.img_channels,
            architecture="resnet" if cfg.architecture_d == "resnet" else cfg.architecture_d,
            mbstd_group_size=cfg.mbstd_group_size,
            mbstd_num_channels=cfg.mbstd_num_channels,
            conv_clamp=cfg.conv_clamp,
            name="b4",
        )(x, img, cmap)
