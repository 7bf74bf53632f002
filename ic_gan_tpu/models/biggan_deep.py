"""BigGAN-deep generator/discriminator (Flax, NHWC).

Parity re-design of ``BigGAN_PyTorch/BigGANdeep.py``: bottleneck residual
blocks (4 convs, channel-ratio 4), channel-drop / channel-concat shortcuts
(``:67-84, 432-436``), z concatenated once with the shared class embedding
instead of per-block chunks (``:375-379``), ``G_depth``/``D_depth`` block
stacking per resolution stage (``:269-287, 585-603``), and a stem
``input_conv`` in D (``:580``).

Extension beyond the reference: the IC-GAN instance-feature conditioning
(``shared_feat`` / ``linear_feat``) is available here too — the reference
only wired it into standard BigGAN; config flags keep exact-parity mode
(``class_cond=True, instance_cond=False``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ic_gan_tpu.models.biggan import BigGANConfig, g_arch as base_g_arch
from ic_gan_tpu.models.layers import (
    ConditionalBatchNorm,
    ScaledBatchNorm,
    SelfAttention,
    SNConv,
    SNDense,
    SNEmbed,
    orthogonal_init,
    avg_pool_2x,
)
from ic_gan_tpu.ops.resample import upsample_nearest_2x


def deep_d_arch(resolution: int, ch: int, attention: str = "64"):
    """(ref ``BigGANdeep.py:472-...``) — no leading 3-channel entry; the stem
    conv maps RGB to ``in_channels[0]``."""
    tables = {
        256: ([1, 2, 4, 8, 8, 16], [2, 4, 8, 8, 16, 16], 6,
              [128, 64, 32, 16, 8, 4, 4]),
        128: ([1, 2, 4, 8, 16], [2, 4, 8, 16, 16], 5, [64, 32, 16, 8, 4, 4]),
        64: ([1, 2, 4, 8], [2, 4, 8, 16], 4, [32, 16, 8, 4, 4]),
        32: ([4, 4, 4], [4, 4, 4], 2, [16, 16, 16]),
    }
    cin_m, cout_m, n_down, res = tables[resolution]
    attn = {int(a) for a in str(attention).split("_") if a not in ("", "0")}
    return {
        "in_channels": [ch * m for m in cin_m],
        "out_channels": [ch * m for m in cout_m],
        "downsample": [True] * n_down + [False] * (len(cout_m) - n_down),
        "resolution": res,
        "attention": [r in attn for r in res[: len(cout_m)]],
    }


@dataclasses.dataclass(frozen=True)
class BigGANDeepConfig(BigGANConfig):
    """Deep-variant knobs on top of the base config; reference defaults:
    dim_z=128, G_depth=D_depth=2, class-conditional."""

    dim_z: int = 128
    G_depth: int = 2
    D_depth: int = 2
    class_cond: bool = True
    instance_cond: bool = False
    channel_ratio: int = 4

    # Deep z geometry: no chunking (ref BigGANdeep.py:173 keeps dim_z whole).
    @property
    def num_slots(self):  # noqa: D401 - override
        return 1

    @property
    def z_chunk_size(self):
        return 0

    @property
    def effective_dim_z(self):
        return self.dim_z


class DeepGBlock(nn.Module):
    """Bottleneck G block (ref ``BigGANdeep.py:33-84``)."""

    in_features: int
    out_features: int
    upsample: bool
    channel_ratio: int = 4
    sn_eps: float = 1e-6
    bn_eps: float = 1e-5
    num_svs: int = 1
    num_itrs: int = 1
    axis_name: Optional[str] = None
    dtype: Any = jnp.float32
    norm_style: str = "bn"

    @nn.compact
    def __call__(self, x, y, train: bool, standing: bool = False):
        hidden = self.in_features // self.channel_ratio
        cbn = lambda f, name: ConditionalBatchNorm(
            f, eps=self.bn_eps, sn_eps=self.sn_eps, num_svs=self.num_svs,
            num_itrs=self.num_itrs, axis_name=self.axis_name,
            dtype=self.dtype, norm_style=self.norm_style, name=name,
        )
        conv = lambda f, k, name: SNConv(
            f, kernel_size=(k, k), eps=self.sn_eps, num_svs=self.num_svs,
            num_itrs=self.num_itrs, dtype=self.dtype, name=name,
        )
        h = conv(hidden, 1, "conv1")(
            jax.nn.relu(cbn(self.in_features, "bn1")(x, y, train, standing)),
            update_sn=train,
        )
        h = jax.nn.relu(cbn(hidden, "bn2")(h, y, train, standing))
        if self.in_features != self.out_features:
            x = x[..., : self.out_features]  # channel drop (ref :73-74)
        if self.upsample:
            x = upsample_nearest_2x(x)
            # Upsample fused into conv2 (polyphase exact rewrite of
            # interpolate→conv — ops/resample.py:conv3x3_nearest_up).
            h = SNConv(
                hidden, kernel_size=(3, 3), eps=self.sn_eps,
                num_svs=self.num_svs, num_itrs=self.num_itrs,
                dtype=self.dtype, up2x=True, name="conv2",
            )(h, update_sn=train)
        else:
            h = conv(hidden, 3, "conv2")(h, update_sn=train)
        h = conv(hidden, 3, "conv3")(
            jax.nn.relu(cbn(hidden, "bn3")(h, y, train, standing)),
            update_sn=train,
        )
        h = conv(self.out_features, 1, "conv4")(
            jax.nn.relu(cbn(hidden, "bn4")(h, y, train, standing)),
            update_sn=train,
        )
        return h + x


class DeepDBlock(nn.Module):
    """Bottleneck D block with channel-concat shortcut (ref ``:394-450``)."""

    in_features: int
    out_features: int
    downsample: bool
    channel_ratio: int = 4
    sn_eps: float = 1e-6
    num_svs: int = 1
    num_itrs: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        hidden = self.out_features // self.channel_ratio
        conv = lambda f, k, name: SNConv(
            f, kernel_size=(k, k), eps=self.sn_eps, num_svs=self.num_svs,
            num_itrs=self.num_itrs, dtype=self.dtype, name=name,
        )
        h = conv(hidden, 1, "conv1")(jax.nn.relu(x), update_sn)
        h = conv(hidden, 3, "conv2")(jax.nn.relu(h), update_sn)
        h = conv(hidden, 3, "conv3")(jax.nn.relu(h), update_sn)
        h = jax.nn.relu(h)
        if self.downsample:
            h = avg_pool_2x(h)
        h = conv(self.out_features, 1, "conv4")(h, update_sn)

        sc = x
        if self.downsample:
            sc = avg_pool_2x(sc)
        if self.in_features != self.out_features:
            extra = conv(self.out_features - self.in_features, 1, "conv_sc")(
                sc, update_sn
            )
            sc = jnp.concatenate([sc, extra], axis=-1)
        return h + sc


class Generator(nn.Module):
    cfg: BigGANDeepConfig

    @nn.compact
    def __call__(self, z, label=None, feats=None, train: bool = False,
                 standing: bool = False):
        cfg = self.cfg
        arch = base_g_arch(cfg.resolution, cfg.G_ch, cfg.G_attn)
        dtype = cfg.dtype

        embs = []
        if cfg.class_cond:
            table = self.param(
                "shared", orthogonal_init(),
                (cfg.n_classes, cfg.shared_dim_eff), jnp.float32,
            )
            embs.append(jnp.take(table, label, axis=0))
        if cfg.instance_cond:
            embs.append(
                SNDense(cfg.shared_dim_feat, eps=cfg.SN_eps,
                        num_svs=cfg.num_G_SVs, num_itrs=cfg.num_SV_itrs,
                        dtype=dtype, name="shared_feat")(feats.astype(dtype), update_sn=train)
            )
        y = jnp.concatenate(embs, axis=-1) if embs else None

        # Deep conditioning: y and z concatenated once, reused everywhere
        # (ref :375-379).
        if cfg.hier and y is not None:
            zin = jnp.concatenate([y, z.astype(y.dtype)], axis=-1)
            y = zin
        else:
            zin = z

        h = SNDense(
            arch["in_channels"][0] * cfg.bottom_width ** 2, eps=cfg.SN_eps,
            num_svs=cfg.num_G_SVs, num_itrs=cfg.num_SV_itrs,
            dtype=dtype, name="linear",
        )(zin.astype(dtype), update_sn=train)
        h = h.reshape(h.shape[0], arch["in_channels"][0], cfg.bottom_width,
                      cfg.bottom_width)
        h = jnp.transpose(h, (0, 2, 3, 1))

        for index in range(len(arch["out_channels"])):
            for g_index in range(cfg.G_depth):
                h = DeepGBlock(
                    in_features=arch["in_channels"][index],
                    out_features=(
                        arch["in_channels"][index]
                        if g_index < cfg.G_depth - 1
                        else arch["out_channels"][index]
                    ),
                    upsample=arch["upsample"][index]
                    and g_index == cfg.G_depth - 1,
                    channel_ratio=cfg.channel_ratio,
                    sn_eps=cfg.SN_eps,
                    bn_eps=cfg.BN_eps,
                    num_svs=cfg.num_G_SVs,
                    num_itrs=cfg.num_SV_itrs,
                    axis_name=cfg.axis_name,
                    dtype=dtype,
                    norm_style=cfg.norm_style,
                    name=f"block_{index}_{g_index}",
                )(h, y, train=train, standing=standing)
            if arch["attention"][index]:
                h = SelfAttention(
                    arch["out_channels"][index], sn_eps=cfg.SN_eps,
                    num_svs=cfg.num_G_SVs, num_itrs=cfg.num_SV_itrs,
                    dtype=dtype, name=f"attn_{index}",
                )(h, update_sn=train)

        h = ScaledBatchNorm(
            arch["out_channels"][-1], eps=cfg.BN_eps, axis_name=cfg.axis_name,
            name="output_bn",
        )(h, train=train, standing=standing)
        h = SNConv(3, eps=cfg.SN_eps, num_svs=cfg.num_G_SVs,
                   num_itrs=cfg.num_SV_itrs, dtype=dtype, name="output_conv")(
            jax.nn.relu(h), update_sn=train
        )
        return jnp.tanh(h.astype(jnp.float32))


class Discriminator(nn.Module):
    cfg: BigGANDeepConfig

    @nn.compact
    def __call__(self, x, label=None, feats=None, train: bool = False):
        cfg = self.cfg
        arch = deep_d_arch(cfg.resolution, cfg.D_ch, cfg.D_attn)
        dtype = cfg.dtype
        h = SNConv(arch["in_channels"][0], eps=cfg.SN_eps,
                   num_svs=cfg.num_D_SVs, num_itrs=cfg.num_SV_itrs,
                   dtype=dtype, name="input_conv")(x.astype(dtype), update_sn=train)
        for index in range(len(arch["out_channels"])):
            for d_index in range(cfg.D_depth):
                h = DeepDBlock(
                    in_features=(
                        arch["in_channels"][index]
                        if d_index == 0
                        else arch["out_channels"][index]
                    ),
                    out_features=arch["out_channels"][index],
                    downsample=arch["downsample"][index] and d_index == 0,
                    channel_ratio=cfg.channel_ratio,
                    sn_eps=cfg.SN_eps,
                    num_svs=cfg.num_D_SVs,
                    num_itrs=cfg.num_SV_itrs,
                    dtype=dtype,
                    name=f"block_{index}_{d_index}",
                )(h, update_sn=train)
            if arch["attention"][index]:
                h = SelfAttention(
                    arch["out_channels"][index], sn_eps=cfg.SN_eps,
                    num_svs=cfg.num_D_SVs, num_itrs=cfg.num_SV_itrs,
                    dtype=dtype, name=f"attn_{index}",
                )(h, update_sn=train)

        h = jnp.sum(jax.nn.relu(h), axis=(1, 2))
        out = SNDense(1, eps=cfg.SN_eps, num_svs=cfg.num_D_SVs,
                      num_itrs=cfg.num_SV_itrs, dtype=dtype, name="linear")(
            h, update_sn=train
        )
        top = arch["out_channels"][-1]
        if cfg.class_cond and cfg.instance_cond:
            e = SNEmbed(cfg.n_classes, top // 2, eps=cfg.SN_eps,
                        num_svs=cfg.num_D_SVs, num_itrs=cfg.num_SV_itrs,
                        dtype=dtype, name="embed")(label, update_sn=train)
            f = SNDense(top // 2, eps=cfg.SN_eps, num_svs=cfg.num_D_SVs,
                        num_itrs=cfg.num_SV_itrs, dtype=dtype,
                        name="linear_feat")(feats.astype(dtype), update_sn=train)
            proj = jnp.concatenate([e, f], axis=-1)
            out = out + jnp.sum(proj * h, axis=1, keepdims=True)
        elif cfg.class_cond:
            e = SNEmbed(cfg.n_classes, top, eps=cfg.SN_eps,
                        num_svs=cfg.num_D_SVs, num_itrs=cfg.num_SV_itrs,
                        dtype=dtype, name="embed")(label, update_sn=train)
            out = out + jnp.sum(e * h, axis=1, keepdims=True)
        elif cfg.instance_cond:
            f = SNDense(top, eps=cfg.SN_eps, num_svs=cfg.num_D_SVs,
                        num_itrs=cfg.num_SV_itrs, dtype=dtype,
                        name="linear_feat")(
                feats.astype(dtype), update_sn=train
            )
            out = out + jnp.sum(f * h, axis=1, keepdims=True)
        return out.astype(jnp.float32)
