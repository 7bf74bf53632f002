"""BigGAN / IC-GAN generator and discriminator graphs (Flax, NHWC).

Capability-parity re-design of ``BigGAN_PyTorch/BigGAN.py``:

- Per-resolution channel tables (``G_arch``/``D_arch``, ref ``BigGAN.py:32-85,
  390-432``).
- Generator with hierarchical z-chunking (``BigGAN.py:171-180, 364-386``),
  shared class embedding (``shared``), and the IC-GAN instance-feature linear
  embedding (``shared_feat``, ``BigGAN.py:230-239``).
- Discriminator with a projection head extended to instance features
  (``linear_feat``, ``BigGAN.py:548-563, 629-641``).

TPU-first choices: NHWC layout, all convs on the MXU path, batch norm with
global-batch semantics under pjit (cross-replica for free), spectral-norm
state threaded through the ``"sn"`` collection, and a configurable compute
dtype (bfloat16) with float32 parameters.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ic_gan_tpu.models.layers import (
    BN_EPS,
    SN_EPS,
    ConditionalBatchNorm,
    DBlock,
    GBlock,
    ScaledBatchNorm,
    SelfAttention,
    SNConv,
    SNDense,
    SNEmbed,
    orthogonal_init,
)

Dtype = Any


def _attn_set(attention: str) -> Sequence[int]:
    return [int(item) for item in str(attention).split("_") if item not in ("", "0")]


def g_arch(resolution: int, ch: int, attention: str = "64") -> Dict[str, Any]:
    """Generator channel table (ref ``BigGAN.py:32-85``)."""
    tables = {
        512: ([16, 16, 8, 8, 4, 2, 1], [16, 8, 8, 4, 2, 1, 1]),
        256: ([16, 16, 8, 8, 4, 2], [16, 8, 8, 4, 2, 1]),
        128: ([16, 16, 8, 4, 2], [16, 8, 4, 2, 1]),
        64: ([16, 16, 8, 4], [16, 8, 4, 2]),
        32: ([4, 4, 4], [4, 4, 4]),
    }
    cin, cout = tables[resolution]
    n = len(cin)
    res = [2 ** (i + 3) for i in range(n)]
    attn = set(_attn_set(attention))
    return {
        "in_channels": [ch * c for c in cin],
        "out_channels": [ch * c for c in cout],
        "upsample": [True] * n,
        "resolution": res,
        "attention": [r in attn for r in res],
    }


def d_arch(resolution: int, ch: int, attention: str = "64") -> Dict[str, Any]:
    """Discriminator channel table (ref ``BigGAN.py:390-432``)."""
    tables = {
        256: ([1, 2, 4, 8, 8, 16], [1, 2, 4, 8, 8, 16, 16], 6, [128, 64, 32, 16, 8, 4, 4]),
        128: ([1, 2, 4, 8, 16], [1, 2, 4, 8, 16, 16], 5, [64, 32, 16, 8, 4, 4]),
        64: ([1, 2, 4, 8], [1, 2, 4, 8, 16], 4, [32, 16, 8, 4, 4]),
    }
    if resolution == 32:
        cin = [3] + [4 * ch] * 3
        cout = [4 * ch] * 4
        down = [True, True, False, False]
        res = [16, 16, 16, 16]
    else:
        mults_in, mults_out, n_down, res = tables[resolution]
        cin = [3] + [ch * m for m in mults_in]
        cout = [ch * m for m in mults_out]
        down = [True] * n_down + [False] * (len(cout) - n_down)
    attn = set(_attn_set(attention))
    return {
        "in_channels": cin,
        "out_channels": cout,
        "downsample": down,
        "resolution": res,
        "attention": [r in attn for r in res],
    }


@dataclasses.dataclass(frozen=True)
class BigGANConfig:
    """Model hyperparameters; field names track the reference flag surface
    (``BigGAN_PyTorch/utils.py:39-940`` + ``config_files/**``)."""

    resolution: int = 64
    n_classes: int = 1000
    G_ch: int = 64
    D_ch: int = 64
    dim_z: int = 120
    bottom_width: int = 4
    G_attn: str = "64"
    D_attn: str = "64"
    G_shared: bool = True
    shared_dim: int = 128
    hier: bool = True
    class_cond: bool = False
    instance_cond: bool = True
    G_shared_feat: bool = True
    shared_dim_feat: int = 512
    instance_sz: int = 2048
    D_wide: bool = True
    num_G_SVs: int = 1
    num_D_SVs: int = 1
    num_SV_itrs: int = 1
    SN_eps: float = SN_EPS
    BN_eps: float = BN_EPS
    # G block normalizer: "bn" | "in" | "gn"/"gn_ch_N"/"gn_grp_N" | "nonorm"
    # (ref ccbn, layers.py:410-436; the output-layer bn ignores it, matching
    # the reference's plain ``bn`` class).
    norm_style: str = "bn"
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None

    # Derived latent geometry (hierarchical z, ref BigGAN.py:171-180).
    @property
    def g_arch(self):
        return g_arch(self.resolution, self.G_ch, self.G_attn)

    @property
    def num_slots(self) -> int:
        return len(self.g_arch["in_channels"]) + 1 if self.hier else 1

    @property
    def z_chunk_size(self) -> int:
        return self.dim_z // self.num_slots if self.hier else 0

    @property
    def effective_dim_z(self) -> int:
        return self.z_chunk_size * self.num_slots if self.hier else self.dim_z

    @property
    def shared_dim_eff(self) -> int:
        return self.shared_dim if self.shared_dim > 0 else self.dim_z

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


class Generator(nn.Module):
    """IC-GAN BigGAN generator.

    ``__call__(z, label, feats)``: z is ``(N, dim_z)``; ``label`` int32
    ``(N,)`` when ``class_cond``; ``feats`` ``(N, instance_sz)`` (SwAV/ResNet50
    features) when ``instance_cond``.  Output ``(N, res, res, 3)`` in
    ``tanh`` range [-1, 1].
    """

    cfg: BigGANConfig

    @nn.compact
    def __call__(
        self,
        z: jax.Array,
        label: Optional[jax.Array] = None,
        feats: Optional[jax.Array] = None,
        train: bool = False,
        standing: bool = False,
    ) -> jax.Array:
        cfg = self.cfg
        arch = cfg.g_arch
        dtype = cfg.dtype

        # Conditioning embeddings (ref get_condition_embeddings, BigGAN.py:350-358).
        embs = []
        if cfg.class_cond:
            assert label is not None
            if cfg.G_shared:
                # Non-spectral embedding (ref BigGAN.py:202-204).
                table = self.param(
                    "shared",
                    orthogonal_init(),
                    (cfg.n_classes, cfg.shared_dim_eff),
                    jnp.float32,
                )
                embs.append(jnp.take(table, label, axis=0))
            else:
                table = self.param(
                    "shared", orthogonal_init(), (cfg.n_classes, cfg.n_classes),
                    jnp.float32,
                )
                embs.append(jnp.take(table, label, axis=0))
        if cfg.instance_cond:
            assert feats is not None
            if cfg.G_shared_feat:
                embs.append(
                    SNDense(
                        cfg.shared_dim_feat, eps=cfg.SN_eps,
                        num_svs=cfg.num_G_SVs, num_itrs=cfg.num_SV_itrs,
                        dtype=dtype, name="shared_feat",
                    )(feats.astype(dtype), update_sn=train)
                )
            else:
                embs.append(feats.astype(dtype))
        y = jnp.concatenate(embs, axis=-1) if embs else None

        # Hierarchical latent: first chunk feeds the stem, later chunks are
        # concatenated with the conditioning for each block's BN.
        if cfg.hier:
            chunk = cfg.z_chunk_size
            zs = [z[:, i * chunk : (i + 1) * chunk] for i in range(cfg.num_slots)]
            z0 = zs[0]
            ys = [jnp.concatenate([y, zi], axis=-1) if y is not None else zi
                  for zi in zs[1:]]
        else:
            z0 = z
            ys = [y] * len(arch["in_channels"])

        h = SNDense(
            arch["in_channels"][0] * cfg.bottom_width ** 2,
            eps=cfg.SN_eps,
            num_svs=cfg.num_G_SVs,
            num_itrs=cfg.num_SV_itrs,
            dtype=dtype,
            name="linear",
        )(z0.astype(dtype), update_sn=train)
        # Torch reshapes NCHW (BigGAN.py:377); keep channel-minor NHWC here —
        # the converter only needs the linear kernel's output permutation.
        h = h.reshape(h.shape[0], arch["in_channels"][0], cfg.bottom_width,
                      cfg.bottom_width)
        h = jnp.transpose(h, (0, 2, 3, 1))

        for i in range(len(arch["out_channels"])):
            h = GBlock(
                in_features=arch["in_channels"][i],
                out_features=arch["out_channels"][i],
                upsample=arch["upsample"][i],
                sn_eps=cfg.SN_eps,
                bn_eps=cfg.BN_eps,
                num_svs=cfg.num_G_SVs,
                num_itrs=cfg.num_SV_itrs,
                axis_name=cfg.axis_name,
                dtype=dtype,
                norm_style=cfg.norm_style,
                name=f"block_{i}",
            )(h, ys[i], train=train, standing=standing)
            if arch["attention"][i]:
                h = SelfAttention(
                    arch["out_channels"][i], sn_eps=cfg.SN_eps,
                    num_svs=cfg.num_G_SVs, num_itrs=cfg.num_SV_itrs,
                    dtype=dtype, name=f"attn_{i}",
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
    """IC-GAN BigGAN discriminator with class/instance projection head."""

    cfg: BigGANConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        label: Optional[jax.Array] = None,
        feats: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        cfg = self.cfg
        arch = d_arch(cfg.resolution, cfg.D_ch, cfg.D_attn)
        dtype = cfg.dtype
        h = x.astype(dtype)

        for i in range(len(arch["out_channels"])):
            h = DBlock(
                in_features=arch["in_channels"][i],
                out_features=arch["out_channels"][i],
                wide=cfg.D_wide,
                preactivation=i > 0,
                downsample=arch["downsample"][i],
                sn_eps=cfg.SN_eps,
                num_svs=cfg.num_D_SVs,
                num_itrs=cfg.num_SV_itrs,
                dtype=dtype,
                name=f"block_{i}",
            )(h, update_sn=train)
            if arch["attention"][i]:
                h = SelfAttention(
                    arch["out_channels"][i], sn_eps=cfg.SN_eps,
                    num_svs=cfg.num_D_SVs, num_itrs=cfg.num_SV_itrs,
                    dtype=dtype, name=f"attn_{i}",
                )(h, update_sn=train)

        # Global sum pool over space (ref BigGAN.py:625).
        h = jnp.sum(jax.nn.relu(h), axis=(1, 2))
        out = SNDense(1, eps=cfg.SN_eps, num_svs=cfg.num_D_SVs,
                      num_itrs=cfg.num_SV_itrs, dtype=dtype, name="linear")(
            h, update_sn=train
        )

        top = arch["out_channels"][-1]
        # Projection discrimination (ref BigGAN.py:548-563, 629-641).
        if cfg.class_cond and cfg.instance_cond:
            e = SNEmbed(cfg.n_classes, top // 2, eps=cfg.SN_eps,
                        num_svs=cfg.num_D_SVs, num_itrs=cfg.num_SV_itrs,
                        dtype=dtype, name="embed")(label, update_sn=train)
            f = SNDense(top // 2, eps=cfg.SN_eps, num_svs=cfg.num_D_SVs,
                        num_itrs=cfg.num_SV_itrs, dtype=dtype,
                        name="linear_feat")(
                feats.astype(dtype), update_sn=train
            )
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
