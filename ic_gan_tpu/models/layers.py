"""BigGAN layer library in Flax (NHWC, TPU-native).

Functional re-design of ``BigGAN_PyTorch/layers.py``:

- Spectral norm keeps its power-iteration state ``u`` in an explicit ``"sn"``
  variable collection (the reference mutates registered buffers during forward,
  ``layers.py:103-111``); singular values are stored alongside for logging.
- Batch norm is *globally correct* under pjit: batch moments are computed with
  plain ``jnp.mean`` over the (logically global) batch, so when the batch axis
  is sharded over the mesh XLA inserts the cross-replica psum automatically —
  this supersedes the reference's SyncBN machinery
  (``sync_batchnorm/batchnorm.py``), which is silently disabled under DDP
  (``layers.py:387-391``).
- All convs are ``lax.conv_general_dilated`` NHWC/HWIO — the MXU path.

Layouts: linear kernels ``(in, out)``, conv kernels ``(kh, kw, in, out)``,
embeddings ``(num, dim)``.  The checkpoint converter transposes from torch.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ic_gan_tpu.ops.spectral_norm import spectral_normalize
from ic_gan_tpu.ops.resample import (
    upsample_nearest_2x,
    avg_pool_2x,
    max_pool_2x,
    conv3x3_nearest_up,
    conv3x3_nearest_up_q,
    conv3x3_avg_pool_down,
)

Dtype = Any

# Default epsilons (reference argparse defaults: BN_eps=1e-5, SN_eps=1e-6,
# BigGAN_PyTorch/utils.py).
SN_EPS = 1e-6
BN_EPS = 1e-5


def orthogonal_init(scale: float = 1.0):
    """Orthogonal init over the (fan_in, out) matricization — the reference
    initializes conv/linear/embedding weights with ``init.orthogonal_``
    (``BigGAN.py:327-345``)."""
    return nn.initializers.orthogonal(scale, column_axis=-1)


# Reference init styles (``BigGAN.py:335-342``; argparse choices
# ``utils.py:302-315``).  "ortho" is the construction-time default here.
WEIGHT_INITS = {
    "ortho": orthogonal_init(),
    "N02": nn.initializers.normal(0.02),
    "glorot": nn.initializers.xavier_uniform(),
    "xavier": nn.initializers.xavier_uniform(),
}


def apply_weight_init(params, rng: jax.Array, style: str):
    """Post-construction weight re-draw — the reference's ``init_weights``
    overwrites every Conv2d/Linear/Embedding weight *after* building the
    module tree (``BigGAN.py:294,326-345``; biases and BN gain/bias keep
    their defaults).  Same contract here: re-draw every ``kernel`` /
    ``embedding`` / ``shared`` leaf of the ``params`` collection, leave
    everything else.  ``style="ortho"`` is a no-op (it is already the
    construction default); ``skip_init`` (ref ``utils.py:382-388``) maps to
    not calling this at all.  Wrap in ``jax.jit`` on the relay backend."""
    if style == "ortho":
        return params
    init = WEIGHT_INITS[style]

    def redraw(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name not in ("kernel", "embedding", "shared"):
            return leaf
        # Stable per-leaf stream (python hash() is seed-randomized).
        import zlib

        leaf_rng = jax.random.fold_in(
            rng, zlib.crc32("/".join(str(p) for p in path).encode())
        )
        return init(leaf_rng, leaf.shape, leaf.dtype)

    return jax.tree_util.tree_map_with_path(redraw, params)


class SNDense(nn.Module):
    """Linear layer with spectral normalization (ref ``layers.py:157-165``)."""

    features: int
    use_bias: bool = True
    num_svs: int = 1
    num_itrs: int = 1
    eps: float = SN_EPS
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        kernel = self.param(
            "kernel", orthogonal_init(), (x.shape[-1], self.features), jnp.float32
        )
        # Folded-deployment mode: when the "sn" collection was stripped by
        # io.deploy.fold_spectral_norm, σ is already baked into the kernel —
        # skip the power iteration entirely.
        if not self.is_initializing() and not self.has_variable("sn", "u"):
            w_bar = kernel
        else:
            u = self.variable(
                "sn",
                "u",
                lambda key, shape: jax.random.normal(key, shape),
                self.make_rng("params") if self.is_initializing() else None,
                (self.num_svs, self.features),
            )
            sv = self.variable(
                "sn", "sv", lambda _, s: jnp.ones(s), None, (self.num_svs,)
            )
            w_bar, new_u, svs = spectral_normalize(
                kernel, u.value, update=update_sn, num_itrs=self.num_itrs,
                eps=self.eps,
            )
            if update_sn and not self.is_initializing():
                u.value = new_u
                sv.value = svs
        y = jnp.dot(x.astype(self.dtype), w_bar.astype(self.dtype))
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y


class SNConv(nn.Module):
    """3x3/1x1 conv with spectral normalization (ref ``layers.py:116-153``)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = True
    num_svs: int = 1
    num_itrs: int = 1
    eps: float = SN_EPS
    dtype: Dtype = jnp.float32
    # Fused resampling (3×3 SAME only): ``up2x`` applies the kernel as if the
    # input were nearest-2×-upsampled (polyphase, 2.25× fewer FLOPs, no
    # upsampled temp); ``down2x`` as if the output were 2×2-avg-pooled.
    # Exact math, same parameters — see ``ops/resample.py``.
    up2x: bool = False
    down2x: bool = False

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            orthogonal_init(),
            (kh, kw, x.shape[-1], self.features),
            jnp.float32,
        )
        if not self.is_initializing() and not self.has_variable("sn", "u"):
            w_bar = kernel  # folded deployment mode (io.deploy)
        else:
            u = self.variable(
                "sn",
                "u",
                lambda key, shape: jax.random.normal(key, shape),
                self.make_rng("params") if self.is_initializing() else None,
                (self.num_svs, self.features),
            )
            sv = self.variable(
                "sn", "sv", lambda _, s: jnp.ones(s), None, (self.num_svs,)
            )
            w_bar, new_u, svs = spectral_normalize(
                kernel, u.value, update=update_sn, num_itrs=self.num_itrs,
                eps=self.eps,
            )
            if update_sn and not self.is_initializing():
                u.value = new_u
                sv.value = svs
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        if (not self.is_initializing() and not self.down2x
                and self.has_variable("quant", "act_scale")):
            # int8 serving mode (``io/quant.py``): per-tensor activation
            # scale from calibration, per-output-channel weight scales,
            # int32 MXU accumulation (measured 1.56-1.67× the bf16 conv rate
            # on v5e).  The dequant multiply fuses with the bias add and the
            # consumer's elementwise chain.
            sx = self.get_variable("quant", "act_scale")
            qk = self.get_variable("quant", "qkernel")
            ws = self.get_variable("quant", "wscale")
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) / sx), -127, 127
            ).astype(jnp.int8)
            if self.up2x:
                y = conv3x3_nearest_up_q(
                    xq, qk, ws * sx, self.dtype
                )
            else:
                y = jax.lax.conv_general_dilated(
                    xq, qk,
                    window_strides=self.strides,
                    padding=pad,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.int32,
                ).astype(self.dtype) * (ws * sx).astype(self.dtype)
        elif self.up2x:
            y = conv3x3_nearest_up(
                x.astype(self.dtype), w_bar.astype(self.dtype)
            )
        elif self.down2x:
            y = conv3x3_avg_pool_down(
                x.astype(self.dtype), w_bar.astype(self.dtype)
            )
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype),
                w_bar.astype(self.dtype),
                window_strides=self.strides,
                padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + b.astype(self.dtype)
        return y


class SNEmbed(nn.Module):
    """Embedding with spectral normalization over the (num_embeddings, dim)
    matrix (ref ``layers.py:171-200`` — note ``num_outputs=num_embeddings``)."""

    num_embeddings: int
    features: int
    num_svs: int = 1
    num_itrs: int = 1
    eps: float = SN_EPS
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, idx, update_sn: bool = False):
        table = self.param(
            "embedding",
            orthogonal_init(),
            (self.num_embeddings, self.features),
            jnp.float32,
        )
        if not self.is_initializing() and not self.has_variable("sn", "u"):
            w_bar = table  # folded deployment mode (io.deploy)
        else:
            u = self.variable(
                "sn",
                "u",
                lambda key, shape: jax.random.normal(key, shape),
                self.make_rng("params") if self.is_initializing() else None,
                (self.num_svs, self.num_embeddings),
            )
            sv = self.variable(
                "sn", "sv", lambda _, s: jnp.ones(s), None, (self.num_svs,)
            )
            w_bar, new_u, svs = spectral_normalize(
                table,
                u.value,
                update=update_sn,
                num_itrs=self.num_itrs,
                eps=self.eps,
                transpose=True,
            )
            if update_sn and not self.is_initializing():
                u.value = new_u
                sv.value = svs
        return jnp.take(w_bar.astype(self.dtype), idx, axis=0)


class CrossReplicaBatchNorm(nn.Module):
    """Batch norm with torch ``F.batch_norm`` semantics and global-batch
    (cross-replica) moments under pjit.

    Training: normalize with batch moments (biased var), update running stats
    with momentum 0.1 and *unbiased* var (torch behaviour).  Eval: normalize
    with stored stats.  ``standing`` mode accumulates raw sums for BigGAN's
    standing statistics (ref ``layers.py:287-336``, ``utils.py:1679-1695``).

    Stats are computed in float32 regardless of compute dtype (ref
    ``manual_bn``, ``layers.py:266-283``).
    """

    features: int
    eps: float = BN_EPS
    momentum: float = 0.1
    axis_name: Optional[str] = None  # set when used inside shard_map/pmap

    @nn.compact
    def __call__(self, x, train: bool, standing: bool = False):
        stored_mean = self.variable(
            "batch_stats", "mean", lambda _, s: jnp.zeros(s), None, (self.features,)
        )
        stored_var = self.variable(
            "batch_stats", "var", lambda _, s: jnp.ones(s), None, (self.features,)
        )
        counter = self.variable(
            "batch_stats", "accum_counter", lambda _, s: jnp.zeros(s), None, (1,)
        )

        if train or standing:
            # f32 *minimum* for stats (ref manual_bn, layers.py:266-283);
            # promote-don't-demote so x64 debug runs (used by the n-vs-1
            # equivalence checks) keep full precision.
            xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
            m = jnp.mean(xf, axis=(0, 1, 2))
            m2 = jnp.mean(jnp.square(xf), axis=(0, 1, 2))
            if self.axis_name is not None:
                m = jax.lax.pmean(m, self.axis_name)
                m2 = jax.lax.pmean(m2, self.axis_name)
            var = m2 - jnp.square(m)
            if not self.is_initializing():
                if standing:
                    stored_mean.value = stored_mean.value + m
                    stored_var.value = stored_var.value + var
                    counter.value = counter.value + 1.0
                else:
                    n = x.shape[0] * x.shape[1] * x.shape[2]
                    if self.axis_name is not None:
                        n = n * jax.lax.psum(1, self.axis_name)
                    unbiased = var * (n / max(n - 1, 1))
                    stored_mean.value = (
                        (1 - self.momentum) * stored_mean.value + self.momentum * m
                    )
                    stored_var.value = (
                        (1 - self.momentum) * stored_var.value + self.momentum * unbiased
                    )
            mean, v = m, var
        else:
            cnt = jnp.maximum(counter.value[0], 1.0)
            use_standing = counter.value[0] > 0
            mean = jnp.where(use_standing, stored_mean.value / cnt, stored_mean.value)
            v = jnp.where(use_standing, stored_var.value / cnt, stored_var.value)

        inv = jax.lax.rsqrt(v + self.eps)
        if train or standing or x.dtype == jnp.float32:
            y = (x.astype(jnp.promote_types(x.dtype, jnp.float32)) - mean) * inv
            return y.astype(x.dtype)
        # Low-precision eval: stats stay float32 but the (large, elementwise)
        # normalization runs in the compute dtype so XLA fuses it with the
        # surrounding bf16 convs instead of round-tripping through fp32.
        return (x - mean.astype(x.dtype)) * inv.astype(x.dtype)


def group_norm(x, norm_style: str, eps: float = BN_EPS):
    """Affine-free group norm with the reference's group selection
    (``groupnorm``, ``layers.py:340-351``): ``gn_ch_N`` → ``C//N`` groups,
    ``gn_grp_N`` → ``N`` groups, plain ``gn`` → 16 groups."""
    C = x.shape[-1]
    if "ch" in norm_style:
        groups = max(C // int(norm_style.split("_")[-1]), 1)
    elif "grp" in norm_style:
        groups = int(norm_style.split("_")[-1])
    else:
        groups = 16
    groups = min(groups, C)
    while C % groups:
        groups -= 1
    xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    g = xf.reshape(x.shape[:-1] + (groups, C // groups))
    m = jnp.mean(g, axis=(1, 2, 4), keepdims=True)
    v = jnp.mean(jnp.square(g - m), axis=(1, 2, 4), keepdims=True)
    out = (g - m) * jax.lax.rsqrt(v + eps)
    return out.reshape(x.shape).astype(x.dtype)


class InstanceNorm(nn.Module):
    """Instance norm with BN-style running stats — torch ``F.instance_norm``
    with ``running_mean/var`` as the reference's ccbn ``norm_style="in"``
    branch uses it (``layers.py:421-431``): train normalizes each sample
    with its own (H, W) moments and updates the per-channel running stats
    with the batch-averaged instance moments; eval normalizes with the
    running stats."""

    features: int
    eps: float = BN_EPS
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x, train: bool):
        stored_mean = self.variable(
            "batch_stats", "mean", lambda _, s: jnp.zeros(s), None, (self.features,)
        )
        stored_var = self.variable(
            "batch_stats", "var", lambda _, s: jnp.ones(s), None, (self.features,)
        )
        xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
        if train:
            m = jnp.mean(xf, axis=(1, 2), keepdims=True)          # (N,1,1,C)
            v = jnp.mean(jnp.square(xf - m), axis=(1, 2), keepdims=True)
            if not self.is_initializing():
                n = x.shape[1] * x.shape[2]
                unbiased = jnp.mean(v[:, 0, 0, :], axis=0) * (n / max(n - 1, 1))
                stored_mean.value = (
                    (1 - self.momentum) * stored_mean.value
                    + self.momentum * jnp.mean(m[:, 0, 0, :], axis=0)
                )
                stored_var.value = (
                    (1 - self.momentum) * stored_var.value + self.momentum * unbiased
                )
            out = (xf - m) * jax.lax.rsqrt(v + self.eps)
        else:
            out = (xf - stored_mean.value) * jax.lax.rsqrt(
                stored_var.value + self.eps
            )
        return out.astype(x.dtype)


class ConditionalBatchNorm(nn.Module):
    """Class/instance-conditional BN: per-sample gain ``1 + Linear(y)`` and
    bias ``Linear(y)`` applied after parameter-free normalization (ref
    ``ccbn``, ``layers.py:359-437``).  The gain/bias projections are
    spectrally normalized, bias-free linears (``BigGAN.py:205-209``).

    ``norm_style`` selects the normalizer (ref ``layers.py:410-436``):
    ``bn`` (cross-replica batch norm), ``in`` (instance norm with running
    stats), ``gn``/``gn_ch_N``/``gn_grp_N`` (group norm — the reference's
    own ``gn`` branch crashes on a ``self.normstyle`` typo at
    ``layers.py:433``; this is the de-typoed behavior), ``nonorm``."""

    features: int
    eps: float = BN_EPS
    momentum: float = 0.1
    sn_eps: float = SN_EPS
    num_svs: int = 1
    num_itrs: int = 1
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32
    norm_style: str = "bn"

    @nn.compact
    def __call__(self, x, y, train: bool, standing: bool = False):
        gain = 1.0 + SNDense(
            self.features, use_bias=False, eps=self.sn_eps,
            num_svs=self.num_svs, num_itrs=self.num_itrs, dtype=self.dtype,
            name="gain",
        )(y, update_sn=train)
        bias = SNDense(
            self.features, use_bias=False, eps=self.sn_eps,
            num_svs=self.num_svs, num_itrs=self.num_itrs, dtype=self.dtype,
            name="bias",
        )(y, update_sn=train)
        if self.norm_style == "bn":
            out = CrossReplicaBatchNorm(
                self.features,
                eps=self.eps,
                momentum=self.momentum,
                axis_name=self.axis_name,
                name="bn",
            )(x, train=train, standing=standing)
        elif self.norm_style == "in":
            out = InstanceNorm(
                self.features, eps=self.eps, momentum=self.momentum, name="bn"
            )(x, train=train or standing)
        elif self.norm_style == "nonorm":
            out = x
        elif self.norm_style.startswith("gn") or self.norm_style == "groupnorm":
            out = group_norm(x, self.norm_style, eps=self.eps)
        else:
            raise ValueError(f"unknown norm_style {self.norm_style!r}")
        return out * gain[:, None, None, :] + bias[:, None, None, :]


class ScaledBatchNorm(nn.Module):
    """Unconditional BN with learnable gain/bias (ref ``bn``,
    ``layers.py:446-503``) — used by G's output layer."""

    features: int
    eps: float = BN_EPS
    momentum: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool, standing: bool = False):
        gain = self.param("gain", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        out = CrossReplicaBatchNorm(
            self.features,
            eps=self.eps,
            momentum=self.momentum,
            axis_name=self.axis_name,
            name="bn",
        )(x, train=train, standing=standing)
        return out * gain + bias


# Deployment-mode θ/φ/g fusion switch (list so callers mutate in place).
# ``io/quant.calibrate_conv_scales`` turns it off during its calibration
# forward: the per-conv interceptor needs the child SNConvs to actually run.
_ATTN_FUSION = [True]


class SelfAttention(nn.Module):
    """SA-GAN non-local block (ref ``Attention``, ``layers.py:206-244``).

    θ/φ/g/o are 1x1 spectrally-normalized convs; φ and g are 2x2 max-pooled.
    The two batched matmuls map straight onto the MXU via einsum.
    """

    features: int
    sn_eps: float = SN_EPS
    num_svs: int = 1
    num_itrs: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        ch = self.features
        N, H, W, C = x.shape
        conv = lambda f, name: SNConv(
            f, kernel_size=(1, 1), use_bias=False, eps=self.sn_eps,
            num_svs=self.num_svs, num_itrs=self.num_itrs, dtype=self.dtype,
            name=name,
        )
        fused = self._fused_qkv(x)
        if fused is not None:
            theta, phi, g = fused
            phi = max_pool_2x(phi)
            g = max_pool_2x(g)
        else:
            theta = conv(ch // 8, "theta")(x, update_sn)
            phi = max_pool_2x(conv(ch // 8, "phi")(x, update_sn))
            g = max_pool_2x(conv(ch // 2, "g")(x, update_sn))

        theta = theta.reshape(N, H * W, ch // 8)
        phi = phi.reshape(N, H * W // 4, ch // 8)
        g = g.reshape(N, H * W // 4, ch // 2)

        from ic_gan_tpu.ops.pallas import attention as pallas_attn

        if jax.default_backend() == "tpu" and pallas_attn.supported(
            H * W, H * W // 4, ch // 8, ch // 2
        ):
            # Fused Pallas path: the (N, HW, HW/4) logits stay in VMEM — one
            # MXU dot, exact f32 softmax, second dot, no HBM round-trip.
            o = pallas_attn.sagan_attention(theta, phi, g)
        elif self.dtype == jnp.bfloat16:
            # Low-precision path: keep the (N, HW, HW/4) logits in bf16 (MXU
            # still accumulates in f32) with f32 row sums — avoids
            # materializing a multi-GB f32 logits tensor at 64×64; costs ~30%
            # of sampling time otherwise.
            logits = jnp.einsum(
                "nqc,nkc->nqk", theta, phi,
                preferred_element_type=jnp.bfloat16,
            )
            m = jnp.max(logits, axis=-1, keepdims=True)
            p = jnp.exp((logits - m).astype(jnp.bfloat16))
            s = jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.float32)
            beta = (p / s.astype(jnp.bfloat16)).astype(self.dtype)
            o = jnp.einsum(
                "nqk,nkc->nqc", beta, g, preferred_element_type=jnp.float32
            )
        else:
            logits = jnp.einsum(
                "nqc,nkc->nqk", theta, phi, preferred_element_type=jnp.float32
            )
            beta = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
            o = jnp.einsum(
                "nqk,nkc->nqc", beta, g, preferred_element_type=jnp.float32
            )
        o = o.astype(self.dtype).reshape(N, H, W, ch // 2)
        o = conv(ch, "o")(o, update_sn)
        gamma = self.param("gamma", nn.initializers.zeros, (), jnp.float32)
        return gamma * o + x

    def _fused_qkv(self, x):
        """Deployment-mode fusion of the θ/φ/g 1×1 projections into ONE
        matmul (same math, same parameters, read from the child scopes).

        θ and φ emit ch/8 channels — e.g. 48 at the 256² sampler's attention
        block, under the MXU's 128 lanes, so three separate dots waste
        ~2/3 of the array on the two thin ones AND read the (N,H,W,C)
        input from HBM three times.  Concatenated, the projection is one
        C→(ch/8+ch/8+ch/2) dot (384→288 at ch96: 2.25 full lane tiles) with
        one input read.  Only active once spectral norm is folded
        (``io/deploy``) — training keeps per-weight SN power iteration —
        and composes with int8 serving (the three child quant records share
        one activation scale, since they calibrate on the same input).
        """
        ch = self.features
        # NB: the SN power-iteration state lives under the CHILD conv scopes
        # (``sn/theta/u``), so the presence probe must name the child subtree
        # — ``has_variable("sn", "u")`` at this scope is always False and
        # would activate the fusion on unfolded variables, silently skipping
        # the σ division (r5 regression caught by test_biggan_deep_parity).
        if (not _ATTN_FUSION[0] or self.is_initializing()
                or self.has_variable("sn", "theta")
                or not self.has_variable("params", "theta")):
            return None
        get = lambda name: self.get_variable("params", name)["kernel"]
        splits = (ch // 8, ch // 4)  # [θ | φ | g] boundaries
        if self.has_variable("quant", "theta"):
            q = lambda name: self.get_variable("quant", name)
            qt, qp, qg = q("theta"), q("phi"), q("g")
            # One calibration input → one activation scale (they are equal
            # by construction; use θ's).
            sx = qt["act_scale"]
            qk = jnp.concatenate(
                [qt["qkernel"], qp["qkernel"], qg["qkernel"]], axis=-1)
            ws = jnp.concatenate(
                [qt["wscale"], qp["wscale"], qg["wscale"]], axis=-1)
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) / sx), -127, 127
            ).astype(jnp.int8)
            y = jax.lax.conv_general_dilated(
                xq, qk, (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            ).astype(self.dtype) * (ws * sx).astype(self.dtype)
        else:
            wf = jnp.concatenate(
                [get("theta"), get("phi"), get("g")], axis=-1)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), wf.astype(self.dtype), (1, 1),
                ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        return jnp.split(y, splits, axis=-1)


class GBlock(nn.Module):
    """Generator residual block (ref ``layers.py:512-552``):
    BN→ReLU→(up)→conv3x3→BN→ReLU→conv3x3 + (up→conv1x1) shortcut."""

    in_features: int
    out_features: int
    upsample: bool = True
    sn_eps: float = SN_EPS
    bn_eps: float = BN_EPS
    num_svs: int = 1
    num_itrs: int = 1
    axis_name: Optional[str] = None
    dtype: Dtype = jnp.float32
    norm_style: str = "bn"

    @nn.compact
    def __call__(self, x, y, train: bool, standing: bool = False):
        cbn = lambda f, name: ConditionalBatchNorm(
            f, eps=self.bn_eps, sn_eps=self.sn_eps, num_svs=self.num_svs,
            num_itrs=self.num_itrs, axis_name=self.axis_name,
            dtype=self.dtype, norm_style=self.norm_style, name=name,
        )
        conv = lambda f, k, name: SNConv(
            f, kernel_size=(k, k), eps=self.sn_eps, num_svs=self.num_svs,
            num_itrs=self.num_itrs, dtype=self.dtype, name=name,
        )
        h = jax.nn.relu(cbn(self.in_features, "bn1")(x, y, train, standing))
        # Upsample is fused into conv1 (polyphase — ``conv3x3_nearest_up``),
        # and the 1×1 shortcut conv commutes with nearest upsampling, so it
        # runs at the low resolution: both exact rewrites of the reference's
        # interpolate→conv order, 2.25×/4× fewer FLOPs, no upsampled temps.
        if self.upsample:
            h = SNConv(
                self.out_features, kernel_size=(3, 3), eps=self.sn_eps,
                num_svs=self.num_svs, num_itrs=self.num_itrs,
                dtype=self.dtype, up2x=True, name="conv1",
            )(h, update_sn=train)
        else:
            h = conv(self.out_features, 3, "conv1")(h, update_sn=train)
        h = jax.nn.relu(cbn(self.out_features, "bn2")(h, y, train, standing))
        h = conv(self.out_features, 3, "conv2")(h, update_sn=train)
        if self.in_features != self.out_features or self.upsample:
            x = conv(self.out_features, 1, "conv_sc")(x, update_sn=train)
        if self.upsample:
            x = upsample_nearest_2x(x)
        return h + x


class DBlock(nn.Module):
    """Discriminator residual block (ref ``layers.py:556-613``)."""

    in_features: int
    out_features: int
    wide: bool = True
    preactivation: bool = True
    downsample: bool = False
    sn_eps: float = SN_EPS
    num_svs: int = 1
    num_itrs: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, update_sn: bool = False):
        hidden = self.out_features if self.wide else self.in_features
        conv = lambda f, k, name: SNConv(
            f, kernel_size=(k, k), eps=self.sn_eps, num_svs=self.num_svs,
            num_itrs=self.num_itrs, dtype=self.dtype, name=name,
        )
        h = jax.nn.relu(x) if self.preactivation else x
        h = conv(hidden, 3, "conv1")(h, update_sn)
        # avg-pool fused into conv2 as one strided conv (exact rewrite of
        # conv→pool, 2.25× fewer FLOPs — ``conv3x3_avg_pool_down``).
        if self.downsample:
            h = SNConv(
                self.out_features, kernel_size=(3, 3), eps=self.sn_eps,
                num_svs=self.num_svs, num_itrs=self.num_itrs,
                dtype=self.dtype, down2x=True, name="conv2",
            )(jax.nn.relu(h), update_sn)
        else:
            h = conv(self.out_features, 3, "conv2")(jax.nn.relu(h), update_sn)

        # Shortcut: preactivation order is conv_sc→down; first block (no
        # preactivation) is down→conv_sc (ref ``layers.py:587-598``).  The
        # 1×1 conv commutes with average pooling, so both orders pool first
        # here (exact, 4× fewer shortcut FLOPs on preactivation blocks).
        sc = x
        learnable_sc = self.in_features != self.out_features or self.downsample
        if self.preactivation:
            if self.downsample:
                sc = avg_pool_2x(sc)
            if learnable_sc:
                sc = conv(self.out_features, 1, "conv_sc")(sc, update_sn)
        else:
            if self.downsample:
                sc = avg_pool_2x(sc)
            if learnable_sc:
                sc = conv(self.out_features, 1, "conv_sc")(sc, update_sn)
        return h + sc
