"""InceptionV3 feature network for FID/IS, in Flax (NHWC).

Mirrors the torchvision ``inception_v3`` graph the reference wraps for its
metrics (``data_utils/inception_utils.py:42-102`` — pool3 features at 299²,
logits without aux), with module names matching the torchvision state dict so
pretrained weights convert mechanically (``load_torch_inception``).

The network is eval-only here: BN always uses running stats (the reference
evaluates in eval mode), so stats live in ``params`` as constants.  Weights
are required for *comparable* FID numbers; without a weight file the module
still runs (random features) so the eval pipeline stays exercisable.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


class BasicConv2d(nn.Module):
    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = (0, 0)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = (pad, pad)
        if isinstance(pad, tuple) and len(pad) == 2 and isinstance(pad[0], int):
            pad = ((pad[0], pad[0]), (pad[1], pad[1]))
        x = nn.Conv(
            self.features, self.kernel_size, strides=self.strides, padding=pad,
            use_bias=False, name="conv", dtype=self.dtype,
        )(x)
        # Eval-mode BN folded as affine with stored stats.  eps=1e-3 is
        # torchvision's BasicConv2d BatchNorm2d(eps=0.001)
        # (torchvision/models/inception.py BasicConv2d) — NOT the 1e-5
        # default; using 1e-5 shifts FID.  Golden-pinned by
        # tests/test_inception_graph.py.  Under bf16 deployment the
        # scale/shift fold still happens in f32 (params are stored f32) and
        # only the final affine runs in the compute dtype.
        mean = self.param("bn_mean", nn.initializers.zeros, (self.features,))
        var = self.param("bn_var", nn.initializers.ones, (self.features,))
        gamma = self.param("bn_weight", nn.initializers.ones, (self.features,))
        beta = self.param("bn_bias", nn.initializers.zeros, (self.features,))
        scale = gamma * jax.lax.rsqrt(var + 1e-3)
        x = x * scale.astype(x.dtype) + (beta - mean * scale).astype(x.dtype)
        return jax.nn.relu(x)


def _avgpool3(x):
    # torchvision branch_pool = F.avg_pool2d(x, 3, stride=1, padding=1) with
    # the default count_include_pad=True: the divisor is ALWAYS 9, zeros
    # included at the border — hence the constant /9.0, not a
    # window-popcount divide.  Golden-pinned by tests/test_inception_graph.
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    ) / 9.0


def _maxpool3s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


class InceptionA(nn.Module):
    pool_features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1", dtype=self.dtype)(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1", dtype=self.dtype)(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2", dtype=self.dtype)(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1", dtype=self.dtype)(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2", dtype=self.dtype)(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3", dtype=self.dtype)(b3)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool", dtype=self.dtype)(
            _avgpool3(x)
        )
        # Concat order (1x1, 5x5, 3x3dbl, pool) = torchvision InceptionA
        # ._forward outputs list; feature-channel order feeds the FID pool.
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3", dtype=self.dtype)(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1", dtype=self.dtype)(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2", dtype=self.dtype)(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3", dtype=self.dtype)(bd)
        bp = _maxpool3s2(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1", dtype=self.dtype)(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1", dtype=self.dtype)(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2", dtype=self.dtype)(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3", dtype=self.dtype)(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1", dtype=self.dtype)(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2", dtype=self.dtype)(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3", dtype=self.dtype)(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4", dtype=self.dtype)(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5", dtype=self.dtype)(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool", dtype=self.dtype)(_avgpool3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1", dtype=self.dtype)(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2", dtype=self.dtype)(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1", dtype=self.dtype)(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2", dtype=self.dtype)(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3", dtype=self.dtype)(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4", dtype=self.dtype)(b7)
        bp = _maxpool3s2(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1", dtype=self.dtype)(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1", dtype=self.dtype)(x)
        b3 = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a", dtype=self.dtype)(b3),
                BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b", dtype=self.dtype)(b3),
            ],
            axis=-1,
        )
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1", dtype=self.dtype)(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2", dtype=self.dtype)(bd)
        bd = jnp.concatenate(
            [
                BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a", dtype=self.dtype)(bd),
                BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b", dtype=self.dtype)(bd),
            ],
            axis=-1,
        )
        bp = BasicConv2d(192, (1, 1), name="branch_pool", dtype=self.dtype)(_avgpool3(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


def _align_corners_matrix(out_size: int, in_size: int) -> jnp.ndarray:
    """[out, in] bilinear interpolation matrix with align_corners=True
    semantics: output pixel i samples input coordinate i·(in−1)/(out−1)."""
    if in_size == 1 or out_size == 1:
        return jnp.full((out_size, in_size), 1.0 / in_size)
    coords = jnp.arange(out_size, dtype=jnp.float32) * (
        (in_size - 1) / (out_size - 1)
    )
    lo = jnp.clip(jnp.floor(coords).astype(jnp.int32), 0, in_size - 2)
    frac = coords - lo
    rows = jnp.arange(out_size)
    m = jnp.zeros((out_size, in_size), jnp.float32)
    m = m.at[rows, lo].add(1.0 - frac)
    m = m.at[rows, lo + 1].add(frac)
    return m


def resize_bilinear_align_corners(x: jax.Array, out_h: int, out_w: int):
    """NHWC bilinear resize matching torch ``F.interpolate(...,
    mode='bilinear', align_corners=True)`` (ref inception_utils.py:59).

    Separable [out,in] matmuls rather than a gather — rides the MXU and is
    exactly the corner-aligned sample grid torchvision's FID wrapper uses
    (jax.image.resize only offers the half-pixel convention)."""
    mh = _align_corners_matrix(out_h, x.shape[1]).astype(x.dtype)
    mw = _align_corners_matrix(out_w, x.shape[2]).astype(x.dtype)
    x = jnp.einsum("oh,nhwc->nowc", mh, x)
    return jnp.einsum("pw,nowc->nopc", mw, x)


class InceptionV3(nn.Module):
    """Returns ``(pool, logits)`` like the reference wrapper
    (``inception_utils.py:87-102``).

    Input: NHWC float in [-1, 1] at any resolution; internally resized to
    299² bilinear and normalized with ImageNet statistics, matching
    ``WrapInception.forward`` (``inception_utils.py:58-86``).

    ``dtype=jnp.bfloat16`` is the deployment mode for the 50k-image eval
    loops: convs/resize run in bf16 on the MXU while BN scale/shift folding,
    the global pool, and the logits head stay f32 (params are stored f32
    and cast at compute, flax-style).  Feature drift vs f32 is measured by
    ``benchmarks/bench_eval_fid.py`` and pinned by
    ``tests/test_metrics_and_tools.py::test_inception_bf16_deploy_drift``.
    """

    resize_input: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        # [-1,1] -> [0,1] -> normalized (ref :60-66) in input precision,
        # then cast once to the compute dtype.
        x = (x + 1.0) / 2.0
        x = (x - mean) / std
        x = x.astype(self.dtype)
        if self.resize_input and (x.shape[1] != 299 or x.shape[2] != 299):
            # align_corners=True to match the reference WrapInception resize
            # (inception_utils.py:59) — FID features depend on this grid.
            x = resize_bilinear_align_corners(x, 299, 299)
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3", dtype=self.dtype)(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3", dtype=self.dtype)(x)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3", dtype=self.dtype)(x)
        x = _maxpool3s2(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1", dtype=self.dtype)(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3", dtype=self.dtype)(x)
        x = _maxpool3s2(x)
        x = InceptionA(32, name="Mixed_5b", dtype=self.dtype)(x)
        x = InceptionA(64, name="Mixed_5c", dtype=self.dtype)(x)
        x = InceptionA(64, name="Mixed_5d", dtype=self.dtype)(x)
        x = InceptionB(name="Mixed_6a", dtype=self.dtype)(x)
        x = InceptionC(128, name="Mixed_6b", dtype=self.dtype)(x)
        x = InceptionC(160, name="Mixed_6c", dtype=self.dtype)(x)
        x = InceptionC(160, name="Mixed_6d", dtype=self.dtype)(x)
        x = InceptionC(192, name="Mixed_6e", dtype=self.dtype)(x)
        x = InceptionD(name="Mixed_7a", dtype=self.dtype)(x)
        x = InceptionE(name="Mixed_7b", dtype=self.dtype)(x)
        x = InceptionE(name="Mixed_7c", dtype=self.dtype)(x)
        # Reference pools with F.adaptive_avg_pool2d(x, (1,1))
        # (inception_utils.py:84) == plain spatial mean; logits = fc(pool)
        # with no softmax (WrapInception returns raw logits, :87-102).
        # Pool/logits head in f32 regardless of compute dtype: FID moments
        # are quadratic in these features, bf16 pool would dominate the
        # metric's error budget.
        pool = jnp.mean(x.astype(jnp.float32), axis=(1, 2))  # (N, 2048)
        logits = nn.Dense(1000, name="fc", dtype=jnp.float32)(pool)
        return pool, logits


def load_torch_inception(state_dict) -> dict:
    """torchvision ``inception_v3`` state dict (numpy values) → Flax params.

    Name mapping: ``<module>.conv.weight`` → ``<module>/conv/kernel`` (OIHW→
    HWIO); ``<module>.bn.{weight,bias,running_mean,running_var}`` →
    ``bn_{weight,bias,mean,var}``; ``fc.{weight,bias}`` → dense kernel/bias.
    Aux-classifier entries are dropped.
    """
    from flax.traverse_util import unflatten_dict

    flat = {}
    for key, val in state_dict.items():
        v = np.asarray(val)
        if key.startswith("AuxLogits") or key.endswith("num_batches_tracked"):
            continue
        parts = key.split(".")
        if parts[-2] == "conv" and parts[-1] == "weight":
            path = tuple(parts[:-2]) + ("conv", "kernel")
            v = np.transpose(v, (2, 3, 1, 0))
        elif parts[-2] == "bn":
            name = {
                "weight": "bn_weight", "bias": "bn_bias",
                "running_mean": "bn_mean", "running_var": "bn_var",
            }[parts[-1]]
            path = tuple(parts[:-2]) + (name,)
        elif parts[0] == "fc":
            path = ("fc", {"weight": "kernel", "bias": "bias"}[parts[-1]])
            if parts[-1] == "weight":
                v = np.transpose(v)
        else:
            continue
        flat[path] = jnp.asarray(v)
    return {"params": unflatten_dict(flat)}
