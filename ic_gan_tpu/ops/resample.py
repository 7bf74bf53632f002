"""Resampling ops: nearest upsample, avg/max pool, and upfirdn2d.

``upfirdn2d`` is the StyleGAN2 workhorse (reference CUDA kernel:
``stylegan2_ada_pytorch/torch_utils/ops/upfirdn2d.{cu,py}``): zero-upsample by
``up``, pad, correlate with a 2-D FIR filter, downsample by ``down``.  On TPU we
express it as a single ``lax.conv_general_dilated`` with LHS dilation (the
zero-upsampling), explicit padding, and window strides (the downsampling) — the
exact op the MXU/conv hardware path is built for, so no hand-written scatter is
needed.  Separable (1-D) filters skip the depthwise lowering entirely and run
as banded-matrix MXU matmuls (see ``upfirdn2d``); a Pallas variant was tried
across two rounds and never beat these formulations at any hot shape
(measured ≤ 80 GB/s vs the band matmuls' 130-200), so it was removed —
the winning Pallas kernels are row-shift (ADA warp) and SA-GAN attention.

All image tensors are NHWC (TPU-native layout).  Gradients come for free from
JAX's conv transpose rules and satisfy the same adjoint identity the reference
implements manually (swap up/down, complement padding, flip filter:
``upfirdn2d.py:325-349``).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _pair(x) -> tuple:
    if isinstance(x, (tuple, list)):
        assert len(x) == 2
        return tuple(x)
    return (x, x)


def _quad(x) -> tuple:
    if isinstance(x, (tuple, list)):
        if len(x) == 2:
            return (x[0], x[1], x[0], x[1])
        assert len(x) == 4
        return tuple(x)
    return (x, x, x, x)


def setup_filter(
    f,
    normalize: bool = True,
    flip_filter: bool = False,
    gain: float = 1.0,
    separable=None,
) -> jax.Array:
    """Prepare a FIR filter (reference semantics: ``upfirdn2d.py:52-100``).

    Returns a float32 array of shape ``(fh, fw)`` (or ``(taps,)`` if separable).
    """
    if f is None:
        f = 1
    f = jnp.asarray(f, dtype=jnp.float32)
    assert f.ndim in (0, 1, 2)
    if f.ndim == 0:
        f = f[jnp.newaxis]
    if separable is None:
        # Keep every 1-D filter separable (the reference only splits ≥8 taps
        # because its CUDA kernel prefers small 2-D tiles; here the separable
        # path runs as two banded-matrix MXU matmuls — see ``upfirdn2d`` —
        # which beat XLA's depthwise conv at every size).
        separable = f.ndim == 1
    if f.ndim == 1 and not separable:
        f = jnp.outer(f, f)
    if normalize:
        f = f / jnp.sum(f)
    if flip_filter:
        f = jnp.flip(f, axis=tuple(range(f.ndim)))
    f = f * (gain ** (f.ndim / 2))
    return f


def upfirdn2d(
    x: jax.Array,
    f: jax.Array | None,
    up=1,
    down=1,
    padding=0,
    flip_filter: bool = False,
    gain: float = 1.0,
) -> jax.Array:
    """Upsample, FIR-filter, and downsample a batch of NHWC images.

    Args:
      x: ``(N, H, W, C)``.
      f: filter ``(fh, fw)`` or separable ``(taps,)`` or None (identity).
      up / down: int or (y, x) integer factors.
      padding: int, (x, y), or (x0, x1, y0, y1) — same convention as the
        reference (``upfirdn2d.py:158-168``).
      flip_filter: correlate (False) vs convolve (True) — reference default is
        correlate with a pre-flipped filter, i.e. ``flip_filter=False`` here
        means plain correlation.
      gain: overall scaling factor.

    Returns:
      ``(N, outH, outW, C)`` with
      ``outH = (H*upy + pady0 + pady1 - fh) // downy + 1``.
    """
    upy, upx = _pair(up)
    downy, downx = _pair(down)
    padx0, padx1, pady0, pady1 = _quad(padding)
    if f is None:
        f = jnp.ones((1, 1), dtype=jnp.float32)
    separable = f.ndim == 1

    N, H, W, C = x.shape
    in_dtype = x.dtype
    xf = x.astype(jnp.float32)

    fil = f.astype(jnp.float32)
    if not flip_filter:
        # lax.conv performs true convolution (flips the kernel); the reference
        # correlates, so pre-flip to get correlation semantics.
        fil = jnp.flip(fil, axis=tuple(range(fil.ndim)))

    gain_total = gain

    def depthwise(inp, ker_hw, strides, pad, lhs_dil):
        kh, kw = ker_hw.shape
        # Depthwise conv: feature_group_count=C, kernel HWIO = (kh, kw, 1, C).
        ker = jnp.broadcast_to(ker_hw[:, :, None, None], (kh, kw, 1, C))
        return jax.lax.conv_general_dilated(
            inp,
            ker,
            window_strides=strides,
            padding=pad,
            lhs_dilation=lhs_dil,
            rhs_dilation=(1, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C,
        )

    # Zero-upsampling semantics: the reference appends trailing zeros so the
    # upsampled signal has length H·up (``_upfirdn2d_ref``), whereas XLA's
    # lhs_dilation produces (H−1)·up+1 — compensate by adding up−1 to the
    # trailing pad.  Negative padding (cropping) passes straight through to
    # the conv's padding config.
    pad_h = (pady0, pady1 + upy - 1)
    pad_w = (padx0, padx1 + upx - 1)

    if separable:
        # Two 1-D passes (vertical then horizontal) as banded-matrix MXU
        # matmuls.  The obvious depthwise-conv lowering runs at 38-89 GB/s
        # effective on TPU (measured r3 across every hot shape — XLA cannot
        # tile per-channel FIRs onto the conv hardware); a dense [out, in]
        # band wastes in/taps MACs but rides the MXU, measured ~10-30×
        # faster.  Semantics identical to the reference separable split
        # (upfirdn2d.py:292-319).
        taps = int(fil.shape[0])

        def band(n_in, up_, down_, p0, p1):
            n_out = (n_in * up_ + p0 + p1 - taps) // down_ + 1
            o = jnp.arange(max(n_out, 0))[:, None]
            i = jnp.arange(n_in)[None, :]
            # y_pad[j] = x[i] at j = i·up + p0; VALID tap t = j − o·down.
            t = i * up_ + p0 - o * down_
            valid = (t >= 0) & (t < taps)
            return jnp.where(valid, fil[jnp.clip(t, 0, taps - 1)], 0.0)

        mh = band(H, upy, downy, pady0, pady1)
        mw = band(W, upx, downx, padx0, padx1)
        y = jnp.einsum("oh,nhwc->nowc", mh, xf)
        y = jnp.einsum("ow,nhwc->nhoc", mw, y)
        y = y * gain_total
    else:
        y = depthwise(
            xf, fil, strides=(downy, downx), pad=(pad_h, pad_w), lhs_dil=(upy, upx)
        )
        y = y * gain_total

    return y.astype(in_dtype)


def filter2d(x, f, padding=0, flip_filter=False, gain=1.0):
    """FIR-filter without resampling, padded so output size == input size when
    ``padding=0`` and the filter is odd (reference ``upfirdn2d.py:359-389``)."""
    padx0, padx1, pady0, pady1 = _quad(padding)
    fw, fh = _filter_size(f)
    return upfirdn2d(
        x,
        f,
        padding=(
            padx0 + fw // 2,
            padx1 + (fw - 1) // 2,
            pady0 + fh // 2,
            pady1 + (fh - 1) // 2,
        ),
        flip_filter=flip_filter,
        gain=gain,
    )


def upsample2d(x, f, up=2, padding=0, flip_filter=False, gain=1.0):
    """Filtered 2x upsample (reference ``upfirdn2d.py:392-438``)."""
    upy, upx = _pair(up)
    padx0, padx1, pady0, pady1 = _quad(padding)
    fw, fh = _filter_size(f)
    p = (
        padx0 + (fw + upx - 1) // 2,
        padx1 + (fw - upx) // 2,
        pady0 + (fh + upy - 1) // 2,
        pady1 + (fh - upy) // 2,
    )
    return upfirdn2d(x, f, up=up, padding=p, flip_filter=flip_filter, gain=gain * upx * upy)


def downsample2d(x, f, down=2, padding=0, flip_filter=False, gain=1.0):
    """Filtered 2x downsample (reference ``upfirdn2d.py:441-487``)."""
    downy, downx = _pair(down)
    padx0, padx1, pady0, pady1 = _quad(padding)
    fw, fh = _filter_size(f)
    p = (
        padx0 + (fw - downx + 1) // 2,
        padx1 + (fw - downx) // 2,
        pady0 + (fh - downy + 1) // 2,
        pady1 + (fh - downy) // 2,
    )
    return upfirdn2d(x, f, down=down, padding=p, flip_filter=flip_filter, gain=gain)


def _filter_size(f):
    if f is None:
        return 1, 1
    if f.ndim == 1:
        return int(f.shape[0]), int(f.shape[0])
    return int(f.shape[1]), int(f.shape[0])


# ---------------------------------------------------------------------------
# Simple resampling used by BigGAN (nearest 2x up, 2x2 avg/max pool).
# ---------------------------------------------------------------------------


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbour 2x upsample, NHWC (BigGAN G: ``F.interpolate``)."""
    N, H, W, C = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (N, H, 2, W, 2, C))
    return x.reshape(N, H * 2, W * 2, C)


def conv3x3_nearest_up(x: jax.Array, w: jax.Array) -> jax.Array:
    """``conv3x3(upsample_nearest_2x(x), w, SAME)`` without materializing the
    upsample — the BigGAN GBlock main path (ref ``layers.py:512-552``:
    ``F.interpolate(scale=2)`` → 3×3 conv).

    Polyphase identity: every 2×-output pixel of parity (di, dj) reads a 2×2
    neighbourhood of the *source* image, with the 3×3 taps collapsing
    pairwise (nearest upsample duplicates rows/cols, so adjacent taps hit the
    same source pixel).  Four dense 2×2 convs + a pixel shuffle replace one
    3×3 conv on 4× the pixels: 16 vs 36 MACs per output — 2.25× fewer FLOPs —
    and the (N, 2H, 2W, C) nearest-upsampled temp (multi-GB at bench shapes,
    unfused by XLA) never exists.  Exact up to float associativity.

    x: (N, H, W, Cin); w: (3, 3, Cin, Cout) → (N, 2H, 2W, Cout).
    """
    assert w.shape[:2] == (3, 3), w.shape
    phases = []
    for (di, dj), k in zip(_PHASE_OFFSETS, polyphase_up_kernels(w)):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1 - di, di), (1 - dj, dj)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        phases.append(y)
    return _interleave_phases(phases, x.shape)


_PHASE_OFFSETS = ((0, 0), (0, 1), (1, 0), (1, 1))


def polyphase_up_kernels(w: jax.Array) -> list:
    """The four 2×2 phase kernels of ``conv3x3_nearest_up`` (phase order
    ``_PHASE_OFFSETS``).  Tap-combination matrices: even outputs read source
    rows (i-1, i) with weights (w0, w1+w2); odd outputs read (i, i+1) with
    (w0+w1, w2)."""
    a0 = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 1.0]], w.dtype)
    a1 = jnp.array([[1.0, 1.0, 0.0], [0.0, 0.0, 1.0]], w.dtype)
    return [
        jnp.einsum("ra,abio,cb->rcio", ar, w, ac)
        for _, ar in ((0, a0), (1, a1)) for _, ac in ((0, a0), (1, a1))
    ]


def _interleave_phases(phases, x_shape):
    n, h, wd = x_shape[0], x_shape[1], x_shape[2]
    y = jnp.stack(phases).reshape(2, 2, n, h, wd, -1)
    y = jnp.transpose(y, (2, 3, 0, 4, 1, 5))  # N, H, di, W, dj, C
    return y.reshape(n, 2 * h, 2 * wd, -1)


def conv3x3_nearest_up_q(
    xq: jax.Array, qkernels: jax.Array, scales: jax.Array, out_dtype
) -> jax.Array:
    """int8 ``conv3x3_nearest_up``: four int8 phase convs (int32 accumulate)
    dequantized per output channel.  ``xq``: (N, H, W, Cin) int8;
    ``qkernels``: (4, 2, 2, Cin, Cout) int8 in ``_PHASE_OFFSETS`` order;
    ``scales``: (4, Cout) — the combined dequant factor (act_scale ·
    per-channel weight scale).  Used by the int8 serving mode
    (``io/quant.py``); quantization happens at deploy time on the
    *transformed* phase kernels (their taps are sums of ``w`` entries, so
    quantizing ``w`` first would double the rounding error)."""
    phases = []
    for i, (di, dj) in enumerate(_PHASE_OFFSETS):
        y = jax.lax.conv_general_dilated(
            xq, qkernels[i], (1, 1), ((1 - di, di), (1 - dj, dj)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        phases.append(y.astype(out_dtype) * scales[i].astype(out_dtype))
    return _interleave_phases(phases, xq.shape)


def conv3x3_avg_pool_down(x: jax.Array, w: jax.Array) -> jax.Array:
    """``avg_pool_2x(conv3x3(x, w, SAME))`` as one strided conv — the BigGAN
    DBlock tail (ref ``layers.py:556-613``: 3×3 conv → ``AvgPool2d(2)``).

    The pooled output at (p, q) averages four conv outputs whose taps span a
    4×4 source window, so one stride-2 conv with the box-convolved kernel
    (¼ · w ⊛ 1₂ₓ₂, a 4×4 kernel) replaces conv-then-pool: 16 MACs per pooled
    output vs 36+pool — and the full-resolution conv temp never exists.
    Exact up to float associativity.

    x: (N, H, W, Cin); w: (3, 3, Cin, Cout) → (N, H/2, W/2, Cout).
    """
    assert w.shape[:2] == (3, 3), w.shape
    # 4×4 kernel: k4[r, c] = ¼ Σ_{a∈{0,1}} Σ_{b∈{0,1}} w[r−a, c−b].
    b = jnp.array(
        [[1.0, 0, 0], [1.0, 1, 0], [0, 1, 1], [0, 0, 1]], w.dtype
    )  # (4, 3): tap r of k4 sums w rows r and r−1 (in range)
    k4 = 0.25 * jnp.einsum("ra,abio,cb->rcio", b, w, b)
    return jax.lax.conv_general_dilated(
        x, k4, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def avg_pool_2x(x: jax.Array) -> jax.Array:
    """2x2 average pool, stride 2, NHWC (BigGAN D: ``nn.AvgPool2d(2)``)."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    ) * 0.25


def max_pool_2x(x: jax.Array) -> jax.Array:
    """2x2 max pool, stride 2, NHWC (SA-GAN attention phi/g path)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
