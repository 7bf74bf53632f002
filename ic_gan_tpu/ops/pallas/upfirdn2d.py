"""Pallas TPU kernel: fused separable upfirdn2d.

The XLA formulation (``ops/resample.py``) lowers a separable FIR resample to
two depthwise convolutions.  This kernel fuses the vertical and horizontal
passes in VMEM: each grid step DMAs one input row-tile (with halo,
double-buffered), applies both 1-D passes and the gain, and writes the
output tile.

Scope: separable (1-D) filters, uniform ``up ∈ {1, 2}``, ``down = 1`` (the
StyleGAN2 upsampling path).  Up-sampling is normalized into two-pass VALID
correlation by an XLA-side zero-stuffing; ``down > 1`` needs strided vector
slices Mosaic doesn't support and falls back to XLA, as do shapes that don't
tile onto the 128-wide lanes.

**Status / measured performance** (v5e, bf16, 128²×256ch): this kernel is
numerically exact vs the oracle but currently ~5× *slower* than the XLA
depthwise pair (≈58 GB/s vs ≈360 GB/s effective) — the taps-offset
horizontal slices are sublane-unaligned and Mosaic inserts a relayout per
tap, and the zero-stuffed input wastes bandwidth that a polyphase
formulation would avoid.  XLA therefore remains the default everywhere in
the framework; this kernel is kept as tested infrastructure for a polyphase,
sublane-aligned rewrite.

Layout: NHWC; grid over (batch, H-tiles, C-tiles); the input stays in
HBM/ANY and is staged per tile with explicit async DMA.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ic_gan_tpu.ops.resample import upfirdn2d as upfirdn2d_xla, _pair, _quad

LANES = 128


def _fir2pass_kernel(f_ref, x_hbm, out_ref, scratch, sem, *, taps, th, wo, down):
    """Double-buffered: each grid step waits on the copy its predecessor
    started and prefetches the next tile before computing."""
    n = pl.program_id(0)
    i = pl.program_id(1)
    c = pl.program_id(2)
    n_h = pl.num_programs(1)
    ct = scratch.shape[-1]
    in_th = scratch.shape[1]  # (TH-1)·down + taps

    def make_copy(slot, nn, ii, cc):
        return pltpu.make_async_copy(
            x_hbm.at[nn, pl.ds(ii * th * down, in_th), :, pl.ds(cc * ct, ct)],
            scratch.at[slot],
            sem.at[slot],
        )

    n_c = pl.num_programs(2)
    step = (n * n_h + i) * n_c + c  # sequential step (c innermost)
    slot = jax.lax.rem(step, 2)
    next_slot = jax.lax.rem(step + 1, 2)

    @pl.when(step == 0)
    def _():
        make_copy(slot, n, i, c).start()

    # Prefetch the successor tile (iteration order: n, then i, then c).
    is_last = step == pl.num_programs(0) * n_h * n_c - 1
    carry_i = (c + 1 == n_c).astype(jnp.int32)
    nc = jnp.where(c + 1 < n_c, c + 1, 0)
    ii = i + carry_i
    carry_n = (ii == n_h).astype(jnp.int32) * carry_i
    ni = jnp.where(ii < n_h, ii, 0)
    nn = n + carry_n

    @pl.when(jnp.logical_not(is_last))
    def _():
        make_copy(next_slot, nn, ni, nc).start()

    make_copy(slot, n, i, c).wait()
    x = scratch[slot]  # (in_th, Wp, ct)
    # Vertical pass (stride = down): v[r] = Σ_t f[t] · x[r·down + t].
    v = None
    for t in range(taps):
        sl = jax.lax.slice(
            x, (t, 0, 0), (t + (th - 1) * down + 1, x.shape[1], ct),
            (down, 1, 1),
        )
        contrib = sl * f_ref[0, t]
        v = contrib if v is None else v + contrib
    # Horizontal pass: out[:, j] = Σ_t f[t] · v[:, j·down + t].
    o = None
    for t in range(taps):
        sl = jax.lax.slice(
            v, (0, t, 0), (th, t + (wo - 1) * down + 1, ct), (1, down, 1)
        )
        contrib = sl * f_ref[0, t]
        o = contrib if o is None else o + contrib
    out_ref[0] = o.astype(out_ref.dtype)


def upfirdn2d_fused(
    x: jax.Array,
    f: jax.Array,
    up=1,
    down=1,
    padding=0,
    flip_filter: bool = False,
    gain: float = 1.0,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in replacement for ``ops.resample.upfirdn2d`` (separable filters)."""
    upy, upx = _pair(up)
    downy, downx = _pair(down)
    padx0, padx1, pady0, pady1 = _quad(padding)
    N, H, W, C = x.shape

    eligible = (
        f is not None
        and f.ndim == 1
        and upy == upx
        and downy == downx
        # Mosaic has no strided vector slices: only the stride-1 two-pass
        # (down=1, incl. the zero-stuffed up path) is fused; down>1 falls
        # back to the XLA depthwise pair.
        and downy == 1
        and min(padx0, padx1, pady0, pady1) >= 0
        and C % LANES == 0
    )
    if eligible:
        taps = int(f.shape[0])
        Hp = H * upy + pady0 + pady1
        Wp = W * upx + padx0 + padx1
        Ho = (Hp - taps) // downy + 1
        Wo = (Wp - taps) // downx + 1
        eligible = Ho > 0 and Wo > 0 and Wo % 8 == 0
    if not eligible:
        return upfirdn2d_xla(x, f, up=up, down=down, padding=padding,
                             flip_filter=flip_filter, gain=gain)

    orig_dtype = x.dtype
    f1d = f.astype(jnp.float32)
    if not flip_filter:
        f1d = jnp.flip(f1d)
    total_gain = gain  # raw-op semantics: up² compensation is the caller's

    if upy > 1:
        # Trailing-zero stuffing (one fused XLA memory op).
        xu = jnp.zeros((N, H * upy, W * upx, C), x.dtype)
        x = xu.at[:, :: upy, :: upx, :].set(x)
    x = jnp.pad(x, ((0, 0), (pady0, pady1), (padx0, padx1), (0, 0)))
    # Sublane alignment: the DMA'd W extent must be a multiple of 8.
    if x.shape[2] % 8:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 8 - x.shape[2] % 8), (0, 0)))
    Wp = x.shape[2]

    # Tile height: keep the staging buffer small — the unrolled taps loop
    # holds several tile-sized vector temporaries live, and the total scoped
    # VMEM (scratch + temps + double-buffered output) must stay under 16 MB.
    itemsize = np.dtype(orig_dtype).itemsize
    TH = max(8, min(Ho, 512 * 1024 // max(Wp * LANES * itemsize * downy, 1)))
    n_h = -(-Ho // TH)
    need_rows = (n_h - 1) * TH * downy + (TH - 1) * downy + taps
    if need_rows > x.shape[1]:
        x = jnp.pad(x, ((0, 0), (0, need_rows - x.shape[1]), (0, 0), (0, 0)))

    # √gain folded into the 1-D filter applies the full gain across the two
    # passes (outer(f,f)·gain == outer(f√g, f√g)).
    fk = np.sqrt(total_gain) * f1d
    fk = fk.reshape(1, taps)
    in_th = (TH - 1) * downy + taps

    kernel = functools.partial(
        _fir2pass_kernel, taps=taps, th=TH, wo=Wo, down=downy
    )
    out = pl.pallas_call(
        kernel,
        grid=(N, n_h, C // LANES),
        in_specs=[
            pl.BlockSpec((1, taps), lambda n, i, c: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, TH, Wo, LANES), lambda n, i, c: (n, i, 0, c),
        ),
        out_shape=jax.ShapeDtypeStruct((N, Ho, Wo, C), orig_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, in_th, x.shape[2], LANES), orig_dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(jnp.asarray(fk, jnp.float32), x)
    return out


def upsample2d_fused(x, f, up=2, gain=1.0):
    """Filtered 2x upsample via the fused kernel (wrapper parity with
    ``resample.upsample2d``)."""
    fw = int(f.shape[0])
    p = ((fw + up - 1) // 2, (fw - up) // 2)
    return upfirdn2d_fused(
        x, f, up=up, padding=(p[0], p[1], p[0], p[1]), gain=gain * up * up
    )


def downsample2d_fused(x, f, down=2, gain=1.0):
    fw = int(f.shape[0])
    p = ((fw - down + 1) // 2, (fw - down) // 2)
    return upfirdn2d_fused(
        x, f, down=down, padding=(p[0], p[1], p[0], p[1]), gain=gain
    )
