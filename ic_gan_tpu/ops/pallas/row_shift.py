"""Pallas TPU kernel: per-row fractional shift (the ADA warp's gather killer).

``row_shift(x, off)`` computes ``out[b, l] = x[b, l + off[b]]`` with linear
interpolation and zero padding outside ``[0, L)`` — the core primitive of the
Catmull-Smith two-pass affine warp (``data/fast_warp.py``).  The XLA
formulation (vmapped ``dynamic_slice``) lowers to a gather whose cost made
ADA's geometric augmentation ~7× a full training step (reference kernel
being replaced: ``stylegan2_ada_pytorch/torch_utils/ops/grid_sample_gradfix``
+ the CUDA ``grid_sampler_2d``); here each row is one contiguous
dynamic-start VMEM slice + a VPU lerp — no gather at all.

Design (see /opt/skills/guides/pallas_guide.md):
- rows are padded host-side to ``(B, ≥3L+2)`` so every clamped shift start
  is in bounds and zero padding doubles as the out-of-frame value
  (identical contract to ``fast_warp._frac_shift_rows``);
- grid over row blocks; each block ``(BR, Lp)`` is pipelined through VMEM;
- the per-row variable shift runs as a **vectorized barrel shifter**:
  ``ceil(log2(2L+1))`` static lane-rolls, each kept or discarded per row by
  that row's shift bit — every operation is full-width across the (BR, Lp)
  tile, no per-row loop, no gather.  (v1 of this kernel looped row-by-row
  over dynamic-start slices: correct, 8.3× the XLA gather, but ~25 GB/s —
  the per-row granularity wasted 7/8 of the VPU; the barrel form removed
  the loop entirely.)
- linear in ``x`` ⇒ the VJP is the same kernel with negated offsets, so the
  op differentiates to any order (R1/path-length regularizers need
  grad-of-grad through the augmentation pipe).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_kernel(L: int, n_bits: int, starts_ref, w0_ref, w1_ref, x_ref,
                  o_ref):
    """Barrel-shift the whole (BR, Lp) tile: stage s rolls left by 2^s and
    keeps the rolled value only for rows whose shift has bit s set.  All
    stages are static-amount lane rolls — full-width VPU, no per-row work."""
    acc = x_ref[:]                      # (BR, Lp)
    starts = starts_ref[:]              # (BR, 1) int32
    # MSB→LSB with a shrinking window: before stage s the remaining shift is
    # < 2^(s+1), so only [0, L + 2^(s+1)) lanes can still matter — crop to
    # that (128-rounded) before rolling.  Total roll traffic ≈ n_bits·L
    # instead of n_bits·3L.
    for s in reversed(range(n_bits)):
        Wn = min(acc.shape[1], -(-(L + (1 << (s + 1)) + 1) // 128) * 128)
        acc = acc[:, :Wn]
        # Left-roll by 2^s expressed as the (required-nonnegative)
        # right-roll by Wn − 2^s; wrapped lanes land at ≥ Wn − 2^s ≥ L + 2^s,
        # beyond every position later stages can read.
        rolled = pltpu.roll(acc, Wn - (1 << s), axis=1)
        take = (starts & (1 << s)) != 0  # (BR, 1), broadcasts over lanes
        acc = jnp.where(take, rolled, acc)
    o_ref[:, :] = acc[:, :L] * w0_ref[:] + acc[:, 1 : L + 1] * w1_ref[:]


def row_shift(x: jax.Array, off: jax.Array, interpret: bool = False):
    """out[b, l] = x[b, l + off[b]] (linear interp, zero outside [0, L)).

    x: (B, L) float; off: (B,) float pixels.  The op is linear in ``x`` with
    adjoint ``row_shift(·, -off)`` (symmetric triangle kernel, symmetric zero
    padding), registered via ``jax.custom_derivatives.linear_call`` — so it
    differentiates to ANY order through the Pallas kernel itself (R1 /
    path-length take grad-of-grad through the augmentation pipe), and the
    backward pass is gather-free too.  ``off`` carries no tangent (ADA's
    transform draws are random, not learned).  ``interpret=True`` runs the
    kernel in the Pallas interpreter (CPU tests).
    """
    return jax.custom_derivatives.linear_call(
        lambda off_, x_: _row_shift_impl(x_, off_, interpret),
        lambda off_, ct: _row_shift_impl(ct, -off_, interpret),
        off,
        x,
    )


def _row_shift_impl(x, off, interpret):
    if x.dtype.itemsize < 4:
        # Mosaic's dynamic_rotate handles 32-bit lanes only ("Rotate with
        # non-32-bit data"); lerp accuracy wants f32 anyway.  Cast around the
        # kernel — sub-word inputs (bf16 ADA pipes) stay supported.
        return _row_shift_impl(
            x.astype(jnp.float32), off, interpret
        ).astype(x.dtype)
    B, L = x.shape
    dtype = x.dtype
    k = jnp.floor(off).astype(jnp.int32)
    f = (off - k).astype(jnp.float32)
    valid = (jnp.abs(k) <= L).astype(jnp.float32)
    kc = jnp.clip(k, -L, L)
    w0 = ((1.0 - f) * valid).astype(dtype)
    w1 = (f * valid).astype(dtype)

    # Padded row: L zeros left (negative starts), then enough right padding
    # that the largest barrel roll (start ≤ 2L, plus the L+1 lerp window)
    # never wraps meaningful data into [0, L+1); round to the 128-lane tile.
    Lp = ((3 * L + 2 + 127) // 128) * 128
    n_bits = max(1, int(np.ceil(np.log2(2 * L + 1))))
    # Block size under the ~16 MB scoped VMEM: in (BR, Lp) + out (BR, L),
    # double-buffered, plus a couple of live roll temporaries.
    bytes_per_row = (4 * Lp + L) * x.dtype.itemsize
    BR = max(8, min(512, (8 * 1024 * 1024 // bytes_per_row) // 8 * 8))
    BR = min(BR, max(8, B))
    Bp = ((B + BR - 1) // BR) * BR
    xp = jnp.pad(x, ((0, Bp - B), (L, Lp - 2 * L)))
    starts = jnp.pad(kc + L, (0, Bp - B))[:, None]  # in-bounds: [0, 2L]
    w0 = jnp.pad(w0, (0, Bp - B))[:, None]
    w1 = jnp.pad(w1, (0, Bp - B))[:, None]

    out = pl.pallas_call(
        functools.partial(_shift_kernel, L, n_bits),
        grid=(Bp // BR,),
        in_specs=[
            pl.BlockSpec((BR, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, Lp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BR, L), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, L), dtype),
        interpret=interpret,
    )(starts, w0, w1, xp)
    return out[:B]


def frac_shift_rows(x: jax.Array, off: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """Drop-in for ``fast_warp._frac_shift_rows``: x (N, R, L, C), off (N, R).

    Channels share their row's offset, so they flatten into the row axis
    ((N, R, C) rows of length L) with the offsets repeated per channel.
    """
    N, R, L, C = x.shape
    rows = jnp.transpose(x, (0, 1, 3, 2)).reshape(N * R * C, L)
    off_rows = jnp.repeat(off.reshape(N * R), C)
    out = row_shift(rows, off_rows, interpret)
    return jnp.transpose(out.reshape(N, R, C, L), (0, 1, 3, 2))
