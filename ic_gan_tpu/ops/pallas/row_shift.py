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
- rows are padded host-side to ``(B, L + L + L + 1)`` so every clamped
  slice start is in bounds and zero padding doubles as the out-of-frame
  value (identical contract to ``fast_warp._frac_shift_rows``);
- grid over row blocks; each block ``(BR, Lp)`` is pipelined through VMEM;
- per-row integer starts + lerp weights ride in SMEM via scalar prefetch;
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


def _shift_kernel(L: int, BR: int, Lw: int, k_ref, w0_ref, w1_ref, x_ref,
                  o_ref):
    blk = pl.program_id(0)

    def body(i, _):
        row = blk * BR + i
        start = k_ref[row]
        # Mosaic only allows lane-axis loads at 128-aligned offsets: load the
        # aligned superset window, then rotate the residual into place
        # (tpu.dynamic_rotate — still no gather anywhere).
        rem = jax.lax.rem(start, 128)
        base = pl.multiple_of(start - rem, 128)
        v = x_ref[pl.ds(i, 1), pl.ds(base, Lw)]
        v = pltpu.roll(v, -rem, axis=1)
        o_ref[pl.ds(i, 1), :] = (
            v[:, :L] * w0_ref[row] + v[:, 1 : L + 1] * w1_ref[row]
        )
        return 0

    jax.lax.fori_loop(0, BR, body, 0)


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
    B, L = x.shape
    dtype = x.dtype
    k = jnp.floor(off).astype(jnp.int32)
    f = (off - k).astype(jnp.float32)
    valid = (jnp.abs(k) <= L).astype(jnp.float32)
    kc = jnp.clip(k, -L, L)
    w0 = ((1.0 - f) * valid).astype(dtype)
    w1 = (f * valid).astype(dtype)

    # Aligned-load window: big enough for the rotated (L + 1) slice from any
    # 128-residual start.
    Lw = ((L + 2 + 127) // 128) * 128 + 128
    # Row-block size, VMEM-aware: the input block is (BR, 3L + Lw + 1) and
    # the output (BR, L); cap their combined footprint at ~6 MB so the
    # double-buffered pipeline stays inside the ~16 MB scoped VMEM limit
    # (256-row blocks OOM the compiler at 256² warp canvases).
    bytes_per_row = (3 * L + Lw + 1 + L) * x.dtype.itemsize
    BR = max(8, min(256, (6 * 1024 * 1024 // bytes_per_row) // 8 * 8))
    BR = min(BR, max(8, B))
    Bp = ((B + BR - 1) // BR) * BR
    # Zero pad: L left (negative starts); right up to base_max + Lw.
    xp = jnp.pad(x, ((0, Bp - B), (L, L + Lw)))
    starts = jnp.pad(kc + L, (0, Bp - B))  # in-bounds: [0, 2L]
    w0 = jnp.pad(w0, (0, Bp - B))
    w1 = jnp.pad(w1, (0, Bp - B))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(Bp // BR,),
        in_specs=[
            pl.BlockSpec(
                (BR, xp.shape[1]), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (BR, L), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    out = pl.pallas_call(
        functools.partial(_shift_kernel, L, BR, Lw),
        out_shape=jax.ShapeDtypeStruct((Bp, L), dtype),
        grid_spec=grid_spec,
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
