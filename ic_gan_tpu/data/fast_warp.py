"""Gather-free affine image warp for TPU (Catmull-Smith two-pass).

TPU gathers made the classic grid-sample bilinear warp the dominant cost of
ADA's geometric augmentations (~7× a full training step before r2; with this
module + the Pallas row-shift kernel the geometric stage is free — 0.99× a
no-augment step, ``benchmarks/results/ada_warp.json``).  This module
implements the same per-sample inverse-affine warp as a composition of
gather-free primitives:

  1. axis swap (per-sample transpose select) when the affine is closer to a
     90° rotation, so the vertical scale coefficient stays well-conditioned;
  2. pass 1 (vertical): a per-sample 1-D scale resample as a batched
     (L_out × L_in) matmul on the MXU, then a per-column fractional shear
     shift (Pallas barrel-shift kernel / two ``dynamic_slice`` reads + lerp);
  3. pass 2 (horizontal): same along the other axis.

Derivation: with inverse map ``[gx; gy] = A·[xo; yo] + t``,
``out[yo,xo] = img[gy, gx]`` factors into
``T[yt, x] = img[α·yt + ε·x + ζ, x]`` then ``out[yo, xo] = T[yo, a·xo +
b·yo + tx]`` with ``ε = c/a``, ``α = d − cb/a``, ``ζ = ty − ε·tx`` (rows of
``A = [[a, b], [c, d]]``); the axis swap keeps ``|a|`` the larger of
``|a|, |c|``.

Numerics: composition of three linear interpolations instead of one bilinear
sample — identical for integer blits and pure axis scalings, and within
second-order interpolation error for rotations (slightly *more* low-pass;
interior mean deviation ~0.4% on 2σ-smoothed noise).

Layout: the warp runs internally in planar ``(N, C, row, shift-axis)`` form
so the shifted axis is always minor — the Pallas row-shift kernel and the
scale matmul consume it directly with a single inter-pass transpose, instead
of the 2×240 MB channel transposes per shift the interleaved NHWC form
needed at 256².  bf16 inputs keep bf16 MXU matmuls (f32 accumulation); the
shift lerp stays f32 (Mosaic lane rotates are 32-bit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _frac_shift_rows_2d(x: jax.Array, off: jax.Array,
                        l_out: int | None = None) -> jax.Array:
    """XLA fallback: shift each row of ``x`` (B, L) by ``off`` (B,) pixels
    with linear interpolation; out[l] = x[l + off], zero outside, out (B,
    l_out)."""
    B, L = x.shape
    if l_out is None:
        l_out = L
    k = jnp.floor(off).astype(jnp.int32)
    f = (off - k)[:, None]
    valid = (k >= -l_out) & (k <= L)
    kc = jnp.clip(k, -l_out, L)
    xp = jnp.pad(x, ((0, 0), (l_out, l_out + 2)))

    def per_row(row, kk):
        s0 = jax.lax.dynamic_slice(row, (l_out + kk,), (l_out,))
        s1 = jax.lax.dynamic_slice(row, (l_out + kk + 1,), (l_out,))
        return s0, s1

    s0, s1 = jax.vmap(per_row)(xp, kc)
    out = s0 * (1.0 - f) + s1 * f
    return out * valid[:, None]


def _frac_shift_rows(x: jax.Array, off: jax.Array) -> jax.Array:
    """Shift each row of ``x`` (N, R, L, C) along L by ``off`` (N, R) pixels
    with linear interpolation; out[l] = x[l + off], zero outside.  (Test
    oracle for the Pallas kernel; the warp itself uses the planar 2-D form.)
    """
    N, R, L, C = x.shape
    rows = jnp.transpose(x, (0, 1, 3, 2)).reshape(N * R * C, L)
    off_rows = jnp.repeat(off.reshape(N * R), C)
    out = _frac_shift_rows_2d(rows, off_rows)
    return jnp.transpose(out.reshape(N, R, C, L), (0, 1, 3, 2))


def _shift_planar(x: jax.Array, off: jax.Array, use_pallas: bool,
                  l_out: int) -> jax.Array:
    """Per-row fractional shift on planar data: x (N, C, R, L), off (N, R)
    → (N, C, R, l_out).  Channels share their row's offset; the shifted axis
    is already minor, so rows flatten with no transpose."""
    N, C, R, L = x.shape
    rows = x.reshape(N * C * R, L)
    off_rows = jnp.broadcast_to(off[:, None, :], (N, C, R)).reshape(-1)
    if use_pallas:
        from ic_gan_tpu.ops.pallas.row_shift import row_shift

        out = row_shift(rows, off_rows,
                        interpret=jax.default_backend() != "tpu",
                        l_out=l_out)
    else:
        out = _frac_shift_rows_2d(rows, off_rows, l_out)
    return out.reshape(N, C, R, l_out)


def _scale_rows_planar(x: jax.Array, alpha: jax.Array, r0: jax.Array,
                       l_out: int, compute_dtype=None) -> jax.Array:
    """Per-sample 1-D linear resample along the minor axis via an MXU
    matmul: out[lo] = x[α·lo + r0] (linear interp, zero outside).

    x: (N, C, R, L); alpha/r0: (N,).  Returns (N, C, R, l_out) in f32 (the
    downstream shift kernel is f32); the matmul runs in ``compute_dtype``
    (default: x.dtype, so bf16 pipes use the bf16 MXU path with f32
    accumulation).  Weights are built in f32 — positions need the mantissa.
    """
    N, C, R, L = x.shape
    lo = jnp.arange(l_out, dtype=jnp.float32)
    li = jnp.arange(L, dtype=jnp.float32)
    pos = alpha[:, None] * lo[None, :] + r0[:, None]          # (N, Lo)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos[:, :, None] - li[None, None, :]))
    cd = compute_dtype if compute_dtype is not None else x.dtype
    # Operand order keeps the dot output (N, C, R, Lo) with Lo minor — no
    # post-matmul relayout.
    return jnp.einsum("ncrl,nol->ncro", x.astype(cd), w.astype(cd),
                      preferred_element_type=jnp.float32)


def affine_warp(img: jax.Array, A: jax.Array, t: jax.Array,
                use_pallas: bool = None) -> jax.Array:
    """Warp ``img`` (N, H, W, C) by the per-sample inverse affine
    ``src_px = A @ dst_px + t`` (pixel coordinates), H == W required
    (ADA warps padded square images).  Output has the same shape.

    ``use_pallas`` selects the gather-free Pallas row-shift kernel for the
    shear passes (default: on when running on TPU).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    N, H, W, C = img.shape
    assert H == W, "fast_warp requires square images (ADA pads to square)"
    a, b = A[:, 0, 0], A[:, 0, 1]
    c, d = A[:, 1, 0], A[:, 1, 1]
    tx, ty = t[:, 0], t[:, 1]

    # Axis swap when the map is closer to a 90° rotation: sample the
    # transposed image with swapped A rows/cols.  Planar (N, C, x, y): the
    # shifted/resampled axis (y) is minor for pass 1.
    swap = jnp.abs(a) < jnp.abs(c)
    x_plain = jnp.transpose(img, (0, 3, 2, 1))   # (N, C, x, y)
    x_swapped = jnp.transpose(img, (0, 3, 1, 2))  # transposed image, planar
    x_sel = jnp.where(swap[:, None, None, None], x_swapped, x_plain)
    a_, b_ = jnp.where(swap, c, a), jnp.where(swap, d, b)
    c_, d_ = jnp.where(swap, a, c), jnp.where(swap, b, d)
    tx_, ty_ = jnp.where(swap, ty, tx), jnp.where(swap, tx, ty)

    eps = 1e-8
    a_safe = jnp.where(jnp.abs(a_) < eps, eps, a_)
    e = c_ / a_safe
    alpha = d_ - e * b_
    alpha_safe = jnp.where(jnp.abs(alpha) < eps, eps, alpha)
    zeta = ty_ - e * tx_

    L = H
    EXT = 2 * L  # extended intermediate window covering [-L/2, 3L/2)
    cd = img.dtype

    # ---- pass 1 (vertical): T[yt, x] = img[α·yt + ε·x + ζ, x] ----
    # Scale-matmul FIRST (it sees the whole source axis — no window loss even
    # for negative α / large offsets), then the per-column shear shift.
    # S[x, j] = img[α·(j − L/2) + ζ, x] over the extended window.
    S = _scale_rows_planar(x_sel, alpha, zeta - alpha * (L / 2.0), EXT, cd)
    xs = jnp.arange(W, dtype=jnp.float32)
    off1 = L / 2.0 + (e / alpha_safe)[:, None] * xs[None, :]  # (N, W)
    T = _shift_planar(S, off1, use_pallas, L)             # (N, C, x, yt)
    T = jnp.swapaxes(T, 2, 3)                             # (N, C, yt, x)

    # ---- pass 2 (horizontal): out[yo, xo] = T[yo, a·xo + b·yo + tx] ----
    U = _scale_rows_planar(T, a_, tx_ - a_ * (L / 2.0), EXT, cd)
    ys = jnp.arange(H, dtype=jnp.float32)
    off2 = L / 2.0 + (b_ / a_safe)[:, None] * ys[None, :]  # (N, H)
    out = _shift_planar(U, off2, use_pallas, L)           # (N, C, yo, xo)
    return jnp.transpose(out, (0, 2, 3, 1)).astype(img.dtype)
