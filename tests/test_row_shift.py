"""Pallas fractional row-shift kernel vs the XLA oracle
(fast_warp._frac_shift_rows) — the ADA warp's gather replacement.
Runs in the Pallas interpreter on CPU (same kernel code as TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ic_gan_tpu.data.fast_warp import _frac_shift_rows
from ic_gan_tpu.ops.pallas.row_shift import frac_shift_rows, row_shift


def _data(N=2, R=5, L=40, C=3, scale=90.0, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(N, R, L, C).astype(np.float32)
    off = (rng.rand(N, R).astype(np.float32) - 0.5) * scale
    return jnp.asarray(x), jnp.asarray(off)


def test_forward_matches_xla_oracle():
    x, off = _data()
    ref = _frac_shift_rows(x, off)
    got = frac_shift_rows(x, off, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_integer_shifts_exact():
    x, _ = _data()
    off = jnp.asarray(np.array([[-3, 0, 5, 39, -40], [1, 2, -1, 0, 7]], np.float32))
    ref = _frac_shift_rows(x, off)
    got = frac_shift_rows(x, off, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_out_of_frame_rows_zero():
    x, _ = _data(L=16)
    off = jnp.full((2, 5), 1000.0)
    got = frac_shift_rows(x, off, interpret=True)
    assert float(jnp.abs(got).max()) == 0.0


def test_gradients_to_second_order():
    x, off = _data(L=24)

    def loss(fn):
        return lambda x_: jnp.sum(jnp.sin(fn(x_, off)))

    f_ref = loss(lambda a, o: _frac_shift_rows(a, o))
    f_new = loss(lambda a, o: frac_shift_rows(a, o, interpret=True))
    g_ref, g_new = jax.grad(f_ref)(x), jax.grad(f_new)(x)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), atol=1e-6)
    h_ref = jax.grad(lambda a: jnp.sum(jax.grad(f_ref)(a) ** 2))(x)
    h_new = jax.grad(lambda a: jnp.sum(jax.grad(f_new)(a) ** 2))(x)
    np.testing.assert_allclose(np.asarray(h_new), np.asarray(h_ref), atol=1e-5)


def test_row_shift_2d_contract():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(7, 33).astype(np.float32))
    off = jnp.asarray((rng.rand(7).astype(np.float32) - 0.5) * 20)
    got = np.asarray(row_shift(x, off, True))
    k = np.floor(np.asarray(off)).astype(int)
    f = np.asarray(off) - k
    xp = np.pad(np.asarray(x), ((0, 0), (40, 40)))
    want = np.stack([
        xp[b, 40 + k[b] : 40 + k[b] + 33] * (1 - f[b])
        + xp[b, 41 + k[b] : 41 + k[b] + 33] * f[b]
        for b in range(7)
    ])
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fast_geom_close_to_exact_pipe():
    """Triple-lerp warp vs exact bilinear on the full pipe: second-order
    interpolation error only (mean ~0.1%)."""
    from scipy.ndimage import gaussian_filter

    from ic_gan_tpu.data.ada import AugmentPipe

    rng = np.random.RandomState(2)
    x = gaussian_filter(
        rng.randn(2, 32, 32, 3), sigma=(0, 2, 2, 0)
    ).astype(np.float32)
    for dp in (0.3, 0.65):
        oe = AugmentPipe.from_spec("bg", geom_impl="exact")(
            jax.random.PRNGKey(0), jnp.asarray(x), 0.9, debug_percentile=dp
        )
        of = AugmentPipe.from_spec("bg", geom_impl="fast")(
            jax.random.PRNGKey(0), jnp.asarray(x), 0.9, debug_percentile=dp
        )
        err = np.abs(np.asarray(oe) - np.asarray(of))
        assert err.mean() < 5e-3 and err.max() < 5e-2, (dp, err.max())


def test_bf16_input_supported():
    """Sub-word inputs compute through the f32 kernel and come back in the
    input dtype (Mosaic's dynamic_rotate is 32-bit-only — the kernel casts
    around it, so bf16 ADA pipes don't crash the TPU compiler)."""
    x, off = _data(L=32)
    ref = frac_shift_rows(x, off, interpret=True)
    got = frac_shift_rows(x.astype(jnp.bfloat16), off, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref), atol=2e-2, rtol=2e-2
    )


def test_l_out_crop_matches_full_shift():
    """Rectangular kernel (l_out < L): equals the full shift cropped to
    [:l_out] — the ADA warp keeps L of its 2L scale window inside the
    kernel instead of writing the full width and slicing."""
    rng = np.random.RandomState(3)
    B, L, l_out = 9, 64, 24
    x = jnp.asarray(rng.randn(B, L).astype(np.float32))
    off = jnp.asarray((rng.rand(B).astype(np.float32) - 0.5) * 150)
    full = row_shift(x, off, True)
    crop = row_shift(x, off, True, l_out=l_out)
    np.testing.assert_allclose(
        np.asarray(crop), np.asarray(full)[:, :l_out], atol=1e-6
    )
    # And l_out > L (the adjoint's geometry): against the dense oracle.
    wide = row_shift(x, off, True, l_out=L + 40)
    k = np.floor(np.asarray(off)).astype(int)
    f = np.asarray(off) - k
    xp = np.pad(np.asarray(x), ((0, 0), (2 * L + 64, 2 * L + 64)))
    base = 2 * L + 64
    want = np.stack([
        (xp[b, base + k[b] : base + k[b] + L + 40] * (1 - f[b])
         + xp[b, base + k[b] + 1 : base + k[b] + 41 + L] * f[b])
        if abs(k[b]) <= L + 40 else np.zeros(L + 40)
        for b in range(B)
    ])
    # Rows whose shift k > L (reads fully right of the frame) are zero both
    # ways; k < -(L+40) likewise.
    want[(k > L) | (k < -(L + 40))] = 0.0
    np.testing.assert_allclose(np.asarray(wide), want, atol=1e-6)


def test_l_out_adjoint_is_transpose():
    """grad through the cropped shift == multiplying by the transpose of the
    dense (l_out × L) interpolation matrix (the linear_call adjoint swaps
    the rectangle's sides)."""
    rng = np.random.RandomState(4)
    B, L, l_out = 4, 40, 16
    x = jnp.asarray(rng.randn(B, L).astype(np.float32))
    off = jnp.asarray((rng.rand(B).astype(np.float32) - 0.5) * 90)
    ct = jnp.asarray(rng.randn(B, l_out).astype(np.float32))

    # Dense matrix of the forward map, column by column.
    eye = np.eye(L, dtype=np.float32)
    M = np.stack([
        np.asarray(row_shift(jnp.broadcast_to(eye[i], (B, L)), off, True,
                             l_out=l_out))
        for i in range(L)
    ], axis=-1)  # (B, l_out, L)
    want = np.einsum("bol,bo->bl", M, np.asarray(ct))
    _, vjp = jax.vjp(lambda a: row_shift(a, off, True, l_out=l_out), x)
    got = np.asarray(vjp(ct)[0])
    np.testing.assert_allclose(got, want, atol=1e-5)
    # Second order: grad-of-grad stays consistent with the XLA oracle.
    def loss(fn):
        return lambda a: jnp.sum(jnp.sin(fn(a)))
    from ic_gan_tpu.data.fast_warp import _frac_shift_rows_2d
    f_ref = loss(lambda a: _frac_shift_rows_2d(a, off, l_out))
    f_new = loss(lambda a: row_shift(a, off, True, l_out=l_out))
    h_ref = jax.grad(lambda a: jnp.sum(jax.grad(f_ref)(a) ** 2))(x)
    h_new = jax.grad(lambda a: jnp.sum(jax.grad(f_new)(a) ** 2))(x)
    np.testing.assert_allclose(np.asarray(h_new), np.asarray(h_ref),
                               atol=1e-5)
