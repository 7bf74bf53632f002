"""Fused polyphase resample-conv rewrites vs their naive compositions.

``conv3x3_nearest_up``  ≡ conv3x3(upsample_nearest_2x(x)) (BigGAN GBlock)
``conv3x3_avg_pool_down`` ≡ avg_pool_2x(conv3x3(x))        (BigGAN DBlock)

Both must be exact up to float associativity, including all edge paddings,
and differentiate identically (they are plain XLA convs).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ic_gan_tpu.ops.resample import (
    avg_pool_2x,
    conv3x3_avg_pool_down,
    conv3x3_nearest_up,
    upsample_nearest_2x,
)


def _conv3x3(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@pytest.mark.parametrize("h,w_", [(4, 4), (7, 5), (16, 16)])
def test_nearest_up_conv_exact(h, w_):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, h, w_, 6).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 6, 5).astype(np.float32))
    ref = _conv3x3(upsample_nearest_2x(x), w)
    got = conv3x3_nearest_up(x, w)
    assert got.shape == ref.shape == (2, 2 * h, 2 * w_, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("h,w_", [(4, 4), (8, 6), (16, 16)])
def test_conv_avg_pool_exact(h, w_):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, h, w_, 6).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 6, 5).astype(np.float32))
    ref = avg_pool_2x(_conv3x3(x, w))
    got = conv3x3_avg_pool_down(x, w)
    assert got.shape == ref.shape == (2, h // 2, w_ // 2, 5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_gradients_match_naive():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 3, 4).astype(np.float32))

    def up_ref(x, w):
        return jnp.sum(jnp.sin(_conv3x3(upsample_nearest_2x(x), w)))

    def up_new(x, w):
        return jnp.sum(jnp.sin(conv3x3_nearest_up(x, w)))

    for arg in (0, 1):
        gr = jax.grad(up_ref, arg)(x, w)
        gn = jax.grad(up_new, arg)(x, w)
        np.testing.assert_allclose(
            np.asarray(gn), np.asarray(gr), atol=1e-4, rtol=1e-3
        )


# ---------------------------------------------------------------------------
# SG2 FIR-composite rewrites (ops/conv_resample.py): the dilated-conv→FIR
# chain and the FIR→strided-conv chain each collapse into composite-kernel
# convs.  Oracle = the uncomposed chain, built here explicitly.
# ---------------------------------------------------------------------------


def _sg2_up_chain_oracle(x, w, f, flip_weight):
    from ic_gan_tpu.ops.resample import upfirdn2d

    ww = w if flip_weight else jnp.flip(w, axis=(0, 1))
    y = jax.lax.conv_general_dilated(
        x, ww, (1, 1), ((3, 3), (3, 3)), lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    f2d = jnp.outer(f, f) if f.ndim == 1 else f
    return upfirdn2d(y, f2d, gain=4)


def _sg2_down_chain_oracle(x, w, f, px0, flip_weight):
    from ic_gan_tpu.ops.resample import upfirdn2d

    ww = w if flip_weight else jnp.flip(w, axis=(0, 1))
    f2d = jnp.outer(f, f) if f.ndim == 1 else f
    y = upfirdn2d(x, f2d, padding=px0)
    return jax.lax.conv_general_dilated(
        y, ww, (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize("flip", [True, False])
@pytest.mark.parametrize("shape", [(2, 8, 5, 7), (1, 16, 3, 4)])
def test_up2_polyphase_matches_chain(shape, flip):
    from ic_gan_tpu.ops.conv_resample import conv2d_resample
    from ic_gan_tpu.ops.resample import setup_filter

    N, H, Ci, Co = shape
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(N, H, H, Ci), np.float32)
    w = jnp.asarray(rng.randn(3, 3, Ci, Co), np.float32) * 0.1
    f = jnp.asarray(setup_filter(jnp.asarray([1, 3, 3, 1]), separable=True))
    ref = _sg2_up_chain_oracle(x, w, f, flip)
    got = conv2d_resample(x, w, f=f, up=2, padding=1, flip_weight=flip)
    assert got.shape == (N, 2 * H, 2 * H, Co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("k,pad", [(3, 1), (1, 0)])
def test_down2_composite_matches_chain(k, pad):
    from ic_gan_tpu.ops.conv_resample import conv2d_resample
    from ic_gan_tpu.ops.resample import setup_filter

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 16, 16, 5), np.float32)
    w = jnp.asarray(rng.randn(k, k, 5, 6), np.float32) * 0.1
    f = jnp.asarray(setup_filter(jnp.asarray([1, 3, 3, 1]), separable=True))
    px0 = k // 2 + 1  # conv pad + (fw-down+1)//2
    ref = _sg2_down_chain_oracle(x, w, f, px0, True)
    got = conv2d_resample(x, w, f=f, down=2, padding=pad, flip_weight=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_composite_paths_gradients():
    from ic_gan_tpu.ops.conv_resample import conv2d_resample
    from ic_gan_tpu.ops.resample import setup_filter

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 3), np.float32)
    w = jnp.asarray(rng.randn(3, 3, 3, 4), np.float32) * 0.1
    f = jnp.asarray(setup_filter(jnp.asarray([1, 3, 3, 1]), separable=True))

    def up_new(x, w):
        return jnp.sum(jnp.sin(conv2d_resample(x, w, f=f, up=2, padding=1,
                                               flip_weight=False)))

    def up_ref(x, w):
        return jnp.sum(jnp.sin(_sg2_up_chain_oracle(x, w, f, False)))

    for arg in (0, 1):
        gn = jax.grad(up_new, arg)(x, w)
        gr = jax.grad(up_ref, arg)(x, w)
        np.testing.assert_allclose(np.asarray(gn), np.asarray(gr),
                                   atol=1e-4, rtol=1e-3)


def test_asymmetric_filter_falls_back_exactly():
    """The fused fast paths build K = w ⊛ f (a convolution) while upfirdn2d
    correlates with f — equal only for symmetric filters.  An asymmetric
    4-tap filter must skip the fast path (``_is_symmetric_const`` gate) and
    still match the naive chain exactly."""
    from ic_gan_tpu.ops.conv_resample import conv2d_resample, _is_symmetric_const
    from ic_gan_tpu.ops.resample import setup_filter

    rng = np.random.RandomState(3)
    f = jnp.asarray(setup_filter(jnp.asarray([1.0, 2.0, 3.0, 4.0]),
                                 separable=True))
    assert not _is_symmetric_const(f)
    assert _is_symmetric_const(
        jnp.asarray(setup_filter(jnp.asarray([1, 3, 3, 1]), separable=True)))

    x = jnp.asarray(rng.randn(2, 8, 8, 5), np.float32)
    w = jnp.asarray(rng.randn(3, 3, 5, 6), np.float32) * 0.1
    got_up = conv2d_resample(x, w, f=f, up=2, padding=1, flip_weight=True)
    ref_up = _sg2_up_chain_oracle(x, w, f, True)
    np.testing.assert_allclose(np.asarray(got_up), np.asarray(ref_up),
                               atol=2e-5)

    got_dn = conv2d_resample(x, w, f=f, down=2, padding=1, flip_weight=True)
    ref_dn = _sg2_down_chain_oracle(x, w, f, 2, True)
    np.testing.assert_allclose(np.asarray(got_dn), np.asarray(ref_dn),
                               atol=2e-5)
