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
