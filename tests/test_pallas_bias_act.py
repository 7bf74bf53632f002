import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ic_gan_tpu.ops.bias_act import bias_act
from ic_gan_tpu.ops.pallas.bias_act import bias_act_fused


@pytest.mark.parametrize("act,gain,clamp", [
    ("linear", None, None),
    ("relu", None, None),
    ("lrelu", None, 256.0),
    ("tanh", 2.0, None),
])
def test_fused_matches_xla(act, gain, clamp):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 8, 8, 128).astype(np.float32))
    b = jnp.asarray(rng.randn(128).astype(np.float32))
    a = bias_act(x, b, act=act, gain=gain, clamp=clamp)
    f = bias_act_fused(x, b, act, gain, clamp)
    np.testing.assert_allclose(np.asarray(f), np.asarray(a), atol=1e-6)


def test_fused_no_bias_and_fallback():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 128).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(bias_act_fused(x, None, "relu", None, None)),
        np.asarray(bias_act(x, None, act="relu")), atol=1e-6,
    )
    # Non-lane-aligned channels fall back to XLA transparently.
    x2 = jnp.asarray(rng.randn(2, 4, 4, 48).astype(np.float32))
    b2 = jnp.asarray(rng.randn(48).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(bias_act_fused(x2, b2, "lrelu", None, None)),
        np.asarray(bias_act(x2, b2, act="lrelu")), atol=1e-6,
    )


def test_fused_grad_and_second_order():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 8, 8, 128).astype(np.float32))
    b = jnp.asarray(rng.randn(128).astype(np.float32))

    def f_fused(x, b):
        return jnp.sum(jnp.square(bias_act_fused(x, b, "lrelu", None, None)))

    def f_ref(x, b):
        return jnp.sum(jnp.square(bias_act(x, b, act="lrelu")))

    gf = jax.grad(f_fused)(x, b)
    gr = jax.grad(f_ref)(x, b)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-5)

    # Second-order (R1-style): grad of grad-norm.
    def gn_fused(x):
        g = jax.grad(f_fused)(x, b)
        return jnp.sum(jnp.square(g))

    def gn_ref(x):
        g = jax.grad(f_ref)(x, b)
        return jnp.sum(jnp.square(g))

    np.testing.assert_allclose(
        np.asarray(jax.grad(gn_fused)(x)), np.asarray(jax.grad(gn_ref)(x)),
        atol=1e-4,
    )
