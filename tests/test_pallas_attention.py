"""Fused Pallas SA-GAN attention vs the XLA oracle (softmax(θφᵀ)·g).

Runs the identical kernel in the Pallas interpreter on CPU.  Reference
semantics: ``BigGAN_PyTorch/layers.py:238-241`` (two bmm + unscaled softmax).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ic_gan_tpu.ops.pallas.attention import (
    _attention_xla,
    sagan_attention,
    supported,
)


def _data(N=2, Lq=256, Lk=128, d=8, dv=16, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    theta = jax.random.normal(ks[0], (N, Lq, d), dtype)
    phi = jax.random.normal(ks[1], (N, Lk, d), dtype)
    g = jax.random.normal(ks[2], (N, Lk, dv), dtype)
    return theta, phi, g


def test_forward_matches_xla_oracle_f32():
    theta, phi, g = _data()
    ref = _attention_xla(theta, phi, g)
    got = sagan_attention(theta, phi, g, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_forward_bf16_inputs():
    theta, phi, g = _data(dtype=jnp.bfloat16)
    ref = _attention_xla(theta, phi, g).astype(jnp.float32)
    got = sagan_attention(theta, phi, g, True).astype(jnp.float32)
    # bf16 storage, f32 softmax on both sides: only the p-cast differs.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-2)


def test_multitile_q_axis():
    # Lq > BQ exercises the q-grid dimension (BQ = min(512, Lq)).
    theta, phi, g = _data(N=1, Lq=1024, Lk=128, d=4, dv=8)
    ref = _attention_xla(theta, phi, g)
    got = sagan_attention(theta, phi, g, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_gradients_match_oracle():
    theta, phi, g = _data(N=1, Lq=128, Lk=128, d=4, dv=8)

    def loss(fn):
        return lambda t, p, v: jnp.sum(jnp.tanh(fn(t, p, v)))

    ref_grads = jax.grad(loss(_attention_xla), argnums=(0, 1, 2))(theta, phi, g)
    got_grads = jax.grad(
        loss(lambda t, p, v: sagan_attention(t, p, v, True)), argnums=(0, 1, 2)
    )(theta, phi, g)
    for r, got in zip(ref_grads, got_grads):
        np.testing.assert_allclose(np.asarray(got), np.asarray(r), atol=1e-4)


def test_gradients_multitile_q_accumulation():
    """Lq > BQ: dφ/dg accumulate across q-tiles in the revisited output
    block of the backward kernel — the reduction the single-tile test
    can't see."""
    theta, phi, g = _data(N=2, Lq=1024, Lk=128, d=4, dv=8)

    def loss(fn):
        return lambda t, p, v: jnp.sum(jnp.tanh(fn(t, p, v)))

    ref_grads = jax.grad(loss(_attention_xla), argnums=(0, 1, 2))(theta, phi, g)
    got_grads = jax.grad(
        loss(lambda t, p, v: sagan_attention(t, p, v, True)), argnums=(0, 1, 2)
    )(theta, phi, g)
    for r, got in zip(ref_grads, got_grads):
        np.testing.assert_allclose(np.asarray(got), np.asarray(r), atol=1e-4)


def test_gradients_bf16_production_dims():
    """bf16 grads at (scaled-down) production head dims d=24, dv=96."""
    theta, phi, g = _data(N=1, Lq=512, Lk=256, d=24, dv=96,
                          dtype=jnp.bfloat16)

    def loss(fn):
        return lambda t, p, v: jnp.sum(jnp.tanh(fn(t, p, v)))

    ref_grads = jax.grad(loss(_attention_xla), argnums=(0, 1, 2))(theta, phi, g)
    got_grads = jax.grad(
        loss(lambda t, p, v: sagan_attention(t, p, v, True)), argnums=(0, 1, 2)
    )(theta, phi, g)
    for r, got in zip(ref_grads, got_grads):
        # bf16 output quantization: one ulp is ~0.8% of magnitude.
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(r, np.float32),
            atol=5e-2, rtol=2e-2)


def test_supported_shapes():
    assert supported(4096, 1024)   # 256² model, attn @ 64
    assert supported(1024, 256)    # 64² model, attn @ 32
    assert not supported(100, 128)
    assert not supported(4096, 100)
