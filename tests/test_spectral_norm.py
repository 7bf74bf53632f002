import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ic_gan_tpu.ops.spectral_norm import power_iteration, spectral_normalize


def test_power_iteration_converges_to_top_sv():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(64, 32).astype(np.float32))
    u = jnp.asarray(rng.randn(1, 64).astype(np.float32))
    for _ in range(200):
        svs, u, _ = power_iteration(w, u)
    true_sv = np.linalg.svd(np.asarray(w), compute_uv=False)[0]
    assert np.allclose(float(svs[0]), true_sv, rtol=1e-4)


def test_normalized_weight_unit_norm_at_convergence():
    rng = np.random.RandomState(1)
    w = jnp.asarray(rng.randn(48, 16).astype(np.float32))
    u = jnp.asarray(rng.randn(1, 48).astype(np.float32))
    for _ in range(200):
        _, u, _ = power_iteration(w, u)
    w_bar, _, _ = spectral_normalize(w.T, u, update=False)  # trailing dim = out
    sv = np.linalg.svd(np.asarray(w_bar).T, compute_uv=False)[0]
    assert np.allclose(sv, 1.0, rtol=1e-4)


def test_no_update_keeps_state():
    rng = np.random.RandomState(2)
    w = jnp.asarray(rng.randn(8, 4, 16).astype(np.float32))  # e.g. (kh*kw, in, out)
    u = jnp.asarray(rng.randn(1, 16).astype(np.float32))
    _, u_frozen, _ = spectral_normalize(w, u, update=False)
    assert np.array_equal(np.asarray(u_frozen), np.asarray(u))
    _, u_updated, _ = spectral_normalize(w, u, update=True)
    assert not np.array_equal(np.asarray(u_updated), np.asarray(u))


def test_gradient_flows_through_sigma():
    # d/dW of (W / sigma(W)) must include the -W * dsigma/dW / sigma^2 term;
    # check against numerical gradient.
    rng = np.random.RandomState(3)
    w = jnp.asarray(rng.randn(6, 5).astype(np.float64))
    u = jnp.asarray(rng.randn(1, 5).astype(np.float64))
    # Converge u first so the state is a fixed point (numerical diff assumes
    # sigma is a smooth function of W at fixed u).
    for _ in range(300):
        _, u, _ = power_iteration(w.T, u)

    def f(wm):
        w_bar, _, _ = spectral_normalize(wm, u, update=False)
        return jnp.sum(jnp.sin(w_bar))

    g = jax.grad(f)(w)
    eps = 1e-3  # float32 central differences; tolerance set accordingly
    num = np.zeros_like(np.asarray(w))
    for i in range(w.shape[0]):
        for j in range(w.shape[1]):
            dp = np.asarray(w).copy()
            dm = np.asarray(w).copy()
            dp[i, j] += eps
            dm[i, j] -= eps
            num[i, j] = (float(f(jnp.asarray(dp))) - float(f(jnp.asarray(dm)))) / (
                2 * eps
            )
    assert np.allclose(np.asarray(g), num, atol=5e-3)


def test_multiple_svs_gram_schmidt():
    rng = np.random.RandomState(4)
    w = jnp.asarray(rng.randn(32, 24).astype(np.float32))
    u = jnp.asarray(rng.randn(2, 32).astype(np.float32))
    for _ in range(500):
        svs, u, _ = power_iteration(w, u)
    true = np.linalg.svd(np.asarray(w), compute_uv=False)[:2]
    assert np.allclose(np.asarray(svs), true, rtol=1e-3)
