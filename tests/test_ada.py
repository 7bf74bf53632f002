"""ADA pipeline parity vs the reference AugmentPipe.

Uses the reference's own deterministic hook (``debug_percentile``) so every
random draw is pinned to its percentile value in both implementations
(``augment.py:402-405``); noise is excluded from exact comparison (the
additive noise field itself is random) and covered statistically.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/reference/stylegan2_ada_pytorch")

import jax
import jax.numpy as jnp

from ic_gan_tpu.data.ada import AugmentPipe


def _ref_pipe(**kw):
    from training.augment import AugmentPipe as RefPipe

    return RefPipe(**kw)


def run_both(spec_kwargs, dp, n=2, res=32, p=1.0, seed=0):
    rng = np.random.RandomState(seed)
    x = (rng.rand(n, 3, res, res).astype(np.float32) * 2 - 1) * 0.7

    ref = _ref_pipe(**spec_kwargs)
    with torch.no_grad():
        ref.p.copy_(torch.as_tensor(float(p)))
        ref_out = ref(torch.from_numpy(x), debug_percentile=dp).numpy()

    ours_pipe = AugmentPipe(**spec_kwargs)
    ours = ours_pipe(
        jax.random.PRNGKey(0),
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        p,
        debug_percentile=dp,
    )
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    return ours, ref_out


def test_blit_parity():
    # dp=0.5: x-flip on, 180° rotation, zero integer translation.
    ours, ref = run_both(dict(xflip=1, rotate90=1, xint=1), dp=0.5)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=2e-3)


def test_geom_parity_mild_transform():
    ours, ref = run_both(dict(scale=1, rotate=1, aniso=1, xfrac=1), dp=0.6)
    np.testing.assert_allclose(ours, ref, atol=5e-3)


def test_color_parity():
    ours, ref = run_both(
        dict(brightness=1, contrast=1, lumaflip=1, hue=1, saturation=1), dp=0.7
    )
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_imgfilter_parity():
    ours, ref = run_both(dict(imgfilter=1), dp=0.7)
    np.testing.assert_allclose(ours, ref, atol=1e-3)


def test_cutout_parity():
    ours, ref = run_both(dict(cutout=1), dp=0.3)
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_noise_statistical():
    pipe = AugmentPipe(noise=1, noise_std=0.5)
    x = jnp.zeros((4, 32, 32, 3))
    out = pipe(jax.random.PRNGKey(0), x, 1.0)
    assert float(jnp.std(out)) > 0.05  # noise was added
    out0 = pipe(jax.random.PRNGKey(0), x, 0.0)
    assert float(jnp.std(out0)) == 0.0  # gated off at p=0


def test_p_zero_is_near_identity():
    # All gates closed at p=0 — geometric path still resamples through the
    # wavelet up/down pair, which is near-perfect-reconstruction.
    pipe = AugmentPipe.from_spec("bgc")
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.rand(2, 32, 32, 3).astype(np.float32) * 2 - 1)
    out = pipe(jax.random.PRNGKey(0), x, 0.0)
    assert np.abs(np.asarray(out) - np.asarray(x)).mean() < 5e-3


def test_differentiable_through_pipe():
    pipe = AugmentPipe.from_spec("bgc")

    def loss(x):
        return jnp.sum(jnp.square(pipe(jax.random.PRNGKey(0), x, 0.5)))

    g = jax.grad(loss)(jnp.ones((2, 16, 16, 3)) * 0.3)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0.0
