import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ic_gan_tpu.eval.fid import (
    FeatureMoments,
    frechet_distance,
    inception_score,
    sqrtm_newton_schulz,
)
from ic_gan_tpu.eval.prdc import compute_prdc
from ic_gan_tpu.models.inception import InceptionV3
from ic_gan_tpu.models.resnet import ResNet50, preprocess


def test_sqrtm_newton_schulz():
    rng = np.random.RandomState(0)
    a = rng.randn(32, 32).astype(np.float32)
    spd = a @ a.T + 32 * np.eye(32, dtype=np.float32)
    root = np.asarray(sqrtm_newton_schulz(jnp.asarray(spd)))
    np.testing.assert_allclose(root @ root, spd, rtol=2e-3, atol=2e-2)


def test_frechet_distance_identity_and_shift():
    rng = np.random.RandomState(1)
    x = rng.randn(2000, 16)
    mu, sigma = x.mean(0), np.cov(x, rowvar=False)
    assert abs(frechet_distance(mu, sigma, mu, sigma)) < 1e-2
    d = frechet_distance(mu + 2.0, sigma, mu, sigma)
    assert abs(d - 4.0 * 16) < 1.0  # |Δmu|² = 4·dim


def test_feature_moments_match_numpy():
    rng = np.random.RandomState(2)
    x = rng.randn(500, 8)
    fm = FeatureMoments(8)
    for lo in range(0, 500, 100):
        fm.update(x[lo : lo + 100])
    np.testing.assert_allclose(fm.mean, x.mean(0), atol=1e-10)
    np.testing.assert_allclose(fm.cov, np.cov(x, rowvar=False), atol=1e-10)


def test_inception_score_uniform_vs_peaked():
    n, c = 1000, 10
    uniform = np.full((n, c), 1.0 / c)
    is_u, _ = inception_score(uniform, from_logits=False)
    assert abs(is_u - 1.0) < 1e-3
    peaked = np.eye(c)[np.arange(n) % c] * 0.999 + 0.0001
    is_p, _ = inception_score(peaked / peaked.sum(1, keepdims=True),
                              from_logits=False)
    assert is_p > 5.0


def test_prdc_identical_distributions():
    rng = np.random.RandomState(3)
    real = rng.randn(256, 8).astype(np.float32)
    out = compute_prdc(real, real + rng.randn(256, 8).astype(np.float32) * 0.01)
    assert out["precision"] > 0.9
    assert out["recall"] > 0.9
    assert out["coverage"] > 0.9
    far = compute_prdc(real, real + 100.0)
    assert far["precision"] < 0.05 and far["coverage"] < 0.05


def test_inception_v3_shapes():
    net = InceptionV3()
    x = jnp.zeros((2, 75, 75, 3))
    variables = net.init(jax.random.PRNGKey(0), x)
    pool, logits = net.apply(variables, x)
    assert pool.shape == (2, 2048)
    assert logits.shape == (2, 1000)


def test_resnet50_shapes():
    net = ResNet50()
    x = preprocess(jnp.zeros((2, 64, 64, 3)) * 0.5 + 0.5, size=64)
    variables = net.init(jax.random.PRNGKey(0), x)
    pooled, conv = net.apply(variables, x)
    assert pooled.shape == (2, 2048)
    assert conv.shape[-1] == 2048
    clf = ResNet50(classifier=True, num_classes=7)
    variables = clf.init(jax.random.PRNGKey(0), x)
    logits, _ = clf.apply(variables, x)
    assert logits.shape == (2, 7)


def test_evaluate_generator_self_fid_near_zero():
    # Random-weight evaluator: FID of a distribution against itself ≈ 0,
    # against a shifted one > 0 (pipeline self-consistency without
    # pretrained weights).
    from ic_gan_tpu.eval.pipeline import InceptionEvaluator, evaluate_generator

    ev = InceptionEvaluator(batch=16)
    rng = np.random.RandomState(0)

    def sample(b):
        return rng.rand(b, 32, 32, 3).astype(np.float32) * 2 - 1, None

    pools, logits = [], []
    for _ in range(8):
        p, l = ev(jnp.asarray(sample(16)[0]))
        pools.append(p)
    pool = np.concatenate(pools)
    mu, sigma = pool.mean(0), np.cov(pool, rowvar=False)

    out = evaluate_generator(sample, ev, mu, sigma, num_images=128, batch=16)
    assert np.isfinite(out["FID"])
    assert out["FID"] < 60.0  # same distribution, small-sample noise only
    assert out["IS_mean"] > 0.0


def test_resize_align_corners_matches_torch():
    """resize_bilinear_align_corners == F.interpolate(align_corners=True)
    (the grid the reference WrapInception uses, inception_utils.py:59)."""
    import torch
    import torch.nn.functional as F

    from ic_gan_tpu.models.inception import resize_bilinear_align_corners

    rng = np.random.RandomState(3)
    for in_hw, out_hw in [((64, 64), (299, 299)), ((128, 96), (299, 299)),
                          ((300, 300), (299, 299)), ((17, 33), (8, 50))]:
        x = rng.randn(2, *in_hw, 3).astype(np.float32)
        want = F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
            mode="bilinear", align_corners=True,
        ).permute(0, 2, 3, 1).numpy()
        got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), *out_hw))
        np.testing.assert_allclose(got, want, atol=2e-5)
