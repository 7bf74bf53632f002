"""Two-pass affine warp vs the exact gather grid-sample."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ic_gan_tpu.data.ada import grid_sample_bilinear
from ic_gan_tpu.data.fast_warp import affine_warp


def reference_warp(img, A, t):
    N, H, W, C = img.shape
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)
    dst = jnp.stack([gx, gy], -1)
    src = jnp.einsum("nij,hwj->nhwi", A, dst) + t[:, None, None, :]
    gxn = (2.0 * src[..., 0] + 1.0) / W - 1.0
    gyn = (2.0 * src[..., 1] + 1.0) / H - 1.0
    return grid_sample_bilinear(img, jnp.stack([gxn, gyn], -1))


def make_affine(theta, sx, sy, tx, ty):
    A = np.array(
        [[sx * np.cos(theta), -sx * np.sin(theta)],
         [sy * np.sin(theta), sy * np.cos(theta)]], np.float32,
    )
    return A, np.array([tx, ty], np.float32)


def run(A0, t0, img):
    N = img.shape[0]
    A = jnp.broadcast_to(jnp.asarray(A0), (N, 2, 2))
    t = jnp.broadcast_to(jnp.asarray(t0), (N, 2))
    return np.asarray(reference_warp(img, A, t)), np.asarray(
        affine_warp(img, A, t)
    )


@pytest.fixture(scope="module")
def img():
    # Band-limited content: the interpolation-scheme difference vanishes to
    # second order on smooth images (ADA applies the warp on the 2×
    # wavelet-upsampled image, which is band-limited the same way).
    import scipy.ndimage as ndi

    rng = np.random.RandomState(0)
    x = rng.randn(2, 48, 48, 3).astype(np.float32)
    x = np.stack([ndi.gaussian_filter(im, (2, 2, 0)) for im in x])
    return jnp.asarray(x)


@pytest.mark.parametrize("case", [
    ("identity", (0, 1, 1, 0, 0)),
    ("int_translate", (0, 1, 1, 5, -3)),
    ("frac_translate", (0, 1, 1, 2.5, -3.25)),
    ("pure_scale", (0, 1.3, 0.8, 0, 0)),
    ("transpose_like", (np.pi / 2, 1, 1, 47, 0)),
])
def test_exact_cases(case, img):
    name, params = case
    ref, fast = run(*make_affine(*params), img)
    np.testing.assert_allclose(fast, ref, atol=2e-4, err_msg=name)


@pytest.mark.parametrize("case", [
    ("small_rot", (0.2, 1, 1, 0, 0)),
    ("rot_scale", (0.7, 1.2, 0.9, 3, -2)),
])
def test_rotation_cases_close(case, img):
    # Different interpolation composition: interior agreement to ~1% mean.
    name, params = case
    ref, fast = run(*make_affine(*params), img)
    interior = np.abs(ref - fast)[:, 8:-8, 8:-8]
    assert interior.mean() < 0.02, (name, interior.mean())


def test_per_sample_mixed_transforms(img):
    # Different affine per sample, incl. one needing the axis swap.
    A = jnp.stack([
        jnp.asarray(make_affine(0.1, 1.1, 0.9, 1, 2)[0]),
        jnp.asarray(make_affine(np.pi / 2 - 0.1, 1, 1, 30, 5)[0]),
    ])
    t = jnp.asarray([[1.0, 2.0], [30.0, 5.0]])
    ref = np.asarray(reference_warp(img, A, t))
    fast = np.asarray(affine_warp(img, A, t))
    d = np.abs(ref - fast)[:, 8:-8, 8:-8]
    assert d.mean() < 0.03
