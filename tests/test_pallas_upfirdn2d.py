"""Pallas fused upfirdn2d vs the XLA implementation (interpret mode on CPU).

The XLA implementation is itself oracle-tested against the reference's
pure-torch impl (test_upfirdn2d.py), so parity here closes the chain
reference → XLA → Pallas.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ic_gan_tpu.ops.resample import upfirdn2d as xla_upfirdn2d
from ic_gan_tpu.ops.pallas.upfirdn2d import upfirdn2d_fused


F = jnp.asarray([1.0, 3.0, 3.0, 1.0]) / 8.0


@pytest.mark.parametrize(
    "up,down,padding,H,C",
    [
        (1, 1, (1, 2, 1, 2), 16, 256),
        (2, 1, (2, 1, 2, 1), 32, 128),
        (2, 1, (2, 1, 2, 1), 16, 128),
        (1, 1, (2, 2, 2, 2), 24, 128),
    ],
)
def test_fused_matches_xla(up, down, padding, H, C):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, H, H, C).astype(np.float32))
    a = xla_upfirdn2d(x, F, up=up, down=down, padding=padding)
    b = upfirdn2d_fused(x, F, up=up, down=down, padding=padding, interpret=True)
    assert a.shape == b.shape
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fallback_on_unsupported_configs():
    rng = np.random.RandomState(1)
    # down=2 (strided slices unsupported) and non-lane-aligned channels must
    # fall back to XLA transparently.
    x = jnp.asarray(rng.randn(1, 16, 16, 48).astype(np.float32))
    a = xla_upfirdn2d(x, F, down=2, padding=1)
    b = upfirdn2d_fused(x, F, down=2, padding=1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    x2 = jnp.asarray(rng.randn(1, 16, 16, 128).astype(np.float32))
    a2 = xla_upfirdn2d(x2, F, down=2, padding=1)
    b2 = upfirdn2d_fused(x2, F, down=2, padding=1)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(b2), atol=1e-6)


def test_gain_and_flip():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 16, 16, 128).astype(np.float32))
    f = jnp.asarray(rng.rand(3).astype(np.float32))
    a = xla_upfirdn2d(x, f, up=2, padding=(1, 1, 1, 1), gain=4.0,
                      flip_filter=True)
    b = upfirdn2d_fused(x, f, up=2, padding=(1, 1, 1, 1), gain=4.0,
                        flip_filter=True, interpret=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
