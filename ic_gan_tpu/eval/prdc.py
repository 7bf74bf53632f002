"""PRDC — precision / recall / density / coverage.

Reference: ``data_utils/compute_pdrc.py:64-112`` (sklearn pairwise distances
on CPU).  TPU rewrite: the pairwise distance matrix is a single
``‖a‖² + ‖b‖² − 2ab`` matmul on the MXU, and the k-NN radius is
``-top_k(-d)``; both jitted, batched over the real/fake feature banks.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def pairwise_sq_dists(a: jax.Array, b: jax.Array) -> jax.Array:
    """Squared L2 distances, shape (len(a), len(b))."""
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=1, keepdims=True)
    d = a2 + b2.T - 2.0 * (a @ b.T)
    return jnp.maximum(d, 0.0)


@functools.partial(jax.jit, static_argnames=("k",))
def knn_radii(feats: jax.Array, k: int) -> jax.Array:
    """Distance to the k-th nearest neighbour of each point within ``feats``
    (excluding self — hence k+1 smallest, ref ``compute_pdrc.py:77-83``)."""
    d = jnp.sqrt(pairwise_sq_dists(feats, feats))
    neg_topk, _ = jax.lax.top_k(-d, k + 1)
    return -neg_topk[:, -1]


def compute_prdc(real: np.ndarray, fake: np.ndarray, nearest_k: int = 5) -> Dict[str, float]:
    """Precision/recall/density/coverage (Naeem et al. 2020; ref
    ``compute_pdrc.py:64-112``)."""
    real = jnp.asarray(real, jnp.float32)
    fake = jnp.asarray(fake, jnp.float32)
    r_rad = knn_radii(real, nearest_k)  # (Nr,)
    f_rad = knn_radii(fake, nearest_k)  # (Nf,)
    d_rf = jnp.sqrt(pairwise_sq_dists(real, fake))  # (Nr, Nf)

    precision = float(jnp.mean(jnp.any(d_rf < r_rad[:, None], axis=0)))
    recall = float(jnp.mean(jnp.any(d_rf < f_rad[None, :], axis=1)))
    density = float(
        jnp.mean(jnp.sum(d_rf < r_rad[:, None], axis=0)) / nearest_k
    )
    coverage = float(jnp.mean(jnp.min(d_rf, axis=1) < r_rad))
    return {
        "precision": precision,
        "recall": recall,
        "density": density,
        "coverage": coverage,
    }
