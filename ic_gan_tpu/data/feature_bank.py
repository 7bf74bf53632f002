"""Instance-feature bank: on-TPU exact k-NN and k-means (faiss replacement).

Reference uses GPU faiss for both: ``IndexFlatL2`` exact k-NN over N×2048
features (``data_utils/datasets_common.py:695-745``) and ``faiss.Kmeans``
with 100 Lloyd iterations for the 1000-instance selection
(``data_utils/store_kmeans_indexes.py:15-133``).

TPU design: both are brute-force distance matmuls — exactly what the MXU is
for.  k-NN streams query blocks against the (optionally sharded) bank with
``lax.top_k``; k-means is jitted Lloyd iterations (assign = argmin over a
distance matmul, update = segment-sum).  Everything is exact, like faiss's
flat index.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("k",))
def _knn_block(queries: jax.Array, bank: jax.Array, k: int):
    """Exact k nearest neighbours of ``queries`` within ``bank`` (squared L2,
    like IndexFlatL2). Returns (distances², indices), each (Q, k)."""
    q2 = jnp.sum(queries * queries, axis=1, keepdims=True)
    b2 = jnp.sum(bank * bank, axis=1)
    d = q2 + b2[None, :] - 2.0 * jnp.dot(
        queries, bank.T, preferred_element_type=jnp.float32
    )
    neg_d, idx = jax.lax.top_k(-d, k)
    return jnp.maximum(-neg_d, 0.0), idx


def knn(
    feats: np.ndarray,
    k: int = 50,
    queries: Optional[np.ndarray] = None,
    block: int = 4096,
) -> Tuple[np.ndarray, np.ndarray]:
    """k-NN table for the whole bank (ref ``_obtain_nns`` — note the reference
    includes each point itself as its first neighbour, k_nn+1 search with the
    full list kept, ``datasets_common.py:719-738``).

    Returns (neighbour_indices (N, k), radii (N,)) where ``radii`` is the
    distance to the k-th neighbour (ref ``make_hdf5_nns.py`` stores
    ``sample_nns_radius``).
    """
    bank = jnp.asarray(feats, jnp.float32)
    qs = bank if queries is None else jnp.asarray(queries, jnp.float32)
    n = qs.shape[0]
    all_idx = np.empty((n, k), np.int64)
    all_d = np.empty((n, k), np.float32)
    for lo in range(0, n, block):
        hi = min(lo + block, n)
        d, idx = _knn_block(qs[lo:hi], bank, k)
        all_idx[lo:hi] = np.asarray(idx)
        all_d[lo:hi] = np.asarray(d)
    radii = np.sqrt(all_d[:, -1])
    return all_idx, radii


@functools.partial(jax.jit, static_argnames=("num_clusters",))
def _lloyd_step(feats: jax.Array, centroids: jax.Array, num_clusters: int):
    f2 = jnp.sum(feats * feats, axis=1, keepdims=True)
    c2 = jnp.sum(centroids * centroids, axis=1)
    d = f2 + c2[None, :] - 2.0 * jnp.dot(
        feats, centroids.T, preferred_element_type=jnp.float32
    )
    assign = jnp.argmin(d, axis=1)
    sums = jax.ops.segment_sum(feats, assign, num_segments=num_clusters)
    counts = jax.ops.segment_sum(
        jnp.ones((feats.shape[0],), feats.dtype), assign, num_segments=num_clusters
    )
    new_centroids = jnp.where(
        counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], centroids
    )
    return new_centroids, assign


def kmeans(
    feats: np.ndarray,
    num_clusters: int = 1000,
    num_iters: int = 100,
    seed: int = 0,
    normalize: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Lloyd k-means (faiss ``Kmeans(niter=100)`` equivalent,
    ``store_kmeans_indexes.py:47-62``).  Features are L2-normalized first,
    as the reference does (``store_kmeans_indexes.py:47-50``).

    Returns (centroids (K, D), assignments (N,)).
    """
    f = np.asarray(feats, np.float32)
    if normalize:
        f = f / np.maximum(np.linalg.norm(f, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    init_idx = rng.choice(f.shape[0], num_clusters, replace=False)
    centroids = jnp.asarray(f[init_idx])
    fj = jnp.asarray(f)
    assign = None
    for _ in range(num_iters):
        centroids, assign = _lloyd_step(fj, centroids, num_clusters)
    return np.asarray(centroids), np.asarray(assign)


def closest_real_to_centroids(
    feats: np.ndarray, centroids: np.ndarray, normalize: bool = True
) -> np.ndarray:
    """Index of the closest real sample to each centroid (ref
    ``store_kmeans_indexes.py:63-79`` — the released 1000-instance
    conditioning sets are built this way)."""
    f = np.asarray(feats, np.float32)
    if normalize:
        f = f / np.maximum(np.linalg.norm(f, axis=1, keepdims=True), 1e-12)
    _, idx = _knn_block(jnp.asarray(centroids), jnp.asarray(f), 1)
    return np.asarray(idx[:, 0])
