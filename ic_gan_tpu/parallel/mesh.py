"""Mesh / sharding helpers — the TPU-native replacement for the reference's
distributed substrate (DDP/NCCL rendezvous, ``trainer.py:84-101``;
DataParallel, ``trainer.py:237-240``; samplers, ``data_utils/utils.py:54-123``).

One 1-D ``data`` axis covers everything the reference's data parallelism did:
gradient allreduce (psum inserted by XLA at the loss mean), cross-replica BN
(global batch moments), and metric reduction.  An optional ``model`` axis is
reserved for sharding the widest embeddings/attention at high resolution
(SURVEY.md §2.3 — not required for parity).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    batch_size: Optional[int] = None,
) -> Mesh:
    """Create a (data[, model]) mesh.

    When ``n_data`` is None it defaults to all devices; if ``batch_size`` is
    given, it is clamped to the largest device count that divides the batch
    (a microbatch smaller than the pod cannot shard further — extra devices
    stay idle rather than failing the sharding).
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
        if batch_size is not None:
            while n_data > 1 and batch_size % n_data != 0:
                n_data -= 1
    assert n_data * n_model <= len(devices), (n_data, n_model, len(devices))
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh, axis: int = 0) -> NamedSharding:
    """Shard an array's ``axis`` over the ``data`` mesh axis (batch split)."""
    spec = [None] * (axis + 1)
    spec[axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: int = 0):
    """Device-put a pytree of host arrays with the batch axis sharded over
    ``data``. For microbatch slabs (leading axis = accumulation index) pass
    ``axis=1`` so each microbatch is split across the mesh."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)
