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


def distributed_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> bool:
    """Multi-host bootstrap — the TPU-native replacement for the reference's
    ``dist.init_process_group("nccl", tcp://master:40000)`` rendezvous
    (``BigGAN_PyTorch/trainer.py:84-101``,
    ``stylegan2_ada_pytorch/train.py:608-654``).

    With no arguments, ``jax.distributed.initialize`` auto-detects the
    cluster (SLURM/TPU-pod metadata); explicit args cover the
    locally-spawned multi-process case.  Returns True when running
    multi-process afterwards.  Safe to call twice (no-op if already up).
    """
    already = getattr(distributed_init, "_done", False)
    if not already:
        kwargs = {}
        if coordinator_address is not None:
            kwargs["coordinator_address"] = coordinator_address
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
        if local_device_ids is not None:
            kwargs["local_device_ids"] = local_device_ids
        jax.distributed.initialize(**kwargs)
        distributed_init._done = True
    return jax.process_count() > 1


def is_main_process() -> bool:
    """True on the process that owns checkpoint/log writes (the reference's
    ``rank == 0`` guards, ``trainer.py:520-541``)."""
    return jax.process_index() == 0


def local_batch_size(global_batch: int) -> int:
    """Per-host share of a global batch (the reference's rank-strided
    ``DistributedSampler`` partitioning, ``data_utils/utils.py:54-123``)."""
    n = jax.process_count()
    if global_batch % n != 0:
        raise ValueError(
            f"global batch {global_batch} not divisible by {n} processes"
        )
    return global_batch // n


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
    ``axis=1`` so each microbatch is split across the mesh.

    Single-process: a plain sharded ``device_put``.  Multi-process (pod):
    each host passes its LOCAL portion of the batch and the global array is
    assembled via ``jax.make_array_from_process_local_data`` — the
    per-host data feeding that replaces the reference's rank-strided
    samplers (SURVEY.md §2.3)."""
    sh = batch_sharding(mesh, axis)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(
                sh, np.ascontiguousarray(a)
            ),
            batch,
        )
    return jax.tree.map(lambda a: jax.device_put(a, sh), batch)
