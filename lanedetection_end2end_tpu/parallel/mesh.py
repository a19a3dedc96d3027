"""Device mesh and sharding layer — the framework's parallelism substrate.

The reference is single-process single-GPU (SURVEY.md §2.3: no
torch.distributed / NCCL / MPI anywhere); the model is ~2.4M parameters, so
the idiomatic TPU mapping is pure DATA parallelism over the ICI domain:

- a 1-D ``Mesh`` over all local devices with axis ``"data"``,
- batches sharded ``P("data")`` (each chip gets batch/N images),
- parameters/optimizer state replicated ``P()``,
- the gradient all-reduce emitted automatically by XLA/GSPMD when the jitted
  train step reduces over the sharded batch axis — no hand-written
  collectives in user code (collectives ride ICI within a slice).

BatchNorm statistics therefore reduce over the GLOBAL batch (GSPMD turns the
batch-axis mean into a cross-replica psum) — sync-BN semantics, strictly
stronger than the reference's single-device BN.

Multi-host: `make_mesh` uses `jax.devices()`, which spans processes under
multi-host runtimes. Per-host input sharding: every process computes the
identical epoch permutation and decodes only its `batch/process_count` rows
(`data/loader.py Loader._local_slice`); `DevicePrefetcher._put` assembles the
global array from the process-local shards via
`jax.make_array_from_process_local_data`, so no host ever materializes the
full global batch. Tested by simulating per-process loaders on the 8-device
CPU mesh (tests/test_data.py::test_loader_multihost_sharding).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices (0 = all)."""
    devices = list(devices if devices is not None else jax.devices())
    if num_devices:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split across the mesh's data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Optional[Mesh]):
    """Place a host batch dict onto the mesh, sharded along axis 0."""
    if mesh is None:
        return jax.device_put(batch)
    return jax.device_put(batch, batch_sharding(mesh))


def replicate(tree, mesh: Optional[Mesh]):
    """Replicate a pytree (params / optimizer state) across the mesh."""
    if mesh is None:
        return jax.device_put(tree)
    return jax.device_put(tree, replicated_sharding(mesh))
