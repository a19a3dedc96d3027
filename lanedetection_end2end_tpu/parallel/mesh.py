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


def make_mesh_2d(num_slices: int, devices_per_slice: int = 0,
                 devices=None) -> Mesh:
    """Two-level data-parallel mesh: axis "dcn" ACROSS slices (the slow
    data-center network), axis "data" WITHIN a slice (ICI).

    Still pure DP — batches shard over BOTH axes jointly
    (`batch_sharding` -> P(("dcn", "data"))) — but the mesh shape tells XLA
    the interconnect hierarchy, so the gradient all-reduce decomposes into
    a fat intra-slice phase riding ICI and one small cross-slice phase on
    DCN (the scaling-book two-level recipe; SURVEY.md §2.3). Device order
    must place each slice's chips contiguously, which is how multi-slice
    runtimes enumerate `jax.devices()`.
    """
    devices = list(devices if devices is not None else jax.devices())
    per = devices_per_slice or len(devices) // num_slices
    if num_slices * per > len(devices):
        raise ValueError(
            f"mesh {num_slices}x{per} needs {num_slices * per} devices, "
            f"have {len(devices)}")
    arr = np.array(devices[:num_slices * per]).reshape(num_slices, per)
    return Mesh(arr, ("dcn", "data"))


def data_axes(mesh: Mesh) -> tuple:
    """All mesh axis names — the batch axis shards over the full mesh."""
    return tuple(mesh.axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split across ALL mesh axes (1-D: P("data");
    2-level: P(("dcn", "data")))."""
    return NamedSharding(mesh, P(data_axes(mesh)))


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
