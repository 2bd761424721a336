"""Device mesh and sharding layout.

The reference's only parallelism is single-process `nn.DataParallel`
replicate-scatter-gather (`GeneralModel/networks.py:88-91`, SURVEY.md §2.3).
The TPU-native design is one SPMD program over a `jax.sharding.Mesh`:

  * axis "data"  — batch data parallelism; XLA emits the gradient
    all-reduce over ICI (the DataParallel/NCCL replacement).
  * axis "space" — optional spatial sharding of the image height for
    full-resolution (512²) sampling; XLA SPMD inserts conv halo exchanges
    automatically. This is the CP/SP analogue for a vision model.

Multi-host extends the same program via `jax.distributed.initialize` — the
mesh simply spans all processes' devices; nothing else changes.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, space: int = 1,
              devices=None) -> Mesh:
    """Create a ("data", "space") mesh. Defaults to all devices on "data"."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data is None:
        data = n // space
    assert data * space == n, f"mesh {data}x{space} != {n} devices"
    return Mesh(devices.reshape(data, space), ("data", "space"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 4,
                   shape: tuple = None) -> NamedSharding:
    """Shard axis 0 (batch) over "data"; for 4-D NCHW images also shard H
    over "space" when that axis exists in the mesh. When `shape` is given,
    axes that don't divide evenly fall back to replication (e.g. tiny smoke
    batches on a big mesh) — SPMD stays correct, just redundant."""
    data_ok = shape is None or shape[0] % mesh.shape["data"] == 0
    space_ok = (
        ndim >= 3
        and mesh.shape["space"] > 1
        and (shape is None or shape[-2] % mesh.shape["space"] == 0)
    )
    batch_axis = "data" if data_ok else None
    if space_ok:
        spec = P(batch_axis, *([None] * (ndim - 3)), "space", None)
    else:
        spec = P(batch_axis)
    return NamedSharding(mesh, spec)


def shard_batch(mesh: Mesh, batch: dict) -> dict:
    """device_put a host batch dict with data(+space) sharding."""
    return {
        k: jax.device_put(v, batch_sharding(mesh, np.ndim(v), np.shape(v)))
        for k, v in batch.items()
    }


def spatial_constraint(x, mesh: Mesh):
    """Annotate an intermediate (B, ..., H, W) with data+space sharding so
    XLA keeps activations distributed through the conv stack."""
    return jax.lax.with_sharding_constraint(x, batch_sharding(mesh, x.ndim))


def initialize_multihost(coordinator_address=None, num_processes=None,
                         process_id=None):
    """Multi-host bring-up: after `jax.distributed.initialize` the global
    mesh spans every host's devices and the SAME pjit program runs —
    gradient all-reduce rides ICI within a slice and DCN across slices, all
    emitted by XLA (no NCCL/MPI layer to port; SURVEY.md §2.3). No-op when
    already initialized or single-process."""
    import jax.distributed as jdist

    try:
        jdist.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialized
    return jax.device_count(), jax.process_count()
