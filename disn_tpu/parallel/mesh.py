"""Device mesh + sharding layout for DISN workloads.

The reference is strictly single-GPU (SURVEY.md §2.9); scale-out here is
native: one 2D logical mesh ``(data, points)`` covers every config —

* training: batch sharded on ``data`` (pure data parallelism; XLA inserts the
  gradient psum over ICI), params replicated;
* dense-grid inference: the query-point axis sharded on ``points`` (the
  workload's "long axis", up to 16.8M points at res 256 — SURVEY.md §5.7),
  image features replicated so no collectives are needed until the grid slabs
  are gathered;
* eval farm: object/view lists sharded on ``data`` host-side.

Meshes are built over whatever devices exist (1 real TPU chip, or N virtual
CPU devices under --xla_force_host_platform_device_count for tests).
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
POINT_AXIS = "points"


def make_mesh(data: int | None = None, points: int = 1,
              devices: Any = None) -> Mesh:
    """Build a (data, points) mesh. Defaults to all devices on the data axis."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data is None:
        data = n // points
    if data * points != n:
        raise ValueError(f"mesh {data}x{points} != {n} devices")
    return Mesh(devices.reshape(data, points), (DATA_AXIS, POINT_AXIS))


def fitting_mesh(batch_size: int, devices: Any = None) -> Mesh:
    """Largest data-parallel mesh whose size divides the batch (a batch of 2
    on an 8-device host trains on 2 devices rather than failing to shard)."""
    import math
    devices = list(devices if devices is not None else jax.devices())
    n = math.gcd(batch_size, len(devices))
    return make_mesh(data=n, points=1, devices=devices[:n])


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard axis 0 (batch) over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def point_sharding(mesh: Mesh, axis: int = 0, ndim: int = 2) -> NamedSharding:
    """Shard the query-point axis over the points axis (and, when the batch is
    also present, batch over data)."""
    spec = [None] * ndim
    spec[axis] = POINT_AXIS
    return NamedSharding(mesh, P(*spec))


def shard_batch(batch: dict[str, Any], mesh: Mesh) -> dict[str, Any]:
    """device_put every array with its leading axis sharded on data."""
    return {
        k: jax.device_put(v, batch_sharding(mesh, np.ndim(v)))
        for k, v in batch.items()
    }
