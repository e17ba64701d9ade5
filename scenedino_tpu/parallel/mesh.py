"""Device mesh + sharding helpers.

Replaces the reference's entire distributed layer (ignite `idist` over
NCCL/gloo, SURVEY.md §2.7): on TPU a single `jax.sharding.Mesh` with a
`data` axis expresses data parallelism; gradients all-reduce over ICI via
the compiler-inserted collectives of a `pjit`'d train step — there is no
backend code to write. Multi-host extends the same mesh over DCN.

The model is replicated (SceneDINO is ~100M params — far below per-chip
HBM), the batch and every ray tensor shard over `data`.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_data_mesh(batch_size: int, axis_name: str = "data") -> Mesh:
    """Data mesh sized to the batch: the largest divisor of `batch_size`
    that fits the available devices, so `P("data")` sharding of the batch
    dim is always valid (a global batch smaller than the slice — e.g. the
    smoke configs — just uses fewer chips, mirroring how DDP world size is
    bounded by batch size in the reference, trainer.py:488-494)."""
    n_avail = len(jax.devices())
    n = max(d for d in range(1, min(batch_size, n_avail) + 1) if batch_size % d == 0)
    return make_mesh(n, axis_name)


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis_name))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Device-put a pytree of host arrays with batch-dim sharding."""
    sh = batch_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
