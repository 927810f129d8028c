"""Device mesh + sharding helpers.

The framework parallelises the ways that fit this workload (SURVEY §2.8):
data-parallel training/inference over the ``data`` axis, with an optional
``model`` axis reserved for sharding the largest generator weights.  All
communication is XLA-inserted collectives over ICI — there is no hand-written
communication backend to maintain.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    n_space: int = 1,
) -> Mesh:
    """Create a ('data', 'model'[, 'space']) mesh over the available devices.

    ``space`` is the activation/spatial axis (parallel/sp.py): generator
    activations shard their H dimension over it, for the batch<=2 serving
    regime where the data axis starves.  The axis is appended only when
    n_space > 1 so existing 2-D mesh users are unaffected."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_model * n_space)
    n_total = n_data * n_model * n_space
    assert n_total <= len(devices), (n_data, n_model, n_space, len(devices))
    if n_space > 1:
        grid = np.asarray(devices[:n_total]).reshape(n_data, n_model, n_space)
        return Mesh(grid, ("data", "model", "space"))
    grid = np.asarray(devices[:n_total]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dimension sharding (leading axis over the data axis)."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host array as a batch-sharded global array.

    Multi-host: ``batch`` is this process's local shard of the global batch
    (each process feeds its own slice, e.g. via ``global_batch_slice``); the
    global array is assembled without any cross-host data movement."""
    sh = data_sharding(mesh)
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sh, np.asarray(batch))
    return jax.device_put(batch, sh)
