"""Tensor-parallel sharding over the mesh's ``model`` axis.

GSPMD-style: parameters get ``NamedSharding``s by a shape-generic rule
(shard the channel-most axis of every large tensor over ``model``); XLA's
sharding propagation then shards the matching activations NHWC-channel-wise
and inserts the ICI collectives — no model-code changes, no hand-written
communication.  This is the idiomatic TPU scale-out for this workload:

- FIR/banded-operator matmuls and the filtered-lrelu contract H or W and are
  channel-free — with C sharded they run fully parallel, zero collectives.
- Modulated convs contract C_in — XLA turns the channel-sharded contraction
  into a reduce-scatter/all-reduce over ICI.
- Small tensors (mapping MLP, affines, norms under the size floor) stay
  replicated.

Capability parity: the reference scales only by CUDA data parallelism
(single-process, /root/reference/hvae_training.py); the tensor axis here is
beyond-reference, testable on the virtual CPU mesh.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Don't bother sharding tensors whose channel axis is narrower than this —
# the collective latency outweighs the FLOP split (mapping-MLP-sized stuff).
# Module-level so tiny-config dry runs/tests can lower them and still
# exercise real tp shardings.
MIN_SHARD_DIM = 128
MIN_SHARD_ELEMS = 1 << 14


def leaf_spec(shape, n_model: int,
              min_dim: Optional[int] = None,
              min_elems: Optional[int] = None) -> P:
    """Shard the trailing (channel) axis over ``model`` when it divides
    evenly and the tensor is large enough to be worth it."""
    min_dim = MIN_SHARD_DIM if min_dim is None else min_dim
    min_elems = MIN_SHARD_ELEMS if min_elems is None else min_elems
    if n_model <= 1 or not shape:
        return P()
    last = int(shape[-1])
    if (last % n_model == 0 and last >= min_dim
            and int(np.prod(shape)) >= min_elems):
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def tree_shardings(tree, mesh: Mesh,
                   min_dim: Optional[int] = None,
                   min_elems: Optional[int] = None):
    """A NamedSharding pytree for ``tree`` (params, optimizer state, or any
    matching-structure pytree — Adam's mu/nu get the same specs as their
    params because the rule is shape-generic)."""
    n_model = int(mesh.shape.get("model", 1))

    def f(leaf):
        shape = getattr(leaf, "shape", None)
        if shape is None:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, leaf_spec(shape, n_model,
                                             min_dim, min_elems))

    return jax.tree_util.tree_map(f, tree)


def shard_tree(tree, mesh: Mesh):
    """Place a pytree on the mesh under its tensor-parallel shardings."""
    return jax.device_put(tree, tree_shardings(tree, mesh))


def wants_tp(mesh: Optional[Mesh]) -> bool:
    return mesh is not None and int(mesh.shape.get("model", 1)) > 1
