"""Spatial (activation) sharding over the mesh's ``space`` axis.

For the batch<=2 serving regime (single-image compress/decompress, the
reference's deployment shape — demo_real_images.py drives one photo at a
time) the ``data`` axis starves: there is nothing to shard.  The generator's
activations, however, are large ([B, H, W, C] planes up to 1044² at the 1024
flagship), and their H axis can shard over devices instead:

- W-direction FIR matmuls (``upfirdn_matmul``) contract W and treat H as a
  batch dimension — fully parallel under an H sharding, zero collectives.
- modulated convs contract C — H-sharded spatial dims are handled by GSPMD's
  native halo exchange for convolutions.
- H-direction FIR matmuls contract H — XLA inserts the collective
  (all-gather of the narrow band product or a reduce-scatter), which rides
  ICI.

GSPMD-style: the model code only states *constraints*
(``with_sharding_constraint`` at layer boundaries, applied by
``shard_spatial``); XLA's propagation chooses the intermediate shardings and
the collectives.  The helper reads the ambient ``with mesh:`` context, so
model code stays mesh-agnostic and single-device runs are untouched.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def ambient_mesh() -> Optional[Mesh]:
    """The mesh of the enclosing ``with mesh:`` block, if any."""
    try:
        from jax._src.mesh import thread_resources

        m = thread_resources.env.physical_mesh
        return None if m.empty else m
    except Exception:
        return None


def wants_sp(mesh: Optional[Mesh]) -> bool:
    return mesh is not None and int(dict(mesh.shape).get("space", 1)) > 1


def shard_spatial(x: jax.Array) -> jax.Array:
    """Constrain a [B, H, W, C] activation to shard H over ``space`` (and the
    batch over ``data`` when it divides).  No-op without an ambient mesh, a
    space axis, or H divisibility — so it is safe to call unconditionally at
    every synthesis layer boundary."""
    mesh = ambient_mesh()
    if not wants_sp(mesh) or getattr(x, "ndim", 0) != 4:
        return x
    shape = dict(mesh.shape)
    n_space = int(shape.get("space", 1))
    if x.shape[1] % n_space:
        return x
    n_data = int(shape.get("data", 1))
    batch_axis = "data" if (n_data > 1 and x.shape[0] % n_data == 0) else None
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(batch_axis, "space", None, None))
    )
