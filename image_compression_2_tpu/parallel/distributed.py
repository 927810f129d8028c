"""Multi-host initialisation helper.

Single-slice multi-chip needs nothing (one process sees all local chips).
Multi-host/multi-slice: call ``initialize_distributed()`` once per process
before any jax computation; mesh creation and the sharded train steps are
unchanged (XLA routes intra-slice collectives over ICI, inter-slice over DCN).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Wrapper over ``jax.distributed.initialize`` with env-var defaults
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID)."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and num_processes is None:
        return  # single-process: nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_batch_slice(global_batch: int) -> slice:
    """This process's shard of a globally-sharded batch (even split)."""
    n = jax.process_count()
    i = jax.process_index()
    per = global_batch // n
    return slice(i * per, (i + 1) * per)
