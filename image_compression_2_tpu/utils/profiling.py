"""Profiling helpers: jax.profiler traces + honest wall timing on the relay.

The 'axon' relay backend acknowledges ``block_until_ready`` before device
completion (see .claude/skills/verify/SKILL.md), so ``sync()`` here forces a
real synchronisation by fetching a scalar reduction.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp


def sync(x) -> None:
    """True device synchronisation: fetch one scalar derived from x."""
    leaves = jax.tree_util.tree_leaves(x)
    if leaves:
        float(jnp.sum(leaves[-1].astype(jnp.float32)).ravel()[0])


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """jax.profiler trace context (viewable in TensorBoard/XProf)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label: str, result_box: Optional[dict] = None) -> Iterator[None]:
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if result_box is not None:
        result_box[label] = dt
    print(f"[timing] {label}: {dt * 1000:.2f} ms")


def benchmark(fn, *args, iters: int = 10, warmup: int = 1) -> float:
    """Milliseconds per call with a scalar-fetch sync per measurement block."""
    jfn = jax.jit(lambda *a: jnp.sum(fn(*a).astype(jnp.float32)))
    for _ in range(warmup):
        float(jfn(*args))
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = jfn(*args)
    float(r)
    return (time.perf_counter() - t0) / iters * 1000.0
