"""Measured per-geometry path selection for filtered_lrelu.

``tools/bench_flrelu_layers.py --emit-policy`` times every layer geometry of
the flagship configs on the real TPU across the conv / matmul / tiled paths
and writes the winners to ``flrelu_policy.json`` (shipped with the package).
``filtered_lrelu(mode='auto')`` consults the table; unknown geometries fall
back to the matmul path (the round-1 default, ~10x faster than conv on the
256² hot layers but quadratic in plane size — the table exists precisely
because no single path wins everywhere).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

_POLICY_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "flrelu_policy.json")
_policy: Optional[Dict[str, str]] = None

# The policy is measured on TPU; its Pallas winners (tiled/mmfuse) cannot
# compile on the CPU backend (tests, the driver's virtual-device mesh), so
# mode='auto' degrades them to matmul there.  Tests that exercise the
# routing under the Pallas interpreter set this to True.
FORCE_PALLAS_ON_CPU = False
_PALLAS_MODES = frozenset({"tiled", "mmfuse", "mmfuse2", "mmfuse3"})


def usable(winner: Optional[str]) -> Optional[str]:
    """Degrade Pallas winners to matmul on non-TPU backends."""
    if winner in _PALLAS_MODES and not FORCE_PALLAS_ON_CPU:
        import jax

        if jax.default_backend() == "cpu":
            return "matmul"
    return winner


def geometry_key(B: int, H: int, W: int, C: int, up: int, down: int,
                 fu_taps: int, fd_taps: int, pad: Tuple[int, int, int, int]
                 ) -> str:
    """Batch is part of the key: the same plane geometry has different
    winners at different batch sizes (the 256² config deploys at b8, the
    1024² flagship at b2, and they share their early-layer geometries)."""
    return (f"b{B}:{H}x{W}x{C}:u{up}d{down}:t{fu_taps},{fd_taps}"
            f":p{','.join(map(str, pad))}")


def _load() -> Dict[str, str]:
    global _policy
    if _policy is None:
        try:
            with open(_POLICY_FILE) as f:
                _policy = json.load(f).get("winners", {})
        except (OSError, ValueError):
            _policy = {}
    return _policy


def lookup(B, H, W, C, up, down, fu_taps, fd_taps, pad) -> Optional[str]:
    """Measured winner for this geometry, or None if never benchmarked.
    Falls back to the same geometry at the measured batch size CLOSEST to B
    (winners differ per batch — the whole reason batch is in the key — so
    the nearest measurement, preferring the smaller on ties, is the least
    wrong proxy)."""
    table = _load()
    exact = table.get(geometry_key(B, H, W, C, up, down, fu_taps, fd_taps, pad))
    if exact is not None:
        return exact
    suffix = geometry_key(B, H, W, C, up, down, fu_taps, fd_taps, pad)
    suffix = suffix[suffix.index(":"):]
    best = None  # (|measured_b - B|, measured_b, winner)
    for k, v in table.items():
        if k.endswith(suffix) and k.startswith("b"):
            try:
                mb = int(k[1:k.index(":")])
            except ValueError:
                continue
            cand = (abs(mb - B), mb, v)
            if best is None or cand[:2] < best[:2]:
                best = cand
    return best[2] if best else None


def save_policy(winners: Dict[str, str], meta: Dict) -> None:
    with open(_POLICY_FILE, "w") as f:
        json.dump({"meta": meta, "winners": winners}, f, indent=1,
                  sort_keys=True)
    global _policy
    _policy = dict(winners)
