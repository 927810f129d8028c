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


def geometry_key(H: int, W: int, C: int, up: int, down: int,
                 fu_taps: int, fd_taps: int, pad: Tuple[int, int, int, int]
                 ) -> str:
    return f"{H}x{W}x{C}:u{up}d{down}:t{fu_taps},{fd_taps}:p{','.join(map(str, pad))}"


def _load() -> Dict[str, str]:
    global _policy
    if _policy is None:
        try:
            with open(_POLICY_FILE) as f:
                _policy = json.load(f).get("winners", {})
        except (OSError, ValueError):
            _policy = {}
    return _policy


def lookup(H, W, C, up, down, fu_taps, fd_taps, pad) -> Optional[str]:
    """Measured winner for this geometry, or None if never benchmarked."""
    return _load().get(geometry_key(H, W, C, up, down, fu_taps, fd_taps, pad))


def save_policy(winners: Dict[str, str], meta: Dict) -> None:
    with open(_POLICY_FILE, "w") as f:
        json.dump({"meta": meta, "winners": winners}, f, indent=1,
                  sort_keys=True)
    global _policy
    _policy = dict(winners)
