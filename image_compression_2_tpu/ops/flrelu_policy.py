"""Measured per-geometry path selection for filtered_lrelu.

``tools/bench_flrelu_layers.py --emit-policy`` times every layer geometry of
the flagship configs on the real TPU across the conv / matmul / sandwich /
blocked / mmfuse2 / mmfuse3 paths and writes the winners to
``flrelu_policy.json`` (shipped with the package).  ``filtered_lrelu
(mode='auto')`` consults the table; unknown geometries fall back to the
matmul path (the round-1 default, ~10x faster than conv on the 256² hot
layers but quadratic in plane size — the table exists precisely because no
single path wins everywhere).

The JSON carries TWO winner tables: ``winners`` (forward-only — the
inference/encode/decode path) and ``winners_grad`` (fwd+bwd under
``jax.grad`` — the training path; emitted by ``--grad --emit-policy``).
They disagree: e.g. at 256²/b8 the forward table picks conv/blocked/mmfuse3
on several layers while under differentiation the sandwich formulation wins
almost everywhere (runs/r3_grad_timing.txt).  Trainers flip the module into
grad-lookup mode with :func:`set_train`.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

_POLICY_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "flrelu_policy.json")
_policy: Optional[Dict[str, Dict[str, str]]] = None

# The policy is measured on TPU; its Pallas winners (mmfuse2/mmfuse3) cannot
# compile on the CPU backend (tests, the driver's virtual-device mesh), so
# mode='auto' degrades them to matmul there.  Tests that exercise the
# routing under the Pallas interpreter set this to True.
FORCE_PALLAS_ON_CPU = False
_PALLAS_MODES = frozenset({"mmfuse2", "mmfuse3", "hfuse"})

# Trace-time context: True while a training process is tracing its steps.
# Mode selection happens at Python trace time (inside jit tracing), so a
# process-level flag is the honest granularity — a Trainer sets it once and
# every filtered_lrelu traced thereafter picks fwd+bwd winners.
_TRAIN = False


def set_train(active: bool) -> None:
    """Switch mode='auto' lookups to the fwd+bwd (training) winner table."""
    global _TRAIN
    _TRAIN = bool(active)


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


def _load() -> Dict[str, Dict[str, str]]:
    global _policy
    if _policy is None:
        try:
            with open(_POLICY_FILE) as f:
                doc = json.load(f)
            _policy = {"winners": doc.get("winners", {}),
                       "winners_grad": doc.get("winners_grad", {}),
                       "layers": doc.get("layers", {})}
        except (OSError, ValueError):
            _policy = {"winners": {}, "winners_grad": {}, "layers": {}}
    return _policy


def _nearest_batch(table: Dict[str, str], key: str) -> Optional[str]:
    exact = table.get(key)
    if exact is not None:
        return exact
    suffix = key[key.index(":"):]
    best = None  # (|measured_b - B|, measured_b, winner)
    for k, v in table.items():
        if k.endswith(suffix) and k.startswith("b"):
            try:
                mb = int(k[1:k.index(":")])
            except ValueError:
                continue
            B = int(key[1:key.index(":")])
            cand = (abs(mb - B), mb, v)
            if best is None or cand[:2] < best[:2]:
                best = cand
    return best[2] if best else None


def lookup(B, H, W, C, up, down, fu_taps, fd_taps, pad,
           grad: Optional[bool] = None) -> Optional[str]:
    """Measured winner for this geometry, or None if never benchmarked.

    Falls back to the same geometry at the measured batch size CLOSEST to B
    (winners differ per batch — the whole reason batch is in the key — so
    the nearest measurement, preferring the smaller on ties, is the least
    wrong proxy).

    With ``grad=True`` (default: the :func:`set_train` flag) the fwd+bwd
    table is consulted first.  A geometry never measured under grad degrades
    its forward winner to 'sandwich' when that winner is anything other than
    matmul/sandwich: the fwd+bwd lane showed conv and the fused Pallas modes
    losing badly under differentiation while sandwich won the stack total
    (runs/r3_grad_timing.txt — 129.2 ms vs 146.8 matmul / 154.6 mmfuse2).
    """
    if grad is None:
        grad = _TRAIN
    tables = _load()
    key = geometry_key(B, H, W, C, up, down, fu_taps, fd_taps, pad)
    if grad:
        win = _nearest_batch(tables["winners_grad"], key)
        if win is not None:
            return win
        fwd = _nearest_batch(tables["winners"], key)
        if fwd is None:
            return None
        return fwd if fwd in ("matmul", "sandwich") else "sandwich"
    return _nearest_batch(tables["winners"], key)


def layer_key(B: int, H: int, W: int, Cin: int, Cout: int, k: int,
              up: int, down: int, fu_taps: int, fd_taps: int,
              pad: Tuple[int, int, int, int]) -> str:
    """Key for the whole-layer fusion table (conv geometry included)."""
    return (f"b{B}:{H}x{W}:{Cin}>{Cout}:k{k}:u{up}d{down}"
            f":t{fu_taps},{fd_taps}:p{','.join(map(str, pad))}")


def layer_fused(B, H, W, Cin, Cout, k, up, down, fu_taps, fd_taps,
                pad) -> Optional[int]:
    """Measured channel tile (Ct) when the whole-layer fused kernel
    (`pallas_layerfuse`) wins this layer's geometry, else None.  Table
    values are 'unfused' or 'fused:ct<N>' — the sweep times every legal
    tile and records the winner's exact tile, which the runtime reuses
    (the VMEM estimate is conservative; compilation at sweep time is the
    real feasibility proof).  Forward table only: training (set_train)
    keeps the unfused path, and non-TPU backends cannot compile the kernel.
    Falls back to the nearest measured batch like :func:`lookup`."""
    if _TRAIN:
        return None
    if not FORCE_PALLAS_ON_CPU:
        import jax

        if jax.default_backend() == "cpu":
            return None
    table = _load()["layers"]
    key = layer_key(B, H, W, Cin, Cout, k, up, down, fu_taps, fd_taps, pad)
    val = _nearest_batch(table, key)
    if val is None or not val.startswith("fused"):
        return None
    if ":ct" in val:
        try:
            return int(val.split(":ct", 1)[1])
        except ValueError:
            return None
    return -1  # legacy bare 'fused': let the plan pick the tile


def save_policy(winners: Optional[Dict[str, str]], meta: Dict,
                winners_grad: Optional[Dict[str, str]] = None,
                layers: Optional[Dict[str, str]] = None) -> None:
    """Write the policy JSON.  Any table may be None, meaning "preserve
    what the file already has" — the forward sweep, the grad sweep, and the
    layer-fusion sweep run at different times and must not clobber each
    other's measurements."""
    current = _load()
    doc = {
        "meta": meta,
        "winners": dict(winners if winners is not None
                        else current["winners"]),
        "winners_grad": dict(winners_grad if winners_grad is not None
                             else current["winners_grad"]),
        "layers": dict(layers if layers is not None
                       else current.get("layers", {})),
    }
    with open(_POLICY_FILE, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    global _policy
    _policy = {"winners": doc["winners"], "winners_grad": doc["winners_grad"],
               "layers": doc["layers"]}
