"""Block-banded upfirdn matmuls — dense-FLOP reduction for large planes.

The banded operator ``A`` of ``upfirdn_matmul`` has bandwidth ~taps·up/down,
but a dense [H_out, H_in] matmul pays H_out·H_in MACs regardless: at the
1024-flagship's 1044² planes with 12-48 tap filters, >90% of the MXU work
multiplies structural zeros (the round-3 MFU analysis attributed 37% of
total model FLOPs to this waste).

This module splits the output rows into MXU-sized blocks (128 by default)
and contracts each block only against its nonzero input window
(~block·down/up + taps columns), as ONE batched einsum over compile-time
constant block tensors:

    out[k·P : k·P+P] = A[k·P : k·P+P, c0_k : c0_k+Wk] · x[c0_k : c0_k+Wk]

MAC count drops from H_out·H_in to nblocks·P·Wk (≈ band coverage rounded up
to tile size) — 3-6x fewer at H ≥ 512 — while staying pure XLA: a gather of
strided input windows plus a batched matmul, so it fuses, shards (tp/sp),
and differentiates like any other einsum.  For small planes (single block or
window ≈ full width) it falls back to the dense path, which is already
optimal there.

The reference outsources this to NVlabs' CUDA ``upfirdn2d``/``filtered_lrelu``
(SURVEY §2.7); here the same arithmetic-intensity win is expressed in the
XLA/MXU cost model instead of hand-written SASS.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .upfirdn2d import Padding, _parse_padding
from .upfirdn_matmul import fir_matrix, _prec

_DEFAULT_BLOCK = 128


def block_plan(A: np.ndarray, block: int = _DEFAULT_BLOCK
               ) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Split a banded [out, in] operator into ``block``-row blocks with a
    common column-window width.

    Returns ``(blocks [nb, block, win], col0 [nb])`` or None when blocking
    cannot beat the dense product (single block, or window ≈ full width).
    """
    out, in_ = A.shape
    nb = -(-out // block)
    if nb <= 1:
        return None
    spans = []
    for k in range(nb):
        rows = A[k * block: min((k + 1) * block, out)]
        nz = np.nonzero(np.any(rows != 0.0, axis=0))[0]
        spans.append((int(nz[0]), int(nz[-1]) + 1) if len(nz) else (0, 1))
    win = max(c1 - c0 for c0, c1 in spans)
    # round the contraction width up to the fp32 sublane tile so the MXU
    # operands stay aligned (8 sublanes; bf16 packs 16 but 8 divides it)
    win = min(in_, -(-win // 8) * 8)
    if nb * block * win >= out * in_:
        return None  # dense is already cheaper (or equal)
    blocks = np.zeros((nb, block, win), np.float32)
    col0 = np.zeros((nb,), np.int32)
    for k, (c0, c1) in enumerate(spans):
        c0 = min(c0, in_ - win)  # keep the window inside the input
        rows = A[k * block: min((k + 1) * block, out), c0:c0 + win]
        blocks[k, : rows.shape[0], :] = rows
        col0[k] = c0
    return blocks, col0


def _make_blocked_apply(axis: int, A: np.ndarray, plan, fp32_mxu=None):
    """Block-banded linear apply with a hand-written VJP.

    The forward gathers overlapping input windows (``jnp.take``), whose
    native adjoint is a scatter-add — slow on TPU.  The operator is linear,
    so the true VJP is just the transposed operator A^T, which is banded
    with the same structure: the backward runs its own block plan (or the
    dense einsum when blocking would not pay), never a scatter."""
    AT = np.ascontiguousarray(A.T)
    planT = block_plan(AT, plan[0].shape[1])

    def _dense(t, M):
        from .upfirdn_matmul import _apply_h, _apply_w

        return (_apply_h if axis == 1 else _apply_w)(t, M, fp32_mxu)

    @jax.custom_vjp
    def apply(x):
        return _apply_axis_blocked(x, axis, A, plan, fp32_mxu)

    def fwd(x):
        return apply(x), None

    def bwd(_, g):
        if planT is not None:
            return (_apply_axis_blocked(g, axis, AT, planT, fp32_mxu),)
        return (_dense(g, AT),)

    apply.defvjp(fwd, bwd)
    return apply


def _apply_axis_blocked(x: jnp.ndarray, axis: int, A: np.ndarray,
                        plan, fp32_mxu=None) -> jnp.ndarray:
    """Apply a planned block-banded operator along ``axis`` (1=H, 2=W)."""
    blocks, col0 = plan
    nb, P, win = blocks.shape
    out = A.shape[0]
    idx = jnp.asarray(col0[:, None] + np.arange(win)[None, :])  # [nb, win]
    Ab = jnp.asarray(blocks, x.dtype)
    xw = jnp.take(x, idx, axis=axis)
    prec = _prec(x, fp32_mxu)
    if axis == 1:
        # x [B,H,W,C] -> xw [B,nb,win,W,C]
        y = jnp.einsum("kpq,bkqwc->bkpwc", Ab, xw, precision=prec)
        y = y.reshape(x.shape[0], nb * P, *x.shape[2:])
        return y[:, :out]
    # axis == 2: x [B,H,W,C] -> xw [B,H,nb,win,C]
    y = jnp.einsum("kpq,bhkqc->bhkpc", Ab, xw, precision=prec)
    y = y.reshape(*x.shape[:2], nb * P, x.shape[3])
    return y[:, :, :out]


def upfirdn2d_mm_blocked(
    x: jnp.ndarray,
    f: Optional[np.ndarray],
    up: int = 1,
    down: int = 1,
    padding: Padding = 0,
    gain: float = 1.0,
    fp32_mxu=None,
    order: str = "hw",
    block: int = _DEFAULT_BLOCK,
) -> jnp.ndarray:
    """Same contract as ``upfirdn_matmul.upfirdn2d_mm``; each 1-D pass uses
    the block-banded product when the plan beats dense, else the dense
    einsum (so small planes pay nothing)."""
    from .upfirdn_matmul import _apply_h, _apply_w

    assert x.ndim == 4
    assert order in ("hw", "wh"), order
    px0, px1, py0, py1 = _parse_padding(padding)
    if f is None:
        f = np.ones([1], np.float32)
    f = np.asarray(f, np.float32)
    assert f.ndim == 1, "blocked path expects separable filters"
    B, H, W, C = x.shape
    A_h = fir_matrix(f, H, up, down, py0, py1, gain)
    A_w = fir_matrix(f, W, up, down, px0, px1, 1.0)
    plan_h = block_plan(A_h, block)
    plan_w = block_plan(A_w, block)

    def apply_h(t):
        return (_make_blocked_apply(1, A_h, plan_h, fp32_mxu)(t)
                if plan_h is not None else _apply_h(t, A_h, fp32_mxu))

    def apply_w(t):
        return (_make_blocked_apply(2, A_w, plan_w, fp32_mxu)(t)
                if plan_w is not None else _apply_w(t, A_w, fp32_mxu))

    if order == "wh":
        return apply_h(apply_w(x))
    return apply_w(apply_h(x))
