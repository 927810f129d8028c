"""upfirdn as MXU matrix products — the TPU-first formulation.

A separable upsample→FIR→downsample along one axis is a banded linear
operator ``out = A x`` with ``A[n, i] = Σ_t g[t]·[n·down + t - pad_lo = i·up]``
(g = flipped, gain-scaled filter).  XLA lowers the depthwise-conv formulation
onto the VPU where it is bandwidth- and lane-bound (measured 19 ms for the
hottest 256² layer); as a dense matmul the same op rides the 128×128 MXU and
is an order of magnitude faster despite nominally more FLOPs.  The operator
matrices are tiny compile-time constants (H_out × H_in, ≤ ~1200²·fp32).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from .upfirdn2d import Padding, _parse_padding


def fir_matrix(
    f: np.ndarray,
    in_size: int,
    up: int = 1,
    down: int = 1,
    pad_lo: int = 0,
    pad_hi: int = 0,
    gain: float = 1.0,
) -> np.ndarray:
    """Dense [out_size, in_size] operator for 1D zero-stuff+pad+convolve+
    decimate (true convolution: the filter is flipped)."""
    f = np.asarray(f, np.float64)
    assert f.ndim == 1
    g = f[::-1] * gain
    taps = len(g)
    length = in_size * up + pad_lo + pad_hi
    out_size = (length - taps) // down + 1
    assert out_size > 0, (in_size, up, down, pad_lo, pad_hi, taps)
    A = np.zeros((out_size, in_size), np.float64)
    for n in range(out_size):
        base = n * down - pad_lo
        for t in range(taps):
            m = base + t
            if m % up == 0:
                i = m // up
                if 0 <= i < in_size:
                    A[n, i] += g[t]
    return A.astype(np.float32)


def _prec(x, fp32_mxu):
    if x.dtype != jnp.float32:
        return None
    return fp32_mxu if fp32_mxu is not None else jax.lax.Precision.HIGHEST


def _apply_h(x: jnp.ndarray, A: np.ndarray, fp32_mxu=None) -> jnp.ndarray:
    Aj = jnp.asarray(A, x.dtype)
    return jnp.einsum("hH,bHwc->bhwc", Aj, x, precision=_prec(x, fp32_mxu))


def _apply_w(x: jnp.ndarray, A: np.ndarray, fp32_mxu=None) -> jnp.ndarray:
    Aj = jnp.asarray(A, x.dtype)
    return jnp.einsum("wW,bhWc->bhwc", Aj, x, precision=_prec(x, fp32_mxu))


def upfirdn2d_mm(
    x: jnp.ndarray,
    f: Optional[np.ndarray],
    up: int = 1,
    down: int = 1,
    padding: Padding = 0,
    gain: float = 1.0,
    fp32_mxu=None,
    order: str = "hw",
) -> jnp.ndarray:
    """Matmul-path upfirdn2d; same contract as ``upfirdn2d`` (separable or
    identity filters).

    ``order``: which axis the first banded matmul contracts.  The two passes
    commute exactly (both are linear), but NOT in wall time: the W operator
    touches the tensor XLA just produced with the minor dims intact, so
    ``'wh'`` (W first) is measurably faster on downsampling stages whose
    input is the 2x-oversampled intermediate (the 'sandwich' layout win from
    ``tools/bench_fir_variants.py``).
    """
    assert x.ndim == 4
    assert order in ("hw", "wh"), order
    px0, px1, py0, py1 = _parse_padding(padding)
    if f is None:
        f = np.ones([1], np.float32)
    f = np.asarray(f, np.float32)
    assert f.ndim == 1, "matmul path expects separable filters"
    B, H, W, C = x.shape
    # 2D gain: apply the full gain in the first (H) pass like the conv path.
    A_h = fir_matrix(f, H, up, down, py0, py1, gain)
    A_w = fir_matrix(f, W, up, down, px0, px1, 1.0)
    if order == "wh":
        return _apply_h(_apply_w(x, A_w, fp32_mxu), A_h, fp32_mxu)
    return _apply_w(_apply_h(x, A_h, fp32_mxu), A_w, fp32_mxu)
