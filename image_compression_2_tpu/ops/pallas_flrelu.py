"""Fused filtered-leaky-ReLU as a single Pallas TPU kernel.

The lax paths materialise the 2x-oversampled intermediate grid in HBM between
the four FIR stages; this kernel keeps the whole chain

    bias -> H-up -> W-up -> lrelu*gain -> clamp -> W-down -> H-down

in VMEM per (batch, channel-tile) grid cell, with the banded FIR operators
(see ``upfirdn_matmul``) as compile-time constants feeding the MXU.  One HBM
read of the input block, one HBM write of the output block.

Applicability: the oversampled tile [H2, CT, W2] must fit VMEM; callers check
``fits_vmem`` and fall back to the matmul path otherwise.

Measured status (v5e, b8, bf16): at parity with the XLA matmul path
(L1: 3.25 vs 3.11 ms; L4: 3.89 vs 3.79 ms) — the in-kernel major-dim
transposes offset the HBM-roundtrip savings, and XLA pipelines the unfused
matmuls well.  Kept as the validated Pallas formulation (and the base for a
future H-tiled double-buffered variant); the synthesis network defaults to
``mode='matmul'``.

Mosaic constraints encoded here (discovered empirically on this target):
- lane-merging reshapes require the innermost dim to be the native 128 lanes,
  hence channel tiles are multiples of 128 and every dot contracts dim 0 of
  the data operand with a left matrix;
- 1D operands get XLA layouts Mosaic rejects — the bias ships as [1, C];
- no bf16 vector compare — the activation runs in fp32.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .upfirdn2d import Padding, _parse_padding
from .upfirdn_matmul import fir_matrix

_VMEM_BUDGET = 10 * 1024 * 1024  # conservative: leave room for double buffers


def _plan_tile(H, W, C, H2, W2, Ho, Wo) -> Optional[int]:
    """Largest legal channel tile whose working set fits VMEM.

    Pallas TPU blocks must have their last dim divisible by 128 (or equal to
    the full array dim), and the in-kernel lane-merging reshapes need the
    channel tile to be exactly the native 128 lanes — so the only candidates
    are multiples of 128 that divide C."""
    cands = [ct for ct in (512, 256, 128) if C % ct == 0]
    for ct in cands:
        work = 2 * (  # bf16 carries on the production path
            H * W * ct          # input block (fp32 after cast)
            + H2 * W * ct       # after H-up
            + H2 * ct * W2      # oversampled grid (the big one)
            + H2 * ct * Wo      # after W-down
            + Ho * ct * Wo      # output
        )
        if work <= _VMEM_BUDGET:
            return ct
    return None


@functools.lru_cache(maxsize=None)
def _build_call(H, W, C, ct, up, down, pad, fu_key, fd_key, gain, slope,
                clamp, out_dtype_name):
    # operators rebuilt from hashable keys (filter bytes)
    fu = np.frombuffer(fu_key, np.float32) if fu_key else np.ones([1], np.float32)
    fd = np.frombuffer(fd_key, np.float32) if fd_key else np.ones([1], np.float32)
    px0, px1, py0, py1 = pad
    A_hu = fir_matrix(fu, H, up, 1, py0, py1, up ** 2)
    A_wu = fir_matrix(fu, W, up, 1, px0, px1, 1.0)
    H2, W2 = A_hu.shape[0], A_wu.shape[0]
    A_hd = fir_matrix(fd, H2, 1, down, 0, 0, 1.0)
    A_wd = fir_matrix(fd, W2, 1, down, 0, 0, 1.0)
    Ho, Wo = A_hd.shape[0], A_wd.shape[0]
    out_dtype = jnp.dtype(out_dtype_name)

    precision = (
        jax.lax.Precision.HIGHEST if out_dtype == jnp.float32 else None
    )
    # fp32 accumulate in every dot, but carry intermediates in the output
    # dtype (bf16 halves VMEM and doubles MXU rate on the production path).
    carry = jnp.float32 if out_dtype == jnp.float32 else jnp.bfloat16

    def _ldot(m_ref, t):
        # contract dim 0 of t with a left matrix: Mosaic-friendly because the
        # internal free-dim merge keeps the 128-lane channel axis innermost.
        return jax.lax.dot_general(
            m_ref[:].astype(t.dtype), t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        ).astype(carry)

    def kernel(x_ref, b_ref, ahu_ref, awu_ref, ahd_ref, awd_ref, o_ref):
        x = (x_ref[0].astype(jnp.float32)
             + b_ref[0][None, None, :]).astype(carry)
        t = _ldot(ahu_ref, x)                    # [H2, W, ct]
        t = jnp.transpose(t, (1, 0, 2))          # [W, H2, ct]
        t = _ldot(awu_ref, t)                    # [W2, H2, ct]
        # activation in fp32: the VPU has no bf16 compare on this target
        tf = t.astype(jnp.float32)
        tf = jnp.where(tf >= 0, tf, tf * slope) * gain
        if clamp is not None:
            tf = jnp.clip(tf, -clamp, clamp)
        t = tf.astype(carry)
        t = _ldot(awd_ref, t)                    # [Wo, H2, ct]
        t = jnp.transpose(t, (1, 0, 2))          # [H2, Wo, ct]
        t = _ldot(ahd_ref, t)                    # [Ho, Wo, ct]
        o_ref[0] = t.astype(out_dtype)

    grid = (1, C // ct)  # batch handled by vmap for clean block maps

    def call_one(x, b):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, H, W, ct), lambda i, c: (i, 0, 0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ct), lambda i, c: (0, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, Ho, Wo, ct), lambda i, c: (i, 0, 0, c),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, Ho, Wo, C), out_dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=int(_VMEM_BUDGET * 1.5)
            ),
        )(x[None], b[None], jnp.asarray(A_hu), jnp.asarray(A_wu),
          jnp.asarray(A_hd), jnp.asarray(A_wd))[0]

    return jax.vmap(call_one, in_axes=(0, None))


def fits_vmem(H: int, W: int, C: int, up: int, down: int,
              fu_taps: int, fd_taps: int, padding: Padding) -> bool:
    px0, px1, py0, py1 = _parse_padding(padding)
    H2 = H * up + py0 + py1 - fu_taps + 1
    W2 = W * up + px0 + px1 - fu_taps + 1
    Ho = (H2 - fd_taps) // down + 1
    Wo = (W2 - fd_taps) // down + 1
    if min(H2, W2, Ho, Wo) <= 0:
        return False
    return _plan_tile(H, W, C, H2, W2, Ho, Wo) is not None


def filtered_lrelu_pallas(
    x: jnp.ndarray,
    fu: Optional[np.ndarray],
    fd: Optional[np.ndarray],
    b: Optional[jnp.ndarray] = None,
    up: int = 1,
    down: int = 1,
    padding: Padding = 0,
    gain: float = float(np.sqrt(2.0)),
    slope: float = 0.2,
    clamp: Optional[float] = 256.0,
) -> jnp.ndarray:
    """Fused kernel path. Caller must have checked ``fits_vmem``."""
    B, H, W, C = x.shape
    pad = _parse_padding(padding)
    fu = None if fu is None else np.asarray(fu, np.float32)
    fd = None if fd is None else np.asarray(fd, np.float32)
    px0, px1, py0, py1 = pad
    tu = 1 if fu is None else len(fu)
    td = 1 if fd is None else len(fd)
    H2 = H * up + py0 + py1 - tu + 1
    W2 = W * up + px0 + px1 - tu + 1
    Ho = (H2 - td) // down + 1
    Wo = (W2 - td) // down + 1
    ct = _plan_tile(H, W, C, H2, W2, Ho, Wo)
    assert ct is not None, "kernel does not fit VMEM; use mode='matmul'"
    call = _build_call(
        H, W, C, ct, up, down, pad,
        fu.tobytes() if fu is not None else b"",
        fd.tobytes() if fd is not None else b"",
        float(gain), float(slope),
        None if clamp is None else float(clamp),
        x.dtype.name,
    )
    bias = jnp.zeros([C], jnp.float32) if b is None else b.astype(jnp.float32)
    return call(x, bias)
