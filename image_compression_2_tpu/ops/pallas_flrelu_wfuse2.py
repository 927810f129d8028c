"""Transpose-free middle-fused filtered-lrelu (mode='mmfuse2').

The v1 W-fusion (``pallas_flrelu_wfuse``, removed in round 4 — see git
history / PARITY §2.7) fused W-up → lrelu → W-down in one kernel but paid
two in-VMEM ``swapaxes`` per block to put the W axis where its dots wanted
it — Mosaic lowers those to sublane shifts that cost more than the fused
HBM roundtrip saves (measured 86 ms vs 62 ms matmul at 256²b8).

v2 removes every in-kernel relayout by picking contraction dimensions the
MXU supports natively on the block's existing NHWC layout:

    t2[ht, ct, w2] = Σ_W  x[ht, W, ct] · AuT[W, w2]   (contract sublane dim)
    t3[ht, ct, wo] = Σ_W2 y[ht, ct, W2] · AdT[W2, wo] (contract lane dim)

The price is that the kernel's output carries channels before width —
[B, H2, C, Wo] — so the closing H-down einsum restores NHWC while it
contracts H (one XLA dot+transpose of the *smallest* tensor in the layer,
instead of two Mosaic shifts of every block).

Capability parity: the fused ``filtered_lrelu`` CUDA op the reference's
frozen generator calls inside ``G.synthesis``
(``/root/reference/stylegan3_hvae_full.py:274``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Leave headroom under the 16 MiB/core VMEM for Mosaic's own buffers.
_VMEM_BUDGET = 12 * 1024 * 1024

# Fuse the VJP's t2-recompute + lrelu-derivative + W-down-transpose dot into
# one kernel too (the backward otherwise round-trips two W2-wide tensors
# through HBM).  Gated off to fall back to the plain-XLA einsum backward.
BWD_FUSED = True


@dataclasses.dataclass(frozen=True)
class Wfuse2Plan:
    B: int
    H2: int
    W: int
    W2: int
    Wo: int
    C: int
    Ht: int
    Ct: int
    dtype: str  # canonical input dtype name

    @property
    def grid(self):
        return (self.B, pl.cdiv(self.H2, self.Ht), pl.cdiv(self.C, self.Ct))


def plan_wfuse2(B: int, H2: int, W: int, W2: int, Wo: int, C: int,
                dtype) -> Optional[Wfuse2Plan]:
    """Largest (Ht, Ct) block whose working set fits VMEM, or None (the
    policy then keeps the plain matmul path)."""
    isz = jnp.dtype(dtype).itemsize
    Ct = min(C, 128)
    mat_bytes = (W2 * W + Wo * W2) * isz
    for Ht in (32, 16, 8, 4, 2, 1):
        if Ht > H2 and Ht != 1:
            continue
        n = Ht * Ct
        est = (
            mat_bytes
            + 2 * Ht * W * Ct * isz      # input block, double-buffered
            + W2 * n * 4                 # t2 accumulator (f32)
            + W2 * n * isz               # lrelu output fed to the 2nd dot
            + Wo * n * 4                 # t3 accumulator (f32)
            + 2 * Ht * Wo * Ct * isz     # output block, double-buffered
        )
        if est <= _VMEM_BUDGET:
            return Wfuse2Plan(B, H2, W, W2, Wo, C, Ht, Ct,
                              jnp.dtype(dtype).name)
    return None


def _kernel(x_ref, au_ref, ad_ref, o_ref, *, slope, gain, clamp):
    x = x_ref[0]  # [Ht, W, Ct] — NHWC block, untouched layout
    # Contract the sublane (W) dim of x with AuT's leading dim: native MXU
    # lhs-transposed matmul, no relayout.  Output [Ht, Ct, W2].
    t2 = jax.lax.dot_general(
        x, au_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = jnp.where(t2 >= 0, t2, t2 * slope)
    if gain != 1.0:
        y = y * gain
    if clamp is not None:
        y = jnp.clip(y, -clamp, clamp)
    # Contract the lane (W2) dim with AdT's leading dim: the classic
    # [M,K]@[K,N] matmul.  Output [Ht, Ct, Wo].
    t3 = jax.lax.dot_general(
        y.astype(x.dtype), ad_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = t3.astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _build_call(plan: Wfuse2Plan, slope: float, gain: float,
                clamp: Optional[float]):
    kern = functools.partial(_kernel, slope=slope, gain=gain, clamp=clamp)
    return pl.pallas_call(
        kern,
        grid=plan.grid,
        in_specs=[
            pl.BlockSpec((1, plan.Ht, plan.W, plan.Ct),
                         lambda b, h, c: (b, h, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.W, plan.W2), lambda b, h, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.W2, plan.Wo), lambda b, h, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, plan.Ht, plan.Ct, plan.Wo),
                               lambda b, h, c: (b, h, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (plan.B, plan.H2, plan.C, plan.Wo), jnp.dtype(plan.dtype)),
        cost_estimate=pl.CostEstimate(
            flops=2 * plan.B * plan.H2 * plan.C
            * (plan.W2 * plan.W + plan.Wo * plan.W2),
            bytes_accessed=plan.B * plan.H2 * plan.C * (plan.W + plan.Wo)
            * jnp.dtype(plan.dtype).itemsize,
            transcendentals=0,
        ),
    )


def plan_wfuse2_bwd(B: int, H2: int, W: int, W2: int, Wo: int, C: int,
                    dtype) -> Optional[Wfuse2Plan]:
    """Block plan for the fused backward kernel (working set differs from the
    forward: two W2-wide f32 temporaries plus the g block)."""
    isz = jnp.dtype(dtype).itemsize
    Ct = min(C, 128)
    mat_bytes = (W2 * W + Wo * W2) * isz
    for Ht in (32, 16, 8, 4, 2, 1):
        if Ht > H2 and Ht != 1:
            continue
        n = Ht * Ct
        est = (
            mat_bytes
            + 2 * Ht * W * Ct * isz      # t1 block, double-buffered
            + 2 * Ht * Ct * Wo * isz     # cotangent block, double-buffered
            + W2 * n * 4                 # recomputed t2 (f32)
            + W2 * n * 4                 # g_y (f32)
            + W2 * n * 4                 # deriv / product temporary
            + 2 * W2 * n * isz           # output block, double-buffered
        )
        if est <= _VMEM_BUDGET:
            return Wfuse2Plan(B, H2, W, W2, Wo, C, Ht, Ct,
                              jnp.dtype(dtype).name)
    return None


def _bwd_kernel(x_ref, g_ref, au_ref, ad_ref, o_ref, *, slope, gain, clamp):
    x = x_ref[0]   # [Ht, W, Ct]  — the saved pre-oversample input block
    g = g_ref[0]   # [Ht, Ct, Wo] — cotangent in the forward's output layout
    # Recompute t2 exactly as the forward did (remat beats saving the
    # layer's largest tensor), same native sublane contraction.
    t2 = jax.lax.dot_general(
        x, au_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # [Ht, Ct, W2]
    deriv = jnp.where(t2 >= 0, gain, slope * gain)
    if clamp is not None:
        z = jnp.where(t2 >= 0, t2, t2 * slope) * gain
        deriv = jnp.where(jnp.abs(z) <= clamp, deriv, 0.0)
    # dW-down^T: contract the lane (Wo) dim with Ad's leading dim — the
    # classic matmul again (Ad arrives pre-transposed as [Wo, W2]).
    g_y = jax.lax.dot_general(
        g, ad_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # [Ht, Ct, W2]
    o_ref[0] = (g_y * deriv).astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _build_bwd_call(plan: Wfuse2Plan, slope: float, gain: float,
                    clamp: Optional[float]):
    kern = functools.partial(_bwd_kernel, slope=slope, gain=gain, clamp=clamp)
    return pl.pallas_call(
        kern,
        grid=plan.grid,
        in_specs=[
            pl.BlockSpec((1, plan.Ht, plan.W, plan.Ct),
                         lambda b, h, c: (b, h, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, plan.Ht, plan.Ct, plan.Wo),
                         lambda b, h, c: (b, h, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.W, plan.W2), lambda b, h, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.Wo, plan.W2), lambda b, h, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, plan.Ht, plan.Ct, plan.W2),
                               lambda b, h, c: (b, h, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (plan.B, plan.H2, plan.C, plan.W2), jnp.dtype(plan.dtype)),
        cost_estimate=pl.CostEstimate(
            flops=2 * plan.B * plan.H2 * plan.C
            * (plan.W2 * plan.W + plan.Wo * plan.W2),
            bytes_accessed=plan.B * plan.H2 * plan.C
            * (plan.W + plan.Wo + plan.W2)
            * jnp.dtype(plan.dtype).itemsize,
            transcendentals=0,
        ),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def wfuse2_middle(t1: jnp.ndarray, A_upT: jnp.ndarray, A_dnT: jnp.ndarray,
                  slope: float, gain: float, clamp: Optional[float],
                  plan: Wfuse2Plan) -> jnp.ndarray:
    """W-axis up→lrelu→down, fused; NHWC in, [B, H2, C, Wo] out.

    t1: [B, H2, W, C]; A_upT: [W, W2]; A_dnT: [W2, Wo]."""
    return _build_call(plan, slope, gain, clamp)(t1, A_upT, A_dnT)


def _wfuse2_fwd(t1, A_upT, A_dnT, slope, gain, clamp, plan):
    return wfuse2_middle(t1, A_upT, A_dnT, slope, gain, clamp, plan), (
        t1, A_upT, A_dnT)


def _wfuse2_bwd(slope, gain, clamp, plan, res, g):
    # g arrives in the kernel's [B, H2, C, Wo] layout.
    t1, A_upT, A_dnT = res
    if BWD_FUSED:
        from .flrelu_policy import FORCE_PALLAS_ON_CPU

        if jax.default_backend() == "tpu" or FORCE_PALLAS_ON_CPU:
            bplan = plan_wfuse2_bwd(plan.B, plan.H2, plan.W, plan.W2,
                                    plan.Wo, plan.C, plan.dtype)
            if bplan is not None:
                g_t2 = _build_bwd_call(bplan, slope, gain, clamp)(
                    t1, g.astype(t1.dtype), A_upT,
                    A_dnT.T.astype(t1.dtype))
                g_t1 = jnp.einsum("bhcv,Wv->bhWc", g_t2, A_upT)
                return (g_t1.astype(t1.dtype), jnp.zeros_like(A_upT),
                        jnp.zeros_like(A_dnT))
    # Plain-XLA backward; recomputes the oversampled activations instead of
    # saving them (remat beats holding the layer's largest tensor).
    t2 = jnp.einsum("bhWc,Wv->bhcv", t1, A_upT,
                    preferred_element_type=jnp.float32)
    deriv = jnp.where(t2 >= 0, 1.0, slope) * gain
    if clamp is not None:
        z = jnp.where(t2 >= 0, t2, t2 * slope) * gain
        deriv = jnp.where(jnp.abs(z) <= clamp, deriv, 0.0)
    g_y = jnp.einsum("bhcw,vw->bhcv", g.astype(A_dnT.dtype), A_dnT,
                     preferred_element_type=jnp.float32)
    g_t2 = (g_y * deriv).astype(t1.dtype)
    g_t1 = jnp.einsum("bhcv,Wv->bhWc", g_t2, A_upT)
    return (g_t1.astype(t1.dtype), jnp.zeros_like(A_upT),
            jnp.zeros_like(A_dnT))


wfuse2_middle.defvjp(_wfuse2_fwd, _wfuse2_bwd)


def filtered_lrelu_wfuse2(
    x: jnp.ndarray,
    fu: Optional[np.ndarray],
    fd: Optional[np.ndarray],
    b: Optional[jnp.ndarray] = None,
    up: int = 1,
    down: int = 1,
    padding=0,
    gain: float = float(np.sqrt(2.0)),
    slope: float = 0.2,
    clamp: Optional[float] = 256.0,
    fp32_mxu=None,
) -> jnp.ndarray:
    """filtered_lrelu with the W-axis middle fused, transpose-free
    (mode='mmfuse2').  Same contract as ``filtered_lrelu``; requires
    separable 1-D filters."""
    from .bias_act import bias_act
    from .upfirdn2d import _parse_padding
    from .upfirdn_matmul import fir_matrix, _apply_h, _prec

    px0, px1, py0, py1 = _parse_padding(padding)
    fu = np.ones([1], np.float32) if fu is None else np.asarray(fu, np.float32)
    fd = np.ones([1], np.float32) if fd is None else np.asarray(fd, np.float32)
    assert fu.ndim == 1 and fd.ndim == 1, "mmfuse2 expects separable filters"
    B, H, W, C = x.shape

    # Full 2D up-gain on the H pass, like the matmul path.
    A_h_up = fir_matrix(fu, H, up, 1, py0, py1, float(up ** 2))
    A_w_up = fir_matrix(fu, W, up, 1, px0, px1, 1.0)
    H2 = A_h_up.shape[0]
    W2 = A_w_up.shape[0]
    A_w_dn = fir_matrix(fd, W2, 1, down, 0, 0, 1.0)
    A_h_dn = fir_matrix(fd, H2, 1, down, 0, 0, 1.0)
    Wo = A_w_dn.shape[0]

    plan = plan_wfuse2(B, H2, W, W2, Wo, C, x.dtype)
    if plan is None:
        raise ValueError("no legal wfuse2 block for this geometry")

    x = bias_act(x, b)
    t1 = _apply_h(x, A_h_up, fp32_mxu)                       # [B, H2, W, C]
    t3 = wfuse2_middle(t1, jnp.asarray(A_w_up.T, x.dtype),
                       jnp.asarray(A_w_dn.T, x.dtype),
                       float(slope), float(gain),
                       None if clamp is None else float(clamp), plan)
    # H-down on the kernel's [B, H2, C, Wo] layout; the einsum's output
    # order restores NHWC (XLA folds the transpose into the dot epilogue).
    A = jnp.asarray(A_h_dn, x.dtype)
    return jnp.einsum("uh,bhcw->buwc", A, t3, precision=_prec(x, fp32_mxu))


def fits_wfuse2(B, H, W, C, up, down, fu_taps, fd_taps, padding,
                dtype=jnp.bfloat16) -> bool:
    """Cheap feasibility probe for the policy/bench harness (mirrors the
    size computation in ``filtered_lrelu_wfuse2`` without building filters)."""
    from .upfirdn2d import _parse_padding

    px0, px1, py0, py1 = _parse_padding(padding)
    H2 = H * up + py0 + py1 - fu_taps + 1
    W2 = W * up + px0 + px1 - fu_taps + 1
    Wo = (W2 - fd_taps) // down + 1
    if H2 <= 0 or W2 <= 0 or Wo <= 0:
        return False
    return plan_wfuse2(B, H2, W, W2, Wo, C, dtype) is not None
