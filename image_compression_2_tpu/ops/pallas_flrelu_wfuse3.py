"""Channels-middle fused filtered-lrelu (mode='mmfuse3').

The v2 kernel (``pallas_flrelu_wfuse2``) is transpose-free but pays in two
places: its first contraction runs over the sublane dim (an lhs-transposed
MXU form), and its backward must restore the cotangent to t1's NHWC block
layout, which forces the last dot back into XLA.

v3 moves the layout change to the H-up einsum instead: it emits
``[B, H2, C, W]`` (channels before width) directly, so

    t2[ht, ct, w2] = Σ_W  x[ht, ct, W] · AuT[W, w2]    (classic matmul)
    t3[ht, ct, wo] = Σ_W2 y[ht, ct, W2] · AdT[W2, wo]  (classic matmul)

and — decisively — the BACKWARD fuses completely: g_t1 comes out of the
kernel already in t1's own ``[Ht, Ct, W]`` layout (three classic matmuls,
one kernel, no outside transpose).  Whether XLA emits the bhcW H-up output
as cheaply as the bhWc one is the empirical question the policy sweep
answers.

Capability parity: the fused ``filtered_lrelu`` CUDA op the reference's
frozen generator calls inside ``G.synthesis``
(``/root/reference/stylegan3_hvae_full.py:274``).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_flrelu_wfuse2 import (
    _VMEM_BUDGET,
    Wfuse2Plan,
    plan_wfuse2,
)

# Fused backward gate (see BWD_FUSED in pallas_flrelu_wfuse2).
BWD_FUSED = True


def plan_wfuse3(B, H2, W, W2, Wo, C, dtype) -> Optional[Wfuse2Plan]:
    """Forward working set is element-for-element the v2 one (the block just
    carries C on the sublanes instead of W)."""
    return plan_wfuse2(B, H2, W, W2, Wo, C, dtype)


def plan_wfuse3_bwd(B: int, H2: int, W: int, W2: int, Wo: int, C: int,
                    dtype) -> Optional[Wfuse2Plan]:
    isz = jnp.dtype(dtype).itemsize
    Ct = min(C, 128)
    # three operator matrices live in VMEM: AuT, Ad, Au
    mat_bytes = (2 * W2 * W + Wo * W2) * isz
    for Ht in (32, 16, 8, 4, 2, 1):
        if Ht > H2 and Ht != 1:
            continue
        n = Ht * Ct
        est = (
            mat_bytes
            + 2 * Ht * Ct * W * isz      # t1 block, double-buffered
            + 2 * Ht * Ct * Wo * isz     # cotangent block, double-buffered
            + W2 * n * 4                 # recomputed t2 (f32)
            + W2 * n * 4                 # g_y (f32)
            + W2 * n * 4                 # deriv / product temporary
            + Ht * Ct * W * 4            # g_t1 accumulator (f32)
            + 2 * Ht * Ct * W * isz      # output block, double-buffered
        )
        if est <= _VMEM_BUDGET:
            return Wfuse2Plan(B, H2, W, W2, Wo, C, Ht, Ct,
                              jnp.dtype(dtype).name)
    return None


def _kernel(x_ref, au_ref, ad_ref, o_ref, *, slope, gain, clamp):
    x = x_ref[0]  # [Ht, Ct, W] — channels-middle block
    t2 = jax.lax.dot_general(
        x, au_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # [Ht, Ct, W2]
    y = jnp.where(t2 >= 0, t2, t2 * slope)
    if gain != 1.0:
        y = y * gain
    if clamp is not None:
        y = jnp.clip(y, -clamp, clamp)
    t3 = jax.lax.dot_general(
        y.astype(x.dtype), ad_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # [Ht, Ct, Wo]
    o_ref[0] = t3.astype(o_ref.dtype)


def _bwd_kernel(x_ref, g_ref, au_ref, ad_ref, aut_ref, o_ref,
                *, slope, gain, clamp):
    x = x_ref[0]   # [Ht, Ct, W]
    g = g_ref[0]   # [Ht, Ct, Wo]
    t2 = jax.lax.dot_general(
        x, au_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # [Ht, Ct, W2]
    deriv = jnp.where(t2 >= 0, gain, slope * gain)
    if clamp is not None:
        z = jnp.where(t2 >= 0, t2, t2 * slope) * gain
        deriv = jnp.where(jnp.abs(z) <= clamp, deriv, 0.0)
    g_y = jax.lax.dot_general(
        g, ad_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # [Ht, Ct, W2]
    g_t2 = (g_y * deriv).astype(x.dtype)
    g_t1 = jax.lax.dot_general(
        g_t2, aut_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # [Ht, Ct, W]
    o_ref[0] = g_t1.astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _build_call(plan: Wfuse2Plan, slope: float, gain: float,
                clamp: Optional[float]):
    kern = functools.partial(_kernel, slope=slope, gain=gain, clamp=clamp)
    return pl.pallas_call(
        kern,
        grid=plan.grid,
        in_specs=[
            pl.BlockSpec((1, plan.Ht, plan.Ct, plan.W),
                         lambda b, h, c: (b, h, c, 0),
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


@functools.lru_cache(maxsize=None)
def _build_bwd_call(plan: Wfuse2Plan, slope: float, gain: float,
                    clamp: Optional[float]):
    kern = functools.partial(_bwd_kernel, slope=slope, gain=gain, clamp=clamp)
    return pl.pallas_call(
        kern,
        grid=plan.grid,
        in_specs=[
            pl.BlockSpec((1, plan.Ht, plan.Ct, plan.W),
                         lambda b, h, c: (b, h, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, plan.Ht, plan.Ct, plan.Wo),
                         lambda b, h, c: (b, h, c, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.W, plan.W2), lambda b, h, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.Wo, plan.W2), lambda b, h, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.W2, plan.W), lambda b, h, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, plan.Ht, plan.Ct, plan.W),
                               lambda b, h, c: (b, h, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (plan.B, plan.H2, plan.C, plan.W), jnp.dtype(plan.dtype)),
        cost_estimate=pl.CostEstimate(
            flops=2 * plan.B * plan.H2 * plan.C
            * (2 * plan.W2 * plan.W + plan.Wo * plan.W2),
            bytes_accessed=plan.B * plan.H2 * plan.C
            * (2 * plan.W + plan.Wo) * jnp.dtype(plan.dtype).itemsize,
            transcendentals=0,
        ),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def wfuse3_middle(t1: jnp.ndarray, A_upT: jnp.ndarray, A_dnT: jnp.ndarray,
                  slope: float, gain: float, clamp: Optional[float],
                  plan: Wfuse2Plan) -> jnp.ndarray:
    """W-axis up→lrelu→down, fused, channels-middle layout throughout.

    t1: [B, H2, C, W]; A_upT: [W, W2]; A_dnT: [W2, Wo].  Out [B, H2, C, Wo].
    """
    return _build_call(plan, slope, gain, clamp)(t1, A_upT, A_dnT)


def _wfuse3_fwd(t1, A_upT, A_dnT, slope, gain, clamp, plan):
    return wfuse3_middle(t1, A_upT, A_dnT, slope, gain, clamp, plan), (
        t1, A_upT, A_dnT)


def _wfuse3_bwd(slope, gain, clamp, plan, res, g):
    t1, A_upT, A_dnT = res
    if BWD_FUSED:
        from .flrelu_policy import FORCE_PALLAS_ON_CPU

        if jax.default_backend() == "tpu" or FORCE_PALLAS_ON_CPU:
            bplan = plan_wfuse3_bwd(plan.B, plan.H2, plan.W, plan.W2,
                                    plan.Wo, plan.C, plan.dtype)
            if bplan is not None:
                g_t1 = _build_bwd_call(bplan, slope, gain, clamp)(
                    t1, g.astype(t1.dtype), A_upT,
                    A_dnT.T.astype(t1.dtype), A_upT.T.astype(t1.dtype))
                return (g_t1.astype(t1.dtype), jnp.zeros_like(A_upT),
                        jnp.zeros_like(A_dnT))
    # Plain-XLA backward (recompute t2; channels-middle einsums throughout).
    t2 = jnp.einsum("bhcW,Wv->bhcv", t1, A_upT,
                    preferred_element_type=jnp.float32)
    deriv = jnp.where(t2 >= 0, 1.0, slope) * gain
    if clamp is not None:
        z = jnp.where(t2 >= 0, t2, t2 * slope) * gain
        deriv = jnp.where(jnp.abs(z) <= clamp, deriv, 0.0)
    g_y = jnp.einsum("bhcw,vw->bhcv", g.astype(A_dnT.dtype), A_dnT,
                     preferred_element_type=jnp.float32)
    g_t2 = (g_y * deriv).astype(t1.dtype)
    g_t1 = jnp.einsum("bhcv,Wv->bhcW", g_t2, A_upT)
    return (g_t1.astype(t1.dtype), jnp.zeros_like(A_upT),
            jnp.zeros_like(A_dnT))


wfuse3_middle.defvjp(_wfuse3_fwd, _wfuse3_bwd)


def filtered_lrelu_wfuse3(
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
    """filtered_lrelu with the W-axis middle fused, channels-middle layout
    (mode='mmfuse3').  Same contract as ``filtered_lrelu``; requires
    separable 1-D filters."""
    from .bias_act import bias_act
    from .upfirdn2d import _parse_padding
    from .upfirdn_matmul import fir_matrix, _prec

    px0, px1, py0, py1 = _parse_padding(padding)
    fu = np.ones([1], np.float32) if fu is None else np.asarray(fu, np.float32)
    fd = np.ones([1], np.float32) if fd is None else np.asarray(fd, np.float32)
    assert fu.ndim == 1 and fd.ndim == 1, "mmfuse3 expects separable filters"
    B, H, W, C = x.shape

    A_h_up = fir_matrix(fu, H, up, 1, py0, py1, float(up ** 2))
    A_w_up = fir_matrix(fu, W, up, 1, px0, px1, 1.0)
    H2 = A_h_up.shape[0]
    W2 = A_w_up.shape[0]
    A_w_dn = fir_matrix(fd, W2, 1, down, 0, 0, 1.0)
    A_h_dn = fir_matrix(fd, H2, 1, down, 0, 0, 1.0)
    Wo = A_w_dn.shape[0]

    plan = plan_wfuse3(B, H2, W, W2, Wo, C, x.dtype)
    if plan is None:
        raise ValueError("no legal wfuse3 block for this geometry")

    x = bias_act(x, b)
    prec = _prec(x, fp32_mxu)
    # H-up emitting channels-before-width directly: the layout change rides
    # the dot's output instead of a separate relayout of the big tensor.
    A = jnp.asarray(A_h_up, x.dtype)
    t1 = jnp.einsum("hH,bHWc->bhcW", A, x, precision=prec)  # [B, H2, C, W]
    t3 = wfuse3_middle(t1, jnp.asarray(A_w_up.T, x.dtype),
                       jnp.asarray(A_w_dn.T, x.dtype),
                       float(slope), float(gain),
                       None if clamp is None else float(clamp), plan)
    Ad = jnp.asarray(A_h_dn, x.dtype)
    return jnp.einsum("uh,bhcw->buwc", Ad, t3, precision=prec)


def fits_wfuse3(B, H, W, C, up, down, fu_taps, fd_taps, padding,
                dtype=jnp.bfloat16) -> bool:
    """Cheap feasibility probe (mirrors filtered_lrelu_wfuse3's sizes)."""
    from .upfirdn2d import _parse_padding

    px0, px1, py0, py1 = _parse_padding(padding)
    H2 = H * up + py0 + py1 - fu_taps + 1
    W2 = W * up + px0 + px1 - fu_taps + 1
    Wo = (W2 - fd_taps) // down + 1
    if H2 <= 0 or W2 <= 0 or Wo <= 0:
        return False
    return plan_wfuse3(B, H2, W, W2, Wo, C, dtype) is not None
