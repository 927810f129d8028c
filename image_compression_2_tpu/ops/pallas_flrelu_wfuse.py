"""Middle-fused filtered-lrelu: the W-axis resampling pair and the
nonlinearity in ONE Pallas kernel.

The banded-matmul formulation of ``filtered_lrelu`` (mode='matmul',
``upfirdn_matmul.py``) runs at ~20% of peak because it is HBM-bound: the
2x-oversampled intermediate — the largest tensor in the whole layer — makes
two full HBM roundtrips between the W-upsample matmul, the pointwise lrelu,
and the W-downsample matmul.  Reordering the separable chain to

    bias -> H-up (XLA einsum) -> [W-up -> lrelu -> W-dn] -> H-dn (XLA einsum)

makes the three middle ops share the W axis, so one Pallas kernel evaluates
them per VMEM-resident block and the oversampled grid never touches HBM.
Blocks need NO halos: the W contraction is complete inside every block, and
the B/H2/C grid dimensions are independent.  Layout stays NHWC throughout —
the only transposes are in-VMEM swaps of the two *small* tensors (the input
and output tiles); the big [W2, Ht*Ct] intermediate is produced and consumed
in its natural MXU layout.

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


@dataclasses.dataclass(frozen=True)
class WfusePlan:
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


def plan_wfuse(B: int, H2: int, W: int, W2: int, Wo: int, C: int,
               dtype) -> Optional[WfusePlan]:
    """Pick the largest (Ht, Ct) block whose working set fits VMEM, or None
    if even the smallest legal block does not fit (huge-W geometries — the
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
            + Ht * W * Ct * isz          # in-VMEM transpose copy
            + W2 * n * 4                 # t2 accumulator (f32)
            + W2 * n * isz               # lrelu output fed to the 2nd dot
            + Wo * n * 4                 # t3 accumulator (f32)
            + 3 * Ht * Wo * Ct * isz     # output block (x2) + transpose copy
        )
        if est <= _VMEM_BUDGET:
            return WfusePlan(B, H2, W, W2, Wo, C, Ht, Ct,
                             jnp.dtype(dtype).name)
    return None


def _kernel(x_ref, au_ref, ad_ref, o_ref, *, slope, gain, clamp):
    x = x_ref[0]  # [Ht, W, Ct]
    Ht, W, Ct = x.shape
    # [W, Ht*Ct]: contiguous view once the two outer dims are swapped — the
    # contraction axis becomes the sublane-major dim both dots want.
    xt = jnp.swapaxes(x, 0, 1).reshape(W, Ht * Ct)
    t2 = jnp.dot(au_ref[:], xt, preferred_element_type=jnp.float32)
    y = jnp.where(t2 >= 0, t2, t2 * slope)
    if gain != 1.0:
        y = y * gain
    if clamp is not None:
        y = jnp.clip(y, -clamp, clamp)
    t3 = jnp.dot(ad_ref[:], y.astype(x.dtype),
                 preferred_element_type=jnp.float32)
    Wo = t3.shape[0]
    o_ref[0] = jnp.swapaxes(
        t3.reshape(Wo, Ht, Ct), 0, 1).astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _build_call(plan: WfusePlan, slope: float, gain: float,
                clamp: Optional[float]):
    kern = functools.partial(_kernel, slope=slope, gain=gain, clamp=clamp)
    return pl.pallas_call(
        kern,
        grid=plan.grid,
        in_specs=[
            pl.BlockSpec((1, plan.Ht, plan.W, plan.Ct),
                         lambda b, h, c: (b, h, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.W2, plan.W), lambda b, h, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.Wo, plan.W2), lambda b, h, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, plan.Ht, plan.Wo, plan.Ct),
                               lambda b, h, c: (b, h, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (plan.B, plan.H2, plan.Wo, plan.C), jnp.dtype(plan.dtype)),
        cost_estimate=pl.CostEstimate(
            flops=2 * plan.B * plan.H2 * plan.C
            * (plan.W2 * plan.W + plan.Wo * plan.W2),
            bytes_accessed=plan.B * plan.H2 * plan.C * (plan.W + plan.Wo)
            * jnp.dtype(plan.dtype).itemsize,
            transcendentals=0,
        ),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def wfuse_middle(t1: jnp.ndarray, A_up: jnp.ndarray, A_dn: jnp.ndarray,
                 slope: float, gain: float, clamp: Optional[float],
                 plan: WfusePlan) -> jnp.ndarray:
    """``A_dn @ clip(gain * lrelu(A_up @ t1))`` along the W axis of an NHWC
    tensor, fused.  t1: [B, H2, W, C]; A_up: [W2, W]; A_dn: [Wo, W2]."""
    return _build_call(plan, slope, gain, clamp)(t1, A_up, A_dn)


def _wfuse_fwd(t1, A_up, A_dn, slope, gain, clamp, plan):
    return wfuse_middle(t1, A_up, A_dn, slope, gain, clamp, plan), (
        t1, A_up, A_dn)


def _wfuse_bwd(slope, gain, clamp, plan, res, g):
    # Plain-XLA backward (training only ever reaches this under jit, where
    # the einsums fuse with the pointwise mask); recomputes the oversampled
    # activations instead of saving them — rematerialisation is cheaper than
    # holding the largest tensor of the layer across the backward pass.
    t1, A_up, A_dn = res
    t2 = jnp.einsum("vW,bhWc->bhvc", A_up, t1,
                    preferred_element_type=jnp.float32)
    deriv = jnp.where(t2 >= 0, 1.0, slope) * gain
    if clamp is not None:
        z = jnp.where(t2 >= 0, t2, t2 * slope) * gain
        deriv = jnp.where(jnp.abs(z) <= clamp, deriv, 0.0)
    g_y = jnp.einsum("wv,bhwc->bhvc", A_dn, g.astype(A_dn.dtype),
                     preferred_element_type=jnp.float32)
    g_t2 = (g_y * deriv).astype(t1.dtype)
    g_t1 = jnp.einsum("vW,bhvc->bhWc", A_up, g_t2)
    return (g_t1.astype(t1.dtype), jnp.zeros_like(A_up),
            jnp.zeros_like(A_dn))


wfuse_middle.defvjp(_wfuse_fwd, _wfuse_bwd)


def filtered_lrelu_wfuse(
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
    """filtered_lrelu with the W-axis middle fused (mode='mmfuse').

    Same contract as ``filtered_lrelu``; requires separable 1-D filters.
    The H passes stay XLA einsums (the bias folds into the H-up producer);
    the separable down stage is applied W-first here, which commutes.
    """
    from .bias_act import bias_act
    from .upfirdn2d import _parse_padding
    from .upfirdn_matmul import fir_matrix, _apply_h, _prec

    px0, px1, py0, py1 = _parse_padding(padding)
    fu = np.ones([1], np.float32) if fu is None else np.asarray(fu, np.float32)
    fd = np.ones([1], np.float32) if fd is None else np.asarray(fd, np.float32)
    assert fu.ndim == 1 and fd.ndim == 1, "mmfuse expects separable filters"
    B, H, W, C = x.shape

    # Full 2D up-gain on the H pass, like the matmul path.
    A_h_up = fir_matrix(fu, H, up, 1, py0, py1, float(up ** 2))
    A_w_up = fir_matrix(fu, W, up, 1, px0, px1, 1.0)
    H2 = A_h_up.shape[0]
    W2 = A_w_up.shape[0]
    A_w_dn = fir_matrix(fd, W2, 1, down, 0, 0, 1.0)
    A_h_dn = fir_matrix(fd, H2, 1, down, 0, 0, 1.0)
    Wo = A_w_dn.shape[0]

    plan = plan_wfuse(B, H2, W, W2, Wo, C, x.dtype)
    if plan is None:
        raise ValueError("no legal wfuse block for this geometry")

    x = bias_act(x, b)
    t1 = _apply_h(x, A_h_up, fp32_mxu)
    t3 = wfuse_middle(t1, jnp.asarray(A_w_up, x.dtype),
                      jnp.asarray(A_w_dn, x.dtype),
                      float(slope), float(gain),
                      None if clamp is None else float(clamp), plan)
    return _apply_h(t3, A_h_dn, fp32_mxu)


def fits_wfuse(B, H, W, C, up, down, fu_taps, fd_taps, padding,
               dtype=jnp.bfloat16) -> bool:
    """Cheap feasibility probe for the policy/bench harness (mirrors the
    size computation in ``filtered_lrelu_wfuse`` without building filters)."""
    from .upfirdn2d import _parse_padding

    px0, px1, py0, py1 = _parse_padding(padding)
    H2 = H * up + py0 + py1 - fu_taps + 1
    W2 = W * up + px0 + px1 - fu_taps + 1
    Wo = (W2 - fd_taps) // down + 1
    if H2 <= 0 or W2 <= 0 or Wo <= 0:
        return False
    return plan_wfuse(B, H2, W, W2, Wo, C, dtype) is not None
