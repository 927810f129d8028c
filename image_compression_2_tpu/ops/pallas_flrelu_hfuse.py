"""H-up-in-kernel fused filtered-lrelu (mode='hfuse').

mmfuse2/3 fuse W-up → lrelu → W-down in one Pallas kernel but still
materialise the H-upsampled tensor in HBM: the H-up einsum writes
``[B, H2, *, *]`` (2x the layer tensor) and the kernel reads it back.  At
256²b8 each such stage runs at ~34% of HBM peak (runs/r3_fir_variants_256),
so the formulation's traffic count is the whole game.

hfuse moves the H-up INSIDE the kernel:

    grid (B, C/Ct, H2/Ht)          # h fastest: the x block is revisited,
                                   # so Pallas skips its copy across h steps
    x block      [H, W, Ct]        # the layer input, NHWC, read ONCE per (b,c)
    t1[ht,W,Ct]  = Σ_H  Au[ht,H] · x[H,W,Ct]     (contract x's page dim)
    t2[ht,Ct,W2] = Σ_W  t1[ht,W,Ct] · AuwT[W,W2] (contract sublane dim)
    y            = clamp(lrelu(t2)) · gain
    t3[ht,Ct,Wo] = Σ_W2 y[ht,Ct,W2] · AdwT[W2,Wo] (contract lane dim)

Output is channels-middle ``[B, H2, C, Wo]`` — the same contract as
mmfuse2, so the closing H-down einsum restores NHWC while contracting the
smallest tensor in the layer.  HBM traffic: read x once, write t3 once,
plus the closing einsum — ~6 tensor-units vs ~10 for mmfuse2/3 and ~13 for
the sandwich matmul formulation.

The one lowering question this kernel asks Mosaic is the FIRST contraction:
a rank-3 rhs contracted over its page (outermost) dim.  The policy sweep
answers whether the compiled form wins; correctness is pinned by the
interpret-mode tests either way.

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

# hfuse keeps one [H, W, Ct] input block resident across the h-fastest grid
# (plus f32 accumulators), so its working set is legitimately larger than
# wfuse2/3's 12 MiB heuristic — the big 256² layers need 23-44 MiB blocks.
# The pallas_call raises the scoped-VMEM cap to match (same mechanism as
# ops/pallas_layerfuse.py; v5e VMEM is 128 MiB).
_HFUSE_VMEM_BUDGET = 56 * 1024 * 1024


@dataclasses.dataclass(frozen=True)
class HfusePlan:
    B: int
    H: int
    H2: int
    W: int
    W2: int
    Wo: int
    C: int
    Ht: int
    Ct: int
    dtype: str

    @property
    def grid(self):
        # h fastest so the x block index (b, 0, 0, c) is unchanged across
        # consecutive steps and Pallas elides its HBM->VMEM copy
        return (self.B, pl.cdiv(self.C, self.Ct), pl.cdiv(self.H2, self.Ht))


def plan_hfuse(B: int, H: int, H2: int, W: int, W2: int, Wo: int, C: int,
               dtype) -> Optional[HfusePlan]:
    """Largest (Ht, Ct) whose working set fits VMEM, or None.

    Mosaic only lowers input blocks whose LANE (channel) dimension is a
    multiple of 128 or equal to the array's — the round-5 sweep's Ct=64
    fallback lowered in interpret mode but failed on-chip at every big
    256² layer (`runs/r5_policy_fwd.txt`), which silently excluded hfuse
    from the layers carrying ~44 of the stack's 58 ms.  Candidates are
    therefore 128-multiples dividing C, or the full C (the wrapper pads
    channels to a 128 multiple when C > 128 and C % 128 != 0).
    """
    isz = jnp.dtype(dtype).itemsize
    if C % 128 == 0:
        cts = [c for c in (256, 128) if C % c == 0]
    else:
        cts = [C]  # lane dim == array dim is the other legal form
    for ct in cts:
        for Ht in (64, 32, 16, 8, 4):
            if Ht > H2 and Ht != 4:
                continue
            n = Ht * ct
            est = (
                2 * H * W * ct * isz         # resident x block (+ spare)
                + (H2 * H + W2 * W + Wo * W2) * isz   # operator matrices
                + Ht * W * ct * 4            # t1 accumulator (f32)
                + Ht * W * ct * isz          # t1 cast for the 2nd dot
                + W2 * n * 4                 # t2 accumulator (f32)
                + W2 * n * isz               # lrelu output for the 3rd dot
                + Wo * n * 4                 # t3 accumulator (f32)
                + 2 * Ht * Wo * ct * isz     # output block, double-buffered
            )
            if est <= _HFUSE_VMEM_BUDGET:
                return HfusePlan(B, H, H2, W, W2, Wo, C, Ht, ct,
                                 jnp.dtype(dtype).name)
    return None


def _pad_channels(C: int) -> int:
    """Channel count the kernel actually runs at: padded up to a 128
    multiple when C > 128 and C % 128 != 0 (keeps the lane block legal with
    small 128-channel tiles instead of one giant full-C block)."""
    if C > 128 and C % 128 != 0:
        return ((C + 127) // 128) * 128
    return C


def _kernel(x_ref, ah_ref, au_ref, ad_ref, o_ref, *, slope, gain, clamp):
    x = x_ref[0]       # [H, W, Ct] — the layer input block, NHWC layout
    ah = ah_ref[:]     # [Ht, H]    — this h-tile's rows of the H-up operator
    # 1) H-up: contract x's page dim.  Output [Ht, W, Ct].
    t1 = jax.lax.dot_general(
        ah, x, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # 2) W-up: contract the sublane (W) dim — native lhs-transposed form.
    #    Output [Ht, Ct, W2].
    t2 = jax.lax.dot_general(
        t1.astype(x.dtype), au_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = jnp.where(t2 >= 0, t2, t2 * slope)
    if gain != 1.0:
        y = y * gain
    if clamp is not None:
        y = jnp.clip(y, -clamp, clamp)
    # 3) W-down: contract the lane (W2) dim — classic matmul.  [Ht, Ct, Wo].
    t3 = jax.lax.dot_general(
        y.astype(x.dtype), ad_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = t3.astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _build_call(plan: HfusePlan, slope: float, gain: float,
                clamp: Optional[float]):
    kern = functools.partial(_kernel, slope=slope, gain=gain, clamp=clamp)
    return pl.pallas_call(
        kern,
        grid=plan.grid,
        in_specs=[
            pl.BlockSpec((1, plan.H, plan.W, plan.Ct),
                         lambda b, c, h: (b, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.Ht, plan.H), lambda b, c, h: (h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.W, plan.W2), lambda b, c, h: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((plan.W2, plan.Wo), lambda b, c, h: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, plan.Ht, plan.Ct, plan.Wo),
                               lambda b, c, h: (b, h, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (plan.B, plan.H2, plan.C, plan.Wo), jnp.dtype(plan.dtype)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * plan.B * plan.C
            * (plan.H2 * plan.H * plan.W                 # H-up
               + plan.H2 * (plan.W2 * plan.W + plan.Wo * plan.W2)),
            bytes_accessed=plan.B * plan.C
            * (plan.H * plan.W + plan.H2 * plan.Wo)
            * jnp.dtype(plan.dtype).itemsize,
            transcendentals=0,
        ),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def hfuse_middle(x: jnp.ndarray, A_hup: jnp.ndarray, A_wupT: jnp.ndarray,
                 A_wdnT: jnp.ndarray, slope: float, gain: float,
                 clamp: Optional[float], plan: HfusePlan) -> jnp.ndarray:
    """H-up + W-up → lrelu → W-down, one kernel.

    x: [B, H, W, C] (bias already applied); A_hup: [H2, H];
    A_wupT: [W, W2]; A_wdnT: [W2, Wo].  Out: [B, H2, C, Wo].
    """
    return _build_call(plan, slope, gain, clamp)(x, A_hup, A_wupT, A_wdnT)


def _hfuse_fwd(x, A_hup, A_wupT, A_wdnT, slope, gain, clamp, plan):
    return hfuse_middle(x, A_hup, A_wupT, A_wdnT, slope, gain, clamp, plan), (
        x, A_hup, A_wupT, A_wdnT)


def _hfuse_bwd(slope, gain, clamp, plan, res, g):
    # Plain-XLA backward (recompute t2).  The forward is an inference-path
    # kernel; the policy's fwd+bwd table keeps it off training paths unless
    # this einsum backward measures as a win there.
    x, A_hup, A_wupT, A_wdnT = res
    t1 = jnp.einsum("gH,bHWc->bgWc", A_hup, x,
                    preferred_element_type=jnp.float32).astype(x.dtype)
    t2 = jnp.einsum("bhWc,Wv->bhcv", t1, A_wupT,
                    preferred_element_type=jnp.float32)
    deriv = jnp.where(t2 >= 0, 1.0, slope) * gain
    if clamp is not None:
        z = jnp.where(t2 >= 0, t2, t2 * slope) * gain
        deriv = jnp.where(jnp.abs(z) <= clamp, deriv, 0.0)
    g_y = jnp.einsum("bhcw,vw->bhcv", g.astype(A_wdnT.dtype), A_wdnT,
                     preferred_element_type=jnp.float32)
    g_t2 = (g_y * deriv).astype(x.dtype)
    g_t1 = jnp.einsum("bhcv,Wv->bhWc", g_t2, A_wupT)
    g_x = jnp.einsum("gH,bgWc->bHWc", A_hup, g_t1.astype(x.dtype))
    return (g_x.astype(x.dtype), jnp.zeros_like(A_hup),
            jnp.zeros_like(A_wupT), jnp.zeros_like(A_wdnT))


hfuse_middle.defvjp(_hfuse_fwd, _hfuse_bwd)


def filtered_lrelu_hfuse(
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
    """filtered_lrelu with H-up AND the W axis fused in one kernel
    (mode='hfuse').  Same contract as ``filtered_lrelu``; requires
    separable 1-D filters."""
    from .bias_act import bias_act
    from .upfirdn2d import _parse_padding
    from .upfirdn_matmul import fir_matrix, _prec

    px0, px1, py0, py1 = _parse_padding(padding)
    fu = np.ones([1], np.float32) if fu is None else np.asarray(fu, np.float32)
    fd = np.ones([1], np.float32) if fd is None else np.asarray(fd, np.float32)
    assert fu.ndim == 1 and fd.ndim == 1, "hfuse expects separable filters"
    B, H, W, C = x.shape

    A_h_up = fir_matrix(fu, H, up, 1, py0, py1, float(up ** 2))
    A_w_up = fir_matrix(fu, W, up, 1, px0, px1, 1.0)
    H2 = A_h_up.shape[0]
    W2 = A_w_up.shape[0]
    A_w_dn = fir_matrix(fd, W2, 1, down, 0, 0, 1.0)
    A_h_dn = fir_matrix(fd, H2, 1, down, 0, 0, 1.0)
    Wo = A_w_dn.shape[0]

    Cp = _pad_channels(C)
    plan = plan_hfuse(B, H, H2, W, W2, Wo, Cp, x.dtype)
    if plan is None:
        raise ValueError("no legal hfuse block for this geometry")

    x = bias_act(x, b)
    prec = _prec(x, fp32_mxu)
    if Cp != C:
        # zero channels cost one extra lane tile of traffic but keep the
        # kernel on small 128-channel blocks (plan_hfuse's legality note)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, Cp - C)))
    t3 = hfuse_middle(x, jnp.asarray(A_h_up, x.dtype),
                      jnp.asarray(A_w_up.T, x.dtype),
                      jnp.asarray(A_w_dn.T, x.dtype),
                      float(slope), float(gain),
                      None if clamp is None else float(clamp), plan)
    if Cp != C:
        t3 = t3[:, :, :C, :]
    Ad = jnp.asarray(A_h_dn, x.dtype)
    # closing H-down einsum restores NHWC on the smallest tensor of the layer
    return jnp.einsum("uh,bhcw->buwc", Ad, t3, precision=prec)


def fits_hfuse(B, H, W, C, up, down, fu_taps, fd_taps, padding,
               dtype=jnp.bfloat16) -> bool:
    """Cheap feasibility probe (mirrors filtered_lrelu_hfuse's sizes)."""
    from .upfirdn2d import _parse_padding

    px0, px1, py0, py1 = _parse_padding(padding)
    H2 = H * up + py0 + py1 - fu_taps + 1
    W2 = W * up + px0 + px1 - fu_taps + 1
    Wo = (W2 - fd_taps) // down + 1
    if H2 <= 0 or W2 <= 0 or Wo <= 0:
        return False
    return plan_hfuse(B, H, H2, W, W2, Wo, _pad_channels(C),
                      dtype) is not None
