"""Whole-synthesis-layer fused Pallas kernel ("layerfuse").

The round-4 roofline (`runs/r4_roofline.txt`, RESULTS.md) isolated a fixed
~1.4 ms/layer dispatch/layout floor on the small early synthesis layers
(36²/52² planes, 512 channels): their filtered-lrelu stacks run 5-50x above
their HBM-traffic bound, and the modulated conv in front of each adds its
own op boundary and HBM round-trip.  This kernel erases the whole layer's
interior traffic: ONE pallas_call computes

    modulated 3x3 conv (input-scaled form) -> demod -> bias
      -> H-up FIR -> W-up FIR -> leaky-ReLU·gain·clamp -> W-down FIR

with grid (B, C_out/Ct) and every intermediate — including the conv output
and the 2x-oversampled activation — living in VMEM.  The conv runs as
k·k shifted [H·W, C_in]x[C_in, Ct] MXU contractions on the style-scaled
input block; modulation rides the same input/output-scaling identity as
``modulated_conv2d`` (styles scale the input, demod scales the conv
output), so the shared weight stays MXU-stationary.  Output is
channels-middle ``[B, H2, C_out, Wo]`` (the mmfuse2/hfuse contract) and the
closing H-down einsum restores NHWC while contracting the smallest tensor
of the layer.

HBM traffic per (b, c) step: the input block once (revisited across c — the
copy is elided), one weight tile, one output tile.  Versus the unfused
path's conv-out write + flrelu read + oversampled spill, the formulation
drops to ~3 tensor-units — this is one fusion level BEYOND the reference's
CUDA ``filtered_lrelu`` (which fuses only the nonlinearity stage; the conv
in front still round-trips HBM there, see SURVEY §2.7).

Gradients: the layer is part of the refinement path (encode-time inversion
differentiates through the frozen generator), so a custom VJP recomputes
the layer with the plain-XLA ops and returns exact grads for
(x, weight, styles, bias).  The policy's forward table decides where the
fused kernel runs; training keeps the unfused path.

Capability parity: the fused CUDA `filtered_lrelu` + per-layer modulated
conv the reference's frozen generator executes inside ``G.synthesis``
(`/root/reference/stylegan3_hvae_full.py:274`).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_flrelu_wfuse2 import _VMEM_BUDGET


@dataclasses.dataclass(frozen=True)
class LayerfusePlan:
    B: int
    Hp: int      # padded conv input height  (H + 2(k-1))
    Wp: int
    Hc: int      # conv output height        (H + k - 1, 'full' conv)
    Wc: int
    H2: int      # oversampled height after H-up
    W2: int
    Wo: int      # width after W-down
    Cin: int
    Cout: int
    k: int
    Ct: int
    dtype: str

    @property
    def grid(self):
        # c fastest: the padded-input block index (b, 0, 0, 0) is unchanged
        # across consecutive steps, so Pallas elides its HBM->VMEM copy
        return (self.B, self.Cout // self.Ct)


def plan_layerfuse(B: int, H: int, W: int, Cin: int, Cout: int, k: int,
                   H2: int, W2: int, Wo: int, dtype,
                   ct: Optional[int] = None) -> Optional[LayerfusePlan]:
    """Largest Ct whose working set fits VMEM, or None.

    ``ct``: exact channel tile, bypassing the budget estimate — used when a
    policy entry records the tile the sweep already compiled and timed on
    this hardware (the estimate is conservative: it sums stage buffers whose
    lifetimes don't overlap, so the compiler regularly fits tiles it
    rejects)."""
    isz = jnp.dtype(dtype).itemsize
    Hp, Wp = H + 2 * (k - 1), W + 2 * (k - 1)
    Hc, Wc = H + k - 1, W + k - 1

    # Mosaic tiling: the weight/bias/demod blocks put Ct in the lane dim, so
    # a block only lowers when Ct is a multiple of 128 or covers Cout whole
    # (the 2026-08-19 on-chip sweep rejected every 64/32 tile on exactly
    # this rule).
    def legal(c):
        return c % 128 == 0 or c == Cout

    if ct is not None:
        if Cout % ct or not legal(ct):
            return None
        return LayerfusePlan(B, Hp, Wp, Hc, Wc, H2, W2, Wo,
                             Cin, Cout, k, ct, jnp.dtype(dtype).name)
    for ct in sorted({c for c in (128, 256, Cout)
                      if c <= Cout and Cout % c == 0 and legal(c)},
                     reverse=True):
        est = (
            2 * Hp * Wp * Cin * isz          # resident input block (+ spare)
            + Hp * Wp * Cin * isz            # style-scaled copy
            + Hc * Wc * Cin * isz            # shifted slice temp
            + 2 * k * k * Cin * ct * isz     # weight tile, double-buffered
            + Hc * Wc * ct * (4 + isz)       # conv accumulator + cast
            + H2 * Wc * ct * (4 + isz)       # H-up accumulator + cast
            + W2 * H2 * ct * (4 + isz)       # W-up accumulator + lrelu cast
            + Wo * H2 * ct * 4               # W-down accumulator
            + 2 * H2 * ct * Wo * isz         # output block, double-buffered
        )
        if est <= _VMEM_BUDGET:
            return LayerfusePlan(B, Hp, Wp, Hc, Wc, H2, W2, Wo,
                                 Cin, Cout, k, ct, jnp.dtype(dtype).name)
    return None


def _kernel(xp_ref, w_ref, s_ref, d_ref, bias_ref, ah_ref, au_ref, ad_ref,
            o_ref, *, plan: LayerfusePlan, slope, gain, clamp):
    dt = xp_ref.dtype
    # style-modulate the padded input block: [Hp, Wp, Cin]
    # (styles/demod ride a [B, 1, C] layout: a [1, 1, C] block keeps the
    # sublane dim equal to the array dim, which Mosaic always accepts —
    # a [1, C] row block of a [B, C] array does not lower)
    xm = xp_ref[0] * s_ref[0, 0].astype(dt)[None, None, :]
    # 'full' 3x3 conv as k*k shifted MXU contractions over C_in
    acc = jnp.zeros((plan.Hc, plan.Wc, plan.Ct), jnp.float32)
    for dy in range(plan.k):
        for dx in range(plan.k):
            sl = xm[dy:dy + plan.Hc, dx:dx + plan.Wc, :]
            acc = acc + jax.lax.dot_general(
                sl, w_ref[dy, dx], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    # demodulate (per-sample per-out-channel) and add the layer bias in the
    # compute dtype — the same cast points as the unfused path
    t0 = (acc * d_ref[0, 0][None, None, :]).astype(dt) + bias_ref[0].astype(dt)
    # H-up: contract t0's page dim.  [H2, Wc, Ct]
    t1 = jax.lax.dot_general(
        ah_ref[:], t0, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # W-up: contract the sublane (W) dim.  [H2, Ct, W2]
    t2 = jax.lax.dot_general(
        t1.astype(dt), au_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = jnp.where(t2 >= 0, t2, t2 * slope)
    if gain != 1.0:
        y = y * gain
    if clamp is not None:
        y = jnp.clip(y, -clamp, clamp)
    # W-down: contract the lane (W2) dim.  [H2, Ct, Wo]
    t3 = jax.lax.dot_general(
        y.astype(dt), ad_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = t3.astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _build_call(plan: LayerfusePlan, slope: float, gain: float,
                clamp: Optional[float]):
    kern = functools.partial(_kernel, plan=plan, slope=slope, gain=gain,
                             clamp=clamp)
    p = plan
    return pl.pallas_call(
        kern,
        grid=p.grid,
        in_specs=[
            pl.BlockSpec((1, p.Hp, p.Wp, p.Cin), lambda b, c: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p.k, p.k, p.Cin, p.Ct), lambda b, c: (0, 0, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p.Cin), lambda b, c: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p.Ct), lambda b, c: (b, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p.Ct), lambda b, c: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p.H2, p.Hc), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p.Wc, p.W2), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p.W2, p.Wo), lambda b, c: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, p.H2, p.Ct, p.Wo),
                               lambda b, c: (b, 0, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (p.B, p.H2, p.Cout, p.Wo), jnp.dtype(p.dtype)),
        # the whole layer's intermediates live on the kernel stack: the
        # default 16 MiB scoped-vmem limit rejects every production geometry
        # (the 2026-08-19 sweep OOMed at 21-30 MiB) while v5e has 128 MiB of
        # VMEM and this kernel is the only one resident — raise the cap and
        # let Mosaic's real allocator arbitrate
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * p.B * (
                p.k * p.k * p.Hc * p.Wc * p.Cin * p.Cout       # conv
                + p.Cout * (p.H2 * p.Hc * p.Wc                 # H-up
                            + p.H2 * (p.W2 * p.Wc + p.Wo * p.W2))),
            bytes_accessed=p.B * (
                p.Hp * p.Wp * p.Cin + p.H2 * p.Cout * p.Wo
            ) * jnp.dtype(p.dtype).itemsize
            + p.B * p.k * p.k * p.Cin * p.Cout * jnp.dtype(p.dtype).itemsize,
            transcendentals=0,
        ),
    )


def _modulation(weight, styles, input_gain):
    """Pre-normalised weight, input scale, and demod coefficients — the
    exact arithmetic of ``modulated_conv2d`` (input/output-scaling form)."""
    w = weight.astype(jnp.float32)
    s = styles.astype(jnp.float32)
    w = w * jax.lax.rsqrt(jnp.mean(jnp.square(w), axis=(0, 1, 2),
                                   keepdims=True))
    s = s * jax.lax.rsqrt(jnp.mean(jnp.square(s)))
    in_scale = s
    if input_gain is not None:
        in_scale = in_scale * jnp.asarray(input_gain, jnp.float32)
    w_sq = jnp.sum(jnp.square(w), axis=(0, 1))                # [Cin, Cout]
    dcoefs = jax.lax.rsqrt(jnp.einsum(
        "io,bi->bo", w_sq, jnp.square(s),
        preferred_element_type=jnp.float32) + 1e-8)           # [B, Cout]
    return w, in_scale, dcoefs


def _band_matrices(fu, fd, H, W, up, down, padding):
    from .upfirdn2d import _parse_padding
    from .upfirdn_matmul import fir_matrix

    px0, px1, py0, py1 = _parse_padding(padding)
    fu = np.asarray(fu, np.float32)
    fd = np.asarray(fd, np.float32)
    assert fu.ndim == 1 and fd.ndim == 1, "layerfuse expects separable filters"
    A_h_up = fir_matrix(fu, H, up, 1, py0, py1, float(up ** 2))
    A_w_up = fir_matrix(fu, W, up, 1, px0, px1, 1.0)
    H2, W2 = A_h_up.shape[0], A_w_up.shape[0]
    A_w_dn = fir_matrix(fd, W2, 1, down, 0, 0, 1.0)
    A_h_dn = fir_matrix(fd, H2, 1, down, 0, 0, 1.0)
    return A_h_up, A_w_up, A_w_dn, A_h_dn


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10, 11))
def _layerfuse(x, weight, styles, bias, input_gain,
               fu, fd, up, down, padding, flrelu_kw, plan):
    w, in_scale, dcoefs = _modulation(weight, styles, input_gain)
    A_h_up, A_w_up, A_w_dn, A_h_dn = _band_matrices(
        fu, fd, x.shape[1] + plan.k - 1, x.shape[2] + plan.k - 1,
        up, down, padding)
    dt = x.dtype
    pk = plan.k - 1
    xp = jnp.pad(x, ((0, 0), (pk, pk), (pk, pk), (0, 0)))
    out = _build_call(plan, flrelu_kw["slope"], flrelu_kw["gain"],
                      flrelu_kw["clamp"])(
        xp, w.astype(dt),
        in_scale.reshape(in_scale.shape[0], 1, -1),
        dcoefs.reshape(dcoefs.shape[0], 1, -1),
        bias.astype(jnp.float32).reshape(1, -1),
        jnp.asarray(A_h_up, dt), jnp.asarray(A_w_up.T, dt),
        jnp.asarray(A_w_dn.T, dt))
    # closing H-down einsum restores NHWC on the smallest tensor of the layer
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32 else None)
    return jnp.einsum("uh,bhcw->buwc", jnp.asarray(A_h_dn, dt), out,
                      precision=prec)


def _ref_layer(x, weight, styles, bias, input_gain,
               fu, fd, up, down, padding, flrelu_kw, plan):
    """Plain-XLA recomputation with the exact unfused semantics (backward)."""
    from .filtered_lrelu import filtered_lrelu
    from .modulated_conv import modulated_conv2d

    y = modulated_conv2d(x, weight, styles, demodulate=True,
                         padding=plan.k - 1, input_gain=input_gain)
    return filtered_lrelu(y, np.asarray(fu), np.asarray(fd), bias,
                          up=up, down=down, padding=padding,
                          gain=flrelu_kw["gain"], slope=flrelu_kw["slope"],
                          clamp=flrelu_kw["clamp"], mode="matmul")


def _layerfuse_fwd(x, weight, styles, bias, input_gain,
                   fu, fd, up, down, padding, flrelu_kw, plan):
    out = _layerfuse(x, weight, styles, bias, input_gain,
                     fu, fd, up, down, padding, flrelu_kw, plan)
    return out, (x, weight, styles, bias, input_gain)


def _layerfuse_bwd(fu, fd, up, down, padding, flrelu_kw, plan, res, g):
    x, weight, styles, bias, input_gain = res
    _, vjp = jax.vjp(
        lambda x_, w_, s_, b_, ig_: _ref_layer(
            x_, w_, s_, b_, ig_, fu, fd, up, down, padding, flrelu_kw, plan),
        x, weight, styles, bias, input_gain)
    return vjp(g.astype(x.dtype))


_layerfuse.defvjp(_layerfuse_fwd, _layerfuse_bwd)


def fused_synthesis_layer(
    x: jnp.ndarray,          # [B, H, W, Cin]
    weight: jnp.ndarray,     # [k, k, Cin, Cout] (HWIO)
    styles: jnp.ndarray,     # [B, Cin]
    bias: jnp.ndarray,       # [Cout]
    fu: np.ndarray,
    fd: np.ndarray,
    up: int,
    down: int,
    padding,
    input_gain: Optional[jnp.ndarray] = None,
    gain: float = float(np.sqrt(2.0)),
    slope: float = 0.2,
    clamp: Optional[float] = 256.0,
    ct: Optional[int] = None,
) -> jnp.ndarray:
    """One fused synthesis layer: modulated conv ('full' padding) + demod +
    bias + filtered leaky-ReLU resampling.  Semantics identical to
    ``modulated_conv2d(padding=k-1)`` followed by ``filtered_lrelu``.
    ``ct``: exact channel tile from a measured policy entry."""
    plan = fits_layerfuse(x.shape[0], x.shape[1], x.shape[2],
                          weight.shape[2], weight.shape[3], weight.shape[0],
                          up, down,
                          len(np.asarray(fu)), len(np.asarray(fd)),
                          padding, dtype=x.dtype, return_plan=True, ct=ct)
    if plan is None:
        raise ValueError("no legal layerfuse block for this geometry")
    kw = dict(gain=float(gain), slope=float(slope),
              clamp=None if clamp is None else float(clamp))
    # dict isn't hashable for nondiff caching inside custom_vjp residuals;
    # pass an immutable view
    kw = _FrozenKw(kw)
    if input_gain is None:
        input_gain = jnp.ones([], jnp.float32)
    return _layerfuse(x, weight, styles, bias, input_gain,
                      _np_tuple(fu), _np_tuple(fd), int(up), int(down),
                      _pad_tuple(padding), kw, plan)


class _FrozenKw(dict):
    """Hashable kwargs carrier (custom_vjp nondiff args must be hashable)."""

    def __hash__(self):
        return hash(tuple(sorted(self.items())))

    def __setitem__(self, *a):  # pragma: no cover - guard
        raise TypeError("frozen")


def _np_tuple(f) -> Tuple[float, ...]:
    return tuple(float(v) for v in np.asarray(f, np.float64).ravel())


def _pad_tuple(padding):
    from .upfirdn2d import _parse_padding

    return tuple(_parse_padding(padding))


def fits_layerfuse(B, H, W, Cin, Cout, k, up, down, fu_taps, fd_taps,
                   padding, dtype=jnp.bfloat16, return_plan: bool = False,
                   ct: Optional[int] = None):
    """Cheap feasibility probe (mirrors fused_synthesis_layer's sizes)."""
    from .upfirdn2d import _parse_padding

    px0, px1, py0, py1 = _parse_padding(padding)
    Hc, Wc = H + k - 1, W + k - 1
    H2 = Hc * up + py0 + py1 - fu_taps + 1
    W2 = Wc * up + px0 + px1 - fu_taps + 1
    Wo = (W2 - fd_taps) // down + 1
    if H2 <= 0 or W2 <= 0 or Wo <= 0:
        return None if return_plan else False
    plan = plan_layerfuse(B, H, W, Cin, Cout, k, H2, W2, Wo, dtype, ct=ct)
    return plan if return_plan else plan is not None
