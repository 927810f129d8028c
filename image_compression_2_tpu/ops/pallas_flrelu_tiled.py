"""H-tiled, double-buffered fused filtered-leaky-ReLU Pallas TPU kernel.

The whole-plane kernel (``pallas_flrelu.py``) keeps the full 2x-oversampled
grid in VMEM, which excludes every layer past ~52² at 512 channels — exactly
the layers where the XLA matmul path pays the most HBM traffic (the
oversampled intermediate is written+read four times between stages).  This
kernel removes that cap by streaming the plane in horizontal bands:

    for each (batch, channel-tile, output-row-chunk):
        DMA the needed INPUT row band HBM -> VMEM   (double-buffered)
        H-up   : banded operator  [h2_len, hband] @ band     (MXU)
        W-up   : dense operator   [W2, W]                    (MXU)
        bias + leaky-ReLU + clamp                            (VPU, fp32)
        W-down : dense operator   [Wo, W2]                   (MXU)
        H-down : banded operator  [ho_len, h2_len]           (MXU)
        write the output row chunk                           (pipelined)

Key geometry fact making this uniform: with the output chunk length chosen so
``ho_len*down % up == 0``, every chunk's input band has the same width and
the same relative operator matrices (the FIR chain is shift-invariant once
the input is zero-padded to cover the filter footprints).  The banded H
matrices contract ~hband≈(h2_len+taps)/up rows instead of the full H, so this
formulation also deletes most of the dense path's "FIR overhead" FLOPs.

Replaces (with the matmul/conv fallbacks) the reference generator's fused
``filtered_lrelu`` CUDA op executed inside ``G.synthesis``
(/root/reference/stylegan3_hvae_full.py:274).

Mosaic constraints inherited from the whole-plane kernel: channel tiles are
multiples of 128 lanes (channels are zero-padded up when needed — lrelu(0)=0
and FIR of zeros is zero, so padded channels stay zero and are sliced off);
every dot contracts dim 0 of the data operand with a left matrix; the
activation runs in fp32 (no bf16 vector compare).
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

from .upfirdn2d import Padding, _parse_padding
from .upfirdn_matmul import fir_matrix

_VMEM_BUDGET = 13 * 1024 * 1024


def _channel_tiles(C_pad: int):
    """Candidate channel tiles, preferred first.  One whole-channel tile
    (when the padded channel dim fits 512 lanes) makes K == 1, turning the
    [B, Hp, W, K, ct] -> [B, K, Hp, W, ct] input shuffle into a free reshape
    instead of an HBM-pass transpose; 128 is the fallback when the wider
    working set does not fit VMEM."""
    if C_pad <= 512 and C_pad != 128:
        return (C_pad, 128)
    return (128,)


def _w_subs(h2_len: int, ct: int):
    """Candidate oversampled-rows-per-W-stage-sub-slice, preferred first:
    dot N = wsub*ct ~ 4096 amortises MXU weight loads; 8 (one sublane tile)
    is the smallest fallback.  Kept a multiple of 8 so the [W, wsub, ct]
    transposes stay sublane-tile aligned."""
    target = max(8, min(h2_len, 4096 // ct) // 8 * 8)
    return (target, 8) if target != 8 else (8,)


@dataclasses.dataclass(frozen=True)
class _Plan:
    """Fully-resolved static geometry for one kernel build."""

    H: int
    W: int
    W_pad: int        # input width padded to a sublane-tile multiple (the
                      # band DMA slices the full W axis of a tiled memref, so
                      # its length must be tile-aligned; A_wu gets matching
                      # zero columns, making the padding inert)
    C: int            # true channel count
    C_pad: int        # padded to a multiple of ct
    ct: int
    up: int
    down: int
    H2: int
    W2: int
    Ho: int
    Wo: int
    ho_len: int       # output rows per chunk
    h2_len: int       # oversampled rows needed per chunk
    wsub: int         # oversampled rows per W-stage sub-slice
    hband: int        # input rows needed per chunk
    in_stride: int    # input-row stride between chunks (in padded coords)
    n_chunks: int
    p_top: int        # zero-padding of the input along H
    p_bot: int
    pad: Tuple[int, int, int, int]


def _chunk_candidates(Ho: int, down: int, up: int):
    """Candidate output-row chunk lengths, largest first.

    ho_len need NOT divide Ho — the output is row-padded to a whole number of
    chunks and sliced back.  Larger chunks amortise the taps_d-down row
    overlap between consecutive oversampled bands (pure duplicated W-stage
    work) and give the MXU bigger M dimensions."""
    cands = [
        L for L in range(min(Ho, 256), 1, -1)
        if (L * down) % up == 0 and L % 2 == 0
    ]
    return cands


def _geometry(H, W, up, down, pad, taps_u, taps_d):
    px0, px1, py0, py1 = pad
    H2 = H * up + py0 + py1 - taps_u + 1
    W2 = W * up + px0 + px1 - taps_u + 1
    Ho = (H2 - taps_d) // down + 1
    Wo = (W2 - taps_d) // down + 1
    return H2, W2, Ho, Wo


def _band(py0, up, taps_u, m_lo, m_hi):
    """Input-row range feeding oversampled rows [m_lo, m_hi]."""
    i_lo = -((-(m_lo - py0)) // up)            # ceil((m_lo - py0) / up)
    i_hi = (m_hi - py0 + taps_u - 1) // up
    return i_lo, i_hi


def plan_tiled(H, W, C, up, down, fu_taps, fd_taps, padding: Padding,
               carry_bytes: int = 2) -> Optional[_Plan]:
    """Choose the largest uniform output-row chunk that fits VMEM.

    Returns None when the op has no resampling (up == down == 1) or no legal
    chunking exists."""
    if up == 1 and down == 1:
        return None
    pad = _parse_padding(padding)
    H2, W2, Ho, Wo = _geometry(H, W, up, down, pad, fu_taps, fd_taps)
    if min(H2, W2, Ho, Wo) <= 0:
        return None
    C_pad = -(-C // 128) * 128
    W_pad = -(-W // 16) * 16  # 16 covers fp32 (8,128) and packed bf16 tiles
    px0, px1, py0, py1 = pad
    # Preference order: whole-channel tile (K=1, free input reshape) beats
    # any chunk length, then largest chunk, then the wide W-stage sub-slice.
    for ct in _channel_tiles(C_pad):
        for ho_len in _chunk_candidates(Ho, down, up):
            h2_len = (ho_len - 1) * down + fd_taps
            i_lo0, i_hi0 = _band(py0, up, fu_taps, 0, h2_len - 1)
            hband = i_hi0 - i_lo0 + 1
            n_chunks = -(-Ho // ho_len)  # output row-padded to whole chunks
            for wsub in _w_subs(h2_len, ct):
                # VMEM working set: the oversampled-width stage runs in row
                # sub-slices of wsub, so only [W2, wsub, ct] ever
                # materialises
                h2_pad = -(-h2_len // wsub) * wsub  # t1/t3 padded to wsub
                work = (
                    2 * hband * W_pad * ct * carry_bytes   # DMA slots
                    + h2_pad * W_pad * ct * carry_bytes    # t1 scratch
                    + 2 * wsub * W_pad * ct * carry_bytes  # slice+transpose
                    + 3 * W2 * wsub * ct * carry_bytes     # t2 pre/act/post
                    + 2 * Wo * wsub * ct * carry_bytes     # t3 slice+transp.
                    + h2_pad * Wo * ct * carry_bytes       # t3 scratch
                    + 2 * ho_len * Wo * ct * carry_bytes   # output dbl buf
                    + carry_bytes * (h2_len * hband + W2 * W_pad
                                     + Wo * W2 + ho_len * h2_len)  # operators
                )
                if work > _VMEM_BUDGET:
                    continue
                m_last = (n_chunks - 1) * ho_len * down + h2_len - 1
                _, i_hi_last = _band(py0, up, fu_taps, 0, m_last)
                p_top = max(0, -i_lo0)
                p_bot = max(0, i_hi_last - (H - 1))
                return _Plan(
                    H=H, W=W, W_pad=W_pad, C=C, C_pad=C_pad, ct=ct,
                    up=up, down=down, H2=H2, W2=W2, Ho=Ho, Wo=Wo,
                    ho_len=ho_len, h2_len=h2_len, wsub=wsub, hband=hband,
                    in_stride=(ho_len * down) // up, n_chunks=n_chunks,
                    p_top=p_top, p_bot=p_bot, pad=pad,
                )
    return None


def _relative_operators(plan: _Plan, fu, fd, gain_up: float):
    """The chunk-invariant banded H operators + dense W operators."""
    px0, px1, py0, py1 = plan.pad
    up, taps_u = plan.up, 1 if fu is None else len(fu)
    fu_arr = np.ones([1], np.float32) if fu is None else np.asarray(fu)
    fd_arr = np.ones([1], np.float32) if fd is None else np.asarray(fd)
    taps_d = len(fd_arr)

    i_lo0, _ = _band(py0, up, taps_u, 0, plan.h2_len - 1)
    # relative H-up operator: rows = chunk oversampled rows, cols = band
    pad_lo_rel = py0 + i_lo0 * up
    pad_hi_rel = plan.h2_len + taps_u - 1 - plan.hband * up - pad_lo_rel
    A_up = fir_matrix(fu_arr, plan.hband, up, 1, pad_lo_rel, pad_hi_rel,
                      gain_up)
    assert A_up.shape == (plan.h2_len, plan.hband), (A_up.shape, plan)
    # relative H-down operator (pure valid decimating FIR, shift-invariant)
    A_dn = fir_matrix(fd_arr, plan.h2_len, 1, plan.down, 0, 0, 1.0)
    assert A_dn.shape == (plan.ho_len, plan.h2_len), (A_dn.shape, plan)
    # full-width dense W operators (same as the matmul path)
    A_wu = fir_matrix(fu_arr, plan.W, up, 1, px0, px1, 1.0)
    A_wd = fir_matrix(fd_arr, plan.W2, 1, plan.down, 0, 0, 1.0)
    assert A_wu.shape == (plan.W2, plan.W) and A_wd.shape == (plan.Wo, plan.W2)
    if plan.W_pad != plan.W:
        # zero columns for the tile-alignment padding of the input width
        A_wu = np.pad(A_wu, [(0, 0), (0, plan.W_pad - plan.W)])

    # shift-invariance proof: the relative operator reproduces the full
    # (zero-pad-extended) operator at every chunk offset.  The operator is
    # row-extended past H2 to cover the padded last chunk (those extra
    # output rows are sliced off after the kernel).
    m_max = (plan.n_chunks - 1) * plan.ho_len * plan.down + plan.h2_len
    extra = max(0, m_max - plan.H2)
    A_full = fir_matrix(
        np.asarray(fu_arr), plan.H + plan.p_top + plan.p_bot, up, 1,
        py0 - plan.p_top * up, py1 - plan.p_bot * up + extra, gain_up,
    )
    assert A_full.shape[0] == plan.H2 + extra, (A_full.shape, plan)
    j0_0 = i_lo0 + plan.p_top
    for c in range(plan.n_chunks):
        m0 = c * plan.ho_len * plan.down
        j0 = j0_0 + c * plan.in_stride
        sl = A_full[m0:m0 + plan.h2_len, j0:j0 + plan.hband]
        np.testing.assert_array_equal(sl, A_up, err_msg=f"chunk {c}")
        # and nothing outside the band
        outside = A_full[m0:m0 + plan.h2_len].copy()
        outside[:, j0:j0 + plan.hband] = 0
        assert not outside.any(), f"chunk {c} leaks outside its band"
    return A_up, A_wu, A_wd, A_dn, j0_0


@functools.lru_cache(maxsize=None)
def _build_call(plan: _Plan, fu_key: bytes, fd_key: bytes, gain: float,
                slope: float, clamp: Optional[float], out_dtype_name: str,
                batch: int):
    fu = np.frombuffer(fu_key, np.float32) if fu_key else None
    fd = np.frombuffer(fd_key, np.float32) if fd_key else None
    A_up, A_wu, A_wd, A_dn, j0_0 = _relative_operators(
        plan, fu, fd, float(plan.up ** 2)
    )
    out_dtype = jnp.dtype(out_dtype_name)
    precision = (
        jax.lax.Precision.HIGHEST if out_dtype == jnp.float32 else None
    )
    carry = jnp.float32 if out_dtype == jnp.float32 else jnp.bfloat16
    ct, hband, W = plan.ct, plan.hband, plan.W_pad
    K = plan.C_pad // ct
    wsub = plan.wsub

    def _ldot(m_ref, t):
        return jax.lax.dot_general(
            m_ref[:].astype(t.dtype), t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=precision,
        ).astype(carry)

    n_sub = -(-plan.h2_len // wsub)
    h2_pad = n_sub * wsub

    def kernel(x_hbm, b_ref, aup_ref, awu_ref, awd_ref, adn_ref, o_ref,
               xband, t1_ref, t3_ref, sem):
        b = pl.program_id(0)
        k = pl.program_id(1)
        c = pl.program_id(2)

        def band_dma(cc, slot):
            # x ships as [B, K, Hp, W, ct]: every sliced dim (b, k, rows) is
            # an untiled leading dim — Mosaic requires HBM slices along the
            # tiled (second-minor, minor) pair to be tile-aligned, which a
            # size-1 K slice of a [.., K, ct] layout is not.
            return pltpu.make_async_copy(
                x_hbm.at[b, k, pl.ds(j0_0 + cc * plan.in_stride, hband),
                         slice(None), slice(None)],
                xband.at[slot],
                sem.at[slot],
            )

        # double-buffered band stream: chunk c was prefetched at step c-1
        # (except the first chunk of each (batch, channel-tile) sweep)
        @pl.when(c == 0)
        def _():
            band_dma(0, 0).start()

        @pl.when(c + 1 < plan.n_chunks)
        def _():
            band_dma(c + 1, (c + 1) % 2).start()

        band_dma(c, c % 2).wait()

        # bias applies to the true input rows only — the zero rows padded
        # onto the plane model upfirdn's zero padding, which happens AFTER
        # the bias add in the reference chain
        row = (jax.lax.broadcasted_iota(jnp.int32, (hband, 1, 1), 0)
               + j0_0 + c * plan.in_stride)
        valid = (row >= plan.p_top) & (row < plan.p_top + plan.H)
        x = jnp.where(
            valid,
            xband[c % 2].astype(jnp.float32) + b_ref[0][None, None, :],
            0.0,
        ).astype(carry)
        t1_ref[:plan.h2_len] = _ldot(aup_ref, x)  # [h2_len, W, ct]
        if h2_pad != plan.h2_len:
            # the loop below reads whole wsub slices; zero the row padding
            # so no uninitialised VMEM feeds the MXU (the results computed
            # from it land in t3 rows that A_dn never contracts)
            t1_ref[plan.h2_len:] = jnp.zeros(
                (h2_pad - plan.h2_len, W, ct), carry)

        # W-stage in row sub-slices via fori_loop: the [W2, *, ct]
        # oversampled tensor never materialises beyond wsub rows, and the
        # loop body's temporaries reuse one stack frame (a Python-unrolled
        # loop keeps every iteration's slices live and overflows VMEM on
        # the taller chunks).  The activation runs in the carry dtype via
        # max/min (no vector compare needed, so bf16 is legal here —
        # matching the matmul path, which also carries bf16).
        def wstage(i, _):
            t = t1_ref[pl.ds(i * wsub, wsub)]              # [wsub, W, ct]
            t = jnp.transpose(t, (1, 0, 2))                # [W, wsub, ct]
            t = _ldot(awu_ref, t)                          # [W2, wsub, ct]
            # weak-typed Python scalars keep the carry dtype
            t = (jnp.maximum(t, 0.0) + jnp.minimum(t, 0.0) * slope) * gain
            if clamp is not None:
                t = jnp.clip(t, -clamp, clamp)
            t = _ldot(awd_ref, t)                          # [Wo, wsub, ct]
            t3_ref[pl.ds(i * wsub, wsub)] = jnp.transpose(t, (1, 0, 2))
            return 0

        jax.lax.fori_loop(0, n_sub, wstage, 0, unroll=False)
        t = _ldot(adn_ref, t3_ref[:plan.h2_len])  # [ho_len, Wo, ct]
        o_ref[0] = t.astype(out_dtype)

    grid = (batch, K, plan.n_chunks)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
            pl.BlockSpec((1, ct), lambda b, k, c: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, plan.ho_len, plan.Wo, ct), lambda b, k, c: (b, c, 0, k),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (batch, plan.n_chunks * plan.ho_len, plan.Wo, plan.C_pad),
            out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, hband, W, ct), carry),
            pltpu.VMEM((h2_pad, W, ct), carry),
            pltpu.VMEM((h2_pad, plan.Wo, ct), carry),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            vmem_limit_bytes=min(int(_VMEM_BUDGET * 1.3), 16 * 1024 * 1024),
        ),
    )

    def run(x, bias):
        B, H, W_, C = x.shape
        x = x.astype(carry)
        if plan.p_top or plan.p_bot:
            x = jnp.pad(x, [(0, 0), (plan.p_top, plan.p_bot), (0, 0), (0, 0)])
        if plan.W_pad != W_:
            x = jnp.pad(x, [(0, 0), (0, 0), (0, plan.W_pad - W_), (0, 0)])
        if plan.C_pad != C:
            x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, plan.C_pad - C)])
            bias = jnp.pad(bias, [(0, plan.C_pad - C)])
        # [B, Hp, W_pad, K, ct] -> [B, K, Hp, W_pad, ct]: channel tiles become
        # a leading dim so the per-(b, k) row-band DMA slices only untiled
        # leading dims (full, tile-aligned W_pad and ct)
        x = jnp.transpose(
            x.reshape(B, x.shape[1], plan.W_pad, K, ct), (0, 3, 1, 2, 4)
        )
        # operators ship in the carry dtype (the matmul path also casts its
        # dense operators to the compute dtype before the MXU)
        out = call(x, bias.astype(jnp.float32)[None],
                   jnp.asarray(A_up, carry), jnp.asarray(A_wu, carry),
                   jnp.asarray(A_wd, carry), jnp.asarray(A_dn, carry))
        # drop the row padding of the last chunk and any channel padding
        return out[:, :plan.Ho, :, :C]

    return run


def _carry_bytes(dtype) -> int:
    # fp32 inputs carry fp32 through the kernel (see _build_call); the VMEM
    # plan must budget 4 B/elem for them, not the bf16 default
    return 4 if jnp.dtype(dtype) == jnp.float32 else 2


def fits_tiled(H: int, W: int, C: int, up: int, down: int,
               fu_taps: int, fd_taps: int, padding: Padding,
               dtype=jnp.bfloat16) -> bool:
    return plan_tiled(H, W, C, up, down, fu_taps, fd_taps, padding,
                      carry_bytes=_carry_bytes(dtype)) is not None


def filtered_lrelu_pallas_tiled(
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
    """H-tiled fused kernel. Caller must have checked ``fits_tiled``."""
    B, H, W, C = x.shape
    fu = None if fu is None else np.asarray(fu, np.float32)
    fd = None if fd is None else np.asarray(fd, np.float32)
    plan = plan_tiled(H, W, C, up, down,
                      1 if fu is None else len(fu),
                      1 if fd is None else len(fd), padding,
                      carry_bytes=_carry_bytes(x.dtype))
    assert plan is not None, "no legal chunking; use mode='matmul'"
    run = _build_call(
        plan,
        fu.tobytes() if fu is not None else b"",
        fd.tobytes() if fd is not None else b"",
        float(gain), float(slope),
        None if clamp is None else float(clamp),
        x.dtype.name, B,
    )
    bias = jnp.zeros([C], jnp.float32) if b is None else b.astype(jnp.float32)
    return run(x, bias)
