"""Uniform mid-tread latent quantization on the [-1, 1] W-space range.

Semantics identical to the reference's ``StyleGAN3Compressor.compress``
(/root/reference/stylegan3_hvae_full.py:295-318): map [-1,1] -> [0,1], round
to ``2**bits - 1`` levels (round-half-even, which torch.round / numpy / jnp
all share, so saved latents are bit-for-bit comparable), map back.
"""

from __future__ import annotations

import jax.numpy as jnp


def quantize_uniform(w: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Quantize latents in [-1,1] to ``bits`` bit levels (returns dequantized
    float values on the quantization grid)."""
    scale = (1 << bits) - 1
    w01 = (w + 1.0) * 0.5
    wq = jnp.round(w01 * scale) / scale
    return wq * 2.0 - 1.0


def quantize_to_indices(w: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Quantize to integer level indices in [0, 2**bits - 1] (for entropy
    coding / compact storage)."""
    scale = (1 << bits) - 1
    w01 = jnp.clip((w + 1.0) * 0.5, 0.0, 1.0)
    return jnp.round(w01 * scale).astype(jnp.int32)


def dequantize_from_indices(idx: jnp.ndarray, bits: int) -> jnp.ndarray:
    scale = (1 << bits) - 1
    return (idx.astype(jnp.float32) / scale) * 2.0 - 1.0


def _per_layer_scales(bits, num_ws: int) -> jnp.ndarray:
    """(2**bits - 1) per W layer, shaped [1, num_ws, 1]; ``bits`` may be a
    scalar or a length-num_ws sequence."""
    if isinstance(bits, (int, float)) or (
            hasattr(bits, "ndim") and bits.ndim == 0):
        b = [int(bits)] * num_ws
    else:
        b = [int(x) for x in bits]
        assert len(b) == num_ws, (len(b), num_ws)
    return jnp.asarray([(1 << x) - 1 for x in b], jnp.float32)[None, :, None]


def latent_range(w, eps: float = 1e-6):
    """Per-(image, W-layer) coding range covering ``w`` exactly.

    Returns ``(lo, hi)`` float32 arrays of shape [B, num_ws].  This is the
    side information that lets entropy-coded indices represent latents
    OUTSIDE [-1, 1]: encode-time refinement (codec/refine.py) legitimately
    pushes W+ past the training range, and the fixed [-1, 1] index grid then
    clamps away most of refinement's gain (round-4 RD: 48.31 dB float vs
    42.77 dB coded).  A degenerate layer (hi == lo) is widened by ``eps`` so
    the affine map stays invertible.
    """
    import numpy as np  # host-side: ranges travel in container metadata

    w = np.asarray(w, np.float32)
    lo = w.min(axis=-1)
    hi = w.max(axis=-1)
    flat = hi - lo < eps
    lo = np.where(flat, lo - eps, lo)
    hi = np.where(flat, hi + eps, hi)
    return lo.astype(np.float32), hi.astype(np.float32)


def quantize_to_indices_affine(w: jnp.ndarray, bits, lo, hi) -> jnp.ndarray:
    """Quantize to integer indices on a per-(image, layer) affine grid
    spanning [lo, hi] (shapes [B, num_ws]); ``bits`` scalar or per-layer."""
    scales = _per_layer_scales(bits, w.shape[1])
    lo = jnp.asarray(lo, jnp.float32)[:, :, None]
    hi = jnp.asarray(hi, jnp.float32)[:, :, None]
    w01 = jnp.clip((w - lo) / (hi - lo), 0.0, 1.0)
    return jnp.round(w01 * scales).astype(jnp.int32)


def dequantize_from_indices_affine(idx: jnp.ndarray, bits, lo, hi) -> jnp.ndarray:
    scales = _per_layer_scales(bits, idx.shape[1])
    lo = jnp.asarray(lo, jnp.float32)[:, :, None]
    hi = jnp.asarray(hi, jnp.float32)[:, :, None]
    return lo + (idx.astype(jnp.float32) / scales) * (hi - lo)


def _fixed_steps(bits, num_layers: int):
    """Per-layer fixed-grid step 2 / (2**bits - 1) and alphabet base, float64
    [T] each."""
    import numpy as np

    if isinstance(bits, (int, np.integer)):
        b = np.full(num_layers, int(bits), np.int64)
    else:
        b = np.asarray([int(x) for x in bits], np.int64)
        assert b.shape[0] == num_layers, (b.shape, num_layers)
    return 2.0 / ((1 << b) - 1).astype(np.float64), (1 << b)


def snap_to_lattice(lo, hi, bits):
    """Snap a per-(image, layer) range OUTWARD to the (-1)-anchored
    fixed-step lattice ``-1 + k * 2/(2**bits - 1)``.

    This is the encoder-side half of the FIXED-STEP refined grid: the
    quantization-aware refinement phase straight-through-rounds W+ on this
    exact lattice (quantize_uniform's grid, unbounded — no clamp), so the
    coding grid must have the SAME step AND phase or every decoded value
    shifts by up to half a step.  Returns float32 (lo, hi) lattice points to
    store in the container (``fixed_step_levels`` recovers the lattice
    indices from them bit-exactly on both ends).
    """
    import numpy as np

    step, _ = _fixed_steps(bits, np.shape(lo)[1])
    step = step[None, :]
    ilo = np.floor((np.asarray(lo, np.float64) + 1.0) / step + 1e-9)
    ihi = np.ceil((np.asarray(hi, np.float64) + 1.0) / step - 1e-9)
    ihi = np.maximum(ihi, ilo + 1)  # degenerate-range guard
    return ((ilo * step - 1.0).astype(np.float32),
            (ihi * step - 1.0).astype(np.float32))


def fixed_step_levels(lo, hi, bits, expand: int = 4):
    """Level counts for the FIXED-STEP refined grid.

    The refined affine grid's weakness is its step: covering [lo, hi] with
    the same ``2**bits`` levels as the [-1, 1] grid widens the step by
    (hi - lo) / 2, costing ~20*log10((hi - lo) / 2) dB of quantization noise
    (round-5 RD: 3.9 dB at 8-bit, span ≈ 3.1).  Keep the STEP at the fixed
    grid's 2 / (2**bits - 1) instead and let the level COUNT grow to cover
    the span: the entropy coder prices the wider alphabet at the symbols'
    actual entropy (~log2(span/2) extra bits/symbol), a far smaller rate
    cost than the distortion it buys back.

    ``lo``/``hi``: [B, num_ws] float32 as produced by ``snap_to_lattice``
    and stored in the container — this function is the SHARED encode/decode
    half: both sides recompute the counts from the stored float32 range, so
    they are never side information.  Lattice indices are recovered by
    rounding ((x + 1) / step); for stored lattice points the float32 error
    is ~1e-4 of a step, so the round is exact.  ``bits``: scalar or
    per-layer sequence; ``expand``: alphabet cap as a multiple of 2**bits
    (where it binds, the grid degrades gracefully to span mode's wider
    step — both sides take the same branch because both compute from the
    same stored floats).  Returns int32 [B, num_ws] level counts in
    [2, expand * 2**bits].
    """
    import numpy as np

    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    step, base = _fixed_steps(bits, lo.shape[1])
    ilo = np.round((lo + 1.0) / step[None, :])
    ihi = np.round((hi + 1.0) / step[None, :])
    cap = base * int(expand)
    n = ihi - ilo + 1
    return np.clip(n, 2, cap[None, :]).astype(np.int32)


def quantize_to_indices_grid(w: jnp.ndarray, lo, hi, n_levels) -> jnp.ndarray:
    """Quantize to indices on a per-(image, layer) grid of ``n_levels[b, t]``
    points spanning [lo, hi] (all [B, num_ws]) — the variable-alphabet
    generalisation of ``quantize_to_indices_affine``."""
    scales = jnp.asarray(n_levels, jnp.float32)[:, :, None] - 1.0
    lo = jnp.asarray(lo, jnp.float32)[:, :, None]
    hi = jnp.asarray(hi, jnp.float32)[:, :, None]
    w01 = jnp.clip((w - lo) / (hi - lo), 0.0, 1.0)
    return jnp.round(w01 * scales).astype(jnp.int32)


def dequantize_from_indices_grid(idx: jnp.ndarray, lo, hi, n_levels) -> jnp.ndarray:
    scales = jnp.asarray(n_levels, jnp.float32)[:, :, None] - 1.0
    lo = jnp.asarray(lo, jnp.float32)[:, :, None]
    hi = jnp.asarray(hi, jnp.float32)[:, :, None]
    return lo + (idx.astype(jnp.float32) / scales) * (hi - lo)


def quantize_uniform_per_layer(w: jnp.ndarray, bits_per_layer) -> jnp.ndarray:
    """Per-W-layer bit allocation (reference guide's recommendation:
    10-12 bits for the coarse layers, 4-6 for the fine ones —
    stylegan3_hvae_guide.md:335-340).

    ``w``: [B, num_ws, w_dim]; ``bits_per_layer``: length-num_ws ints.
    """
    assert len(bits_per_layer) == w.shape[1], (len(bits_per_layer), w.shape)
    scales = jnp.asarray(
        [(1 << int(b)) - 1 for b in bits_per_layer], jnp.float32
    )[None, :, None]
    w01 = (w + 1.0) * 0.5
    return (jnp.round(w01 * scales) / scales) * 2.0 - 1.0


def per_layer_comp_size_bytes(bits_per_layer, w_dim: int, batch: int = 1) -> float:
    return batch * w_dim * sum(int(b) for b in bits_per_layer) / 8.0
