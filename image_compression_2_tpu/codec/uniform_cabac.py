"""CABAC entropy coding over UNIFORM-quantized stage-1 latents.

A beyond-reference pairing: the reference welds its CABAC path to the
Gumbel discretization (/root/reference/cabac_compression.py:409-463 takes the
discretization module in its constructor), so its uniform-quantized codec
(/root/reference/stylegan3_hvae_full.py:295-318) always ships raw fixed-width
indices.  But uniform level indices of W+ are far from uniformly distributed
per position, so the same context-adaptive coder + trained per-position
priors that compress Gumbel codes compress them too — strictly better rate
at IDENTICAL distortion for latents inside [-1, 1] (the decoded indices are
bit-exact), no stage-2 training required.

Two compositions the round-4 table showed the fixed [-1, 1] index grid
cannot express, both carried here as container metadata:

- **Refined latents** (``refine_steps`` > 0): encode-time inversion pushes
  W+ outside [-1, 1]; clamping it to the fixed grid cost 5.5 dB
  (48.31 dB float vs 42.77 dB coded in round 4).  The encoder now refines in
  two phases — free inversion, then quantization-aware descent on the
  per-(image, layer) affine grid spanning the refined latents' actual range
  — and ships that range (``w_range``, [B, num_ws, 2] float32, counted
  toward comp_size) so the decoder rebuilds the exact grid.
- **Per-layer bit allocation** (``quantization_bits`` as a length-num_ws
  sequence, the guide's recommendation at
  /root/reference/stylegan3_hvae_guide.md:335-340): each W layer gets its
  own 2**bits alphabet inside one shared coder alphabet of size
  2**max(bits); trained per-position priors concentrate the model on each
  layer's live symbols.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from ..quant.uniform import (
    dequantize_from_indices,
    dequantize_from_indices_affine,
    dequantize_from_indices_grid,
    fixed_step_levels,
    latent_range,
    quantize_to_indices,
    quantize_to_indices_affine,
    quantize_to_indices_grid,
    snap_to_lattice,
)
from .cabac_compressor import EntropyCodecBase
from .compressor import Compressor


class UniformCABACCompressor(EntropyCodecBase, Compressor):
    """Stage-1 codec (encode -> uniform quantize) + CABAC entropy layer.

    ``quantization_bits``: scalar, or a length-num_ws sequence for the
    per-layer allocation regime.

    ``refined_grid``: how refined (out-of-[-1,1]) latents map to indices —
    - ``'fixed-step'`` (default): keep the [-1, 1] grid's STEP
      2 / (2**bits - 1) and grow the per-(image, layer) level COUNT to
      cover the refined span (``quant.uniform.fixed_step_levels``, alphabet
      capped at ``grid_expand * 2**bits``).  The entropy coder prices the
      wider alphabet at the symbols' actual entropy (~log2(span/2) extra
      bits/symbol), which is far cheaper than the distortion the wider
      span-mode step costs (round-5 RD: 3.9 dB at 8-bit, span ≈ 3.1).
    - ``'span'``: cover the span with exactly 2**bits levels (the round-5
      affine container) — smallest alphabet, widest step.
    Decode is metadata-driven (streams record ``w_grid``), so either codec
    decodes either stream.
    """

    def __init__(self, *args, quantization_bits=8,
                 refined_grid: str = "fixed-step", grid_expand: int = 4,
                 refine_qa_frac: Optional[float] = None,
                 **kwargs):
        if isinstance(quantization_bits, (int, np.integer)):
            bits_list = [int(quantization_bits)]
            self.bits_per_layer: Optional[Tuple[int, ...]] = None
        else:
            bits_list = [int(b) for b in quantization_bits]
            self.bits_per_layer = tuple(bits_list)
        # 15-bit cap: the range coder's adaptive model requires
        # total frequency < 2^16 (coding/rangecoder.py), and the prior tables
        # add PRIOR_MASS on top of n_symbols — at 16 bits (65536 symbols)
        # neither the adaptive nor the priors mode can satisfy the invariant.
        for b in bits_list:
            if not 1 <= b <= 15:
                raise ValueError(f"quantization_bits must be in [1, 15]: {b}")
        if refined_grid not in ("fixed-step", "span"):
            raise ValueError(f"refined_grid must be 'fixed-step' or 'span': "
                             f"{refined_grid!r}")
        self.refined_grid = refined_grid
        self.grid_expand = int(grid_expand)
        # Fraction of refine_steps spent in the quantization-aware phase.
        # span: the decode grid is much coarser than the [-1, 1] grid
        # (step widened by span/2), so descent on the actual (clamped) grid
        # recovers real distortion — round-5 kept 50/50.  fixed-step: the
        # QA phase straight-through-rounds on the UNBOUNDED (-1)-anchored
        # lattice the container codes (the stored range is snapped to it);
        # at 8 bits the lattice is fine enough that free-only measured best
        # (runs/r5f_grid_probe*.txt: qa split cost 3.9-7.6 dB when the QA
        # phase ran on the clamped span grid), hence the 0.0 default —
        # at coarse bit widths pass refine_qa_frac explicitly (the float
        # 4-bit QA row beat free by +3.4 dB, RD_TABLE).
        if refine_qa_frac is None:
            refine_qa_frac = 0.0 if refined_grid == "fixed-step" else 0.5
        if not 0.0 <= float(refine_qa_frac) <= 1.0:
            raise ValueError(f"refine_qa_frac must be in [0, 1]: "
                             f"{refine_qa_frac}")
        self.refine_qa_frac = float(refine_qa_frac)
        if (refined_grid == "fixed-step"
                and self.grid_expand * (1 << max(bits_list)) > (1 << 15)):
            # same 15-bit alphabet cap as quantization_bits itself: the
            # range coder's adaptive model needs total frequency < 2^16
            raise ValueError(
                f"grid_expand * 2**bits exceeds the coder's 2^15 alphabet "
                f"cap: {self.grid_expand} * 2**{max(bits_list)}")
        super().__init__(*args, **kwargs)
        self.quantization_bits = max(bits_list)
        if (self.bits_per_layer is not None
                and len(self.bits_per_layer) != self.generator_cfg.num_ws):
            raise ValueError(
                f"per-layer bits must have num_ws={self.generator_cfg.num_ws} "
                f"entries: got {len(self.bits_per_layer)}")

    @property
    def n_symbols(self) -> int:
        return 1 << self.quantization_bits

    @property
    def _latents_id(self) -> str:
        if self.bits_per_layer is None:
            return f"uniform-{self.quantization_bits}bit"
        return "uniform-" + ",".join(map(str, self.bits_per_layer)) + "bit"

    @property
    def _effective_bits(self):
        return (self.quantization_bits if self.bits_per_layer is None
                else self.bits_per_layer)

    def _raw_index_bits(self, codes: np.ndarray) -> float:
        if self.bits_per_layer is None:
            return codes.size * float(self.quantization_bits)
        # fixed-width packing honours the allocation: sum of per-layer widths
        B, T, D = codes.shape
        return B * D * float(sum(self.bits_per_layer))

    def _latent_codes(self, x, refine_steps: int = 0,
                      refine_lr: float = 0.02) -> Tuple[np.ndarray, Dict]:
        bits = self._effective_bits
        w = self.encode(x, deterministic=True)
        if refine_steps:
            # Phase 1 — free inversion: W+ may (and should) leave [-1, 1].
            s2 = int(round(refine_steps * self.refine_qa_frac))
            s1 = refine_steps - s2
            if s1:
                w = self.refine(w, x, steps=s1, lr=refine_lr)
            if self.refined_grid == "fixed-step":
                if s2:
                    # Quantization-aware phase on the UNBOUNDED fixed-step
                    # lattice (straight-through rounding at step
                    # 2/(2**bits - 1), no clamp — exactly the grid the
                    # variable-alphabet container codes): no range is needed
                    # before refinement, so the range/levels are taken AFTER
                    # all steps and nothing the optimiser produced is
                    # clamped away.
                    w = self.refine(w, x, steps=s2, lr=refine_lr,
                                    quantization_bits=bits)
                # Snap the range outward to the (-1)-anchored lattice: the
                # coding grid then has the SAME step and phase as the QA
                # phase's straight-through lattice (and for free-only
                # refinement the snap costs at most one extra level).  The
                # decoder recomputes n_levels from the stored float32 range,
                # so the counts themselves are not side information.
                lo, hi = latent_range(np.asarray(w))
                lo, hi = snap_to_lattice(lo, hi, bits)
                nlv = fixed_step_levels(lo, hi, bits, self.grid_expand)
                codes = np.asarray(
                    quantize_to_indices_grid(w, lo, hi, nlv), np.int32)
                return codes, {"w_range": np.stack([lo, hi], -1).tolist(),
                               "w_grid": "fixed-step",
                               "grid_expand": self.grid_expand,
                               "_n_symbols": self.grid_expand
                               * (1 << self.quantization_bits)}
            lo, hi = latent_range(np.asarray(w))
            meta = {"w_range": np.stack([lo, hi], -1).tolist()}
            if s2:
                # Phase 2 — quantization-aware on the grid the decoder will
                # actually reconstruct from (affine span, boundary clamp).
                w = self.refine(w, x, steps=s2, lr=refine_lr,
                                quantization_bits=bits, w_range=(lo, hi))
            codes = np.asarray(
                quantize_to_indices_affine(w, bits, lo, hi), np.int32)
            return codes, meta
        if self.bits_per_layer is None:
            # fixed [-1, 1] grid — bit-exact with the `.npz` float path
            return np.asarray(
                quantize_to_indices(w, self.quantization_bits), np.int32), {}
        ones = np.ones(w.shape[:2], np.float32)
        return np.asarray(
            quantize_to_indices_affine(w, bits, -ones, ones), np.int32), {}

    def _reconstruct_codes(self, codes: np.ndarray,
                           metadata: Optional[Dict] = None) -> jnp.ndarray:
        bits = self._effective_bits
        codes = jnp.asarray(codes)
        if metadata and metadata.get("w_range") is not None:
            wr = np.asarray(metadata["w_range"], np.float32)  # [B, T, 2]
            if metadata.get("w_grid") == "fixed-step":
                # recompute the per-(image, layer) level counts from the
                # stored float32 range — bit-identical to the encoder's
                nlv = fixed_step_levels(wr[..., 0], wr[..., 1], bits,
                                        int(metadata.get("grid_expand", 4)))
                w = dequantize_from_indices_grid(codes, wr[..., 0],
                                                 wr[..., 1], nlv)
            else:
                w = dequantize_from_indices_affine(codes, bits,
                                                   wr[..., 0], wr[..., 1])
        elif self.bits_per_layer is None:
            w = dequantize_from_indices(codes, self.quantization_bits)
        else:
            ones = np.ones(codes.shape[:2], np.float32)
            w = dequantize_from_indices_affine(codes, bits, -ones, ones)
        return self.decompress(w)
