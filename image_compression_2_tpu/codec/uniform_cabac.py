"""CABAC entropy coding over UNIFORM-quantized stage-1 latents.

A beyond-reference pairing: the reference welds its CABAC path to the
Gumbel discretization (/root/reference/cabac_compression.py:409-463 takes the
discretization module in its constructor), so its uniform-quantized codec
(/root/reference/stylegan3_hvae_full.py:295-318) always ships raw fixed-width
indices.  But uniform level indices of W+ are far from uniformly distributed
per position, so the same context-adaptive coder + trained per-position
priors that compress Gumbel codes compress them too — strictly better rate
at IDENTICAL distortion for latents inside [-1, 1] (the decoded indices are
bit-exact), no stage-2 training required.  One edge divergence from the
float uniform rows: index coding clamps out-of-range latents to [-1, 1]
(quantize_to_indices must produce valid alphabet symbols), while the float
path's quantize_uniform follows the reference in NOT clipping
(stylegan3_hvae_full.py:295-318) — a latent outside [-1, 1] therefore
reconstructs to the nearest grid edge here vs an off-grid value there.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..quant.uniform import dequantize_from_indices, quantize_to_indices
from .cabac_compressor import EntropyCodecBase
from .compressor import Compressor


class UniformCABACCompressor(EntropyCodecBase, Compressor):
    """Stage-1 codec (encode -> uniform quantize) + CABAC entropy layer.

    ``quantization_bits`` must be a scalar (per-layer allocations would need
    per-layer symbol alphabets — use the gumbel/CABAC codec for that regime).
    """

    def __init__(self, *args, quantization_bits: int = 8, **kwargs):
        bits = int(quantization_bits)
        # 15-bit cap: the range coder's adaptive model requires
        # total frequency < 2^16 (coding/rangecoder.py), and the prior tables
        # add PRIOR_MASS on top of n_symbols — at 16 bits (65536 symbols)
        # neither the adaptive nor the priors mode can satisfy the invariant.
        if not 1 <= bits <= 15:
            raise ValueError(f"quantization_bits must be in [1, 15]: {bits}")
        super().__init__(*args, **kwargs)
        self.quantization_bits = bits

    @property
    def n_symbols(self) -> int:
        return 1 << self.quantization_bits

    @property
    def _latents_id(self) -> str:
        return f"uniform-{self.quantization_bits}bit"

    def _latent_codes(self, x, refine_steps: int = 0,
                      refine_lr: float = 0.02) -> np.ndarray:
        w = self.encode(x, deterministic=True)
        if refine_steps:
            # quantization-aware: refine toward the exact reconstruction the
            # decoder will compute from the coded indices
            w = self.refine(w, x, steps=refine_steps, lr=refine_lr,
                            quantization_bits=self.quantization_bits)
        return np.asarray(
            quantize_to_indices(w, self.quantization_bits), np.int32)

    def _reconstruct_codes(self, codes: np.ndarray) -> jnp.ndarray:
        w = dequantize_from_indices(jnp.asarray(codes),
                                    self.quantization_bits)
        return self.decompress(w)
