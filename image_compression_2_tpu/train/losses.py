"""Training losses — semantics matched to the reference trainer.

Reference formulas (/root/reference/stylegan3_hvae_full.py:671-690):
    rec   = MSE(x, x̂)
    percep= mean(LPIPS(x, x̂))
    kl    = 0.5 * mean_b( Σ_{ws,dim} (μ - w_avg)² + e^logvar - logvar - 1 )
    total = rec_weight*rec + perceptual_weight*percep + kl_weight*kl
Defaults 1.0 / 0.8 / 0.01 (stylegan3_hvae_full.py:391-393).

Deliberate fix vs the reference: the encoder runs ONCE per step (the reference
re-encodes for the KL term, stylegan3_hvae_full.py:680, tripling encoder cost
with inconsistent samples); the loss VALUES are identical because KL uses the
same means/logvars the reconstruction path produced.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LossWeights:
    rec: float = 1.0
    perceptual: float = 0.8
    kl: float = 0.01
    gumbel: float = 0.0  # stage-2 perplexity loss weight
    # W+-space L2 supervision against the KNOWN latents of synthetic samples
    # (the reference uses this in its simple-encoder trainer,
    # simple_stylegan_encoder.py:248); 0 = off (real-image datasets have no
    # ground-truth W+)
    w_l2: float = 0.0


def mse_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(x - y))


def kl_to_w_avg(
    means: jnp.ndarray, logvars: jnp.ndarray, w_avg: jnp.ndarray
) -> jnp.ndarray:
    """KL(q(w|x) || N(w_avg, I)) summed over (num_ws, w_dim), batch-meaned."""
    per_elem = (
        jnp.square(means - w_avg) + jnp.exp(logvars) - logvars - 1.0
    )
    return 0.5 * jnp.mean(jnp.sum(per_elem, axis=(1, 2)))


def perplexity_loss(perplexity: jnp.ndarray, n_embeddings: int) -> jnp.ndarray:
    """Stage-2 codebook-usage loss: push perplexity toward full usage
    (reference: gumbel_softmax_compression.py:549-558).

    Deliberate fix vs the reference: normalized to ``(1 - p/n)² ∈ [0, 1]``.
    The reference's raw ``(p - n)²`` only looked harmless because its
    degenerate logit scale pinned p ≈ n (see quant/gumbel.py docstring); with
    meaningful assignments p is O(n/4) and the raw form (~10⁴) would swamp the
    reconstruction losses — and, worse, reward *raising* the temperature to
    blur assignments back toward uniform (observed: the learnable temperature
    climbing monotonically against the anneal in the round-3 run)."""
    return jnp.square(1.0 - perplexity / float(n_embeddings))
