"""Gumbel-Softmax scalar-codebook discretization.

Capability match for the reference's ``GumbelSoftmaxDiscretization``
(/root/reference/gumbel_softmax_compression.py:26-137): a fixed linspace(-1,1)
scalar codebook, a learnable log-temperature, distance-based logits, the
Gumbel-Softmax relaxation with optional straight-through hard sampling,
per-element nearest-codebook indices, and soft-assignment perplexity.

TPU-first formulation: one batched [N, n_embeddings] distance/softmax block —
a pure VPU+MXU computation with a static shape — instead of the reference's
flattened per-element loop semantics (identical math).  Usage statistics are
returned functionally (histogram via one-hot sum) rather than mutated in a
buffer, so every apply stays pure under jit; the trainer accumulates them.

Deliberate numerical fix vs the reference (``logit_scale``): the reference
feeds raw ``-|z - c|`` distances as logits (gumbel_softmax_compression.py:100),
so adjacent codebook entries differ by only 2/(n-1) ≈ 0.008 logits at n=256.
At tau≈1 the softmax over the codebook is then within <1% of uniform
(measured perplexity pinned at ~252/256 in round-3 training), the
straight-through gradient to the encoder through ``soft`` all but vanishes,
and unit-scale Gumbel noise makes the sampled code nearly independent of z.
Here logits measure distance in units of the codebook spacing by default
(``logit_scale = (n-1)/2``): adjacent codes differ by 1.0 logit, Gumbel
sampling dithers locally between neighbouring codes (stochastic rounding),
and the relaxation carries usable gradients.  Pass ``logit_scale=1.0`` to
reproduce the reference's exact (degenerate) behaviour.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn


class GumbelSoftmaxDiscretization(nn.Module):
    """z [B, num_ws, w_dim] in ~[-1,1] -> (discretized, perplexity, indices)."""

    n_embeddings: int = 256
    initial_temperature: float = 1.0
    learnable_temp: bool = True
    # None -> (n_embeddings-1)/2, i.e. distances in codebook-spacing units
    # (see module docstring); 1.0 reproduces the reference's raw distances.
    logit_scale: Optional[float] = None

    def codebook(self) -> jnp.ndarray:
        return jnp.linspace(-1.0, 1.0, self.n_embeddings, dtype=jnp.float32)

    def _logit_scale(self) -> float:
        if self.logit_scale is not None:
            return float(self.logit_scale)
        return (self.n_embeddings - 1) / 2.0

    @nn.compact
    def __call__(
        self,
        z: jnp.ndarray,
        hard: bool = True,
        key: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """``key=None`` disables Gumbel noise (deterministic eval path);
        ``hard`` selects straight-through hard one-hots."""
        orig_shape = z.shape
        codebook = self.codebook()

        log_temp_init = float(np.log(self.initial_temperature))
        if self.learnable_temp:
            log_temperature = self.param(
                "log_temperature",
                nn.initializers.constant(log_temp_init),
                (1,),
                jnp.float32,
            )
        else:
            log_temperature = jnp.full([1], log_temp_init)
        tau = jnp.exp(log_temperature)[0]

        flat_z = z.reshape(-1, 1).astype(jnp.float32)
        distances = jnp.abs(flat_z - codebook[None, :])  # [N, n_emb]
        logits = -distances * self._logit_scale()

        if key is not None:
            u = jax.random.uniform(
                key, logits.shape, minval=1e-10, maxval=1.0 - 1e-10
            )
            gumbel = -jnp.log(-jnp.log(u))
            logits_pert = logits + gumbel
        else:
            logits_pert = logits

        soft = jax.nn.softmax(logits_pert / tau, axis=1)
        if hard:
            one_hot = jax.nn.one_hot(
                jnp.argmax(logits_pert, axis=1), self.n_embeddings,
                dtype=soft.dtype,
            )
            # straight-through: hard forward, soft gradient
            assign = one_hot + soft - jax.lax.stop_gradient(soft)
        else:
            assign = soft

        discretized = (assign @ codebook[:, None]).reshape(orig_shape)
        encoding_indices = jnp.argmin(distances, axis=1).reshape(orig_shape)

        # Usage statistics with the temperature DETACHED: the stage-2
        # perplexity loss must push the *encoder* to spread its latents over
        # the codebook, never the temperature to blur assignments — in the
        # reference, perplexity→n pressure flows into the learnable
        # log_temperature and drives it monotonically UP against the anneal
        # (observed in the round-3 run, epochs 41-48).  Gradients still flow
        # to the logits (i.e. to z), so the usage loss remains effective.
        soft_stats = jax.nn.softmax(
            logits_pert / jax.lax.stop_gradient(tau), axis=1
        )
        avg_probs = jnp.mean(soft_stats, axis=0)
        perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))
        return discretized, perplexity, encoding_indices


def lookup_codebook(indices: jnp.ndarray, n_embeddings: int) -> jnp.ndarray:
    """indices -> codebook values (the decode side of the discrete path)."""
    codebook = jnp.linspace(-1.0, 1.0, n_embeddings, dtype=jnp.float32)
    return codebook[indices]


def codebook_indices(w: jnp.ndarray, n_embeddings: int) -> jnp.ndarray:
    """Nearest-codebook index per element (the encode side for latents that
    did not come through the discretization module, e.g. refined W+).  For
    the uniform linspace(-1, 1, N) codebook, nearest-neighbour equals
    rounding on the [0, N-1] level scale with edge clipping."""
    scale = n_embeddings - 1
    w01 = jnp.clip((w + 1.0) * 0.5, 0.0, 1.0)
    return jnp.round(w01 * scale).astype(jnp.int32)


def usage_histogram(indices: jnp.ndarray, n_embeddings: int) -> jnp.ndarray:
    """Count codebook usage for a batch of index tensors (device-side)."""
    return jnp.bincount(indices.reshape(-1), length=n_embeddings)


def anneal_log_temperature(
    log_temperature: jnp.ndarray,
    anneal_rate: float = 3e-5,
    min_temp: float = 0.5,
) -> jnp.ndarray:
    """Reference annealing schedule (gumbel_softmax_compression.py:67-71):
    clamp to log(min_temp) then subtract the rate."""
    return jnp.maximum(log_temperature, float(np.log(min_temp))) - anneal_rate
