"""Discrete-codebook codec: HVAE encode -> Gumbel discretize -> synthesis.

API parity with the reference ``GumbelSoftmaxCompressor``
(/root/reference/gumbel_softmax_compression.py:140-319): ``forward`` returns
(image, w_plus, w_discrete, perplexity); ``compress`` returns integer code
indices [B, num_ws, w_dim]; ``decompress`` reconstructs via codebook lookup;
``save_compressed``/``load_compressed`` use the `.npz` container with keys
{codes, n_embeddings, resolution, orig_size, comp_size, compression_ratio}
and comp_size = size * log2(n_embeddings) / 8.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import EncoderConfig, GeneratorConfig, Precision
from ..models.encoder import HVAEEncoder
from ..models.generator import Generator
from ..quant.gumbel import (
    GumbelSoftmaxDiscretization,
    codebook_indices,
    lookup_codebook,
)


class GumbelCompressor:
    """Neural codec over a discrete scalar codebook (entropy-codable indices)."""

    def __init__(
        self,
        encoder_cfg: EncoderConfig,
        generator_cfg: GeneratorConfig,
        encoder_vars,
        generator_vars,
        disc_vars=None,
        n_embeddings: int = 256,
        training_resolution: Optional[int] = None,
        precision: Precision = Precision(),
    ):
        self.encoder_cfg = encoder_cfg
        self.generator_cfg = generator_cfg
        self.n_embeddings = n_embeddings
        self.encoder = HVAEEncoder(
            encoder_cfg,
            compute_dtype=precision.compute_dtype if precision.mixed else None,
        )
        self.generator = Generator(generator_cfg, precision)
        self.discretization = GumbelSoftmaxDiscretization(n_embeddings)
        if disc_vars is None:
            disc_vars = jax.jit(self.discretization.init)(
                jax.random.PRNGKey(0),
                jnp.zeros([1, encoder_cfg.num_ws, encoder_cfg.w_dim]),
            )
        self.encoder_vars = encoder_vars
        self.generator_vars = generator_vars
        self.disc_vars = disc_vars
        self.training_resolution = training_resolution
        self.usage = np.zeros([n_embeddings], np.int64)  # host-side statistics

    @classmethod
    def create(
        cls,
        encoder_cfg: EncoderConfig,
        generator_cfg: GeneratorConfig,
        seed: int = 0,
        **kwargs,
    ) -> "GumbelCompressor":
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        enc_vars = jax.jit(HVAEEncoder(encoder_cfg).init)(
            k1,
            jnp.zeros([1, encoder_cfg.img_resolution, encoder_cfg.img_resolution,
                       encoder_cfg.img_channels]),
        )
        gen_vars = jax.jit(Generator(generator_cfg).init)(
            k2, jnp.zeros([1, generator_cfg.z_dim])
        )
        return cls(encoder_cfg, generator_cfg, enc_vars, gen_vars, **kwargs)

    # ------------------------------------------------------------ jitted core
    @functools.cached_property
    def _forward_fn(self):
        def forward(enc_vars, disc_vars, gen_vars, x, key):
            enc_key, gum_key = (
                jax.random.split(key) if key is not None else (None, None)
            )
            w_plus, means, _ = self.encoder.apply(enc_vars, x, enc_key)
            # discretize the MEANS (stability; reference :190)
            w_disc, perplexity, _ = self.discretization.apply(
                disc_vars, means, hard=key is None, key=gum_key
            )
            img = self.generator.apply(gen_vars, w_disc, method="synthesis")
            if img.shape[1] != x.shape[1]:
                img = jax.image.resize(img, x.shape, method="bilinear")
            return img, w_plus, w_disc, perplexity

        return jax.jit(forward)

    @functools.cached_property
    def _compress_fn(self):
        def compress(enc_vars, disc_vars, x):
            _, means, _ = self.encoder.apply(enc_vars, x, None)
            _, _, indices = self.discretization.apply(
                disc_vars, means, hard=True, key=None
            )
            return indices.astype(jnp.int32)

        return jax.jit(compress)

    @functools.cached_property
    def _means_fn(self):
        def means(enc_vars, x):
            _, m, _ = self.encoder.apply(enc_vars, x, None)
            return m

        return jax.jit(means)

    @functools.cached_property
    def _decompress_fn(self):
        def decompress(gen_vars, codes):
            w_disc = lookup_codebook(codes, self.n_embeddings)
            return self.generator.apply(gen_vars, w_disc, method="synthesis")

        return jax.jit(decompress)

    # -------------------------------------------------------------- user API
    def forward(self, x, key: Optional[jax.Array] = None):
        """Returns (image, w_plus, w_discrete, perplexity). With a key the
        stochastic (training) path runs; without it the hard eval path."""
        return self._forward_fn(
            self.encoder_vars, self.disc_vars, self.generator_vars, x, key
        )

    __call__ = forward

    def encode(self, x) -> jnp.ndarray:
        """Image -> hard-discretized W+ values."""
        codes = self._compress_fn(self.encoder_vars, self.disc_vars, x)
        return lookup_codebook(codes, self.n_embeddings)

    def refine(self, w0, target, steps: int = 64, lr: float = 0.02,
               quantization_aware: bool = True,
               chunk: Optional[int] = 4) -> jnp.ndarray:
        """Encode-time inversion refinement of W+ against the frozen
        generator (codec/refine.py).  With ``quantization_aware`` the loss
        sees the straight-through nearest-codebook projection, i.e. it
        optimises the exact grid point the discrete decode will use (the
        Gumbel codebook is linspace(-1, 1, n_embeddings) — quant/gumbel.py)."""
        from .refine import refine_latents

        return refine_latents(
            self.generator, self.generator_vars, w0, target,
            steps=steps, lr=lr,
            levels=self.n_embeddings if quantization_aware else None,
            chunk=chunk)

    def compress(self, x, refine_steps: int = 0,
                 refine_lr: float = 0.02) -> jnp.ndarray:
        """Image -> integer codebook indices [B, num_ws, w_dim] (int32).

        ``refine_steps`` > 0 runs encode-time inversion refinement on the
        encoder means before the nearest-codebook projection: same index
        tensor shape and entropy-coding path, strictly better distortion
        (slower encode; decode unchanged)."""
        if refine_steps:
            w = self.refine(self._means_fn(self.encoder_vars, x), x,
                            steps=refine_steps, lr=refine_lr)
            codes = codebook_indices(w, self.n_embeddings)
        else:
            codes = self._compress_fn(self.encoder_vars, self.disc_vars, x)
        self.usage += np.bincount(
            np.asarray(codes).reshape(-1), minlength=self.n_embeddings
        ).astype(np.int64)
        return codes

    def decompress(self, codes) -> jnp.ndarray:
        return self._decompress_fn(self.generator_vars, jnp.asarray(codes))

    def get_code_usage(self) -> np.ndarray:
        total = self.usage.sum()
        return self.usage / total if total > 0 else self.usage.astype(np.float64)

    def save_compressed(self, x, filename: str, refine_steps: int = 0,
                        refine_lr: float = 0.02) -> Tuple[int, float, float]:
        codes = np.asarray(self.compress(x, refine_steps=refine_steps,
                                         refine_lr=refine_lr),
                           np.int32)
        orig_size = int(np.prod(x.shape)) * 4
        comp_size = codes.size * (np.log2(self.n_embeddings) / 8)
        ratio = orig_size / comp_size
        np.savez_compressed(
            filename,
            codes=codes,
            n_embeddings=self.n_embeddings,
            resolution=np.asarray(x.shape[1:3]),
            orig_size=orig_size,
            comp_size=comp_size,
            compression_ratio=ratio,
        )
        return orig_size, comp_size, ratio

    def load_compressed(self, filename: str):
        data = np.load(filename)
        assert int(data["n_embeddings"]) == self.n_embeddings, (
            "container codebook size mismatch"
        )
        img = self.decompress(jnp.asarray(data["codes"]))
        return img, float(data["compression_ratio"])
