"""Batched generator sampling utility.

Capability parity with ``MemoryEfficientGenerator``
(/root/reference/memory_efficient_generator.py:21-284): generate N images in
fixed-size batches with optional truncation, per-seed reproducibility, and
single-image convenience — without the reference's per-batch cache-clearing
rituals (XLA owns device memory; static batch shapes mean one compiled
executable reused across batches).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import GeneratorConfig, Precision
from ..utils.images import save_image
from .generator import Generator


class BatchedSampler:
    def __init__(
        self,
        generator_cfg: GeneratorConfig,
        gen_vars=None,
        batch_size: int = 4,
        precision: Precision = Precision(),
        seed: int = 0,
    ):
        self.cfg = generator_cfg
        self.generator = Generator(generator_cfg, precision)
        if gen_vars is None:
            gen_vars = jax.jit(self.generator.init)(
                jax.random.PRNGKey(seed), jnp.zeros([1, generator_cfg.z_dim])
            )
        self.gen_vars = gen_vars
        self.batch_size = batch_size

        def _sample(z, psi):
            ws = self.generator.apply(self.gen_vars, z, psi, method="mapping")
            return self.generator.apply(self.gen_vars, ws, method="synthesis")

        self._sample = jax.jit(_sample, static_argnames=("psi",))

    def _z_for_seeds(self, seeds: Sequence[int]) -> jnp.ndarray:
        zs = [
            jax.random.normal(jax.random.PRNGKey(int(s)), [self.cfg.z_dim])
            for s in seeds
        ]
        return jnp.stack(zs)

    def generate_from_seeds(
        self,
        seeds: Sequence[int],
        truncation_psi: float = 1.0,
        output_dir: Optional[str] = None,
    ) -> np.ndarray:
        """One image per seed (reproducible), batched at a fixed shape."""
        images = []
        bs = self.batch_size
        seeds = list(seeds)
        for i in range(0, len(seeds), bs):
            chunk = seeds[i:i + bs]
            pad = bs - len(chunk)
            z = self._z_for_seeds(chunk + chunk[:1] * pad)
            img = np.asarray(self._sample(z, truncation_psi))[: len(chunk)]
            images.append(img)
            if output_dir:
                for s, im in zip(chunk, img):
                    save_image(im, os.path.join(output_dir, f"seed_{s:06d}.png"))
        return np.concatenate(images)

    def generate_images(
        self,
        num_images: int,
        seed: int = 0,
        truncation_psi: float = 1.0,
        output_dir: Optional[str] = None,
    ) -> np.ndarray:
        return self.generate_from_seeds(
            range(seed, seed + num_images), truncation_psi, output_dir
        )

    def generate_single_image(
        self, seed: int = 0, truncation_psi: float = 1.0,
        filename: Optional[str] = None,
    ) -> np.ndarray:
        img = self.generate_from_seeds([seed], truncation_psi)[0]
        if filename:
            save_image(img, filename)
        return img
