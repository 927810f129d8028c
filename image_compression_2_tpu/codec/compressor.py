"""The codec product API: encoder + frozen generator + uniform quantizer.

API parity with the reference ``StyleGAN3Compressor``
(/root/reference/stylegan3_hvae_full.py:250-380): ``forward`` / ``encode`` /
``compress`` / ``decompress`` / ``save_compressed`` / ``load_compressed``,
including the `.npz` container keys and the published size/ratio formulas
(orig_size = numel*4 bytes of float pixels; comp_size = numel*bits/8), so a
reference user can switch over and read the same numbers.

TPU-native structure: the class is a thin host-side wrapper holding parameter
pytrees; every device computation is a cached jitted pure function.  Batches
shard across a device mesh via the optional ``mesh`` argument (data-parallel
encode/synthesise with XLA-inserted collectives over ICI).
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
from ..quant.uniform import (
    per_layer_comp_size_bytes,
    quantize_uniform,
    quantize_uniform_per_layer,
)


def _resize_bilinear(img: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize NHWC, matching torch's align_corners=False."""
    return jax.image.resize(
        img, (img.shape[0], size[0], size[1], img.shape[3]), method="bilinear"
    )


class Compressor:
    """Neural image codec: HVAE encode -> (quantize) -> StyleGAN3 synthesis.

    Images are NHWC float in [-1, 1]; latents are [B, num_ws, w_dim].
    """

    def __init__(
        self,
        encoder_cfg: EncoderConfig,
        generator_cfg: GeneratorConfig,
        encoder_vars,
        generator_vars,
        training_resolution: Optional[int] = None,
        precision: Precision = Precision(),
        mesh: Optional[jax.sharding.Mesh] = None,
    ):
        self.encoder_cfg = encoder_cfg
        self.generator_cfg = generator_cfg
        # inference codecs run the encoder pyramid in the compute dtype too
        # (the variational heads stay fp32 inside the module)
        self.encoder = HVAEEncoder(
            encoder_cfg,
            compute_dtype=precision.compute_dtype if precision.mixed else None,
        )
        self.generator = Generator(generator_cfg, precision)
        self.encoder_vars = encoder_vars
        self.generator_vars = generator_vars
        self.training_resolution = training_resolution
        self.mesh = mesh
        if mesh is not None:
            # Place the parameter trees on the mesh up front: channel-sharded
            # over 'model' when the mesh has a tensor axis (parallel/tp.py),
            # replicated otherwise.  Batches shard over 'data' per call (see
            # _place); XLA propagates both through the jitted fns.
            from ..parallel.mesh import replicated
            from ..parallel.tp import shard_tree, wants_tp

            if wants_tp(mesh):
                self.encoder_vars = shard_tree(encoder_vars, mesh)
                self.generator_vars = shard_tree(generator_vars, mesh)
            else:
                repl = replicated(mesh)
                self.encoder_vars = jax.device_put(encoder_vars, repl)
                self.generator_vars = jax.device_put(generator_vars, repl)
        # Stochastic-encode calls without an explicit key fold this counter
        # into a fixed base key, so consecutive calls draw fresh posterior
        # noise instead of silently reusing PRNGKey(0) every time.
        self._sample_counter = 0

    # ---------------------------------------------------------------- factory
    @classmethod
    def create(
        cls,
        encoder_cfg: EncoderConfig,
        generator_cfg: GeneratorConfig,
        seed: int = 0,
        **kwargs,
    ) -> "Compressor":
        """Random-init both networks (for tests / training-from-scratch)."""
        k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
        # jit the inits: eager module init dispatches thousands of small ops
        # one by one to the device (minutes on TPU); compiled it is seconds.
        enc_vars = jax.jit(HVAEEncoder(encoder_cfg).init)(
            k1,
            jnp.zeros(
                [1, encoder_cfg.img_resolution, encoder_cfg.img_resolution,
                 encoder_cfg.img_channels]
            ),
        )
        gen_vars = jax.jit(Generator(generator_cfg).init)(
            k2, jnp.zeros([1, generator_cfg.z_dim])
        )
        return cls(encoder_cfg, generator_cfg, enc_vars, gen_vars, **kwargs)

    # ------------------------------------------------------------ jitted core
    @functools.cached_property
    def _encode_fn(self):
        def encode(enc_vars, x, key):
            return self.encoder.apply(enc_vars, x, key)

        return jax.jit(encode)

    @functools.cached_property
    def _synthesis_fn(self):
        def synthesis(gen_vars, w):
            return self.generator.apply(gen_vars, w, method="synthesis")

        return jax.jit(synthesis)

    @functools.cached_property
    def _forward_fn(self):
        def forward(enc_vars, gen_vars, x, key):
            w_plus, _, _ = self.encoder.apply(enc_vars, x, key)
            img = self.generator.apply(gen_vars, w_plus, method="synthesis")
            if img.shape[1] != x.shape[1]:
                img = _resize_bilinear(img, (x.shape[1], x.shape[2]))
            return img, w_plus

        return jax.jit(forward)

    @functools.cached_property
    def _compress_fn(self):
        def compress(enc_vars, x, key, bits):
            w_plus, means, _ = self.encoder.apply(enc_vars, x, key)
            w = means if key is None else w_plus
            return quantize_uniform(w, bits)

        return {
            det: jax.jit(functools.partial(compress, key=None) if det else compress,
                         static_argnames=("bits",))
            for det in (True, False)
        }

    @functools.cached_property
    def _roundtrip_fn(self):
        def rt(enc_vars, gen_vars, x, bits):
            _, means, _ = self.encoder.apply(enc_vars, x, None)
            img = self.generator.apply(
                gen_vars, quantize_uniform(means, bits), method="synthesis"
            )
            if img.shape[1] != x.shape[1]:
                img = _resize_bilinear(img, (x.shape[1], x.shape[2]))
            return img

        return jax.jit(rt, static_argnames=("bits",))

    def refine(self, w0, target, steps: int = 64, lr: float = 0.02,
               quantization_bits=None,
               chunk: Optional[int] = 4, w_range=None,
               n_levels=None) -> jnp.ndarray:
        """Encode-time inversion refinement: N jitted Adam steps on W+
        minimising MSE(synthesis(w), target), starting from ``w0`` (usually
        the encoder's means).  Same rate, lower distortion; chunked to bound
        backward-pass HBM — see ``codec/refine.py::refine_latents``.
        ``quantization_bits`` (scalar or per-layer sequence) enables
        straight-through quantization-aware refinement on the 2**bits grid;
        ``w_range = (lo, hi)`` per [B, num_ws] switches that grid to the
        affine range the entropy-coded index path decodes on;
        ``n_levels`` ([B, num_ws] int) switches it to the fixed-step grid
        with per-(image, layer) level counts (``quantization_bits`` is then
        ignored — the counts already encode the step)."""
        from .refine import refine_latents

        if quantization_bits is None:
            levels = None
        elif isinstance(quantization_bits, (int, np.integer)):
            levels = 1 << int(quantization_bits)
        else:
            levels = tuple(1 << int(b) for b in quantization_bits)
        return refine_latents(
            self.generator, self.generator_vars, w0, target,
            steps=steps, lr=lr, levels=levels,
            chunk=chunk, w_range=w_range, n_levels=n_levels)

    def _place(self, x):
        """Shard a batch over the mesh's data axis when one is configured
        (and the batch divides it); no-op otherwise."""
        if self.mesh is None or not hasattr(x, "shape") or x.ndim == 0:
            return x
        n_data = int(self.mesh.shape.get("data", 1))
        if n_data > 1 and x.shape[0] % n_data == 0:
            from ..parallel.mesh import shard_batch

            # pass x through as-is: shard_batch device_puts, which reshards
            # device-committed arrays device-to-device (an np.asarray here
            # would force a device->host->device roundtrip per codec call)
            return shard_batch(x, self.mesh)
        return x

    def _next_sample_key(self) -> jax.Array:
        """Fresh key for stochastic encodes when the caller supplied none."""
        key = jax.random.fold_in(jax.random.PRNGKey(0), self._sample_counter)
        self._sample_counter += 1
        return key

    # -------------------------------------------------------------- user API
    def forward(self, x, sample_key: Optional[jax.Array] = None):
        """Encode + reconstruct. Returns (image, w_plus)."""
        return self._forward_fn(self.encoder_vars, self.generator_vars,
                                self._place(x), sample_key)

    __call__ = forward

    def encode(self, x, deterministic: bool = False,
               sample_key: Optional[jax.Array] = None) -> jnp.ndarray:
        """Image -> W+ (means when deterministic, else a posterior sample)."""
        if not deterministic and sample_key is None:
            sample_key = self._next_sample_key()
        w_plus, means, _ = self._encode_fn(
            self.encoder_vars, self._place(x),
            None if deterministic else sample_key
        )
        return means if deterministic else w_plus

    def compress(self, x, quantization_bits=8,
                 deterministic: bool = True,
                 sample_key: Optional[jax.Array] = None,
                 refine_steps: int = 0,
                 refine_lr: float = 0.02,
                 refine_quantization_aware: bool = False) -> jnp.ndarray:
        """Image -> quantized W+ on the 2**bits grid (dequantized floats).

        ``quantization_bits`` may be a per-W-layer sequence (length num_ws)
        for the guide's variable bit-allocation scheme.  ``refine_steps`` > 0
        runs that many Adam steps of encode-time inversion refinement on W+
        before quantization (slower encode, strictly better distortion at
        the same rate; decode is unchanged)."""
        if refine_steps:
            w = self.encode(x, deterministic=deterministic,
                            sample_key=sample_key)
            qa_bits = (int(quantization_bits) if refine_quantization_aware
                       and isinstance(quantization_bits, (int, np.integer))
                       else None)
            w = self.refine(w, x, steps=refine_steps, lr=refine_lr,
                            quantization_bits=qa_bits)
            if isinstance(quantization_bits, (int, np.integer)):
                return quantize_uniform(w, int(quantization_bits))
            return quantize_uniform_per_layer(w, tuple(quantization_bits))
        if not isinstance(quantization_bits, (int, np.integer)):
            w = self.encode(x, deterministic=deterministic,
                            sample_key=sample_key)
            return quantize_uniform_per_layer(w, tuple(quantization_bits))
        if deterministic:
            return self._compress_fn[True](
                self.encoder_vars, self._place(x), bits=int(quantization_bits)
            )
        if sample_key is None:
            sample_key = self._next_sample_key()
        return self._compress_fn[False](
            self.encoder_vars, self._place(x), sample_key,
            bits=int(quantization_bits)
        )

    def roundtrip(self, x, quantization_bits: int = 8) -> jnp.ndarray:
        """Fused deterministic transcode: encode -> quantize -> synthesize in
        ONE compiled program (one dispatch, quantized latents never leave the
        device).  Numerically identical to compress() + decompress()."""
        return self._roundtrip_fn(self.encoder_vars, self.generator_vars,
                                  self._place(x), bits=int(quantization_bits))

    def decompress(self, w_plus) -> jnp.ndarray:
        """W+ -> image via the frozen synthesis network."""
        return self._synthesis_fn(self.generator_vars,
                                  self._place(jnp.asarray(w_plus)))

    def save_compressed(
        self, x, filename: str, quantization_bits=8,
        deterministic: bool = True, refine_steps: int = 0,
        refine_lr: float = 0.02,
    ) -> Tuple[int, float, float]:
        """Compress and write the `.npz` container; returns
        (orig_size, comp_size, ratio) with the reference's formulas.
        Scalar ``quantization_bits`` keeps exact container parity; a per-layer
        sequence stores the allocation in the ``bits`` key.  ``refine_steps``
        enables encode-time refinement (container format unchanged)."""
        w_q = np.asarray(
            self.compress(x, quantization_bits, deterministic,
                          refine_steps=refine_steps, refine_lr=refine_lr),
            np.float32,
        )
        orig_size = int(np.prod(x.shape)) * 4           # fp32 pixel bytes
        if isinstance(quantization_bits, (int, np.integer)):
            comp_size = w_q.size * (quantization_bits / 8)
            bits_entry = int(quantization_bits)
        else:
            comp_size = per_layer_comp_size_bytes(
                quantization_bits, w_q.shape[-1], batch=w_q.shape[0]
            )
            bits_entry = np.asarray(quantization_bits, np.int32)
        ratio = orig_size / comp_size
        np.savez_compressed(
            filename,
            w=w_q,
            resolution=np.asarray(x.shape[1:3]),  # (H, W)
            bits=bits_entry,
            orig_size=orig_size,
            comp_size=comp_size,
            compression_ratio=ratio,
        )
        return orig_size, comp_size, ratio

    def load_compressed(self, filename: str):
        """Read a `.npz` container and reconstruct; returns (image, ratio)."""
        data = np.load(filename)
        img = self.decompress(jnp.asarray(data["w"]))
        return img, float(data["compression_ratio"])
