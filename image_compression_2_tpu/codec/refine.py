"""Encode-time latent refinement: gradient descent on W+ against the frozen
generator before quantization.

The encoder gives a one-shot amortised inverse of ``G.synthesis``; its
residual inversion error dominates the codec's distortion (RD tables are
flat from 4 -> 10 bits).  Standard GAN-inversion practice closes that gap at
encode time: initialise W+ from the encoder, then run N Adam steps on W+
minimising reconstruction error through the frozen synthesis network.  The
bitstream is unchanged — same shape, same quantizer, same container — so
this trades encoder compute for distortion with no rate cost.

This is a capability the reference does not have (its encode path is the
single amortised forward at /root/reference/stylegan3_hvae_full.py:283-293);
it exists here because the jitted loss-and-grad of the synthesis stack is
already the training hot path, so the whole refinement loop compiles into
ONE device program (`lax.scan` over steps, no host round-trips).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import optax


def make_refiner(
    apply_fn,
    steps: int = 64,
    lr: float = 0.02,
    levels: Optional[int] = None,
):
    """Build a jitted ``refine(gen_vars, w0, target) -> w`` closure.

    apply_fn(gen_vars, w) -> image must be a pure synthesis closure; the
    target is NHWC in [-1, 1].  When the synthesis resolution differs from
    the target's, the synthesised image is bilinearly resized to the target
    grid (the same comparison the codec's ``forward`` makes).

    With ``levels`` set, quantization to the linspace(-1, 1, levels) grid
    runs inside the loss with a straight-through gradient, so at coarse
    bit-widths the optimisation targets the dequantized grid point the
    decoder will actually see rather than the pre-quantization latent.
    ``levels = 2**bits`` matches ``quant.uniform.quantize_uniform``;
    ``levels = n_embeddings`` matches the Gumbel scalar codebook
    (``quant.gumbel``) — the two quantizers share the grid.

    The loop runs fp32 on the latent regardless of the synthesis compute
    dtype — W+ is the quantity being optimised and then quantized, so it
    must not round-trip through bf16.
    """
    opt = optax.adam(lr)

    def loss_fn(w, gen_vars, target):
        if levels is not None:
            scale = levels - 1
            wq = (jnp.round((w + 1.0) * 0.5 * scale) / scale) * 2.0 - 1.0
            w = w + jax.lax.stop_gradient(wq - w)
        img = apply_fn(gen_vars, w)
        if img.shape[1] != target.shape[1]:
            img = jax.image.resize(
                img,
                (img.shape[0], target.shape[1], target.shape[2], img.shape[3]),
                method="bilinear",
            )
        # per-sample mean, summed over the batch: each sample's gradient is
        # then independent of batch size, so chunked execution (the OOM
        # tactic in Compressor.refine) follows the identical Adam trajectory
        sq = jnp.square(img.astype(jnp.float32) - target)
        return jnp.sum(jnp.mean(sq, axis=tuple(range(1, sq.ndim))))

    grad_fn = jax.grad(loss_fn)

    @jax.jit
    def refine(gen_vars, w0, target):
        w0 = w0.astype(jnp.float32)

        def body(carry, _):
            w, opt_state = carry
            updates, opt_state = opt.update(
                grad_fn(w, gen_vars, target), opt_state, w
            )
            return (optax.apply_updates(w, updates), opt_state), None

        (w, _), _ = jax.lax.scan(body, (w0, opt.init(w0)), None, length=steps)
        return w

    return refine


@functools.lru_cache(maxsize=16)
def _cached_refiner(generator, steps: int, lr: float, levels: Optional[int]):
    """One compiled refiner per (generator module, hyperparams) — flax
    modules are frozen dataclasses, so they key the cache; parameters are
    passed per call."""

    def synthesis(gen_vars, w):
        return generator.apply(gen_vars, w, method="synthesis")

    return make_refiner(synthesis, steps=steps, lr=lr, levels=levels)


def refine_latents(
    generator,
    gen_vars,
    w0,
    target,
    steps: int = 64,
    lr: float = 0.02,
    levels: Optional[int] = None,
    chunk: Optional[int] = 4,
) -> jnp.ndarray:
    """Shared encode-time refinement entry for every codec class.

    ``chunk`` bounds the device batch per refinement call: the backward pass
    through the full synthesis stack holds every layer's activations, so
    large eval batches OOM where the forward-only encode does not
    (whole-tower remat does not reduce peak HBM here — see
    train/stage1.py:67).  The loss sums per-sample means, so chunked
    execution follows the identical Adam trajectory; chunks of equal size
    reuse one compiled program (a trailing ragged chunk compiles once more).
    """
    fn = _cached_refiner(generator, int(steps), float(lr),
                         None if levels is None else int(levels))
    target = jnp.asarray(target)
    n = w0.shape[0]
    if chunk is None or n <= chunk:
        return fn(gen_vars, w0, target)
    outs = [fn(gen_vars, w0[i:i + chunk], target[i:i + chunk])
            for i in range(0, n, chunk)]
    return jnp.concatenate(outs, axis=0)
