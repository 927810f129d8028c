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

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def make_refiner(
    apply_fn,
    steps: int = 64,
    lr: float = 0.02,
    bits: Optional[int] = None,
):
    """Build a jitted ``refine(gen_vars, w0, target) -> w`` closure.

    apply_fn(gen_vars, w) -> image must be a pure synthesis closure; the
    target is NHWC in [-1, 1].  When the synthesis resolution differs from
    the target's, the synthesised image is bilinearly resized to the target
    grid (the same comparison the codec's ``forward`` makes).

    With ``bits`` set, the quantizer runs inside the loss with a
    straight-through gradient, so at coarse bit-widths the optimisation
    targets the dequantized grid point the decoder will actually see rather
    than the pre-quantization latent.

    The loop runs fp32 on the latent regardless of the synthesis compute
    dtype — W+ is the quantity being optimised and then quantized, so it
    must not round-trip through bf16.
    """
    opt = optax.adam(lr)

    def loss_fn(w, gen_vars, target):
        if bits is not None:
            from ..quant.uniform import quantize_uniform

            w = w + jax.lax.stop_gradient(quantize_uniform(w, bits) - w)
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
