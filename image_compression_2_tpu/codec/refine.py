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
    levels=None,
    affine: bool = False,
):
    """Build a jitted ``refine(gen_vars, w0, target[, lo, hi]) -> w`` closure.

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
    (``quant.gumbel``) — the two quantizers share the grid.  ``levels`` may
    be a per-W-layer tuple for variable bit allocations.

    With ``affine=True`` the returned closure takes per-(image, layer) grid
    bounds ``refine(gen_vars, w0, target, lo, hi)`` ([B, num_ws] each) and
    quantizes straight-through on the affine grid spanning [lo, hi] —
    INCLUDING the boundary clamp, so the optimisation sees exactly the
    reconstruction the entropy-coded index path will produce
    (quant.uniform.quantize_to_indices_affine).

    With ``affine='grid'`` the closure additionally takes per-(image, layer)
    level COUNTS ``refine(gen_vars, w0, target, lo, hi, nlv)`` ([B, num_ws]
    int) — the FIXED-STEP refined grid (quant.uniform.fixed_step_levels),
    where the alphabet size varies per image/layer instead of the step.
    ``levels`` is ignored in this mode; the counts are runtime data.

    The loop runs fp32 on the latent regardless of the synthesis compute
    dtype — W+ is the quantity being optimised and then quantized, so it
    must not round-trip through bf16.
    """
    opt = optax.adam(lr)
    if levels is not None and not isinstance(levels, int):
        levels = tuple(int(x) for x in levels)

    def _scales(num_ws):
        if isinstance(levels, int):
            return float(levels - 1)
        return jnp.asarray([x - 1 for x in levels], jnp.float32)[None, :, None]

    def loss_fn(w, gen_vars, target, lo=None, hi=None, nlv=None):
        if affine:
            scale = (nlv.astype(jnp.float32)[:, :, None] - 1.0
                     if affine == "grid" else _scales(w.shape[1]))
            lo = lo[:, :, None]
            hi = hi[:, :, None]
            w01 = jnp.clip((w - lo) / (hi - lo), 0.0, 1.0)
            wq = lo + (jnp.round(w01 * scale) / scale) * (hi - lo)
            w = w + jax.lax.stop_gradient(wq - w)
        elif levels is not None:
            scale = _scales(w.shape[1])
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
    def refine(gen_vars, w0, target, lo=None, hi=None, nlv=None):
        w0 = w0.astype(jnp.float32)
        if affine:
            lo = jnp.asarray(lo, jnp.float32)
            hi = jnp.asarray(hi, jnp.float32)

        def body(carry, _):
            w, opt_state = carry
            g = (grad_fn(w, gen_vars, target, lo, hi, nlv) if affine
                 else grad_fn(w, gen_vars, target))
            updates, opt_state = opt.update(g, opt_state, w)
            return (optax.apply_updates(w, updates), opt_state), None

        (w, _), _ = jax.lax.scan(body, (w0, opt.init(w0)), None, length=steps)
        return w

    return refine


@functools.lru_cache(maxsize=16)
def _cached_refiner(generator, steps: int, lr: float, levels, affine: bool):
    """One compiled refiner per (generator module, hyperparams) — flax
    modules are frozen dataclasses, so they key the cache; parameters are
    passed per call."""

    def synthesis(gen_vars, w):
        return generator.apply(gen_vars, w, method="synthesis")

    return make_refiner(synthesis, steps=steps, lr=lr, levels=levels,
                        affine=affine)


def refine_latents(
    generator,
    gen_vars,
    w0,
    target,
    steps: int = 64,
    lr: float = 0.02,
    levels=None,
    chunk: Optional[int] = 4,
    w_range=None,
    n_levels=None,
) -> jnp.ndarray:
    """Shared encode-time refinement entry for every codec class.

    ``chunk`` bounds the device batch per refinement call: the backward pass
    through the full synthesis stack holds every layer's activations, so
    large eval batches OOM where the forward-only encode does not
    (whole-tower remat does not reduce peak HBM here — see
    train/stage1.py:67).  The loss sums per-sample means, so chunked
    execution follows the identical Adam trajectory; chunks of equal size
    reuse one compiled program (a trailing ragged chunk compiles once more).

    ``w_range = (lo, hi)`` ([B, num_ws] each) switches the straight-through
    quantizer to the per-(image, layer) affine grid the entropy-coded index
    path decodes on (requires ``levels``); adding ``n_levels`` ([B, num_ws]
    int) switches to the FIXED-STEP grid whose level counts are runtime
    data (``levels`` is then ignored).
    """
    affine = ("grid" if (w_range is not None and n_levels is not None)
              else w_range is not None)
    if isinstance(levels, int) or levels is None:
        lv = None if levels is None else int(levels)
    else:
        lv = tuple(int(x) for x in levels)
    fn = _cached_refiner(generator, int(steps), float(lr), lv, affine)
    target = jnp.asarray(target)
    n = w0.shape[0]
    # The refinement loop is a fwd+bwd workload: trace it under the policy's
    # TRAINING tables so filtered_lrelu picks the measured fwd+bwd winners
    # and whole-layer fusion stays off (its VJP recomputes the unfused layer,
    # which would make every step pay fused-fwd ON TOP of the unfused
    # fwd+bwd).  Mode selection happens at Python trace time, so flipping
    # the flag around the calls (tracing occurs inside the first one) is
    # sufficient; compiled executables are unaffected.
    from ..ops import flrelu_policy

    prev_train = flrelu_policy._TRAIN
    flrelu_policy.set_train(True)
    try:
        if affine:
            assert affine == "grid" or levels is not None, (
                "affine refinement requires levels (or n_levels)")
            lo = jnp.asarray(w_range[0], jnp.float32)
            hi = jnp.asarray(w_range[1], jnp.float32)
            nlv = (jnp.asarray(n_levels, jnp.int32)
                   if affine == "grid" else None)
            if chunk is None or n <= chunk:
                return fn(gen_vars, w0, target, lo, hi, nlv)
            outs = [fn(gen_vars, w0[i:i + chunk], target[i:i + chunk],
                       lo[i:i + chunk], hi[i:i + chunk],
                       None if nlv is None else nlv[i:i + chunk])
                    for i in range(0, n, chunk)]
            return jnp.concatenate(outs, axis=0)
        if chunk is None or n <= chunk:
            return fn(gen_vars, w0, target)
        outs = [fn(gen_vars, w0[i:i + chunk], target[i:i + chunk])
                for i in range(0, n, chunk)]
        return jnp.concatenate(outs, axis=0)
    finally:
        flrelu_policy.set_train(prev_train)
