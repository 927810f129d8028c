"""Stage-2 training: encoder + Gumbel discretization against the frozen G.

Reference semantics (/root/reference/gumbel_softmax_compression.py:322-697):
optimizer over encoder AND discretization parameters, losses = stage-1 losses
plus a perplexity target loss weighted by ``gumbel_weight``, per-epoch
temperature annealing.  Resume accepts stage-1 checkpoints (encoder only) —
the reference's cross-stage resume KeyErrors (SURVEY §2.4 T2); here it is
explicit and supported.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import flax.struct
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import EncoderConfig, GeneratorConfig, Precision
from ..models.encoder import HVAEEncoder
from ..models.generator import Generator
from ..quant.gumbel import GumbelSoftmaxDiscretization, anneal_log_temperature
from .losses import LossWeights, kl_to_w_avg, mse_loss, perplexity_loss
from .stage1 import TrainState, init_train_state, make_optimizer


def make_stage2_loss_fn(
    encoder: HVAEEncoder,
    generator: Generator,
    discretization: GumbelSoftmaxDiscretization,
    lpips_apply: Optional[Callable],
    weights: LossWeights,
    n_embeddings: int,
    remat: bool = False,
):
    def synth(gen_vars, w_disc):
        return generator.apply(gen_vars, w_disc, method="synthesis")

    if remat:
        # rematerialize the frozen towers on the backward pass — same
        # memory/FLOP trade as stage 1 (see stage1.make_loss_fn); required
        # for the 1024² flagship config on one chip
        synth = jax.checkpoint(synth)

    def loss_fn(params, gen_vars, lpips_vars, w_avg, batch, key):
        # (image, w_true) tuples enable latent supervision, as in stage 1
        x, w_true = batch if isinstance(batch, tuple) else (batch, None)
        enc_key, gum_key = jax.random.split(key)
        w_plus, means, logvars = encoder.apply(
            {"params": params["encoder"]}, x, enc_key
        )
        # hard=True: straight-through quantization-aware training — the
        # generator sees exactly the codebook values the decode path will see
        # (the reference trains on the soft relaxation, hard=False; with the
        # corrected logit scale the hard ST path is strictly closer to the
        # deployed codec and the Gumbel noise acts as local dithering)
        w_disc, perplexity, _ = discretization.apply(
            {"params": params["discretization"]}, means, hard=True, key=gum_key
        )
        img = synth(gen_vars, w_disc)
        if img.shape[1] != x.shape[1]:
            img = jax.image.resize(img, x.shape, method="bilinear")
        if lpips_apply is not None:
            lp = jax.checkpoint(lpips_apply) if remat else lpips_apply
            percep = jnp.mean(lp(lpips_vars, x, img))
        else:
            percep = jnp.zeros([])
        rec = mse_loss(x, img)
        kl = kl_to_w_avg(means, logvars, w_avg[None, None, :])
        perp = perplexity_loss(perplexity, n_embeddings)
        total = (
            weights.rec * rec
            + weights.perceptual * percep
            + weights.kl * kl
            + weights.gumbel * perp
        )
        metrics = {
            "loss": total,
            "rec_loss": rec,
            "perceptual_loss": percep,
            "kl_loss": kl,
            "perplexity_loss": perp,
            "perplexity": perplexity,
        }
        if w_true is not None and weights.w_l2 > 0:
            werr = jnp.square(means - w_true)
            total = total + weights.w_l2 * 0.5 * jnp.mean(
                jnp.sum(werr, axis=(1, 2)))
            metrics["w_l2_loss"] = jnp.mean(werr)
            metrics["loss"] = total
        return total, metrics

    return loss_fn


def make_stage2_train_step(
    encoder,
    generator,
    discretization,
    optimizer,
    lpips_apply=None,
    weights: LossWeights = LossWeights(gumbel=1.0),
    n_embeddings: int = 256,
    mesh: Optional[Mesh] = None,
    tp_examples=None,
    remat: bool = False,
):
    loss_fn = make_stage2_loss_fn(
        encoder, generator, discretization, lpips_apply, weights, n_embeddings,
        remat=remat,
    )

    def step_fn(state: TrainState, gen_vars, lpips_vars, w_avg, x, key):
        key = jax.random.fold_in(key, state.step)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, gen_vars, lpips_vars, w_avg, x, key
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(state.step + 1, params, opt_state), metrics

    if mesh is None:
        return jax.jit(step_fn)
    repl = NamedSharding(mesh, P())
    state_sh = gen_sh = repl
    if tp_examples is not None:
        from ..parallel.tp import tree_shardings, wants_tp

        if wants_tp(mesh):
            state_sh = tree_shardings(tp_examples[0], mesh)
            gen_sh = tree_shardings(tp_examples[1], mesh)
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, gen_sh, repl, repl,
                      NamedSharding(mesh, P("data")), repl),
        out_shardings=(state_sh, repl),
    )


def apply_temperature_anneal(
    state: TrainState, anneal_rate: float = 3e-5, min_temp: float = 0.5
) -> TrainState:
    """Per-epoch annealing of the discretization temperature (host-side
    schedule, reference gumbel_softmax_compression.py:578-583)."""
    params = dict(state.params)
    disc = dict(params["discretization"])
    disc["log_temperature"] = anneal_log_temperature(
        disc["log_temperature"], anneal_rate, min_temp
    )
    params["discretization"] = disc
    return TrainState(state.step, params, state.opt_state)


def build_stage2(
    encoder_cfg: EncoderConfig,
    generator_cfg: GeneratorConfig,
    gen_vars=None,
    encoder_params=None,  # stage-1 checkpoint resume: encoder only
    n_embeddings: int = 256,
    temperature: float = 1.0,
    lr: float = 1e-4,
    weights: LossWeights = LossWeights(gumbel=1.0),
    use_lpips: bool = True,
    precision: Precision = Precision(),
    mesh: Optional[Mesh] = None,
    seed: int = 0,
    lr_decay_steps: int = 0,
    remat: bool = False,
):
    from .lpips import create_lpips
    from .stage1 import Stage1Setup

    encoder = HVAEEncoder(encoder_cfg)
    generator = Generator(generator_cfg, precision)
    discretization = GumbelSoftmaxDiscretization(
        n_embeddings, initial_temperature=temperature
    )
    # k_enc/k_gen derived EXACTLY like build_stage1: with the same seed,
    # stage 2 trains against the SAME frozen random-init generator that the
    # stage-1 encoder it warm-starts from was trained against
    k_enc, k_gen = jax.random.split(jax.random.PRNGKey(seed))
    k_disc = jax.random.fold_in(k_gen, 1)
    if encoder_params is None:
        enc_vars = jax.jit(encoder.init)(
            k_enc,
            jnp.zeros([1, encoder_cfg.img_resolution, encoder_cfg.img_resolution,
                       encoder_cfg.img_channels]),
        )
        encoder_params = enc_vars["params"]
    if gen_vars is None:
        gen_vars = jax.jit(generator.init)(
            k_gen, jnp.zeros([1, generator_cfg.z_dim])
        )
    disc_vars = jax.jit(discretization.init)(
        k_disc, jnp.zeros([1, encoder_cfg.num_ws, encoder_cfg.w_dim])
    )

    lpips_apply = lpips_vars = None
    if use_lpips:
        _, lpips_vars, lpips_apply = create_lpips(
            seed=seed, image_size=encoder_cfg.img_resolution
        )

    optimizer = make_optimizer(lr, decay_steps=lr_decay_steps)
    params = {"encoder": encoder_params, "discretization": disc_vars["params"]}
    state = init_train_state(params, optimizer)
    w_avg = gen_vars["buffers"]["mapping"]["w_avg"]
    tp_examples = None
    if mesh is not None:
        from ..parallel.tp import shard_tree, wants_tp

        if wants_tp(mesh):
            state = shard_tree(state, mesh)
            gen_vars = shard_tree(gen_vars, mesh)
            tp_examples = (state, gen_vars)
    train_step = make_stage2_train_step(
        encoder, generator, discretization, optimizer, lpips_apply, weights,
        n_embeddings, mesh, tp_examples=tp_examples, remat=remat,
    )

    loss_fn = make_stage2_loss_fn(
        encoder, generator, discretization, lpips_apply, weights, n_embeddings
    )

    def eval_fn(state, gen_vars_, lpips_vars_, w_avg_, x, key):
        key = jax.random.fold_in(key, state.step)
        _, metrics = loss_fn(state.params, gen_vars_, lpips_vars_, w_avg_, x,
                             key)
        return metrics

    if mesh is None:
        eval_step = jax.jit(eval_fn)
    else:
        repl = NamedSharding(mesh, P())
        state_sh = gen_sh = repl
        if tp_examples is not None:
            from ..parallel.tp import tree_shardings

            state_sh = tree_shardings(tp_examples[0], mesh)
            gen_sh = tree_shardings(tp_examples[1], mesh)
        eval_step = jax.jit(
            eval_fn,
            in_shardings=(state_sh, gen_sh, repl, repl,
                          NamedSharding(mesh, P("data")), repl),
            out_shardings=repl,
        )

    return Stage1Setup(
        encoder=encoder,
        generator=generator,
        optimizer=optimizer,
        state=state,
        gen_vars=gen_vars,
        lpips_vars=lpips_vars,
        w_avg=w_avg,
        train_step=train_step,
        eval_step=eval_step,
        weights=weights,
    )
