"""Stage-1 training: reconstruction + perceptual + KL over a frozen generator.

The train step is a pure jitted function, data-parallel over a
``jax.sharding.Mesh``: parameters/optimizer state replicated, the batch
sharded over the ``data`` axis, gradient all-reduce inserted by XLA's SPMD
partitioner over ICI.  (The reference is single-device; SURVEY §2.8 marks DP
as the required TPU-native addition.)

Mixed precision: forward in bf16 on the synthesis high-res layers via
``Precision``; parameters, loss and optimizer math in fp32 (no loss scaling
needed on TPU, unlike the reference's CUDA GradScaler path whose non-fp16
branch is broken — stylegan3_hvae_full.py:669).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.struct
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import EncoderConfig, GeneratorConfig, Precision
from ..models.encoder import HVAEEncoder
from ..models.generator import Generator
from .losses import LossWeights, kl_to_w_avg, mse_loss


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    opt_state: Any


def make_optimizer(lr: float = 1e-4, b1: float = 0.9, b2: float = 0.999,
                   decay_steps: int = 0):
    """Adam with the reference's hyperparameters
    (stylegan3_hvae_full.py:484).  ``decay_steps`` > 0 adds a cosine decay
    of the learning rate to 10% over that many steps (a quality knob the
    constant-lr reference lacks)."""
    if decay_steps > 0:
        lr = optax.cosine_decay_schedule(lr, decay_steps, alpha=0.1)
    return optax.adam(lr, b1=b1, b2=b2)


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
    )


def make_loss_fn(
    encoder: HVAEEncoder,
    generator: Generator,
    lpips_apply: Optional[Callable] = None,
    weights: LossWeights = LossWeights(),
    remat: bool = False,
):
    """Build loss(params, gen_vars, lpips_vars, w_avg, x, key) -> (loss, metrics).

    ``remat``: rematerialize the frozen synthesis + LPIPS towers on the
    backward pass (jax.checkpoint), trading frozen-network recompute FLOPs
    for their activation memory.  Measured caveat (v5e, 256², b16): encoder
    activations dominate this workload, so whole-tower checkpointing did not
    reduce peak HBM — prefer smaller batches; finer-grained checkpoint
    policies are a future knob.
    """

    def synth(gen_vars, w_plus):
        return generator.apply(gen_vars, w_plus, method="synthesis")

    if remat:
        synth = jax.checkpoint(synth)

    def loss_fn(enc_params, gen_vars, lpips_vars, w_avg, batch, key):
        # batch is either the image array or an (image, w_true) tuple —
        # synthetic samples carry the exact W+ that generated them, enabling
        # direct latent supervision (a pytree-structure, i.e. static, branch)
        x, w_true = batch if isinstance(batch, tuple) else (batch, None)
        w_plus, means, logvars = encoder.apply({"params": enc_params}, x, key)
        img = synth(gen_vars, w_plus)
        if img.shape[1] != x.shape[1]:
            img = jax.image.resize(img, x.shape, method="bilinear")
        rec = mse_loss(x, img)
        if lpips_apply is not None:
            lp = jax.checkpoint(lpips_apply) if remat else lpips_apply
            percep = jnp.mean(lp(lpips_vars, x, img))
        else:
            percep = jnp.zeros([])
        kl = kl_to_w_avg(means, logvars, w_avg[None, None, :])
        total = weights.rec * rec + weights.perceptual * percep + weights.kl * kl
        metrics = {
            "loss": total,
            "rec_loss": rec,
            "perceptual_loss": percep,
            "kl_loss": kl,
        }
        if w_true is not None and weights.w_l2 > 0:
            werr = jnp.square(means - w_true)
            # KL-form magnitude (sum over latent elements, batch-meaned):
            # a mean-form term is ~40x weaker per element than the KL prior
            # at default weights and the supervision never wins
            total = total + weights.w_l2 * 0.5 * jnp.mean(
                jnp.sum(werr, axis=(1, 2)))
            metrics["w_l2_loss"] = jnp.mean(werr)  # readable per-element MSE
            metrics["loss"] = total
        return total, metrics

    return loss_fn


def make_train_step(
    encoder: HVAEEncoder,
    generator: Generator,
    optimizer,
    lpips_apply: Optional[Callable] = None,
    weights: LossWeights = LossWeights(),
    mesh: Optional[Mesh] = None,
    remat: bool = False,
    tp_examples=None,
):
    """Build the jitted train step.

    With a mesh: the batch and the per-sample rng fold-in shard over 'data'.
    With ``tp_examples=(state, gen_vars)`` and a mesh whose 'model' axis is
    >1: parameters, optimizer state, and the frozen generator weights shard
    channel-wise over 'model' (parallel/tp.py) and XLA propagates the
    shardings through the activations, inserting the ICI collectives.
    Otherwise everything but the batch is replicated.  Without a mesh:
    plain single-device jit.
    """
    loss_fn = make_loss_fn(encoder, generator, lpips_apply, weights, remat)

    def step_fn(state: TrainState, gen_vars, lpips_vars, w_avg, x, key):
        key = jax.random.fold_in(key, state.step)
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, gen_vars, lpips_vars, w_avg, x, key
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state
        )
        return new_state, metrics

    if mesh is None:
        return jax.jit(step_fn)

    repl = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P("data"))
    state_sh = gen_sh = repl
    if tp_examples is not None:
        from ..parallel.tp import tree_shardings, wants_tp

        if wants_tp(mesh):
            state_sh = tree_shardings(tp_examples[0], mesh)
            gen_sh = tree_shardings(tp_examples[1], mesh)
    return jax.jit(
        step_fn,
        in_shardings=(state_sh, gen_sh, repl, repl, batch_sh, repl),
        out_shardings=(state_sh, repl),
    )


def make_eval_step(
    encoder: HVAEEncoder,
    generator: Generator,
    lpips_apply: Optional[Callable] = None,
    weights: LossWeights = LossWeights(),
    mesh: Optional[Mesh] = None,
    tp_examples=None,
):
    """Loss-only metrics pass for validation (no gradient computation)."""
    loss_fn = make_loss_fn(encoder, generator, lpips_apply, weights)

    def eval_fn(state: TrainState, gen_vars, lpips_vars, w_avg, x, key):
        key = jax.random.fold_in(key, state.step)
        _, metrics = loss_fn(state.params, gen_vars, lpips_vars, w_avg, x, key)
        return metrics

    if mesh is None:
        return jax.jit(eval_fn)
    repl = NamedSharding(mesh, P())
    state_sh = gen_sh = repl
    if tp_examples is not None:
        from ..parallel.tp import tree_shardings, wants_tp

        if wants_tp(mesh):
            state_sh = tree_shardings(tp_examples[0], mesh)
            gen_sh = tree_shardings(tp_examples[1], mesh)
    return jax.jit(
        eval_fn,
        in_shardings=(state_sh, gen_sh, repl, repl,
                      NamedSharding(mesh, P("data")), repl),
        out_shardings=repl,
    )


@dataclasses.dataclass
class Stage1Setup:
    """Everything needed to run stage-1 steps (built once per config)."""

    encoder: HVAEEncoder
    generator: Generator
    optimizer: Any
    state: TrainState
    gen_vars: Any
    lpips_vars: Any
    w_avg: jnp.ndarray
    train_step: Callable
    eval_step: Optional[Callable] = None
    weights: LossWeights = LossWeights()


def build_stage1(
    encoder_cfg: EncoderConfig,
    generator_cfg: GeneratorConfig,
    gen_vars=None,
    lr: float = 1e-4,
    weights: LossWeights = LossWeights(),
    use_lpips: bool = True,
    precision: Precision = Precision(),
    mesh: Optional[Mesh] = None,
    seed: int = 0,
    lpips_image_size: Optional[int] = None,
    remat: bool = False,
    lr_decay_steps: int = 0,
) -> Stage1Setup:
    """Construct encoder/generator/LPIPS, optimizer and the jitted DP step."""
    from .lpips import create_lpips

    encoder = HVAEEncoder(encoder_cfg)
    generator = Generator(generator_cfg, precision)
    k_enc, k_gen = jax.random.split(jax.random.PRNGKey(seed))
    enc_vars = jax.jit(encoder.init)(
        k_enc,
        jnp.zeros([1, encoder_cfg.img_resolution, encoder_cfg.img_resolution,
                   encoder_cfg.img_channels]),
    )
    if gen_vars is None:
        gen_vars = jax.jit(generator.init)(
            k_gen, jnp.zeros([1, generator_cfg.z_dim])
        )
    lpips_apply = None
    lpips_vars = None
    if use_lpips:
        _, lpips_vars, lpips_apply = create_lpips(
            seed=seed,
            image_size=lpips_image_size or encoder_cfg.img_resolution,
        )
    optimizer = make_optimizer(lr, decay_steps=lr_decay_steps)
    state = init_train_state(enc_vars["params"], optimizer)
    w_avg = gen_vars["buffers"]["mapping"]["w_avg"]
    tp_examples = None
    if mesh is not None:
        from ..parallel.tp import shard_tree, wants_tp

        if wants_tp(mesh):
            # place params/optimizer/generator under their tp shardings up
            # front so the first step does not reshard implicitly
            state = shard_tree(state, mesh)
            gen_vars = shard_tree(gen_vars, mesh)
            tp_examples = (state, gen_vars)
    train_step = make_train_step(
        encoder, generator, optimizer, lpips_apply, weights, mesh, remat,
        tp_examples=tp_examples,
    )
    eval_step = make_eval_step(encoder, generator, lpips_apply, weights, mesh,
                               tp_examples=tp_examples)
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
