"""High-level training loops (the product trainers).

Capability parity with the reference trainers (SURVEY §2.4):
- ``train_hvae_encoder``  ≙ stylegan3_hvae_full.py:383-921 (stage 1)
- ``train_gumbel_hvae``   ≙ gumbel_softmax_compression.py:322-697 (stage 2)

Shared mechanics: real-folder or synthetic (seeded G-sample) data, epoch loop
with per-epoch loss history, optional validation, periodic sample dumps
(original / reconstructed / 8-bit-quantized), periodic + final checkpoints,
and resume.  Deliberate fixes vs the reference: the encoder runs once per
step (not 3x), the non-mixed-precision path actually trains (the reference's
runs under no_grad — stylegan3_hvae_full.py:669), and stage-2 resume accepts
stage-1 checkpoints.

TPU-native: one jitted DP train step over an optional device mesh; host code
only moves batches and writes artifacts.
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import EncoderConfig, GeneratorConfig, Precision
from ..data.dataset import (
    BatchLoader,
    ImageFolderDataset,
    generate_synthetic_dataset,
)
from ..metrics.report import MetricsLogger
from ..parallel.mesh import shard_batch
from ..quant.uniform import quantize_uniform
from ..utils.images import save_image
from .checkpoint import load_checkpoint, save_checkpoint
from .losses import LossWeights
from .stage1 import TrainState, build_stage1
from .stage2 import apply_temperature_anneal, build_stage2


def _epoch_pass(setup, loader, state, key, mesh, train: bool):
    """One pass over the loader; returns (state, averaged metrics)."""
    sums: Dict[str, float] = {}
    n = 0
    # latent supervision uses the (image, w_true) tuple when the data has it
    w_sup = getattr(setup, "weights", None) is not None and getattr(
        setup.weights, "w_l2", 0.0) > 0
    for batch_idx, batch in enumerate(loader):
        x = batch[0] if isinstance(batch, tuple) else batch
        w_true = (
            batch[1]
            if (w_sup and train and isinstance(batch, tuple)
                and len(batch) > 1 and np.ndim(batch[1]) == 3)
            else None
        )
        bsz = x.shape[0]
        if mesh is not None:
            x = shard_batch(np.asarray(x, np.float32), mesh)
            if w_true is not None:
                w_true = shard_batch(np.asarray(w_true, np.float32), mesh)
        else:
            x = jnp.asarray(x, jnp.float32)
            if w_true is not None:
                w_true = jnp.asarray(w_true, jnp.float32)
        if w_true is not None:
            x = (x, w_true)
        # Per-batch key: eval steps fold only the (constant) state.step, so
        # without this every validation batch would reuse one posterior-
        # sampling key, correlating val metrics across batches.
        bkey = jax.random.fold_in(key, batch_idx)
        if train:
            state, metrics = setup.train_step(
                state, setup.gen_vars, setup.lpips_vars, setup.w_avg, x, bkey
            )
        elif setup.eval_step is not None:
            metrics = setup.eval_step(
                state, setup.gen_vars, setup.lpips_vars, setup.w_avg, x, bkey
            )
        else:  # fallback: run the train step and discard the update
            _, metrics = setup.train_step(
                state, setup.gen_vars, setup.lpips_vars, setup.w_avg, x, bkey
            )
        for k, v in metrics.items():
            sums[k] = sums.get(k, 0.0) + float(v) * bsz
        n += bsz
    return state, {k: v / max(n, 1) for k, v in sums.items()}


def _dump_samples(setup, state, images, gen_vars, out_dir, tag, stage2=False):
    """original / reconstructed / 8-bit-quantized sample PNGs."""
    os.makedirs(out_dir, exist_ok=True)
    x = jnp.asarray(images[:3], jnp.float32)
    enc_params = state.params["encoder"] if stage2 else state.params
    _, means, _ = setup.encoder.apply({"params": enc_params}, x, None)
    recon = setup.generator.apply(gen_vars, means, method="synthesis")
    quant = setup.generator.apply(
        gen_vars, quantize_uniform(means, 8), method="synthesis"
    )
    if recon.shape[1] != x.shape[1]:
        recon = jax.image.resize(recon, x.shape, method="bilinear")
        quant = jax.image.resize(quant, x.shape, method="bilinear")
    for i in range(x.shape[0]):
        save_image(np.asarray(x[i]), os.path.join(out_dir, f"{tag}_{i}_original.png"))
        save_image(np.asarray(recon[i]),
                   os.path.join(out_dir, f"{tag}_{i}_reconstructed.png"))
        save_image(np.asarray(quant[i]),
                   os.path.join(out_dir, f"{tag}_{i}_quantized_8bit.png"))


def _setup_data(
    setup,
    dataset_path: Optional[str],
    val_dataset_path: Optional[str],
    training_resolution: int,
    batch_size: int,
    train_samples: int,
    seed: int,
    num_prefetch: int,
    truncation_psi=1.0,
    val_samples: int = 0,
    mesh=None,
):
    if dataset_path is not None:
        train_ds = ImageFolderDataset(dataset_path, resolution=training_resolution)
    else:
        # truncation_psi < 1 pulls samples toward w_avg: smoother, more
        # natural-statistics images that are substantially easier to invert
        # (the reference trains on psi=1 samples; this is a quality knob).
        # A psi LIST mixes truncation levels across the dataset.
        train_ds = generate_synthetic_dataset(
            setup.generator, setup.gen_vars, num_samples=train_samples,
            batch_size=max(batch_size, 4), resolution=training_resolution,
            seed=seed, truncation_psi=truncation_psi,
        )
    train_loader = BatchLoader(train_ds, batch_size, shuffle=True, seed=seed,
                               prefetch=num_prefetch)
    val_loader = None
    # Partial final val batches are kept on single-device runs (one extra
    # jit specialization, but a val set smaller than batch_size would
    # otherwise silently yield ZERO batches); under a mesh the batch must
    # divide the data axis, so the remainder is dropped there.
    val_drop_last = mesh is not None
    if val_dataset_path is not None:
        val_ds = ImageFolderDataset(val_dataset_path,
                                    resolution=training_resolution)
        val_loader = BatchLoader(val_ds, batch_size, shuffle=False,
                                 prefetch=num_prefetch,
                                 drop_last=val_drop_last)
    elif val_samples > 0 and dataset_path is None:
        # held-out synthetic validation: different seed stream than training,
        # so per-epoch val metrics track generalisation, not memorisation
        val_ds = generate_synthetic_dataset(
            setup.generator, setup.gen_vars, num_samples=val_samples,
            batch_size=max(batch_size, 4), resolution=training_resolution,
            seed=seed + 99991, truncation_psi=truncation_psi,
        )
        val_loader = BatchLoader(val_ds, batch_size, shuffle=False,
                                 prefetch=num_prefetch,
                                 drop_last=val_drop_last)
    return train_ds, train_loader, val_loader


def _run_training(
    setup,
    output_dir: str,
    num_epochs: int,
    start_epoch: int,
    save_every: int,
    train_loader,
    val_loader,
    train_ds,
    seed: int,
    mesh,
    config_meta: Dict,
    stage2: bool = False,
    anneal_rate: float = 3e-5,
    min_temperature: float = 0.5,
) -> Tuple[TrainState, Dict]:
    os.makedirs(os.path.join(output_dir, "samples"), exist_ok=True)
    os.makedirs(os.path.join(output_dir, "checkpoints"), exist_ok=True)
    logger = MetricsLogger(os.path.join(output_dir, "metrics.jsonl"))
    state = setup.state
    key = jax.random.PRNGKey(seed + 1)

    final = os.path.join(
        output_dir, "gumbel_hvae_final.ic2t" if stage2 else
        "hvae_encoder_final.ic2t")
    best_path = final[: -len("final.ic2t")] + "best.ic2t"

    def _sel_metric(m: Dict) -> Optional[float]:
        # model selection targets reconstruction error (the RD tables'
        # distortion axis), falling back to the total loss; non-finite
        # values never compete (a NaN baseline must not pin the selection)
        v = m.get("rec_loss", m.get("loss"))
        if v is None or not np.isfinite(v):
            return None
        return float(v)

    # Validation-based model selection: the shipped *_final.ic2t is the
    # best-validation state, not the last one.  The warm-start/initial state
    # competes too, so a fine-tune that only hurts (round-3 post-mortem:
    # stage-2 gumbel lost 1.4 dB held-out to its own stage-1 warm start)
    # ships its starting point instead of the damage.
    best_val: Optional[float] = None
    best_epoch: Optional[int] = None
    if val_loader is not None and start_epoch < num_epochs:
        # A resumed run must not clobber the best checkpoint written before
        # the interruption: seed the selection from the existing best file's
        # meta and only overwrite when the fresh baseline is strictly better.
        if os.path.exists(best_path):
            try:
                _, prev_meta = load_checkpoint(best_path)
                pv = prev_meta.get("val")
                if pv is not None and np.isfinite(pv):
                    best_val = float(pv)
                    best_epoch = int(prev_meta.get("epoch", start_epoch - 1))
                    print(f"Existing best checkpoint kept as incumbent: "
                          f"epoch {best_epoch + 1}, val rec {best_val:.5f}")
            except Exception as e:  # unreadable best file: recompute below
                print(f"WARNING: could not read {best_path} ({e}); "
                      f"re-seeding selection from a fresh baseline eval")
        _, val0 = _epoch_pass(setup, val_loader, state, key, mesh, train=False)
        v0 = _sel_metric(val0)
        if v0 is not None and (best_val is None or v0 < best_val):
            best_val = v0
            best_epoch = start_epoch - 1
            save_checkpoint(best_path, state,
                            meta={"epoch": best_epoch, "val": best_val,
                                  "history": logger.history,
                                  "config": config_meta})
            print(f"Baseline (pre-training) val rec: {best_val:.5f}")

    for epoch in range(start_epoch, num_epochs):
        t0 = time.time()
        state, train_m = _epoch_pass(setup, train_loader, state, key, mesh,
                                     train=True)
        epoch_time = time.time() - t0
        record = {**train_m, "epoch": epoch, "epoch_time": epoch_time}

        if val_loader is not None:
            _, val_m = _epoch_pass(setup, val_loader, state, key, mesh,
                                   train=False)
            record.update({f"val_{k}": v for k, v in val_m.items()})
            cur = _sel_metric(val_m)
            if cur is not None and (best_val is None or cur < best_val):
                best_val, best_epoch = cur, epoch
                save_checkpoint(best_path, state,
                                meta={"epoch": epoch, "val": best_val,
                                      "history": logger.history,
                                      "config": config_meta})
            # always logged so history keys stay epoch-aligned (NaN until a
            # finite best exists)
            record["val_best"] = (best_val if best_val is not None
                                  else float("nan"))

        if stage2:
            state = apply_temperature_anneal(state, anneal_rate,
                                             min_temperature)
            record["temperature"] = float(
                np.exp(state.params["discretization"]["log_temperature"][0])
            )

        logger.log(record, step=int(state.step))
        msg = " | ".join(f"{k}: {v:.4f}" for k, v in record.items()
                         if isinstance(v, float))
        print(f"Epoch {epoch + 1}/{num_epochs} | {msg}")

        if (epoch + 1) % save_every == 0 or epoch == num_epochs - 1:
            sample_images = np.stack([
                train_ds[i][0] if isinstance(train_ds[i], tuple) else train_ds[i]
                for i in range(min(3, len(train_ds)))
            ])
            _dump_samples(setup, state, sample_images, setup.gen_vars,
                          os.path.join(output_dir, "samples"),
                          f"epoch_{epoch + 1}", stage2=stage2)
            ckpt = os.path.join(output_dir, "checkpoints",
                                f"epoch_{epoch + 1}.ic2t")
            save_checkpoint(ckpt, state,
                            meta={"epoch": epoch, "history": logger.history,
                                  "config": config_meta})

    if best_epoch is not None and os.path.exists(best_path):
        # Promote best -> final, but re-stamp the meta: the best file's meta
        # is frozen at the best epoch (truncated history, stale epoch), so a
        # straight copy would make a resume-from-final replay trained epochs.
        best_raw, _ = load_checkpoint(best_path)
        save_checkpoint(final, best_raw,
                        meta={"epoch": num_epochs - 1,
                              "selected_epoch": best_epoch,
                              "val": best_val,
                              "history": logger.history,
                              "config": config_meta})
        print(f"Final model = best-validation state (epoch {best_epoch + 1}, "
              f"val rec {best_val:.5f}); last state remains in checkpoints/")
    else:
        save_checkpoint(final, state,
                        meta={"epoch": num_epochs - 1,
                              "history": logger.history,
                              "config": config_meta})
    try:
        from ..utils.plotting import plot_history_svg

        loss_keys = [k for k in logger.history
                     if k.endswith("loss") and logger.history[k]]
        if loss_keys:
            plot_history_svg(logger.history,
                             os.path.join(output_dir, "loss_curves.svg"),
                             keys=loss_keys)
    except ValueError:
        pass
    print(f"Saved final model to {final}")
    return state, logger.history


def _decay_steps(lr_decay: bool, num_epochs: int, train_samples: int,
                 batch_size: int, dataset_path: Optional[str],
                 resolution: int) -> int:
    """Cosine-decay horizon = total optimizer steps.  Synthetic data has a
    known epoch length (train_samples); folder datasets are scanned for
    their real length (file listing only — cheap)."""
    if not lr_decay:
        return 0
    n = train_samples
    if dataset_path is not None:
        n = len(ImageFolderDataset(dataset_path, resolution=resolution))
    # floor division: BatchLoader drops the remainder batch (drop_last=True),
    # so the cosine horizon must match the actual steps per epoch
    return num_epochs * max(1, n // batch_size)


def restore_train_state(path: str, state: TrainState):
    """Restore a full TrainState from ``path``; when the checkpoint's
    optimizer state doesn't match the new optimizer's tree (e.g. resuming
    across a different lr schedule — cosine-decay Adam carries a schedule
    step count that constant-lr Adam doesn't), fall back to a params-only
    warm start with a fresh optimizer.

    Returns ``(state, meta, full_resume)``; ``full_resume`` is False on the
    params-only fallback (callers should then train from epoch 0)."""
    import flax.serialization

    try:
        restored, meta = load_checkpoint(path, target=state)
        return restored, meta, True
    except (ValueError, KeyError, TypeError) as e:
        # TypeError: flax msgpack restore on dtype/structure mismatches;
        # ValueError/KeyError: tree-shape or missing-leaf mismatches.
        raw, meta = load_checkpoint(path)
        params = flax.serialization.from_state_dict(
            state.params, raw["params"])
        print(f"WARNING: optimizer state in {path} does not match the new "
              f"optimizer ({e}); warm-starting from its params with a fresh "
              f"optimizer")
        return state.replace(params=params), meta, False


def resolve_resume_checkpoint(resume_from: Optional[str]) -> Optional[str]:
    """Resolve a --resume path, falling back to the NEWEST epoch_*.ic2t in
    the sibling checkpoints/ directory when the named file (typically
    *_final.ic2t) is missing.  A wedged run that never wrote its final file
    then costs only the epochs since the last save instead of zeroing out
    the whole downstream chain (round-3 post-mortem: a relay drop at epoch
    11/32 killed stage-2 + RD for the night).  Loud warning; still a hard
    error when no fallback exists — silently training from scratch with a
    wrong lineage wastes hours of chip time before anyone notices."""
    if resume_from is None or os.path.exists(resume_from):
        return resume_from
    ckpt_dir = os.path.join(os.path.dirname(resume_from), "checkpoints")
    cands = []
    if os.path.isdir(ckpt_dir):
        for f in os.listdir(ckpt_dir):
            if f.startswith("epoch_") and f.endswith(".ic2t"):
                try:
                    cands.append((int(f[6:-5]), os.path.join(ckpt_dir, f)))
                except ValueError:
                    pass
    if cands:
        epoch, best = max(cands)
        print(f"WARNING: --resume {resume_from} not found; falling back to "
              f"the newest checkpoint {best} (epoch {epoch})", flush=True)
        return best
    raise FileNotFoundError(
        f"--resume checkpoint not found: {resume_from} "
        f"(and no epoch_*.ic2t fallback in {ckpt_dir})")


def _arch_from_ckpt(resume_from: Optional[str]) -> Dict:
    """Encoder-architecture knobs recorded in a checkpoint's meta, so a
    resumed/warm-started run reconstructs the exact encoder without the
    caller re-specifying --pool-grids/--hidden-dims/--block-split."""
    if resume_from is None:
        return {}
    if not os.path.exists(resume_from):
        # A missing warm-start file must be loud: silently training from
        # scratch with the default architecture produces a wrong-lineage
        # checkpoint that wastes hours of chip time before anyone notices.
        raise FileNotFoundError(
            f"--resume checkpoint not found: {resume_from}")
    _, meta = load_checkpoint(resume_from)
    cfg = meta.get("config", {})
    out = {}
    for key in ("block_split", "pool_grids", "hidden_dims"):
        if cfg.get(key):
            out[key] = tuple(cfg[key])
    for key in ("channel_base", "channel_max", "fine_block", "medium_block"):
        if cfg.get(key) is not None:
            out[key] = cfg[key]
    return out


def train_hvae_encoder(
    output_dir: str = "./output",
    training_resolution: int = 256,
    batch_size: int = 4,
    max_resolution: int = 1024,
    num_epochs: int = 100,
    lr: float = 1e-4,
    kl_weight: float = 0.01,
    perceptual_weight: float = 0.8,
    rec_weight: float = 1.0,
    bf16: bool = False,
    resume_from: Optional[str] = None,
    save_every: int = 10,
    train_samples: int = 50,
    dataset_path: Optional[str] = None,
    val_dataset_path: Optional[str] = None,
    generator_cfg: Optional[GeneratorConfig] = None,
    encoder_cfg: Optional[EncoderConfig] = None,
    gen_vars=None,
    use_lpips: bool = True,
    mesh=None,
    seed: int = 42,
    num_prefetch: int = 2,
    remat: bool = False,
    truncation_psi=1.0,
    w_weight: float = 0.0,
    lr_decay: bool = False,
    val_samples: int = 0,
    pool_grids: Optional[Tuple[int, int, int]] = None,
    hidden_dims: Optional[Tuple[int, int, int]] = None,
) -> Tuple[TrainState, Dict]:
    """Stage-1 trainer (flag surface mirrors stylegan3_hvae_full.py:1023-1062).

    ``w_weight`` > 0 adds W+-space L2 supervision against the known latents
    of synthetic training samples (reference analogue:
    simple_stylegan_encoder.py:248).  ``pool_grids``/``hidden_dims`` select
    the spatially-aware projector heads (EncoderConfig docs)."""
    from ..ops import flrelu_policy

    # every filtered_lrelu traced by this process is on the training path:
    # pick the measured fwd+bwd winners, not the forward-only ones
    flrelu_policy.set_train(True)
    generator_cfg = generator_cfg or GeneratorConfig()
    resume_from = resolve_resume_checkpoint(resume_from)
    arch = _arch_from_ckpt(resume_from) if encoder_cfg is None else {}
    encoder_cfg = encoder_cfg or EncoderConfig(
        img_resolution=max_resolution,
        img_channels=generator_cfg.img_channels,
        w_dim=generator_cfg.w_dim,
        num_ws=generator_cfg.num_ws,
        block_split=arch.get("block_split", (5, 12)),
        pool_grids=pool_grids or arch.get("pool_grids", (1, 1, 1)),
        hidden_dims=hidden_dims or arch.get("hidden_dims"),
        **{k: arch[k] for k in ("channel_base", "channel_max", "fine_block",
                                "medium_block") if k in arch},
    )
    precision = Precision(compute_dtype=jnp.bfloat16 if bf16 else jnp.float32)
    weights = LossWeights(rec=rec_weight, perceptual=perceptual_weight,
                          kl=kl_weight, w_l2=w_weight)
    decay_steps = _decay_steps(lr_decay, num_epochs, train_samples,
                               batch_size, dataset_path,
                               training_resolution)
    setup = build_stage1(
        encoder_cfg, generator_cfg, gen_vars=gen_vars, lr=lr, weights=weights,
        use_lpips=use_lpips, precision=precision, mesh=mesh, seed=seed,
        lpips_image_size=training_resolution, remat=remat,
        lr_decay_steps=decay_steps,
    )

    start_epoch = 0
    if resume_from is not None:
        restored, meta, full = restore_train_state(resume_from, setup.state)
        setup.state = restored
        if full:
            start_epoch = meta.get("epoch", -1) + 1
            print(f"Resuming from epoch {start_epoch}")

    train_ds, train_loader, val_loader = _setup_data(
        setup, dataset_path, val_dataset_path, training_resolution,
        batch_size, train_samples, seed, num_prefetch, truncation_psi,
        val_samples, mesh,
    )
    config_meta = {
        "stage": 1,
        "max_resolution": max_resolution,
        "training_resolution": training_resolution,
        "img_channels": generator_cfg.img_channels,
        "w_dim": generator_cfg.w_dim,
        "num_ws": generator_cfg.num_ws,
        "block_split": list(encoder_cfg.block_split),
        "pool_grids": list(encoder_cfg.pool_grids),
        "hidden_dims": list(encoder_cfg.resolved_hidden_dims),
        "channel_base": encoder_cfg.channel_base,
        "channel_max": encoder_cfg.channel_max,
        "fine_block": encoder_cfg.fine_block,
        "medium_block": encoder_cfg.medium_block,
        "loss_weights": {"rec": rec_weight, "perceptual": perceptual_weight,
                         "kl": kl_weight},
    }
    return _run_training(setup, output_dir, num_epochs, start_epoch,
                         save_every, train_loader, val_loader, train_ds, seed,
                         mesh, config_meta)


def train_gumbel_hvae(
    output_dir: str = "./output_gumbel",
    training_resolution: int = 256,
    batch_size: int = 4,
    max_resolution: int = 1024,
    num_epochs: int = 100,
    lr: float = 1e-4,
    temperature: float = 1.0,
    temp_anneal_rate: float = 3e-5,
    min_temperature: float = 0.5,
    n_embeddings: int = 256,
    kl_weight: float = 0.01,
    perceptual_weight: float = 0.8,
    gumbel_weight: float = 0.1,
    rec_weight: float = 1.0,
    bf16: bool = False,
    resume_from: Optional[str] = None,
    save_every: int = 10,
    train_samples: int = 50,
    dataset_path: Optional[str] = None,
    val_dataset_path: Optional[str] = None,
    generator_cfg: Optional[GeneratorConfig] = None,
    encoder_cfg: Optional[EncoderConfig] = None,
    gen_vars=None,
    use_lpips: bool = True,
    mesh=None,
    seed: int = 42,
    num_prefetch: int = 2,
    truncation_psi=1.0,
    w_weight: float = 0.0,
    lr_decay: bool = False,
    val_samples: int = 0,
    pool_grids: Optional[Tuple[int, int, int]] = None,
    hidden_dims: Optional[Tuple[int, int, int]] = None,
    remat: bool = False,
) -> Tuple[TrainState, Dict]:
    """Stage-2 trainer (flag surface mirrors
    gumbel_softmax_compression.py:700-737)."""
    from ..ops import flrelu_policy

    flrelu_policy.set_train(True)  # fwd+bwd winner table (see stage-1 note)
    generator_cfg = generator_cfg or GeneratorConfig()
    resume_from = resolve_resume_checkpoint(resume_from)
    arch = _arch_from_ckpt(resume_from) if encoder_cfg is None else {}
    encoder_cfg = encoder_cfg or EncoderConfig(
        img_resolution=max_resolution,
        img_channels=generator_cfg.img_channels,
        w_dim=generator_cfg.w_dim,
        num_ws=generator_cfg.num_ws,
        block_split=arch.get("block_split", (5, 12)),
        pool_grids=pool_grids or arch.get("pool_grids", (1, 1, 1)),
        hidden_dims=hidden_dims or arch.get("hidden_dims"),
        **{k: arch[k] for k in ("channel_base", "channel_max", "fine_block",
                                "medium_block") if k in arch},
    )
    precision = Precision(compute_dtype=jnp.bfloat16 if bf16 else jnp.float32)
    weights = LossWeights(rec=rec_weight, perceptual=perceptual_weight,
                          kl=kl_weight, gumbel=gumbel_weight, w_l2=w_weight)

    encoder_params = None
    start_epoch = 0
    resume_state = None
    if resume_from is not None:
        raw, meta = load_checkpoint(resume_from)
        params = raw["params"]
        if "discretization" in params:  # stage-2 checkpoint: full resume
            resume_state = raw
            start_epoch = meta.get("epoch", -1) + 1
            print(f"Resuming stage-2 from epoch {start_epoch}")
        else:  # stage-1 checkpoint: encoder-only warm start
            encoder_params = params
            print("Warm-starting stage 2 from a stage-1 encoder checkpoint")

    setup = build_stage2(
        encoder_cfg, generator_cfg, gen_vars=gen_vars,
        encoder_params=encoder_params, n_embeddings=n_embeddings,
        temperature=temperature, lr=lr, weights=weights, use_lpips=use_lpips,
        precision=precision, mesh=mesh, seed=seed,
        lr_decay_steps=_decay_steps(lr_decay, num_epochs, train_samples,
                                    batch_size, dataset_path,
                                    training_resolution),
        remat=remat,
    )
    if resume_state is not None:
        setup.state, _, full = restore_train_state(resume_from, setup.state)
        if not full:
            start_epoch = 0

    train_ds, train_loader, val_loader = _setup_data(
        setup, dataset_path, val_dataset_path, training_resolution,
        batch_size, train_samples, seed, num_prefetch, truncation_psi,
        val_samples, mesh,
    )
    config_meta = {
        "stage": 2,
        "max_resolution": max_resolution,
        "training_resolution": training_resolution,
        "w_dim": generator_cfg.w_dim,
        "num_ws": generator_cfg.num_ws,
        "block_split": list(encoder_cfg.block_split),
        "pool_grids": list(encoder_cfg.pool_grids),
        "hidden_dims": list(encoder_cfg.resolved_hidden_dims),
        "channel_base": encoder_cfg.channel_base,
        "channel_max": encoder_cfg.channel_max,
        "fine_block": encoder_cfg.fine_block,
        "medium_block": encoder_cfg.medium_block,
        "n_embeddings": n_embeddings,
        "temperature": temperature,
    }
    return _run_training(setup, output_dir, num_epochs, start_epoch,
                         save_every, train_loader, val_loader, train_ds, seed,
                         mesh, config_meta, stage2=True,
                         anneal_rate=temp_anneal_rate,
                         min_temperature=min_temperature)
