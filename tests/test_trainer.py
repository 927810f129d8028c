"""End-to-end trainer smoke tests (tiny configs): artifacts, resume, stage-2."""

import json
import os

import chex
import numpy as np
import pytest

from image_compression_2_tpu.core import EncoderConfig, GeneratorConfig
from image_compression_2_tpu.train import (
    load_checkpoint,
    train_gumbel_hvae,
    train_hvae_encoder,
)

RES = 16


def _cfgs():
    gen_cfg = GeneratorConfig.tiny(img_resolution=RES, num_layers=4,
                                   margin_size=1)
    enc_cfg = EncoderConfig.tiny(
        img_resolution=RES, w_dim=gen_cfg.w_dim, num_ws=gen_cfg.num_ws,
        block_split=(2, 4),
    )
    return gen_cfg, enc_cfg


def test_stage1_trainer_end_to_end(tmp_path):
    gen_cfg, enc_cfg = _cfgs()
    out = str(tmp_path / "run1")
    state, history = train_hvae_encoder(
        output_dir=out, training_resolution=RES, batch_size=4, num_epochs=2,
        save_every=1, train_samples=8, generator_cfg=gen_cfg,
        encoder_cfg=enc_cfg, use_lpips=False, seed=0,
    )
    assert len(history["loss"]) == 2
    assert np.isfinite(history["loss"]).all()
    # artifacts
    assert os.path.exists(os.path.join(out, "hvae_encoder_final.ic2t"))
    assert os.path.exists(os.path.join(out, "checkpoints", "epoch_2.ic2t"))
    samples = os.listdir(os.path.join(out, "samples"))
    assert any("original" in s for s in samples)
    assert any("reconstructed" in s for s in samples)
    assert any("quantized_8bit" in s for s in samples)
    # metrics stream
    lines = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert lines[0]["epoch"] == 0 and "rec_loss" in lines[0]

    # resume from epoch checkpoint continues numbering
    out2 = str(tmp_path / "run1b")
    state2, history2 = train_hvae_encoder(
        output_dir=out2, training_resolution=RES, batch_size=4, num_epochs=3,
        save_every=1, train_samples=8, generator_cfg=gen_cfg,
        encoder_cfg=enc_cfg, use_lpips=False, seed=0,
        resume_from=os.path.join(out, "checkpoints", "epoch_2.ic2t"),
    )
    assert len(history2["loss"]) == 1  # epochs 2..2 only
    assert int(state2.step) > int(state.step) - 1


def test_stage2_trainer_warm_start_from_stage1(tmp_path):
    gen_cfg, enc_cfg = _cfgs()
    out1 = str(tmp_path / "s1")
    train_hvae_encoder(
        output_dir=out1, training_resolution=RES, batch_size=4, num_epochs=1,
        save_every=1, train_samples=4, generator_cfg=gen_cfg,
        encoder_cfg=enc_cfg, use_lpips=False, seed=0,
    )
    out2 = str(tmp_path / "s2")
    state, history = train_gumbel_hvae(
        output_dir=out2, training_resolution=RES, batch_size=4, num_epochs=2,
        save_every=2, train_samples=4, n_embeddings=32,
        generator_cfg=gen_cfg, encoder_cfg=enc_cfg, use_lpips=False, seed=0,
        resume_from=os.path.join(out1, "hvae_encoder_final.ic2t"),
        temp_anneal_rate=0.01,
    )
    assert "perplexity" in history and len(history["loss"]) == 2
    assert "temperature" in history
    # temperature annealed down
    assert history["temperature"][-1] < 1.0
    final = os.path.join(out2, "gumbel_hvae_final.ic2t")
    assert os.path.exists(final)
    raw, meta = load_checkpoint(final)
    assert meta["config"]["stage"] == 2
    assert "discretization" in raw["params"]

    # stage-2 full resume from its own checkpoint
    state3, history3 = train_gumbel_hvae(
        output_dir=str(tmp_path / "s2b"), training_resolution=RES,
        batch_size=4, num_epochs=3, save_every=3, train_samples=4,
        n_embeddings=32, generator_cfg=gen_cfg, encoder_cfg=enc_cfg,
        use_lpips=False, seed=0, resume_from=final, temp_anneal_rate=0.01,
    )
    assert len(history3["loss"]) == 1


def test_stage2_warm_start_adopts_checkpoint_architecture(tmp_path):
    """With no encoder_cfg/flags, the stage-2 warm start must rebuild the
    stage-1 encoder architecture from the checkpoint's own meta (incl. the
    round-3 spatial-head knobs) instead of defaulting and shape-mismatching."""
    gen_cfg = GeneratorConfig.tiny(img_resolution=RES, num_layers=4,
                                   margin_size=1)
    enc_cfg = EncoderConfig.tiny(
        img_resolution=RES, w_dim=gen_cfg.w_dim, num_ws=gen_cfg.num_ws,
        block_split=(2, 4), pool_grids=(1, 2, 2), hidden_dims=(32, 32, 48),
    )
    out1 = str(tmp_path / "s1")
    train_hvae_encoder(
        output_dir=out1, training_resolution=RES, batch_size=4, num_epochs=1,
        save_every=1, train_samples=4, generator_cfg=gen_cfg,
        encoder_cfg=enc_cfg, use_lpips=False, seed=0,
    )
    state, history = train_gumbel_hvae(
        output_dir=str(tmp_path / "s2"), training_resolution=RES,
        max_resolution=RES, batch_size=4, num_epochs=1, save_every=1,
        train_samples=4, n_embeddings=32, generator_cfg=gen_cfg,
        use_lpips=False, seed=0,  # NOTE: no encoder_cfg, no arch flags
        resume_from=os.path.join(out1, "hvae_encoder_final.ic2t"),
    )
    assert np.isfinite(history["loss"]).all()
    raw, meta = load_checkpoint(
        os.path.join(str(tmp_path / "s2"), "gumbel_hvae_final.ic2t"))
    assert tuple(meta["config"]["pool_grids"]) == (1, 2, 2)
    assert tuple(meta["config"]["hidden_dims"]) == (32, 32, 48)
    assert tuple(meta["config"]["block_split"]) == (2, 4)
    assert meta["config"]["channel_max"] == enc_cfg.channel_max


def test_cosine_lr_decay_schedule():
    """make_optimizer(decay_steps>0) shrinks the effective step size ~10x by
    the end of the horizon (cosine to alpha=0.1)."""
    import jax.numpy as jnp
    import optax

    from image_compression_2_tpu.train.stage1 import make_optimizer

    params = {"w": jnp.ones([4])}
    grads = {"w": jnp.ones([4])}
    tx = make_optimizer(lr=1e-3, decay_steps=100)
    state = tx.init(params)
    first = last = None
    for step in range(100):
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        size = float(jnp.abs(updates["w"]).mean())
        if step == 0:
            first = size
        last = size
    assert last < first * 0.2, (first, last)


def test_stage1_trainer_from_image_folder(tmp_path):
    """End-to-end folder-dataset training: write generator samples to disk as
    PNGs, then train stage 1 from the folder (the ImageNet-100 ingestion
    path — /root/reference/stylegan3_hvae_full.py:503-535 — exercised
    without kaggle), including a folder val split."""
    import jax
    import jax.numpy as jnp

    from image_compression_2_tpu.data.dataset import generate_synthetic_dataset
    from image_compression_2_tpu.models import Generator
    from image_compression_2_tpu.utils.images import save_image

    gen_cfg, enc_cfg = _cfgs()
    gen = Generator(gen_cfg)
    gen_vars = jax.jit(gen.init)(jax.random.PRNGKey(0),
                                 jnp.zeros([1, gen_cfg.z_dim]))
    ds = generate_synthetic_dataset(gen, gen_vars, num_samples=10,
                                    batch_size=4, resolution=RES, seed=3)
    train_dir = tmp_path / "imgs" / "class_a"   # class-dir layout
    val_dir = tmp_path / "val" / "class_a"
    os.makedirs(train_dir), os.makedirs(val_dir)
    for i in range(8):
        save_image(ds[i][0], str(train_dir / f"t{i}.png"))
    for i in range(8, 10):
        save_image(ds[i][0], str(val_dir / f"v{i}.png"))

    out = str(tmp_path / "run_folder")
    state, history = train_hvae_encoder(
        output_dir=out, training_resolution=RES, batch_size=4, num_epochs=2,
        save_every=2, dataset_path=str(tmp_path / "imgs"),
        val_dataset_path=str(tmp_path / "val"),
        generator_cfg=gen_cfg, encoder_cfg=enc_cfg, use_lpips=False, seed=0,
        lr_decay=True,
    )
    assert len(history["loss"]) == 2
    assert np.isfinite(history["loss"]).all()
    assert "val_loss" in history and np.isfinite(history["val_loss"]).all()
    assert os.path.exists(os.path.join(out, "hvae_encoder_final.ic2t"))


def test_stage1_synthetic_val_split(tmp_path):
    """--val-samples: held-out synthetic validation reports val_* metrics
    from a DIFFERENT seed stream than training."""
    gen_cfg, enc_cfg = _cfgs()
    out = str(tmp_path / "run_val")
    _, history = train_hvae_encoder(
        output_dir=out, training_resolution=RES, batch_size=4, num_epochs=1,
        save_every=1, train_samples=8, val_samples=4, generator_cfg=gen_cfg,
        encoder_cfg=enc_cfg, use_lpips=False, seed=0,
        truncation_psi=[0.5, 1.0], pool_grids=(1, 2, 2),
    )
    assert "val_loss" in history and np.isfinite(history["val_loss"]).all()
    assert "val_rec_loss" in history


def test_best_val_model_selection(tmp_path):
    """With validation enabled, *_final.ic2t is the BEST-validation state
    (warm start included as a candidate): a destructive fine-tune (lr=10)
    must ship its starting point, not the damage."""
    gen_cfg, enc_cfg = _cfgs()
    out = str(tmp_path / "run_sel")
    _, history = train_hvae_encoder(
        output_dir=out, training_resolution=RES, batch_size=4, num_epochs=2,
        save_every=1, train_samples=8, val_samples=4, generator_cfg=gen_cfg,
        encoder_cfg=enc_cfg, use_lpips=False, seed=0, lr=10.0,
    )
    best = os.path.join(out, "hvae_encoder_best.ic2t")
    final = os.path.join(out, "hvae_encoder_final.ic2t")
    assert os.path.exists(best)
    # final carries the selected best PARAMS, but re-stamped meta (full
    # history + selected_epoch) so a resume-from-final never replays epochs
    best_raw, meta = load_checkpoint(best)
    final_raw, final_meta = load_checkpoint(final)
    chex.assert_trees_all_equal(best_raw["params"], final_raw["params"])
    assert final_meta["epoch"] == 1  # last trained epoch (0-based)
    assert final_meta["selected_epoch"] == -1
    assert len(final_meta["history"]["val_rec_loss"]) == 2
    # lr=10 destroys the encoder (even to NaN): the pre-training baseline
    # must win — NaN val epochs never displace a finite best
    assert meta["epoch"] == -1
    assert all(meta["val"] <= v for v in history["val_rec_loss"]
               if np.isfinite(v))
    # the running best is monotone non-increasing and recorded per epoch
    vb = history["val_best"]
    assert all(b2 <= b1 + 1e-9 for b1, b2 in zip(vb, vb[1:]))


def test_resume_across_lr_schedule_warm_starts(tmp_path):
    """Resuming a cosine-decay checkpoint into a constant-lr run (the r4
    real-photo demo's crash: cosine Adam carries a schedule step count the
    constant-lr optimizer tree lacks) must fall back to a params-only warm
    start instead of raising from flax.serialization."""
    gen_cfg, enc_cfg = _cfgs()
    out = str(tmp_path / "decay")
    state, _ = train_hvae_encoder(
        output_dir=out, training_resolution=RES, batch_size=4, num_epochs=1,
        save_every=1, train_samples=8, generator_cfg=gen_cfg,
        encoder_cfg=enc_cfg, use_lpips=False, seed=0, lr_decay=True,
    )
    out2 = str(tmp_path / "flat")
    state2, history2 = train_hvae_encoder(
        output_dir=out2, training_resolution=RES, batch_size=4, num_epochs=1,
        save_every=1, train_samples=8, generator_cfg=gen_cfg,
        encoder_cfg=enc_cfg, use_lpips=False, seed=0, lr_decay=False,
        resume_from=os.path.join(out, "hvae_encoder_final.ic2t"),
    )
    # warm start: trains its own epoch 0 (not a continuation) on the
    # checkpoint's params
    assert len(history2["loss"]) == 1
    assert np.isfinite(history2["loss"]).all()


def test_resume_falls_back_to_newest_epoch_checkpoint(tmp_path):
    """A missing *_final.ic2t resolves to the newest epoch_*.ic2t in the
    sibling checkpoints/ dir (round-3 post-mortem: a wedge at epoch 11
    zeroed out the whole downstream chain because resume hard-required the
    final file)."""
    from image_compression_2_tpu.train.trainer import resolve_resume_checkpoint

    run = tmp_path / "run"
    (run / "checkpoints").mkdir(parents=True)
    for e in (3, 10, 8):
        (run / "checkpoints" / f"epoch_{e}.ic2t").write_bytes(b"x")
    got = resolve_resume_checkpoint(str(run / "final.ic2t"))
    assert got == str(run / "checkpoints" / "epoch_10.ic2t")
    # an existing path resolves to itself; None passes through
    assert resolve_resume_checkpoint(got) == got
    assert resolve_resume_checkpoint(None) is None
    # no fallback available -> still a hard error
    with pytest.raises(FileNotFoundError):
        resolve_resume_checkpoint(str(tmp_path / "empty" / "final.ic2t"))


def test_missing_resume_checkpoint_is_a_hard_error(tmp_path):
    """A missing --resume file must raise, not silently train from scratch
    (a silent skip once produced a wrong-lineage stage-2 checkpoint after a
    host restart wiped the stage-1 file mid-chain)."""
    gen_cfg, enc_cfg = _cfgs()
    missing = str(tmp_path / "nope.ic2t")
    with pytest.raises(FileNotFoundError):
        train_hvae_encoder(
            output_dir=str(tmp_path / "o1"), training_resolution=RES,
            batch_size=4, num_epochs=1, train_samples=8,
            generator_cfg=gen_cfg, encoder_cfg=enc_cfg, use_lpips=False,
            seed=0, resume_from=missing,
        )
    with pytest.raises(FileNotFoundError):
        train_gumbel_hvae(
            output_dir=str(tmp_path / "o2"), training_resolution=RES,
            batch_size=4, num_epochs=1, train_samples=8,
            generator_cfg=gen_cfg, encoder_cfg=enc_cfg, use_lpips=False,
            seed=0, resume_from=missing,
        )
    # arch adoption path (encoder_cfg=None) raises before any model setup
    with pytest.raises(FileNotFoundError):
        train_hvae_encoder(
            output_dir=str(tmp_path / "o3"), training_resolution=RES,
            batch_size=4, num_epochs=1, train_samples=8,
            generator_cfg=gen_cfg, use_lpips=False, seed=0,
            resume_from=missing,
        )


def test_resume_keeps_incumbent_best(tmp_path):
    """Resuming into an output dir with an existing *_best.ic2t must NOT let
    the pre-training baseline eval clobber it (ADVICE r4 medium): the
    incumbent best seeds the selection and is only displaced by a strictly
    better validation."""
    gen_cfg, enc_cfg = _cfgs()
    out = str(tmp_path / "run")
    # run 1: destructive lr -> best == the pre-training baseline (epoch -1)
    train_hvae_encoder(
        output_dir=out, training_resolution=RES, batch_size=4, num_epochs=1,
        save_every=1, train_samples=8, val_samples=4, generator_cfg=gen_cfg,
        encoder_cfg=enc_cfg, use_lpips=False, seed=0, lr=10.0,
    )
    best = os.path.join(out, "hvae_encoder_best.ic2t")
    _, meta1 = load_checkpoint(best)
    # run 2: resume from the DAMAGED last state; its baseline eval is worse
    # (NaN) than the incumbent, so the best file must survive untouched
    train_hvae_encoder(
        output_dir=out, training_resolution=RES, batch_size=4, num_epochs=2,
        save_every=1, train_samples=8, val_samples=4, generator_cfg=gen_cfg,
        encoder_cfg=enc_cfg, use_lpips=False, seed=0, lr=10.0,
        resume_from=os.path.join(out, "checkpoints", "epoch_1.ic2t"),
    )
    _, meta2 = load_checkpoint(best)
    assert meta2["val"] == meta1["val"]
    assert meta2["epoch"] == meta1["epoch"]
    # and the promoted final carries the incumbent's params
    final_raw, final_meta = load_checkpoint(
        os.path.join(out, "hvae_encoder_final.ic2t"))
    assert final_meta["selected_epoch"] == meta1["epoch"]
