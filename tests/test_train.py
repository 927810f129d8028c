"""Stage-1 training tests: single-device step, 8-device DP step, checkpointing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_compression_2_tpu.core import EncoderConfig, GeneratorConfig
from image_compression_2_tpu.parallel import create_mesh, shard_batch
from image_compression_2_tpu.train import (
    LossWeights,
    build_stage1,
    load_checkpoint,
    save_checkpoint,
)

RES = 16


def _configs():
    gen_cfg = GeneratorConfig.tiny(img_resolution=RES, num_layers=4,
                                   margin_size=1)
    enc_cfg = EncoderConfig.tiny(
        img_resolution=RES, w_dim=gen_cfg.w_dim, num_ws=gen_cfg.num_ws,
        block_split=(2, 4),
    )
    return enc_cfg, gen_cfg


def test_train_step_decreases_loss():
    enc_cfg, gen_cfg = _configs()
    setup = build_stage1(enc_cfg, gen_cfg, lr=3e-3, use_lpips=False,
                         weights=LossWeights(rec=1.0, perceptual=0.0, kl=0.0))
    x = jax.random.uniform(jax.random.PRNGKey(0), [4, RES, RES, 3],
                           minval=-1, maxval=1)
    key = jax.random.PRNGKey(1)
    state = setup.state
    losses = []
    for _ in range(8):
        state, metrics = setup.train_step(
            state, setup.gen_vars, setup.lpips_vars, setup.w_avg, x, key
        )
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 8
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_train_step_bf16_generator_path():
    """Training THROUGH bf16 synthesis layers must produce finite fp32 grads
    (regression: preferred_element_type=fp32 on a bf16 conv broke the
    transpose conv with mixed dtypes)."""
    import jax.numpy as jnp
    from image_compression_2_tpu.core import Precision

    enc_cfg, gen_cfg = _configs()
    setup = build_stage1(enc_cfg, gen_cfg, use_lpips=False,
                         precision=Precision(compute_dtype=jnp.bfloat16))
    x = jax.random.uniform(jax.random.PRNGKey(0), [2, RES, RES, 3],
                           minval=-1, maxval=1)
    state, metrics = setup.train_step(
        setup.state, setup.gen_vars, None, setup.w_avg, x,
        jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(metrics["loss"]))
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32


def test_train_step_with_lpips_runs():
    enc_cfg, gen_cfg = _configs()
    setup = build_stage1(enc_cfg, gen_cfg, use_lpips=True)
    x = jnp.zeros([2, RES, RES, 3])
    state, metrics = setup.train_step(
        setup.state, setup.gen_vars, setup.lpips_vars, setup.w_avg, x,
        jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(metrics["perceptual_loss"]))
    assert set(metrics) == {"loss", "rec_loss", "perceptual_loss", "kl_loss"}


def test_data_parallel_step_matches_single_device():
    """DP over the 8-device CPU mesh must agree with single-device training."""
    enc_cfg, gen_cfg = _configs()
    mesh = create_mesh(n_data=8)
    setup_dp = build_stage1(enc_cfg, gen_cfg, use_lpips=False, mesh=mesh,
                            seed=3)
    setup_1d = build_stage1(enc_cfg, gen_cfg, use_lpips=False, seed=3)

    x = jax.random.uniform(jax.random.PRNGKey(5), [8, RES, RES, 3],
                           minval=-1, maxval=1)
    key = jax.random.PRNGKey(6)
    with mesh:
        state_dp, m_dp = setup_dp.train_step(
            setup_dp.state, setup_dp.gen_vars, None, setup_dp.w_avg,
            shard_batch(np.asarray(x), mesh), key,
        )
    state_1d, m_1d = setup_1d.train_step(
        setup_1d.state, setup_1d.gen_vars, None, setup_1d.w_avg, x, key
    )
    np.testing.assert_allclose(float(m_dp["loss"]), float(m_1d["loss"]),
                               rtol=1e-5)
    # parameters after the step agree (gradient all-reduce == full-batch grad)
    flat_dp = jax.tree_util.tree_leaves(state_dp.params)
    flat_1d = jax.tree_util.tree_leaves(state_1d.params)
    # tolerance: fp32 reduction-order differences get amplified by Adam's
    # rsqrt at step 1 (measured max ≈ 2.8e-5 for lr=1e-4 updates)
    for a, b in zip(flat_dp, flat_1d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=6e-5)


def test_tensor_parallel_step_matches_single_device(monkeypatch):
    """dp×tp over a 4×2 CPU mesh must agree with single-device training
    (the tp shardings change only tensor placement, not math; XLA inserts
    the channel-contraction collectives)."""
    from image_compression_2_tpu.parallel import tp

    # tiny-config channels (32) sit below the production sharding floor
    monkeypatch.setattr(tp, "MIN_SHARD_DIM", 16)
    monkeypatch.setattr(tp, "MIN_SHARD_ELEMS", 256)

    enc_cfg, gen_cfg = _configs()
    mesh = create_mesh(n_data=4, n_model=2)
    setup_tp = build_stage1(enc_cfg, gen_cfg, use_lpips=False, mesh=mesh,
                            seed=3)
    setup_1d = build_stage1(enc_cfg, gen_cfg, use_lpips=False, seed=3)

    n_tp = sum(
        1 for leaf in jax.tree_util.tree_leaves(setup_tp.state.params)
        if "model" in str(leaf.sharding.spec)
    )
    assert n_tp > 0, "no parameter was tp-sharded"

    x = jax.random.uniform(jax.random.PRNGKey(5), [8, RES, RES, 3],
                           minval=-1, maxval=1)
    key = jax.random.PRNGKey(6)
    with mesh:
        state_tp, m_tp = setup_tp.train_step(
            setup_tp.state, setup_tp.gen_vars, None, setup_tp.w_avg,
            shard_batch(np.asarray(x), mesh), key,
        )
    state_1d, m_1d = setup_1d.train_step(
        setup_1d.state, setup_1d.gen_vars, None, setup_1d.w_avg, x, key
    )
    np.testing.assert_allclose(float(m_tp["loss"]), float(m_1d["loss"]),
                               rtol=1e-5)
    flat_tp = jax.tree_util.tree_leaves(state_tp.params)
    flat_1d = jax.tree_util.tree_leaves(state_1d.params)
    for a, b in zip(flat_tp, flat_1d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=6e-5)


def test_checkpoint_roundtrip(tmp_path):
    enc_cfg, gen_cfg = _configs()
    setup = build_stage1(enc_cfg, gen_cfg, use_lpips=False)
    x = jnp.zeros([2, RES, RES, 3])
    state, _ = setup.train_step(
        setup.state, setup.gen_vars, None, setup.w_avg, x, jax.random.PRNGKey(0)
    )
    path = str(tmp_path / "ckpt.ic2t")
    save_checkpoint(path, state, meta={"epoch": 3, "history": {"loss": [1.0]}})
    restored, meta = load_checkpoint(path, target=state)
    assert meta["epoch"] == 3
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resume: one more step from the restored state runs
    state2, _ = setup.train_step(
        restored, setup.gen_vars, None, setup.w_avg, x, jax.random.PRNGKey(1)
    )
    assert int(state2.step) == int(state.step) + 1


def test_graft_entry_dryrun():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_remat_training_matches_plain():
    """jax.checkpoint on the frozen towers must not change the math."""
    enc_cfg, gen_cfg = _configs()
    x = jax.random.uniform(jax.random.PRNGKey(0), [2, RES, RES, 3],
                           minval=-1, maxval=1)
    key = jax.random.PRNGKey(1)
    s_plain = build_stage1(enc_cfg, gen_cfg, use_lpips=True, seed=3)
    s_remat = build_stage1(enc_cfg, gen_cfg, use_lpips=True, seed=3,
                           remat=True)
    st_p, m_p = s_plain.train_step(s_plain.state, s_plain.gen_vars,
                                   s_plain.lpips_vars, s_plain.w_avg, x, key)
    st_r, m_r = s_remat.train_step(s_remat.state, s_remat.gen_vars,
                                   s_remat.lpips_vars, s_remat.w_avg, x, key)
    np.testing.assert_allclose(float(m_p["loss"]), float(m_r["loss"]),
                               rtol=1e-6)
    # recompute-order fp noise amplified by Adam's rsqrt at step 1, same
    # magnitude as the DP-vs-single-device test (measured ~2.6e-5)
    for a, b in zip(jax.tree_util.tree_leaves(st_p.params),
                    jax.tree_util.tree_leaves(st_r.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=6e-5)


def test_generator_key_consistent_across_stages_and_bundle(tmp_path):
    """With one seed, stage 1, stage 2, and codec_from_training must all
    reconstruct the SAME frozen random-init generator — otherwise a stage-2
    warm start (or a checkpoint-built codec) silently pairs the encoder with
    a different generator than it was trained against."""
    import numpy as np

    from image_compression_2_tpu.codec.bundle import codec_from_training
    from image_compression_2_tpu.core import EncoderConfig, GeneratorConfig
    from image_compression_2_tpu.train.checkpoint import save_checkpoint
    from image_compression_2_tpu.train.stage1 import build_stage1
    from image_compression_2_tpu.train.stage2 import build_stage2

    gen_cfg = GeneratorConfig.tiny(img_resolution=16, num_layers=4,
                                   margin_size=1)
    enc_cfg = EncoderConfig.tiny(img_resolution=16, w_dim=gen_cfg.w_dim,
                                 num_ws=gen_cfg.num_ws, block_split=(2, 4))
    s1 = build_stage1(enc_cfg, gen_cfg, seed=7, use_lpips=False)
    s2 = build_stage2(enc_cfg, gen_cfg, seed=7, use_lpips=False)
    l1 = jax.tree_util.tree_leaves(s1.gen_vars)
    l2 = jax.tree_util.tree_leaves(s2.gen_vars)
    assert len(l1) == len(l2)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    ckpt = str(tmp_path / "s1.ic2t")
    save_checkpoint(ckpt, s1.state, meta={
        "epoch": 0,
        "config": {"max_resolution": 16, "w_dim": gen_cfg.w_dim,
                   "num_ws": gen_cfg.num_ws,
                   "block_split": list(enc_cfg.block_split)}})
    codec = codec_from_training(ckpt, generator_cfg=gen_cfg, seed=7)
    for a, b in zip(l1, jax.tree_util.tree_leaves(codec.generator_vars)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stage1_w_supervision():
    """w_l2 > 0 + (image, w_true) batches: the loss gains the latent term and
    a few steps pull the posterior means toward the known latents."""
    from image_compression_2_tpu.train.losses import LossWeights
    from image_compression_2_tpu.train.stage1 import build_stage1

    gen_cfg = GeneratorConfig.tiny(img_resolution=16, num_layers=4,
                                   margin_size=1)
    enc_cfg = EncoderConfig.tiny(img_resolution=16, w_dim=gen_cfg.w_dim,
                                 num_ws=gen_cfg.num_ws, block_split=(2, 4))
    setup = build_stage1(enc_cfg, gen_cfg, seed=3, use_lpips=False,
                         weights=LossWeights(w_l2=1.0), lr=1e-3)
    x = jax.random.uniform(jax.random.PRNGKey(0), [4, 16, 16, 3],
                           minval=-1, maxval=1)
    w_true = jax.random.normal(jax.random.PRNGKey(1),
                               [4, gen_cfg.num_ws, gen_cfg.w_dim])
    state = setup.state
    first = None
    for i in range(8):
        state, metrics = setup.train_step(
            state, setup.gen_vars, setup.lpips_vars, setup.w_avg,
            (x, w_true), jax.random.PRNGKey(i))
        assert "w_l2_loss" in metrics
        if first is None:
            first = float(metrics["w_l2_loss"])
    assert float(metrics["w_l2_loss"]) < first
    # plain image batches still work (no latent term)
    _, m2 = setup.train_step(state, setup.gen_vars, setup.lpips_vars,
                             setup.w_avg, x, jax.random.PRNGKey(99))
    assert "w_l2_loss" not in m2
