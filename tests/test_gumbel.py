"""Gumbel discretization + discrete codec + stage-2 training tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_compression_2_tpu.core import EncoderConfig, GeneratorConfig
from image_compression_2_tpu.codec.gumbel_compressor import GumbelCompressor
from image_compression_2_tpu.quant.gumbel import (
    GumbelSoftmaxDiscretization,
    anneal_log_temperature,
    lookup_codebook,
    usage_histogram,
)
from image_compression_2_tpu.train import LossWeights
from image_compression_2_tpu.train.stage2 import (
    apply_temperature_anneal,
    build_stage2,
)

RES = 16


def _cfgs():
    gen_cfg = GeneratorConfig.tiny(img_resolution=RES, num_layers=4,
                                   margin_size=1)
    enc_cfg = EncoderConfig.tiny(
        img_resolution=RES, w_dim=gen_cfg.w_dim, num_ws=gen_cfg.num_ws,
        block_split=(2, 4),
    )
    return enc_cfg, gen_cfg


def test_hard_path_is_nearest_codebook():
    disc = GumbelSoftmaxDiscretization(n_embeddings=16)
    z = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, [2, 4, 8]),
                    jnp.float32)
    variables = disc.init(jax.random.PRNGKey(0), z)
    w_disc, perplexity, idx = disc.apply(variables, z, hard=True, key=None)
    codebook = np.linspace(-1, 1, 16)
    # deterministic hard path = nearest codebook entry
    want_idx = np.argmin(np.abs(np.asarray(z)[..., None] - codebook), axis=-1)
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    np.testing.assert_allclose(np.asarray(w_disc), codebook[want_idx], atol=1e-6)
    # perplexity within [1, n_embeddings]
    assert 1.0 <= float(perplexity) <= 16.0
    # max discretization error is half a codebook step
    assert np.abs(np.asarray(w_disc) - np.asarray(z)).max() <= 2 / 15 / 2 + 1e-6


def test_soft_path_differentiable_and_noisy():
    disc = GumbelSoftmaxDiscretization(n_embeddings=16)
    z = jnp.asarray(np.random.RandomState(1).uniform(-1, 1, [1, 2, 4]),
                    jnp.float32)
    variables = disc.init(jax.random.PRNGKey(0), z)

    def loss(z):
        d, _, _ = disc.apply(variables, z, hard=False,
                             key=jax.random.PRNGKey(3))
        return jnp.sum(jnp.square(d))

    g = jax.grad(loss)(z)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0
    # different gumbel keys give different soft assignments
    d1, _, _ = disc.apply(variables, z, hard=False, key=jax.random.PRNGKey(1))
    d2, _, _ = disc.apply(variables, z, hard=False, key=jax.random.PRNGKey(2))
    assert np.abs(np.asarray(d1) - np.asarray(d2)).max() > 0
    # straight-through hard forward sits on the codebook even with noise
    dh, _, _ = disc.apply(variables, z, hard=True, key=jax.random.PRNGKey(1))
    codebook = np.linspace(-1, 1, 16)
    dists = np.abs(np.asarray(dh)[..., None] - codebook).min(axis=-1)
    np.testing.assert_allclose(dists, 0, atol=1e-6)


def test_logit_scale_fixes_degenerate_relaxation():
    """The default logit scale (distances in codebook-spacing units) carries
    real straight-through gradients; logit_scale=1.0 reproduces the
    reference's raw-distance logits (gumbel_softmax_compression.py:100),
    whose softmax over the codebook is near-uniform (perplexity ≈ n) and
    whose Gumbel-sampled hard codes are nearly independent of z (the noise
    swamps logit gaps of 2/(n-1))."""
    n = 256
    spacing = 2.0 / (n - 1)
    # a single element: the returned (batch-usage) perplexity then measures
    # the sharpness of one soft assignment
    z1 = jnp.asarray([[[0.1]]], jnp.float32)
    # and a batch for the sampling-locality check
    zb = jnp.asarray(np.random.RandomState(0).uniform(-0.9, 0.9, [1, 8, 64]),
                     jnp.float32)

    def probe(disc):
        variables = disc.init(jax.random.PRNGKey(0), z1)
        _, perp, _ = disc.apply(variables, z1, hard=False, key=None)
        d, _, _ = disc.apply(variables, zb, hard=True,
                             key=jax.random.PRNGKey(7))
        return float(perp), float(jnp.abs(d - zb).max())

    p_fixed, err_fixed = probe(GumbelSoftmaxDiscretization(n_embeddings=n))
    p_ref, err_ref = probe(
        GumbelSoftmaxDiscretization(n_embeddings=n, logit_scale=1.0))
    assert p_ref > 0.9 * n           # reference scale: uniform blob
    assert p_fixed < 0.25 * n        # fixed scale: concentrated assignments
    # fixed scale: noisy hard samples stay local (dithering between a few
    # neighbouring codes); reference scale: sampling is essentially random
    # over the codebook
    assert err_fixed < 8 * spacing
    assert err_ref > 0.3


def test_perplexity_loss_normalized():
    from image_compression_2_tpu.train.losses import perplexity_loss

    # bounded in [0, 1]; zero at full usage
    assert float(perplexity_loss(jnp.asarray(256.0), 256)) == 0.0
    v = float(perplexity_loss(jnp.asarray(64.0), 256))
    assert 0.0 < v <= 1.0
    np.testing.assert_allclose(v, (1 - 64 / 256) ** 2, atol=1e-6)


def test_anneal_schedule():
    lt = jnp.asarray([np.log(1.0)])
    lt2 = anneal_log_temperature(lt, anneal_rate=0.1, min_temp=0.5)
    np.testing.assert_allclose(float(lt2[0]), -0.1, atol=1e-6)
    # clamps at min temperature before subtracting
    lt3 = anneal_log_temperature(jnp.asarray([np.log(0.01)]), 0.1, 0.5)
    np.testing.assert_allclose(float(lt3[0]), np.log(0.5) - 0.1, atol=1e-6)


def test_usage_histogram():
    idx = jnp.asarray([[0, 1, 1, 3]])
    h = usage_histogram(idx, 4)
    np.testing.assert_array_equal(np.asarray(h), [1, 2, 0, 1])
    np.testing.assert_allclose(
        np.asarray(lookup_codebook(jnp.asarray([0, 3]), 4)), [-1.0, 1.0])


def test_gumbel_codec_roundtrip_and_container(tmp_path):
    enc_cfg, gen_cfg = _cfgs()
    comp = GumbelCompressor.create(enc_cfg, gen_cfg, seed=0, n_embeddings=64)
    x = jax.random.uniform(jax.random.PRNGKey(0), [2, RES, RES, 3],
                           minval=-1, maxval=1)
    img, w_plus, w_disc, perp = comp.forward(x)
    assert img.shape == x.shape
    codes = comp.compress(x)
    assert codes.shape == (2, gen_cfg.num_ws, gen_cfg.w_dim)
    assert codes.dtype == jnp.int32
    out = comp.decompress(codes)
    assert out.shape == (2, RES, RES, 3)

    f = str(tmp_path / "g.npz")
    orig, compsz, ratio = comp.save_compressed(x, f)
    assert orig == 2 * RES * RES * 3 * 4
    assert compsz == codes.size * np.log2(64) / 8
    data = np.load(f)
    assert set(data.keys()) == {"codes", "n_embeddings", "resolution",
                                "orig_size", "comp_size", "compression_ratio"}
    img2, ratio2 = comp.load_compressed(f)
    np.testing.assert_array_equal(np.asarray(img2), np.asarray(out))
    assert ratio2 == ratio
    # usage statistics accumulated on compress
    usage = comp.get_code_usage()
    np.testing.assert_allclose(usage.sum(), 1.0)


def test_stage2_training_step():
    enc_cfg, gen_cfg = _cfgs()
    setup = build_stage2(enc_cfg, gen_cfg, n_embeddings=32, use_lpips=False,
                         lr=3e-3,
                         weights=LossWeights(rec=1.0, perceptual=0.0,
                                             kl=0.0, gumbel=0.001))
    x = jax.random.uniform(jax.random.PRNGKey(0), [4, RES, RES, 3],
                           minval=-1, maxval=1)
    state = setup.state
    losses = []
    for _ in range(5):
        state, m = setup.train_step(
            state, setup.gen_vars, None, setup.w_avg, x, jax.random.PRNGKey(1)
        )
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert "perplexity" in m and np.isfinite(float(m["perplexity"]))
    # both encoder and discretization params updated
    lt0 = float(
        setup.state.params["discretization"]["log_temperature"][0])
    lt1 = float(state.params["discretization"]["log_temperature"][0])
    assert lt0 != lt1
    # temperature anneal moves log_temperature down
    state2 = apply_temperature_anneal(state, anneal_rate=0.1)
    assert float(state2.params["discretization"]["log_temperature"][0]) < lt1


def test_stage2_resume_from_stage1_encoder():
    """Stage-1 encoder params drop into stage-2 (the reference KeyErrors here)."""
    from image_compression_2_tpu.train import build_stage1

    enc_cfg, gen_cfg = _cfgs()
    s1 = build_stage1(enc_cfg, gen_cfg, use_lpips=False)
    s2 = build_stage2(enc_cfg, gen_cfg, gen_vars=s1.gen_vars,
                      encoder_params=s1.state.params, n_embeddings=32,
                      use_lpips=False)
    for a, b in zip(jax.tree_util.tree_leaves(s1.state.params),
                    jax.tree_util.tree_leaves(s2.state.params["encoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_stage2_data_parallel_step():
    """Stage-2 joint (encoder+discretization) training over the 8-device mesh."""
    from image_compression_2_tpu.parallel import create_mesh, shard_batch

    enc_cfg, gen_cfg = _cfgs()
    mesh = create_mesh(n_data=8)
    setup = build_stage2(enc_cfg, gen_cfg, n_embeddings=16, use_lpips=False,
                         mesh=mesh, seed=0)
    x = np.random.RandomState(0).uniform(-1, 1, [8, RES, RES, 3]).astype(
        np.float32)
    with mesh:
        state, m = setup.train_step(
            setup.state, setup.gen_vars, None, setup.w_avg,
            shard_batch(x, mesh), jax.random.PRNGKey(1),
        )
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 1
    # both parameter groups updated across the mesh
    lt0 = float(setup.state.params["discretization"]["log_temperature"][0])
    lt1 = float(state.params["discretization"]["log_temperature"][0])
    assert lt0 != lt1


def test_stage2_tensor_parallel_step(monkeypatch):
    """Stage-2 joint training over a 4x2 data x model mesh: params shard
    channel-wise over 'model' and the step still trains both groups."""
    from image_compression_2_tpu.parallel import create_mesh, shard_batch, tp

    monkeypatch.setattr(tp, "MIN_SHARD_DIM", 16)
    monkeypatch.setattr(tp, "MIN_SHARD_ELEMS", 256)

    enc_cfg, gen_cfg = _cfgs()
    mesh = create_mesh(n_data=4, n_model=2)
    setup = build_stage2(enc_cfg, gen_cfg, n_embeddings=16, use_lpips=False,
                         mesh=mesh, seed=0)
    n_tp = sum(
        1 for leaf in jax.tree_util.tree_leaves(setup.state.params)
        if "model" in str(leaf.sharding.spec)
    )
    assert n_tp > 0, "no stage-2 parameter was tp-sharded"
    x = np.random.RandomState(0).uniform(-1, 1, [8, RES, RES, 3]).astype(
        np.float32)
    with mesh:
        state, m = setup.train_step(
            setup.state, setup.gen_vars, None, setup.w_avg,
            shard_batch(x, mesh), jax.random.PRNGKey(1),
        )
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 1
