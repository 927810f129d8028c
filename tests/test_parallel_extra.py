"""Distributed helpers + generator numeric-stability snapshot."""

import numpy as np

import jax
import jax.numpy as jnp

from image_compression_2_tpu.parallel import (
    global_batch_slice,
    initialize_distributed,
)


def test_initialize_distributed_noop_single_process():
    # no coordinator configured -> must be a clean no-op
    initialize_distributed()
    assert jax.process_count() == 1
    assert global_batch_slice(16) == slice(0, 16)


def test_generator_numeric_snapshot():
    """Pin coarse output statistics of a fixed seed/config so silent numeric
    regressions in the ops/generator stack are caught (values recorded from
    the first green implementation; loose tolerance absorbs backend jitter)."""
    from image_compression_2_tpu.core import GeneratorConfig
    from image_compression_2_tpu.models import Generator

    cfg = GeneratorConfig.tiny(img_resolution=32)
    gen = Generator(cfg)
    variables = jax.jit(gen.init)(jax.random.PRNGKey(0),
                                  jnp.zeros([1, cfg.z_dim]))
    img = np.asarray(gen.apply(variables, jax.random.normal(
        jax.random.PRNGKey(123), [2, cfg.z_dim])))
    stats = np.array([img.mean(), img.std(), np.abs(img).max()])
    expected = _SNAPSHOT
    if expected is None:
        raise AssertionError(f"record snapshot: {stats.tolist()}")
    np.testing.assert_allclose(stats, expected, rtol=2e-3, atol=1e-4)


_SNAPSHOT = [0.026019379496574402, 0.12573374807834625, 0.42004141211509705]


def test_spatial_sharding_matches_single_device():
    """A 'space' mesh axis shards synthesis activations along H
    (parallel/sp.py): same numerics as the unsharded run, exercising the
    batch<=2 serving regime where the data axis starves."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from image_compression_2_tpu.core import GeneratorConfig
    from image_compression_2_tpu.models import Generator
    from image_compression_2_tpu.parallel import create_mesh, wants_sp

    cfg = GeneratorConfig.tiny(img_resolution=32)
    gen = Generator(cfg)
    ws = jax.random.normal(jax.random.PRNGKey(1), [1, cfg.num_ws, cfg.w_dim])
    variables = jax.jit(gen.init)(jax.random.PRNGKey(0),
                                  jnp.zeros([1, cfg.z_dim]))
    want = np.asarray(gen.apply(variables, ws, method="synthesis"))

    mesh = create_mesh(n_data=1, n_model=1, n_space=4)
    assert wants_sp(mesh) and not wants_sp(None)
    assert dict(mesh.shape) == {"data": 1, "model": 1, "space": 4}
    with mesh:
        fn = jax.jit(lambda v, ws: gen.apply(v, ws, method="synthesis"),
                     out_shardings=NamedSharding(mesh, P()))
        got = np.asarray(fn(variables, ws))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_stage1_step_flagship_structure_dp_tp(monkeypatch):
    """The dp x tp stage-1 step at the FLAGSHIP layer structure: full
    15-layer stylegan3-t schedule (num_layers=14 as at 1024², declining
    channel plateau) with tiny channel counts, on a 2x2 data x model mesh.
    Validates that the shape-generic tp rules hold across the real channel
    transitions, not just the uniform tiny-config ones."""
    import dataclasses

    from image_compression_2_tpu.core import EncoderConfig, GeneratorConfig
    from image_compression_2_tpu.parallel import create_mesh, shard_batch, tp
    from image_compression_2_tpu.train import build_stage1

    monkeypatch.setattr(tp, "MIN_SHARD_DIM", 16)
    monkeypatch.setattr(tp, "MIN_SHARD_ELEMS", 256)

    gen_cfg = GeneratorConfig(
        img_resolution=64, channel_base=256, channel_max=32,
        z_dim=64, w_dim=64, margin_size=2)
    # flagship structure: full depth + a 32-channel plateau declining into
    # the critically-sampled tail (the 1024 config's 512x7 -> 323 -> ... -> 3
    # shape at 1/16 the channel count)
    assert len(gen_cfg.layer_specs) == 15
    chans = [s.out_channels for s in gen_cfg.layer_specs]
    assert chans[0] == 32 and chans[-2] < 32 and chans[-1] == 3
    enc_cfg = EncoderConfig.tiny(
        img_resolution=64, w_dim=gen_cfg.w_dim, num_ws=gen_cfg.num_ws,
        block_split=(5, 12))

    mesh = create_mesh(n_data=4, n_model=2)
    setup = build_stage1(enc_cfg, gen_cfg, mesh=mesh, use_lpips=False)
    n_tp = sum(
        1 for leaf in jax.tree_util.tree_leaves(setup.state.params)
        if "model" in str(leaf.sharding.spec))
    assert n_tp > 0, "no parameter tp-sharded at flagship structure"
    x = np.random.RandomState(0).uniform(-1, 1, [8, 64, 64, 3]).astype(
        np.float32)
    with mesh:
        state, m = setup.train_step(
            setup.state, setup.gen_vars, None, setup.w_avg,
            shard_batch(x, mesh), jax.random.PRNGKey(0))
    assert int(state.step) == 1
    assert np.isfinite(float(m["loss"]))
