"""Encoder + uniform-quantization codec tests (the minimum end-to-end slice)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_compression_2_tpu.core import EncoderConfig, GeneratorConfig
from image_compression_2_tpu.models.encoder import HVAEEncoder, SimpleEncoder
from image_compression_2_tpu.codec import Compressor
from image_compression_2_tpu.quant import (
    dequantize_from_indices,
    quantize_to_indices,
    quantize_uniform,
)


@pytest.fixture(scope="module")
def tiny_codec():
    gen_cfg = GeneratorConfig.tiny(img_resolution=32)
    enc_cfg = EncoderConfig.tiny(
        img_resolution=32, w_dim=gen_cfg.w_dim, num_ws=gen_cfg.num_ws
    )
    return Compressor.create(enc_cfg, gen_cfg, seed=0)


def test_encoder_shapes_and_determinism():
    cfg = EncoderConfig.tiny(img_resolution=32)
    enc = HVAEEncoder(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), [2, 32, 32, 3])
    variables = enc.init(jax.random.PRNGKey(1), x)
    w, mean, logvar = enc.apply(variables, x)
    assert w.shape == (2, cfg.num_ws, cfg.w_dim)
    assert mean.shape == logvar.shape == w.shape
    # deterministic: w == mean when no sample key
    np.testing.assert_array_equal(np.asarray(w), np.asarray(mean))
    # stochastic differs and is reproducible per key
    w1, m1, _ = enc.apply(variables, x, jax.random.PRNGKey(7))
    w2, _, _ = enc.apply(variables, x, jax.random.PRNGKey(7))
    w3, _, _ = enc.apply(variables, x, jax.random.PRNGKey(8))
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))
    assert np.abs(np.asarray(w1) - np.asarray(w3)).max() > 0
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(mean))


def test_encoder_block_split_sizes():
    cfg = EncoderConfig.tiny(img_resolution=32)
    assert cfg.num_ws_global + cfg.num_ws_medium + cfg.num_ws_fine == cfg.num_ws
    # flagship split (5,12) of 16: 5/7/4 (SURVEY §2.1 M1)
    flag = EncoderConfig()
    assert (flag.num_ws_global, flag.num_ws_medium, flag.num_ws_fine) == (5, 7, 4)


def test_simple_encoder():
    enc = SimpleEncoder(w_dim=32, num_ws=8)
    x = jnp.zeros([2, 64, 64, 3])
    variables = enc.init(jax.random.PRNGKey(0), x)
    w = enc.apply(variables, x)
    assert w.shape == (2, 8, 32)


@pytest.mark.parametrize("bits", [4, 8, 10])
def test_uniform_quantizer(bits):
    w = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, [2, 8, 16]), jnp.float32)
    wq = quantize_uniform(w, bits)
    scale = 2 ** bits - 1
    # values land exactly on the grid
    grid = (np.asarray(wq) + 1) / 2 * scale
    np.testing.assert_allclose(grid, np.round(grid), atol=1e-4)
    # max quantization error is half a step
    assert np.abs(np.asarray(wq - w)).max() <= (1.0 / scale) + 1e-6
    # idempotent
    np.testing.assert_allclose(np.asarray(quantize_uniform(wq, bits)),
                               np.asarray(wq), atol=1e-7)
    # index path is the exact same grid
    idx = quantize_to_indices(w, bits)
    assert int(idx.min()) >= 0 and int(idx.max()) <= scale
    np.testing.assert_allclose(np.asarray(dequantize_from_indices(idx, bits)),
                               np.asarray(wq), atol=1e-6)


def test_codec_roundtrip_and_npz_container(tiny_codec, tmp_path):
    comp = tiny_codec
    x = jax.random.uniform(jax.random.PRNGKey(0), [1, 32, 32, 3], minval=-1,
                           maxval=1)

    img, w_plus = comp.forward(x)
    assert img.shape == x.shape
    assert w_plus.shape == (1, comp.generator_cfg.num_ws, comp.generator_cfg.w_dim)

    # compress → decompress
    wq = comp.compress(x, quantization_bits=8)
    out = comp.decompress(wq)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()

    # container format + published formulas (BASELINE.md analytic rows)
    f = str(tmp_path / "img.npz")
    orig, compsz, ratio = comp.save_compressed(x, f, quantization_bits=8)
    assert orig == 32 * 32 * 3 * 4
    nlat = comp.generator_cfg.num_ws * comp.generator_cfg.w_dim
    assert compsz == nlat * 1.0  # 8 bits = 1 byte per element
    assert ratio == orig / compsz
    data = np.load(f)
    assert set(data.keys()) == {"w", "resolution", "bits", "orig_size",
                                "comp_size", "compression_ratio"}
    assert tuple(data["resolution"]) == (32, 32)
    assert int(data["bits"]) == 8

    img2, ratio2 = comp.load_compressed(f)
    assert ratio2 == ratio
    # decompress(load(save(x))) == decompress(compress(x)) bit-for-bit
    np.testing.assert_array_equal(np.asarray(img2), np.asarray(out))


def test_flagship_ratio_formula(tiny_codec, tmp_path):
    """BASELINE.md: at 16x512 latents and 256² RGB input, ratio = 96 @ 8 bits."""
    # formula-only check (no 256² forward on CPU): emulate the arithmetic
    orig = 3 * 256 * 256 * 4
    comp8 = 16 * 512 * 8 / 8
    comp4 = 16 * 512 * 4 / 8
    assert orig / comp8 == 96.0
    assert orig / comp4 == 192.0


def test_codec_training_resolution_resize():
    gen_cfg = GeneratorConfig.tiny(img_resolution=32)
    enc_cfg = EncoderConfig.tiny(
        img_resolution=16, w_dim=gen_cfg.w_dim, num_ws=gen_cfg.num_ws
    )
    comp = Compressor.create(enc_cfg, gen_cfg, seed=0, training_resolution=16)
    x = jnp.zeros([1, 16, 16, 3])
    img, _ = comp.forward(x)
    # generator makes 32², forward resizes back to the input 16²
    assert img.shape == (1, 16, 16, 3)


def test_stochastic_encodes_differ(tiny_codec):
    """Two stochastic encodes without an explicit key must draw fresh
    posterior noise (round-1 silently reused PRNGKey(0) every call)."""
    x = jax.random.uniform(jax.random.PRNGKey(5), [1, 32, 32, 3],
                           minval=-1, maxval=1)
    w1 = np.asarray(tiny_codec.encode(x, deterministic=False))
    w2 = np.asarray(tiny_codec.encode(x, deterministic=False))
    assert not np.array_equal(w1, w2)
    c1 = np.asarray(tiny_codec.compress(x, 8, deterministic=False))
    c2 = np.asarray(tiny_codec.compress(x, 8, deterministic=False))
    assert not np.array_equal(c1, c2)
    # explicit keys stay reproducible
    k = jax.random.PRNGKey(9)
    np.testing.assert_array_equal(
        np.asarray(tiny_codec.encode(x, deterministic=False, sample_key=k)),
        np.asarray(tiny_codec.encode(x, deterministic=False, sample_key=k)),
    )


def test_fused_roundtrip_matches_two_step(tiny_codec):
    x = jax.random.uniform(jax.random.PRNGKey(7), [2, 32, 32, 3],
                           minval=-1, maxval=1)
    two_step = tiny_codec.decompress(tiny_codec.compress(x, 8))
    fused = tiny_codec.roundtrip(x, 8)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(two_step),
                               rtol=1e-5, atol=1e-5)


def test_spatial_projector_heads():
    """pool_grids > 1 (round-3 spatially-aware heads) — shapes, gradient
    flow, and strictly more projector parameters than global pooling."""
    cfg1 = EncoderConfig.tiny(img_resolution=32)
    cfgG = EncoderConfig.tiny(img_resolution=32, pool_grids=(1, 2, 4),
                              hidden_dims=(32, 32, 64))
    x = jax.random.normal(jax.random.PRNGKey(0), [2, 32, 32, 3])
    v1 = HVAEEncoder(cfg1).init(jax.random.PRNGKey(1), x)
    vG = HVAEEncoder(cfgG).init(jax.random.PRNGKey(1), x)
    w, m, lv = HVAEEncoder(cfgG).apply(vG, x)
    assert w.shape == (2, cfgG.num_ws, cfgG.w_dim)
    n1 = sum(p.size for p in jax.tree.leaves(v1))
    nG = sum(p.size for p in jax.tree.leaves(vG))
    assert nG > n1  # the grid heads see g*g*C features, not C

    # fine head fc1 input = g*g*C of the tap it reads
    fine_fc1 = vG["params"]["fine_projector"]["fc1"]["kernel"]
    assert fine_fc1.shape[1] == 64  # hidden_dims[2]

    def loss(params):
        w, _, _ = HVAEEncoder(cfgG).apply({"params": params}, x)
        return jnp.sum(w ** 2)

    g = jax.grad(loss)(vG["params"])
    gnorm = sum(float(jnp.sum(jnp.abs(p))) for p in jax.tree.leaves(g))
    assert np.isfinite(gnorm) and gnorm > 0


def test_default_pool_grids_unchanged():
    """pool_grids=(1,1,1) must reproduce the round-2 parameter structure
    (checkpoint compatibility for existing trained encoders)."""
    cfg = EncoderConfig.tiny(img_resolution=32)
    assert cfg.pool_grids == (1, 1, 1)
    assert cfg.resolved_hidden_dims == (cfg.hidden_dim,) * 3
    x = jnp.zeros([1, 32, 32, 3])
    v = HVAEEncoder(cfg).init(jax.random.PRNGKey(0), x)
    fc1 = v["params"]["global_projector"]["fc1"]["kernel"]
    assert fc1.shape[1] == cfg.hidden_dim


def test_mesh_compressor_matches_single_device(monkeypatch):
    """A Compressor built over a data x model mesh (params channel-sharded
    over 'model', batches auto-sharded over 'data' via _place) must
    reproduce the single-device roundtrip bit-for-bit-ish (fp32 reduction
    order only)."""
    from image_compression_2_tpu.parallel import create_mesh
    from image_compression_2_tpu.parallel import tp

    monkeypatch.setattr(tp, "MIN_SHARD_DIM", 16)
    monkeypatch.setattr(tp, "MIN_SHARD_ELEMS", 256)

    gen_cfg = GeneratorConfig.tiny(img_resolution=32)
    enc_cfg = EncoderConfig.tiny(
        img_resolution=32, w_dim=gen_cfg.w_dim, num_ws=gen_cfg.num_ws
    )
    ref = Compressor.create(enc_cfg, gen_cfg, seed=0)
    mesh = create_mesh(n_data=4, n_model=2)
    dist = Compressor(enc_cfg, gen_cfg, ref.encoder_vars, ref.generator_vars,
                      mesh=mesh)
    n_tp = sum(
        1 for leaf in jax.tree_util.tree_leaves(dist.generator_vars)
        if "model" in str(leaf.sharding.spec)
    )
    assert n_tp > 0, "no generator tensor was tp-sharded"

    x = jax.random.uniform(jax.random.PRNGKey(3), [4, 32, 32, 3],
                           minval=-1, maxval=1)
    w_ref = ref.compress(x, quantization_bits=8)
    with mesh:
        w_dist = dist.compress(np.asarray(x), quantization_bits=8)
        img_dist = dist.decompress(w_dist)
    img_ref = ref.decompress(w_ref)
    np.testing.assert_allclose(np.asarray(w_dist), np.asarray(w_ref),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(img_dist), np.asarray(img_ref),
                               atol=5e-4)
