"""CABAC over uniform-quantized stage-1 latents (UniformCABACCompressor):
bit-exact index roundtrip, identical distortion to the plain uniform codec,
priors/container plumbing, and the cross-latent-codec guard."""

import numpy as np
import pytest

import jax

from image_compression_2_tpu.codec import Compressor, UniformCABACCompressor
from image_compression_2_tpu.core import EncoderConfig, GeneratorConfig
from image_compression_2_tpu.quant.uniform import quantize_uniform

RES = 16


def _codec(bits=8, seed=0):
    gen_cfg = GeneratorConfig.tiny(img_resolution=RES, num_layers=4,
                                   margin_size=1)
    enc_cfg = EncoderConfig.tiny(img_resolution=RES, w_dim=gen_cfg.w_dim,
                                 num_ws=gen_cfg.num_ws, block_split=(2, 4))
    return UniformCABACCompressor.create(enc_cfg, gen_cfg, seed=seed,
                                         quantization_bits=bits)


def _images(n=2, seed=0):
    return jax.random.uniform(jax.random.PRNGKey(seed), [n, RES, RES, 3],
                              minval=-1, maxval=1)


def test_roundtrip_matches_plain_uniform_codec():
    comp = _codec(bits=8)
    x = _images(2)
    payload, meta = comp.compress_entropy(x, use_cabac=True)
    img = comp.decompress_entropy(payload, meta)
    assert img.shape == (2, RES, RES, 3)
    assert meta["latents"] == "uniform-8bit"
    assert meta["n_embeddings"] == 256

    # identical distortion to the plain uniform codec at the same bits:
    # the decoded indices reconstruct the SAME dequantized grid values
    plain = Compressor(comp.encoder_cfg, comp.generator_cfg,
                       comp.encoder_vars, comp.generator_vars)
    w_q = plain.compress(x, quantization_bits=8)
    np.testing.assert_allclose(np.asarray(img),
                               np.asarray(plain.decompress(w_q)),
                               rtol=0, atol=1e-6)

    # rate: never worse than raw fixed-width indices (fallback guarantees it)
    assert meta["comp_size"] <= meta["orig_size"]


def test_priors_strictly_improve_rate_and_roundtrip():
    comp = _codec(bits=8)
    x_calib = _images(8, seed=1)
    x = _images(2, seed=2)
    _, meta_plain = comp.compress_entropy(x, use_cabac=True, use_priors=False)
    comp.calibrate(x_calib)
    payload, meta = comp.compress_entropy(x, use_cabac=True, use_priors=True)
    if meta["use_cabac"] and meta["use_priors"]:
        # trained per-position priors should not hurt; on a trained encoder
        # they carry most of the gain (see RD_TABLE.md)
        assert meta["comp_size"] <= meta_plain["comp_size"]
    img = comp.decompress_entropy(payload, meta)
    assert np.isfinite(np.asarray(img)).all()

    # wrong prior table is detected, not silently garbage-decoded
    if meta.get("priors_crc32") is not None:
        comp.priors = np.ascontiguousarray(comp.priors + 1, np.uint16)
        with pytest.raises(ValueError, match="prior table"):
            comp.decompress_entropy(payload, meta)


def test_container_roundtrip_and_embedded_priors(tmp_path):
    comp = _codec(bits=6)
    comp.calibrate(_images(8, seed=3))
    x = _images(1, seed=4)
    f = str(tmp_path / "img.cabac")
    o, c, r = comp.save_compressed(x, f, embed_priors=True)
    ref = np.asarray(comp.decompress_entropy(*comp.compress_entropy(x)))

    # a FRESH codec (same weights, no priors loaded) decodes the
    # self-contained container
    fresh = _codec(bits=6)
    img, ratio = fresh.load_compressed(f)
    assert ratio == r
    np.testing.assert_array_equal(np.asarray(img), ref)


def test_cross_latent_codec_guard():
    from image_compression_2_tpu.codec.cabac_compressor import CABACCompressor

    gen_cfg = GeneratorConfig.tiny(img_resolution=RES, num_layers=4,
                                   margin_size=1)
    enc_cfg = EncoderConfig.tiny(img_resolution=RES, w_dim=gen_cfg.w_dim,
                                 num_ws=gen_cfg.num_ws, block_split=(2, 4))
    gumbel = CABACCompressor.create(enc_cfg, gen_cfg, seed=0,
                                    n_embeddings=256)
    x = _images(1)
    payload, meta = gumbel.compress_entropy(x, use_cabac=True)

    uni = _codec(bits=8)
    with pytest.raises(ValueError, match="gumbel"):
        uni.decompress_entropy(payload, meta)


def test_refined_codes_change_rate_not_contract():
    comp = _codec(bits=8)
    x = _images(1, seed=5)
    payload, meta = comp.compress_entropy(x, refine_steps=2)
    img = comp.decompress_entropy(payload, meta)
    assert img.shape == (1, RES, RES, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_bits_validation():
    with pytest.raises(ValueError, match="quantization_bits"):
        _codec(bits=0)
    with pytest.raises(ValueError, match="quantization_bits"):
        _codec(bits=17)


def test_affine_index_roundtrip_exact():
    """Affine indices reconstruct within half a grid step, INCLUDING latents
    far outside [-1, 1] (the refined-latent regime the fixed grid clamps)."""
    from image_compression_2_tpu.quant.uniform import (
        dequantize_from_indices_affine,
        latent_range,
        quantize_to_indices_affine,
    )

    rng = np.random.default_rng(0)
    w = rng.normal(0.0, 2.0, (2, 4, 16)).astype(np.float32)
    assert np.abs(w).max() > 1.5  # the regime under test
    lo, hi = latent_range(w)
    for bits in (8, [4, 8, 6, 10]):
        idx = np.asarray(quantize_to_indices_affine(w, bits, lo, hi))
        scales = np.asarray(
            [(1 << (bits if isinstance(bits, int) else bits[t])) - 1
             for t in range(4)], np.float32)
        assert idx.min() >= 0
        assert (idx.max(axis=(0, 2)) <= scales).all()
        back = np.asarray(dequantize_from_indices_affine(idx, bits, lo, hi))
        half_step = (hi - lo)[:, :, None] / scales[None, :, None] / 2
        assert (np.abs(back - w) <= half_step + 1e-5).all()


def test_refined_latents_survive_entropy_coding():
    """The coded refined path must reconstruct the refined latents to within
    the FIXED grid step — no [-1,1] clamp cliff (round-4: -5.5 dB) and no
    span-widened step (round-5: -3.9 dB)."""
    from image_compression_2_tpu.quant.uniform import (
        dequantize_from_indices_grid,
        fixed_step_levels,
    )

    comp = _codec(bits=8)
    x = _images(1, seed=6)
    codes, extra = comp._latent_codes(x, refine_steps=4)
    assert "w_range" in extra
    assert extra["w_grid"] == "fixed-step"
    assert extra.pop("_n_symbols") == 4 * 256
    wr = np.asarray(extra["w_range"], np.float32)
    lo, hi = wr[..., 0], wr[..., 1]
    nlv = fixed_step_levels(lo, hi, 8, extra["grid_expand"])
    w_dec = np.asarray(dequantize_from_indices_grid(codes, lo, hi, nlv))
    # decoded latents live on the grid spanning the refined range,
    # not clamped to [-1, 1]
    assert (w_dec.min(axis=-1) >= lo - 1e-5).all()
    assert (w_dec.max(axis=-1) <= hi + 1e-5).all()
    # realised step never exceeds the fixed [-1, 1] step where the alphabet
    # cap does not bind — the whole point of the fixed-step grid
    step = (hi - lo) / (nlv - 1)
    fixed = 2.0 / 255.0
    assert ((step <= fixed + 1e-6) | (nlv == 4 * 256)).all()
    # full roundtrip through the entropy layer carries the range
    payload, meta = comp.compress_entropy(x, refine_steps=4)
    assert meta.get("w_range") is not None
    assert meta["n_embeddings"] == 4 * 256
    # side information is charged to the rate
    n_range_bytes = np.asarray(meta["w_range"]).size * 4
    assert meta["comp_size"] >= n_range_bytes
    img = comp.decompress_entropy(payload, meta)
    assert np.isfinite(np.asarray(img)).all()


def test_refined_container_roundtrip_with_range(tmp_path):
    comp = _codec(bits=8)
    x = _images(1, seed=7)
    f = str(tmp_path / "r.cabac")
    comp.save_compressed(x, f, refine_steps=4)
    ref = np.asarray(
        comp.decompress_entropy(*comp.compress_entropy(x, refine_steps=4)))
    img, ratio = comp.load_compressed(f)
    np.testing.assert_array_equal(np.asarray(img), ref)


def test_fixed_step_levels_and_grid_roundtrip():
    """Snapped fixed-step grid: points lie EXACTLY on the (-1)-anchored
    lattice until the cap binds, and the quant/dequant pair reconstructs
    within half the realised step."""
    from image_compression_2_tpu.quant.uniform import (
        dequantize_from_indices_grid,
        fixed_step_levels,
        latent_range,
        quantize_to_indices_grid,
        snap_to_lattice,
    )

    rng = np.random.default_rng(1)
    w = rng.normal(0.0, 2.0, (3, 4, 16)).astype(np.float32)
    for bits in (6, [4, 8, 6, 10]):
        lo, hi = latent_range(w)
        lo, hi = snap_to_lattice(lo, hi, bits)
        assert (lo[:, :, None] <= w + 1e-6).all()
        assert (hi[:, :, None] >= w - 1e-6).all()
        nlv = fixed_step_levels(lo, hi, bits, expand=4)
        b = np.asarray([bits] * 4 if isinstance(bits, int) else bits)
        cap = (1 << b) * 4
        assert (nlv >= 2).all() and (nlv <= cap[None, :]).all()
        fixed_step = 2.0 / ((1 << b) - 1)
        realised = (hi - lo) / (nlv - 1)
        uncapped = nlv < cap[None, :]
        assert (np.abs(realised - fixed_step[None, :])[uncapped]
                <= 1e-6).all()
        # phase: grid points sit on the -1-anchored lattice where uncapped
        k = np.round((lo + 1.0) / fixed_step[None, :])
        assert (np.abs(lo + 1.0 - k * fixed_step[None, :])[uncapped]
                <= 1e-5).all()
        idx = np.asarray(quantize_to_indices_grid(w, lo, hi, nlv))
        assert idx.min() >= 0 and (idx.max(axis=-1) < nlv).all()
        back = np.asarray(dequantize_from_indices_grid(idx, lo, hi, nlv))
        assert (np.abs(back - w) <= realised[:, :, None] / 2 + 1e-5).all()


def test_fixed_step_lattice_codes_st_values_losslessly():
    """Values already ON the straight-through lattice (what the
    quantization-aware refinement phase produces) must survive the snapped
    grid quant/dequant bit-nearly-exactly — the phase-alignment property."""
    from image_compression_2_tpu.quant.uniform import (
        dequantize_from_indices_grid,
        fixed_step_levels,
        latent_range,
        quantize_to_indices_grid,
        quantize_uniform,
        snap_to_lattice,
    )

    rng = np.random.default_rng(4)
    bits = 4
    w = rng.normal(0.0, 1.0, (2, 3, 32)).astype(np.float32)
    w_st = np.asarray(quantize_uniform(w, bits))  # unbounded lattice round
    lo, hi = latent_range(w_st)
    lo, hi = snap_to_lattice(lo, hi, bits)
    nlv = fixed_step_levels(lo, hi, bits, expand=4)
    assert (nlv < 4 * (1 << bits)).all()  # cap must not bind here
    idx = np.asarray(quantize_to_indices_grid(w_st, lo, hi, nlv))
    back = np.asarray(dequantize_from_indices_grid(idx, lo, hi, nlv))
    np.testing.assert_allclose(back, w_st, atol=2e-6)


def test_fixed_step_levels_decoder_recompute_is_exact():
    """The decoder recomputes n_levels from the container's float32 range —
    must be bit-identical to the encoder's, including after the JSON
    round-trip the container metadata takes."""
    import json

    from image_compression_2_tpu.quant.uniform import (
        fixed_step_levels,
        latent_range,
        snap_to_lattice,
    )

    rng = np.random.default_rng(2)
    w = rng.normal(0.0, 1.7, (4, 6, 32)).astype(np.float32)
    lo, hi = latent_range(w)
    lo, hi = snap_to_lattice(lo, hi, 8)
    enc = fixed_step_levels(lo, hi, 8, 4)
    wr = np.stack([lo, hi], -1).tolist()
    wr2 = np.asarray(json.loads(json.dumps({"w_range": wr}))["w_range"],
                     np.float32)
    dec = fixed_step_levels(wr2[..., 0], wr2[..., 1], 8, 4)
    np.testing.assert_array_equal(enc, dec)


def test_fixed_step_beats_span_distortion_at_same_range():
    """On the same out-of-[-1,1] latents, the fixed-step grid's quantization
    error must be strictly below the 2**bits span grid's whenever the span
    exceeds 2 (the regime refinement creates)."""
    from image_compression_2_tpu.quant.uniform import (
        dequantize_from_indices_affine,
        dequantize_from_indices_grid,
        fixed_step_levels,
        latent_range,
        quantize_to_indices_affine,
        quantize_to_indices_grid,
    )

    rng = np.random.default_rng(3)
    w = rng.normal(0.0, 2.0, (2, 4, 64)).astype(np.float32)
    lo, hi = latent_range(w)
    assert (hi - lo).max() > 2.0  # the regime under test
    bits = 6
    span_dec = np.asarray(dequantize_from_indices_affine(
        quantize_to_indices_affine(w, bits, lo, hi), bits, lo, hi))
    nlv = fixed_step_levels(lo, hi, bits, expand=4)
    grid_dec = np.asarray(dequantize_from_indices_grid(
        quantize_to_indices_grid(w, lo, hi, nlv), lo, hi, nlv))
    mse_span = float(np.mean((span_dec - w) ** 2))
    mse_grid = float(np.mean((grid_dec - w) ** 2))
    assert mse_grid < mse_span


def test_span_codec_decodes_fixed_step_stream_and_vice_versa():
    """Decode is metadata-driven: a span-configured codec reconstructs a
    fixed-step stream bit-exactly (and the other way round)."""
    comp = _codec(bits=8)
    span = UniformCABACCompressor(comp.encoder_cfg, comp.generator_cfg,
                                  comp.encoder_vars, comp.generator_vars,
                                  quantization_bits=8, refined_grid="span")
    x = _images(1, seed=11)
    p1, m1 = comp.compress_entropy(x, refine_steps=2)
    assert m1.get("w_grid") == "fixed-step"
    np.testing.assert_array_equal(np.asarray(span.decompress_entropy(p1, m1)),
                                  np.asarray(comp.decompress_entropy(p1, m1)))
    p2, m2 = span.compress_entropy(x, refine_steps=2)
    assert m2.get("w_grid") is None and m2["n_embeddings"] == 256
    np.testing.assert_array_equal(np.asarray(span.decompress_entropy(p2, m2)),
                                  np.asarray(comp.decompress_entropy(p2, m2)))


def test_grid_priors_alphabet_handling():
    """Priors calibrated on refined (grid) codes get the widened alphabet;
    auto mode silently skips them for unrefined (nominal-alphabet) streams,
    and explicit use_priors=True on a mismatched alphabet raises."""
    comp = _codec(bits=6)
    x = _images(2, seed=12)
    comp.calibrate(x, refine_steps=2)
    assert comp.priors.shape[-1] == 4 * 64
    # refined stream: priors apply (auto keeps the smaller encoding)
    p, m = comp.compress_entropy(x, refine_steps=2)
    assert m["n_embeddings"] == 4 * 64
    img = comp.decompress_entropy(p, m)
    assert np.isfinite(np.asarray(img)).all()
    # unrefined stream: alphabet 64 != 256 — auto must fall back, not crash
    p2, m2 = comp.compress_entropy(x)
    assert m2["n_embeddings"] == 64 and not m2["use_priors"]
    # explicit request is a hard error, not silent garbage
    with pytest.raises(ValueError, match="alphabet"):
        comp.compress_entropy(x, use_priors=True)


def test_grid_expand_alphabet_cap_validation():
    with pytest.raises(ValueError, match="alphabet"):
        gen_cfg = GeneratorConfig.tiny(img_resolution=RES, num_layers=4,
                                       margin_size=1)
        enc_cfg = EncoderConfig.tiny(img_resolution=RES, w_dim=gen_cfg.w_dim,
                                     num_ws=gen_cfg.num_ws, block_split=(2, 4))
        UniformCABACCompressor.create(enc_cfg, gen_cfg, seed=0,
                                      quantization_bits=14, grid_expand=8)


def test_per_layer_bit_allocation_codec():
    gen_cfg = GeneratorConfig.tiny(img_resolution=RES, num_layers=4,
                                   margin_size=1)
    enc_cfg = EncoderConfig.tiny(img_resolution=RES, w_dim=gen_cfg.w_dim,
                                 num_ws=gen_cfg.num_ws, block_split=(2, 4))
    alloc = ([10, 8] + [6] * (gen_cfg.num_ws - 4) + [4, 4])[:gen_cfg.num_ws]
    comp = UniformCABACCompressor.create(enc_cfg, gen_cfg, seed=0,
                                         quantization_bits=alloc)
    assert comp.n_symbols == 1 << 10
    x = _images(2, seed=8)
    payload, meta = comp.compress_entropy(x, use_cabac=True)
    # orig_size honours the allocation, not the max alphabet
    w_dim = gen_cfg.w_dim
    assert meta["orig_size"] == pytest.approx(2 * w_dim * sum(alloc) / 8)
    img = comp.decompress_entropy(payload, meta)
    assert img.shape == (2, RES, RES, 3)
    assert np.isfinite(np.asarray(img)).all()

    # a scalar-bits codec refuses the per-layer stream (and vice versa)
    scalar = _codec(bits=8)
    with pytest.raises(ValueError, match="uniform-"):
        scalar.decompress_entropy(payload, meta)

    # refined per-layer path roundtrips too
    payload2, meta2 = comp.compress_entropy(x[:1], refine_steps=2)
    img2 = comp.decompress_entropy(payload2, meta2)
    assert np.isfinite(np.asarray(img2)).all()

    # wrong-length allocation is rejected
    with pytest.raises(ValueError, match="per-layer"):
        UniformCABACCompressor.create(enc_cfg, gen_cfg, seed=0,
                                      quantization_bits=[8, 8])


def test_priors_auto_mode_never_loses_to_adaptive():
    """use_priors=None (auto) with a MISMATCHED prior table must fall back
    to adaptive contexts when they code smaller (round-4 RD: 4-bit priors
    lost 240:1 vs 249:1)."""
    comp = _codec(bits=4)
    # calibrate on a DIFFERENT codec's latents: a maximally stale prior
    other = _codec(bits=4, seed=99)
    x_calib = _images(8, seed=9)
    codes, _ = other._latent_codes(x_calib)
    from image_compression_2_tpu.coding import build_prior

    comp.priors = build_prior(codes, comp.n_symbols)
    x = _images(2, seed=10)
    _, meta_adapt = comp.compress_entropy(x, use_priors=False)
    payload, meta_auto = comp.compress_entropy(x)  # auto
    assert meta_auto["comp_size"] <= meta_adapt["comp_size"]
    img = comp.decompress_entropy(payload, meta_auto)
    assert np.isfinite(np.asarray(img)).all()
