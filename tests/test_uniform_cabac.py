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
