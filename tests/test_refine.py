"""Encode-time latent refinement (codec/refine.py).

The refined W+ must reconstruct the target strictly better than the
encoder's one-shot estimate — on a generator-sampled target the true W+
exists, so gradient descent through the frozen synthesis network improves
MSE monotonically from any reasonable init.  Capability beyond the
reference's single amortised encode
(/root/reference/stylegan3_hvae_full.py:283-293).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_compression_2_tpu.codec import Compressor
from image_compression_2_tpu.core import EncoderConfig, GeneratorConfig


@pytest.fixture(scope="module")
def tiny_codec():
    gen_cfg = GeneratorConfig.tiny(img_resolution=32)
    enc_cfg = EncoderConfig.tiny(
        img_resolution=32, w_dim=gen_cfg.w_dim, num_ws=gen_cfg.num_ws
    )
    return Compressor.create(enc_cfg, gen_cfg, seed=0)


def _gen_target(codec, seed=3):
    """A target the generator can represent exactly (known true W+)."""
    z = jax.random.normal(jax.random.PRNGKey(seed),
                          [2, codec.generator_cfg.z_dim])
    w = codec.generator.apply(codec.generator_vars, z, method="mapping")
    # synthesis directly (NOT codec.decompress: the Gumbel codec's decompress
    # takes integer codes, the uniform codec's takes W+)
    return codec.generator.apply(codec.generator_vars, w, method="synthesis")


def _mse(codec, w, target):
    recon = codec.decompress(w)
    return float(jnp.mean(jnp.square(recon - target)))


def test_refine_reduces_reconstruction_error(tiny_codec):
    target = _gen_target(tiny_codec)
    w0 = tiny_codec.encode(target, deterministic=True)
    w_ref = tiny_codec.refine(w0, target, steps=24, lr=0.05)
    assert w_ref.shape == w0.shape
    assert w_ref.dtype == jnp.float32
    assert _mse(tiny_codec, w_ref, target) < _mse(tiny_codec, w0, target)


def test_refine_more_steps_no_worse(tiny_codec):
    target = _gen_target(tiny_codec, seed=5)
    w0 = tiny_codec.encode(target, deterministic=True)
    few = _mse(tiny_codec, tiny_codec.refine(w0, target, steps=4, lr=0.05),
               target)
    many = _mse(tiny_codec, tiny_codec.refine(w0, target, steps=32, lr=0.05),
                target)
    assert many <= few * 1.05  # monotone up to Adam noise


def test_compress_with_refinement_improves_roundtrip(tiny_codec):
    target = _gen_target(tiny_codec, seed=7)
    w_plain = tiny_codec.compress(target, quantization_bits=8)
    w_ref = tiny_codec.compress(target, quantization_bits=8,
                                refine_steps=24, refine_lr=0.05)
    # the refined latents still live on the 8-bit quantization grid
    from image_compression_2_tpu.quant import quantize_uniform

    np.testing.assert_allclose(np.asarray(w_ref),
                               np.asarray(quantize_uniform(w_ref, 8)),
                               atol=1e-6)
    assert _mse(tiny_codec, w_ref, target) < _mse(tiny_codec, w_plain, target)


def test_quantization_aware_refinement_at_low_bits(tiny_codec):
    target = _gen_target(tiny_codec, seed=9)
    w0 = tiny_codec.encode(target, deterministic=True)
    from image_compression_2_tpu.quant import quantize_uniform

    w_plain = quantize_uniform(
        tiny_codec.refine(w0, target, steps=24, lr=0.05), 3)
    w_qa = quantize_uniform(
        tiny_codec.refine(w0, target, steps=24, lr=0.05,
                          quantization_bits=3), 3)
    # QA refinement optimises the decoded grid point; it must at least not
    # be dramatically worse, and usually wins at coarse bits.
    assert _mse(tiny_codec, w_qa, target) <= \
        _mse(tiny_codec, w_plain, target) * 1.25


def test_refine_chunked_matches_full_batch(tiny_codec):
    # chunked execution is a memory tactic, not a semantic one: each sample's
    # refinement is independent, so chunk=1 must equal the full-batch result
    target = _gen_target(tiny_codec, seed=13)
    w0 = tiny_codec.encode(target, deterministic=True)
    full = tiny_codec.refine(w0, target, steps=8, lr=0.05, chunk=None)
    chunked = tiny_codec.refine(w0, target, steps=8, lr=0.05, chunk=1)
    # tolerance: different batch shapes change XLA's fusion/reduction order,
    # so agreement is to float noise, not bitwise
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                               atol=5e-5, rtol=5e-4)


@pytest.fixture(scope="module")
def tiny_cabac():
    from image_compression_2_tpu.codec.cabac_compressor import CABACCompressor

    gen_cfg = GeneratorConfig.tiny(img_resolution=32)
    enc_cfg = EncoderConfig.tiny(
        img_resolution=32, w_dim=gen_cfg.w_dim, num_ws=gen_cfg.num_ws
    )
    return CABACCompressor.create(enc_cfg, gen_cfg, seed=0, n_embeddings=64)


def test_gumbel_refine_improves_and_shares_container(tiny_cabac):
    # refined codes ride the UNCHANGED discrete container: same dtype/shape/
    # range, decoded by the same codebook lookup — only distortion improves
    target = _gen_target(tiny_cabac, seed=15)
    plain = tiny_cabac.compress(target)
    refined = tiny_cabac.compress(target, refine_steps=24, refine_lr=0.05)
    assert refined.shape == plain.shape and refined.dtype == plain.dtype
    r = np.asarray(refined)
    assert r.min() >= 0 and r.max() < tiny_cabac.n_embeddings
    mse_plain = float(jnp.mean(jnp.square(
        tiny_cabac.decompress(plain) - target)))
    mse_ref = float(jnp.mean(jnp.square(
        tiny_cabac.decompress(refined) - target)))
    assert mse_ref < mse_plain


def test_codebook_indices_matches_hard_discretization(tiny_cabac):
    # nearest-codebook projection (quant/gumbel.py::codebook_indices) must
    # agree with the discretization module's own argmin on the same input
    from image_compression_2_tpu.quant.gumbel import codebook_indices

    target = _gen_target(tiny_cabac, seed=17)
    means = tiny_cabac._means_fn(tiny_cabac.encoder_vars, target)
    _, _, idx_module = tiny_cabac.discretization.apply(
        tiny_cabac.disc_vars, means, hard=True, key=None)
    idx_helper = codebook_indices(means, tiny_cabac.n_embeddings)
    np.testing.assert_array_equal(np.asarray(idx_module),
                                  np.asarray(idx_helper))


def test_cabac_entropy_roundtrip_with_refined_codes(tiny_cabac):
    target = _gen_target(tiny_cabac, seed=19)
    payload, meta = tiny_cabac.compress_entropy(
        target, use_cabac=True, refine_steps=8, refine_lr=0.05)
    recon = tiny_cabac.decompress_entropy(payload, meta)
    assert recon.shape[0] == target.shape[0]
    assert np.isfinite(np.asarray(recon)).all()
    # the stream decodes to exactly the refined codes' reconstruction
    codes = tiny_cabac.compress(target, refine_steps=8, refine_lr=0.05)
    np.testing.assert_allclose(np.asarray(recon),
                               np.asarray(tiny_cabac.decompress(codes)),
                               atol=1e-5)


def test_save_compressed_refined_container_unchanged(tiny_codec, tmp_path):
    target = _gen_target(tiny_codec, seed=11)
    f = str(tmp_path / "ref.npz")
    orig, comp, ratio = tiny_codec.save_compressed(
        target, f, quantization_bits=8, refine_steps=8)
    data = np.load(f)
    assert set(data.files) == {"w", "resolution", "bits", "orig_size",
                               "comp_size", "compression_ratio"}
    assert comp == data["w"].size  # 8-bit: one byte per element
    img, r = tiny_codec.load_compressed(f)
    assert img.shape[0] == target.shape[0] and r == pytest.approx(ratio)
