"""jit-vs-eager consistency (SURVEY §5: the TPU-native replacement for the
reference's nonexistent sanitizers) and quantizer torch-rounding parity."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from image_compression_2_tpu.core import EncoderConfig, GeneratorConfig
from image_compression_2_tpu.models import Generator, HVAEEncoder
from image_compression_2_tpu.quant import quantize_uniform


def test_generator_jit_matches_eager():
    cfg = GeneratorConfig.tiny(img_resolution=16, num_layers=4, margin_size=1)
    gen = Generator(cfg)
    variables = jax.jit(gen.init)(jax.random.PRNGKey(0),
                                  jnp.zeros([1, cfg.z_dim]))
    z = jax.random.normal(jax.random.PRNGKey(1), [2, cfg.z_dim])
    eager = np.asarray(gen.apply(variables, z))
    jitted = np.asarray(jax.jit(lambda v, z: gen.apply(v, z))(variables, z))
    np.testing.assert_allclose(eager, jitted, rtol=1e-5, atol=1e-6)


def test_encoder_jit_matches_eager():
    cfg = EncoderConfig.tiny(img_resolution=16, block_split=(2, 4))
    enc = HVAEEncoder(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), [2, 16, 16, 3],
                           minval=-1, maxval=1)
    variables = enc.init(jax.random.PRNGKey(1), x)
    _, m_e, lv_e = enc.apply(variables, x)
    _, m_j, lv_j = jax.jit(lambda v, x: enc.apply(v, x))(variables, x)
    np.testing.assert_allclose(np.asarray(m_e), np.asarray(m_j), rtol=1e-5,
                               atol=1e-6)


def test_quantizer_rounding_matches_torch():
    """BASELINE.md requires bit-stable .npz latents: jnp.round and torch.round
    must agree on ties (both round-half-even) at every supported bit depth."""
    vals = np.linspace(-1, 1, 4097).astype(np.float32)
    for bits in (4, 8, 10):
        scale = 2 ** bits - 1
        t = torch.round(torch.from_numpy((vals + 1) * 0.5 * scale))
        j = jnp.round(jnp.asarray((vals + 1) * 0.5 * scale))
        np.testing.assert_array_equal(np.asarray(j), t.numpy())
        # and through the public quantizer
        wq = quantize_uniform(jnp.asarray(vals)[None, None, :], bits)
        tq = (t / scale * 2 - 1).numpy()
        np.testing.assert_allclose(np.asarray(wq)[0, 0], tq, atol=1e-6)
