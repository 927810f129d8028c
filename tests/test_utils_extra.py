"""Per-layer quantization, SVG plots, profiling helpers."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_compression_2_tpu.quant import (
    per_layer_comp_size_bytes,
    quantize_uniform,
    quantize_uniform_per_layer,
)
from image_compression_2_tpu.utils.plotting import plot_history_svg
from image_compression_2_tpu.utils.profiling import benchmark, sync, timed


def test_per_layer_quantization():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.uniform(-1, 1, [2, 4, 16]), jnp.float32)
    bits = [10, 8, 6, 4]
    wq = np.asarray(quantize_uniform_per_layer(w, bits))
    for li, b in enumerate(bits):
        # each layer lands exactly on its own grid
        ref = np.asarray(quantize_uniform(w[:, li], b))
        np.testing.assert_allclose(wq[:, li], ref, atol=1e-6)
    # coarser layers have larger max error
    errs = [np.abs(wq[:, i] - np.asarray(w)[:, i]).max() for i in range(4)]
    assert errs[0] < errs[-1]
    assert per_layer_comp_size_bytes(bits, 16, batch=2) == 2 * 16 * 28 / 8


def test_per_layer_bits_in_codec(tmp_path):
    from image_compression_2_tpu.codec import Compressor
    from image_compression_2_tpu.core import EncoderConfig, GeneratorConfig

    gen_cfg = GeneratorConfig.tiny(img_resolution=16, num_layers=4,
                                   margin_size=1)
    enc_cfg = EncoderConfig.tiny(img_resolution=16, w_dim=gen_cfg.w_dim,
                                 num_ws=gen_cfg.num_ws, block_split=(2, 4))
    comp = Compressor.create(enc_cfg, gen_cfg, seed=0)
    x = jax.random.uniform(jax.random.PRNGKey(0), [1, 16, 16, 3],
                           minval=-1, maxval=1)
    bits = [10] * 2 + [6] * (gen_cfg.num_ws - 2)
    f = str(tmp_path / "pl.npz")
    orig, comp_size, ratio = comp.save_compressed(x, f, quantization_bits=bits)
    assert comp_size == gen_cfg.w_dim * sum(bits) / 8
    data = np.load(f)
    np.testing.assert_array_equal(data["bits"], bits)
    img, r2 = comp.load_compressed(f)
    assert r2 == ratio


def test_plot_history_svg(tmp_path):
    hist = {"loss": [3.0, 2.0, 1.5, 1.2], "rec_loss": [1.0, 0.8, 0.7, 0.65]}
    f = str(tmp_path / "curves.svg")
    svg = plot_history_svg(hist, f, keys=["loss", "rec_loss"])
    assert os.path.exists(f)
    assert "<svg" in svg and "polyline" in svg
    assert "loss" in svg and "rec_loss" in svg


def test_profiling_helpers(capsys):
    x = jnp.ones([8, 8])
    ms = benchmark(lambda a: a * 2, x, iters=2)
    assert ms >= 0
    sync(x)
    box = {}
    with timed("op", box):
        pass
    assert "op" in box
    assert "[timing]" in capsys.readouterr().out
