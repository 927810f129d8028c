"""Whole-layer fused Pallas kernel (conv+demod+bias+filtered-lrelu in one
pallas_call): golden equality vs the unfused modulated_conv2d+filtered_lrelu
composition and gradient parity (interpret mode on CPU; compiled-path timing
happens on the real TPU via tools/bench_layerfuse.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_compression_2_tpu.ops import (design_lowpass_filter,
                                         filtered_lrelu, modulated_conv2d)
from image_compression_2_tpu.ops import pallas_layerfuse as lf


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    import jax.experimental.pallas as pl

    real_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return real_call(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    lf._build_call.cache_clear()
    yield
    lf._build_call.cache_clear()


def _filters(tu, td):
    fu = design_lowpass_filter(tu, 0.4, 0.4, 4.0)
    fd = design_lowpass_filter(td, 0.4, 0.4, 4.0)
    return fu, fd


def _ref(x, weight, styles, bias, fu, fd, up, down, padding, input_gain,
         clamp=256.0):
    y = modulated_conv2d(x, weight, styles, demodulate=True,
                         padding=weight.shape[0] - 1, input_gain=input_gain)
    return filtered_lrelu(y, fu, fd, bias, up=up, down=down, padding=padding,
                          clamp=clamp, mode="conv")


def _inputs(B=2, H=12, W=12, Cin=24, Cout=32, k=3, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, H, W, Cin).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.randn(k, k, Cin, Cout).astype(np.float32))
    s = jnp.asarray(rng.randn(B, Cin).astype(np.float32) * 0.5 + 1.0)
    b = jnp.asarray(rng.randn(Cout).astype(np.float32) * 0.1)
    ig = jnp.asarray(0.8, jnp.float32)
    return x, w, s, b, ig


def test_plan_feasibility():
    # the explicit-ct path (what the measured policy + sweep use) accepts
    # Mosaic-legal tiles: ct % 128 == 0 or ct == Cout
    assert lf.fits_layerfuse(8, 36, 36, 512, 512, 3, 2, 2, 12, 12,
                             (9, 8, 9, 8), ct=128)
    assert lf.fits_layerfuse(8, 36, 36, 512, 512, 3, 4, 2, 24, 12,
                             (-6, -9, -6, -9), ct=128)
    # ...and rejects tiles Mosaic cannot lower (lane dim < 128 and != Cout):
    # the 2026-08-19 on-chip sweep failed every 64/32 tile on this rule
    assert not lf.fits_layerfuse(8, 36, 36, 512, 512, 3, 2, 2, 12, 12,
                                 (9, 8, 9, 8), ct=64)
    assert not lf.fits_layerfuse(8, 36, 36, 512, 512, 3, 2, 2, 12, 12,
                                 (9, 8, 9, 8), ct=32)
    # full-Cout tiles are legal even when not a multiple of 128
    assert lf.fits_layerfuse(2, 12, 12, 24, 24, 3, 2, 2, 12, 12,
                             (9, 8, 9, 8), ct=24)
    # a plane too large for any block has no plan (auto path, conservative
    # VMEM estimate)
    assert not lf.fits_layerfuse(8, 1024, 1024, 512, 512, 3, 2, 2, 12, 12,
                                 (9, 8, 9, 8))


def test_matches_unfused_up2_down2():
    x, w, s, b, ig = _inputs()
    fu, fd = _filters(8, 6)
    kw = dict(up=2, down=2, padding=(5, 4, 4, 5))
    ref = np.asarray(_ref(x, w, s, b, fu, fd, input_gain=ig, **kw))
    got = np.asarray(lf.fused_synthesis_layer(
        x, w, s, b, fu, fd, input_gain=ig, **kw))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_matches_unfused_up4_negative_pad():
    x, w, s, b, ig = _inputs(B=1, H=10, W=14, Cin=16, Cout=64, seed=3)
    fu, fd = _filters(12, 6)
    kw = dict(up=4, down=2, padding=(-2, -3, -2, -3))
    ref = np.asarray(_ref(x, w, s, b, fu, fd, input_gain=ig, **kw))
    got = np.asarray(lf.fused_synthesis_layer(
        x, w, s, b, fu, fd, input_gain=ig, **kw))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_clamp_and_no_input_gain():
    x, w, s, b, _ = _inputs(seed=5)
    fu, fd = _filters(8, 6)
    kw = dict(up=2, down=2, padding=(5, 4, 4, 5))
    ref = np.asarray(_ref(4.0 * x, w, s, b, fu, fd, input_gain=None,
                          clamp=1.0, **kw))
    got = np.asarray(lf.fused_synthesis_layer(
        4.0 * x, w, s, b, fu, fd, input_gain=None, clamp=1.0, **kw))
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)
    assert np.abs(got).max() <= 1.0 + 1e-6


def test_gradients_match_reference():
    x, w, s, b, ig = _inputs(B=1, H=8, W=8, Cin=16, Cout=32, seed=7)
    fu, fd = _filters(8, 6)
    kw = dict(up=2, down=2, padding=(5, 4, 4, 5))

    def loss_fused(x, w, s, b):
        return jnp.sum(lf.fused_synthesis_layer(
            x, w, s, b, fu, fd, input_gain=ig, **kw) ** 2)

    def loss_ref(x, w, s, b):
        return jnp.sum(_ref(x, w, s, b, fu, fd, input_gain=ig, **kw) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, w, s, b)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, w, s, b)
    for gf, gr, name in zip(g_fused, g_ref, "xwsb"):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), rtol=5e-3, atol=5e-3,
            err_msg=f"grad mismatch for {name}")


def test_bf16_smoke():
    x, w, s, b, ig = _inputs(seed=9)
    fu, fd = _filters(8, 6)
    kw = dict(up=2, down=2, padding=(5, 4, 4, 5))
    ref = np.asarray(_ref(x.astype(jnp.bfloat16), w, s, b, fu, fd,
                          input_gain=ig, **kw), np.float32)
    got = np.asarray(lf.fused_synthesis_layer(
        x.astype(jnp.bfloat16), w, s, b, fu, fd, input_gain=ig, **kw),
        np.float32)
    assert got.shape == ref.shape
    scale = max(1e-3, float(np.abs(ref).max()))
    assert np.max(np.abs(got - ref)) / scale < 0.06


def test_synthesis_layer_routes_via_policy(monkeypatch):
    """SynthesisLayer consults the policy's `layers` table: with every
    geometry marked 'fused' the generator output is unchanged and the fused
    kernel is actually invoked."""
    from image_compression_2_tpu.core import GeneratorConfig, Precision
    from image_compression_2_tpu.models import Generator
    from image_compression_2_tpu.ops import flrelu_policy as fp

    cfg = GeneratorConfig.tiny(img_resolution=32)
    # the fused path is gated to the deployment compute dtype (bf16)
    prec = Precision(compute_dtype=jnp.bfloat16, num_lowprec_res=16)
    model = Generator(cfg, precision=prec)
    z = jnp.asarray(np.random.RandomState(0).randn(2, cfg.z_dim), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), z)
    ref = np.asarray(model.apply(variables, z), np.float32)

    table = {}
    for spec in cfg.layer_specs:
        if spec.is_torgb or (spec.up_factor == 1 and spec.down_factor == 1):
            continue
        table[fp.layer_key(2, spec.in_size, spec.in_size, spec.in_channels,
                           spec.out_channels, spec.conv_kernel,
                           spec.up_factor, spec.down_factor,
                           spec.up_taps, spec.down_taps,
                           spec.padding)] = "fused:ct32"
    monkeypatch.setattr(fp, "_policy", {"winners": {}, "winners_grad": {},
                                        "layers": table})
    monkeypatch.setattr(fp, "FORCE_PALLAS_ON_CPU", True)

    calls = {"n": 0}
    real = lf._layerfuse

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(lf, "_layerfuse", counting)
    got = np.asarray(model.apply(variables, z), np.float32)
    assert calls["n"] > 0, "fused path never taken despite policy"
    # bf16 compute: fused/unfused differ only by rounding-point placement
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)
