"""H-up-in-kernel fused Pallas filtered-lrelu (mode='hfuse'): golden
equality vs the conv/matmul references and gradient parity (interpret mode
on CPU; compiled-path timing happens on the real TPU via
bench_flrelu_layers)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_compression_2_tpu.ops import design_lowpass_filter, filtered_lrelu
from image_compression_2_tpu.ops import pallas_flrelu_hfuse as hf


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    import jax.experimental.pallas as pl

    real_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return real_call(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    hf._build_call.cache_clear()
    yield
    hf._build_call.cache_clear()


def _filters(tu, td):
    fu = design_lowpass_filter(tu, 0.4, 0.4, 4.0)
    fd = design_lowpass_filter(td, 0.4, 0.4, 4.0)
    return fu, fd


def test_plan_feasibility():
    # the 256-config hot layer fits (per-layer geometry at b8)
    assert hf.fits_hfuse(8, 150, 150, 512, 2, 2, 12, 12, (9, 8, 9, 8))
    # grotesquely wide geometry has no legal block
    assert not hf.fits_hfuse(1, 8192, 8192, 512, 2, 2, 12, 12, 0)


def test_plans_are_mosaic_legal_at_production_geometries():
    """Every plan's channel tile must be a 128 multiple or the full padded C
    — the round-5 sweep's Ct=64 fallback lowered in interpret mode but
    failed Mosaic on-chip at every big 256² layer, silently excluding hfuse
    from the hot half of the stack (`runs/r5_policy_fwd.txt`)."""
    import jax.numpy as jnp

    big_256_b8 = [  # (H, W, C, up, down, tu, td) per the sweep's hot layers
        (150, 150, 512, 2, 2, 12, 12),
        (150, 150, 362, 4, 2, 24, 12),
        (278, 278, 256, 2, 2, 12, 12),
        (278, 278, 181, 2, 2, 12, 12),
        (278, 278, 128, 2, 2, 12, 12),
    ]
    for H, W, C, up, down, tu, td in big_256_b8:
        pad = ((9, 8, 9, 8) if up == 2 else (-6, -9, -6, -9))
        Cp = hf._pad_channels(C)
        assert Cp % 128 == 0 or Cp <= 128, (C, Cp)
        assert hf.fits_hfuse(8, H, W, C, up, down, tu, td, pad), (H, W, C)
        # reconstruct the plan the wrapper will use and check tile legality
        from image_compression_2_tpu.ops.upfirdn2d import _parse_padding

        px0, px1, py0, py1 = _parse_padding(pad)
        H2 = H * up + py0 + py1 - tu + 1
        W2 = W * up + px0 + px1 - tu + 1
        Wo = (W2 - td) // down + 1
        p = hf.plan_hfuse(8, H, H2, W, W2, Wo, Cp, jnp.bfloat16)
        assert p is not None
        assert p.Ct % 128 == 0 or p.Ct == Cp, (p.Ct, Cp)


def test_matches_reference_padded_channels():
    """C not a multiple of 128 and > 128 rides the zero-padded channel path
    (C=160 -> 256); must still match the reference exactly."""
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 14, 14, 160).astype(np.float32))
    b = jnp.asarray(rng.randn(160).astype(np.float32))
    fu, fd = _filters(12, 12)
    kw = dict(up=2, down=2, padding=(9, 8, 8, 9), clamp=256.0)
    ref = np.asarray(filtered_lrelu(x, fu, fd, b, mode="matmul", **kw))
    got = np.asarray(filtered_lrelu(x, fu, fd, b, mode="hfuse", **kw))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_matches_reference_up2_down2():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 20, 20, 128).astype(np.float32))
    b = jnp.asarray(rng.randn(128).astype(np.float32))
    fu, fd = _filters(12, 12)
    kw = dict(up=2, down=2, padding=(9, 8, 8, 9), clamp=256.0)
    ref = np.asarray(filtered_lrelu(x, fu, fd, b, mode="conv", **kw))
    got = np.asarray(filtered_lrelu(x, fu, fd, b, mode="hfuse", **kw))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_matches_reference_asymmetric_pad_and_channels():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 13, 17, 64).astype(np.float32))
    fu, fd = _filters(8, 6)
    kw = dict(up=2, down=2, padding=(5, 4, 3, 6), clamp=128.0)
    ref = np.asarray(filtered_lrelu(x, fu, fd, None, mode="matmul", **kw))
    got = np.asarray(filtered_lrelu(x, fu, fd, None, mode="hfuse", **kw))
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_matches_reference_up4():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 12, 12, 32).astype(np.float32))
    fu, fd = _filters(24, 12)
    kw = dict(up=4, down=2, padding=(20, 19, 19, 20), clamp=256.0)
    ref = np.asarray(filtered_lrelu(x, fu, fd, None, mode="conv", **kw))
    got = np.asarray(filtered_lrelu(x, fu, fd, None, mode="hfuse", **kw))
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_gradient_matches_matmul_path():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 12, 12, 32).astype(np.float32))
    b = jnp.asarray(rng.randn(32).astype(np.float32))
    fu, fd = _filters(12, 12)
    kw = dict(up=2, down=2, padding=(9, 8, 8, 9), clamp=256.0)

    def loss(mode):
        def f(xx, bb):
            return jnp.sum(filtered_lrelu(xx, fu, fd, bb, mode=mode, **kw) ** 2)
        return jax.grad(f, argnums=(0, 1))

    gx_ref, gb_ref = loss("matmul")(x, b)
    gx, gb = loss("hfuse")(x, b)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref),
                               rtol=2e-3, atol=2e-3)
