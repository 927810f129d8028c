"""H-tiled fused Pallas filtered-lrelu: golden equality vs the lax reference
(interpret mode on CPU; compiled-path timing happens on the real TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_compression_2_tpu.core import GeneratorConfig
from image_compression_2_tpu.ops import design_lowpass_filter, filtered_lrelu
from image_compression_2_tpu.ops import pallas_flrelu_tiled as pft


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    import jax.experimental.pallas as pl

    real_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return real_call(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    pft._build_call.cache_clear()
    yield
    pft._build_call.cache_clear()


def _run_case(H, W, C, up, down, taps_u, taps_d, pad, batch=2, seed=0,
              dtype=np.float32):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(batch, H, W, C).astype(dtype))
    b = jnp.asarray(rng.randn(C).astype(np.float32))
    fu = design_lowpass_filter(taps_u, 0.35, 0.4, 4.0)
    fd = design_lowpass_filter(taps_d, 0.35, 0.4, 4.0)
    kw = dict(up=up, down=down, padding=pad)
    assert pft.fits_tiled(H, W, C, up, down, taps_u, taps_d, pad)
    ref = np.asarray(filtered_lrelu(
        jnp.asarray(x, jnp.float32), fu, fd, b, mode="conv", **kw))
    got = np.asarray(pft.filtered_lrelu_pallas_tiled(x, fu, fd, b, **kw))
    assert got.shape == ref.shape, (got.shape, ref.shape)
    tol = 5e-4 if dtype == np.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(got, np.float32), ref,
                               rtol=tol, atol=tol)
    return pft.plan_tiled(H, W, C, up, down, taps_u, taps_d, pad)


def test_up2_down2_positive_pad_multichunk():
    # the L1-style geometry, shrunk: multiple chunks exercised
    plan = _run_case(20, 20, 128, 2, 2, 12, 12, (9, 8, 9, 8))
    assert plan.n_chunks >= 1


def test_up4_down2_negative_pad():
    # the L3/L5-style geometry: 4x upsampling with cropping pads
    plan = _run_case(18, 18, 128, 4, 2, 24, 12, (-6, -9, -6, -9))
    assert (plan.ho_len * plan.down) % plan.up == 0


def test_negative_pad_critical_layer():
    # the L13-style geometry: down-cropping pads on both sides
    _run_case(24, 24, 128, 2, 2, 12, 12, (-3, -4, -3, -4))


def test_channel_padding_non_multiple_of_128():
    # C=90 -> padded to 128 inside the kernel (the 362/181-channel layers)
    _run_case(16, 16, 90, 2, 2, 12, 12, (9, 8, 9, 8), batch=1)


def test_bf16_carry():
    _run_case(20, 20, 128, 2, 2, 12, 12, (9, 8, 9, 8), dtype=np.dtype("bfloat16").type)


def test_full_256_config_geometries_plan():
    """Every resampling layer of the 256² flagship must have a legal plan —
    the whole point of the tiled kernel is covering the layers the
    whole-plane kernel excludes."""
    cfg = GeneratorConfig(img_resolution=256)
    for s in cfg.layer_specs:
        if s.up_factor == 1 and s.down_factor == 1:
            continue
        # filtered_lrelu sees the FULL-padded conv output, not in_size
        h = s.in_size + s.conv_kernel - 1
        plan = pft.plan_tiled(h, h, s.out_channels, s.up_factor,
                              s.down_factor, s.up_taps, s.down_taps,
                              s.padding)
        assert plan is not None, s.name
        assert plan.Ho == s.out_size, (s.name, plan.Ho, s.out_size)


def test_one_real_hot_layer_geometry_small_batch():
    """Exact L6-at-84² geometry (a layer the whole-plane kernel excludes),
    with reduced channels for interpreter speed."""
    cfg = GeneratorConfig(img_resolution=256)
    spec = next(s for s in cfg.layer_specs if s.name.startswith("L6"))
    h = spec.in_size + spec.conv_kernel - 1
    _run_case(h, h, 128, spec.up_factor,
              spec.down_factor, spec.up_taps, spec.down_taps, spec.padding,
              batch=1)


def test_auto_mode_consults_measured_policy(monkeypatch, tmp_path):
    """mode='auto' uses the measured per-geometry winner; unbenchmarked
    geometries keep the matmul default."""
    import json

    from image_compression_2_tpu.ops import filtered_lrelu
    from image_compression_2_tpu.ops import flrelu_policy as fp
    from image_compression_2_tpu.ops import pallas_flrelu_tiled as pft_mod
    from image_compression_2_tpu.ops import design_lowpass_filter

    H = W = 20
    C = 128
    pad = (9, 8, 9, 8)
    key = fp.geometry_key(1, H, W, C, 2, 2, 12, 12, pad)
    pfile = tmp_path / "policy.json"
    pfile.write_text(json.dumps({"winners": {key: "tiled"}}))
    monkeypatch.setattr(fp, "_POLICY_FILE", str(pfile))
    monkeypatch.setattr(fp, "_policy", None)
    monkeypatch.setattr(fp, "FORCE_PALLAS_ON_CPU", True)

    calls = []
    real = pft_mod.filtered_lrelu_pallas_tiled

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(
        "image_compression_2_tpu.ops.pallas_flrelu_tiled."
        "filtered_lrelu_pallas_tiled", spy)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, H, W, C).astype(np.float32))
    fu = design_lowpass_filter(12, 0.35, 0.4, 4.0)
    fd = design_lowpass_filter(12, 0.35, 0.4, 4.0)
    out = filtered_lrelu(x, fu, fd, None, up=2, down=2, padding=pad,
                         mode="auto")
    assert calls, "policy winner 'tiled' was not used"
    # unbenchmarked geometry: no kernel call (matmul default)
    calls.clear()
    x2 = jnp.asarray(rng.randn(1, 24, 24, C).astype(np.float32))
    filtered_lrelu(x2, fu, fd, None, up=2, down=2, padding=pad, mode="auto")
    assert not calls
