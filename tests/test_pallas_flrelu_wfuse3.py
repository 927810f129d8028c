"""Channels-middle fused Pallas filtered-lrelu (mode='mmfuse3'): golden
equality vs the conv/matmul references and gradient parity for BOTH VJP
paths (interpret mode on CPU; compiled-path timing happens on the real TPU
via bench_flrelu_layers)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_compression_2_tpu.ops import design_lowpass_filter, filtered_lrelu
from image_compression_2_tpu.ops import pallas_flrelu_wfuse3 as wf3


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    import jax.experimental.pallas as pl

    real_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return real_call(*args, **kwargs)

    def _clear():
        for fn in (wf3._build_call, wf3._build_bwd_call):
            getattr(fn, "cache_clear", lambda: None)()

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    _clear()
    yield
    _clear()


def _filters(tu, td):
    fu = design_lowpass_filter(tu, 0.4, 0.4, 4.0)
    fd = design_lowpass_filter(td, 0.4, 0.4, 4.0)
    return fu, fd


def test_matches_reference_up2_down2():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 20, 20, 128).astype(np.float32))
    b = jnp.asarray(rng.randn(128).astype(np.float32))
    fu, fd = _filters(12, 12)
    kw = dict(up=2, down=2, padding=(9, 8, 8, 9), clamp=256.0)
    ref = np.asarray(filtered_lrelu(x, fu, fd, b, mode="conv", **kw))
    got = np.asarray(filtered_lrelu(x, fu, fd, b, mode="mmfuse3", **kw))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_matches_reference_negative_padding_up4():
    # the u4d2 critically-sampled layers crop via negative padding
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 22, 22, 72).astype(np.float32))
    fu, fd = _filters(24, 12)
    kw = dict(up=4, down=2, padding=(-6, -9, -6, -9), clamp=256.0)
    ref = np.asarray(filtered_lrelu(x, fu, fd, None, mode="matmul", **kw))
    got = np.asarray(filtered_lrelu(x, fu, fd, None, mode="mmfuse3", **kw))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_odd_channel_and_height_blocks():
    # C and H2 not multiples of the block dims exercise grid padding
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(1, 13, 13, 137).astype(np.float32))
    fu, fd = _filters(12, 12)
    kw = dict(up=2, down=2, padding=(9, 8, 8, 9), clamp=256.0)
    ref = np.asarray(filtered_lrelu(x, fu, fd, None, mode="conv", **kw))
    got = np.asarray(filtered_lrelu(x, fu, fd, None, mode="mmfuse3", **kw))
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("fused_bwd", [False, True])
def test_gradients_match_matmul_path(monkeypatch, fused_bwd):
    """Both VJP paths: the channels-middle einsum backward and the FULLY
    fused Pallas backward (cotangent leaves the kernel already in t1's own
    layout — no outside transpose)."""
    if fused_bwd:
        from image_compression_2_tpu.ops import flrelu_policy as fp

        monkeypatch.setattr(fp, "FORCE_PALLAS_ON_CPU", True)
        calls = []
        real = wf3._build_bwd_call.__wrapped__

        def spy(*a, **k):
            calls.append(1)
            return real(*a, **k)

        wf3._build_bwd_call.cache_clear()
        monkeypatch.setattr(wf3, "_build_bwd_call", spy)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 12, 12, 64).astype(np.float32))
    b = jnp.asarray(rng.randn(64).astype(np.float32))
    fu, fd = _filters(12, 12)
    # tight clamp so the clamp-mask branch of the VJP is exercised
    kw = dict(up=2, down=2, padding=(9, 8, 8, 9), clamp=1.5)

    def loss(mode):
        def f(x, b):
            o = filtered_lrelu(x, fu, fd, b, mode=mode, **kw)
            return jnp.sum(o * o)
        return f

    g_ref = jax.grad(loss("matmul"), argnums=(0, 1))(x, b)
    g_got = jax.grad(loss("mmfuse3"), argnums=(0, 1))(x, b)
    for a, c in zip(g_ref, g_got):
        np.testing.assert_allclose(np.asarray(c), np.asarray(a),
                                   rtol=1e-3, atol=1e-3)
    if fused_bwd:
        assert calls, "fused backward kernel was not used"
