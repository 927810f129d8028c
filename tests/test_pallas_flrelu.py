"""Fused Pallas filtered-lrelu: golden equality vs the lax reference
(interpret mode on CPU; the compiled path is exercised on real TPU in
verification drives)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_compression_2_tpu.ops import design_lowpass_filter, filtered_lrelu
from image_compression_2_tpu.ops import pallas_flrelu as pf


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    # run the kernel under the Pallas interpreter on the CPU test backend
    import jax.experimental.pallas as pl

    real_call = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return real_call(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp_call)
    pf._build_call.cache_clear()
    yield
    pf._build_call.cache_clear()


def test_fits_vmem_planning():
    assert pf.fits_vmem(38, 38, 512, 2, 2, 12, 12, (9, 8, 8, 9))
    # the 4x-oversampled big layer does not fit
    assert not pf.fits_vmem(150, 150, 256, 4, 2, 24, 12, (50, 50, 50, 50))
    # channels not a multiple of 128 are not legal tiles
    assert not pf.fits_vmem(20, 20, 48, 2, 2, 12, 12, (9, 8, 8, 9))


def test_kernel_matches_reference():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 20, 20, 128).astype(np.float32))
    b = jnp.asarray(rng.randn(128).astype(np.float32))
    fu = design_lowpass_filter(12, 0.4, 0.4, 4.0)
    fd = design_lowpass_filter(12, 0.4, 0.4, 4.0)
    kw = dict(up=2, down=2, padding=(9, 8, 8, 9))
    ref = np.asarray(filtered_lrelu(x, fu, fd, b, mode="conv", **kw))
    got = np.asarray(pf.filtered_lrelu_pallas(x, fu, fd, b, **kw))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_kernel_multi_channel_tiles():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 12, 12, 256).astype(np.float32))
    fu = design_lowpass_filter(8, 0.4, 0.4, 4.0)
    fd = design_lowpass_filter(8, 0.4, 0.4, 4.0)
    kw = dict(up=2, down=2, padding=(6, 5, 5, 6))
    ref = np.asarray(filtered_lrelu(x, fu, fd, None, mode="conv", **kw))
    got = np.asarray(pf.filtered_lrelu_pallas(x, fu, fd, None, **kw))
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)
