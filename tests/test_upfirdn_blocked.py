"""Block-banded FIR matmul (ops/upfirdn_blocked.py) parity + plan economics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_compression_2_tpu.ops.upfirdn_blocked import (
    block_plan,
    upfirdn2d_mm_blocked,
)
from image_compression_2_tpu.ops.upfirdn_matmul import fir_matrix, upfirdn2d_mm
from image_compression_2_tpu.ops import design_lowpass_filter


def _filt(taps):
    return design_lowpass_filter(numtaps=taps, cutoff=0.3, width=0.4, fs=2.0)


@pytest.mark.parametrize("H,up,down,taps,pad", [
    (276, 2, 1, 12, 5),         # flagship up-2 layer shape
    (532, 1, 2, 12, 3),         # flagship down-2
    (148, 2, 2, 12, (4, 5, 4, 5)),
    (300, 4, 2, 24, 7),         # 1024-tail up-4
    (64, 2, 1, 12, 5),          # small plane: plan degrades to dense
])
def test_blocked_matches_dense(H, up, down, taps, pad):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, H, H // 2 * 2, 24), jnp.float32)
    f = _filt(taps)
    want = upfirdn2d_mm(x, f, up=up, down=down, padding=pad, gain=up ** 2)
    for order in ("hw", "wh"):
        got = upfirdn2d_mm_blocked(x, f, up=up, down=down, padding=pad,
                                   gain=up ** 2, order=order)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_blocked_gradients_match_dense():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 148, 148, 8), jnp.float32)
    f = _filt(12)

    def loss(fn):
        return lambda x: jnp.sum(
            jnp.sin(fn(x, f, up=2, down=1, padding=5, gain=4.0)))

    g_dense = jax.grad(loss(upfirdn2d_mm))(x)
    g_block = jax.grad(loss(upfirdn2d_mm_blocked))(x)
    np.testing.assert_allclose(np.asarray(g_block), np.asarray(g_dense),
                               rtol=2e-5, atol=2e-5)


def test_block_plan_economics():
    """The plan triggers exactly when it saves MACs, and the saving on the
    1044-plane flagship geometries is the advertised >3x."""
    f = _filt(12)
    # 1024 flagship: 532 -> 1064-ish up-2
    A = fir_matrix(f, 532, up=2, down=1, pad_lo=5, pad_hi=5, gain=4.0)
    plan = block_plan(A, 128)
    assert plan is not None
    blocks, col0 = plan
    nb, P, win = blocks.shape
    dense_macs = A.shape[0] * A.shape[1]
    blocked_macs = nb * P * win
    assert blocked_macs * 3 < dense_macs, (blocked_macs, dense_macs)
    # windows stay inside the input and ascend with the band
    assert (col0 >= 0).all() and (col0 + win <= A.shape[1]).all()
    assert (np.diff(col0) >= 0).all()
    # tiny operator: no plan (dense already optimal)
    A_small = fir_matrix(f, 48, up=2, down=1, pad_lo=5, pad_hi=5)
    assert block_plan(A_small, 128) is None


def test_filtered_lrelu_blocked_mode_matches_matmul():
    from image_compression_2_tpu.ops import filtered_lrelu

    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 148, 148, 16), jnp.float32)
    b = jnp.asarray(rng.randn(16), jnp.float32)
    fu = _filt(12)
    fd = _filt(12)
    want = filtered_lrelu(x, fu, fd, b, up=2, down=2, padding=(4, 5, 4, 5),
                          mode="matmul")
    got = filtered_lrelu(x, fu, fd, b, up=2, down=2, padding=(4, 5, 4, 5),
                         mode="blocked")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
