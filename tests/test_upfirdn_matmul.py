"""Matmul-path upfirdn: golden equality vs the conv path."""

import numpy as np
import pytest

import jax.numpy as jnp

from image_compression_2_tpu.ops import (
    design_lowpass_filter,
    filtered_lrelu,
    upfirdn2d,
)
from image_compression_2_tpu.ops.upfirdn_matmul import fir_matrix, upfirdn2d_mm


@pytest.mark.parametrize("up,down,pad", [
    (1, 1, (0, 0, 0, 0)),
    (2, 1, (3, 2, 3, 2)),
    (1, 2, (2, 2, 2, 2)),
    (4, 2, (9, 8, 8, 9)),
    (2, 2, (-1, 4, 4, -1)),
])
def test_matmul_matches_conv_path(up, down, pad):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 13, 11, 5).astype(np.float32))
    f = design_lowpass_filter(numtaps=6 * max(up, 1), cutoff=0.3, width=0.3,
                              fs=2.0 * up)
    a = np.asarray(upfirdn2d(x, f, up=up, down=down, padding=pad, gain=1.3))
    b = np.asarray(upfirdn2d_mm(x, f, up=up, down=down, padding=pad, gain=1.3))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_fir_matrix_identity():
    A = fir_matrix(np.ones([1], np.float32), 7)
    np.testing.assert_array_equal(A, np.eye(7, dtype=np.float32))


def test_filtered_lrelu_modes_agree():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 9, 9, 4).astype(np.float32))
    b = jnp.asarray(rng.randn(4).astype(np.float32))
    fu = design_lowpass_filter(8, 0.4, 0.4, 4.0)
    fd = design_lowpass_filter(8, 0.4, 0.4, 4.0)
    kw = dict(up=2, down=2, padding=(6, 5, 5, 6))
    a = np.asarray(filtered_lrelu(x, fu, fd, b, mode="conv", **kw))
    m = np.asarray(filtered_lrelu(x, fu, fd, b, mode="matmul", **kw))
    au = np.asarray(filtered_lrelu(x, fu, fd, b, mode="auto", **kw))
    np.testing.assert_allclose(a, m, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(m, au)  # auto picks matmul here


def test_filtered_lrelu_sandwich_agrees():
    # sandwich = matmul with the down stage contracting W before H; the two
    # banded operators commute exactly, so outputs must agree to fp rounding
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 11, 9, 3).astype(np.float32))
    b = jnp.asarray(rng.randn(3).astype(np.float32))
    fu = design_lowpass_filter(24, 0.35, 0.4, 8.0)  # up-4 geometry: the case
    fd = design_lowpass_filter(12, 0.35, 0.4, 8.0)  # the sandwich order wins
    kw = dict(up=4, down=2, padding=(9, 8, 8, 9))
    m = np.asarray(filtered_lrelu(x, fu, fd, b, mode="matmul", **kw))
    s = np.asarray(filtered_lrelu(x, fu, fd, b, mode="sandwich", **kw))
    assert m.shape == s.shape
    np.testing.assert_allclose(m, s, rtol=2e-5, atol=2e-5)


def test_upfirdn2d_mm_order_wh_matches_hw():
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 13, 11, 5).astype(np.float32))
    f = design_lowpass_filter(12, 0.3, 0.3, 4.0)
    a = np.asarray(upfirdn2d_mm(x, f, up=2, down=2, padding=(4, 3, 3, 4),
                                gain=1.3))
    b = np.asarray(upfirdn2d_mm(x, f, up=2, down=2, padding=(4, 3, 3, 4),
                                gain=1.3, order="wh"))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)
