"""Image quality metrics (PSNR / SSIM / MS-SSIM) as pure-jnp functions.

Replaces the reference's skimage dependency (hvae_training.py:381-395) with
device-side implementations: SSIM per Wang et al. 2004 (11-tap Gaussian
window, σ=1.5, K1=0.01, K2=0.03), MS-SSIM per Wang et al. 2003 with the
canonical 5-scale weights.  NHWC inputs; ``data_range`` is explicit.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def psnr(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 2.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB over the full batch."""
    mse = jnp.mean(jnp.square(a.astype(jnp.float32) - b.astype(jnp.float32)))
    return 10.0 * jnp.log10((data_range ** 2) / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - (size - 1) / 2
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _filter2d(x: jnp.ndarray, k1d: np.ndarray) -> jnp.ndarray:
    """Separable valid-mode Gaussian filtering, depthwise over channels."""
    c = x.shape[-1]
    ky = jnp.asarray(k1d)[:, None, None, None] * jnp.ones([1, 1, 1, c])
    kx = jnp.asarray(k1d)[None, :, None, None] * jnp.ones([1, 1, 1, c])
    dn = ("NHWC", "HWIO", "NHWC")
    x = jax.lax.conv_general_dilated(x, ky, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c)
    x = jax.lax.conv_general_dilated(x, kx, (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=c)
    return x


def _ssim_components(a, b, data_range, size=11, sigma=1.5):
    k = _gaussian_kernel(size, sigma)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    mu_a = _filter2d(a, k)
    mu_b = _filter2d(b, k)
    mu_aa = mu_a * mu_a
    mu_bb = mu_b * mu_b
    mu_ab = mu_a * mu_b
    var_a = _filter2d(a * a, k) - mu_aa
    var_b = _filter2d(b * b, k) - mu_bb
    cov = _filter2d(a * b, k) - mu_ab
    lum = (2 * mu_ab + c1) / (mu_aa + mu_bb + c1)
    cs = (2 * cov + c2) / (var_a + var_b + c2)
    return lum, cs


def ssim(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 2.0) -> jnp.ndarray:
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    lum, cs = _ssim_components(a, b, data_range)
    return jnp.mean(lum * cs)


def ms_ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    data_range: float = 2.0,
    weights=_MSSSIM_WEIGHTS,
) -> jnp.ndarray:
    """Multi-scale SSIM; needs input >= 11 * 2^(scales-1) pixels (176 for 5
    scales — at 256² all five scales are valid)."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    n_scales = len(weights)
    vals = []
    for i in range(n_scales):
        lum, cs = _ssim_components(a, b, data_range)
        if i < n_scales - 1:
            vals.append(jnp.mean(jnp.maximum(cs, 0.0)))
            a = jax.lax.reduce_window(
                a, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
            b = jax.lax.reduce_window(
                b, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            ) / 4.0
        else:
            vals.append(jnp.mean(jnp.maximum(lum * cs, 0.0)))
    total = jnp.ones([])
    for v, w in zip(vals, weights):
        total = total * (v ** w)
    return total


def bits_per_pixel(comp_size_bytes: float, height: int, width: int) -> float:
    """bpp with the reference's formula (hvae_training.py:356-359)."""
    return comp_size_bytes * 8.0 / (height * width)
