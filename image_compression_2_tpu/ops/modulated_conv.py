"""Style-modulated convolution, TPU-first formulation.

The CUDA formulation materialises a per-sample weight tensor and runs a
grouped convolution (one group per batch element).  On TPU that shape defeats
the MXU's weight-stationary tiling, so we use the algebraically identical
input/output-scaling form:

    conv(x, w * s) == conv(x * s, w)                (per-input-channel scale s)
    demod: divide each output channel by ||w * s||  (per-sample, per-out-ch)

which keeps ONE shared weight on the MXU for the whole batch and turns the
modulation into two cheap elementwise scalings that XLA fuses into the conv's
prologue/epilogue.

Semantics notes (kept bit-faithful to the alias-free GAN recipe):
- with ``demodulate``, both the weight (per out-channel, over in/kh/kw) and
  the styles (over the WHOLE [B, C_in] style tensor — a deliberate batch
  coupling in the original) are second-moment pre-normalised;
- demod coefficients use the pre-normalised weights and styles with eps=1e-8;
- ``input_gain`` (the magnitude-EMA correction) scales the input, which
  commutes with everything above.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def modulated_conv2d(
    x: jnp.ndarray,        # [B, H, W, C_in]
    w: jnp.ndarray,        # [kh, kw, C_in, C_out] (HWIO)
    styles: jnp.ndarray,   # [B, C_in]
    demodulate: bool = True,
    padding: int = 0,
    input_gain: Optional[jnp.ndarray] = None,
    fp32_mxu=None,
) -> jnp.ndarray:
    """Per-sample style-modulated conv over NHWC inputs. Returns [B,H',W',C_out]."""
    assert x.ndim == 4 and w.ndim == 4 and styles.ndim == 2
    in_dtype = x.dtype

    w = w.astype(jnp.float32)
    styles = styles.astype(jnp.float32)

    if demodulate:
        # Second-moment pre-normalisation for numerical stability.
        w = w * jax.lax.rsqrt(jnp.mean(jnp.square(w), axis=(0, 1, 2), keepdims=True))
        styles = styles * jax.lax.rsqrt(jnp.mean(jnp.square(styles)))

    in_scale = styles
    if input_gain is not None:
        in_scale = in_scale * jnp.asarray(input_gain, dtype=jnp.float32)

    xs = x * in_scale[:, None, None, :].astype(in_dtype)
    # fp32: force true-fp32 MXU passes. bf16: let the MXU accumulate in fp32
    # internally but keep the output dtype bf16 — requesting an fp32 output
    # from a bf16 conv makes the transpose (grad) conv see mixed dtypes.
    if in_dtype == jnp.float32:
        precision = fp32_mxu if fp32_mxu is not None else jax.lax.Precision.HIGHEST
    else:
        precision = None
    y = jax.lax.conv_general_dilated(
        xs,
        w.astype(in_dtype),
        window_strides=(1, 1),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=in_dtype,
        precision=precision,
    )

    if demodulate:
        # ||w_mod||^2 per (batch, out): sum_i s_i^2 * sum_{kh,kw} w_{..io}^2.
        w_sq = jnp.sum(jnp.square(w), axis=(0, 1))                  # [C_in, C_out]
        norm_sq = jnp.einsum(
            "io,bi->bo", w_sq, jnp.square(styles),
            preferred_element_type=jnp.float32,
        )
        dcoefs = jax.lax.rsqrt(norm_sq + 1e-8)                      # [B, C_out]
        y = y * dcoefs[:, None, None, :]

    return y.astype(in_dtype)
