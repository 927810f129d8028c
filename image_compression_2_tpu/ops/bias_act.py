"""Fused bias + activation + gain + clamp.

The reference's decoder relies on StyleGAN3's ``bias_act`` CUDA extension; on
TPU a plain jnp expression suffices — XLA fuses the whole chain into the
surrounding convolution epilogue, so no custom kernel is needed for this op.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

_SQRT2 = float(np.sqrt(2.0))

# act name -> (fn, default_gain)
_ACTS = {
    "linear": (lambda x, alpha: x, 1.0),
    "relu": (lambda x, alpha: jnp.maximum(x, 0.0), _SQRT2),
    "lrelu": (lambda x, alpha: jnp.where(x >= 0, x, x * alpha), _SQRT2),
    "tanh": (lambda x, alpha: jnp.tanh(x), 1.0),
    "sigmoid": (lambda x, alpha: jnp.reciprocal(1.0 + jnp.exp(-x)), 1.0),
}


def bias_act(
    x: jnp.ndarray,
    b: Optional[jnp.ndarray] = None,
    act: str = "linear",
    alpha: float = 0.2,
    gain: Optional[float] = None,
    clamp: Optional[float] = None,
) -> jnp.ndarray:
    """``clamp(gain * act(x + b))`` with the bias broadcast over the channel
    (last) axis. ``gain=None`` uses the activation's variance-preserving
    default; ``clamp=None`` disables clamping."""
    fn, def_gain = _ACTS[act]
    if gain is None:
        gain = def_gain
    if b is not None:
        x = x + b.astype(x.dtype)
    x = fn(x, alpha)
    if gain != 1.0:
        x = x * jnp.asarray(gain, dtype=x.dtype)
    if clamp is not None:
        x = jnp.clip(x, -clamp, clamp)
    return x
