"""Shared building-block layers (lr-equalized linear, 2nd-moment normalize)."""

from __future__ import annotations

from typing import Sequence, Union

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.bias_act import bias_act


def normalize_2nd_moment(x: jnp.ndarray, axis: int = -1, eps: float = 1e-8):
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


class EqualLinear(nn.Module):
    """Learning-rate-equalized fully connected layer.

    Parameters are stored at unit scale and multiplied by
    ``lr_multiplier / sqrt(fan_in)`` at run time, so that per-parameter Adam
    updates have uniform relative magnitude — the trick StyleGAN's mapping
    network depends on (the reference consumes it inside the frozen pickle's
    ``G.mapping``; here it is a first-class module).
    """

    features: int
    activation: str = "linear"  # 'linear' | 'lrelu'
    lr_multiplier: float = 1.0
    weight_init: float = 1.0
    bias_init: Union[float, Sequence[float]] = 0.0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        w = self.param(
            "weight",
            nn.initializers.normal(stddev=self.weight_init / self.lr_multiplier)
            if self.weight_init != 0
            else nn.initializers.zeros,
            (self.features, in_features),
            jnp.float32,
        )
        weight_gain = self.lr_multiplier / np.sqrt(in_features)
        y = jnp.matmul(
            x,
            (w * weight_gain).T.astype(x.dtype),
            precision=jax.lax.Precision.HIGHEST
            if x.dtype == jnp.float32
            else None,
        )
        b = None
        if self.use_bias:
            bias_init = np.broadcast_to(
                np.asarray(self.bias_init, dtype=np.float32), (self.features,)
            )
            b = self.param(
                "bias",
                lambda key: jnp.asarray(bias_init / self.lr_multiplier),
            )
            b = b * self.lr_multiplier
        if self.activation == "linear":
            return y + b.astype(y.dtype) if b is not None else y
        return bias_act(y, b, act=self.activation)
