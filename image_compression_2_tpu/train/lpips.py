"""LPIPS-style perceptual distance on VGG16 features, in JAX.

The reference uses the ``lpips`` pip package with pretrained VGG weights
(/root/reference/stylegan3_hvae_full.py:490).  Pretrained weights cannot be
downloaded in this environment, so this module provides:

- the exact LPIPS computation graph (VGG16 conv stack, unit-normalised feature
  differences at the 5 canonical taps, per-channel linear weighting, spatial
  mean) as a flax module;
- ``import_lpips_state`` (see ``compat.torch_import``) to load real LPIPS/VGG
  weights from a torch checkpoint when one is supplied.  The import path and
  this graph are verified to <1e-5 against an inline torch implementation of
  the lpips package's computation on random VGG16+lin weights
  (tests/test_compat.py::test_lpips_matches_torch_graph); pretrained weights
  would flow through the identical path but are not downloadable here;
- a deterministic random-feature fallback init: random VGG filters still yield
  a useful multi-scale structural distance (random-feature perceptual metrics
  are a known-good approximation), and the training loss semantics/weights
  stay identical, so curves remain comparable in shape.

Input convention: NHWC images in [-1, 1] (LPIPS's native input range).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

# VGG16 feature config: (#convs, channels) per stage; taps after each stage.
_VGG_STAGES: Tuple[Tuple[int, int], ...] = (
    (2, 64), (2, 128), (3, 256), (3, 512), (3, 512)
)

# ImageNet normalisation used by LPIPS's "scaling layer" (shift/scale on
# [-1,1] inputs).
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    """VGG16 conv trunk; returns the 5 relu tap activations."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Sequence[jnp.ndarray]:
        taps = []
        for si, (n_convs, ch) in enumerate(_VGG_STAGES):
            for ci in range(n_convs):
                x = nn.Conv(ch, (3, 3), padding="SAME", name=f"conv{si}_{ci}")(x)
                x = nn.relu(x)
            taps.append(x)
            if si < len(_VGG_STAGES) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return taps


class LPIPS(nn.Module):
    """Learned perceptual distance: sum_l mean_hw( w_l · (f̂_l(x)-f̂_l(y))² )."""

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)
        vgg = VGG16Features(name="vgg")
        fx = vgg((x - shift) / scale)
        fy = vgg((y - shift) / scale)

        total = 0.0
        for li, (a, b) in enumerate(zip(fx, fy)):
            a = a * jax.lax.rsqrt(jnp.sum(jnp.square(a), axis=-1, keepdims=True) + 1e-10)
            b = b * jax.lax.rsqrt(jnp.sum(jnp.square(b), axis=-1, keepdims=True) + 1e-10)
            diff = jnp.square(a - b)
            # per-channel linear head (LPIPS "lin" layers): non-negative weights
            w = self.param(
                f"lin{li}",
                nn.initializers.constant(1.0 / diff.shape[-1]),
                (diff.shape[-1],),
                jnp.float32,
            )
            total = total + jnp.mean(
                jnp.sum(diff * jnp.abs(w), axis=-1), axis=(1, 2)
            )
        return total  # [B]


def create_lpips(seed: int = 0, image_size: int = 64):
    """Build LPIPS apply fn + variables (random-feature fallback unless
    weights are imported over them)."""
    model = LPIPS()
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(seed),
        jnp.zeros([1, image_size, image_size, 3]),
        jnp.zeros([1, image_size, image_size, 3]),
    )

    def apply_fn(variables, x, y):
        return model.apply(variables, x, y)

    return model, variables, apply_fn
