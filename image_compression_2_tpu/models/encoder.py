"""Hierarchical VGG-VAE encoder family (image -> W+ latents).

TPU-native re-design of the reference encoders:
- ``HVAEEncoder``  ≙ ``HVAE_VGG_Encoder`` (/root/reference/stylegan3_hvae_full.py:29-167):
  a log2(res) pyramid of VGG blocks with per-resolution channel schedule,
  feature taps at blocks (1, 4, last), three variational projector heads
  splitting ``num_ws`` per ``block_split`` into global/medium/fine W-vectors.
- ``SimpleEncoder`` ≙ simple_stylegan_encoder.py:23-90: a strided CNN + MLP
  producing a flat (non-variational) W+.

Design differences from the reference (deliberate, documented):
- All shapes static at trace time: the block loop, pooling guards, and taps
  resolve while tracing, so XLA sees a fixed program (the reference decides
  per-batch with Python ifs and debug prints, stylegan3_hvae_full.py:121-146).
- No runtime re-creation of mismatched Linear layers (the reference
  silently swaps ``fc1`` when channels mismatch, breaking optimizer state —
  stylegan3_hvae_full.py:226-230); here a mismatch is a shape error.
- Reparameterisation takes an explicit rng: ``sample_key=None`` means
  deterministic (w = mean), keeping every apply pure and jit-stable.
- NHWC activations; GroupNorm eps 1e-5 (torch parity).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core.config import EncoderConfig


def _lrelu(x):
    return jax.nn.leaky_relu(x, 0.2)


class VGGBlock(nn.Module):
    """conv3x3 -> GN -> lrelu, twice, then 2x2 average pool (if size >= 2).

    ``dtype``: activation compute dtype (params stay fp32). bf16 halves the
    HBM traffic of the full-resolution blocks, which dominate encoder time."""

    out_channels: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(self.out_channels, (3, 3), padding="SAME", name="conv1",
                    dtype=self.dtype)(x)
        x = nn.GroupNorm(
            num_groups=min(32, self.out_channels), epsilon=1e-5, name="norm1",
            dtype=self.dtype,
        )(x)
        x = _lrelu(x)
        x = nn.Conv(self.out_channels, (3, 3), padding="SAME", name="conv2",
                    dtype=self.dtype)(x)
        x = nn.GroupNorm(
            num_groups=min(32, self.out_channels), epsilon=1e-5, name="norm2",
            dtype=self.dtype,
        )(x)
        x = _lrelu(x)
        if x.shape[1] > 1 and x.shape[2] > 1:  # static at trace time
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        return x


class HierarchyProjector(nn.Module):
    """Pool -> MLP -> (mean, logvar) for a block of W-vectors.

    ``pool_grid`` = 1 reproduces the reference's globally-pooled head
    (/root/reference/stylegan3_hvae_full.py:194-247: AdaptiveAvgPool2d(1)).
    ``pool_grid`` = G > 1 pools to a GxG spatial grid instead and feeds the
    flattened grid to the MLP — a config-gated generalisation that removes
    the global-pool information bottleneck (the round-2 held-out quality
    plateau was traced to it) while keeping the head a pure static-shape
    MLP (one big MXU matmul; no dynamic shapes)."""

    w_dim: int
    num_ws: int
    hidden_dim: int = 256
    pool_grid: int = 1

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, sample_key: Optional[jax.Array] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        batch = x.shape[0]
        h, w = x.shape[1], x.shape[2]
        g = min(self.pool_grid, h, w)
        if g <= 1:
            x = jnp.mean(x, axis=(1, 2))  # adaptive average pool to 1x1
        else:
            # adaptive average pool to g x g; the VGG pyramid keeps spatial
            # dims powers of two, so the grid divides evenly (asserted)
            assert h % g == 0 and w % g == 0, (x.shape, g)
            x = x.reshape(batch, g, h // g, g, w // g, x.shape[-1])
            x = x.mean(axis=(2, 4)).reshape(batch, g * g * x.shape[-1])
        x = x.astype(jnp.float32)     # variational heads always fp32
        x = _lrelu(nn.Dense(self.hidden_dim, name="fc1")(x))
        p = nn.Dense(self.num_ws * self.w_dim * 2, name="fc2")(x)
        p = p.reshape(batch, self.num_ws, self.w_dim * 2)
        mean, logvar = jnp.split(p, 2, axis=2)
        if sample_key is None:
            w = mean
        else:
            std = jnp.exp(0.5 * logvar)
            w = mean + std * jax.random.normal(sample_key, std.shape, std.dtype)
        return w, mean, logvar


class HVAEEncoder(nn.Module):
    """image [B,H,W,C] in [-1,1] -> (w_plus, means, logvars), each
    [B, num_ws, w_dim] fp32.

    ``compute_dtype``: optional bf16 for the conv pyramid (projector heads and
    the variational outputs stay fp32)."""

    cfg: EncoderConfig
    compute_dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, sample_key: Optional[jax.Array] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        assert x.shape[-1] == cfg.img_channels, x.shape
        channels = cfg.channels

        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        x = nn.Conv(channels[0], (3, 3), padding="SAME", name="from_rgb",
                    dtype=self.compute_dtype)(x)

        taps = {}
        n = cfg.num_blocks
        for i in range(n):
            if x.shape[1] <= 1 or x.shape[2] <= 1:  # static guard
                break
            out_ch = channels[i + 1] if i < n - 1 else channels[i]
            x = VGGBlock(out_ch, dtype=self.compute_dtype, name=f"block{i}")(x)
            if i == cfg.fine_block:
                taps["fine"] = x
            elif i == cfg.medium_block:
                taps["medium"] = x
        taps["global"] = x
        taps.setdefault("fine", x)
        taps.setdefault("medium", x)

        keys = (
            jax.random.split(sample_key, 3) if sample_key is not None else (None,) * 3
        )
        grids = cfg.pool_grids
        hiddens = cfg.resolved_hidden_dims
        g_w, g_m, g_lv = HierarchyProjector(
            cfg.w_dim, cfg.num_ws_global, hiddens[0], grids[0],
            name="global_projector"
        )(taps["global"], keys[0])
        m_w, m_m, m_lv = HierarchyProjector(
            cfg.w_dim, cfg.num_ws_medium, hiddens[1], grids[1],
            name="medium_projector"
        )(taps["medium"], keys[1])
        f_w, f_m, f_lv = HierarchyProjector(
            cfg.w_dim, cfg.num_ws_fine, hiddens[2], grids[2],
            name="fine_projector"
        )(taps["fine"], keys[2])

        w_plus = jnp.concatenate([g_w, m_w, f_w], axis=1)
        means = jnp.concatenate([g_m, m_m, f_m], axis=1)
        logvars = jnp.concatenate([g_lv, m_lv, f_lv], axis=1)
        return w_plus, means, logvars


class SimpleEncoder(nn.Module):
    """Minimal strided-CNN encoder producing a flat deterministic W+
    (reference ``simple_stylegan_encoder.SimpleEncoder``)."""

    w_dim: int = 512
    num_ws: int = 16
    base_channels: int = 32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ch = self.base_channels
        while x.shape[1] > 1:
            x = nn.Conv(min(ch, 512), (3, 3), strides=(2, 2), padding="SAME")(x)
            x = _lrelu(x)
            ch *= 2
        x = x.reshape(x.shape[0], -1)
        x = _lrelu(nn.Dense(512)(x))
        x = nn.Dense(self.num_ws * self.w_dim)(x)
        return x.reshape(x.shape[0], self.num_ws, self.w_dim)
