"""Alias-free StyleGAN3-T generator, TPU-native (flax + lax/Pallas ops, NHWC).

Re-designed from the alias-free GAN recipe to provide the decoder capability
the reference obtains by unpickling a frozen NVlabs network
(``/root/reference/stylegan3_hvae_full.py:453-455``) and calling
``G.mapping`` / ``G.synthesis``
(``/root/reference/stylegan3_hvae_full.py:557-558,274``).  All shapes, FIR
filters and paddings are static compile-time constants (see
``core.config.GeneratorConfig``); activations are NHWC; the high-resolution
layers optionally run in bfloat16 (the TPU analogue of the reference's fp16
CUDA layers) while filters and the Fourier input stay fp32.

Public surface mirrors the reference generator API:
    Generator.apply(vars, z)                      -> image  (G(z, None))
    Generator.apply(vars, z, method='mapping')    -> ws     (G.mapping)
    Generator.apply(vars, ws, method='synthesis') -> image  (G.synthesis)
    plus attributes img_resolution / img_channels / w_dim / num_ws / z_dim
    via the config, and the w_avg buffer in the 'buffers' collection
    (the reference reads G.mapping.w_avg, stylegan3_hvae_full.py:626).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..core.config import GeneratorConfig, Precision, SynthesisLayerSpec
from ..ops import design_lowpass_filter, filtered_lrelu, modulated_conv2d
from .layers import EqualLinear, normalize_2nd_moment


class MappingNetwork(nn.Module):
    """z -> w (lr-equalized MLP) with moving-average truncation support.

    ``c`` carries optional class-conditioning labels, matching the reference
    surface ``G.mapping(z, c, ...)`` (stylegan3_hvae_full.py:557 — always
    called with ``c=None`` for FFHQ): when ``cfg.c_dim > 0`` the labels are
    embedded, 2nd-moment-normalized, and concatenated to the normalized z
    before the MLP (the StyleGAN3 conditional recipe).  ``c`` is
    keyword-only-by-position here (after the truncation args) so existing
    positional callers keep working."""

    cfg: GeneratorConfig

    @nn.compact
    def __call__(
        self,
        z: jnp.ndarray,
        truncation_psi: float = 1.0,
        truncation_cutoff: Optional[int] = None,
        update_w_avg: bool = False,
        c: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.cfg
        assert z.shape[-1] == cfg.z_dim
        x = normalize_2nd_moment(z.astype(jnp.float32))
        if cfg.c_dim:
            if c is None:
                raise ValueError(
                    f"c_dim={cfg.c_dim}: mapping requires class labels c")
            y = EqualLinear(cfg.w_dim, name="embed")(
                c.astype(jnp.float32))
            x = jnp.concatenate([x, normalize_2nd_moment(y)], axis=-1)
        elif c is not None:
            raise ValueError("class labels given but cfg.c_dim == 0 "
                             "(unconditional model)")
        for i in range(cfg.mapping_layers):
            x = EqualLinear(
                cfg.w_dim,
                activation="lrelu",
                lr_multiplier=cfg.mapping_lr_multiplier,
                name=f"fc{i}",
            )(x)

        w_avg = self.variable(
            "buffers", "w_avg", lambda: jnp.zeros([cfg.w_dim], jnp.float32)
        )
        if update_w_avg and not self.is_initializing():
            w_avg.value = w_avg.value + (1 - cfg.w_avg_beta) * (
                jnp.mean(x, axis=0) - w_avg.value
            )

        ws = jnp.repeat(x[:, None, :], cfg.num_ws, axis=1)
        if truncation_psi != 1.0:
            truncated = w_avg.value + truncation_psi * (ws - w_avg.value)
            if truncation_cutoff is None:
                ws = truncated
            else:
                layer_idx = np.arange(cfg.num_ws)[None, :, None]
                ws = jnp.where(layer_idx < truncation_cutoff, truncated, ws)
        return ws


class SynthesisInput(nn.Module):
    """Transform-equivariant Fourier-feature input plane."""

    cfg: GeneratorConfig

    @nn.compact
    def __call__(self, w: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        channels = cfg.input_channels
        size = cfg.input_size
        sampling_rate = cfg.input_sampling_rate
        bandwidth = cfg.input_bandwidth

        def _init_freqs(key):
            f = jax.random.normal(key, (channels, 2))
            radii = jnp.sqrt(jnp.sum(jnp.square(f), axis=1, keepdims=True))
            # Uniform-ish radial density concentrated inside the bandwidth.
            f = f / (radii * jnp.power(jnp.exp(jnp.square(radii)), 0.25))
            return f * bandwidth

        freqs = self.variable(
            "buffers",
            "freqs",
            lambda: _init_freqs(self.make_rng("params")),
        ).value
        phases = self.variable(
            "buffers",
            "phases",
            lambda: jax.random.uniform(self.make_rng("params"), (channels,)) - 0.5,
        ).value
        # User-controllable global transform (eye = identity); kept as a buffer
        # so equivariance demos can rotate/translate the canvas.
        transform = self.variable(
            "buffers", "transform", lambda: jnp.eye(3, dtype=jnp.float32)
        ).value

        weight = self.param(
            "weight", nn.initializers.normal(1.0), (channels, channels), jnp.float32
        )
        # Per-sample affine (rotation+translation), identity at init.
        t = EqualLinear(4, weight_init=0.0, bias_init=(1, 0, 0, 0), name="affine")(
            w.astype(jnp.float32)
        )
        t = t / jnp.linalg.norm(t[:, :2], axis=1, keepdims=True)

        batch = w.shape[0]
        zeros = jnp.zeros([batch])
        ones = jnp.ones([batch])
        # Inverse rotation followed by inverse translation, then the global
        # transform: m_r @ m_t @ transform.
        m_r = jnp.stack(
            [
                jnp.stack([t[:, 0], -t[:, 1], zeros], axis=1),
                jnp.stack([t[:, 1], t[:, 0], zeros], axis=1),
                jnp.stack([zeros, zeros, ones], axis=1),
            ],
            axis=1,
        )
        m_t = jnp.broadcast_to(jnp.eye(3), (batch, 3, 3))
        m_t = m_t.at[:, 0, 2].set(-t[:, 2]).at[:, 1, 2].set(-t[:, 3])
        transforms = jnp.einsum("bij,bjk,kl->bil", m_r, m_t, transform)

        # Transform frequencies/phases per sample.
        ph = phases[None, :] + jnp.einsum("cf,bf->bc", freqs, transforms[:, :2, 2])
        fr = jnp.einsum("cf,bfg->bcg", freqs, transforms[:, :2, :2])
        # Dampen frequencies pushed outside the band by the transform.
        amplitudes = jnp.clip(
            1
            - (jnp.linalg.norm(fr, axis=2) - bandwidth)
            / (sampling_rate / 2 - bandwidth),
            0,
            1,
        )

        # Sampling grid: pixel centres in canvas units (align_corners=False).
        theta = 0.5 * size / sampling_rate
        coords = (np.arange(size) + 0.5) / size * 2 - 1  # (-1, 1) pixel centres
        gx = jnp.asarray(theta * coords, jnp.float32)
        gy = jnp.asarray(theta * coords, jnp.float32)

        # sin(2π (x·fx + y·fy + φ)) — outer-product structure evaluated as
        # broadcasted adds (cheap on the VPU, fuses with the matmul below).
        arg = (
            gx[None, None, :, None] * fr[:, None, None, :, 0]
            + gy[None, :, None, None] * fr[:, None, None, :, 1]
            + ph[:, None, None, :]
        )
        feats = jnp.sin(arg * (2 * np.pi)) * amplitudes[:, None, None, :]

        # Trainable channel mixing on the MXU.
        x = jnp.einsum(
            "bhwc,dc->bhwd",
            feats,
            weight / np.sqrt(channels),
            precision=jax.lax.Precision.HIGHEST,
        )
        return x  # [B, size, size, channels]


class SynthesisLayer(nn.Module):
    """modulated conv (full) -> filtered lrelu resampling chain."""

    spec: SynthesisLayerSpec
    cfg: GeneratorConfig
    precision: Precision = Precision()

    @nn.compact
    def __call__(self, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        spec = self.spec
        styles = EqualLinear(spec.in_channels, bias_init=1.0, name="affine")(
            w.astype(jnp.float32)
        )
        if spec.is_torgb:
            styles = styles * (
                1.0 / np.sqrt(spec.in_channels * spec.conv_kernel ** 2)
            )

        weight = self.param(
            "weight",
            nn.initializers.normal(1.0),
            (spec.conv_kernel, spec.conv_kernel, spec.in_channels, spec.out_channels),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (spec.out_channels,), jnp.float32)
        # Running estimate of input magnitude (kept from training); its inverse
        # sqrt pre-scales the conv input exactly like the reference decoder.
        magnitude_ema = self.variable(
            "buffers", "magnitude_ema", lambda: jnp.ones([], jnp.float32)
        ).value
        input_gain = jax.lax.rsqrt(magnitude_ema)

        # Layers whose output sampling rate is within 2**num_lowprec_res of
        # the final resolution run in the low-precision compute dtype (the
        # TPU analogue of the reference decoder's fp16 high-res layers);
        # num_lowprec_res >= 16 puts the whole network in bf16.
        lowprec = (
            spec.out_sampling_rate * (2 ** self.precision.num_lowprec_res)
            > self.cfg.img_resolution
        )
        dtype = (
            self.precision.compute_dtype
            if (lowprec and self.precision.mixed)
            else jnp.float32
        )
        up_filter = design_lowpass_filter(
            numtaps=spec.up_taps,
            cutoff=spec.in_cutoff,
            width=spec.in_half_width * 2,
            fs=spec.tmp_sampling_rate,
        )
        down_filter = design_lowpass_filter(
            numtaps=spec.down_taps,
            cutoff=spec.out_cutoff,
            width=spec.out_half_width * 2,
            fs=spec.tmp_sampling_rate,
            radial=spec.down_radial,
        )
        gain = 1.0 if spec.is_torgb else float(np.sqrt(2.0))
        slope = 1.0 if spec.is_torgb else 0.2

        # Whole-layer fusion: when the measured policy says the single-kernel
        # conv+flrelu path (`ops/pallas_layerfuse`) wins this geometry, the
        # conv output and the 2x-oversampled activation never touch HBM.
        # Forward-path only (the policy gate returns False while training),
        # never under a model-axis mesh (the conv couples all input
        # channels, so there is no collective-free channel shard_map).
        if (
            not spec.is_torgb
            and (spec.up_factor > 1 or spec.down_factor > 1)
            and np.ndim(up_filter) == 1
            and np.ndim(down_filter) == 1
        ):
            from ..ops.filtered_lrelu import _mesh_axis_sizes
            from ..ops.flrelu_policy import layer_fused
            from ..ops.pallas_layerfuse import (fits_layerfuse,
                                                fused_synthesis_layer)

            B, H, W = x.shape[0], x.shape[1], x.shape[2]
            args = (B, H, W, spec.in_channels, spec.out_channels,
                    spec.conv_kernel, spec.up_factor, spec.down_factor,
                    spec.up_taps, spec.down_taps, spec.padding)
            # the policy records the exact winning channel tile; -1 = legacy
            # bare entry (let the plan's estimate pick); the sweep runs in
            # the deployment dtype (bf16), so other dtypes stay unfused
            ct = (layer_fused(*args)
                  if (_mesh_axis_sizes() == (1, 1)
                      and dtype == jnp.bfloat16) else None)
            if ct is not None and fits_layerfuse(
                    *args, dtype=dtype, ct=None if ct == -1 else ct):
                x = fused_synthesis_layer(
                    x.astype(dtype), weight, styles, bias,
                    up_filter, down_filter,
                    up=spec.up_factor, down=spec.down_factor,
                    padding=spec.padding, input_gain=input_gain,
                    gain=gain, slope=slope, clamp=self.cfg.conv_clamp,
                    ct=None if ct == -1 else ct,
                )
                assert x.shape[1] == spec.out_size and x.shape[3] == spec.out_channels
                return x

        x = modulated_conv2d(
            x.astype(dtype),
            weight,
            styles,
            demodulate=not spec.is_torgb,
            padding=spec.conv_kernel - 1,
            input_gain=input_gain,
            fp32_mxu=self.precision.fp32_mxu,
        )
        x = filtered_lrelu(
            x,
            up_filter,
            down_filter,
            bias,
            up=spec.up_factor,
            down=spec.down_factor,
            padding=spec.padding,
            gain=gain,
            slope=slope,
            clamp=self.cfg.conv_clamp,
            fp32_mxu=self.precision.fp32_mxu,
        )
        assert x.shape[1] == spec.out_size and x.shape[3] == spec.out_channels, (
            x.shape,
            spec,
        )
        return x


class SynthesisNetwork(nn.Module):
    """ws [B, num_ws, w_dim] -> image [B, res, res, channels] in [-1, 1]."""

    cfg: GeneratorConfig
    precision: Precision = Precision()

    @nn.compact
    def __call__(self, ws: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        assert ws.shape[1:] == (cfg.num_ws, cfg.w_dim), ws.shape
        ws = ws.astype(jnp.float32)
        # spatial sharding (no-op without a 'space' mesh axis): constrain the
        # H axis at every layer boundary; XLA propagates through the layer
        # internals and inserts the collectives (parallel/sp.py)
        from ..parallel.sp import shard_spatial

        x = shard_spatial(SynthesisInput(cfg, name="input")(ws[:, 0]))
        for i, spec in enumerate(cfg.layer_specs):
            x = SynthesisLayer(spec, cfg, self.precision, name=spec.name)(
                x, ws[:, i + 1]
            )
            x = shard_spatial(x)
        if cfg.output_scale != 1.0:
            x = x * cfg.output_scale
        return x.astype(jnp.float32)


class Generator(nn.Module):
    """Full generator: mapping + synthesis. Images NHWC in [-1, 1]."""

    cfg: GeneratorConfig
    precision: Precision = Precision()

    def setup(self):
        self.mapping_net = MappingNetwork(self.cfg, name="mapping")
        self.synthesis_net = SynthesisNetwork(self.cfg, self.precision, name="synthesis")

    def __call__(
        self,
        z: jnp.ndarray,
        truncation_psi: float = 1.0,
        truncation_cutoff: Optional[int] = None,
        c: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        ws = self.mapping_net(z, truncation_psi, truncation_cutoff, c=c)
        return self.synthesis_net(ws)

    def mapping(
        self,
        z: jnp.ndarray,
        truncation_psi: float = 1.0,
        truncation_cutoff: Optional[int] = None,
        update_w_avg: bool = False,
        c: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        return self.mapping_net(z, truncation_psi, truncation_cutoff,
                                update_w_avg, c=c)

    def synthesis(self, ws: jnp.ndarray) -> jnp.ndarray:
        return self.synthesis_net(ws)
