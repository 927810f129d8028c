"""Static configuration dataclasses.

The generator layer spec mirrors the alias-free StyleGAN3 recipe (Karras et al.,
"Alias-Free Generative Adversarial Networks", NeurIPS 2021): a geometric
progression of per-layer cutoff / stopband frequencies, power-of-two sampling
rates, and Kaiser-window FIR filters sized from the transition bands.  The
reference repo consumes this network as a frozen pickle
(``/root/reference/stylegan3_hvae_full.py:453-455``); here the architecture is
recomputed from first principles so the whole decoder is a native JAX program.

All spec math happens at Python/config time with numpy — inside ``jit`` every
shape, filter, and padding is a compile-time constant, which is exactly what
XLA:TPU wants (static shapes, fused filter constants).
"""

from __future__ import annotations

import dataclasses
from functools import cached_property
from typing import Optional, Tuple

import numpy as np

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Precision:
    """Dtype policy. TPU-native default: fp32 params, bf16 activations in the
    high-resolution synthesis layers (analogous to the reference's fp16 CUDA
    layers), fp32 everywhere numerically delicate (filters, Fourier input)."""

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    # Layers whose sampling rate exceeds img_resolution / 2**num_lowprec_res
    # run in `compute_dtype` (bf16 when enabled); the rest stay fp32.
    num_lowprec_res: int = 4
    # MXU pass count for the fp32 layers: 'highest' = 6-pass (exact fp32),
    # 'high' = 3-pass (~fp32 for these magnitudes, ~2x faster).
    fp32_precision: str = "highest"

    @property
    def mixed(self) -> bool:
        return self.compute_dtype != jnp.float32

    @property
    def fp32_mxu(self):
        import jax

        return (
            jax.lax.Precision.HIGH
            if self.fp32_precision == "high"
            else jax.lax.Precision.HIGHEST
        )


@dataclasses.dataclass(frozen=True)
class SynthesisLayerSpec:
    """Fully-resolved static parameters of one synthesis layer."""

    name: str
    is_torgb: bool
    is_critically_sampled: bool
    use_lowprec: bool
    in_channels: int
    out_channels: int
    in_size: int
    out_size: int
    in_sampling_rate: int
    out_sampling_rate: int
    tmp_sampling_rate: int
    in_cutoff: float
    out_cutoff: float
    in_half_width: float
    out_half_width: float
    conv_kernel: int
    up_factor: int
    down_factor: int
    up_taps: int
    down_taps: int
    down_radial: bool
    # (pad_x0, pad_x1, pad_y0, pad_y1) applied inside filtered_lrelu upsampling
    padding: Tuple[int, int, int, int]


@dataclasses.dataclass(frozen=True)
class GeneratorConfig:
    """StyleGAN3 generator hyperparameters (defaults = stylegan3-t)."""

    img_resolution: int = 1024
    img_channels: int = 3
    z_dim: int = 512
    c_dim: int = 0
    w_dim: int = 512
    # Mapping network
    mapping_layers: int = 2
    mapping_lr_multiplier: float = 0.01
    w_avg_beta: float = 0.998
    # Synthesis network
    channel_base: int = 32768
    channel_max: int = 512
    num_layers: int = 14
    num_critical: int = 2
    first_cutoff: float = 2.0
    first_stopband: float = 2 ** 2.1
    last_stopband_rel: float = 2 ** 0.3
    margin_size: int = 10
    output_scale: float = 0.25
    conv_kernel: int = 3
    filter_size: int = 6
    lrelu_upsampling: int = 2
    use_radial_filters: bool = False  # False = stylegan3-t, True = stylegan3-r
    conv_clamp: float = 256.0
    magnitude_ema_beta: float = 0.999

    @property
    def num_ws(self) -> int:
        # input layer + num_layers conv layers + ToRGB
        return self.num_layers + 2

    @cached_property
    def layer_specs(self) -> Tuple[SynthesisLayerSpec, ...]:
        """Resolve the per-layer frequency schedule into static layer specs."""
        n = self.num_layers
        # Geometric progression of cutoffs / stopbands from the first layer to
        # the output band, saturating at the critically-sampled final layers.
        last_cutoff = self.img_resolution / 2
        last_stopband = last_cutoff * self.last_stopband_rel
        exponents = np.minimum(np.arange(n + 1) / (n - self.num_critical), 1.0)
        cutoffs = self.first_cutoff * (last_cutoff / self.first_cutoff) ** exponents
        stopbands = (
            self.first_stopband * (last_stopband / self.first_stopband) ** exponents
        )

        # Sampling rates: smallest power of two with no aliasing; margins keep
        # the boundary effects of the FIR filters out of the visible canvas.
        sampling_rates = np.exp2(
            np.ceil(np.log2(np.minimum(stopbands * 2, self.img_resolution)))
        )
        half_widths = np.maximum(stopbands, sampling_rates / 2) - cutoffs
        sizes = sampling_rates + self.margin_size * 2
        sizes[-2:] = self.img_resolution
        channels = np.rint(
            np.minimum((self.channel_base / 2) / cutoffs, self.channel_max)
        )
        channels[-1] = self.img_channels

        specs = []
        for idx in range(n + 1):
            prev = max(idx - 1, 0)
            is_torgb = idx == n
            is_crit = idx >= n - self.num_critical
            use_lowprec = sampling_rates[idx] * (2 ** 4) > self.img_resolution
            conv_kernel = 1 if is_torgb else self.conv_kernel

            in_sr = int(sampling_rates[prev])
            out_sr = int(sampling_rates[idx])
            tmp_sr = max(in_sr, out_sr) * (1 if is_torgb else self.lrelu_upsampling)
            up_factor = int(np.rint(tmp_sr / in_sr))
            down_factor = int(np.rint(tmp_sr / out_sr))
            up_taps = (
                self.filter_size * up_factor if up_factor > 1 and not is_torgb else 1
            )
            down_taps = (
                self.filter_size * down_factor
                if down_factor > 1 and not is_torgb
                else 1
            )
            in_size = int(sizes[prev])
            out_size = int(sizes[idx])

            # Solve the total padding so that the chain
            #   conv(k, full) -> up(fu) -> lrelu -> down(fd)
            # lands exactly on out_size output samples, with symmetric
            # placement of the sampling grid.
            pad_total = (out_size - 1) * down_factor + 1
            pad_total -= (in_size + conv_kernel - 1) * up_factor
            pad_total += up_taps + down_taps - 2
            pad_lo = (pad_total + up_factor) // 2
            pad_hi = pad_total - pad_lo

            specs.append(
                SynthesisLayerSpec(
                    name=f"L{idx}_{out_size}_{int(channels[idx])}",
                    is_torgb=is_torgb,
                    is_critically_sampled=is_crit,
                    use_lowprec=use_lowprec,
                    in_channels=int(channels[prev]),
                    out_channels=int(channels[idx]),
                    in_size=in_size,
                    out_size=out_size,
                    in_sampling_rate=in_sr,
                    out_sampling_rate=out_sr,
                    tmp_sampling_rate=int(tmp_sr),
                    in_cutoff=float(cutoffs[prev]),
                    out_cutoff=float(cutoffs[idx]),
                    in_half_width=float(half_widths[prev]),
                    out_half_width=float(half_widths[idx]),
                    conv_kernel=conv_kernel,
                    up_factor=up_factor,
                    down_factor=down_factor,
                    up_taps=up_taps,
                    down_taps=down_taps,
                    down_radial=self.use_radial_filters and not is_crit,
                    padding=(int(pad_lo), int(pad_hi), int(pad_lo), int(pad_hi)),
                )
            )
        return tuple(specs)

    @property
    def input_channels(self) -> int:
        return self.layer_specs[0].in_channels

    @property
    def input_size(self) -> int:
        return self.layer_specs[0].in_size

    @property
    def input_sampling_rate(self) -> int:
        return self.layer_specs[0].in_sampling_rate

    @property
    def input_bandwidth(self) -> float:
        return self.layer_specs[0].in_cutoff

    @classmethod
    def tiny(cls, img_resolution: int = 32, **overrides) -> "GeneratorConfig":
        """A miniature config for CPU tests and multi-device dry runs."""
        kw = dict(
            img_resolution=img_resolution,
            z_dim=32,
            w_dim=32,
            channel_base=1024,
            channel_max=32,
            num_layers=6,
            margin_size=2,
            filter_size=4,
        )
        kw.update(overrides)
        return cls(**kw)


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    """Hierarchical VGG-VAE encoder hyperparameters.

    Mirrors the capability of ``HVAE_VGG_Encoder``
    (``/root/reference/stylegan3_hvae_full.py:29-103``): a log2(resolution)
    pyramid of VGG blocks with a per-resolution channel schedule, feature taps
    at an early ("fine"), middle ("medium") and final ("global") block, and
    three variational projector heads splitting num_ws W-vectors per
    ``block_split``.
    """

    img_resolution: int = 1024
    img_channels: int = 3
    w_dim: int = 512
    num_ws: int = 16
    block_split: Tuple[int, int] = (5, 12)
    channel_base: int = 32768
    channel_max: int = 512
    hidden_dim: int = 256  # projector MLP width
    fine_block: int = 1
    medium_block: int = 4
    # Spatially-aware projector heads (round-3 quality lever): per-head
    # (global, medium, fine) adaptive-average-pool grid sizes.  (1, 1, 1)
    # reproduces the reference's globally-pooled heads
    # (/root/reference/stylegan3_hvae_full.py:194-247); G > 1 pools the tap
    # to a GxG spatial grid before the projector MLP.
    pool_grids: Tuple[int, int, int] = (1, 1, 1)
    # Optional per-head MLP widths; None = hidden_dim for all three.
    hidden_dims: "Optional[Tuple[int, int, int]]" = None

    @property
    def num_blocks(self) -> int:
        return int(np.log2(self.img_resolution))

    @cached_property
    def channels(self) -> Tuple[int, ...]:
        """channels[i] = channel count after block i-1 (channels[0] = stem)."""
        n = self.num_blocks
        return tuple(
            min(self.channel_max, self.channel_base // (2 ** (n - res)))
            for res in range(n + 1)
        )

    @property
    def resolved_hidden_dims(self) -> Tuple[int, int, int]:
        return self.hidden_dims or (self.hidden_dim,) * 3

    @property
    def num_ws_global(self) -> int:
        return self.block_split[0]

    @property
    def num_ws_medium(self) -> int:
        return self.block_split[1] - self.block_split[0]

    @property
    def num_ws_fine(self) -> int:
        return self.num_ws - self.block_split[1]

    @classmethod
    def tiny(cls, img_resolution: int = 32, **overrides) -> "EncoderConfig":
        kw = dict(
            img_resolution=img_resolution,
            w_dim=32,
            num_ws=8,
            block_split=(3, 6),
            channel_base=256,
            channel_max=32,
            hidden_dim=32,
            medium_block=2,
        )
        kw.update(overrides)
        return cls(**kw)
