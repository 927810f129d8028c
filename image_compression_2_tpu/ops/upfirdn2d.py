"""Upsample → FIR filter → downsample, the alias-free resampling primitive.

Semantics (matching the classic ``upfirdn`` contract used by alias-free GANs):

    1. zero-stuff the input by ``up`` along each spatial axis
       (``H -> H*up``: each sample followed by ``up-1`` zeros),
    2. zero-pad by ``padding = (px0, px1, py0, py1)`` (negative = crop),
    3. convolve (true convolution) with the FIR filter ``f`` scaled by ``gain``,
    4. keep every ``down``-th sample.

TPU-native implementation: a single ``lax.conv_general_dilated`` per filter
pass — ``lhs_dilation`` expresses the zero-stuffing, ``window_strides`` the
decimation, and the FIR taps become a depthwise (feature-grouped) kernel.  XLA
lowers this straight onto the convolution units; separable 1D filters run as
two passes over rows/columns which is both fewer FLOPs and friendlier to the
MXU than a dense 2D depthwise kernel.

Filter ``f``: ``None`` (identity), 1D ``[taps]`` (separable), or 2D
``[th, tw]``.  Input ``x``: ``[B, H, W, C]`` (NHWC, TPU-native layout).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import numpy as np

import jax
import jax.numpy as jnp

Padding = Union[int, Sequence[int]]


def _parse_padding(padding: Padding) -> Tuple[int, int, int, int]:
    if isinstance(padding, (int, np.integer)):
        return (int(padding),) * 4
    padding = tuple(int(p) for p in padding)
    if len(padding) == 2:
        px, py = padding
        return (px, px, py, py)
    assert len(padding) == 4, f"bad padding {padding!r}"
    return padding


def _conv_pass(
    x: jnp.ndarray,
    taps: jnp.ndarray,  # [kh, kw]
    up: Tuple[int, int],
    down: Tuple[int, int],
    pad: Tuple[Tuple[int, int], Tuple[int, int]],  # ((py0,py1),(px0,px1))
) -> jnp.ndarray:
    """One depthwise conv pass implementing zero-stuff + pad + filter + decimate."""
    channels = x.shape[-1]
    dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    kernel = jnp.tile(taps[:, :, None, None].astype(dtype), (1, 1, 1, channels))
    # lhs_dilation yields (H-1)*up+1 samples; the upfirdn contract appends
    # up-1 trailing zeros to reach H*up, which is the same as padding high.
    pad_y = (pad[0][0], pad[0][1] + (up[0] - 1))
    pad_x = (pad[1][0], pad[1][1] + (up[1] - 1))
    # fp32 inputs get true-fp32 accuracy on the MXU; bf16 inputs take the fast
    # path end-to-end (matching the dtypes also keeps the transpose/grad conv
    # dtype-consistent).
    precision = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    out = jax.lax.conv_general_dilated(
        x.astype(dtype),
        kernel,
        window_strides=down,
        padding=(pad_y, pad_x),
        lhs_dilation=up,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=channels,
        preferred_element_type=dtype,
        precision=precision,
    )
    return out


def upfirdn2d(
    x: jnp.ndarray,
    f: Optional[np.ndarray],
    up: int = 1,
    down: int = 1,
    padding: Padding = 0,
    gain: float = 1.0,
) -> jnp.ndarray:
    """Apply upsample/FIR/downsample to a batch of NHWC images.

    ``f`` is a host-side numpy filter (or jnp array); it is treated as a
    compile-time constant.  True convolution: the filter is flipped before the
    cross-correlation XLA performs (a no-op for the symmetric filters used in
    practice, but kept for exactness).
    """
    assert x.ndim == 4, f"expected NHWC, got shape {x.shape}"
    in_dtype = x.dtype
    px0, px1, py0, py1 = _parse_padding(padding)

    if f is None:
        f = np.ones([1], dtype=np.float32)
    f = np.asarray(f, dtype=np.float32)
    assert f.ndim in (1, 2)

    if f.ndim == 2:
        taps = jnp.asarray(f[::-1, ::-1].copy()) * gain
        out = _conv_pass(
            x,
            taps,
            up=(up, up),
            down=(down, down),
            pad=((py0, py1), (px0, px1)),
        )
    else:
        # Separable: filter rows (y) then columns (x).
        f1 = f[::-1].copy()
        taps_y = jnp.asarray(f1[:, None]) * gain
        taps_x = jnp.asarray(f1[None, :])
        out = _conv_pass(
            x, taps_y, up=(up, 1), down=(down, 1), pad=((py0, py1), (0, 0))
        )
        out = _conv_pass(
            out, taps_x, up=(1, up), down=(1, down), pad=((0, 0), (px0, px1))
        )
    return out.astype(in_dtype)
