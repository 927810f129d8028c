"""Filtered leaky ReLU — the signature alias-free nonlinearity.

``down( lrelu( up(x + b) ) )``: the activation is evaluated on a 2×
oversampled grid so its high-frequency content stays below the Nyquist limit
of the layer's output sampling rate.  This is the op the reference's frozen
generator spends most of its FLOPs around (inside ``G.synthesis``,
``/root/reference/stylegan3_hvae_full.py:274``).

The conv composition below is the semantics-defining reference
implementation; the banded-matmul family (``upfirdn_matmul``,
``upfirdn_blocked``) and the fused Pallas kernels (``pallas_flrelu_wfuse2``,
``pallas_flrelu_wfuse3``) are the production paths, validated against it.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp

from .bias_act import bias_act
from .upfirdn2d import upfirdn2d, Padding, _parse_padding
from .upfirdn_matmul import upfirdn2d_mm

_PALLAS_MODES = ("mmfuse2", "mmfuse3", "hfuse")


def _mesh_axis_sizes():
    """(n_model, n_data) of the ambient mesh (``with mesh:``); (1, 1) when
    no mesh is active.  n_model > 1 means activations may be channel-sharded
    for tensor parallelism."""
    try:
        from jax._src.mesh import thread_resources

        m = thread_resources.env.physical_mesh
        if m.empty:
            return 1, 1
        axes = dict(m.shape)
        return int(axes.get("model", 1)), int(axes.get("data", 1))
    except Exception:
        return 1, 1


def _shard_map_kernel(kernel, x, fu, fd, b, **kw):
    """Run a depthwise Pallas kernel under an active model-axis mesh.

    filtered_lrelu is channel-separable (the FIR resampling and the
    nonlinearity act per channel), so channel shards are fully independent:
    ``shard_map`` over the ``model`` axis (and ``data`` over batch when it
    divides) runs the SAME kernel per device on its local
    [B/dp, H, W, C/tp] block with ZERO collectives — the tensor-parallel
    answer to a pallas_call carrying no partitioning rule (round-4 weak #7:
    a model-axis mesh used to silently give up the fused Pallas wins)."""
    import functools

    from jax import shard_map
    from jax._src.mesh import thread_resources
    from jax.sharding import PartitionSpec as P

    mesh = thread_resources.env.physical_mesh
    n_data = int(dict(mesh.shape).get("data", 1))
    batch_axis = ("data" if n_data > 1 and x.shape[0] % n_data == 0 else None)
    x_spec = P(batch_axis, None, None, "model")
    fn = functools.partial(kernel, fu=fu, fd=fd, **kw)
    if b is None:
        return shard_map(lambda xs: fn(xs, b=None), mesh=mesh,
                         in_specs=(x_spec,), out_specs=x_spec,
                         check_vma=False)(x)
    return shard_map(lambda xs, bs: fn(xs, b=bs), mesh=mesh,
                     in_specs=(x_spec, P("model")), out_specs=x_spec,
                     check_vma=False)(x, b)


def filtered_lrelu(
    x: jnp.ndarray,
    fu: Optional[np.ndarray],
    fd: Optional[np.ndarray],
    b: Optional[jnp.ndarray] = None,
    up: int = 1,
    down: int = 1,
    padding: Padding = 0,
    gain: float = float(np.sqrt(2.0)),
    slope: float = 0.2,
    clamp: Optional[float] = 256.0,
    mode: str = "auto",
    fp32_mxu=None,
) -> jnp.ndarray:
    """Bias → upsample(fu) → leaky-ReLU(slope)·gain → clamp → downsample(fd).

    ``x``: [B, H, W, C] NHWC. ``padding`` applies in the upsampling stage
    (same contract as ``upfirdn2d``); the downsampling stage is valid-only.
    The upsampling filter gets an ``up**2`` energy gain so interpolation
    preserves signal magnitude.

    ``mode``: 'conv' (depthwise convs — linear in plane size, VPU-bound),
    'matmul' (banded-operator MXU matmuls — ~10x faster than conv on the
    hot 256² layers but quadratic in plane size), 'sandwich' (matmul with
    the down stage contracting W before H — avoids a relayout of the
    oversampled intermediate; measured win on up-4 layers), 'blocked'
    (block-banded matmuls: 128-row output tiles contract only their band
    window — 3-6x fewer MACs on large planes; ``upfirdn_blocked``),
    'mmfuse2' (matmul H passes around ONE Pallas kernel fusing
    W-up → lrelu → W-down so the 2x-oversampled intermediate never
    round-trips HBM; native-layout MXU contractions, NHWC in,
    channels-before-width out, restored by the closing H-down einsum;
    ``pallas_flrelu_wfuse2``), 'mmfuse3' (channels-middle layout
    end-to-end: the H-up einsum emits [B,H2,C,W], both kernel contractions
    are classic matmuls, and the backward fuses completely;
    ``pallas_flrelu_wfuse3``), or 'auto' (the measured per-geometry winner
    from ``flrelu_policy.json`` — the fwd+bwd winner table when a trainer
    has set ``flrelu_policy.set_train(True)``; matmul for unbenchmarked
    separable-resampling geometries).

    Two earlier Pallas formulations — a fully-fused H-tiled kernel ('tiled')
    and a transpose-based W-fusion ('mmfuse') — were measured slower than
    the banded-matmul family on every production geometry and removed in
    round 4 (PARITY §2.7 records the numbers; git history has the kernels).
    """
    if mode not in ("auto", "conv", "matmul", "sandwich", "blocked",
                    "mmfuse2", "mmfuse3", "hfuse"):
        # an unknown (or removed: 'tiled'/'mmfuse') mode must not silently
        # run a different path — it would mislabel benchmark/policy timings
        raise ValueError(f"unknown filtered_lrelu mode {mode!r}")
    px0, px1, py0, py1 = _parse_padding(padding)
    separable = (fu is None or np.ndim(fu) == 1) and (
        fd is None or np.ndim(fd) == 1
    )
    tu = 1 if fu is None else len(np.asarray(fu))
    td = 1 if fd is None else len(np.asarray(fd))
    auto = mode == "auto"
    n_model, n_data = _mesh_axis_sizes()

    def _shard_geom():
        """The per-device geometry a Pallas kernel actually runs under the
        ambient mesh (channels over 'model', batch over 'data'); None when a
        model axis is active but channels don't divide it."""
        B, H, W, C = x.shape
        if n_model > 1 and C % n_model:
            return None
        b_eff = B // n_data if (n_data > 1 and B % n_data == 0) else B
        return max(1, b_eff), H, W, C // n_model if n_model > 1 else C

    if auto and separable and (up > 1 or down > 1):
        from .flrelu_policy import lookup, usable

        geom = _shard_geom()
        gb, gh, gw, gc = geom if geom is not None else (
            x.shape[0], x.shape[1], x.shape[2], x.shape[3])
        # policy consulted at the PER-SHARD geometry: that is what each
        # device executes under the mesh
        measured = usable(lookup(gb, gh, gw, gc,
                                 up, down, tu, td, (px0, px1, py0, py1)))
        if measured is not None:
            if measured in _PALLAS_MODES and n_model > 1 and geom is None:
                # channels don't divide the model axis: no clean channel
                # shard_map — the banded-matmul path propagates shardings
                # natively, so stay on it
                measured = "matmul"
            mode = measured
    if mode in _PALLAS_MODES:
        if not (separable and (up > 1 or down > 1)):
            raise ValueError(
                f"mode={mode!r} requires separable 1-D filters and up/down > 1")
        if mode == "mmfuse2":
            from .pallas_flrelu_wfuse2 import (
                filtered_lrelu_wfuse2 as kernel, fits_wfuse2 as fits)
        elif mode == "hfuse":
            from .pallas_flrelu_hfuse import (
                filtered_lrelu_hfuse as kernel, fits_hfuse as fits)
        else:
            from .pallas_flrelu_wfuse3 import (
                filtered_lrelu_wfuse3 as kernel, fits_wfuse3 as fits)
        geom = _shard_geom()
        kw = dict(up=up, down=down, padding=padding, gain=gain, slope=slope,
                  clamp=clamp, fp32_mxu=fp32_mxu)
        if (geom is not None
                and fits(*geom, up, down, tu, td, (px0, px1, py0, py1),
                         dtype=x.dtype)):
            if n_model > 1:
                # tensor-parallel: the SAME kernel per device on its channel
                # shard via shard_map (depthwise op — zero collectives)
                return _shard_map_kernel(kernel, x, fu, fd, b, **kw)
            return kernel(x, fu, fd, b, **kw)
        if not auto:
            raise ValueError(
                f"no legal {mode} block for this geometry (per-shard "
                f"{geom}, model axis {n_model})")
        mode = "matmul"  # stale policy entry / non-fitting shard: degrade
    use_mm = mode in ("matmul", "sandwich", "blocked") or (
        mode == "auto" and separable and (up > 1 or down > 1)
    )
    if mode in ("sandwich", "blocked") and not separable:
        raise ValueError(f"mode={mode!r} requires separable 1-D filters")
    if use_mm:
        import functools

        if mode == "blocked":
            # block-banded MXU products: each 128-row output tile contracts
            # only its band window — 3-6x fewer MACs on large planes, pure
            # XLA (upfirdn_blocked).  Down stage keeps the sandwich W-first
            # order (same relayout argument as below).
            from .upfirdn_blocked import upfirdn2d_mm_blocked

            up_op = functools.partial(upfirdn2d_mm_blocked, fp32_mxu=fp32_mxu)
            down_op = functools.partial(up_op, order="wh")
        else:
            up_op = functools.partial(upfirdn2d_mm, fp32_mxu=fp32_mxu)
            # sandwich: the down stage contracts W first — its input is the
            # 2x oversampled intermediate whose layout XLA just wrote, and
            # the W-first order avoids a relayout there (measured win on
            # up-4 layers, tools/bench_fir_variants.py).
            down_op = (functools.partial(up_op, order="wh")
                       if mode == "sandwich" else up_op)
    else:
        up_op = down_op = upfirdn2d
    x = bias_act(x, b)
    x = up_op(x, fu, up=up, padding=(px0, px1, py0, py1), gain=up ** 2)
    x = bias_act(x, act="lrelu", alpha=slope, gain=gain, clamp=clamp)
    x = down_op(x, fd, down=down)
    return x
