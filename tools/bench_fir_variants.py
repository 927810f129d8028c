#!/usr/bin/env python
"""Decompose + attack the matmul filtered-lrelu's HBM-bound middle.

The production path (`filtered_lrelu(mode='matmul')`) runs four banded
matmuls around a pointwise lrelu; the 2x-oversampled intermediate makes the
op HBM-bound, so the wins (if any) come from XLA fusing the pointwise stage
into a neighbouring matmul and from einsum contraction layouts — not FLOPs.
This tool measures, per hot layer on the real chip:

  stages:   bias+up-H | +up-W | +lrelu | full   (attribution: what each
            stage adds tells whether lrelu/clamp costs its own HBM pass)
  variants: matmul    — production einsum order (up-H, up-W, lrelu,
                        down-H, down-W)
            sandwich  — down-W before down-H (the W operator touches the
                        tensor XLA just produced; layout affinity check)
            one-einsum— up and down each as a single 3-operand einsum
                        "hH,wW,bHWc->bhwc" (lets XLA pick contraction order)
            lastdim   — contraction kept in the minor dim via explicit
                        transposes + 2D dots (tests whether einsum's
                        internal relayouts are the bottleneck)

Usage (idle chip only — ONE TPU job at a time):
  python tools/bench_fir_variants.py --res 256 --batch 8
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--min-size", type=int, default=80,
                    help="skip layers with internal size below this "
                         "(small layers are dispatch-bound, not HBM-bound)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from image_compression_2_tpu.core import GeneratorConfig
    from image_compression_2_tpu.ops import design_lowpass_filter
    from image_compression_2_tpu.ops.bias_act import bias_act
    from image_compression_2_tpu.ops.upfirdn2d import _parse_padding
    from image_compression_2_tpu.ops.upfirdn_matmul import fir_matrix

    cfg = GeneratorConfig(img_resolution=args.res)
    dtype = jnp.dtype(args.dtype)
    iters = args.iters

    def timed(fn, x, b):
        """One dispatch + one 4-byte fetch (axon relay: host fetch = sync)."""
        def many(x, b):
            def body(i, acc):
                o = fn(x + i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype), b)
                return acc + jnp.sum(o, dtype=jnp.float32)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        timer = jax.jit(many)
        float(timer(x, b))  # compile + warm
        t0 = time.perf_counter()
        float(timer(x, b))
        return (time.perf_counter() - t0) / iters * 1000

    print(f"== res={args.res} batch={args.batch} dtype={args.dtype} "
          f"iters={iters}")
    names = ["bias+upH", "+upW", "+lrelu", "matmul", "sandwich",
             "one-einsum", "lastdim"]
    print(f"{'layer':16s} {'shape':>20s}"
          + "".join(f" {n:>11s}" for n in names))
    totals = {n: 0.0 for n in names}

    for spec in cfg.layer_specs:
        if spec.up_factor == 1 and spec.down_factor == 1:
            continue
        H = spec.in_size + spec.conv_kernel - 1
        if H < args.min_size:
            continue
        C = spec.out_channels
        up, down = spec.up_factor, spec.down_factor
        fu = design_lowpass_filter(spec.up_taps, spec.in_cutoff,
                                   spec.in_half_width * 2,
                                   spec.tmp_sampling_rate)
        fd = design_lowpass_filter(spec.down_taps, spec.out_cutoff,
                                   spec.out_half_width * 2,
                                   spec.tmp_sampling_rate,
                                   radial=spec.down_radial)
        if np.ndim(fu) > 1 or np.ndim(fd) > 1:
            continue  # radial filters have no separable matmul form
        px0, px1, py0, py1 = _parse_padding(spec.padding)
        gain, slope, clamp = up ** 2, 0.2, cfg.conv_clamp

        Auh = fir_matrix(fu, H, up, 1, py0, py1, gain)
        Auw = fir_matrix(fu, H, up, 1, px0, px1, 1.0)
        Hu = Auh.shape[0]
        Adh = fir_matrix(fd, Hu, 1, down, 0, 0, 1.0)
        Adw = fir_matrix(fd, Hu, 1, down, 0, 0, 1.0)
        j = lambda A: jnp.asarray(A, dtype)
        Auh, Auw, Adh, Adw = j(Auh), j(Auw), j(Adh), j(Adw)

        x = jnp.asarray(
            np.random.RandomState(0).randn(args.batch, H, H, C) * 0.3, dtype)
        b = jnp.asarray(np.random.RandomState(1).randn(C), jnp.float32)

        def act(t):
            return bias_act(t, act="lrelu", alpha=slope,
                            gain=float(np.sqrt(2.0)), clamp=clamp)

        def eh(A, t):
            return jnp.einsum("hH,bHwc->bhwc", A, t)

        def ew(A, t):
            return jnp.einsum("wW,bhWc->bhwc", A, t)

        def v_stage_upH(x, b):
            return eh(Auh, bias_act(x, b))

        def v_stage_upW(x, b):
            return ew(Auw, eh(Auh, bias_act(x, b)))

        def v_stage_lrelu(x, b):
            return act(ew(Auw, eh(Auh, bias_act(x, b))))

        def v_matmul(x, b):
            t = act(ew(Auw, eh(Auh, bias_act(x, b))))
            return ew(Adw, eh(Adh, t))

        def v_sandwich(x, b):
            t = act(ew(Auw, eh(Auh, bias_act(x, b))))
            return eh(Adh, ew(Adw, t))

        def v_one_einsum(x, b):
            t = jnp.einsum("hH,wW,bHWc->bhwc", Auh, Auw, bias_act(x, b))
            return jnp.einsum("hH,wW,bHWc->bhwc", Adh, Adw, act(t))

        def _h_last(A, t):
            # contract axis 1 with A's minor dim via explicit relayout
            tt = jnp.swapaxes(t, 1, 3)           # b c w H
            tt = tt @ A.T                        # b c w h
            return jnp.swapaxes(tt, 1, 3)        # b h w c

        def _w_last(A, t):
            tt = jnp.swapaxes(t, 2, 3)           # b h c W
            tt = tt @ A.T                        # b h c w
            return jnp.swapaxes(tt, 2, 3)        # b h w c

        def v_lastdim(x, b):
            t = act(_w_last(Auw, _h_last(Auh, bias_act(x, b))))
            return _w_last(Adw, _h_last(Adh, t))

        variants = [v_stage_upH, v_stage_upW, v_stage_lrelu, v_matmul,
                    v_sandwich, v_one_einsum, v_lastdim]
        ref = None
        row = f"{spec.name:16s} {str((args.batch, H, H, C)):>20s}"
        for name, fn in zip(names, variants):
            full = name in ("matmul", "sandwich", "one-einsum", "lastdim")
            try:
                out = np.asarray(jax.jit(fn)(x, b), np.float32)
            except Exception as e:
                row += f" {'FAIL':>11s}"
                print(f"  {name}: {type(e).__name__}: {e}", file=sys.stderr)
                continue
            if full:
                if ref is None:
                    ref = out
                else:
                    err = np.max(np.abs(out - ref)) / max(
                        1e-6, float(np.max(np.abs(ref))))
                    if err > 3e-2:
                        row += f" {'WRONG':>11s}"
                        continue
            dt = timed(fn, x, b)
            totals[name] += dt
            row += f" {dt:9.2f}ms"
        print(row, flush=True)

    print("totals:"
          + "  ".join(f"{n}: {totals[n]:.2f} ms" for n in names))


if __name__ == "__main__":
    main()
