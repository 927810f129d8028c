#!/usr/bin/env python
"""Per-layer filtered-lrelu timing on the real TPU: matmul vs tiled kernel.

Dispatches N iterations and fetches once (the axon relay acknowledges
block_until_ready before completion; only a host fetch truly syncs).

Usage: python tools/bench_flrelu_layers.py [--res 256] [--batch 8] [--iters 20]
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
    ap.add_argument("--modes", default="matmul,tiled")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from image_compression_2_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from image_compression_2_tpu.core import GeneratorConfig
    from image_compression_2_tpu.ops import design_lowpass_filter, filtered_lrelu
    from image_compression_2_tpu.ops.pallas_flrelu_tiled import plan_tiled

    cfg = GeneratorConfig(img_resolution=args.res)
    dtype = jnp.dtype(args.dtype)
    modes = args.modes.split(",")
    print(f"res={args.res} batch={args.batch} dtype={args.dtype} "
          f"iters={args.iters}")
    print(f"{'layer':16s} {'shape':>18s}" +
          "".join(f" {m:>10s}" for m in modes) + "   winner")

    totals = {m: 0.0 for m in modes}
    for spec in cfg.layer_specs:
        if spec.up_factor == 1 and spec.down_factor == 1:
            continue
        H = spec.in_size + spec.conv_kernel - 1
        C = spec.out_channels
        fu = design_lowpass_filter(spec.up_taps, spec.in_cutoff,
                                   spec.in_half_width * 2,
                                   spec.tmp_sampling_rate)
        fd = design_lowpass_filter(spec.down_taps, spec.out_cutoff,
                                   spec.out_half_width * 2,
                                   spec.tmp_sampling_rate,
                                   radial=spec.down_radial)
        x = jnp.asarray(
            np.random.RandomState(0).randn(args.batch, H, H, C), dtype)
        b = jnp.asarray(np.random.RandomState(1).randn(C), jnp.float32)

        row = f"{spec.name:16s} {str((args.batch, H, H, C)):>18s}"
        times = {}
        for m in modes:
            if m == "tiled" and plan_tiled(
                    H, H, C, spec.up_factor, spec.down_factor,
                    spec.up_taps, spec.down_taps, spec.padding) is None:
                row += f" {'n/a':>10s}"
                continue
            fn = jax.jit(lambda x, b, m=m: filtered_lrelu(
                x, fu, fd, b, up=spec.up_factor, down=spec.down_factor,
                padding=spec.padding, clamp=cfg.conv_clamp, mode=m))
            try:
                out = np.asarray(fn(x, b))  # compile + warm + correctness ref
            except Exception as e:
                row += f" {'FAIL':>10s}"
                print(f"  {m} failed: {type(e).__name__}: {e}", file=sys.stderr)
                continue
            if m != modes[0] and modes[0] in times:
                pass  # correctness cross-check happens in tests
            xs = [x + jnp.asarray(i * 1e-6, dtype) for i in range(args.iters)]
            t0 = time.perf_counter()
            o = None
            for i in range(args.iters):
                o = fn(xs[i], b)
            _ = np.asarray(o)
            dt = (time.perf_counter() - t0) / args.iters * 1000
            times[m] = dt
            totals[m] += dt
            row += f" {dt:9.2f}ms"
        if times:
            row += f"   {min(times, key=times.get)}"
        print(row, flush=True)
    print("totals: " + "  ".join(f"{m}: {v:.2f} ms" for m, v in totals.items()))


if __name__ == "__main__":
    main()
