#!/usr/bin/env python
"""Per-layer modulated-conv timings vs the MXU roofline.

The roundtrip's time splits into flrelu (measured by bench_flrelu_layers),
convs, encoder, and dispatch.  This tool attributes the conv bucket: for each
synthesis layer spec it times `modulated_conv2d` alone (bf16, NHWC) on the
real chip, prints achieved TFLOP/s against the v5e bf16 peak, and also times
the whole encoder forward.  Layers far from the roofline are where the conv
bucket's headroom is.

Usage (idle chip only — ONE TPU job at a time):
  python tools/bench_conv_layers.py --res 256 --batch 8
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

PEAK_TFLOPS = 394.0  # v5e bf16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from image_compression_2_tpu.core import EncoderConfig, GeneratorConfig
    from image_compression_2_tpu.ops.modulated_conv import modulated_conv2d

    cfg = GeneratorConfig(img_resolution=args.res)
    dtype = jnp.dtype(args.dtype)
    B, iters = args.batch, args.iters

    def timed(fn, *xs):
        def many(*xs):
            def body(i, acc):
                o = fn(xs[0] + i.astype(xs[0].dtype)
                       * jnp.asarray(1e-6, xs[0].dtype), *xs[1:])
                return acc + jnp.sum(o, dtype=jnp.float32)
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

        timer = jax.jit(many)
        float(timer(*xs))  # compile + warm
        t0 = time.perf_counter()
        float(timer(*xs))
        return (time.perf_counter() - t0) / iters * 1000

    print(f"== modulated convs res={args.res} batch={B} dtype={args.dtype}")
    print(f"{'layer':16s} {'in-shape':>20s} {'k':>2s} {'Cout':>5s} "
          f"{'ms':>8s} {'GFLOP':>8s} {'TFLOP/s':>8s} {'%peak':>6s}")
    rng = np.random.RandomState(0)
    total_ms = total_gf = 0.0
    for spec in cfg.layer_specs:
        H = spec.in_size + spec.conv_kernel - 1  # full padding, as in layers
        k, Cin, Cout = spec.conv_kernel, spec.in_channels, spec.out_channels
        x = jnp.asarray(rng.randn(B, spec.in_size, spec.in_size, Cin) * .3,
                        dtype)
        w = jnp.asarray(rng.randn(k, k, Cin, Cout) * .05, jnp.float32)
        s = jnp.asarray(rng.randn(B, Cin) * .3, jnp.float32)

        def f(x, w, s):
            return modulated_conv2d(x, w, s, padding=k - 1)

        dt = timed(f, x, w, s)
        gf = 2 * H * H * Cin * Cout * k * k * B / 1e9
        tf = gf / dt
        total_ms += dt
        total_gf += gf
        print(f"{spec.name:16s} {str((B, spec.in_size, spec.in_size, Cin)):>20s} "
              f"{k:2d} {Cout:5d} {dt:8.2f} {gf:8.1f} {tf:8.1f} "
              f"{100 * tf / PEAK_TFLOPS:5.1f}%", flush=True)
    print(f"conv total: {total_ms:.2f} ms  {total_gf:.1f} GFLOP  "
          f"avg {total_gf / total_ms:.1f} TFLOP/s "
          f"({100 * total_gf / total_ms / PEAK_TFLOPS:.1f}% peak)")

    # whole encoder forward
    enc_cfg = EncoderConfig(img_resolution=args.res)
    from image_compression_2_tpu.models.encoder import HVAEEncoder

    enc = HVAEEncoder(enc_cfg, compute_dtype=dtype)
    x = jnp.asarray(rng.uniform(-1, 1, (B, args.res, args.res, 3)), jnp.float32)
    vars_ = jax.jit(enc.init)(jax.random.PRNGKey(0), x)

    def ef(x):
        w_plus, _, _ = enc.apply(vars_, x)
        return w_plus

    dt = timed(ef, x)
    print(f"encoder forward: {dt:.2f} ms/batch{B}")


if __name__ == "__main__":
    main()
