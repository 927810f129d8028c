#!/usr/bin/env python
"""Whole-layer fusion timing on the real TPU: for every synthesis-layer
geometry of a config, time the unfused path (modulated_conv2d +
filtered_lrelu(mode='auto'), i.e. the current measured flrelu policy) vs the
single-kernel fused path (`ops/pallas_layerfuse`), and write the winners to
the `layers` table of ops/flrelu_policy.json (consulted by SynthesisLayer).

Uses the same one-dispatch/one-fetch methodology as bench_flrelu_layers
(the axon relay acknowledges block_until_ready before completion).

Usage:
  python tools/bench_layerfuse.py --res 256 --batch 8 --emit-policy
  python tools/bench_layerfuse.py --policy-configs 256:8,1024:2 --emit-policy
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench_config(res, batch, iters, dtype_name, layers_table, rows,
                 flush=None):
    import jax
    import jax.numpy as jnp

    from image_compression_2_tpu.core import GeneratorConfig
    from image_compression_2_tpu.ops import (design_lowpass_filter,
                                             filtered_lrelu, modulated_conv2d)
    from image_compression_2_tpu.ops.flrelu_policy import layer_key
    from image_compression_2_tpu.ops.pallas_layerfuse import (
        fits_layerfuse, fused_synthesis_layer)

    cfg = GeneratorConfig(img_resolution=res)
    dtype = jnp.dtype(dtype_name)
    print(f"\n== res={res} batch={batch} dtype={dtype_name} iters={iters}")
    print(f"{'layer':16s} {'in':>18s} {'unfused':>10s}"
          f"   fused:ct... (legal tiles: ct%128==0 or ct==Cout)   winner")

    tot_u = tot_f = 0.0
    for spec in cfg.layer_specs:
        if spec.is_torgb or (spec.up_factor == 1 and spec.down_factor == 1):
            continue
        fu = design_lowpass_filter(spec.up_taps, spec.in_cutoff,
                                   spec.in_half_width * 2,
                                   spec.tmp_sampling_rate)
        fd = design_lowpass_filter(spec.down_taps, spec.out_cutoff,
                                   spec.out_half_width * 2,
                                   spec.tmp_sampling_rate,
                                   radial=spec.down_radial)
        H = spec.in_size
        k = spec.conv_kernel
        key = layer_key(batch, H, H, spec.in_channels, spec.out_channels, k,
                        spec.up_factor, spec.down_factor,
                        spec.up_taps, spec.down_taps, spec.padding)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(batch, H, H, spec.in_channels) * 0.3, dtype)
        w = jnp.asarray(rng.randn(k, k, spec.in_channels, spec.out_channels),
                        jnp.float32)
        s = jnp.asarray(rng.randn(batch, spec.in_channels) * 0.3 + 1.0,
                        jnp.float32)
        b = jnp.asarray(rng.randn(spec.out_channels) * 0.1, jnp.float32)
        ig = jnp.asarray(0.9, jnp.float32)
        row = f"{spec.name:16s} {str((batch, H, H, spec.in_channels)):>18s}"

        def unfused(x, w, s, b):
            y = modulated_conv2d(x, w, s, demodulate=True, padding=k - 1,
                                 input_gain=ig)
            return filtered_lrelu(y, fu, fd, b, up=spec.up_factor,
                                  down=spec.down_factor, padding=spec.padding,
                                  clamp=cfg.conv_clamp, mode="auto")

        # try every legal channel tile: the plan's VMEM estimate is
        # conservative (it sums non-overlapping stage buffers), so the real
        # feasibility proof is compilation, and the fastest tile varies
        geom = (batch, H, H, spec.in_channels, spec.out_channels, k,
                spec.up_factor, spec.down_factor, spec.up_taps,
                spec.down_taps, spec.padding)
        cts = []
        if np.ndim(fu) == 1 and np.ndim(fd) == 1:
            # Mosaic-legal tiles only: ct % 128 == 0 or ct == Cout (the
            # weight/bias/demod blocks put Ct in the lane dim)
            cts = [c for c in dict.fromkeys((128, 256, spec.out_channels))
                   if c <= spec.out_channels and spec.out_channels % c == 0
                   and (c % 128 == 0 or c == spec.out_channels)
                   and fits_layerfuse(*geom, dtype=dtype, ct=c)]

        def make_fused(ct):
            def fused(x, w, s, b):
                return fused_synthesis_layer(
                    x, w, s, b, fu, fd, up=spec.up_factor,
                    down=spec.down_factor, padding=spec.padding,
                    input_gain=ig, clamp=cfg.conv_clamp, ct=ct)
            return fused

        times = {}
        ref_out = None
        for name, fn in (("unfused", unfused),
                         *((f"fused:ct{c}", make_fused(c)) for c in cts)):
            jfn = jax.jit(fn)
            try:
                out = np.asarray(jfn(x, w, s, b), np.float32)
            except Exception as e:
                row += f" {'FAIL':>10s}"
                print(f"  {name} failed: {type(e).__name__}: {e}",
                      file=sys.stderr)
                continue
            if ref_out is None:
                ref_out = out
            else:
                err = np.max(np.abs(out - ref_out)) / max(
                    1e-6, float(np.max(np.abs(ref_out))))
                if err > 3e-2:
                    row += f" {'WRONG':>10s}"
                    print(f"  {name} mismatch rel={err:.3g}", file=sys.stderr)
                    continue

            def many(x, w, s, b, jfn=jfn):
                def body(i, acc):
                    o = jfn(x + i.astype(x.dtype)
                            * jnp.asarray(1e-6, x.dtype), w, s, b)
                    return acc + jnp.sum(o, dtype=jnp.float32)
                return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

            timer = jax.jit(many)
            try:
                float(timer(x, w, s, b))  # compile + warm
            except Exception as e:
                row += f" {'FAIL':>10s}"
                print(f"  {name} loop failed: {type(e).__name__}: {e}",
                      file=sys.stderr)
                continue
            t0 = time.perf_counter()
            _ = float(timer(x, w, s, b))
            dt = (time.perf_counter() - t0) / iters * 1000
            times[name] = dt
            row += f" {dt:9.2f}ms"
        if not cts:
            row += f" {'n/a':>10s}"
        if times:
            fused_times = [t for n, t in times.items() if n != "unfused"]
            tot_u += times.get("unfused", 0.0)
            tot_f += min(fused_times) if fused_times else times.get(
                "unfused", 0.0)
            win = min(times, key=times.get)
            row += f"   {win}"
            layers_table[key] = win
            rows.append((key, times))
            if flush is not None:
                # incremental: a timeout kill keeps every finished layer
                # (the 2026-08-19 fwd sweep lost 40 min of measurements to
                # an end-only write)
                flush()
        print(row, flush=True)
    print(f"{'TOTAL':16s} {'':>18s} {tot_u:9.2f}ms {tot_f:9.2f}ms"
          f"   (fused column falls back to unfused where n/a)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--emit-policy", action="store_true",
                    help="merge winners into ops/flrelu_policy.json")
    ap.add_argument("--policy-configs", default=None,
                    help="comma list of res:batch configs (overrides "
                         "--res/--batch), e.g. 256:8,1024:2")
    args = ap.parse_args()

    configs = ([(args.res, args.batch)] if not args.policy_configs else
               [tuple(map(int, c.split(":")))
                for c in args.policy_configs.split(",")])

    from image_compression_2_tpu.ops import flrelu_policy as fp
    from image_compression_2_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    layers_table = {}
    rows = []

    def write_policy():
        current = fp._load()
        merged = dict(current.get("layers", {}))
        merged.update(layers_table)
        meta = {"layerfuse_sweep": {
            "configs": [f"{r}:{b}" for r, b in configs],
            "iters": args.iters, "dtype": args.dtype,
        }}
        old_meta = {}
        try:
            import json
            with open(fp._POLICY_FILE) as f:
                old_meta = json.load(f).get("meta", {})
        except Exception:
            pass
        if isinstance(old_meta, dict):
            old_meta = dict(old_meta)
            old_meta.update(meta)
            meta = old_meta
        fp.save_policy(None, meta, layers=merged)

    flush = write_policy if args.emit_policy else None
    for res, batch in configs:
        bench_config(res, batch, args.iters, args.dtype, layers_table, rows,
                     flush=flush)

    if args.emit_policy and layers_table:
        write_policy()
        print(f"\nwrote {len(layers_table)} layer entries "
              f"({sum(1 for v in layers_table.values() if v.startswith('fused'))} "
              f"fused) -> {fp._POLICY_FILE}")


if __name__ == "__main__":
    main()
