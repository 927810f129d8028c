#!/usr/bin/env python
"""Per-layer filtered-lrelu timing on the real TPU across the mode family
(conv / matmul / sandwich / blocked / mmfuse2 / mmfuse3).

Dispatches N iterations and fetches once (the axon relay acknowledges
block_until_ready before completion; only a host fetch truly syncs).

Usage:
  python tools/bench_flrelu_layers.py --res 256 --batch 8
  python tools/bench_flrelu_layers.py --emit-policy   # 256@b8 + 1024@b2 ->
                                                      # ops/flrelu_policy.json
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench_config(res, batch, iters, modes, dtype_name, winners, rows,
                 grad=False):
    import jax
    import jax.numpy as jnp

    from image_compression_2_tpu.core import GeneratorConfig
    from image_compression_2_tpu.ops import design_lowpass_filter, filtered_lrelu
    from image_compression_2_tpu.ops.flrelu_policy import geometry_key
    from image_compression_2_tpu.ops.pallas_flrelu_wfuse2 import fits_wfuse2
    from image_compression_2_tpu.ops.pallas_flrelu_wfuse3 import fits_wfuse3
    from image_compression_2_tpu.ops.upfirdn2d import _parse_padding

    cfg = GeneratorConfig(img_resolution=res)
    dtype = jnp.dtype(dtype_name)
    tag = " [fwd+bwd]" if grad else ""
    print(f"\n== res={res} batch={batch} dtype={dtype_name} iters={iters}{tag}")
    print(f"{'layer':16s} {'shape':>20s}"
          + "".join(f" {m:>10s}" for m in modes) + "   winner")

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
            np.random.RandomState(0).randn(batch, H, H, C) * 0.3, dtype)
        b = jnp.asarray(np.random.RandomState(1).randn(C), jnp.float32)

        row = f"{spec.name:16s} {str((batch, H, H, C)):>20s}"
        times = {}
        ref_out = None
        for m in modes:
            if m == "mmfuse2" and (
                np.ndim(fu) > 1 or np.ndim(fd) > 1
                or not fits_wfuse2(
                    batch, H, H, C, spec.up_factor, spec.down_factor,
                    spec.up_taps, spec.down_taps, spec.padding, dtype=dtype)
            ):
                row += f" {'n/a':>10s}"
                continue
            if m == "mmfuse3" and (
                np.ndim(fu) > 1 or np.ndim(fd) > 1
                or not fits_wfuse3(
                    batch, H, H, C, spec.up_factor, spec.down_factor,
                    spec.up_taps, spec.down_taps, spec.padding, dtype=dtype)
            ):
                row += f" {'n/a':>10s}"
                continue
            if m == "hfuse":
                from image_compression_2_tpu.ops.pallas_flrelu_hfuse import (
                    fits_hfuse)

                if (np.ndim(fu) > 1 or np.ndim(fd) > 1
                        or not fits_hfuse(
                            batch, H, H, C, spec.up_factor, spec.down_factor,
                            spec.up_taps, spec.down_taps, spec.padding,
                            dtype=dtype)):
                    row += f" {'n/a':>10s}"
                    continue
            fn = jax.jit(lambda x, b, m=m: filtered_lrelu(
                x, fu, fd, b, up=spec.up_factor, down=spec.down_factor,
                padding=spec.padding, clamp=cfg.conv_clamp, mode=m))
            try:
                out = np.asarray(fn(x, b), np.float32)  # compile + warm
            except Exception as e:
                row += f" {'FAIL':>10s}"
                print(f"  {m} failed: {type(e).__name__}: {e}",
                      file=sys.stderr)
                continue
            if ref_out is None:
                ref_out = out
            else:
                # a path that doesn't reproduce the reference output can
                # never become the policy winner
                err = np.max(np.abs(out - ref_out)) / max(
                    1e-6, float(np.max(np.abs(ref_out))))
                if err > 3e-2:
                    row += f" {'WRONG':>10s}"
                    print(f"  {m} mismatch rel={err:.3g}", file=sys.stderr)
                    continue
            # ONE dispatch + ONE 4-byte fetch: a jitted fori_loop runs the
            # op `iters` times and reduces to a scalar.  Per-call dispatch
            # and (worse) fetching the full output tensor over the relay
            # would otherwise dominate every layer's measurement.
            if grad:
                # fwd+bwd per iteration: the training path's cost.  The
                # scalar loss keeps every mode's VJP shape identical, and
                # the grad-sum reduction prevents dead-code narrowing.
                gfn = jax.grad(
                    lambda x, b, fn=fn: jnp.sum(
                        fn(x, b).astype(jnp.float32) ** 2), argnums=0)

                def many(x, b, gfn=gfn):
                    def body(i, acc):
                        g = gfn(x + i.astype(x.dtype)
                                * jnp.asarray(1e-6, x.dtype), b)
                        return acc + jnp.sum(g, dtype=jnp.float32)
                    return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
            else:
                def many(x, b, fn=fn):
                    def body(i, acc):
                        o = fn(x + i.astype(x.dtype)
                               * jnp.asarray(1e-6, x.dtype), b)
                        # full reduction so no mode's output can be dead-code
                        # narrowed (XLA can sink a single-element slice into
                        # the dot/conv and compute a sliver of the real
                        # layer); jnp.sum is a cheap on-device reduce
                        return acc + jnp.sum(o, dtype=jnp.float32)
                    return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

            timer = jax.jit(many)
            try:
                float(timer(x, b))  # compile + warm
            except Exception as e:
                row += f" {'FAIL':>10s}"
                print(f"  {m} loop failed: {type(e).__name__}: {e}",
                      file=sys.stderr)
                continue
            t0 = time.perf_counter()
            _ = float(timer(x, b))
            dt = (time.perf_counter() - t0) / iters * 1000
            times[m] = dt
            totals[m] += dt
            row += f" {dt:9.2f}ms"
        if times:
            win = min(times, key=times.get)
            row += f"   {win}"
            key = geometry_key(batch, H, H, C, spec.up_factor, spec.down_factor,
                               spec.up_taps, spec.down_taps,
                               _parse_padding(spec.padding))
            winners[key] = win
            rows.append({"res": res, "layer": spec.name, "batch": batch,
                         "times_ms": {k: round(v, 3) for k, v in times.items()}})
        print(row, flush=True)
    print("totals: " + "  ".join(f"{m}: {v:.2f} ms" for m, v in totals.items()))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--modes",
                    default="matmul,sandwich,blocked,mmfuse2,mmfuse3,hfuse,conv")
    ap.add_argument("--grad", action="store_true",
                    help="time fwd+bwd (jax.grad of a scalar loss) instead "
                         "of the forward — the training path's cost; with "
                         "--emit-policy, writes the winners_grad table")
    ap.add_argument("--emit-policy", action="store_true",
                    help="benchmark --policy-configs, write "
                         "ops/flrelu_policy.json (winners, or winners_grad "
                         "with --grad; the other table is preserved)")
    ap.add_argument("--policy-configs", default="256:8,256:4,256:1,512:2,"
                                                "1024:2,1024:1",
                    help="comma list of res:batch pairs for --emit-policy "
                         "(VERDICT r2 item 6: measure, don't default, the "
                         "common geometries)")
    args = ap.parse_args()

    from image_compression_2_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    winners, rows = {}, []
    modes = args.modes.split(",")
    if args.emit_policy:
        configs = [tuple(map(int, rb.split(":")))
                   for rb in args.policy_configs.split(",")]
        for res, batch in configs:
            bench_config(res, batch, args.iters, modes, args.dtype,
                         winners, rows, grad=args.grad)
        import json

        from image_compression_2_tpu.ops.flrelu_policy import (
            _POLICY_FILE, save_policy)

        # merge this sweep's rows into the existing meta under a lane key so
        # the fwd and grad sweeps never clobber each other's measurements
        try:
            with open(_POLICY_FILE) as f:
                meta = json.load(f).get("meta", {})
        except (OSError, ValueError):
            meta = {}
        meta.update({"hardware": "tpu v5e (1 chip)", "dtype": args.dtype,
                     "iters": args.iters})
        meta["rows_grad" if args.grad else "rows"] = rows
        # MERGE into the existing table: a partial sweep (subset of
        # --policy-configs) must update its geometries without wiping the
        # winners measured for every other config
        from image_compression_2_tpu.ops.flrelu_policy import _load

        lane_key = "winners_grad" if args.grad else "winners"
        merged = dict(_load()[lane_key])
        merged.update(winners)
        if args.grad:
            save_policy(None, meta, winners_grad=merged)
        else:
            save_policy(merged, meta)
        lane = "winners_grad" if args.grad else "winners"
        print(f"\nwrote {lane} with {len(winners)} geometries")
    else:
        bench_config(args.res, args.batch, args.iters, modes, args.dtype,
                     winners, rows, grad=args.grad)


if __name__ == "__main__":
    main()
