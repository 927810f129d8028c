#!/usr/bin/env python
"""Per-layer roofline analysis of the filtered-lrelu stack.

Joins the measured per-layer timings recorded by
``tools/bench_flrelu_layers.py --emit-policy`` (stored in
``ops/flrelu_policy.json`` meta.rows) with analytic FLOP and minimum-HBM-byte
models of each formulation, and reports — per layer and for the whole stack —
whether the measured time sits on the compute roof, the bandwidth roof, or
above both (dispatch/layout overhead).

Three cost models per geometry:
  * ``matmul``   — the production formulation: four dense banded-operator
                   MXU matmuls (H-up, W-up, W-dn, H-dn) with the three
                   2x-oversampled intermediates round-tripping HBM.
                   (``sandwich`` = same FLOPs/bytes, different contraction
                   order; ``blocked`` has fewer MACs but identical traffic.)
  * ``conv``     — depthwise separable FIR convs: linear-in-taps FLOPs,
                   same intermediate traffic.
  * ``ideal``    — a perfect fused kernel (what the reference's CUDA
                   ``filtered_lrelu`` approximates): conv FLOPs, but the
                   plane is read from HBM once and written once.  This is
                   the speed-of-light row — the bound no formulation that
                   materializes the 2x-oversampled grid in HBM can beat.

Reference capability: the CUDA ``filtered_lrelu`` kernel the reference's
generator rides (SURVEY §2.7); this tool is the honest TPU answer to "how
far from the roof is the chosen formulation, and what would a perfect
Pallas kernel buy".

Usage:
  python tools/roofline.py                  # all recorded configs
  python tools/roofline.py --res 256 --batch 8
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

BYTES = 2  # bf16


def layer_costs(spec, batch):
    """Returns dict of cost models for one up/down layer.

    Geometry (matches ops/upfirdn_matmul.py):
      input  x  [B, H,  W,  C]   H = W = in_size + conv_kernel - 1
      H-up   I1 [B, H2, W,  C]   H2 = H*up + py0 + py1 - tu + 1
      W-up   I2 [B, H2, W2, C]   W2 = W*up + px0 + px1 - tu + 1
      lrelu (elementwise, fused into a matmul epilogue by XLA)
      W-dn   I3 [B, H2, Wo, C]   valid-only decimation
      H-dn   out[B, Ho, Wo, C]   Ho = Wo = out_size
    """
    up, down = spec.up_factor, spec.down_factor
    tu, td = spec.up_taps, spec.down_taps
    px0, px1, py0, py1 = spec.padding
    H = W = spec.in_size + spec.conv_kernel - 1
    C = spec.out_channels
    B = batch
    H2 = H * up + py0 + py1 - tu + 1
    W2 = W * up + px0 + px1 - tu + 1
    Ho = Wo = spec.out_size

    n_in = B * H * W * C
    n_i1 = B * H2 * W * C
    n_i2 = B * H2 * W2 * C
    n_i3 = B * H2 * Wo * C
    n_out = B * Ho * Wo * C

    # dense banded-operator matmuls (mode='matmul'/'sandwich')
    flops_mm = 2 * B * C * (H2 * H * W      # H-up:  [H2,H] @ [H,W]
                            + W2 * W * H2   # W-up:  [H2,W] @ [W,W2]
                            + Wo * W2 * H2  # W-dn:  [H2,W2] @ [W2,Wo]
                            + Ho * H2 * Wo)  # H-dn: [Ho,H2] @ [H2,Wo]
    # depthwise separable FIR convs (mode='conv'); also the useful-work
    # count: every output sample genuinely needs `taps` MACs.
    flops_cv = 2 * B * C * ((H2 * W) * tu + (H2 * W2) * tu
                            + (H2 * Wo) * td + (Ho * Wo) * td)

    # HBM traffic, formulation path: x read once, each intermediate written
    # then read, output written.  Optimistic (assumes XLA fuses bias/lrelu
    # into matmul prologues/epilogues) — a lower bound by construction.
    bytes_form = BYTES * (n_in + 2 * n_i1 + 2 * n_i2 + 2 * n_i3 + n_out)
    # perfect fused kernel: one read + one write
    bytes_ideal = BYTES * (n_in + n_out)

    return {
        "flops_mm": flops_mm,
        "flops_cv": flops_cv,
        "bytes_form": bytes_form,
        "bytes_ideal": bytes_ideal,
        "shape": (B, H, W, C),
    }


def fmt_t(ms):
    return f"{ms:7.2f}"


def analyze(res, batch, rows, peak_tflops, peak_gbs):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from image_compression_2_tpu.core import GeneratorConfig

    cfg = GeneratorConfig(img_resolution=res)
    specs = {s.name: s for s in cfg.layer_specs}
    sel = [r for r in rows if r["res"] == res and r["batch"] == batch]
    if not sel:
        return None

    print(f"\n== roofline res={res} batch={batch} "
          f"(peaks: {peak_tflops:.0f} bf16 TFLOP/s, {peak_gbs:.0f} GB/s)")
    print(f"{'layer':14s} {'best':>9s}{'mode':>10s} {'t_mxu':>8s} {'t_hbm':>8s}"
          f" {'t_roof':>8s} {'roof%':>6s} {'bound':>6s} {'t_ideal':>8s}"
          f" {'ideal x':>8s}")
    tot = {"meas": 0.0, "mxu": 0.0, "hbm": 0.0, "roof": 0.0, "ideal": 0.0}
    for r in sel:
        spec = specs.get(r["layer"])
        if spec is None or not r.get("times_ms"):
            continue
        c = layer_costs(spec, batch)
        best_mode = min(r["times_ms"], key=r["times_ms"].get)
        meas = r["times_ms"][best_mode]
        flops = c["flops_cv"] if best_mode == "conv" else c["flops_mm"]
        t_mxu = flops / (peak_tflops * 1e12) * 1e3
        t_hbm = c["bytes_form"] / (peak_gbs * 1e9) * 1e3
        t_roof = max(t_mxu, t_hbm)
        bound = "MXU" if t_mxu > t_hbm else "HBM"
        # speed-of-light fused kernel: conv FLOPs, one read + one write
        t_ideal = max(c["flops_cv"] / (peak_tflops * 1e12) * 1e3,
                      c["bytes_ideal"] / (peak_gbs * 1e9) * 1e3)
        print(f"{r['layer']:14s} {meas:7.2f}ms{best_mode:>10s}"
              f" {fmt_t(t_mxu)} {fmt_t(t_hbm)} {fmt_t(t_roof)}"
              f" {100 * t_roof / meas:5.0f}% {bound:>6s} {fmt_t(t_ideal)}"
              f" {meas / t_ideal:7.1f}x")
        tot["meas"] += meas
        tot["mxu"] += t_mxu
        tot["hbm"] += t_hbm
        tot["roof"] += t_roof
        tot["ideal"] += t_ideal
    if tot["meas"]:
        print(f"{'TOTAL':14s} {tot['meas']:7.2f}ms {'':>9s}"
              f" {fmt_t(tot['mxu'])} {fmt_t(tot['hbm'])} {fmt_t(tot['roof'])}"
              f" {100 * tot['roof'] / tot['meas']:5.0f}%  {'':>5s}"
              f" {fmt_t(tot['ideal'])} {tot['meas'] / tot['ideal']:7.1f}x")
        print(f"  stack runs at {100 * tot['roof'] / tot['meas']:.0f}% of its "
              f"formulation roofline; a perfect one-read-one-write fused "
              f"kernel could be at most {tot['meas'] / tot['ideal']:.1f}x "
              f"faster (bandwidth floor {tot['ideal']:.1f} ms).")
    return tot


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=None)
    ap.add_argument("--batch", type=int, default=None)
    ap.add_argument("--policy", default=os.path.join(
        "image_compression_2_tpu", "ops", "flrelu_policy.json"))
    ap.add_argument("--peak-tflops", type=float, default=394.0,
                    help="v5e bf16 peak per chip")
    ap.add_argument("--peak-gbs", type=float, default=819.0,
                    help="v5e HBM bandwidth per chip")
    args = ap.parse_args()

    with open(args.policy) as f:
        meta = json.load(f)["meta"]
    rows = meta.get("rows", [])
    if not rows:
        sys.exit("policy file carries no per-layer timings "
                 "(re-run tools/bench_flrelu_layers.py --emit-policy)")
    configs = sorted({(r["res"], r["batch"]) for r in rows})
    if args.res is not None:
        configs = [(r, b) for r, b in configs
                   if r == args.res and (args.batch is None or b == args.batch)]
    for res, batch in configs:
        analyze(res, batch, rows, args.peak_tflops, args.peak_gbs)


if __name__ == "__main__":
    main()
