#!/usr/bin/env python
"""Analytic FLOP count + MFU estimate for the codec roundtrip.

Counts useful work (convs, projector matmuls) and formulation overhead
(FIR resampling as matmuls — dense [out,in] operators as actually run, and
the nonzero-band minimum any blocked/fused variant could reach) separately,
so MFU can be quoted both ways.  v5e bf16 peak defaults to 394 TFLOP/s.

Usage: python tools/mfu.py --res 256 [--imgs-per-sec 57.1]
"""

import argparse
import sys

sys.path.insert(0, ".")


def conv_flops(h, w, cin, cout, k):
    return 2 * h * w * cin * cout * k * k


def encoder_flops(cfg):
    total = 0
    res = cfg.img_resolution
    ch = cfg.channels
    total += conv_flops(res, res, cfg.img_channels, ch[0], 3)
    for i in range(cfg.num_blocks):
        cout = ch[i + 1] if i < cfg.num_blocks - 1 else ch[i]
        total += conv_flops(res, res, ch[i], cout, 3)
        total += conv_flops(res, res, cout, cout, 3)
        res = max(res // 2, 1)
    # projector heads (tiny)
    for nws, cin in ((cfg.num_ws_global, ch[cfg.num_blocks - 1]),
                     (cfg.num_ws_medium, ch[min(cfg.medium_block + 1,
                                                cfg.num_blocks - 1)]),
                     (cfg.num_ws_fine, ch[cfg.fine_block + 1])):
        total += 2 * cin * cfg.hidden_dim
        total += 2 * cfg.hidden_dim * nws * cfg.w_dim * 2
    return total


def synthesis_flops(cfg, fir_mode="band"):
    """Returns (conv_flops, fir_flops).

    fir_mode='matmul': the dense banded-operator formulation actually run
    (every operator row contracts the full input axis).  fir_mode='band':
    only the nonzero band of each operator — the minimum MAC count any
    blocked/fused formulation of the same four-stage factorization can
    reach, so (matmul - band) is the formulation-overhead FLOP budget."""
    conv_total = 0
    fir_total = 0
    for s in cfg.layer_specs:
        h_in = s.in_size
        h_conv = h_in + s.conv_kernel - 1  # full padding
        conv_total += conv_flops(h_conv, h_conv, s.in_channels,
                                 s.out_channels, s.conv_kernel)
        if s.up_factor == 1 and s.down_factor == 1:
            continue
        H = h_conv
        px0, px1, py0, py1 = s.padding
        H2 = H * s.up_factor + py0 + py1 - s.up_taps + 1
        W2 = H2
        Ho = Wo = s.out_size
        C = s.out_channels
        if fir_mode == "matmul":
            # dense operators: H-up [H2,H], W-up [W2,W], W-dn [Wo,W2], H-dn [Ho,H2]
            fir_total += 2 * C * (H2 * H * H + W2 * H * H2
                                  + Wo * W2 * H2 + Ho * H2 * Wo)
        else:
            # band widths: an up-stage output row sees ceil(taps/up) input
            # samples (zero-stuffing), a down-stage output row sees taps
            bu = -(-s.up_taps // s.up_factor)
            bd = s.down_taps
            fir_total += 2 * C * (H2 * bu * H + W2 * bu * H2
                                  + Wo * bd * H2 + Ho * bd * Wo)
    return conv_total, fir_total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--imgs-per-sec", type=float, default=None)
    ap.add_argument("--peak-tflops", type=float, default=394.0,
                    help="v5e bf16 peak per chip")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from image_compression_2_tpu.core import EncoderConfig, GeneratorConfig

    gen_cfg = GeneratorConfig(img_resolution=args.res)
    enc_cfg = EncoderConfig(img_resolution=args.res)

    enc = encoder_flops(enc_cfg)
    conv, fir_mm = synthesis_flops(gen_cfg, "matmul")
    _, fir_bd = synthesis_flops(gen_cfg, "band")
    print(f"res {args.res}²: encoder {enc/1e9:.1f} G, synthesis convs "
          f"{conv/1e9:.1f} G, FIR-matmul {fir_mm/1e9:.1f} G, "
          f"FIR-band {fir_bd/1e9:.1f} G  (per image)")
    useful = enc + conv
    for name, total in (("matmul", useful + fir_mm), ("band", useful + fir_bd)):
        print(f"  {name} path: {total/1e9:.1f} GFLOP/image "
              f"(useful {useful/1e9:.1f} G = {100*useful/total:.0f}%)")
        if args.imgs_per_sec:
            ach = total * args.imgs_per_sec / 1e12
            ach_u = useful * args.imgs_per_sec / 1e12
            print(f"    @ {args.imgs_per_sec} img/s: {ach:.1f} TFLOP/s = "
                  f"{100*ach/args.peak_tflops:.1f}% MFU "
                  f"(useful-work MFU {100*ach_u/args.peak_tflops:.1f}%)")


if __name__ == "__main__":
    main()
