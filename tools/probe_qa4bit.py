#!/usr/bin/env python
"""Fixed-step lattice-QA probe at 4 bits — can quantization-aware
refinement on the UNBOUNDED fixed-step lattice close the 4-bit coded gap?

RD_TABLE context: `uniform-4bit+refine100-qa` (float path, all-QA ST on the
[-1,1] 16-level lattice, no clamp) beats free refinement 47.27 vs 43.87 dB,
but round 5 could not CODE those latents (the fixed index grid clamps, the
span grid re-phases).  The snapped fixed-step container grid shares the ST
lattice's step AND phase, so the coded row should now reproduce the -qa
row's distortion at ~0.45 bpp.  This probe measures qa_frac in
{0.0, 0.5, 1.0} on the SAME 32 held-out samples / 48 calibration samples
as tools/rd_table.py (seed 1234, psi 0.7) and emits RD-table-compatible
rows; `--apply` inserts the winner into RD_TABLE.md/json.

Usage: python tools/probe_qa4bit.py --stage1 runs/r5stage1/hvae_encoder_best.ic2t
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage1", default="runs/r5stage1/hvae_encoder_best.ic2t")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--bits", type=int, default=4)
    ap.add_argument("--n-eval", type=int, default=32)
    ap.add_argument("--n-calib", type=int, default=48)
    ap.add_argument("--refine", type=int, default=100)
    ap.add_argument("--refine-lr", type=float, default=0.02)
    ap.add_argument("--fracs", type=str, default="1.0,0.5")
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--apply", action="store_true",
                    help="insert the best row into RD_TABLE.md/json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from image_compression_2_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from image_compression_2_tpu.codec import UniformCABACCompressor
    from image_compression_2_tpu.core import (EncoderConfig, GeneratorConfig,
                                              Precision)
    from image_compression_2_tpu.data.dataset import generate_synthetic_dataset
    from image_compression_2_tpu.metrics.quality import ms_ssim
    from image_compression_2_tpu.models.generator import Generator
    from image_compression_2_tpu.train.checkpoint import load_checkpoint
    from image_compression_2_tpu.train.lpips import create_lpips

    res = args.res
    precision = Precision(compute_dtype=jnp.bfloat16)
    gen_cfg = GeneratorConfig(img_resolution=res)
    raw1, meta1 = load_checkpoint(args.stage1)
    enc1 = {"params": raw1["params"]}
    cfg_meta = meta1.get("config", {})
    enc_kw = {k: tuple(cfg_meta[k])
              for k in ("block_split", "pool_grids", "hidden_dims")
              if cfg_meta.get(k)}
    enc_cfg = EncoderConfig(img_resolution=res, w_dim=gen_cfg.w_dim,
                            num_ws=gen_cfg.num_ws, **enc_kw)
    generator = Generator(gen_cfg, precision)
    _, k_gen = jax.random.split(jax.random.PRNGKey(42))
    gen_vars = jax.jit(generator.init)(k_gen, jnp.zeros([1, gen_cfg.z_dim]))
    n_total = args.n_eval + args.n_calib
    ds = generate_synthetic_dataset(generator, gen_vars, num_samples=n_total,
                                    batch_size=8, resolution=res, seed=1234,
                                    truncation_psi=0.7)
    images = np.stack([ds[i][0] if isinstance(ds[i], tuple) else ds[i]
                       for i in range(n_total)])
    x_eval = images[:args.n_eval]
    x_calib = jnp.asarray(images[args.n_eval:])
    pix_bytes = res * res * 3 * 4
    _, lp_vars, lp_apply = create_lpips(seed=0, image_size=res)

    def metrics(recon, comp_per_img):
        ps, ms_sum, lp_sum = [], 0.0, 0.0
        for i in range(0, len(x_eval), args.chunk):
            xc = jnp.asarray(x_eval[i:i + args.chunk], jnp.float32)
            rc = jnp.asarray(recon[i:i + args.chunk], jnp.float32)
            mse = np.mean(np.square(np.asarray(xc) - np.asarray(rc)),
                          axis=(1, 2, 3))
            ps.append(10.0 * np.log10(4.0 / np.maximum(mse, 1e-12)))
            n_c = xc.shape[0]
            ms_sum += float(ms_ssim(xc, rc)) * n_c
            lp_sum += float(jnp.mean(lp_apply(lp_vars, xc, rc))) * n_c
        ps = np.concatenate(ps)
        ci = (1.96 * float(ps.std(ddof=1)) / np.sqrt(len(ps))
              if len(ps) > 1 else 0.0)
        return {"psnr": round(float(ps.mean()), 2),
                "psnr_ci95": round(float(ci), 2),
                "ms_ssim": round(ms_sum / len(ps), 4),
                "lpips_rf": round(lp_sum / len(ps), 4),
                "ratio": round(pix_bytes / comp_per_img, 1),
                "bpp": round(comp_per_img * 8 / (res * res), 3)}

    results = {}
    for frac in [float(f) for f in args.fracs.split(",")]:
        uc = UniformCABACCompressor(
            enc_cfg, gen_cfg, enc1, gen_vars, precision=precision,
            quantization_bits=args.bits, refine_qa_frac=frac)
        uc.calibrate(x_calib, refine_steps=args.refine,
                     refine_lr=args.refine_lr)
        recons, total = [], 0.0
        for i in range(0, args.n_eval, args.chunk):
            xc = jnp.asarray(x_eval[i:i + args.chunk])
            payload, meta = uc.compress_entropy(
                xc, refine_steps=args.refine, refine_lr=args.refine_lr)
            total += meta["comp_size"]
            recons.append(np.asarray(uc.decompress_entropy(payload, meta),
                                     np.float32))
        m = metrics(np.concatenate(recons), total / args.n_eval)
        name = (f"uniform-{args.bits}bit+cabac+priors"
                f"+refine{args.refine}-qa{frac:g}")
        results[name] = m
        print(f"{name}: {m}", flush=True)

    if args.apply and results:
        best_name = max(results, key=lambda n: results[n]["psnr"])
        rows = json.load(open("RD_TABLE.json"))
        rows[best_name] = results[best_name]
        json.dump(rows, open("RD_TABLE.json", "w"), indent=1)
        m = results[best_name]
        line = (f"| {best_name} | {m['psnr']} ± {m['psnr_ci95']} "
                f"| {m['ms_ssim']} | {m['lpips_rf']} | {m['ratio']}:1 "
                f"| {m['bpp']} |")
        md = open("RD_TABLE.md").read().splitlines()
        last = max(i for i, l in enumerate(md)
                   if l.startswith("| ") and "±" in l)
        md.insert(last + 1, line)
        open("RD_TABLE.md", "w").write("\n".join(md) + "\n")
        print(f"applied {best_name} to RD_TABLE.md/json", flush=True)


if __name__ == "__main__":
    main()
