"""Pick the encode-time refinement learning rate on the real model.

A tiny-config CPU A/B (round 5) showed constant Adam lr 0.05 beating the
long-standing 0.02 default by ~2 dB at 100 steps; this probe settles the
question on the actual 256 model + chip in ~10 minutes so the RD table and
demo pass the winner via --refine-lr instead of trusting a toy-scale result.

Prints one PSNR line per candidate lr and a final machine-readable
``BEST_LR <x>`` line for the supervisor chain to parse.

Usage:
  python tools/probe_refine_lr.py --stage1 runs/r5stage1/hvae_encoder_final.ic2t
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage1", required=True)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--eval-seed", type=int, default=1234)
    ap.add_argument("--truncation", type=float, default=0.7)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--bits", type=int, default=8)
    ap.add_argument("--lrs", default="0.02,0.035,0.05")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from image_compression_2_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from image_compression_2_tpu.codec import Compressor
    from image_compression_2_tpu.core import (EncoderConfig, GeneratorConfig,
                                              Precision)
    from image_compression_2_tpu.data.dataset import generate_synthetic_dataset
    from image_compression_2_tpu.models.generator import Generator
    from image_compression_2_tpu.quant.uniform import quantize_uniform
    from image_compression_2_tpu.train.checkpoint import load_checkpoint

    precision = Precision(compute_dtype=jnp.bfloat16)
    gen_cfg = GeneratorConfig(img_resolution=args.res)
    raw1, meta1 = load_checkpoint(args.stage1)
    cfg_meta = meta1.get("config", {})
    enc_kw = {k: tuple(cfg_meta[k])
              for k in ("block_split", "pool_grids", "hidden_dims")
              if cfg_meta.get(k)}
    enc_cfg = EncoderConfig(img_resolution=args.res, w_dim=gen_cfg.w_dim,
                            num_ws=gen_cfg.num_ws, **enc_kw)
    generator = Generator(gen_cfg, precision)
    _, k_gen = jax.random.split(jax.random.PRNGKey(args.seed))
    gen_vars = jax.jit(generator.init)(k_gen, jnp.zeros([1, gen_cfg.z_dim]))
    comp = Compressor(enc_cfg, gen_cfg, {"params": raw1["params"]}, gen_vars,
                      precision=precision)

    # held-out draws matching the RD table's eval distribution
    ds = generate_synthetic_dataset(
        generator, gen_vars, num_samples=args.n, batch_size=8,
        resolution=args.res, seed=args.eval_seed,
        truncation_psi=args.truncation)
    x = jnp.asarray(np.stack([
        ds[i][0] if isinstance(ds[i], tuple) else ds[i]
        for i in range(args.n)]))

    w0 = comp.encode(x, deterministic=True)
    best = (None, -1.0)
    for lr in [float(s) for s in args.lrs.split(",")]:
        w = comp.refine(w0, x, steps=args.steps, lr=lr)
        wq = quantize_uniform(jnp.asarray(w, jnp.float32), args.bits)
        recon = comp.decompress(wq)
        if recon.shape[1] != x.shape[1]:
            recon = jax.image.resize(recon, x.shape, method="bilinear")
        mse = np.mean(np.square(np.asarray(recon, np.float32)
                                - np.asarray(x, np.float32)), axis=(1, 2, 3))
        p = float(np.mean(10.0 * np.log10(4.0 / np.maximum(mse, 1e-12))))
        print(f"lr {lr}: psnr {p:.2f} dB ({args.steps} steps, "
              f"{args.bits}-bit grid, n={args.n})", flush=True)
        if p > best[1]:
            best = (lr, p)
    print(f"BEST_LR {best[0]}", flush=True)


if __name__ == "__main__":
    main()
