"""Command-line interface.

One entry point covering the reference's per-script CLIs (SURVEY §1 L6):

    python -m image_compression_2_tpu.cli train        (stylegan3_hvae_full.py)
    python -m image_compression_2_tpu.cli train-gumbel (gumbel_softmax_compression.py)
    python -m image_compression_2_tpu.cli compress     (compressor/cabac save paths)
    python -m image_compression_2_tpu.cli decompress
    python -m image_compression_2_tpu.cli compare      (cabac_compression.py --compare)
    python -m image_compression_2_tpu.cli generate     (memory_efficient_generator.py)
    python -m image_compression_2_tpu.cli eval         (hvae_training.py --mode test)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def _add_model_flags(p):
    p.add_argument("--bundle", type=str, default=None,
                   help="codec bundle (.ic2t) produced by `bundle`/training")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="training checkpoint (.ic2t) to build the codec from")
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--generator-resolution", type=int, default=None,
                   help="generator img_resolution (default: --resolution)")
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--no-bf16", dest="bf16", action="store_false")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n-embeddings", type=int, default=256)


def _load_codec(args, kind: str):
    import jax.numpy as jnp

    from ..codec.bundle import codec_from_training, load_codec
    from ..core.config import EncoderConfig, GeneratorConfig, Precision

    precision = Precision(
        compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32)
    if args.bundle:
        codec = load_codec(args.bundle, precision=precision)
        return _reconcile_kind(
            codec, kind, precision,
            bits=_scalar_bits(args) if kind == "uniform-cabac" else 8)
    gen_res = args.generator_resolution or args.resolution
    gen_cfg = GeneratorConfig(img_resolution=gen_res)
    if args.checkpoint:
        return codec_from_training(args.checkpoint, generator_cfg=gen_cfg,
                                   kind=kind, precision=precision,
                                   n_embeddings=args.n_embeddings,
                                   seed=args.seed,
                                   quantization_bits=(
                                       _scalar_bits(args)
                                       if kind == "uniform-cabac" else 8))
    print("note: no --bundle/--checkpoint given; using a random-init codec")
    enc_cfg = EncoderConfig(img_resolution=gen_res)
    if kind == "uniform":
        from ..codec import Compressor
        return Compressor.create(enc_cfg, gen_cfg, seed=args.seed,
                                 precision=precision)
    if kind == "uniform-cabac":
        from ..codec import UniformCABACCompressor
        return UniformCABACCompressor.create(
            enc_cfg, gen_cfg, seed=args.seed, precision=precision,
            quantization_bits=_scalar_bits(args) or 8)
    if kind == "cabac":
        from ..codec.cabac_compressor import CABACCompressor
        return CABACCompressor.create(enc_cfg, gen_cfg, seed=args.seed,
                                      n_embeddings=args.n_embeddings,
                                      precision=precision)
    from ..codec.gumbel_compressor import GumbelCompressor
    return GumbelCompressor.create(enc_cfg, gen_cfg, seed=args.seed,
                                   n_embeddings=args.n_embeddings,
                                   precision=precision)


def _scalar_bits(args):
    """--bits for the entropy-coded uniform codec: a scalar, or a
    comma-separated per-W-layer allocation (each layer gets its own symbol
    alphabet inside one shared coder — codec/uniform_cabac.py).  Returns
    None when --bits was not given, so bundle-stored settings can win."""
    spec = getattr(args, "bits", None)
    if spec is None:
        return None
    return _parse_bits(spec)


def _reconcile_kind(codec, kind: str, precision, bits=None):
    """Make a loaded bundle match the requested method.

    A Gumbel/CABAC bundle used with method=uniform (or vice versa) must not
    fall through to the wrong ``save_compressed`` signature — re-wrap the
    shared weights into the requested codec class where possible, else fail
    with a clear message.
    """
    from ..codec import Compressor
    from ..codec.cabac_compressor import CABACCompressor
    from ..codec.gumbel_compressor import GumbelCompressor

    from ..codec import UniformCABACCompressor

    want = {"uniform": Compressor, "gumbel": GumbelCompressor,
            "cabac": CABACCompressor,
            "uniform-cabac": UniformCABACCompressor}[kind]
    def _norm(b):
        return b if isinstance(b, int) else tuple(int(x) for x in b)

    if type(codec) is want:
        if (want is UniformCABACCompressor and bits is not None
                and _norm(codec._effective_bits) != _norm(bits)):
            # the bundle's stored bit depth would silently win over --bits:
            # rebuild at the requested rate instead (weights are shared)
            print(f"note: bundle stores quantization_bits="
                  f"{codec._effective_bits}; rebuilding codec at the "
                  f"requested --bits {bits}", flush=True)
            return want(codec.encoder_cfg, codec.generator_cfg,
                        codec.encoder_vars, codec.generator_vars,
                        training_resolution=codec.training_resolution,
                        precision=precision, quantization_bits=bits)
        return codec
    if want in (Compressor, UniformCABACCompressor):
        # any codec carries encoder+generator weights; drop the discretizer
        kw = ({"quantization_bits": bits or 8}
              if want is UniformCABACCompressor else {})
        return want(codec.encoder_cfg, codec.generator_cfg,
                    codec.encoder_vars, codec.generator_vars,
                    training_resolution=codec.training_resolution,
                    precision=precision, **kw)
    if not isinstance(codec, GumbelCompressor):
        raise SystemExit(
            f"bundle holds a {type(codec).__name__} (no discretization "
            f"codebook); cannot run method={kind!r} — re-train stage 2 or "
            f"pick --method uniform"
        )
    out = want(codec.encoder_cfg, codec.generator_cfg, codec.encoder_vars,
               codec.generator_vars, disc_vars=codec.disc_vars,
               n_embeddings=codec.n_embeddings,
               training_resolution=codec.training_resolution,
               precision=precision)
    if want is CABACCompressor and getattr(codec, "priors", None) is not None:
        out.priors = codec.priors
    return out


def cmd_train(args):
    from ..core.config import GeneratorConfig
    from ..train import train_hvae_encoder

    gen_cfg = GeneratorConfig(
        img_resolution=args.generator_resolution or 1024)
    train_hvae_encoder(
        output_dir=args.output, training_resolution=args.resolution,
        batch_size=args.batch_size, max_resolution=args.max_resolution,
        num_epochs=args.epochs, lr=args.lr, kl_weight=args.kl_weight,
        perceptual_weight=args.perceptual_weight, rec_weight=args.rec_weight,
        bf16=args.bf16, resume_from=args.resume, save_every=args.save_every,
        train_samples=args.train_samples, dataset_path=args.dataset,
        val_dataset_path=args.val_dataset, generator_cfg=gen_cfg,
        seed=args.seed, truncation_psi=args.truncation_psi,
        w_weight=args.w_weight, lr_decay=args.lr_decay,
        val_samples=args.val_samples, pool_grids=args.pool_grids,
        hidden_dims=args.hidden_dims, remat=args.remat,
    )


def cmd_train_gumbel(args):
    from ..core.config import GeneratorConfig
    from ..train import train_gumbel_hvae

    gen_cfg = GeneratorConfig(
        img_resolution=args.generator_resolution or 1024)
    train_gumbel_hvae(
        output_dir=args.output, training_resolution=args.resolution,
        batch_size=args.batch_size, max_resolution=args.max_resolution,
        num_epochs=args.epochs, lr=args.lr, temperature=args.temperature,
        temp_anneal_rate=args.temp_anneal_rate,
        min_temperature=args.min_temperature,
        n_embeddings=args.n_embeddings, kl_weight=args.kl_weight,
        perceptual_weight=args.perceptual_weight,
        gumbel_weight=args.gumbel_weight, rec_weight=args.rec_weight,
        bf16=args.bf16, resume_from=args.resume, save_every=args.save_every,
        train_samples=args.train_samples, dataset_path=args.dataset,
        val_dataset_path=args.val_dataset, generator_cfg=gen_cfg,
        seed=args.seed, truncation_psi=args.truncation_psi,
        w_weight=args.w_weight, lr_decay=args.lr_decay,
        val_samples=args.val_samples, pool_grids=args.pool_grids,
        hidden_dims=args.hidden_dims, remat=args.remat,
    )


def _parse_psi(spec: str):
    """'0.7' -> 0.7; '0.5,0.7,1.0' -> mixed-psi list."""
    if "," in spec:
        return [float(p) for p in spec.split(",")]
    return float(spec)


def _parse_grid(spec: str):
    """'1,2,4' -> (1, 2, 4) per-head (global, medium, fine) tuple."""
    parts = tuple(int(g) for g in spec.split(","))
    if len(parts) != 3:
        raise ValueError(f"expected 3 comma-separated ints, got {spec!r}")
    return parts


def _parse_bits(spec: str):
    """'8' -> 8; '12,12,10,...' -> per-W-layer allocation list."""
    if "," in spec:
        return [int(b) for b in spec.split(",")]
    return int(spec)


def cmd_compress(args):
    import jax.numpy as jnp

    from ..utils.images import load_image

    method = args.method
    if method == "auto":
        method = "cabac" if args.output.endswith(".cabac") else "uniform"
    codec = _load_codec(args, method)
    x = jnp.asarray(load_image(args.image, args.resolution))[None]
    t0 = time.time()
    if method in ("cabac", "uniform-cabac"):
        orig, comp, ratio = codec.save_compressed(
            x, args.output, use_cabac=not args.no_cabac,
            refine_steps=args.refine_steps, refine_lr=args.refine_lr)
    elif method == "gumbel":
        orig, comp, ratio = codec.save_compressed(
            x, args.output, refine_steps=args.refine_steps,
            refine_lr=args.refine_lr)
    else:
        orig, comp, ratio = codec.save_compressed(
            x, args.output, quantization_bits=_parse_bits(args.bits or "8"),
            refine_steps=args.refine_steps, refine_lr=args.refine_lr)
    dt = time.time() - t0
    print(f"compressed {args.image} -> {args.output}")
    print(f"  original: {orig / 1024:.2f} KB   compressed: {comp / 1024:.2f} KB"
          f"   ratio: {ratio:.2f}x   time: {dt:.2f}s")


def cmd_decompress(args):
    from ..utils.images import save_image

    method = args.method
    if method == "auto":
        method = "cabac" if args.compressed.endswith(".cabac") else "uniform"
    codec = _load_codec(args, method)
    t0 = time.time()
    img, ratio = codec.load_compressed(args.compressed)
    dt = time.time() - t0
    save_image(np.asarray(img)[0], args.output)
    print(f"decompressed {args.compressed} -> {args.output} "
          f"(ratio {ratio:.2f}x, {dt:.2f}s)")


def cmd_compare(args):
    """Compare classical codecs against every HVAE path on one image.

    Reproduces the metric set of the reference's published table
    (/root/reference/README.md:376-388): PSNR / MS-SSIM / LPIPS / ratio per
    method, with PNG / JPEG / JPEG 2000 / WebP classical rows.  The LPIPS
    column uses the random-feature fallback when no pretrained VGG is
    available (comparable between rows of one table)."""
    import io

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from ..metrics.report import evaluate_roundtrip
    from ..train.lpips import create_lpips
    from ..utils.images import load_image, to_uint8

    os.makedirs(args.output, exist_ok=True)
    x_np = load_image(args.image, args.resolution)
    x = jnp.asarray(x_np)[None]
    pil = Image.fromarray(to_uint8(x_np))
    _, lp_vars, lp_apply = create_lpips(seed=0, image_size=args.resolution)

    rows = []

    def add_row(name, size, recon):
        if recon is None:
            rows.append((name, int(size), None))
            return
        recon = jnp.asarray(recon, jnp.float32)
        if recon.ndim == 3:
            recon = recon[None]
        if recon.shape[1] != x.shape[1]:
            recon = jax.image.resize(recon, x.shape, method="bilinear")
        m = evaluate_roundtrip(np.asarray(x), np.asarray(recon), size)
        m["lpips_rf"] = float(jnp.mean(lp_apply(lp_vars, x, recon)))
        rows.append((name, int(size), m))

    for fmt, name, kwargs in [
        ("PNG", "png", {}),
        ("JPEG", "jpeg-q90", {"quality": 90}),
        ("JPEG2000", "jpeg2000-20:1",
         {"quality_mode": "rates", "quality_layers": [20]}),
        # rate-matched to the 8-bit HVAE rows: PIL's rate is vs uint8 pixels,
        # the table's ratio is vs fp32, so PIL rate 24 = 96:1 in table units
        # — the equal-ratio classical comparison, not just high-rate points
        ("JPEG2000", "jpeg2000-96:1",
         {"quality_mode": "rates", "quality_layers": [24]}),
        ("WEBP", "webp-q90", {"quality": 90}),
    ]:
        buf = io.BytesIO()
        try:
            pil.save(buf, format=fmt, **kwargs)
            decoded = np.asarray(
                Image.open(io.BytesIO(buf.getvalue())).convert("RGB"),
                np.float32) / 127.5 - 1.0
        except Exception as e:
            print(f"note: {fmt} unavailable ({e}); skipping row")
            continue
        add_row(name, buf.getbuffer().nbytes, decoded)

    codec = _load_codec(args, "cabac")
    for use_cabac, name in [(False, "hvae-raw"), (True, "hvae-cabac")]:
        payload, meta = codec.compress_entropy(x, use_cabac=use_cabac)
        recon = codec.decompress_entropy(payload, meta)
        add_row(name, len(payload), recon)
    if args.refine_steps:
        payload, meta = codec.compress_entropy(
            x, use_cabac=True, refine_steps=args.refine_steps,
            refine_lr=args.refine_lr)
        add_row(f"hvae-cabac+refine{args.refine_steps}", meta["comp_size"],
                codec.decompress_entropy(payload, meta))

    # uniform-quantization row reuses the SAME encoder/generator weights
    from ..codec import Compressor

    uni = Compressor(codec.encoder_cfg, codec.generator_cfg,
                     codec.encoder_vars, codec.generator_vars,
                     training_resolution=codec.training_resolution)
    f = os.path.join(args.output, "uniform.npz")
    orig, comp, ratio = uni.save_compressed(x, f, quantization_bits=args.bits)
    recon, _ = uni.load_compressed(f)
    add_row(f"hvae-uniform-{args.bits}bit", int(comp), recon)

    # entropy-coded uniform indices (same weights, no codebook needed)
    from ..codec import UniformCABACCompressor

    ucab = UniformCABACCompressor(
        codec.encoder_cfg, codec.generator_cfg, codec.encoder_vars,
        codec.generator_vars, training_resolution=codec.training_resolution,
        quantization_bits=int(args.bits))
    payload, meta = ucab.compress_entropy(x)
    add_row(f"hvae-uniform-{args.bits}bit-cabac", meta["comp_size"],
            ucab.decompress_entropy(payload, meta))

    if args.refine_steps:
        # Encode-time inversion refinement (codec/refine.py): the framework's
        # biggest distortion lever (+21 dB on held-out 256²), same decoder.
        n = args.refine_steps
        f = os.path.join(args.output, "uniform_refined.npz")
        _, comp, _ = uni.save_compressed(x, f, quantization_bits=args.bits,
                                         refine_steps=n,
                                         refine_lr=args.refine_lr)
        recon, _ = uni.load_compressed(f)
        add_row(f"hvae-uniform-{args.bits}bit+refine{n}", int(comp), recon)
        payload, meta = ucab.compress_entropy(x, refine_steps=n,
                                              refine_lr=args.refine_lr)
        add_row(f"hvae-uniform-{args.bits}bit-cabac+refine{n}",
                meta["comp_size"], ucab.decompress_entropy(payload, meta))

    pix_bytes = x_np.size * 4
    print(f"\n{'method':24s} {'size':>10s} {'ratio':>8s} {'psnr':>7s} "
          f"{'ms-ssim':>8s} {'lpips(rf)':>9s}")
    for name, size, m in rows:
        psnr_s = f"{m['psnr']:.2f}" if m else "-"
        mss = m.get("ms_ssim") if m else None
        mss_s = f"{mss:.4f}" if mss is not None else (
            f"{m['ssim']:.4f}*" if m else "-")
        lp_s = f"{m['lpips_rf']:.4f}" if m else "-"
        print(f"{name:24s} {size / 1024:8.2f}KB {pix_bytes / size:7.1f}x "
              f"{psnr_s:>7s} {mss_s:>8s} {lp_s:>9s}")
    if any(m and "ms_ssim" not in m for _, _, m in rows):
        print("* SSIM (image too small for 5-scale MS-SSIM)")


def cmd_generate(args):
    import jax.numpy as jnp

    from ..core.config import GeneratorConfig, Precision
    from ..models.sampler import BatchedSampler

    gen_cfg = GeneratorConfig(
        img_resolution=args.generator_resolution or args.resolution)
    gen_vars = None
    if args.bundle:
        from ..codec.bundle import load_codec
        codec = load_codec(args.bundle)
        gen_cfg = codec.generator_cfg
        gen_vars = codec.generator_vars
    sampler = BatchedSampler(
        gen_cfg, gen_vars=gen_vars, batch_size=args.batch_size,
        precision=Precision(
            compute_dtype=jnp.bfloat16 if args.bf16 else jnp.float32),
        seed=args.seed,
    )
    os.makedirs(args.output, exist_ok=True)
    t0 = time.time()
    if args.seeds:
        seeds = [int(s) for s in args.seeds.split(",")]
        sampler.generate_from_seeds(seeds, args.truncation_psi, args.output)
        n = len(seeds)
    else:
        sampler.generate_images(args.num, seed=args.seed,
                                truncation_psi=args.truncation_psi,
                                output_dir=args.output)
        n = args.num
    dt = time.time() - t0
    print(f"generated {n} images to {args.output} "
          f"({n / dt:.2f} img/s incl. compile)")


def cmd_eval(args):
    import jax.numpy as jnp

    from ..metrics.report import evaluate_roundtrip, format_report
    from ..utils.images import load_image, save_image

    codec = _load_codec(args, "uniform")
    x = jnp.asarray(load_image(args.image, args.resolution))[None]
    os.makedirs(args.output, exist_ok=True)
    report_lines = []
    recons = []
    for bits in [int(b) for b in args.bits_sweep.split(",")]:
        f = os.path.join(args.output, f"eval_{bits}bit.npz")
        orig, comp, ratio = codec.save_compressed(x, f, quantization_bits=bits)
        recon, _ = codec.load_compressed(f)
        if recon.shape[1] != x.shape[1]:
            import jax
            recon = jax.image.resize(recon, x.shape, method="bilinear")
        m = evaluate_roundtrip(np.asarray(x), np.asarray(recon), comp)
        report_lines.append(format_report(m, title=f"{bits}-bit uniform"))
        save_image(np.asarray(recon)[0],
                   os.path.join(args.output, f"recon_{bits}bit.png"))
        recons.append(np.asarray(recon)[0])
    # side-by-side grid: original | recon per bit setting
    from ..utils.images import image_grid
    grid = image_grid(np.stack([np.asarray(x)[0]] + recons),
                      cols=len(recons) + 1)
    save_image(grid, os.path.join(args.output, "comparison_grid.png"))
    report = "\n".join(report_lines)
    with open(os.path.join(args.output, "metrics.txt"), "w") as fh:
        fh.write(report + "\n")
    print(report)


def cmd_download(args):
    """Dataset acquisition — surface parity with the reference's
    download_imagenet100.py (:21-296): kaggle download, structure detection,
    optional flat-class 80/20 split, and stats."""
    from ..data.imagenet100 import (
        dataset_stats,
        detect_structure,
        download_imagenet100,
        kaggle_available,
        split_flat_classes,
    )

    root = args.target
    if args.stats_only:
        pass
    elif os.path.isdir(root) and os.listdir(root):
        print(f"{root} already populated; skipping download")
    elif kaggle_available():
        print("downloading ambityga/imagenet100 via the Kaggle API ...")
        root = download_imagenet100(root)
    else:
        raise SystemExit(
            "kaggle package/credentials unavailable; place the dataset "
            f"under {root} manually (class dirs of jpegs), then re-run "
            "with --stats-only"
        )
    structure = detect_structure(root)
    print(f"structure: {structure}")
    if args.split and structure.get("layout") == "flat":
        train_paths, val_paths = split_flat_classes(root, val_fraction=0.2,
                                                    seed=args.seed)
        print(f"flat-layout 80/20 split -> {len(train_paths)} train / "
              f"{len(val_paths)} val images")
    stats = dataset_stats(root)
    for k, v in stats.items():
        print(f"  {k}: {v}")


def cmd_bundle(args):
    from ..codec.bundle import codec_from_training, save_codec

    codec = _load_codec(args, args.kind)
    save_codec(args.output, codec)
    print(f"wrote codec bundle: {args.output}")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="image_compression_2_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("train", help="stage-1 HVAE encoder training")
    p.add_argument("--output", type=str, default="./output")
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--generator-resolution", type=int, default=None)
    p.add_argument("--max-resolution", type=int, default=1024)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--kl-weight", type=float, default=0.01)
    p.add_argument("--perceptual-weight", type=float, default=0.8)
    p.add_argument("--rec-weight", type=float, default=1.0)
    p.add_argument("--w-weight", type=float, default=0.0,
                   help="W+-space L2 supervision weight (synthetic data "
                        "only; the true latents are known)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--save-every", type=int, default=10)
    p.add_argument("--train-samples", type=int, default=50)
    p.add_argument("--dataset", type=str, default=None)
    p.add_argument("--val-dataset", type=str, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--truncation-psi", type=_parse_psi, default=1.0,
                   help="synthetic-data truncation; a comma list (e.g. "
                        "'0.5,0.7,1.0') mixes psis across the dataset")
    p.add_argument("--lr-decay", action="store_true",
                   help="cosine-decay the lr to 10%% over the run")
    p.add_argument("--val-samples", type=int, default=0,
                   help="held-out synthetic validation samples per epoch")
    p.add_argument("--pool-grids", type=_parse_grid, default=None,
                   help="projector pool grids 'global,medium,fine' (e.g. "
                        "'1,2,4'); default 1,1,1 = reference global pooling")
    p.add_argument("--hidden-dims", type=_parse_grid, default=None,
                   help="projector MLP widths 'global,medium,fine'")
    p.add_argument("--remat", action="store_true",
                   help="rematerialise the synthesis chain in the train "
                        "step (fits full-res 1024 training in HBM at the "
                        "cost of recompute)")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("train-gumbel", help="stage-2 Gumbel training")
    p.add_argument("--output", type=str, default="./output_gumbel")
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--generator-resolution", type=int, default=None)
    p.add_argument("--max-resolution", type=int, default=1024)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--temp-anneal-rate", type=float, default=3e-5)
    p.add_argument("--min-temperature", type=float, default=0.5)
    p.add_argument("--n-embeddings", type=int, default=256)
    p.add_argument("--kl-weight", type=float, default=0.01)
    p.add_argument("--perceptual-weight", type=float, default=0.8)
    # 0.1 with the normalized perplexity loss ≈ the reference's intent at a
    # scale that does not swamp rec/perceptual (see train/losses.py)
    p.add_argument("--gumbel-weight", type=float, default=0.1)
    p.add_argument("--rec-weight", type=float, default=1.0)
    p.add_argument("--w-weight", type=float, default=0.0,
                   help="W+-space L2 supervision weight (synthetic data)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--save-every", type=int, default=10)
    p.add_argument("--train-samples", type=int, default=50)
    p.add_argument("--dataset", type=str, default=None)
    p.add_argument("--val-dataset", type=str, default=None)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--truncation-psi", type=_parse_psi, default=1.0,
                   help="synthetic-data truncation; a comma list (e.g. "
                        "'0.5,0.7,1.0') mixes psis across the dataset")
    p.add_argument("--lr-decay", action="store_true",
                   help="cosine-decay the lr to 10%% over the run")
    p.add_argument("--val-samples", type=int, default=0,
                   help="held-out synthetic validation samples per epoch")
    p.add_argument("--pool-grids", type=_parse_grid, default=None,
                   help="projector pool grids 'global,medium,fine'")
    p.add_argument("--hidden-dims", type=_parse_grid, default=None,
                   help="projector MLP widths 'global,medium,fine'")
    p.add_argument("--remat", action="store_true",
                   help="rematerialise the synthesis chain in the train "
                        "step (memory for recompute; 1024² flagship config)")
    p.set_defaults(fn=cmd_train_gumbel)

    p = sub.add_parser("compress", help="compress an image file")
    _add_model_flags(p)
    p.add_argument("--image", type=str, required=True)
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--method",
                   choices=["auto", "uniform", "gumbel", "cabac",
                            "uniform-cabac"],
                   default="auto")
    p.add_argument("--refine-steps", type=int, default=0,
                   help="encode-time inversion refinement steps on W+ "
                        "(all methods; slower encode, better quality at "
                        "the same rate)")
    p.add_argument("--refine-lr", type=float, default=0.02,
                   help="Adam lr for --refine-steps (probe with "
                        "tools/probe_refine_lr.py)")
    p.add_argument("--bits", type=str, default=None,
                   help="bit depth (default 8), or a comma list for "
                        "per-W-layer allocation (e.g. 12,12,10,10,8,8,8,8,"
                        "6,6,6,6,4,4,4,4); for --method uniform-cabac with "
                        "a --bundle, the bundle's stored depth wins unless "
                        "--bits is given explicitly")
    p.add_argument("--no-cabac", action="store_true")
    p.set_defaults(fn=cmd_compress)

    p = sub.add_parser("decompress", help="decompress to an image file")
    _add_model_flags(p)
    p.add_argument("--compressed", type=str, required=True)
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--method",
                   choices=["auto", "uniform", "gumbel", "cabac",
                            "uniform-cabac"],
                   default="auto")
    p.add_argument("--bits", type=str, default=None,
                   help="bit depth for --method uniform-cabac (must match "
                        "the encode setting; the stream's latents tag is "
                        "verified at decode; defaults to the bundle's "
                        "stored depth, else 8)")
    p.set_defaults(fn=cmd_decompress)

    p = sub.add_parser("compare", help="compare vs PNG/JPEG/WebP")
    _add_model_flags(p)
    p.add_argument("--image", type=str, required=True)
    p.add_argument("--output", type=str, default="./compare_out")
    p.add_argument("--bits", type=int, default=8)
    p.add_argument("--refine-steps", type=int, default=0,
                   help="adds encode-time-refined HVAE rows (gumbel+cabac, "
                        "uniform float, uniform+cabac with affine range)")
    p.add_argument("--refine-lr", type=float, default=0.02,
                   help="Adam lr for the refinement rows (probe with "
                        "tools/probe_refine_lr.py)")
    p.set_defaults(fn=cmd_compare)

    p = sub.add_parser("generate", help="sample images from the generator")
    _add_model_flags(p)
    p.add_argument("--output", type=str, default="./generated")
    p.add_argument("--num", type=int, default=4)
    p.add_argument("--seeds", type=str, default=None,
                   help="comma-separated explicit seeds")
    p.add_argument("--truncation-psi", type=float, default=1.0)
    p.add_argument("--batch-size", type=int, default=4)
    p.set_defaults(fn=cmd_generate)

    p = sub.add_parser("eval", help="roundtrip quality report (PSNR/SSIM/bpp)")
    _add_model_flags(p)
    p.add_argument("--image", type=str, required=True)
    p.add_argument("--output", type=str, default="./eval_out")
    p.add_argument("--bits-sweep", type=str, default="4,8,10")
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("download",
                       help="fetch/inspect the ImageNet-100 dataset")
    p.add_argument("--target", type=str, default="./imagenet100")
    p.add_argument("--split", action="store_true",
                   help="report an 80/20 train/val split for flat layouts")
    p.add_argument("--stats-only", action="store_true",
                   help="skip download; just detect structure and count")
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_download)

    p = sub.add_parser("bundle", help="package a training checkpoint as a codec bundle")
    _add_model_flags(p)
    p.add_argument("--output", type=str, required=True)
    p.add_argument("--kind", choices=["auto", "uniform", "gumbel", "cabac"],
                   default="auto")
    p.set_defaults(fn=cmd_bundle)

    args = ap.parse_args(argv)
    from ..utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args.fn(args)


if __name__ == "__main__":
    main()
