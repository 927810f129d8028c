"""CLI + codec-bundle tests (tiny configs, CPU)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_compression_2_tpu.cli.__main__ import main as cli_main
from image_compression_2_tpu.codec import Compressor
from image_compression_2_tpu.codec.bundle import (
    codec_from_training,
    load_codec,
    save_codec,
)
from image_compression_2_tpu.codec.cabac_compressor import CABACCompressor
from image_compression_2_tpu.core import EncoderConfig, GeneratorConfig
from image_compression_2_tpu.models.sampler import BatchedSampler
from image_compression_2_tpu.utils import save_image

RES = 16


def _cfgs():
    gen_cfg = GeneratorConfig.tiny(img_resolution=RES, num_layers=4,
                                   margin_size=1)
    enc_cfg = EncoderConfig.tiny(img_resolution=RES, w_dim=gen_cfg.w_dim,
                                 num_ws=gen_cfg.num_ws, block_split=(2, 4))
    return gen_cfg, enc_cfg


def test_bundle_roundtrip(tmp_path):
    gen_cfg, enc_cfg = _cfgs()
    comp = Compressor.create(enc_cfg, gen_cfg, seed=0)
    x = jax.random.uniform(jax.random.PRNGKey(0), [1, RES, RES, 3],
                           minval=-1, maxval=1)
    w_before = np.asarray(comp.compress(x, 8))
    path = str(tmp_path / "codec.ic2t")
    save_codec(path, comp)
    comp2 = load_codec(path)
    assert isinstance(comp2, Compressor)
    np.testing.assert_array_equal(np.asarray(comp2.compress(x, 8)), w_before)

    cab = CABACCompressor.create(enc_cfg, gen_cfg, seed=0, n_embeddings=32)
    cab.calibrate(np.asarray(jnp.tile(x, (4, 1, 1, 1))), batch_size=4)
    path2 = str(tmp_path / "cabac.ic2t")
    save_codec(path2, cab)
    cab2 = load_codec(path2)
    assert isinstance(cab2, CABACCompressor)
    assert cab2.priors is not None
    np.testing.assert_array_equal(cab2.priors, cab.priors)
    p1, m1 = cab.compress_entropy(x)
    p2, m2 = cab2.compress_entropy(x)
    assert p1 == p2


def test_codec_from_training_checkpoint(tmp_path):
    from image_compression_2_tpu.train import train_gumbel_hvae, train_hvae_encoder

    gen_cfg, enc_cfg = _cfgs()
    out = str(tmp_path / "t1")
    train_hvae_encoder(output_dir=out, training_resolution=RES, batch_size=4,
                       num_epochs=1, save_every=1, train_samples=4,
                       generator_cfg=gen_cfg, encoder_cfg=enc_cfg,
                       use_lpips=False, seed=0)
    ckpt = os.path.join(out, "hvae_encoder_final.ic2t")
    codec = codec_from_training(ckpt, generator_cfg=gen_cfg)
    assert isinstance(codec, Compressor)
    # NOTE: enc cfg in checkpoint meta defaults block_split (5,12); rebuild
    # with explicit cfg for tiny tests
    out2 = str(tmp_path / "t2")
    train_gumbel_hvae(output_dir=out2, training_resolution=RES, batch_size=4,
                      num_epochs=1, save_every=1, train_samples=4,
                      n_embeddings=32, generator_cfg=gen_cfg,
                      encoder_cfg=enc_cfg, use_lpips=False, seed=0)
    ckpt2 = os.path.join(out2, "gumbel_hvae_final.ic2t")
    from image_compression_2_tpu.codec.gumbel_compressor import GumbelCompressor
    codec2 = codec_from_training(ckpt2, generator_cfg=gen_cfg)
    assert isinstance(codec2, GumbelCompressor)
    assert codec2.n_embeddings == 32


def test_sampler(tmp_path):
    gen_cfg, _ = _cfgs()
    s = BatchedSampler(gen_cfg, batch_size=2, seed=0)
    imgs = s.generate_from_seeds([5, 6, 7], output_dir=str(tmp_path / "g"))
    assert imgs.shape == (3, RES, RES, 3)
    assert os.path.exists(tmp_path / "g" / "seed_000005.png")
    # per-seed reproducibility regardless of batching
    single = s.generate_single_image(seed=6)
    np.testing.assert_allclose(single, imgs[1], atol=1e-5)
    # truncation changes output
    trunc = s.generate_from_seeds([5], truncation_psi=0.5)
    assert np.abs(trunc[0] - imgs[0]).max() > 0


@pytest.mark.filterwarnings("ignore")
def test_cli_compress_decompress_eval(tmp_path, capsys):
    img_path = str(tmp_path / "input.png")
    save_image(np.random.RandomState(0).uniform(-1, 1, [RES, RES, 3]), img_path)

    # build a tiny bundle first so CLI runs fast
    gen_cfg, enc_cfg = _cfgs()
    comp = Compressor.create(enc_cfg, gen_cfg, seed=0)
    bundle = str(tmp_path / "codec.ic2t")
    save_codec(bundle, comp)

    npz = str(tmp_path / "out.npz")
    cli_main(["compress", "--bundle", bundle, "--image", img_path,
              "--output", npz, "--resolution", str(RES), "--no-bf16"])
    assert os.path.exists(npz)
    out_png = str(tmp_path / "recon.png")
    cli_main(["decompress", "--bundle", bundle, "--compressed", npz,
              "--output", out_png, "--resolution", str(RES), "--no-bf16"])
    assert os.path.exists(out_png)

    evald = str(tmp_path / "eval")
    cli_main(["eval", "--bundle", bundle, "--image", img_path,
              "--output", evald, "--resolution", str(RES), "--no-bf16",
              "--bits-sweep", "4,8"])
    assert os.path.exists(os.path.join(evald, "metrics.txt"))
    text = open(os.path.join(evald, "metrics.txt")).read()
    assert "psnr" in text and "8-bit" in text

    cab = CABACCompressor.create(enc_cfg, gen_cfg, seed=0, n_embeddings=32)
    cbundle = str(tmp_path / "cab.ic2t")
    save_codec(cbundle, cab)
    cfile = str(tmp_path / "out.cabac")
    cli_main(["compress", "--bundle", cbundle, "--image", img_path,
              "--output", cfile, "--resolution", str(RES), "--no-bf16"])
    assert os.path.exists(cfile)
    out2 = str(tmp_path / "recon2.png")
    cli_main(["decompress", "--bundle", cbundle, "--compressed", cfile,
              "--output", out2, "--resolution", str(RES), "--no-bf16"])
    assert os.path.exists(out2)

    gen_dir = str(tmp_path / "gen")
    cli_main(["generate", "--bundle", bundle, "--output", gen_dir,
              "--num", "2", "--batch-size", "2", "--no-bf16"])
    assert len(os.listdir(gen_dir)) == 2

    cmp_dir = str(tmp_path / "cmp")
    cli_main(["compare", "--bundle", cbundle, "--image", img_path,
              "--output", cmp_dir, "--resolution", str(RES), "--no-bf16",
              "--refine-steps", "2"])
    captured = capsys.readouterr().out
    assert "hvae-cabac" in captured and "png" in captured
    # full reference-shaped metric set (README.md:376-388): classical rows
    # carry quality numbers too, plus JPEG 2000 and MS-SSIM/LPIPS columns
    assert "jpeg2000" in captured and "ms-ssim" in captured
    assert "lpips(rf)" in captured
    # encode-time-refined rows (round-5: compare must show the +refine lever)
    assert "hvae-cabac+refine2" in captured
    assert "+refine2" in captured and "-cabac+refine2" in captured
    jpeg_row = [l for l in captured.splitlines() if l.startswith("jpeg-q90")]
    assert jpeg_row and "-" not in jpeg_row[0].split()[3]  # psnr measured


def test_cli_download_stats_only(tmp_path, capsys):
    # flat class-dir layout
    for cls in ("n001", "n002"):
        d = tmp_path / "ds" / cls
        d.mkdir(parents=True)
        for i in range(3):
            save_image(np.zeros([4, 4, 3], np.float32), str(d / f"{i}.png"))
    cli_main(["download", "--target", str(tmp_path / "ds"), "--stats-only",
              "--split"])
    out = capsys.readouterr().out
    assert "layout" in out and "num_images: 6" in out
    assert "80/20 split" in out


def test_cli_bundle_kind_reconciliation(tmp_path, capsys):
    """A Gumbel/CABAC bundle with method=uniform (and vice versa) must not
    crash on the wrong save_compressed signature."""
    img_path = str(tmp_path / "input.png")
    save_image(np.random.RandomState(1).uniform(-1, 1, [RES, RES, 3]), img_path)
    gen_cfg, enc_cfg = _cfgs()

    cab = CABACCompressor.create(enc_cfg, gen_cfg, seed=0, n_embeddings=32)
    cbundle = str(tmp_path / "cab.ic2t")
    save_codec(cbundle, cab)

    # cabac bundle + uniform method -> re-wrapped, runs fine
    npz = str(tmp_path / "uni.npz")
    cli_main(["compress", "--bundle", cbundle, "--image", img_path,
              "--output", npz, "--method", "uniform",
              "--resolution", str(RES), "--no-bf16"])
    assert os.path.exists(npz)

    # uniform bundle + cabac method -> clear error, not a TypeError
    uni = Compressor.create(enc_cfg, gen_cfg, seed=0)
    ubundle = str(tmp_path / "uni.ic2t")
    save_codec(ubundle, uni)
    with pytest.raises(SystemExit, match="discretization"):
        cli_main(["compress", "--bundle", ubundle, "--image", img_path,
                  "--output", str(tmp_path / "x.cabac"), "--method", "cabac",
                  "--resolution", str(RES), "--no-bf16"])


def test_cli_uniform_cabac_roundtrip(tmp_path):
    """Entropy-coded uniform codec through the CLI: a stage-1 (uniform)
    bundle drives --method uniform-cabac end-to-end, and decode verifies
    the latents tag."""
    img_path = str(tmp_path / "input.png")
    save_image(np.random.RandomState(1).uniform(-1, 1, [RES, RES, 3]),
               img_path)
    gen_cfg, enc_cfg = _cfgs()
    comp = Compressor.create(enc_cfg, gen_cfg, seed=0)
    bundle = str(tmp_path / "codec.ic2t")
    save_codec(bundle, comp)

    cfile = str(tmp_path / "out.cabac")
    cli_main(["compress", "--bundle", bundle, "--image", img_path,
              "--output", cfile, "--resolution", str(RES), "--no-bf16",
              "--method", "uniform-cabac", "--bits", "6"])
    assert os.path.exists(cfile)
    out_png = str(tmp_path / "recon.png")
    cli_main(["decompress", "--bundle", bundle, "--compressed", cfile,
              "--output", out_png, "--resolution", str(RES), "--no-bf16",
              "--method", "uniform-cabac", "--bits", "6"])
    assert os.path.exists(out_png)

    # wrong bits at decode -> loud latents-tag mismatch, not garbage
    with pytest.raises(ValueError, match="uniform-6bit"):
        cli_main(["decompress", "--bundle", bundle, "--compressed", cfile,
                  "--output", out_png, "--resolution", str(RES), "--no-bf16",
                  "--method", "uniform-cabac", "--bits", "8"])

    # per-layer --bits rides the same CLI path (per-layer symbol alphabets
    # inside one shared coder — codec/uniform_cabac.py)
    alloc = ",".join(["8", "6"] + ["4"] * (gen_cfg.num_ws - 2))
    plfile = str(tmp_path / "pl.cabac")
    cli_main(["compress", "--bundle", bundle, "--image", img_path,
              "--output", plfile, "--resolution", str(RES), "--no-bf16",
              "--method", "uniform-cabac", "--bits", alloc])
    out2 = str(tmp_path / "recon_pl.png")
    cli_main(["decompress", "--bundle", bundle, "--compressed", plfile,
              "--output", out2, "--resolution", str(RES), "--no-bf16",
              "--method", "uniform-cabac", "--bits", alloc])
    assert os.path.exists(out2)


def test_uniform_cabac_bundle_roundtrip(tmp_path):
    """A calibrated UniformCABACCompressor bundles with its priors and
    quantization_bits intact."""
    from image_compression_2_tpu.codec import UniformCABACCompressor

    gen_cfg, enc_cfg = _cfgs()
    uc = UniformCABACCompressor.create(enc_cfg, gen_cfg, seed=0,
                                       quantization_bits=6)
    x = jax.random.uniform(jax.random.PRNGKey(2), [4, RES, RES, 3],
                           minval=-1, maxval=1)
    uc.calibrate(np.asarray(x), batch_size=4)
    path = str(tmp_path / "uc.ic2t")
    save_codec(path, uc)
    uc2 = load_codec(path)
    assert isinstance(uc2, UniformCABACCompressor)
    assert uc2.quantization_bits == 6
    np.testing.assert_array_equal(uc2.priors, uc.priors)
    p1, m1 = uc.compress_entropy(x[:1])
    p2, m2 = uc2.compress_entropy(x[:1])
    assert p1 == p2 and m1["latents"] == "uniform-6bit"
