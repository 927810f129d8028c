"""Data pipeline + metrics + image-utils tests."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from image_compression_2_tpu.data import (
    BatchLoader,
    ImageFolderDataset,
    SyntheticDataset,
    detect_structure,
    generate_synthetic_dataset,
    split_flat_classes,
)
from image_compression_2_tpu.metrics import (
    MetricsLogger,
    bits_per_pixel,
    evaluate_roundtrip,
    ms_ssim,
    psnr,
    ssim,
)
from image_compression_2_tpu.utils import (
    from_uint8,
    image_grid,
    load_image,
    save_image,
    to_uint8,
)


def _write_images(root, layout="flat"):
    rng = np.random.RandomState(0)
    for cls in ["n01", "n02"]:
        d = os.path.join(root, cls)
        os.makedirs(d, exist_ok=True)
        for i in range(4):
            img = rng.uniform(-1, 1, [20, 24, 3])
            save_image(img, os.path.join(d, f"im{i}.png"))


def test_image_io_roundtrip(tmp_path):
    img = np.random.RandomState(0).uniform(-1, 1, [16, 16, 3]).astype(np.float32)
    f = str(tmp_path / "x.png")
    save_image(img, f)
    back = load_image(f)
    assert back.shape == (16, 16, 3)
    # uint8 quantization error only
    assert np.abs(back - img).max() <= 1.0 / 127.5 + 1e-6
    # uint8 conversion exact roundtrip
    u = to_uint8(img)
    np.testing.assert_array_equal(to_uint8(from_uint8(u)), u)


def test_image_grid():
    batch = np.zeros([5, 4, 6, 3])
    g = image_grid(batch, cols=3)
    assert g.shape == (2 * 4, 3 * 6, 3)


def test_folder_dataset_and_loader(tmp_path):
    _write_images(str(tmp_path))
    ds = ImageFolderDataset(str(tmp_path), resolution=16)
    assert len(ds) == 8
    item = ds[0]
    assert item.shape == (16, 16, 3) and item.min() >= -1 and item.max() <= 1

    loader = BatchLoader(ds, batch_size=3, shuffle=True, seed=0, prefetch=2)
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    assert all(b.shape == (3, 16, 16, 3) for b in batches)
    # different epoch order, same multiset
    b2 = list(loader)
    assert len(b2) == 2
    # corrupt file handling: returns zeros, no crash
    bad = str(tmp_path / "n01" / "bad.jpg")
    with open(bad, "wb") as f:
        f.write(b"not an image")
    ds2 = ImageFolderDataset(str(tmp_path), resolution=16)
    idx = ds2.paths.index(bad)
    z = ds2[idx]
    np.testing.assert_array_equal(z, 0)


def test_synthetic_dataset_generation():
    from image_compression_2_tpu.core import GeneratorConfig
    from image_compression_2_tpu.models import Generator

    cfg = GeneratorConfig.tiny(img_resolution=16, num_layers=4, margin_size=1)
    gen = Generator(cfg)
    gen_vars = jax.jit(gen.init)(jax.random.PRNGKey(0), jnp.zeros([1, cfg.z_dim]))
    ds = generate_synthetic_dataset(gen, gen_vars, num_samples=5, batch_size=2,
                                    resolution=8, seed=42)
    assert len(ds) == 5
    img, w = ds[0]
    assert img.shape == (8, 8, 3)
    assert w.shape == (cfg.num_ws, cfg.w_dim)
    # deterministic per seed
    ds2 = generate_synthetic_dataset(gen, gen_vars, num_samples=5, batch_size=2,
                                     resolution=8, seed=42)
    np.testing.assert_array_equal(ds.images, ds2.images)


def test_structure_detection(tmp_path):
    os.makedirs(tmp_path / "train")
    os.makedirs(tmp_path / "val")
    s = detect_structure(str(tmp_path))
    assert s["layout"] == "train_val"
    flat = tmp_path / "flat"
    _write_images(str(flat))
    s2 = detect_structure(str(flat))
    assert s2["layout"] == "flat"
    tr, va = split_flat_classes(str(flat), val_fraction=0.25, seed=0)
    assert len(tr) == 6 and len(va) == 2
    assert set(tr) | set(va) == set(
        os.path.join(r, f) for r, _, fs in os.walk(flat) for f in fs)


def test_psnr_ssim_basics():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.uniform(-1, 1, [1, 64, 64, 3]), jnp.float32)
    assert float(psnr(a, a)) > 100
    assert float(ssim(a, a)) > 0.9999
    noisy = a + 0.1 * rng.randn(1, 64, 64, 3).astype(np.float32)
    p = float(psnr(a, noisy))
    assert 23 < p < 30  # ~26 dB for sigma=0.1 on range 2
    s = float(ssim(a, noisy))
    assert 0.5 < s < 0.999
    # monotone: more noise, lower scores
    noisier = a + 0.3 * rng.randn(1, 64, 64, 3).astype(np.float32)
    assert float(psnr(a, noisier)) < p and float(ssim(a, noisier)) < s


def test_ms_ssim():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.uniform(-1, 1, [1, 192, 192, 3]), jnp.float32)
    assert float(ms_ssim(a, a)) > 0.9999
    noisy = a + 0.2 * rng.randn(*a.shape).astype(np.float32)
    v = float(ms_ssim(a, noisy))
    assert 0.3 < v < 0.999


def test_bpp_and_report():
    # BASELINE.md: 8 KiB at 256² -> 1.0 bpp
    assert bits_per_pixel(8192, 256, 256) == 1.0
    a = np.zeros([1, 32, 32, 3], np.float32)
    m = evaluate_roundtrip(a, a + 0.05, comp_size_bytes=512)
    assert set(m) >= {"psnr", "ssim", "bpp", "ratio_vs_fp32_pixels"}
    assert m["bpp"] == 512 * 8 / (32 * 32)
    assert m["ratio_vs_fp32_pixels"] == a.size * 4 / 512


def test_metrics_logger(tmp_path):
    import json

    path = str(tmp_path / "log.jsonl")
    log = MetricsLogger(path)
    log.log({"loss": 1.5, "note": "x"}, step=0)
    log.log({"loss": 1.2}, step=1)
    assert log.history["loss"] == [1.5, 1.2]
    lines = [json.loads(l) for l in open(path)]
    assert lines[0]["loss"] == 1.5 and lines[1]["step"] == 1


def test_batchloader_abandoned_iteration_stops_producer():
    """Abandoning iteration mid-epoch must unblock the producer thread even
    when the prefetch queue is full (no leaked thread per abandoned epoch)."""
    import threading
    import time

    from image_compression_2_tpu.data.dataset import BatchLoader

    class _Ds:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            return np.zeros([2, 2, 3], np.float32)

    before = threading.active_count()
    loader = BatchLoader(_Ds(), batch_size=2, shuffle=False, prefetch=1)
    it = iter(loader)
    next(it)  # producer now blocked on the full queue
    it.close()  # abandon: generator finally sets the stop event
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.02)
    assert threading.active_count() <= before, "producer thread leaked"


def test_synthetic_dataset_mixed_psi():
    """A psi list splits samples across truncation levels; scalar psi p must
    equal the per-sample lerp path at psi=[p] (one code path, two uses)."""
    from image_compression_2_tpu.core import GeneratorConfig
    from image_compression_2_tpu.models import Generator

    cfg = GeneratorConfig.tiny(img_resolution=16, num_layers=4, margin_size=1)
    gen = Generator(cfg)
    gen_vars = jax.jit(gen.init)(jax.random.PRNGKey(0), jnp.zeros([1, cfg.z_dim]))

    mixed = generate_synthetic_dataset(
        gen, gen_vars, num_samples=6, batch_size=2, resolution=8, seed=7,
        truncation_psi=[0.5, 1.0])
    assert len(mixed) == 6
    lo = generate_synthetic_dataset(
        gen, gen_vars, num_samples=6, batch_size=2, resolution=8, seed=7,
        truncation_psi=0.5)
    hi = generate_synthetic_dataset(
        gen, gen_vars, num_samples=6, batch_size=2, resolution=8, seed=7,
        truncation_psi=1.0)
    # first half of the mixed set is the psi=0.5 stream, second half psi=1.0
    np.testing.assert_allclose(mixed.images[:3], lo.images[:3], atol=1e-5)
    np.testing.assert_allclose(mixed.images[3:], hi.images[3:], atol=1e-5)
    # truncation actually truncates: psi=0.5 ws are closer to their mean
    assert np.std(lo.w_vectors) < np.std(hi.w_vectors)


def test_lpips_rf_tracks_controlled_distortions():
    """Validates the random-feature LPIPS fallback (train/lpips.py) as an
    evaluation metric: on a controlled distortion battery (noise / blur /
    quantization / block averaging at increasing severities) the metric must
    (a) increase monotonically with severity within every family and
    (b) rank-correlate with MS-SSIM degradation across the full battery —
    i.e. it tracks structural quality, not arbitrary feature noise.  This is
    the committed evidence behind the RD tables' LPIPS(rf) column."""
    import scipy.ndimage as ndi
    from scipy.stats import spearmanr

    from image_compression_2_tpu.metrics.quality import ssim
    from image_compression_2_tpu.train.lpips import create_lpips

    rng = np.random.RandomState(0)
    size, B = 64, 4
    # structured bases: smooth blobs + oriented sinusoids + edges (perceptual
    # metrics are meaningless on pure white noise)
    yy, xx = np.mgrid[0:size, 0:size] / size
    bases = []
    for i in range(B):
        blob = ndi.gaussian_filter(rng.randn(size, size), 6.0)
        blob = blob / (np.abs(blob).max() + 1e-9)
        wave = np.sin(2 * np.pi * ((i + 3) * xx + (i + 1) * yy))
        edge = np.sign(xx - (0.3 + 0.1 * i))
        img = 0.5 * blob + 0.3 * wave + 0.2 * edge
        bases.append(np.stack([img, np.roll(img, i, 0), -img], -1))
    x = np.clip(np.stack(bases), -1, 1).astype(np.float32)

    def noise(x, s):
        return np.clip(x + rng.randn(*x.shape) * s, -1, 1)

    def blur(x, s):
        return ndi.gaussian_filter(x, (0, s, s, 0))

    def quantize(x, levels):
        return np.round((x + 1) / 2 * (levels - 1)) / (levels - 1) * 2 - 1

    def blocks(x, b):
        h = size // b
        r = x.reshape(B, h, b, h, b, 3).mean((2, 4), keepdims=True)
        return np.broadcast_to(r, (B, h, b, h, b, 3)).reshape(x.shape)

    battery = {
        "noise": [(noise, s) for s in (0.02, 0.05, 0.1, 0.2)],
        "blur": [(blur, s) for s in (0.5, 1.0, 2.0, 4.0)],
        "quantize": [(quantize, lv) for lv in (64, 16, 8, 4)],
        "blocks": [(blocks, b) for b in (2, 4, 8, 16)],
    }

    _, lp_vars, lp_apply = create_lpips(seed=0, image_size=size)
    xj = jnp.asarray(x)
    all_lp, all_ssim = [], []
    for family, points in battery.items():
        lps = []
        for fn, sev in points:
            y = jnp.asarray(fn(x, sev).astype(np.float32))
            lp = float(jnp.mean(lp_apply(lp_vars, xj, y)))
            lps.append(lp)
            all_lp.append(lp)
            all_ssim.append(float(jnp.mean(ssim(xj, y))))
        assert all(b > a for a, b in zip(lps, lps[1:])), (
            f"LPIPS(rf) not monotone in {family} severity: {lps}")
    rho = spearmanr(all_lp, [-s for s in all_ssim]).statistic
    assert rho > 0.8, f"LPIPS(rf) vs SSIM-degradation rank corr too low: {rho}"
