#!/usr/bin/env python
"""Headline benchmark: encode+decode images/sec at 256² on one TPU chip.

Measures the full codec roundtrip (HVAE encode -> 8-bit quantize ->
StyleGAN3-T synthesis) steady-state on the real chip, and compares against a
FLOP-matched CPU PyTorch implementation of the same architecture (the
reference is plain single-device PyTorch; its published configs are not
runnable here because the NVlabs pickle isn't available, so the baseline is a
faithful torch twin of the identical layer spec — same convs, same FIR
resampling chain, same channel schedule).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}
"""

import argparse
import json
import os
import sys
import time

import numpy as np

BATCH = 8  # measured throughput knee: b4 41 img/s, b8 ~50, b16+ flat
RES = 256
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      ".bench_baseline_cache.json")


def bench_tpu(batch: int = BATCH, iters: int = 10, res: int = RES):
    import jax
    import jax.numpy as jnp

    from image_compression_2_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from image_compression_2_tpu.core import (EncoderConfig, GeneratorConfig,
                                              Precision)
    from image_compression_2_tpu.codec import Compressor

    gen_cfg = GeneratorConfig(img_resolution=res)
    enc_cfg = EncoderConfig(img_resolution=res)
    comp = Compressor.create(
        enc_cfg, gen_cfg, seed=0, precision=Precision(compute_dtype=jnp.bfloat16)
    )
    x = jnp.asarray(
        np.random.RandomState(0).uniform(-1, 1, [batch, res, res, 3]).astype(
            np.float32)
    )

    def roundtrip(x):
        # fused single-dispatch transcode (encode -> quantize -> synthesis
        # in ONE jitted program; the product API for on-device roundtrips)
        return comp.roundtrip(x, quantization_bits=8)

    # NOTE: on the experimental 'axon' relay backend, block_until_ready()
    # acknowledges before device completion; a host fetch is the only true
    # synchronisation point.  We therefore dispatch `iters` roundtrips and
    # fetch once — the device executes them in dispatch order, so the wall
    # time amortises compute correctly and pays the relay latency once.
    xs = [
        x + jnp.float32(i) * 1e-6 for i in range(iters + 1)
    ]  # distinct inputs defeat any (executable, input) memoisation
    _ = np.asarray(roundtrip(xs[0]))  # compile + warm
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = roundtrip(xs[i + 1])
    _ = np.asarray(out)  # true sync
    dt = time.perf_counter() - t0
    return batch * iters / dt


def _torch_twin(enc_cfg, gen_cfg):
    """FLOP-matched torch modules for the same layer spec (CPU baseline)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class VGGBlock(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.c1 = nn.Conv2d(cin, cout, 3, padding=1)
            self.n1 = nn.GroupNorm(min(32, cout), cout)
            self.c2 = nn.Conv2d(cout, cout, 3, padding=1)
            self.n2 = nn.GroupNorm(min(32, cout), cout)

        def forward(self, x):
            x = F.leaky_relu(self.n1(self.c1(x)), 0.2)
            x = F.leaky_relu(self.n2(self.c2(x)), 0.2)
            if x.shape[2] > 1:
                x = F.avg_pool2d(x, 2)
            return x

    class Encoder(nn.Module):
        def __init__(self, cfg):
            super().__init__()
            ch = cfg.channels
            self.from_rgb = nn.Conv2d(cfg.img_channels, ch[0], 3, padding=1)
            n = cfg.num_blocks
            self.blocks = nn.ModuleList(
                [VGGBlock(ch[i], ch[i + 1] if i < n - 1 else ch[i])
                 for i in range(n)]
            )
            self.heads = nn.ModuleList()
            for nws, cin in [
                (cfg.num_ws_global, ch[n - 1]),
                (cfg.num_ws_medium, ch[min(cfg.medium_block + 1, n - 1)]),
                (cfg.num_ws_fine, ch[cfg.fine_block + 1]),
            ]:
                self.heads.append(
                    nn.Sequential(nn.Linear(cin, cfg.hidden_dim),
                                  nn.LeakyReLU(0.2),
                                  nn.Linear(cfg.hidden_dim,
                                            nws * cfg.w_dim * 2))
                )

        def forward(self, x):
            x = self.from_rgb(x)
            taps = {}
            for i, b in enumerate(self.blocks):
                if x.shape[2] <= 1:
                    break
                x = b(x)
                if i == 1:
                    taps["fine"] = x
                elif i == 4:
                    taps["medium"] = x
            taps["global"] = x
            outs = []
            for head, k in zip(self.heads, ["global", "medium", "fine"]):
                f = taps.get(k, x).mean(dim=(2, 3))
                outs.append(head(f))
            return torch.cat(outs, dim=1)

    class Synthesis(nn.Module):
        def __init__(self, cfg):
            super().__init__()
            self.cfg = cfg
            self.specs = cfg.layer_specs
            c0 = cfg.input_channels
            self.input_weight = nn.Parameter(torch.randn(c0, c0))
            # 2-layer mapping MLP (FLOP parity with G.mapping; negligible
            # next to the convs but present for an honest twin)
            self.mapping = nn.Sequential(
                nn.Linear(cfg.z_dim, cfg.w_dim), nn.LeakyReLU(0.2),
                nn.Linear(cfg.w_dim, cfg.w_dim), nn.LeakyReLU(0.2),
            )
            self.convs = nn.ModuleList(
                [nn.Conv2d(s.in_channels, s.out_channels, s.conv_kernel,
                           padding=s.conv_kernel - 1) for s in self.specs]
            )
            # per-layer style affine (w -> per-input-channel scale), the
            # modulation half of StyleGAN3's modulated conv
            self.affines = nn.ModuleList(
                [nn.Linear(cfg.w_dim, s.in_channels) for s in self.specs]
            )
            self.filters = []
            from image_compression_2_tpu.ops import design_lowpass_filter
            for s in self.specs:
                fu = design_lowpass_filter(s.up_taps, s.in_cutoff,
                                           s.in_half_width * 2,
                                           s.tmp_sampling_rate)
                fd = design_lowpass_filter(s.down_taps, s.out_cutoff,
                                           s.out_half_width * 2,
                                           s.tmp_sampling_rate)
                self.filters.append((fu, fd))

        def _upfirdn(self, x, f, up, down, pad):
            c = x.shape[1]
            if up > 1:
                z = torch.zeros(x.shape[0], c, x.shape[2] * up,
                                x.shape[3] * up)
                z[:, :, ::up, ::up] = x
                x = z
            if f is not None:
                t = torch.as_tensor(f, dtype=torch.float32)
                ky = t.view(1, 1, -1, 1).repeat(c, 1, 1, 1)
                kx = t.view(1, 1, 1, -1).repeat(c, 1, 1, 1)
                x = F.pad(x, (0, 0, max(pad, 0), max(pad, 0)))
                x = F.conv2d(x, ky, groups=c)
                x = F.pad(x, (max(pad, 0), max(pad, 0), 0, 0))
                x = F.conv2d(x, kx, groups=c)
            if down > 1:
                x = x[:, :, ::down, ::down]
            return x

        def forward(self, w):
            b = w.shape[0]
            size, c0 = self.cfg.input_size, self.cfg.input_channels
            w = self.mapping(w)  # [B, num_ws, w_dim]
            feats = torch.randn(b, size, size, c0)
            x = (feats @ self.input_weight).permute(0, 3, 1, 2).contiguous()
            for li, (spec, conv, (fu, fd)) in enumerate(
                    zip(self.specs, self.convs, self.filters)):
                # modulate: per-sample input-channel scaling + demodulation
                # coefficient from the scaled weight norms (the grouped-conv
                # formulation's FLOPs, computed the input-scaling way)
                styles = self.affines[li](w[:, min(li + 1, w.shape[1] - 1)])
                x = x * styles[:, :, None, None]
                x = conv(x)
                wsq = conv.weight.square().sum(dim=(2, 3))  # [O, I]
                dcoef = torch.rsqrt(
                    (wsq[None] * styles.square()[:, None, :]).sum(-1) + 1e-8
                )  # [B, O]
                x = x * dcoef[:, :, None, None]
                pad_u = max(spec.padding[0], 0) if fu is not None else 0
                x = self._upfirdn(x, fu, spec.up_factor, 1, pad_u)
                x = F.leaky_relu(x, 0.2)
                x = self._upfirdn(x, fd, 1, spec.down_factor, 0)
                # FIR chains change sizes slightly vs the exactly-solved JAX
                # padding; re-center to the spec'd output size (timing twin).
                if x.shape[2] != spec.out_size:
                    d = x.shape[2] - spec.out_size
                    if d > 0:
                        lo = d // 2
                        x = x[:, :, lo:lo + spec.out_size, lo:lo + spec.out_size]
                    else:
                        p = (-d) // 2
                        x = F.pad(x, (p, -d - p, p, -d - p))
            return x

    return Encoder(enc_cfg), Synthesis(gen_cfg)


def bench_cpu_torch(batch: int = 4, iters: int = 5):
    import torch
    from image_compression_2_tpu.core import EncoderConfig, GeneratorConfig

    torch.set_num_threads(os.cpu_count() or 1)
    gen_cfg = GeneratorConfig(img_resolution=RES)
    enc_cfg = EncoderConfig(img_resolution=RES)
    enc, syn = _torch_twin(enc_cfg, gen_cfg)
    enc.eval()
    syn.eval()
    x = torch.randn(batch, 3, RES, RES)
    with torch.no_grad():
        lat = enc(x)
        w = torch.randn(batch, gen_cfg.num_ws, gen_cfg.w_dim)
        syn(w)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            enc(x)
            syn(w)
        dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--remeasure-baseline", action="store_true",
                    help="re-time the CPU torch twin instead of using the "
                         "committed measurement (takes ~25 min: the honest "
                         "twin with style modulation runs ~0.02 img/s)")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--res", type=int, default=RES,
                    help="roundtrip resolution (default 256; the committed "
                         "CPU baseline applies to 256 only)")
    ap.add_argument("--batch", type=int, default=BATCH)
    args = ap.parse_args()

    tpu_ips = bench_tpu(batch=args.batch, iters=args.iters, res=args.res)
    if args.res != RES:
        print(json.dumps({
            "metric": f"encode+decode images/sec/chip @{args.res}^2 "
                      f"(8-bit roundtrip)",
            "value": round(tpu_ips, 3), "unit": "img/s",
        }))
        return

    cpu_ips = None
    if not args.remeasure_baseline and os.path.exists(_CACHE):
        with open(_CACHE) as f:
            cpu_ips = json.load(f)["cpu_ips"]
    if cpu_ips is None:
        cpu_ips = bench_cpu_torch()
        with open(_CACHE, "w") as f:
            json.dump({"cpu_ips": cpu_ips,
                       "batch": 4, "iters": 5,
                       "threads": os.cpu_count(),
                       "twin": "encoder+mapping+modulated-synthesis"}, f)

    print(json.dumps({
        "metric": "encode+decode images/sec/chip @256^2 (8-bit roundtrip)",
        "value": round(tpu_ips, 3),
        "unit": "img/s",
        "vs_baseline": round(tpu_ips / cpu_ips, 2),
    }))


if __name__ == "__main__":
    main()
