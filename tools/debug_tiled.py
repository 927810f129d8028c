#!/usr/bin/env python
"""Single-layer repro for the tiled flrelu kernel on the real TPU."""
import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layer", default="L0_36_512")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from image_compression_2_tpu.core import GeneratorConfig
    from image_compression_2_tpu.ops import design_lowpass_filter, filtered_lrelu
    from image_compression_2_tpu.ops.pallas_flrelu_tiled import plan_tiled

    cfg = GeneratorConfig(img_resolution=args.res)
    spec = next(s for s in cfg.layer_specs if s.name == args.layer)
    H = spec.in_size + spec.conv_kernel - 1
    C = spec.out_channels
    fu = design_lowpass_filter(spec.up_taps, spec.in_cutoff,
                               spec.in_half_width * 2, spec.tmp_sampling_rate)
    fd = design_lowpass_filter(spec.down_taps, spec.out_cutoff,
                               spec.out_half_width * 2, spec.tmp_sampling_rate,
                               radial=spec.down_radial)
    dtype = jnp.dtype(args.dtype)
    x = jnp.asarray(np.random.RandomState(0).randn(args.batch, H, H, C) * 0.3,
                    dtype)
    b = jnp.asarray(np.random.RandomState(1).randn(C), jnp.float32)
    plan = plan_tiled(H, H, C, spec.up_factor, spec.down_factor,
                      spec.up_taps, spec.down_taps, spec.padding)
    print("plan:", plan)

    def run(mode):
        fn = jax.jit(lambda x, b: filtered_lrelu(
            x, fu, fd, b, up=spec.up_factor, down=spec.down_factor,
            padding=spec.padding, clamp=cfg.conv_clamp, mode=mode))
        return np.asarray(fn(x, b), np.float32)

    ref = run("matmul")
    out = run("tiled")
    err = np.max(np.abs(out - ref)) / max(1e-6, float(np.max(np.abs(ref))))
    print(f"{args.layer} tiled ok, rel err vs matmul = {err:.3g}")


if __name__ == "__main__":
    main()
