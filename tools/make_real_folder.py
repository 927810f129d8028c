#!/usr/bin/env python
"""Build a small REAL-photo training folder from images bundled in the
environment (no network): matplotlib's grace_hopper.jpg portrait and
sklearn's china/flower photos.  Random 256² crops + flips make a folder
large enough for a short fine-tune; a center crop of the portrait is saved
separately as the end-to-end demo image.

Capability match: the reference's real-photo path (demo_real_images.py) runs
real photographs through train/compress/compare; this provides the
non-synthetic data for the same flow here.
"""

import argparse
import os

import numpy as np
from PIL import Image


def find_sources():
    import matplotlib
    import sklearn.datasets

    mpl_dir = os.path.join(os.path.dirname(matplotlib.__file__), "mpl-data",
                           "sample_data")
    skl_dir = os.path.join(os.path.dirname(sklearn.datasets.__file__),
                           "images")
    paths = [os.path.join(mpl_dir, "grace_hopper.jpg"),
             os.path.join(skl_dir, "china.jpg"),
             os.path.join(skl_dir, "flower.jpg")]
    return [p for p in paths if os.path.exists(p)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="runs/real_demo")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--n-train", type=int, default=256)
    ap.add_argument("--n-val", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    srcs = find_sources()
    assert srcs, "no bundled sample photos found"
    print("sources:", srcs)
    imgs = [np.asarray(Image.open(p).convert("RGB")) for p in srcs]

    rng = np.random.RandomState(args.seed)
    train_dir = os.path.join(args.out, "data")
    val_dir = os.path.join(args.out, "data_val")
    os.makedirs(train_dir, exist_ok=True)
    os.makedirs(val_dir, exist_ok=True)

    def crop(img):
        h, w = img.shape[:2]
        s = min(args.size, h, w)
        y = rng.randint(0, h - s + 1)
        x = rng.randint(0, w - s + 1)
        c = img[y:y + s, x:x + s]
        if rng.rand() < 0.5:
            c = c[:, ::-1]
        if s != args.size:
            c = np.asarray(
                Image.fromarray(c).resize((args.size, args.size),
                                          Image.LANCZOS))
        return c

    for i in range(args.n_train):
        Image.fromarray(crop(imgs[i % len(imgs)])).save(
            os.path.join(train_dir, f"crop_{i:04d}.png"))
    for i in range(args.n_val):
        Image.fromarray(crop(imgs[i % len(imgs)])).save(
            os.path.join(val_dir, f"val_{i:04d}.png"))

    # the demo image: center crop of the portrait, full resolution available
    img = imgs[0]
    h, w = img.shape[:2]
    s = min(h, w)
    c = img[(h - s) // 2:(h + s) // 2, (w - s) // 2:(w + s) // 2]
    c = np.asarray(Image.fromarray(c).resize((args.size, args.size),
                                             Image.LANCZOS))
    demo = os.path.join(args.out, "grace_256.png")
    Image.fromarray(c).save(demo)
    print(f"wrote {args.n_train} train + {args.n_val} val crops; demo {demo}")


if __name__ == "__main__":
    main()
