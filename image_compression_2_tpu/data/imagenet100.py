"""ImageNet-100 acquisition + layout detection.

Capability parity with /root/reference/download_imagenet100.py: Kaggle
download of ``ambityga/imagenet100`` (gated on credentials + the kaggle
package being present — neither ships in this image), automatic structure
detection (train/val split, nested class dirs, or flat class dirs with an
80/20 split), and dataset statistics.
"""

from __future__ import annotations

import os
import random
from typing import Dict, Optional, Tuple

_EXTS = (".png", ".jpg", ".jpeg")


def kaggle_available() -> bool:
    try:
        import kaggle  # noqa: F401
        return True
    except Exception:
        return False


def download_imagenet100(target_dir: str = "./imagenet100") -> str:
    """Download + unzip via the Kaggle API. Requires ~/.kaggle/kaggle.json."""
    if not kaggle_available():
        raise RuntimeError(
            "kaggle package/credentials unavailable; place the dataset under "
            f"{target_dir} manually (class dirs of jpegs) instead"
        )
    import kaggle

    os.makedirs(target_dir, exist_ok=True)
    kaggle.api.dataset_download_files(
        "ambityga/imagenet100", path=target_dir, unzip=True
    )
    return target_dir


def detect_structure(root: str) -> Dict[str, Optional[str]]:
    """Find train/val dirs: explicit train+val, nested train.X shards, or a
    flat directory of class dirs (caller splits 80/20)."""
    entries = sorted(os.listdir(root)) if os.path.isdir(root) else []
    has = lambda n: n in entries and os.path.isdir(os.path.join(root, n))
    if has("train") and has("val"):
        return {"train": os.path.join(root, "train"),
                "val": os.path.join(root, "val"), "layout": "train_val"}
    shards = [e for e in entries if e.startswith("train.")]
    if shards:
        return {"train": root, "val": os.path.join(root, "val") if has("val")
                else None, "layout": "sharded"}
    return {"train": root, "val": None, "layout": "flat"}


def split_flat_classes(
    root: str, val_fraction: float = 0.2, seed: int = 0
) -> Tuple[list, list]:
    """80/20 per-class path split for flat class-dir layouts."""
    rng = random.Random(seed)
    train_paths, val_paths = [], []
    for cls in sorted(os.listdir(root)):
        cdir = os.path.join(root, cls)
        if not os.path.isdir(cdir):
            continue
        files = sorted(
            os.path.join(cdir, f)
            for f in os.listdir(cdir)
            if f.lower().endswith(_EXTS)
        )
        rng.shuffle(files)
        n_val = int(len(files) * val_fraction)
        val_paths.extend(files[:n_val])
        train_paths.extend(files[n_val:])
    return train_paths, val_paths


def dataset_stats(root: str) -> Dict[str, int]:
    n_files = 0
    n_classes = 0
    for dirpath, dirnames, filenames in os.walk(root):
        imgs = [f for f in filenames if f.lower().endswith(_EXTS)]
        if imgs:
            n_classes += 1
            n_files += len(imgs)
    return {"num_images": n_files, "num_class_dirs": n_classes}
