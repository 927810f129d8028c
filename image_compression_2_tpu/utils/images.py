"""Image IO utilities (NHWC [-1,1] <-> PNG/arrays).

Covers the reference's ``save_tensor_as_image`` (duplicated across five files,
SURVEY §2.6 U1) plus loading with Lanczos resize matching the reference's
dataset transform (stylegan3_hvae_full.py:969-973).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np
from PIL import Image


def to_uint8(img) -> np.ndarray:
    """[-1,1] float NHWC/HWC -> uint8 (round-to-nearest; the reference
    truncates, which loses up to a full level and breaks uint8 roundtrips)."""
    arr = np.asarray(img, np.float32)
    return np.clip(np.rint((arr + 1.0) * 127.5), 0, 255).astype(np.uint8)


def from_uint8(arr: np.ndarray) -> np.ndarray:
    """uint8 -> [-1,1] float32."""
    return np.asarray(arr, np.float32) / 127.5 - 1.0


def save_image(img, filename: str) -> None:
    """Save one [-1,1] HWC (or 1HWC) image as PNG/JPEG by extension."""
    arr = np.asarray(img)
    if arr.ndim == 4:
        assert arr.shape[0] == 1, "save_image takes a single image"
        arr = arr[0]
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    Image.fromarray(to_uint8(arr)).save(filename)


def load_image(
    filename: str, resolution: Optional[int] = None
) -> np.ndarray:
    """Load an image file -> [-1,1] float32 HWC, optional Lanczos resize
    (the reference's transform: Resize(LANCZOS) -> ToTensor -> Normalize)."""
    img = Image.open(filename).convert("RGB")
    if resolution is not None:
        img = img.resize((resolution, resolution), Image.LANCZOS)
    return from_uint8(np.asarray(img))


def image_grid(images, cols: Optional[int] = None) -> np.ndarray:
    """Tile a batch [N,H,W,C] in [-1,1] into one grid image [-1,1]."""
    images = np.asarray(images)
    n, h, w, c = images.shape
    cols = cols or int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    grid = np.full([rows * h, cols * w, c], -1.0, images.dtype)
    for i in range(n):
        r, cl = divmod(i, cols)
        grid[r * h:(r + 1) * h, cl * w:(cl + 1) * w] = images[i]
    return grid
