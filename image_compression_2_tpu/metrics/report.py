"""Structured metrics logging + roundtrip evaluation reports.

Upgrades the reference's print-and-in-memory-history observability
(SURVEY §5): every record is one JSON line (machine-parseable), and the
roundtrip evaluator reproduces the ``test_compression`` report
(hvae_training.py:277-426): ratio, bpp, PSNR, SSIM/MS-SSIM per setting.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np

from .quality import bits_per_pixel, ms_ssim, psnr, ssim


class MetricsLogger:
    """Append-only JSONL metrics stream + in-memory history dict (the
    reference's checkpoint `history` payload)."""

    def __init__(self, path: Optional[str] = None):
        self.path = path
        self.history: Dict[str, list] = {}
        if path:
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)

    def log(self, record: Dict, step: Optional[int] = None) -> None:
        rec = dict(record)
        if step is not None:
            rec["step"] = step
        rec["time"] = time.time()
        for k, v in record.items():
            if isinstance(v, (int, float, np.floating, np.integer)):
                self.history.setdefault(k, []).append(float(v))
        if self.path:
            with open(self.path, "a") as f:
                f.write(json.dumps(rec, default=float) + "\n")


def evaluate_roundtrip(
    original,
    reconstructed,
    comp_size_bytes: float,
    data_range: float = 2.0,
) -> Dict[str, float]:
    """Quality + rate metrics for one compress/decompress roundtrip."""
    original = np.asarray(original, np.float32)
    reconstructed = np.asarray(reconstructed, np.float32)
    h, w = original.shape[1:3]
    out = {
        "psnr": float(psnr(original, reconstructed, data_range)),
        "ssim": float(ssim(original, reconstructed, data_range)),
        "bpp": bits_per_pixel(comp_size_bytes / original.shape[0], h, w),
        "comp_size_bytes": float(comp_size_bytes),
        "ratio_vs_fp32_pixels": float(
            original.size * 4 / max(comp_size_bytes, 1e-9)
        ),
    }
    if min(h, w) >= 176:  # 5-scale MS-SSIM support
        out["ms_ssim"] = float(ms_ssim(original, reconstructed, data_range))
    return out


def format_report(metrics: Dict[str, float], title: str = "roundtrip") -> str:
    lines = [f"== {title} =="]
    for k in ("psnr", "ssim", "ms_ssim", "bpp", "ratio_vs_fp32_pixels",
              "comp_size_bytes"):
        if k in metrics:
            lines.append(f"  {k:22s} {metrics[k]:.4f}")
    return "\n".join(lines)
