from .quality import bits_per_pixel, ms_ssim, psnr, ssim
from .report import MetricsLogger, evaluate_roundtrip

__all__ = [
    "bits_per_pixel",
    "ms_ssim",
    "psnr",
    "ssim",
    "MetricsLogger",
    "evaluate_roundtrip",
]
