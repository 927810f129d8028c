from .images import from_uint8, image_grid, load_image, save_image, to_uint8
from .plotting import plot_history_svg
from .profiling import benchmark, sync, timed, trace

__all__ = [
    "from_uint8",
    "image_grid",
    "load_image",
    "save_image",
    "to_uint8",
    "plot_history_svg",
    "benchmark",
    "sync",
    "timed",
    "trace",
]
