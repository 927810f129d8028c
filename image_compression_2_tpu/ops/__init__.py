from .filters import design_lowpass_filter
from .upfirdn2d import upfirdn2d
from .bias_act import bias_act
from .filtered_lrelu import filtered_lrelu
from .modulated_conv import modulated_conv2d

__all__ = [
    "design_lowpass_filter",
    "upfirdn2d",
    "bias_act",
    "filtered_lrelu",
    "modulated_conv2d",
]
