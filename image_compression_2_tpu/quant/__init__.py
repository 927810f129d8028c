from .uniform import quantize_uniform, quantize_to_indices, dequantize_from_indices

__all__ = [
    "quantize_uniform",
    "quantize_to_indices",
    "dequantize_from_indices",
]
