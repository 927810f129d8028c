from .gumbel import (
    GumbelSoftmaxDiscretization,
    anneal_log_temperature,
    lookup_codebook,
    usage_histogram,
)
from .uniform import (
    dequantize_from_indices,
    per_layer_comp_size_bytes,
    quantize_to_indices,
    quantize_uniform,
    quantize_uniform_per_layer,
)

__all__ = [
    "GumbelSoftmaxDiscretization",
    "anneal_log_temperature",
    "lookup_codebook",
    "usage_histogram",
    "dequantize_from_indices",
    "per_layer_comp_size_bytes",
    "quantize_to_indices",
    "quantize_uniform",
    "quantize_uniform_per_layer",
]
