from .config import (
    GeneratorConfig,
    SynthesisLayerSpec,
    EncoderConfig,
    Precision,
)

__all__ = [
    "GeneratorConfig",
    "SynthesisLayerSpec",
    "EncoderConfig",
    "Precision",
]
