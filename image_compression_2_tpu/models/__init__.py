from .generator import (
    Generator,
    MappingNetwork,
    SynthesisInput,
    SynthesisLayer,
    SynthesisNetwork,
)
from .encoder import HVAEEncoder, HierarchyProjector, SimpleEncoder, VGGBlock
from .layers import EqualLinear, normalize_2nd_moment

__all__ = [
    "HVAEEncoder",
    "HierarchyProjector",
    "SimpleEncoder",
    "VGGBlock",
    "Generator",
    "MappingNetwork",
    "SynthesisInput",
    "SynthesisLayer",
    "SynthesisNetwork",
    "EqualLinear",
    "normalize_2nd_moment",
]
