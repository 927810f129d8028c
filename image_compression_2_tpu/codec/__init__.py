from .compressor import Compressor
from .uniform_cabac import UniformCABACCompressor

__all__ = ["Compressor", "UniformCABACCompressor"]
