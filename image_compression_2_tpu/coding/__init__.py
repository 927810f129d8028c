from .cabac import build_prior, cabac_decode, cabac_encode, context_shift
from .container import read_cabac_file, write_cabac_file
from .native import decode_native, encode_native, native_available
from .rangecoder import RangeDecoder, RangeEncoder


def encode(data, n_symbols: int, priors=None) -> bytes:
    """CABAC-encode (native C++ when available, else the Python spec impl)."""
    out = encode_native(data, n_symbols, priors)
    return out if out is not None else cabac_encode(data, n_symbols, priors)


def decode(payload: bytes, shape, n_symbols: int, priors=None):
    out = decode_native(payload, shape, n_symbols, priors)
    return out if out is not None else cabac_decode(payload, shape, n_symbols,
                                                    priors)


__all__ = [
    "build_prior",
    "context_shift",
    "RangeDecoder",
    "RangeEncoder",
    "cabac_decode",
    "cabac_encode",
    "decode",
    "decode_native",
    "encode",
    "encode_native",
    "native_available",
    "read_cabac_file",
    "write_cabac_file",
]
