from .cabac import (
    build_prior,
    cabac_decode,
    cabac_encode,
    check_priors,
    context_shift,
)
from .container import read_cabac_file, write_cabac_file
from .native import decode_native, encode_native, native_available
from .rangecoder import RangeDecoder, RangeEncoder


def encode(data, n_symbols: int, priors=None) -> bytes:
    """CABAC-encode (native C++ when available, else the Python spec impl)."""
    # validate priors on BOTH paths: the Python impl checks internally, but
    # the native coder would silently produce a desynced stream from a
    # malformed table (discovered only at the consumer's decode)
    check_priors(data.shape, n_symbols, priors)
    out = encode_native(data, n_symbols, priors)
    return out if out is not None else cabac_encode(data, n_symbols, priors)


def decode(payload: bytes, shape, n_symbols: int, priors=None):
    check_priors(shape, n_symbols, priors)
    out = decode_native(payload, shape, n_symbols, priors)
    return out if out is not None else cabac_decode(payload, shape, n_symbols,
                                                    priors)


def encode_batched(data, n_symbols: int, priors=None, max_workers=None):
    """Encode each image of ``[B, T, D]`` as an INDEPENDENT stream (fresh
    contexts per image), coded in parallel on a thread pool — the native
    coder releases the GIL during the symbol loop, so batch wall time scales
    down with cores.  Returns (concatenated payload, per-image lengths);
    independent streams also make single-image decode possible.
    """
    import numpy as np

    data = np.ascontiguousarray(data)
    B = data.shape[0]
    if B == 1:
        payload = encode(data, n_symbols, priors)
        return payload, [len(payload)]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        parts = list(
            ex.map(lambda i: encode(data[i:i + 1], n_symbols, priors),
                   range(B))
        )
    return b"".join(parts), [len(p) for p in parts]


def decode_batched(payload: bytes, lengths, shape, n_symbols: int,
                   priors=None, image_index=None, max_workers=None):
    """Decode per-image streams written by ``encode_batched``.

    ``lengths=None`` decodes a legacy single-stream payload.  With
    ``image_index`` only that image's stream is decoded (shape [1, T, D])."""
    import numpy as np

    B, T, D = shape
    if lengths is None:
        if image_index is not None:
            raise ValueError(
                "single-stream payloads cannot be decoded per-image")
        return decode(payload, shape, n_symbols, priors)
    # lengths come from untrusted file metadata — raise loudly (asserts are
    # stripped under -O and a wrong slice decodes into silent garbage)
    if len(lengths) != B or sum(lengths) != len(payload):
        raise ValueError(
            f"corrupt stream_lengths: {len(lengths)} streams summing to "
            f"{sum(lengths)} B for a batch of {B} and a "
            f"{len(payload)}-byte payload"
        )
    offsets = [0]
    for n in lengths:
        offsets.append(offsets[-1] + n)
    if image_index is not None:
        if not 0 <= image_index < B:
            raise ValueError(f"image_index {image_index} out of range for "
                             f"batch of {B}")
        part = payload[offsets[image_index]:offsets[image_index + 1]]
        return decode(part, (1, T, D), n_symbols, priors)
    if B == 1:
        return decode(payload, shape, n_symbols, priors)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        parts = list(
            ex.map(
                lambda i: decode(payload[offsets[i]:offsets[i + 1]],
                                 (1, T, D), n_symbols, priors),
                range(B),
            )
        )
    return np.concatenate(parts, axis=0)


__all__ = [
    "build_prior",
    "context_shift",
    "RangeDecoder",
    "RangeEncoder",
    "cabac_decode",
    "cabac_encode",
    "check_priors",
    "decode",
    "decode_batched",
    "decode_native",
    "encode",
    "encode_batched",
    "encode_native",
    "native_available",
    "read_cabac_file",
    "write_cabac_file",
]
