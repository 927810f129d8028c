"""`.cabac` container format (v2) — a CORRECT header.

The reference writes ``len(metadata)`` (the dict's key count!) as the header
length and reads it back as the pickle byte length
(/root/reference/cabac_compression.py:557 vs :579-580) — its files cannot be
read back by its own loader.  This format fixes that and drops pickle
entirely (no code execution on load):

    magic  'IC2C' (4 bytes)
    u32    version (2 = plain, 3 = with embedded prior table)
    u32    json metadata length
    bytes  json metadata  {shape, n_embeddings, use_cabac, orig_size,
                           comp_size, compression_ratio, codec}
    bytes  zlib-compressed prior table (v3 only; length in metadata
           'embedded_priors_len' — makes a priors-coded stream decodable
           from the file alone, without the codec bundle)
    bytes  payload (CABAC stream or raw little-endian codes)
"""

from __future__ import annotations

import json
import struct
import zlib
from typing import Dict, Optional, Tuple

_MAGIC = b"IC2C"
_VERSION = 2
_VERSION_PRIORS = 3


def write_cabac_file(filename: str, payload: bytes, metadata: Dict,
                     priors_blob: Optional[bytes] = None) -> None:
    metadata = dict(metadata)
    metadata["payload_crc32"] = zlib.crc32(payload)
    version = _VERSION
    if priors_blob is not None:
        version = _VERSION_PRIORS
        metadata["embedded_priors_len"] = len(priors_blob)
    meta_json = json.dumps(metadata).encode("utf-8")
    with open(filename, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<II", version, len(meta_json)))
        f.write(meta_json)
        if priors_blob is not None:
            f.write(priors_blob)
        f.write(payload)


def read_cabac_file(filename: str) -> Tuple[bytes, Dict]:
    """Returns (payload, metadata); an embedded prior table (v3) is surfaced
    as ``metadata['_embedded_priors']`` (zlib-compressed bytes)."""
    with open(filename, "rb") as f:
        magic = f.read(4)
        if magic != _MAGIC:
            raise ValueError(f"{filename}: not an IC2C container")
        version, meta_len = struct.unpack("<II", f.read(8))
        if version not in (_VERSION, _VERSION_PRIORS):
            raise ValueError(f"{filename}: unsupported version {version}")
        metadata = json.loads(f.read(meta_len).decode("utf-8"))
        if version == _VERSION_PRIORS:
            metadata["_embedded_priors"] = f.read(
                int(metadata["embedded_priors_len"]))
        payload = f.read()
    crc = metadata.pop("payload_crc32", None)
    if crc is not None and zlib.crc32(payload) != crc:
        # an arithmetic-coded stream decodes truncated/corrupt bytes into
        # plausible-looking garbage; fail loudly instead
        raise ValueError(f"{filename}: payload corrupt (crc mismatch)")
    return payload, metadata
