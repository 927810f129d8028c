"""Checkpoint save/resume (msgpack pytrees + JSON manifest).

Capability parity with the reference checkpoints
(/root/reference/stylegan3_hvae_full.py:888-919): periodic and final files
holding {step/epoch, encoder params, optimizer state, loss history, config}.
Here the tensor payload is a flax-serialized pytree (deterministic, portable,
no pickle execution) and the metadata is JSON alongside it in one container.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Any, Dict, Optional, Tuple

import flax.serialization

_MAGIC = b"IC2T"
_VERSION = 1


def save_checkpoint(
    path: str,
    pytree: Any,
    meta: Optional[Dict] = None,
) -> None:
    """Write `[magic][version][meta_len][meta_json][msgpack pytree]`."""
    payload = flax.serialization.to_bytes(pytree)
    meta_json = json.dumps(meta or {}).encode("utf-8")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<II", _VERSION, len(meta_json)))
        f.write(meta_json)
        f.write(payload)
    os.replace(tmp, path)


def load_checkpoint(path: str, target: Any = None) -> Tuple[Any, Dict]:
    """Read a checkpoint; ``target`` (a template pytree) restores exact types,
    otherwise returns raw nested dicts."""
    with open(path, "rb") as f:
        magic = f.read(4)
        if magic != _MAGIC:
            # ValueError (not assert) so resume fallbacks — resolve_resume_
            # checkpoint / restore_train_state — can catch a truncated or
            # foreign file and fall back instead of crashing the run.
            raise ValueError(f"not an ic2t checkpoint: {path}")
        version, meta_len = struct.unpack("<II", f.read(8))
        if version != _VERSION:
            raise ValueError(f"unsupported ic2t version {version} in {path}")
        meta = json.loads(f.read(meta_len).decode("utf-8"))
        payload = f.read()
    if target is not None:
        pytree = flax.serialization.from_bytes(target, payload)
    else:
        pytree = flax.serialization.msgpack_restore(payload)
    return pytree, meta
