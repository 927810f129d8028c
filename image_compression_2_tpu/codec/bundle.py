"""Codec bundles: one file holding everything needed to run a codec.

The reference reconstructs compressors from a generator pickle + an encoder
checkpoint + CLI flags that must agree (cabac_compression.py:592-702, with
two historical checkpoint layouts).  A bundle makes the codec a single
artifact: generator config+vars, encoder config+params, optional
discretization params and entropy priors, with JSON metadata — no pickle, no
flag re-derivation.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..core.config import EncoderConfig, GeneratorConfig, Precision
from ..train.checkpoint import load_checkpoint, save_checkpoint
from .cabac_compressor import CABACCompressor, EntropyCodecBase
from .compressor import Compressor
from .gumbel_compressor import GumbelCompressor
from .uniform_cabac import UniformCABACCompressor


def _cfg_to_dict(cfg) -> dict:
    return dataclasses.asdict(cfg)


def _cfg_from_dict(cls, d: dict):
    d = dict(d)
    # JSON round-trips tuples as lists; restore the tuple-typed fields
    for k in ("block_split", "pool_grids", "hidden_dims"):
        if d.get(k) is not None:
            d[k] = tuple(d[k])
    # forward compatibility: drop keys this build's config doesn't know
    fields = {f.name for f in dataclasses.fields(cls)}
    d = {k: v for k, v in d.items() if k in fields}
    return cls(**d)


def save_codec(path: str, codec) -> None:
    """Serialize a Compressor / GumbelCompressor / CABACCompressor."""
    payload = {
        "encoder_vars": codec.encoder_vars,
        "generator_vars": codec.generator_vars,
    }
    meta = {
        "kind": type(codec).__name__,
        "encoder_cfg": _cfg_to_dict(codec.encoder_cfg),
        "generator_cfg": _cfg_to_dict(codec.generator_cfg),
        "training_resolution": codec.training_resolution,
    }
    if isinstance(codec, GumbelCompressor):
        payload["disc_vars"] = codec.disc_vars
        meta["n_embeddings"] = codec.n_embeddings
    if isinstance(codec, UniformCABACCompressor):
        meta["quantization_bits"] = codec.quantization_bits
    if isinstance(codec, EntropyCodecBase) and codec.priors is not None:
        payload["priors"] = np.asarray(codec.priors)
    save_checkpoint(path, payload, meta=meta)


def load_codec(path: str, precision: Optional[Precision] = None):
    """Load a bundle; returns the right codec class."""
    payload, meta = load_checkpoint(path)
    enc_cfg = _cfg_from_dict(EncoderConfig, meta["encoder_cfg"])
    gen_cfg = _cfg_from_dict(GeneratorConfig, meta["generator_cfg"])
    kw = dict(
        training_resolution=meta.get("training_resolution"),
    )
    if precision is not None:
        kw["precision"] = precision
    kind = meta["kind"]
    if kind == "Compressor":
        return Compressor(enc_cfg, gen_cfg, payload["encoder_vars"],
                          payload["generator_vars"], **kw)
    if kind == "UniformCABACCompressor":
        codec = UniformCABACCompressor(
            enc_cfg, gen_cfg, payload["encoder_vars"],
            payload["generator_vars"],
            quantization_bits=meta.get("quantization_bits", 8), **kw)
        if "priors" in payload:
            codec.priors = np.asarray(payload["priors"], np.uint16)
        return codec
    cls = CABACCompressor if kind == "CABACCompressor" else GumbelCompressor
    codec = cls(enc_cfg, gen_cfg, payload["encoder_vars"],
                payload["generator_vars"], disc_vars=payload.get("disc_vars"),
                n_embeddings=meta.get("n_embeddings", 256), **kw)
    if kind == "CABACCompressor" and "priors" in payload:
        codec.priors = np.asarray(payload["priors"], np.uint16)
    return codec


def codec_from_training(
    checkpoint_path: str,
    generator_cfg: Optional[GeneratorConfig] = None,
    gen_vars=None,
    kind: str = "auto",
    n_embeddings: int = 256,
    precision: Precision = Precision(),
    seed: int = 0,
    quantization_bits: int = 8,
):
    """Build a codec from a TRAINING checkpoint (stage 1 or 2) + generator.

    ``kind='auto'`` picks GumbelCompressor for stage-2 checkpoints and the
    uniform Compressor for stage-1.  CABAC wraps stage-2 via kind='cabac'.
    """
    import jax
    import jax.numpy as jnp

    from ..models.generator import Generator

    raw, meta = load_checkpoint(checkpoint_path)
    cfg_meta = meta.get("config", {})
    generator_cfg = generator_cfg or GeneratorConfig()
    enc_cfg = EncoderConfig(
        img_resolution=cfg_meta.get("max_resolution", 1024),
        w_dim=cfg_meta.get("w_dim", generator_cfg.w_dim),
        num_ws=cfg_meta.get("num_ws", generator_cfg.num_ws),
        block_split=tuple(cfg_meta.get("block_split", (5, 12))),
        pool_grids=tuple(cfg_meta.get("pool_grids", (1, 1, 1))),
        hidden_dims=(tuple(cfg_meta["hidden_dims"])
                     if cfg_meta.get("hidden_dims") else None),
    )
    if gen_vars is None:
        # derive the generator key EXACTLY like build_stage1/build_stage2
        # (split(PRNGKey(seed))[1]) so a codec built from a training
        # checkpoint pairs with the same random-init generator it was
        # trained against
        _, k_gen = jax.random.split(jax.random.PRNGKey(seed))
        gen_vars = jax.jit(Generator(generator_cfg).init)(
            k_gen, jnp.zeros([1, generator_cfg.z_dim])
        )
    params = raw["params"]
    stage2 = "discretization" in params
    if kind == "auto":
        kind = "gumbel" if stage2 else "uniform"
    enc_params = params["encoder"] if stage2 else params
    enc_vars = {"params": enc_params}
    if kind == "uniform":
        return Compressor(enc_cfg, generator_cfg, enc_vars, gen_vars,
                          precision=precision)
    if kind == "uniform-cabac":
        return UniformCABACCompressor(enc_cfg, generator_cfg, enc_vars,
                                      gen_vars, precision=precision,
                                      quantization_bits=quantization_bits)
    disc_vars = (
        {"params": params["discretization"]} if stage2 else None
    )
    n_emb = cfg_meta.get("n_embeddings", n_embeddings)
    cls = CABACCompressor if kind == "cabac" else GumbelCompressor
    return cls(enc_cfg, generator_cfg, enc_vars, gen_vars,
               disc_vars=disc_vars, n_embeddings=n_emb, precision=precision)
