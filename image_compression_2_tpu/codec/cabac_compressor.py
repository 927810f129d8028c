"""Entropy-coded codecs: HVAE encode -> integer codes -> CABAC -> `.cabac`.

API parity with the reference ``CABACCompressor``
(/root/reference/cabac_compression.py:409-588): ``compress(x, use_cabac)``
returning (bytes, metadata) with orig_size measured against raw index bytes,
``decompress(bytes, metadata)``, ``save_compressed``/``load_compressed`` on a
(corrected) `.cabac` container.  Differences by design:

- every stream gets FRESH contexts (the reference mutates one shared model
  across encode and decode, so its own roundtrip decodes with drifted state —
  SURVEY §2.3 E5);
- batches are coded as B INDEPENDENT per-image streams (lengths recorded in
  metadata): encode/decode parallelise across cores (the native coder
  releases the GIL) and any single image decodes without the rest;
- the device side (encoder, discretization, synthesis) is batched TPU work;
  only the sequential range-coder loop runs on host, in native C++;
- metadata additionally reports ``orig_size_pixels``/``ratio_vs_pixels`` so
  both of the reference's two incompatible ratio definitions are explicit
  (SURVEY §6).

The entropy layer is agnostic to WHERE the integer codes come from, so it
lives in ``EntropyCodecBase`` with two hooks (``_latent_codes`` /
``_reconstruct_codes``): ``CABACCompressor`` feeds it Gumbel codebook
indices (the reference's pairing); ``codec/uniform_cabac.py`` feeds it
uniform-quantized stage-1 latents — a beyond-reference pairing the reference
cannot express because its CABAC path is welded to the discretization.
"""

from __future__ import annotations

import zlib
from typing import Dict, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from ..coding import decode_batched as cabac_decode_batched
from ..coding import encode_batched as cabac_encode_batched
from ..coding.container import read_cabac_file, write_cabac_file
from .gumbel_compressor import GumbelCompressor


class EntropyCodecBase:
    """CABAC entropy layer over any integer latent codes.

    Subclasses provide ``n_symbols``, ``_latents_id`` (a short string baked
    into stream metadata so a stream never silently decodes through the
    wrong latent codec), ``_latent_codes(x, refine_steps, refine_lr)`` →
    (int32 [B, T, D], extra stream metadata — e.g. the per-(image, layer)
    affine latent range refined codes need), and
    ``_reconstruct_codes(codes, metadata)`` → images.

    Optional trained priors: ``calibrate(images)`` encodes a calibration
    batch on the TPU, histograms the code indices per (T, D) position (a
    batched one-hot reduction on device), and uses the smoothed table as the
    entropy model's initial frequencies — capturing per-dimension latent
    structure the in-stream adaptive contexts cannot see.  The prior travels
    with the codec (``save_priors``/``load_priors``), NOT inside each
    ``.cabac`` file by default; streams record which mode they used.
    """

    priors: Optional[np.ndarray] = None

    # -------------------------------------------------------------- hooks
    @property
    def n_symbols(self) -> int:
        raise NotImplementedError

    @property
    def _latents_id(self) -> str:
        raise NotImplementedError

    def _latent_codes(self, x, refine_steps: int = 0,
                      refine_lr: float = 0.02) -> Tuple[np.ndarray, Dict]:
        raise NotImplementedError

    def _reconstruct_codes(self, codes: np.ndarray,
                           metadata: Optional[Dict] = None) -> jnp.ndarray:
        raise NotImplementedError

    # ------------------------------------------------------------- priors
    def calibrate(self, images, batch_size: int = 8,
                  refine_steps: int = 0,
                  refine_lr: float = 0.02) -> np.ndarray:
        """``refine_steps`` must match the intended encode setting: refined
        latents have tighter per-position statistics, so a prior built from
        unrefined codes under-models them (and vice versa)."""
        from ..coding import build_prior

        all_codes = []
        n_sym = self.n_symbols
        n = images.shape[0]
        for i in range(0, n, batch_size):
            codes, em = self._latent_codes(
                images[i:i + batch_size], refine_steps=refine_steps,
                refine_lr=refine_lr)
            # the table's alphabet must match the streams it will model
            # (e.g. the fixed-step refined grid widens it)
            n_sym = int(em.get("_n_symbols", self.n_symbols))
            all_codes.append(codes)
        self.priors = build_prior(np.concatenate(all_codes), n_sym)
        return self.priors

    def save_priors(self, filename: str) -> None:
        assert self.priors is not None, "calibrate() first"
        np.savez_compressed(filename, priors=self.priors,
                            n_embeddings=self.priors.shape[-1])

    def load_priors(self, filename: str) -> None:
        data = np.load(filename)
        n_emb = int(data["n_embeddings"])
        # the nominal alphabet, or a widened refined-grid alphabet (an
        # integer multiple of it — codec/uniform_cabac.py's grid_expand)
        assert n_emb % self.n_symbols == 0, (n_emb, self.n_symbols)
        self.priors = np.asarray(data["priors"], np.uint16)
        assert self.priors.shape[-1] == n_emb, (self.priors.shape, n_emb)

    # ------------------------------------------------------------ entropy
    def compress_entropy(
        self, x, use_cabac: bool = True, use_priors: Optional[bool] = None,
        refine_steps: int = 0, refine_lr: float = 0.02,
    ) -> Tuple[bytes, Dict]:
        """Image batch -> (payload bytes, metadata).  ``refine_steps``
        enables encode-time inversion refinement before code extraction
        (codec/refine.py); refined codes ride a per-(image, layer) affine
        grid recorded in the metadata (``w_range``) so refinement's
        out-of-[-1,1] latents survive entropy coding.

        ``use_priors=None`` (auto) with a loaded prior table encodes BOTH
        with the trained priors and with plain adaptive contexts and keeps
        the smaller stream — entropy coding with a stale or mismatched prior
        must never cost rate vs not using it (round-4 RD: 4-bit priors lost
        to adaptive 240:1 vs 249:1)."""
        codes, extra_meta = self._latent_codes(x, refine_steps=refine_steps,
                                               refine_lr=refine_lr)
        # streams may use a wider alphabet than the nominal one (e.g. the
        # fixed-step refined grid, codec/uniform_cabac.py) — the subclass
        # signals it via the private _n_symbols key; priors only apply when
        # their table was calibrated at the stream's alphabet
        n_sym = int(extra_meta.pop("_n_symbols", self.n_symbols))
        priors_ok = self.priors is not None and self.priors.shape[-1] == n_sym
        auto_priors = use_priors is None
        if auto_priors:
            use_priors = priors_ok
        elif use_priors and not priors_ok:
            raise ValueError(
                "use_priors=True but no prior table for this stream's "
                f"alphabet ({n_sym} symbols) is loaded — calibrate(images) "
                "with matching refine settings or load_priors(file) first"
            )
        orig_size = self._raw_index_bits(codes) / 8  # raw index bytes
        stream_lengths = None
        if use_cabac:
            # one INDEPENDENT stream per image (fresh contexts), coded on a
            # thread pool — batch encode scales with cores and any single
            # image can be decoded without touching the others
            payload, stream_lengths = cabac_encode_batched(
                codes, n_sym, self.priors if use_priors else None)
            if use_priors and auto_priors:
                alt, alt_lengths = cabac_encode_batched(codes, n_sym, None)
                if len(alt) < len(payload):
                    payload, stream_lengths, use_priors = alt, alt_lengths, False
            # Entropy coding must never expand: if the codes carry ~no mutual
            # information (e.g. an untrained encoder), fall back to packed raw.
            raw = self._pack_raw(codes, n_sym)
            if len(raw) < len(payload):
                payload, use_cabac, use_priors = raw, False, False
                stream_lengths = None
        else:
            use_priors = False
            payload = self._pack_raw(codes, n_sym)
        # side information (e.g. the affine latent range) counts toward the
        # rate: it is genuine per-image data the decoder needs
        side_info = sum(np.asarray(v).size * 4 for v in extra_meta.values()
                        if isinstance(v, (list, np.ndarray)))
        comp_size = len(payload) + side_info
        orig_size_pixels = int(np.prod(x.shape)) * 4
        metadata = {}
        if use_cabac and use_priors:
            # Decoding with a different prior table silently desyncs the range
            # coder into plausible garbage; record the table identity so
            # decompress can verify it (the payload CRC cannot catch this).
            metadata["priors_crc32"] = zlib.crc32(self.priors.tobytes())
        if stream_lengths is not None:
            metadata["stream_lengths"] = stream_lengths
        metadata |= extra_meta
        metadata |= {
            # v2 = B independent per-image streams (stream_lengths in the
            # metadata); v1 was one monolithic stream — an incompatible
            # layout must not reuse the old identifier
            "codec": ("ic2t-cabac-v2" if use_cabac
                      else self._raw_codec_name(n_sym)),
            "latents": self._latents_id,
            "shape": list(codes.shape),
            "n_embeddings": int(n_sym),
            "use_cabac": bool(use_cabac),
            "use_priors": bool(use_priors),
            "orig_size": float(orig_size),
            "comp_size": int(comp_size),
            "compression_ratio": float(orig_size / comp_size),
            "orig_size_pixels": orig_size_pixels,
            "ratio_vs_pixels": float(orig_size_pixels / comp_size),
        }
        return payload, metadata

    def _raw_index_bits(self, codes: np.ndarray) -> float:
        """Raw fixed-width index bits (the reference's orig_size basis —
        /root/reference/cabac_compression.py:474); subclasses with per-layer
        alphabets override."""
        return codes.size * float(np.log2(self.n_symbols))

    def _raw_codec_name(self, n_sym: Optional[int] = None) -> str:
        n = self.n_symbols if n_sym is None else n_sym
        return "raw-u8" if n <= 256 else "raw-u16"

    def _pack_raw(self, codes: np.ndarray, n_sym: Optional[int] = None) -> bytes:
        n = self.n_symbols if n_sym is None else n_sym
        dt = np.uint8 if n <= 256 else np.uint16
        return codes.astype(dt).tobytes()

    def _unpack_raw(self, payload: bytes, shape, codec: str) -> np.ndarray:
        dt = {"raw-u8": np.uint8, "raw-u16": np.uint16,
              "raw-int32": np.int32}[codec]
        return np.frombuffer(payload, dt).reshape(shape).astype(np.int32)

    def decompress_entropy(
        self, payload: bytes, metadata: Dict,
        image_index: Optional[int] = None,
    ) -> jnp.ndarray:
        """Reconstruct the batch — or, with ``image_index``, a single image
        (possible because every image is an independent entropy stream)."""
        stream_latents = metadata.get("latents")
        if stream_latents is not None and stream_latents != self._latents_id:
            raise ValueError(
                f"stream carries {stream_latents!r} codes but this codec "
                f"reconstructs {self._latents_id!r} — decoding would produce "
                f"plausible garbage"
            )
        shape = tuple(metadata["shape"])
        if metadata.get("use_cabac", True):
            priors = None
            if metadata.get("use_priors", False):
                assert self.priors is not None, (
                    "stream was encoded with trained priors; load_priors() first"
                )
                priors = self.priors
                if priors.shape[-1] != int(metadata["n_embeddings"]):
                    raise ValueError(
                        f"loaded prior table models {priors.shape[-1]} "
                        f"symbols but the stream's alphabet is "
                        f"{metadata['n_embeddings']} — wrong table"
                    )
                expected_crc = metadata.get("priors_crc32")
                if (expected_crc is not None
                        and zlib.crc32(priors.tobytes()) != expected_crc):
                    raise ValueError(
                        "loaded prior table does not match the one this "
                        "stream was encoded with (crc mismatch)"
                    )
            codes = cabac_decode_batched(
                payload, metadata.get("stream_lengths"), shape,
                metadata["n_embeddings"], priors, image_index=image_index,
            )
        else:
            codes = self._unpack_raw(payload, shape, metadata["codec"])
            if image_index is not None:
                codes = codes[image_index:image_index + 1]
        if image_index is not None and "w_range" in metadata:
            metadata = dict(metadata)
            metadata["w_range"] = np.asarray(
                metadata["w_range"])[image_index:image_index + 1].tolist()
        return self._reconstruct_codes(codes, metadata)

    # ---------------------------------------------------------- container
    def save_compressed(  # type: ignore[override]
        self, x, filename: str, use_cabac: bool = True,
        embed_priors: bool = False, refine_steps: int = 0,
        refine_lr: float = 0.02,
    ) -> Tuple[float, int, float]:
        """``embed_priors=True`` writes a SELF-CONTAINED container (v3): the
        zlib-compressed prior table rides inside the file, so a priors-coded
        stream decodes on a fresh codec without the separately-shipped
        bundle.  Default stays the lean external-bundle mode (the table is
        ~100x the payload for single images)."""
        payload, metadata = self.compress_entropy(
            x, use_cabac=use_cabac, refine_steps=refine_steps,
            refine_lr=refine_lr)
        blob = None
        if embed_priors and metadata.get("use_priors"):
            blob = zlib.compress(
                np.ascontiguousarray(self.priors, "<u2").tobytes(), 6)
        write_cabac_file(filename, payload, metadata, priors_blob=blob)
        return (
            metadata["orig_size"],
            metadata["comp_size"],
            metadata["compression_ratio"],
        )

    def load_compressed(self, filename: str):  # type: ignore[override]
        payload, metadata = read_cabac_file(filename)
        blob = metadata.pop("_embedded_priors", None)
        if blob is not None and metadata.get("use_priors"):
            shape = tuple(metadata["shape"])
            n_emb = int(metadata["n_embeddings"])
            table = np.frombuffer(
                zlib.decompress(blob), "<u2"
            ).reshape(shape[1], shape[2], n_emb)
            # the embedded table must be the one the stream was coded with;
            # the priors_crc32 check in decompress_entropy enforces it
            self.priors = np.ascontiguousarray(table, np.uint16)
        img = self.decompress_entropy(payload, metadata)
        return img, metadata["compression_ratio"]


class CABACCompressor(EntropyCodecBase, GumbelCompressor):
    """GumbelCompressor + context-adaptive entropy coding of its codebook
    indices — the reference's pairing
    (/root/reference/cabac_compression.py:409-588)."""

    @property
    def n_symbols(self) -> int:
        return self.n_embeddings

    @property
    def _latents_id(self) -> str:
        return "gumbel"

    def _latent_codes(self, x, refine_steps: int = 0,
                      refine_lr: float = 0.02) -> Tuple[np.ndarray, Dict]:
        return np.asarray(
            GumbelCompressor.compress(self, x, refine_steps=refine_steps,
                                      refine_lr=refine_lr), np.int32), {}

    def _reconstruct_codes(self, codes: np.ndarray,
                           metadata: Optional[Dict] = None) -> jnp.ndarray:
        return self.decompress(jnp.asarray(codes))
