"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as opaque ``binary`` columns (or
``media_ref`` addresses) with typed metadata structs. The Spark-side
plumbing — schema, partition-preserving ``mapInPandas``, Arrow batch shape,
deterministic feature extraction — is real and tested; the *actual*
image/audio decode is stubbed (the decode libraries are not available in
this environment) behind ``decode_image``/``decode_audio`` which raise
``NotImplementedError``, with a deterministic fake used when
``fake=True``.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from typing import Callable, Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The decode contract: bytes in, ndarray out (image: HxW or HxWxC;
# audio: 1-D samples). Any codec satisfying it plugs into
# media_features(decoder=...) — PIL/libjpeg/ffmpeg wrappers in
# production, the stdlib zlib codec below in tests.
Decoder = Callable[[bytes], np.ndarray]


def decode_image(payload: bytes) -> np.ndarray:
    """Real image decode (PIL/libjpeg) — STUB: not available in this
    environment. Inject any :data:`Decoder` via
    ``media_features(decoder=...)``; :func:`decode_zlib_gray8` is a
    working stdlib-only reference implementation of the contract."""
    raise NotImplementedError(
        "image decode requires an imaging library not present in this "
        "environment; pass decoder= (e.g. decode_zlib_gray8) or "
        "fake=True for the deterministic stand-in")


def decode_audio(payload: bytes) -> np.ndarray:
    """Real audio decode — STUB, see decode_image."""
    raise NotImplementedError(
        "audio decode requires an audio library not present in this "
        "environment; pass decoder= or use fake=True")


# -- minimal real codec (stdlib only): deflate-compressed gray8 bitmap --
# payload = 8-byte big-endian (height, width) header + zlib(deflate) of
# the row-major uint8 pixels. A real compression round-trip (not a
# pass-through), so the decoder seam is exercised end-to-end in pytest
# without external imaging libraries.

def encode_zlib_gray8(arr: np.ndarray) -> bytes:
    """Encode a 2-D uint8 array with the repo's stdlib bitmap codec."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError("encode_zlib_gray8: expected a 2-D gray image")
    return struct.pack(">II", *a.shape) + zlib.compress(a.tobytes())


def decode_zlib_gray8(payload: bytes) -> np.ndarray:
    """Decode the stdlib bitmap codec — a working :data:`Decoder`."""
    h, w = struct.unpack(">II", payload[:8])
    px = np.frombuffer(zlib.decompress(payload[8:]), dtype=np.uint8)
    return px.reshape(h, w)


def _array_features(arr: np.ndarray, dim: int) -> np.ndarray:
    """Deterministic feature vector of a decoded pixel/sample array:
    shape dims then global moments, zero-padded/truncated to ``dim``."""
    a = np.asarray(arr, dtype=np.float64)
    feats = [float(arr.shape[0]),
             float(arr.shape[1]) if arr.ndim > 1 else 1.0,
             float(a.mean()), float(a.std()),
             float(a.min()), float(a.max()),
             float(np.median(a)),
             float(np.abs(np.diff(a.ravel())).mean()) if a.size > 1
             else 0.0]
    out = np.zeros(dim, dtype=np.float64)
    n = min(dim, len(feats))
    out[:n] = feats[:n]
    return out


def _fake_features(ref: str, dim: int) -> np.ndarray:
    """Deterministic stand-in for decode→feature-extract.

    feature[i] = uint64(first 8 md5 bytes of ``f"{ref}:{i}"``) / 2^64 —
    pure hash arithmetic, NOT a PRNG, so the DuckDB oracle reproduces it
    bit-identically in SQL (``CAST('0x' || substr(md5(..),1,16) AS
    UBIGINT)``, the same technique as the SimHash oracle) and the driver
    can value-check the whole multimodal plumbing path instead of
    counting rows."""
    return np.array([
        int.from_bytes(hashlib.md5(f"{ref}:{i}".encode()).digest()[:8],
                       "big") / 2.0**64
        for i in range(dim)], dtype=np.float64)


_FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("feature", T.ArrayType(T.DoubleType())),
])


def media_features(media_spans: DataFrame, dim: int = 8,
                   fake: bool = True,
                   decoder: Optional[Decoder] = None,
                   payload_col: str = "payload") -> DataFrame:
    """Decode + feature-extract media spans via ``mapInPandas``.

    Input: (doc_id, media_ref[, payload]). Arrow batches flow through
    one Python worker pass; per-batch the features are computed
    vectorized.

    The decode step is INJECTABLE: pass ``decoder`` (any
    :data:`Decoder` — bytes → ndarray) and a binary ``payload_col``
    and the non-fake path runs the real codec + :func:`_array_features`
    per payload. Without a decoder, ``fake=True`` uses the
    hash-deterministic stand-in (oracle-checkable); ``fake=False``
    raises, documenting that this environment ships no imaging libs.
    """
    use_payload = decoder is not None
    cols = (["doc_id", "media_ref", payload_col] if use_payload
            else ["doc_id", "media_ref"])

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if use_payload:
                feats = [_array_features(decoder(bytes(p)), dim).tolist()
                         for p in pdf[payload_col]]
            elif fake:
                feats = [_fake_features(r, dim).tolist()
                         for r in pdf["media_ref"]]
            else:
                raise NotImplementedError("real media decode unavailable")
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "feature": feats,
            })

    return media_spans.select(*cols).mapInPandas(
        extract, schema=_FEATURE_SCHEMA)


def media_span_stats(docs: DataFrame) -> DataFrame:
    """Per-document media statistics straight off the nested spans column —
    no explode shuffle, pure array expressions."""
    media = F.filter("spans", lambda s: s["kind"] == F.lit("media"))
    bands = F.array_distinct(F.transform(
        media, lambda s: F.element_at(F.split(s["media_ref"], "/"), 5)))
    return docs.select(
        "doc_id",
        F.size("spans").alias("n_spans"),
        F.size(media).alias("n_media"),
        F.size(bands).alias("n_bands"),
        F.size(F.filter("spans", lambda s: s["kind"] == F.lit("text"))).alias("n_text"),
    )


def media_span_stats_sql(docs_path: str) -> str:
    return f"""
SELECT doc_id,
       len(spans) AS n_spans,
       len(list_filter(spans, s -> s.kind = 'media')) AS n_media,
       len(list_distinct(list_transform(
           list_filter(spans, s -> s.kind = 'media'),
           s -> str_split(s.media_ref, '/')[5]))) AS n_bands,
       len(list_filter(spans, s -> s.kind = 'text')) AS n_text
FROM read_parquet('{docs_path}')
"""
