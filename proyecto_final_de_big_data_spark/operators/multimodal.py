"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched Pandas UDFs via
``mapInPandas``.

The actual media decode is STUBBED (no image/audio libraries in this
container — see ``decode_image``), but the Spark-side plumbing is real
and tested: schema contract, batch iteration shape, deterministic
fallback featurizer. Swapping the stub for PIL/torchaudio is a local
change inside one function.

Scale notes: ``mapInPandas`` streams Arrow batches per partition — no
per-row Python overhead, no driver involvement; partition count governs
parallelism, and binary payloads never shuffle (featurize before any
groupBy so only small feature vectors move).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, content_fp string, feat_mean double, feat_dim int"
)


def decode_image(payload: bytes) -> object:
    """Decode an image payload. STUB: media codecs are not available in
    this environment; integrate PIL/OpenCV here in production."""
    raise NotImplementedError("media decode requires an image library (PIL/OpenCV)")


def _fake_features(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in featurizer: bytes of the sha256 digest
    scaled to [0,1] — stable across runs/engines, no external libs."""
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:dim]]


def featurize_media(df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over a binary column.

    Emits (id, n_bytes, content_fp, feat_mean, feat_dim) per row using
    the deterministic fake featurizer (decode stubbed).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            feats = [_fake_features(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "n_bytes": [len(bytes(p)) for p in payloads],
                    "content_fp": [hashlib.md5(bytes(p)).hexdigest()[:16] for p in payloads],
                    "feat_mean": [sum(f) / len(f) for f in feats],
                    "feat_dim": [len(f) for f in feats],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(extract, schema=MEDIA_FEATURE_SCHEMA)


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter: treat document text bytes as an opaque media payload so
    the binary plumbing is exercisable on the stock fixtures."""
    return df.select(F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("payload"))
