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


RESIZE_SCHEMA = (
    "doc_id long, width int, height int, n_bytes_in long, n_bytes_out long, pixel_mean double"
)


def resize_images(
    df: DataFrame,
    width: int = 16,
    height: int = 16,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Decode → resize → re-encode plumbing over a binary column.

    The decode/resample kernel is STUBBED (no PIL/OpenCV here): pseudo
    RGB pixels are derived by tiling sha256(payload) to width×height×3
    bytes — deterministic across runs and engines, so the metadata
    contract (byte counts, dimensions, pixel mean) is testable. In
    production only the kernel body changes; the mapInPandas shape —
    one Arrow batch in, one typed record per image out, binary never
    shuffled — is the part that must survive a 100-TB corpus.
    """
    n_out = width * height * 3

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) for p in pdf[payload_col]]
            pixel_means = []
            for p in payloads:
                digest = hashlib.sha256(p).digest()
                tiled = (digest * (n_out // len(digest) + 1))[:n_out]
                pixel_means.append(sum(tiled) / n_out / 255.0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].values,
                    "width": width,
                    "height": height,
                    "n_bytes_in": [len(p) for p in payloads],
                    "n_bytes_out": n_out,
                    "pixel_mean": pixel_means,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(do, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_idx int, n_frames int, frame_fp string"


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 64,
    stride: int = 4,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame sampling plumbing for video-like payloads: treat the binary
    as ``n_frames = floor(n_bytes / frame_bytes)`` fixed-size frames and
    emit every ``stride``-th one — the mapInPandas fan-out shape (one
    input row → many typed frame rows) a real video pipeline needs.
    The "frame decode" is a byte slice + sha256 fingerprint; swapping in
    a real codec changes only the slice body.

    Payloads shorter than one frame emit no rows (no decodable frame).
    """

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, totals, fps = [], [], [], []
            for doc_id, p in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(p)
                n_frames = len(payload) // frame_bytes
                for i in range(0, n_frames, stride):
                    frame = payload[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(doc_id)
                    idxs.append(i)
                    totals.append(n_frames)
                    fps.append(hashlib.sha256(frame).hexdigest()[:16])
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "n_frames": totals, "frame_fp": fps}
            )

    return df.select(id_col, payload_col).mapInPandas(do, schema=FRAME_SCHEMA)
