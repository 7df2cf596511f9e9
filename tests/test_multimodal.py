"""Multimodal binary-column plumbing: featurize, resize, frame sampling.
The decode kernels are deterministic stubs; these tests pin the exact
values the stubs must produce so the Spark-side plumbing (schema, batch
shape, fan-out) is verified independently of the SQL-metadata oracles.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from proyecto_final_de_big_data_spark.operators.multimodal import (
    documents_as_media,
    resize_images,
    sample_frames,
)


def _media_df(spark, rows):
    return documents_as_media(
        spark.createDataFrame(rows, "doc_id long, text string")
    )


def test_resize_pins_stub_pixel_values(spark):
    text = "hello multimodal world"
    df = _media_df(spark, [(1, text)])
    out = resize_images(df, width=16, height=16).collect()
    assert len(out) == 1
    r = out[0]
    payload = text.encode("utf-8")
    digest = hashlib.sha256(payload).digest()
    n_out = 16 * 16 * 3
    tiled = (digest * (n_out // len(digest) + 1))[:n_out]
    assert r["n_bytes_in"] == len(payload)
    assert r["n_bytes_out"] == n_out
    assert abs(r["pixel_mean"] - sum(tiled) / n_out / 255.0) < 1e-12
    assert (r["width"], r["height"]) == (16, 16)


def test_frame_sampling_indices_and_fingerprints(spark):
    # 300 bytes / frame_bytes=100 -> 3 frames; stride 2 -> frames 0, 2
    text = "x" * 300
    df = _media_df(spark, [(7, text)])
    out = {r["frame_idx"]: r for r in sample_frames(df, frame_bytes=100, stride=2).collect()}
    assert sorted(out) == [0, 2]
    payload = text.encode("utf-8")
    for i, r in out.items():
        frame = payload[i * 100 : (i + 1) * 100]
        assert r["frame_fp"] == hashlib.sha256(frame).hexdigest()[:16]
        assert r["n_frames"] == 3


def test_frame_sampling_short_payload_emits_nothing(spark):
    df = _media_df(spark, [(1, "tiny")])
    assert sample_frames(df, frame_bytes=64, stride=4).count() == 0


def test_resize_one_record_per_image(spark, sf_dir):
    from proyecto_final_de_big_data_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    n_docs = docs.count()
    assert resize_images(documents_as_media(docs)).count() == n_docs


def test_binary_dir_ingest_glob_and_path_ids(spark, tmp_path):
    from proyecto_final_de_big_data_spark.io.binary import read_binary_dir, with_path_id

    (tmp_path / "doc_7.bin").write_bytes(b"payload-7")
    (tmp_path / "doc_9.bin").write_bytes(b"payload-nine")
    (tmp_path / "UNNAMED.bin").write_bytes(b"no id")
    (tmp_path / "notes.txt").write_bytes(b"pruned by glob")

    files = read_binary_dir(spark, str(tmp_path), glob="*.bin")
    rows = {
        r["file_id"]: r
        for r in with_path_id(files, r"doc_(\d+)\.bin$").collect()
    }
    # The glob pruned notes.txt at listing; the unmatched name surfaces
    # as a NULL id rather than silently dropping.
    assert sorted(rows, key=lambda k: (k is None, k)) == [7, 9, None]
    assert bytes(rows[7]["content"]) == b"payload-7"
    assert rows[9]["length"] == len(b"payload-nine")
