"""Raw-file ingestion for the multimodal surface: the ``binaryFile``
source turns a directory of opaque media files into the engine's
``(id, content: binary, metadata)`` shape in one declarative read.

The multimodal operators (``operators/multimodal.py``) start from a
parquet table with a binary column; real corpora start as millions of
loose image/audio/document files. ``spark.read.format("binaryFile")``
is the built-in bridge: each file becomes one row of
``(path, modificationTime, length, content)``, the listing is
distributed, and each task reads only its own files — no driver-side
staging pass. At 100 TB the knobs that matter:

- ``pathGlobFilter`` prunes non-media files AT LISTING time (the
  filter never reads a byte of a skipped file);
- ``recursiveFileLookup`` walks nested layouts (e.g. ``crawl/host/...``)
  without a partition-discovery pass;
- ``spark.sql.files.maxPartitionBytes`` governs how many small files
  coalesce into one task — the same small-file economics
  ``io/compact.py`` documents, applied at ingest.

Identity comes from the filename (``with_path_id``), which keeps the
whole ingest a pure projection: no shuffle anywhere between "directory
of files" and "typed rows ready for ``mapInPandas`` featurization".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Read a directory of opaque files as
    ``(path, modificationTime, length, content)`` rows."""
    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


def with_path_id(
    df: DataFrame, pattern: str, id_col: str = "file_id", cast: str = "long"
) -> DataFrame:
    """Extract an id from the file path (regex group 1). Rows whose path
    does not match carry NULL — surface them, don't drop them: a file
    the naming convention can't identify is an ingest error to audit."""
    extracted = F.regexp_extract(F.col("path"), pattern, 1)
    return df.withColumn(
        id_col,
        F.when(extracted == "", F.lit(None)).otherwise(extracted).cast(cast),
    )
