"""Training-data-pipeline queries over ``documents`` / ``embeddings``:
dedup, text analysis, fingerprinting, similarity search, multimodal
plumbing. The north-star extension surface (SURVEY §7 phase 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators.dedup import exact_dedup, minhash_dedup_pairs
from ..operators.multimodal import documents_as_media, featurize_media
from ..operators.similarity import cosine_topk
from ..operators.similarity_ivf import ivf_cosine_topk
from ..operators.text import LANG_MARKERS, fingerprint, lang_guess, quality_score, token_count
from .registry import register

# --------------------------------------------------------------------------
# Exact deduplication
# --------------------------------------------------------------------------


@register(
    "dedup_exact_stats",
    oracle="""
    SELECT source, count(*) AS n_docs,
           count(DISTINCT md5(text)) AS n_unique_texts
    FROM documents
    GROUP BY 1
    """,
    description="Exact-dup profile per source via content digest",
)
def q_dedup_exact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique_texts"),
    )


@register(
    "dedup_exact_keep",
    oracle="""
    SELECT count(*) AS n_keep, sum(n_chars)::BIGINT AS total_chars
    FROM documents
    WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
    """,
    description="Exact dedup keeping min-id row per distinct text; KPIs of survivors",
)
def q_dedup_exact_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    kept = exact_dedup(docs, ["text"], "doc_id")
    return kept.agg(F.count(F.lit(1)).alias("n_keep"), F.sum("n_chars").alias("total_chars"))


@register(
    "ngram_jaccard_pairs",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, text,
               list_filter(string_split_regex(text, '\s+'), w -> len(w) > 0) AS w
        FROM documents WHERE doc_id < 500
    ), sh AS (
        SELECT doc_id,
               list_distinct(
                   CASE WHEN len(w) >= 3 THEN
                       list_transform(range(1, len(w) - 1),
                                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                   ELSE [text] END
               ) AS sh
        FROM toks
    )
    SELECT id_a, id_b, round(jaccard, 6) AS jaccard
    FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_intersect(a.sh, b.sh))::DOUBLE
                 / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
        FROM sh a, sh b
        WHERE a.doc_id < b.doc_id
    )
    WHERE jaccard >= 0.5
    """,
    description="Exact all-pairs word-3-gram Jaccard near-dup pairs (threshold 0.5) — "
    "the exact baseline that verifies the LSH scale path, computed via a "
    "shingle inverted-index join (no cartesian product). Bounded to "
    "doc_id < 500 so the baseline stays O(1) as SF grows; at scale the "
    "answer comes from minhash_near_dup_pairs.",
)
def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import jaccard_pairs_index

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return jaccard_pairs_index(docs, "doc_id", "text", shingle_n=3, threshold=0.5).withColumn(
        "jaccard", F.round("jaccard", 6)
    )


@register(
    "minhash_near_dup_pairs",
    oracle=None,  # LSH bucketing is not SQL-expressible portably → rows-only check
    description="MinHash-LSH near-dup candidate pairs, Jaccard-verified (threshold 0.5)",
)
def q_minhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(docs, "doc_id", "text", num_hashes=32, bands=8, threshold=0.5)
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.coalesce(F.avg("jaccard"), F.lit(0.0)).alias("avg_jaccard"),
    )


@register(
    "simhash_near_dup",
    oracle=None,  # xxhash64 bit-votes are engine-specific → rows-only check
    description="SimHash(64-bit) banded near-dup pairs (Hamming <= 3), rollup",
)
def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.simhash import simhash_near_dup_pairs

    docs = load_table(spark, sf_dir, "documents")
    pairs = simhash_near_dup_pairs(docs, "doc_id", "text", max_hamming=3)
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.coalesce(F.avg("hamming"), F.lit(0.0)).alias("avg_hamming"),
    )


@register(
    "embedding_near_dup",
    oracle=None,  # hyperplane-LSH bucketing is engine-specific → rows-only check
    description="Embedding-cosine near-dup pairs via hyperplane-LSH buckets "
    "(cosine >= 0.95 verified), rollup",
)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity_ann import embedding_near_dup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_near_dup_pairs(emb, dim=64, threshold=0.95, n_planes=10, n_tables=4)
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.coalesce(F.avg("cosine_sim"), F.lit(0.0)).alias("avg_cosine"),
    )


# --------------------------------------------------------------------------
# Recall contracts for the approximate (LSH/MinHash/SimHash) family.
# Each emits (n_exact, recall_ok): n_exact is pinned by the DuckDB oracle,
# recall_ok flips to 0 — breaking the value hash — if the approximate
# operator's recall vs the exact in-engine baseline regresses.
# --------------------------------------------------------------------------


@register(
    "minhash_recall",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, text,
               list_filter(string_split_regex(text, '\s+'), w -> len(w) > 0) AS w
        FROM documents WHERE doc_id < 500
    ), sh AS (
        SELECT doc_id,
               list_distinct(
                   CASE WHEN len(w) >= 3 THEN
                       list_transform(range(1, len(w) - 1),
                                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                   ELSE [text] END
               ) AS sh
        FROM toks
    ), exact AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a, sh b
        WHERE a.doc_id < b.doc_id
          AND len(list_intersect(a.sh, b.sh))::DOUBLE
                / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
    )
    SELECT count(*) AS n_exact, 1 AS recall_ok FROM exact
    """,
    description="MinHash-LSH recall vs exact all-pairs Jaccard (threshold 0.5) "
    "on the bounded doc_id<500 subset. Measured 1.0 at sf0.001 and sf0.01 "
    "(32 hashes / 8 bands); flag threshold 0.95. The exact baseline uses the "
    "hashed-shingle inverted index (long join keys) — only the pair SET "
    "feeds the recall join, so 64-bit collisions (~1e-9) are the only "
    "divergence risk vs the string index, and the 0.95 flag threshold sits "
    "far from the measured 1.0.",
)
def q_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import jaccard_pairs_hashed_index

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    exact = jaccard_pairs_hashed_index(docs, "doc_id", "text", shingle_n=3, threshold=0.5)
    approx = minhash_dedup_pairs(docs, "doc_id", "text", num_hashes=32, bands=8, threshold=0.5)
    return _pair_recall(exact, approx, ["id_a", "id_b"], threshold=0.95)


@register(
    "simhash_banding_lossless",
    oracle="""
    SELECT count(*) AS n_docs, 1 AS lossless_ok
    FROM documents WHERE doc_id < 500
    """,
    description="SimHash 16-bit-chunk banding is provably lossless for "
    "Hamming distance <= 3 (pigeonhole: 4 chunks, <= 3 differing bits leave "
    "one chunk equal). This query checks the implementation delivers that: "
    "banded pairs must EQUAL exact all-pairs Hamming<=3 on the bounded "
    "subset, in both directions.",
)
def q_simhash_banding_lossless(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.simhash import simhash_near_dup_pairs, simhash_signatures

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    # Persist the (tiny: one long per doc) signature frame: it feeds the
    # exact all-pairs side AND the banded side — without it the
    # explode+64-agg signature job runs three times.
    sigs = simhash_signatures(docs, "doc_id", "text").persist()
    a, b = sigs.alias("a"), sigs.alias("b")
    exact = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
    )
    banded = simhash_near_dup_pairs(docs, "doc_id", "text", max_hamming=3, signatures=sigs)
    full = exact.select("id_a", "id_b").withColumn("__e", F.lit(1)).join(
        banded.select("id_a", "id_b").withColumn("__b", F.lit(1)), ["id_a", "id_b"], "full_outer"
    )
    stats = full.agg(
        F.sum(F.coalesce(F.col("__e"), F.lit(0))).alias("ne"),
        F.sum(F.coalesce(F.col("__b"), F.lit(0))).alias("nb"),
        F.sum(F.coalesce(F.col("__e"), F.lit(0)) * F.coalesce(F.col("__b"), F.lit(0))).alias("nc"),
    )
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    from ..utils.caching import materialize_and_release

    return materialize_and_release(
        n_docs.crossJoin(
            stats.select(
                ((F.col("ne") == F.col("nc")) & (F.col("nb") == F.col("nc")))
                .cast("int")
                .alias("lossless_ok")
            )
        ),
        sigs,
    )


@register(
    "embedding_near_dup_recall",
    oracle="""
    WITH base AS (
        SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings WHERE vec_id < 300
    ), planted AS (
        SELECT vec_id + 1000000 AS vec_id, list_transform(ev, x -> x * 1.01::DOUBLE) AS ev
        FROM base WHERE vec_id < 20
    ), v AS (
        SELECT * FROM base UNION ALL SELECT * FROM planted
    ), exact AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM v a, v b
        WHERE a.vec_id < b.vec_id
          AND list_dot_product(a.ev, b.ev)
                / (sqrt(list_dot_product(a.ev, a.ev)) * sqrt(list_dot_product(b.ev, b.ev)))
              >= 0.95
    )
    SELECT count(*) AS n_exact, 1 AS recall_ok FROM exact
    """,
    description="Hyperplane-LSH near-dup recall vs exact all-pairs cosine "
    ">= 0.95 on the bounded vec_id<300 subset PLUS 20 planted near-dups "
    "(scaled twins of vec_id<20, ids offset by 1e6) constructed inside the "
    "query on both sides — the isotropic fixture alone has no pairs >= "
    "0.95, which made the round-2 variant vacuous. The oracle pins "
    "n_exact = 20, so the LSH hit path (bucket collision + cosine "
    "verification) must actually fire for the hash to match; the "
    "perturbed-angle variant is pinned by unit test.",
)
def q_embedding_near_dup_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import as_double_array
    from ..operators.similarity_ann import embedding_near_dup_pairs
    from ..operators.vecmath import cosine_batch

    base = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 300)
        .select("vec_id", as_double_array("embedding").alias("embedding"))
    )
    planted = base.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.01).alias("embedding"),
    )
    corpus = base.unionByName(planted)
    v = corpus.select("vec_id", F.col("embedding").alias("v"))
    a, b = v.alias("a"), v.alias("b")
    # Batch (numpy) cosine: the 45k-pair all-pairs baseline dominated the
    # suite under the interpreted fold; the 0.95 threshold sits far from
    # any fixture cosine (planted twins sit at exactly 1.0), so
    # summation-order ulp noise cannot flip a pair.
    exact = (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cosine_batch(F.col("a.v"), F.col("b.v")).alias("c"),
        )
        .filter(F.col("c") >= 0.95)
    )
    approx = embedding_near_dup_pairs(corpus, dim=64, threshold=0.95, n_planes=10, n_tables=4)
    return _pair_recall(exact, approx, ["id_a", "id_b"], threshold=0.95)


# --------------------------------------------------------------------------
# Deterministic dataset splitting
# --------------------------------------------------------------------------


def _split_oracle() -> str:
    from ..operators.split import split_case_sql

    case = split_case_sql("doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1})
    return f"""
    SELECT split, lang, count(*) AS n_docs, avg(n_chars) AS avg_chars
    FROM (SELECT lang, n_chars, {case} FROM documents)
    GROUP BY 1, 2
    """


@register(
    "doc_hash_split_profile",
    oracle=_split_oracle(),
    description="Deterministic md5-prefix train/valid/test split (80/10/10 on "
    "doc_id) profiled per (split, lang) — reproducible across runs, "
    "partitionings, and engines (no RNG), which is why the DuckDB oracle can "
    "state the SAME assignment verbatim and hash-match exact counts. The "
    "group-leakage guard (same key -> same split) is unit-tested.",
)
def q_doc_hash_split_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.split import hash_split

    docs = load_table(spark, sf_dir, "documents")
    return hash_split(docs, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1}).groupBy(
        "split", "lang"
    ).agg(F.count(F.lit(1)).alias("n_docs"), F.avg("n_chars").alias("avg_chars"))


# --------------------------------------------------------------------------
# End-to-end curation pipeline (composition contract)
# --------------------------------------------------------------------------


_QUALITY_SQL = (
    "least(length(text) / 200.0, 1.0) * 0.5"
    " + (1.0 - least((length(regexp_replace(text, '[^.!?,;:]', '', 'g')) / length(text)"
    "                 + length(regexp_replace(text, '[^0-9]', '', 'g')) / length(text)) * 5,"
    "                1.0)) * 0.5"
)


def _curation_oracle() -> str:
    from ..operators.split import split_case_sql

    case = split_case_sql("doc_id", {"train": 0.9, "eval": 0.1})
    return f"""
    WITH scored AS (
        SELECT doc_id, text, lang, {_QUALITY_SQL} AS quality
        FROM documents
    ), filtered AS (
        SELECT * FROM scored WHERE quality >= 0.5
    ), deduped AS (
        SELECT * FROM filtered
        WHERE doc_id IN (SELECT min(doc_id) FROM filtered GROUP BY md5(text))
    )
    SELECT split, count(*) AS n_docs,
           round(avg(quality), 6) AS avg_quality,
           count(DISTINCT lang) AS n_langs
    FROM (SELECT lang, quality, {case} FROM deduped)
    GROUP BY 1
    """


@register(
    "curation_pipeline_profile",
    oracle=_curation_oracle(),
    description="The full training-data curation flow as ONE composed engine "
    "query — quality scoring -> threshold filter -> exact dedup (min-id "
    "keeper) -> deterministic hash split -> per-split profile — with a DuckDB "
    "oracle stating the identical pipeline in SQL, so the COMPOSITION of the "
    "operators (not just each in isolation) is hash-verified. Every stage is "
    "a shuffle-bounded primitive: the quality filter is a codegen'd "
    "projection, dedup one digest groupBy + semi-join, the split a pure "
    "projection.",
)
def q_curation_pipeline_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.split import hash_split

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    scored = docs.withColumn("quality", quality_score("text"))
    filtered = scored.filter(F.col("quality") >= 0.5)
    deduped = exact_dedup(filtered, ["text"], "doc_id")
    split_docs = hash_split(deduped, "doc_id", {"train": 0.9, "eval": 0.1})
    return split_docs.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
        F.countDistinct("lang").alias("n_langs"),
    )


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------


@register(
    "text_stats_by_lang",
    oracle=r"""
    SELECT lang, count(*) AS n_docs,
           avg(n_chars) AS avg_chars,
           avg(CASE WHEN length(text) = 0 THEN 0
                    ELSE length(text) - length(replace(text, ' ', '')) + 1 END) AS avg_tokens,
           avg(len(list_filter(string_split_regex(text, '[\s[:punct:]]+'),
                               t -> len(t) > 0))) AS avg_bpe_tokens
    FROM documents
    GROUP BY 1
    """,
    description="Char/token-count statistics per language: whitespace tokens "
    "plus the BPE-pre-tokenizer-style count (split on whitespace/punctuation "
    "boundaries — Java \\p{Punct} and RE2 [:punct:] agree on the ASCII set, "
    "verified exact at sf0.01)",
)
def q_text_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bpe_ish_token_count

    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("n_chars").alias("avg_chars"),
        F.avg(token_count("text")).alias("avg_tokens"),
        F.avg(bpe_ish_token_count("text")).alias("avg_bpe_tokens"),
    )


@register(
    "doc_quality_by_source",
    oracle="""
    SELECT source, count(*) AS n_docs,
           avg(least(length(text) / 200.0, 1.0) * 0.5
               + (1.0 - least((length(regexp_replace(text, '[^.!?,;:]', '', 'g')) / length(text)
                               + length(regexp_replace(text, '[^0-9]', '', 'g')) / length(text)) * 5,
                              1.0)) * 0.5) AS avg_quality
    FROM documents
    GROUP BY 1
    """,
    description="Heuristic quality score (length/punct/digit) per source",
)
def q_doc_quality_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(quality_score("text")).alias("avg_quality"),
    )


def _lang_guess_case_sql() -> str:
    branches = []
    for lang, markers in LANG_MARKERS.items():
        clauses = " OR ".join(f"' ' || text || ' ' LIKE '%{m}%'" for m in markers)
        branches.append(f"WHEN {clauses} THEN '{lang}'")
    return "CASE " + " ".join(branches) + " ELSE 'und' END"


@register(
    "lang_id_confusion",
    oracle=f"""
    SELECT lang AS labeled_lang,
           {_lang_guess_case_sql()} AS guessed_lang,
           count(*) AS n_docs
    FROM documents
    GROUP BY 1, 2
    """,
    description="Stopword-marker language-ID vs labeled lang (confusion counts)",
)
def q_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(
        F.col("lang").alias("labeled_lang"), lang_guess("text").alias("guessed_lang")
    ).agg(F.count(F.lit(1)).alias("n_docs"))


@register(
    "doc_fingerprints",
    oracle="""
    SELECT doc_id, substring(md5(text), 1, 16) AS fp
    FROM documents
    """,
    description="Per-document content fingerprint (md5 prefix, engine-portable)",
)
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint("text").alias("fp"))


# --------------------------------------------------------------------------
# Multimodal plumbing (binary payload → Pandas-UDF featurization)
# --------------------------------------------------------------------------


@register(
    "media_features",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           substring(md5(text), 1, 16) AS content_fp
    FROM documents
    """,
    description="mapInPandas featurization over binary payloads (decode stubbed); "
    "byte-count + fingerprint cross-checked against SQL",
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    media = documents_as_media(docs)
    return featurize_media(media).select("doc_id", "n_bytes", "content_fp")


@register(
    "media_resize",
    oracle="""
    SELECT doc_id,
           16 AS width, 16 AS height,
           octet_length(encode(text)) AS n_bytes_in,
           768 AS n_bytes_out
    FROM documents WHERE doc_id < 500
    """,
    description="mapInPandas image-resize plumbing (decode/resample stubbed to a "
    "deterministic sha256-tiled kernel): the metadata contract — dimensions, "
    "input/output byte counts, one record per image — is hash-checked against "
    "SQL; pixel values are pinned by unit test.",
)
def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import resize_images

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    resized = resize_images(documents_as_media(docs), width=16, height=16)
    return resized.select("doc_id", "width", "height", "n_bytes_in", "n_bytes_out")


@register(
    "media_frame_sample",
    oracle="""
    WITH f AS (
        SELECT doc_id, (octet_length(encode(text)) // 64)::INT AS n_frames
        FROM documents WHERE doc_id < 500
    )
    SELECT doc_id, unnest(range(0, n_frames, 4))::INT AS frame_idx, n_frames
    FROM f
    WHERE n_frames > 0
    """,
    description="mapInPandas frame-sampling fan-out (one payload row -> every "
    "4th 64-byte frame): the fan-out shape — frame indices, per-doc frame "
    "counts — is hash-checked against a LATERAL generate_series oracle; frame "
    "fingerprints are pinned by unit test.",
)
def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    frames = sample_frames(documents_as_media(docs), frame_bytes=64, stride=4)
    return frames.select("doc_id", "frame_idx", "n_frames")


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------


@register(
    "knn_bruteforce",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 10
    ), c AS (
        SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
        FROM embeddings
    ), scored AS (
        SELECT query_id, neighbor_id,
               list_dot_product(qv, cv)
                 / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                 AS cosine_sim
        FROM q, c
        WHERE neighbor_id != query_id
    )
    SELECT query_id, neighbor_id, rank, round(cosine_sim, 6) AS cosine_sim
    FROM (
        SELECT query_id, neighbor_id, cosine_sim,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
        FROM scored
    )
    WHERE rank <= 5
    """,
    description="Exact brute-force cosine top-5 for 10 query vectors",
)
def q_knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    top = cosine_topk(emb, queries, "vec_id", "embedding", k=5)
    return top.withColumn("cosine_sim", F.round("cosine_sim", 6))


@register(
    "knn_ann_ivf",
    oracle=None,  # approximate by construction → rows-only check; recall
    # is quantified by knn_ann_ivf_recall below.
    description="IVF (inverted-file) approximate cosine top-5: deterministic "
    "hash-sampled centroids, probe-6-of-16 cells. Replaces the hyperplane-LSH "
    "top-k (measured recall 0.10 — hyperplane buckets only collide reliably in "
    "the near-dup regime; see operators/similarity_ivf.py).",
)
def q_knn_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivf_cosine_topk(emb, queries, k=5, n_cells=16, n_probe=6)


def _pair_recall(exact: DataFrame, approx: DataFrame, keys: list[str], threshold: float) -> DataFrame:
    """One-row (n_exact, recall_ok): share of exact pairs found by the
    approximate operator, flagged against ``threshold``. Vacuously ok when
    there are no exact pairs. Stays distributed: one left join + one agg.
    """
    # Both sides are answer-scale top-k/pair frames (tens of rows) —
    # broadcast the probe side so the compare never sorts/shuffles.
    hits = approx.select(*keys).withColumn("__hit", F.lit(1))
    joined = exact.select(*keys).join(F.broadcast(hits), keys, "left")
    return joined.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.when(
            F.count(F.lit(1)) == 0, F.lit(1)
        )
        .otherwise(
            (
                (F.sum(F.coalesce(F.col("__hit"), F.lit(0))) / F.count(F.lit(1)))
                >= F.lit(threshold)
            ).cast("int")
        )
        .cast("int")
        .alias("recall_ok"),
    )


@register(
    "knn_ann_ivf_recall",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 10
    ), c AS (
        SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
        FROM embeddings
    ), scored AS (
        SELECT query_id, neighbor_id,
               list_dot_product(qv, cv)
                 / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                 AS cosine_sim
        FROM q, c
        WHERE neighbor_id != query_id
    ), exact AS (
        SELECT query_id, neighbor_id
        FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
            FROM scored
        )
        WHERE rank <= 5
    )
    SELECT count(*) AS n_exact, 1 AS recall_ok FROM exact
    """,
    description="IVF top-k recall vs the exact in-engine baseline: the oracle "
    "pins the exact-pair count and asserts recall >= 0.5 held (the engine "
    "emits recall_ok=0 on regression, breaking the hash). Measured recall "
    "0.62 at sf0.01 / 0.70 at sf0.001 with n_cells=16, n_probe=6 — the "
    "embeddings fixture is isotropic (avg top-5 cosine 0.33, 8% label "
    "agreement), so recall is bounded by scan fraction for any index.",
)
def q_knn_ann_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    # batch_cosine: only the neighbor-id SET feeds the recall join; the
    # 0.5 flag threshold sits far from the measured 0.62–0.70 recall, so
    # an ulp-level rank swap at the k-boundary cannot flip the flag.
    exact = cosine_topk(emb, queries, "vec_id", "embedding", k=5, batch_cosine=True)
    approx = ivf_cosine_topk(emb, queries, k=5, n_cells=16, n_probe=6)
    return _pair_recall(exact, approx, ["query_id", "neighbor_id"], threshold=0.5)


@register(
    "knn_ann_ivf_sq_recall",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 10
    ), c AS (
        SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
        FROM embeddings
    ), scored AS (
        SELECT query_id, neighbor_id,
               list_dot_product(qv, cv)
                 / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                 AS cosine_sim
        FROM q, c
        WHERE neighbor_id != query_id
    ), exact AS (
        SELECT query_id, neighbor_id
        FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
            FROM scored
        )
        WHERE rank <= 5
    )
    SELECT count(*) AS n_exact, 1 AS recall_ok FROM exact
    """,
    description="Composed IVF+SQ8 top-k recall (the FAISS IVF,SQ8 index "
    "posture, operators/similarity_ivf.py:ivf_sq8_cosine_topk): coarse "
    "cell probe bounds WHICH rows a query touches, integer SQ8 code "
    "scoring bounds BYTES per row — candidates are scored from 1-byte "
    "codes via the moment-expanded cosine, never from float vectors. "
    "Same exact-baseline oracle and 0.5 flag threshold as "
    "knn_ann_ivf_recall; measured composed recall 0.62 at sf0.01 / "
    "0.70 at sf0.001 (identical to the float IVF at the same probes — "
    "quantization costs ~0 pairs; SQ8-vs-IVF pair agreement 0.98-1.0).",
)
def q_knn_ann_ivf_sq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity_ivf import ivf_sq8_cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, "vec_id", "embedding", k=5, batch_cosine=True)
    approx = ivf_sq8_cosine_topk(emb, queries, k=5, n_cells=16, n_probe=6)
    return _pair_recall(exact, approx, ["query_id", "neighbor_id"], threshold=0.5)


@register(
    "llr_keyness_contract",
    oracle=r"""
    WITH tok AS (
        SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_f,
               unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  w -> len(w) > 0)) AS term
        FROM documents
    ), c AS (
        SELECT term,
               CAST(sum(is_f) AS BIGINT) AS n_focus,
               CAST(sum(1 - is_f) AS BIGINT) AS n_rest
        FROM tok GROUP BY 1
        HAVING count(*) >= 5
    ), t AS (
        SELECT CAST(sum(n_focus) AS DOUBLE) AS ca,
               CAST(sum(n_rest) AS DOUBLE) AS cb
        FROM c
    ), s AS (
        SELECT term, n_focus, n_rest,
               2.0::DOUBLE * (
                 CASE WHEN n_focus > 0
                      THEN n_focus * ln(n_focus
                           / (t.ca * (n_focus + n_rest) / (t.ca + t.cb)))
                      ELSE 0.0::DOUBLE END
               + CASE WHEN n_rest > 0
                      THEN n_rest * ln(n_rest
                           / (t.cb * (n_focus + n_rest) / (t.ca + t.cb)))
                      ELSE 0.0::DOUBLE END
               ) AS llr_raw
        FROM c CROSS JOIN t
        WHERE n_focus / t.ca > n_rest / t.cb
    )
    SELECT term, n_focus, n_rest,
           round(llr_raw, 6) AS llr,
           CAST(row_number() OVER (ORDER BY llr_raw DESC, term ASC)
                AS INTEGER) AS rank
    FROM s
    ORDER BY llr_raw DESC, term ASC
    LIMIT 20
    """,
    description="Dunning log-likelihood-ratio keyness "
    "(operators/keyness.py:llr_keyness, Dunning CL 1993): the top-20 "
    "terms most characteristic of the English slice of the documents "
    "corpus vs the rest (min_count 5 noise floor) — the calibrated "
    "'what does this slice actually contribute' inspection a curation "
    "pipeline runs per source/language/cluster before reweighting it "
    "(raw frequency over-ranks rare flukes; G2 does not). Only "
    "OVER-used terms rank (a/A > b/B strictly), ties break on the "
    "term. One lowercase-split explode into ONE term-keyed "
    "conditional agg (the tf-idf shuffle shape, map-side combined), "
    "totals as a 1-row scalar crossJoin, and the top-k compiles to "
    "TakeOrderedAndProject — rank is assigned AFTER the 20-row limit, "
    "never via a vocabulary-wide window. Counts are integers and the "
    "two ln terms share one operation order with the oracle. "
    "Hand-worked apple/banana/cherry/date fixture (G2 = 6*ln(2.2)) + "
    "full pure-Python twin over both directions in "
    "tests/test_keyness.py.",
)
def q_llr_keyness_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.keyness import llr_keyness

    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    return llr_keyness(docs, "lang", "text", "en", k=20, min_count=5)


@register(
    "knn_ann_ivf_increment_contract",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_index_rows,
           CAST(sum(CASE WHEN vec_id < 300 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_base,
           CAST(sum(CASE WHEN vec_id >= 300 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_new,
           CAST(sum(CASE WHEN vec_id >= 200 AND vec_id < 300
                         THEN 1 ELSE 0 END) AS BIGINT)
               AS n_overlap_skipped,
           1 AS parity_ok
    FROM embeddings WHERE vec_id < 450
    """,
    description="Incremental IVF index maintenance "
    "(operators/similarity_ivf.py:ivf_index_increment — the "
    "incremental_dedup posture applied to the ANN index): the index is "
    "built over vec_id < 300 with a frozen 16-centroid quantizer, then "
    "a batch covering 200-449 is absorbed — the 100 already-indexed "
    "ids are SKIPPED by the anti-join and only the 150 new rows pay "
    "the O(batch) cell assignment; no refit, no corpus re-encode. The "
    "engine then compares the incremental index against a FULL "
    "re-assignment of the union via a full outer join on vec_id: "
    "parity_ok = 1 only when every id appears exactly once on both "
    "sides with the identical cell (assignment depends only on the "
    "frozen centroids, so parity is exact by construction — a dropped "
    "batch row, duplicated overlap id, or cell drift emits 0 and "
    "breaks the hash). The centroid sample and numpy cell argmax are "
    "not portably SQL-restatable, so the oracle pins the base/new/"
    "overlap census and the asserted flag (the knn recall-gate "
    "posture). Hand-worked 8-vector two-cluster fixture in "
    "tests/test_scale_operators.py.",
)
def q_knn_ann_ivf_increment_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.similarity_ivf import (
        ivf_assign,
        ivf_centroids,
        ivf_index_increment,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 300)
    batch = emb.filter((F.col("vec_id") >= 200) & (F.col("vec_id") < 450))
    centroids = ivf_centroids(base, "vec_id", "embedding", 16)
    index0 = ivf_assign(base, centroids, "vec_id", "embedding")
    inc = ivf_index_increment(index0, batch, centroids, "vec_id", "embedding")
    full = ivf_assign(
        emb.filter(F.col("vec_id") < 450), centroids, "vec_id", "embedding"
    )
    cmp = inc.select("vec_id", F.col("cell").alias("__c_inc")).join(
        full.select("vec_id", F.col("cell").alias("__c_full")),
        "vec_id",
        "full_outer",
    )
    parity = cmp.agg(
        F.count(F.lit(1)).alias("__n_cmp"),
        F.sum(
            (
                F.col("__c_inc").isNotNull()
                & F.col("__c_full").isNotNull()
                & (F.col("__c_inc") == F.col("__c_full"))
            ).cast("int")
        ).alias("__n_good"),
    )
    counts = emb.filter(F.col("vec_id") < 450).agg(
        F.count(F.lit(1)).alias("n_index_rows"),
        F.sum(F.when(F.col("vec_id") < 300, 1).otherwise(0))
        .cast("long")
        .alias("n_base"),
        F.sum(F.when(F.col("vec_id") >= 300, 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
        F.sum(
            F.when(
                (F.col("vec_id") >= 200) & (F.col("vec_id") < 300), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_overlap_skipped"),
    )
    return counts.crossJoin(F.broadcast(parity)).select(
        "n_index_rows",
        "n_base",
        "n_new",
        "n_overlap_skipped",
        (
            (F.col("__n_good") == F.col("__n_cmp"))
            & (F.col("__n_cmp") == F.col("n_index_rows"))
        )
        .cast("int")
        .alias("parity_ok"),
    )


@register(
    "embedding_norms_by_label",
    oracle="""
    SELECT label, count(*) AS n_vectors,
           avg(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))) AS avg_norm,
           avg(embedding[1]::DOUBLE) AS avg_first_dim
    FROM embeddings
    GROUP BY 1
    """,
    description="Per-label embedding norms via JVM-side array fold",
)
def q_embedding_norms_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import as_double_array, l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    v = as_double_array("embedding")
    return emb.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.avg(l2_norm(v)).alias("avg_norm"),
        F.avg(F.col("embedding").getItem(0).cast("double")).alias("avg_first_dim"),
    )


@register(
    "near_dup_clusters",
    oracle=r"""
    WITH RECURSIVE toks AS (
        SELECT doc_id, text,
               list_filter(string_split_regex(text, '\s+'), w -> len(w) > 0) AS w
        FROM documents WHERE doc_id < 500
    ), sh AS (
        SELECT doc_id,
               list_distinct(
                   CASE WHEN len(w) >= 3 THEN
                       list_transform(range(1, len(w) - 1),
                                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                   ELSE [text] END
               ) AS sh
        FROM toks
    ), pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a, sh b
        WHERE a.doc_id < b.doc_id
          AND len(list_intersect(a.sh, b.sh))::DOUBLE
                / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
    ), edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ), reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT component, count(*) AS n_docs, max(node) AS max_doc
    FROM (
        SELECT a AS node, least(a, min(b)) AS component
        FROM reach GROUP BY a
    )
    GROUP BY component
    """,
    description="Fuzzy-dedup CLUSTERS: the exact word-3-gram Jaccard pair "
    "graph (threshold 0.5, doc_id < 500 — the same pair set the "
    "ngram_jaccard_pairs gate pins) contracted to connected components via "
    "alternating large-star/small-star (operators/graph.py, Kiveris et al. "
    "SoCC 2014), profiled per cluster. The oracle recomputes components "
    "with a recursive-CTE transitive closure, so a split, merged, or "
    "mislabeled component breaks the hash. At corpus scale the same "
    "operator consumes MinHash-LSH pairs — the edge list, not the corpus, "
    "is the working set.",
)
def q_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Hashed-shingle index (long join keys, one Arrow pass) rather than
    # the string index: only the pair SET feeds the components, so the
    # 64-bit shingle-collision risk (~1e-9) is the whole divergence
    # surface — same trade minhash_recall documents.
    from ..operators.dedup import jaccard_pairs_hashed_index
    from ..operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    pairs = jaccard_pairs_hashed_index(docs, "doc_id", "text", shingle_n=3, threshold=0.5)
    comp = connected_components(pairs, "id_a", "id_b")
    return comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("node").alias("max_doc"),
    )


def _cluster_split_oracle() -> str:
    from ..operators.split import split_case_sql

    case = split_case_sql(
        "coalesce(c.component, d.doc_id)", {"train": 0.9, "eval": 0.1}
    )
    return rf"""
    WITH RECURSIVE toks AS (
        SELECT doc_id, text,
               list_filter(string_split_regex(text, '\s+'), w -> len(w) > 0) AS w
        FROM documents WHERE doc_id < 500
    ), sh AS (
        SELECT doc_id,
               list_distinct(
                   CASE WHEN len(w) >= 3 THEN
                       list_transform(range(1, len(w) - 1),
                                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                   ELSE [text] END
               ) AS sh
        FROM toks
    ), prs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a, sh b
        WHERE a.doc_id < b.doc_id
          AND len(list_intersect(a.sh, b.sh))::DOUBLE
                / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
    ), edges AS (
        SELECT id_a AS a, id_b AS b FROM prs
        UNION
        SELECT id_b, id_a FROM prs
    ), reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ), comp AS (
        SELECT a AS node, least(a, min(b)) AS component
        FROM reach GROUP BY a
    )
    SELECT split, count(*) AS n_docs,
           CAST(sum(d.n_chars) AS BIGINT) AS total_chars,
           CAST(sum(d.doc_id) AS BIGINT) AS id_sum
    FROM (
        SELECT d.doc_id, d.n_chars, {case}
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
        WHERE d.doc_id < 500
    ) d
    GROUP BY split
    """


@register(
    "cluster_safe_split_profile",
    oracle=_cluster_split_oracle(),
    description="Leakage-safe train/eval split (operators/split.py "
    "cluster_safe_split): the word-3-gram Jaccard pair graph (threshold "
    "0.5, doc_id < 500 — the exact pair set near_dup_clusters pins) is "
    "contracted to connected components, and the 90/10 md5-band split is "
    "keyed on the COMPONENT label so near-duplicates can never straddle "
    "train and eval. The oracle recomputes components via recursive-CTE "
    "transitive closure and restates the identical coalesce(component, "
    "doc_id) CASE banding; per-split doc counts, char sums, and id sums "
    "pin the exact membership, so a single doc split by its own id "
    "instead of its cluster's breaks the hash. At corpus scale the same "
    "operator consumes MinHash-LSH pairs: components run at edge-list "
    "scale and the corpus pays one AQE-broadcastable equi-join.",
)
def q_cluster_safe_split_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import jaccard_pairs_hashed_index
    from ..operators.split import cluster_safe_split

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    pairs = jaccard_pairs_hashed_index(docs, "doc_id", "text", shingle_n=3, threshold=0.5)
    split = cluster_safe_split(docs, pairs, "doc_id", {"train": 0.9, "eval": 0.1})
    return split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum("doc_id").alias("id_sum"),
    )


_STRATA_FRACTIONS = {"en": 0.1, "zh": 0.5, "de": 1.0}


def _strata_oracle() -> str:
    from ..operators.split import stratified_sample_predicate_sql

    pred = stratified_sample_predicate_sql("doc_id", _STRATA_FRACTIONS, "lang")
    return f"""
    SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    WHERE {pred}
    GROUP BY 1
    """


@register(
    "stratified_sample_profile",
    oracle=_strata_oracle(),
    description="Deterministic per-stratum quota sampling "
    "(operators/split.py stratified_hash_sample): keep 10% of English, "
    "50% of Chinese, all German, drop unlisted languages — each keep "
    "decision an md5 band of doc_id, so the sample is identical across "
    "engines, runs, and partitionings (unlike sampleBy's per-partition "
    "RNG). The oracle restates the same predicate verbatim via "
    "stratified_sample_predicate_sql — one source of truth for both "
    "sides — and pins the per-language survivor counts and char mass.",
)
def q_stratified_sample_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.split import stratified_hash_sample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    sampled = stratified_hash_sample(docs, "doc_id", _STRATA_FRACTIONS, "lang")
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


@register(
    "pack_chunks_profile",
    oracle=r"""
    WITH toks AS (
        SELECT lang, doc_id,
               CASE WHEN length(text) = 0 THEN 0
                    ELSE length(text) - length(replace(text, ' ', '')) + 1 END AS n_tokens
        FROM documents
    ), pos AS (
        SELECT lang, doc_id, n_tokens,
               sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tokens AS start_off
        FROM toks
    )
    SELECT lang,
           CAST(floor(start_off / 256) AS BIGINT) AS chunk_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
           CAST(sum(CASE WHEN floor((start_off + greatest(n_tokens, 1) - 1) / 256)
                              > floor(start_off / 256)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers
    FROM pos
    GROUP BY 1, 2
    """,
    description="Sequence packing (operators/packing.py): per-language token "
    "streams in doc_id order are cut into 256-token training chunks "
    "(concatenate-and-chunk, docs may straddle boundaries — the real "
    "pretraining prep semantics). Profiles each chunk by docs starting in "
    "it, their token mass, and straddler count; the oracle restates the "
    "identical running-sum assignment, so any drift in ordering, token "
    "counting, or offset math breaks the hash. Sharded window: one shuffle "
    "on lang, no global sort.",
)
def q_pack_chunks_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import with_pack_chunks
    from ..operators.text import token_count

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", token_count("text").alias("n_tokens")
    )
    packed = with_pack_chunks(docs, "n_tokens", 256, "lang", "doc_id")
    return packed.groupBy("lang", "chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
        F.sum((F.col("n_chunks_spanned") > 1).cast("long")).alias("n_straddlers"),
    )


@register(
    "decontamination_profile",
    oracle=r"""
    WITH corpus AS (
        SELECT * FROM documents WHERE doc_id < 500 AND doc_id % 97 != 0
    ), bench AS (
        SELECT * FROM documents WHERE doc_id % 97 = 0
    ), c_sh AS (
        SELECT doc_id, lang,
               unnest(list_distinct(
                   CASE WHEN len(w) >= 3 THEN
                       list_transform(range(1, len(w) - 1),
                                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                   ELSE [text] END
               )) AS shingle
        FROM (SELECT doc_id, lang, text,
                     list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS w
              FROM corpus)
    ), b_sh AS (
        SELECT DISTINCT unnest(list_distinct(
                   CASE WHEN len(w) >= 3 THEN
                       list_transform(range(1, len(w) - 1),
                                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                   ELSE [text] END
               )) AS shingle
        FROM (SELECT text,
                     list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS w
              FROM bench)
    ), overlap AS (
        SELECT c.doc_id, count(*) AS n_hits
        FROM c_sh c JOIN b_sh b ON c.shingle = b.shingle
        GROUP BY 1
    )
    SELECT corpus.lang,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN overlap.n_hits IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated,
           CAST(sum(coalesce(overlap.n_hits, 0)) AS BIGINT) AS total_hits
    FROM corpus LEFT JOIN overlap ON corpus.doc_id = overlap.doc_id
    GROUP BY 1
    """,
    description="Benchmark decontamination (operators/decontaminate.py): "
    "documents sharing any word-3-gram with a pseudo-benchmark slice "
    "(doc_id % 97 == 0) are flagged; per-language counts of flagged docs "
    "and total overlapping shingles are hash-pinned against a DuckDB "
    "restatement. Scale shape: benchmark shingle set broadcasts, the "
    "corpus never shuffles — only overlap hits move.",
)
def q_decontamination_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.decontaminate import contamination_flags

    all_docs = load_table(spark, sf_dir, "documents")
    corpus = all_docs.filter((F.col("doc_id") < 500) & (F.col("doc_id") % 97 != 0))
    bench = all_docs.filter(F.col("doc_id") % 97 == 0)
    flagged = contamination_flags(corpus, bench, "doc_id", "text", shingle_n=3)
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("is_contaminated").cast("long")).alias("n_contaminated"),
        F.sum("n_contaminated_ngrams").cast("long").alias("total_hits"),
    )


# --------------------------------------------------------------------------
# Round-5: incremental dedup + temperature mixing
# --------------------------------------------------------------------------


@register(
    "incremental_dedup_profile",
    oracle="""
    WITH hist AS (SELECT doc_id, text FROM documents WHERE doc_id < 250),
    batch AS (
        SELECT doc_id, text FROM documents WHERE doc_id >= 250
        UNION ALL
        SELECT doc_id + 10000, text FROM documents
        WHERE doc_id < 250 AND doc_id % 7 = 0
        UNION ALL
        SELECT doc_id + 20000, text FROM documents
        WHERE doc_id >= 250 AND doc_id % 11 = 0
    ),
    hd AS (SELECT DISTINCT md5(text) AS d FROM hist),
    b AS (SELECT doc_id, md5(text) AS d FROM batch),
    surv AS (
        SELECT b.* FROM b
        WHERE NOT EXISTS (SELECT 1 FROM hd WHERE hd.d = b.d)
    ),
    kept AS (SELECT d, min(doc_id) AS doc_id FROM surv GROUP BY d)
    SELECT (SELECT count(*) FROM b) AS n_batch,
           ((SELECT count(*) FROM b) - (SELECT count(*) FROM surv))::BIGINT
               AS n_dropped_historical,
           ((SELECT count(*) FROM surv) - (SELECT count(*) FROM kept))::BIGINT
               AS n_dropped_within,
           (SELECT count(*) FROM kept)::BIGINT AS n_kept
    """,
    description="Incremental dedup of an incoming batch against an "
    "already-ingested corpus (historical = doc_id<250), then within itself — "
    "the steady-state shape of a continuously-ingesting pipeline. The fixture "
    "has no organic cross-half duplicates, so both engines inject the SAME "
    "deterministic re-keyed copies (every 7th historical doc, every 11th "
    "batch doc) to exercise both drop paths. Scale: historical collapses to "
    "a distinct-digest projection; anti-join + min-id keeper on uniform md5 "
    "keys (operators/dedup.py:incremental_dedup).",
)
def q_incremental_dedup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import content_digest, incremental_dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    hist = docs.filter(did < 250)
    batch = (
        docs.filter(did >= 250)
        .unionByName(
            hist.filter(did % 7 == 0).withColumn("doc_id", did + F.lit(10000))
        )
        .unionByName(
            docs.filter((did >= 250) & (did % 11 == 0)).withColumn(
                "doc_id", did + F.lit(20000)
            )
        )
    )
    hd = hist.select(content_digest(["text"]).alias("__digest")).distinct()
    surv = batch.withColumn("__digest", content_digest(["text"])).join(
        hd, "__digest", "left_anti"
    )
    kept = incremental_dedup(batch, hist, ["text"], "doc_id")
    n_batch = batch.agg(F.count(F.lit(1)).alias("n_batch"))
    n_surv = surv.agg(F.count(F.lit(1)).alias("n_surv"))
    n_kept = kept.agg(F.count(F.lit(1)).alias("n_kept"))
    return (
        n_batch.crossJoin(F.broadcast(n_surv))
        .crossJoin(F.broadcast(n_kept))
        .select(
            "n_batch",
            (F.col("n_batch") - F.col("n_surv")).alias("n_dropped_historical"),
            (F.col("n_surv") - F.col("n_kept")).alias("n_dropped_within"),
            "n_kept",
        )
    )


def _mix_oracle() -> str:
    from ..operators.mixing import hash_band_sql

    return f"""
    WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
    m AS (SELECT min(n_docs) AS n_min FROM c),
    r AS (SELECT lang, n_docs,
                 CAST(round(1000000 * pow(n_docs::DOUBLE / n_min, -0.5), 0)
                      AS BIGINT) AS scaled
          FROM c, m),
    k AS (
        SELECT d.lang, count(*) AS n_kept
        FROM documents d JOIN r ON d.lang IS NOT DISTINCT FROM r.lang
        WHERE {hash_band_sql("d.doc_id")} < r.scaled
        GROUP BY d.lang
    )
    SELECT r.lang, r.n_docs, round(r.scaled / 1000000.0, 6) AS rate,
           coalesce(k.n_kept, 0)::BIGINT AS n_kept
    FROM r LEFT JOIN k ON r.lang = k.lang
    """


@register(
    "temperature_mix_profile",
    oracle=_mix_oracle(),
    description="Temperature-alpha=0.5 language resampling (keep rate "
    "(n_lang/n_min)^(alpha-1), rarest language keeps 100%) — the standard "
    "multilingual-corpus smoothing recipe. The keep decision is an "
    "exact-integer Knuth-hash band (no float comparison reaches any row; "
    "the one pow() per STRATUM is rounded to 1e-6 before use), so the "
    "assignment is reproducible across engines/runs/partitionings. One "
    "aggregation pass + broadcast of per-stratum rates + pure-projection "
    "filter (operators/mixing.py).",
)
def q_temperature_mix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mixing import hash_band, temperature_rates

    docs = load_table(spark, sf_dir, "documents")
    # rates referenced exactly ONCE so the corpus is scanned twice total
    # (count pass + keep pass — the semantic minimum), not re-scanned
    # per reference; the keep decision folds into the profile agg.
    rates = temperature_rates(docs, "lang", alpha=0.5).select("lang", "scaled_rate")
    joined = docs.join(F.broadcast(rates), "lang")
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.max("scaled_rate") / 1_000_000.0, 6).alias("rate"),
        F.sum((hash_band("doc_id") < F.col("scaled_rate")).cast("long")).alias("n_kept"),
    )


def _epoch_oracle() -> str:
    from ..operators.mixing import hash_band_sql

    band = hash_band_sql("d.doc_id")
    return f"""
    WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
    m AS (SELECT max(n_docs) AS n_max FROM c),
    r AS (SELECT lang,
                 CAST(round(1000000 * pow(n_docs::DOUBLE / n_max, -0.5), 0)
                      AS BIGINT) AS w
          FROM c, m),
    e AS (
        SELECT d.lang, d.doc_id, d.n_chars,
               (r.w - r.w % 1000000) / 1000000
                 + CASE WHEN {band} < r.w % 1000000 THEN 1 ELSE 0 END AS n
        FROM documents d JOIN r ON d.lang IS NOT DISTINCT FROM r.lang
    ),
    x AS (
        SELECT lang, doc_id, n_chars,
               unnest(range(1, CAST(n AS BIGINT) + 1)) AS epoch
        FROM e WHERE n >= 1
    )
    SELECT lang, count(*) AS n_rows,
           count(DISTINCT doc_id) AS n_docs,
           CAST(max(epoch) AS BIGINT) AS max_epoch,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM x GROUP BY lang
    """


@register(
    "epoch_upsample_profile",
    oracle=_epoch_oracle(),
    description="Temperature-alpha=0.5 EPOCH UPSAMPLING "
    "(operators/mixing.py epoch_upsample): repeat factor "
    "(n_lang/n_max)^(alpha-1) >= 1 normalized so the largest language "
    "trains one epoch; each doc is emitted floor(w) times plus one more "
    "for the Knuth-hash-band fraction of keys, numbered by an epoch "
    "column — the data-preserving mirror of temperature_mix (which "
    "discards). The oracle restates the integer limb-split and band "
    "arithmetic and replays the explode via unnest(range), so a wrong "
    "copy count for a single doc breaks the hash. No shuffle beyond the "
    "one stratum-count aggregation + broadcast; sequence() is guarded "
    "against its descending-step inference.",
)
def q_epoch_upsample_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mixing import epoch_upsample

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    up = epoch_upsample(docs, "lang", "doc_id", alpha=0.5)
    return up.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("doc_id").alias("n_docs"),
        F.max("epoch").alias("max_epoch"),
        F.sum("n_chars").alias("total_chars"),
    )


def _curate_oracle() -> str:
    from ..operators.mixing import hash_band_sql
    from ..operators.pii import PII_PATTERNS
    from ..operators.split import split_case_sql

    (em, em_t), (ip, ip_t), (ph, ph_t) = PII_PATTERNS.values()
    case = split_case_sql("doc_id", {"train": 0.9, "eval": 0.1})
    return f"""
    WITH red AS (
        SELECT doc_id, lang, source,
               regexp_replace(regexp_replace(regexp_replace(text,
                   '{em}', '{em_t}', 'g'),
                   '{ip}', '{ip_t}', 'g'),
                   '{ph}', '{ph_t}', 'g') AS t
        FROM documents
    ), rep AS (
        SELECT doc_id, lang, source, t,
               list_filter(string_split_regex(t, '\\s+'), x -> len(x) > 0) AS w
        FROM red
    ), kept AS (
        SELECT doc_id, lang, source, t FROM rep
        WHERE NOT coalesce(
            (CASE WHEN len(w) > 0
                  THEN len(list_distinct(w))::DOUBLE / len(w) END) < 0.4
            OR (CASE WHEN len(w) >= 2 THEN
                    len(list_distinct(list_transform(
                        generate_series(1, len(w) - 1),
                        i -> w[i] || ' ' || w[i+1])))::DOUBLE / (len(w) - 1)
                ELSE 1.0 END) < 0.6,
            false)
    ), dedup AS (
        SELECT * FROM kept
        WHERE doc_id IN (SELECT min(doc_id) FROM kept GROUP BY md5(t))
    ), capped AS (
        SELECT doc_id, lang, t FROM (
            SELECT doc_id, lang, t,
                   row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
            FROM dedup
        ) WHERE rn <= 15
    ), c AS (
        SELECT lang, count(*) AS n FROM capped GROUP BY 1
    ), m AS (
        SELECT min(n) AS n_min FROM c
    ), r AS (
        SELECT lang, CAST(round(1000000 * pow(n::DOUBLE / n_min, -0.5), 0)
                          AS BIGINT) AS scaled
        FROM c, m
    ), mixed AS (
        SELECT d.doc_id, d.lang, d.t
        FROM capped d JOIN r ON d.lang IS NOT DISTINCT FROM r.lang
        WHERE {hash_band_sql("d.doc_id")} < r.scaled
    )
    SELECT split, count(*) AS n_docs, sum(len(t))::BIGINT AS total_chars,
           count(DISTINCT lang)::BIGINT AS n_langs
    FROM (SELECT lang, t, {case} FROM mixed)
    GROUP BY split
    """


@register(
    "curate_documents_contract",
    oracle=_curate_oracle(),
    description="End-to-end contract for the composed curation pipeline "
    "(pipelines/curation.py): PII redact -> repetition filter -> exact dedup "
    "-> per-source cap (15, ascending-id keep) -> temperature-0.5 language "
    "mixing -> deterministic 90/10 split, profiled per split. The oracle "
    "replays EVERY stage in the same order (stage order is semantic: docs "
    "differing only in PII must collapse in dedup; the cap bounds dedup "
    "survivors; mixing rates are computed on the CAPPED corpus). Each stage "
    "also carries its own isolated gate query; this one pins the "
    "composition.",
)
def q_curate_documents_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..pipelines.curation import CurationConfig, curate_documents

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source"
    )
    cfg = CurationConfig(
        drop_repetitive=True,
        dedup="exact",
        cap_group_cols=["source"],
        cap_max_rows=15,
        mix_stratum_col="lang",
        mix_alpha=0.5,
        split_fractions={"train": 0.9, "eval": 0.1},
    )
    curated = curate_documents(docs, cfg)
    return curated.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )


# --------------------------------------------------------------------------
# Semantic deduplication (SemDeDup: cluster-then-prune)
# --------------------------------------------------------------------------


@register(
    "semantic_dedup_profile",
    oracle="""
    WITH RECURSIVE base AS (
        SELECT vec_id, embedding::DOUBLE[] AS ev FROM embeddings WHERE vec_id < 300
    ), planted AS (
        SELECT vec_id + 1000000 AS vec_id, list_transform(ev, x -> x * 1.01::DOUBLE) AS ev
        FROM base WHERE vec_id < 20
    ), v AS (
        SELECT * FROM base UNION ALL SELECT * FROM planted
    ), cents AS (
        SELECT vec_id AS cid,
               list_transform(ev, x -> x / sqrt(list_dot_product(ev, ev))) AS ce
        FROM v WHERE vec_id < 8
    ), assign AS (
        SELECT vec_id, ev, cid AS cell FROM (
            SELECT v.vec_id, v.ev, c.cid,
                   row_number() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY list_dot_product(v.ev, c.ce) DESC, c.cid ASC
                   ) AS rn
            FROM v CROSS JOIN cents c
        ) WHERE rn = 1
    ), pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM assign a JOIN assign b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.ev, b.ev)
                / (sqrt(list_dot_product(a.ev, a.ev)) * sqrt(list_dot_product(b.ev, b.ev)))
              >= 0.95
    ), edges AS (
        SELECT id_a AS a, id_b AS b FROM pairs
        UNION
        SELECT id_b, id_a FROM pairs
    ), reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ), dropped AS (
        SELECT a AS node FROM reach GROUP BY a HAVING a > least(a, min(b))
    )
    SELECT (SELECT count(*) FROM v) AS n_vecs,
           (SELECT count(*) FROM pairs) AS n_pairs,
           (SELECT count(*) FROM pairs WHERE id_b = id_a + 1000000) AS n_twin_pairs,
           (SELECT count(*) FROM v) - (SELECT count(*) FROM dropped) AS n_kept
    """,
    description="SemDeDup-style semantic dedup (operators/semdedup.py, "
    "Abbas et al. 2023): coarse-quantize embeddings into cells around an "
    "explicit 8-centroid model (vectors 0..7, L2-normalized — id-addressed "
    "so the oracle can restate the exact same model), form pairs WITHIN "
    "cells only, prune cosine >= 0.95 components to their min-id member. "
    "Corpus = vec_id < 300 plus 20 planted direction-identical twins "
    "(x1.01, ids +1e6): scale-invariant argmax assignment means a twin can "
    "never straddle a cell boundary, so all 20 twin pairs MUST survive the "
    "cluster bound — the oracle recomputes assignment, within-cell pairs, "
    "and the transitive-closure keep set, pinning n_twin_pairs=20 and the "
    "kept count. Integer-only output; every float comparison sits at a "
    "wide margin (twin cosine 1.0 vs threshold 0.95, isotropic cell-score "
    "gaps ~0.1).",
)
def q_semantic_dedup_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import cluster_dedup_keep
    from ..operators.semdedup import centroids_by_ids, semantic_dedup_pairs
    from ..operators.similarity import as_double_array
    from ..utils.caching import materialize_and_release

    base = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 300)
        .select("vec_id", as_double_array("embedding").alias("embedding"))
    )
    planted = base.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.01).alias("embedding"),
    )
    # Pin the corpus (lazy localCheckpoint, the house barrier): it
    # feeds THREE downstream consumers (the cell assignment, the
    # keep-side anti-join, the n_vecs count — the centroid collect
    # prunes to 8 ids at the scan and materializes the pin), so
    # unpinned the embeddings scan + array conversion + planted-twin
    # union re-ran once per consumer (r12 event-log audit, guide §5).
    corpus = base.unionByName(planted).localCheckpoint(eager=False)
    centroids = centroids_by_ids(corpus, list(range(8)))
    # Persist the cell assignment (bounded: 320 rows here) — it feeds
    # BOTH sides of the within-cell self-join, so without it the Arrow
    # scoring pass and the corpus scan run twice. Likewise persist the
    # pair frame: it feeds two aggregates and the component-keep branch.
    from ..operators.similarity_ivf import ivf_assign

    assigned = ivf_assign(corpus, centroids).persist()
    pairs = semantic_dedup_pairs(
        corpus, centroids, threshold=0.95, assigned=assigned
    ).persist()
    kept = cluster_dedup_keep(corpus, pairs.select("id_a", "id_b"), "vec_id")
    stats = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum((F.col("id_b") == F.col("id_a") + 1000000).cast("int")).alias(
            "n_twin_pairs"
        ),
    )
    profile = (
        corpus.agg(F.count(F.lit(1)).alias("n_vecs"))
        .crossJoin(stats)
        .crossJoin(kept.agg(F.count(F.lit(1)).alias("n_kept")))
        .select("n_vecs", "n_pairs", "n_twin_pairs", "n_kept")
    )
    return materialize_and_release(profile, pairs, assigned)


# --------------------------------------------------------------------------
# Corpus snapshot diffing (dataset versioning audit)
# --------------------------------------------------------------------------


@register(
    "snapshot_diff_profile",
    oracle="""
    WITH old_snap AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 400
    ), new_snap AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]' ELSE text END AS text
        FROM documents WHERE doc_id >= 100
    ), j AS (
        SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    WHEN o.text = n.text THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM old_snap o FULL OUTER JOIN new_snap n ON o.doc_id = n.doc_id
    )
    SELECT status, count(*) AS n_docs, sum(doc_id)::BIGINT AS id_sum
    FROM j GROUP BY 1
    """,
    description="Dataset-versioning audit (operators/snapshot.py): two "
    "snapshots derived deterministically from the corpus (old = doc_id<400; "
    "new = doc_id>=100 with every 7th document's text revised), diffed to "
    "added/removed/changed/unchanged per id via content digests — each side "
    "collapses to (id, 32-char digest) so the payload never moves, then one "
    "id-keyed full-outer join. The oracle replays the same snapshots and "
    "statuses by direct text comparison (digest equality == text equality) "
    "and pins per-status counts AND an order-insensitive id checksum, so a "
    "single misclassified document breaks the hash.",
)
def q_snapshot_diff_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.snapshot import snapshot_diff_summary

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    old_snap = docs.filter(F.col("doc_id") < 400)
    new_snap = docs.filter(F.col("doc_id") >= 100).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return snapshot_diff_summary(old_snap, new_snap, "doc_id", ["text"])


def _manifest_oracle() -> str:
    from ..operators.snapshot import (
        content_checksum_sql,
        content_digest_sql,
        id_sum_sql,
    )

    return f"""
    SELECT lang, source, count(*) AS n_rows,
           {id_sum_sql("doc_id")} AS id_sum,
           {content_checksum_sql(content_digest_sql(["text"]))} AS content_checksum
    FROM documents
    GROUP BY lang, source
    """


@register(
    "release_manifest_contract",
    oracle=_manifest_oracle(),
    description="Content-addressed release manifest (operators/snapshot.py "
    "release_manifest): per (lang, source) group, row count, id checksum, "
    "and an ORDER-INSENSITIVE content checksum — per-row md5 digests fold "
    "to integers and sum mod 2^61 in exact DECIMAL arithmetic, so two "
    "independently produced copies of a release agree on the checksum iff "
    "they agree on the multiset of row contents. The oracle restates the "
    "identical fold in HUGEINT, so one flipped byte in one document's text "
    "anywhere in the corpus breaks the gate. One map-side-combined "
    "aggregation over a pure projection — no joins, payload never moves.",
)
def q_release_manifest_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.snapshot import release_manifest

    docs = load_table(spark, sf_dir, "documents")
    return release_manifest(docs, ["lang", "source"], "doc_id", ["text"])


@register(
    "cluster_keep_best_profile",
    oracle=r"""
    WITH RECURSIVE toks AS (
        SELECT doc_id, text,
               list_filter(string_split_regex(text, '\s+'), w -> len(w) > 0) AS w
        FROM documents WHERE doc_id < 500
    ), sh AS (
        SELECT doc_id,
               list_distinct(
                   CASE WHEN len(w) >= 3 THEN
                       list_transform(range(1, len(w) - 1),
                                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                   ELSE [text] END
               ) AS sh
        FROM toks
    ), prs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a, sh b
        WHERE a.doc_id < b.doc_id
          AND len(list_intersect(a.sh, b.sh))::DOUBLE
                / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
    ), edges AS (
        SELECT id_a AS a, id_b AS b FROM prs
        UNION
        SELECT id_b, id_a FROM prs
    ), reach(a, b) AS (
        SELECT a, b FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ), comp AS (
        SELECT a AS node, least(a, min(b)) AS component
        FROM reach GROUP BY a
    ), scored AS (
        SELECT c.component, c.node, d.n_chars
        FROM comp c JOIN documents d ON d.doc_id = c.node
    )
    SELECT component, node AS kept_doc,
           CAST(n_chars AS BIGINT) AS kept_chars, n_docs
    FROM (
        SELECT component, node, n_chars,
               count(*) OVER (PARTITION BY component) AS n_docs,
               row_number() OVER (PARTITION BY component
                                  ORDER BY n_chars DESC, node) AS rn
        FROM scored
    ) WHERE rn = 1
    """,
    description="Quality-aware fuzzy-dedup winners "
    "(operators/graph.py component_representatives): the exact word-3-gram "
    "Jaccard pair graph (threshold 0.5, doc_id < 500 — the identical pair "
    "set near_dup_clusters pins) contracted to connected components, then "
    "each component collapsed to its LONGEST member (n_chars desc, id asc "
    "tie-break) instead of the arbitrary min-id convention — the keep-best "
    "semantics a curation pass with a quality signal wants. The oracle "
    "recomputes components via a recursive-CTE transitive closure and picks "
    "winners with an identically-ordered row_number, so a wrong winner, a "
    "split component, or a wrong member count each break the hash.",
)
def q_cluster_keep_best_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import jaccard_pairs_hashed_index
    from ..operators.graph import component_representatives

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    pairs = jaccard_pairs_hashed_index(docs, "doc_id", "text", shingle_n=3, threshold=0.5)
    reps = component_representatives(
        docs.select("doc_id", "n_chars"), pairs, "doc_id", "n_chars"
    )
    return reps.select(
        "component",
        F.col("kept_id").alias("kept_doc"),
        F.col("kept_score").cast("long").alias("kept_chars"),
        "n_docs",
    )


@register(
    "source_cap_profile",
    oracle="""
    WITH ranked AS (
        SELECT source, lang, doc_id, n_chars,
               row_number() OVER (PARTITION BY source, lang
                                  ORDER BY n_chars DESC, doc_id) AS rn
        FROM documents
    )
    SELECT source, lang, count(*) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS kept_chars,
           CAST(sum(doc_id) AS BIGINT) AS id_sum
    FROM ranked WHERE rn <= 6 GROUP BY 1, 2
    """,
    description="Per-(source, lang) contribution cap at 6 documents "
    "(operators/mixing.py cap_per_group — the Gopher/RefinedWeb per-domain "
    "hard bound, complementary to temperature mixing's multiplicative "
    "rescale), keeping the longest documents first (n_chars desc, doc_id "
    "asc tie-break). The implementation sorts ONLY over-cap groups: one "
    "map-side-combined count pass finds groups above the cap, that small "
    "set broadcasts, under-cap rows pass through sort-free and only "
    "over-cap groups' rows enter the row_number window. At sf0.01 the "
    "(source, lang) sizes straddle the cap, so BOTH branches execute and "
    "the union is pinned. The oracle ranks every group directly; per-group "
    "kept counts, char mass, and an order-insensitive id checksum must all "
    "match.",
)
def q_source_cap_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mixing import cap_per_group

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "n_chars"
    )
    kept = cap_per_group(docs, ["source", "lang"], "doc_id", 6, "n_chars")
    return kept.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").cast("long").alias("kept_chars"),
        F.sum("doc_id").cast("long").alias("id_sum"),
    )


@register(
    "token_budget_selection_profile",
    oracle=f"""
    WITH scored AS (
        SELECT lang, doc_id, {_QUALITY_SQL} AS q,
               CASE WHEN length(text) = 0 THEN 0
                    ELSE length(text) - length(replace(text, ' ', '')) + 1
               END AS tok
        FROM documents
    ), binned AS (
        SELECT lang, doc_id, CAST(floor(q * 20.0) AS BIGINT) AS bin, tok
        FROM scored WHERE q IS NOT NULL
    ), per_bin AS (
        SELECT lang, bin, sum(tok) AS bin_tokens
        FROM binned WHERE tok IS NOT NULL GROUP BY 1, 2
    ), running AS (
        SELECT lang, bin, bin_tokens,
               sum(bin_tokens) OVER (PARTITION BY lang ORDER BY bin DESC
                                     ROWS UNBOUNDED PRECEDING) AS run
        FROM per_bin
    ), thresholds AS (
        SELECT lang, min(bin) AS min_keep_bin FROM running
        WHERE run <= 3500 OR (run > 3500 AND run - bin_tokens <= 3500)
        GROUP BY 1
    )
    SELECT b.lang, count(*) AS n_docs_kept,
           CAST(sum(b.tok) AS BIGINT) AS kept_tokens,
           min(b.bin) AS min_kept_bin,
           CAST(sum(b.doc_id) AS BIGINT) AS id_sum
    FROM binned b JOIN thresholds t
      ON b.lang IS NOT DISTINCT FROM t.lang AND b.bin >= t.min_keep_bin
    GROUP BY b.lang
    """,
    description="Quality-threshold data selection under a per-language "
    "token budget (operators/selection.py — 'take the best documents "
    "until we have N tokens of each language', the corpus-construction "
    "counterpart to temperature mixing's rate rescale). The engine side "
    "never sorts the corpus: per-(lang, quality-bin) token sums "
    "map-side-combine to a thousands-row frame, the cumulative window "
    "runs over THAT, and the per-lang threshold broadcasts back as a "
    "map-only filter. Budget 3500 at sf0.01 makes both keep branches "
    "execute: 'en' crosses the budget inside its top bin "
    "(include_boundary keeps exactly that bin), 'de' walks seven bins "
    "deep. The oracle states the identical bin algebra in SQL; kept "
    "counts, token mass, threshold bin, and an order-insensitive id "
    "checksum must all match.",
)
def q_token_budget_selection_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.selection import quality_bin, select_within_token_budget

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text")
        .withColumn("quality", quality_score("text"))
        .withColumn("n_tokens", token_count("text").cast("long"))
    )
    kept = select_within_token_budget(
        docs, "lang", "quality", "n_tokens", budget=3500, scale=20.0,
        include_boundary=True,
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_tokens").cast("long").alias("kept_tokens"),
        F.min(quality_bin("quality", 20.0)).alias("min_kept_bin"),
        F.sum("doc_id").cast("long").alias("id_sum"),
    )


@register(
    "chunk_overlap_profile",
    oracle=r"""
    WITH w AS (
        SELECT doc_id, lang,
               list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS w
        FROM documents
    ),
    c AS (
        SELECT doc_id, lang, len(w) AS n,
               CASE WHEN len(w) <= 64 THEN 1
                    ELSE CAST(ceil((len(w) - 64) / 56.0) AS INT) + 1 END AS nc,
               w
        FROM w
    ),
    ch AS (
        SELECT doc_id, lang, unnest(range(0, nc))::INT AS chunk_id, w
        FROM c
    ),
    chunks AS (
        SELECT lang, md5(array_to_string(
                   list_slice(w, chunk_id*56 + 1, chunk_id*56 + 64), ' ')) AS fp,
               len(list_slice(w, chunk_id*56 + 1, chunk_id*56 + 64)) AS n_tokens,
               doc_id
        FROM ch
    )
    SELECT lang,
           count(DISTINCT doc_id) AS n_docs,
           count(*) AS n_chunks,
           sum(n_tokens)::BIGINT AS sum_tokens,
           count(DISTINCT fp) AS n_unique_chunks,
           min(fp) AS min_fp,
           max(fp) AS max_fp
    FROM chunks
    GROUP BY 1
    """,
    description="Context-window chunking with overlap (operators/"
    "chunking.py): every document explodes into <=64-token chunks with "
    "an 8-token overlap (stride 56), the splitter feeding embedding/"
    "indexing stages. The oracle re-derives the full chunk expansion "
    "(generate_series + list_slice on the shared whitespace-token "
    "idiom) and the md5 fingerprints pin chunk CONTENT, not just "
    "counts — a off-by-one stride, a dropped final chunk, or a "
    "non-clamped slice all break the hash. Map-only plan: no shuffle "
    "until the profile groupBy; the per-element-recompute hazard is "
    "avoided by exploding chunk indices before slicing (module doc).",
)
def q_chunk_overlap_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.chunking import chunk_documents

    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_documents(
        docs, chunk_size=64, overlap=8, keep_cols=["lang"]
    )
    fp = F.md5("chunk_text")
    return chunks.groupBy("lang").agg(
        F.count_distinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("sum_tokens"),
        F.count_distinct(fp).alias("n_unique_chunks"),
        F.min(fp).alias("min_fp"),
        F.max(fp).alias("max_fp"),
    )


@register(
    "weighted_sample_profile",
    oracle="""
    WITH c AS (
        SELECT doc_id, lang, n_chars,
               sum(n_chars) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS cum
        FROM documents
    )
    SELECT lang,
           count(*) AS n_selected,
           sum(n_chars)::BIGINT AS selected_weight,
           sum(doc_id)::BIGINT AS sum_ids
    FROM c
    WHERE cum // 5000 > (cum - n_chars) // 5000
    GROUP BY 1
    """,
    description="Weight-proportional systematic sampling (operators/"
    "split.py:systematic_weighted_sample): one document per 5000 chars "
    "of cumulative weight per language, selected by integer stride "
    "crossings over a per-stratum cumulative window — selection odds "
    "are weight/stride, sample size is budget-bounded, and the "
    "arithmetic is all integer div so the selected set is bit-exact in "
    "any engine. The oracle replays the identical window + crossing "
    "predicate; sum_ids pins the EXACT selected rows, not just their "
    "count. Per-stratum windows keep the 100-TB shape bounded (no "
    "global cumulative order).",
)
def q_weighted_sample_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.split import systematic_weighted_sample

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    picked = systematic_weighted_sample(
        docs, "n_chars", stride=5000, order_col="doc_id", by=["lang"]
    )
    return picked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_selected"),
        F.sum("n_chars").alias("selected_weight"),
        F.sum("doc_id").alias("sum_ids"),
    )


@register(
    "embedding_sq_recall",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 10
    ), c AS (
        SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
        FROM embeddings
    ), scored AS (
        SELECT query_id, neighbor_id,
               list_dot_product(qv, cv)
                 / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                 AS cosine_sim
        FROM q, c
        WHERE neighbor_id != query_id
    ), exact AS (
        SELECT query_id, neighbor_id
        FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
            FROM scored
        )
        WHERE rank <= 5
    )
    SELECT count(*) AS n_exact, 1 AS recall_ok FROM exact
    """,
    description="Scalar-quantized (SQ8) top-k recall vs the exact float "
    "baseline (operators/quantize.py): per-vector 8-bit codes + two "
    "scalars replace float32 (1 byte/dim at rest, 4x smaller hot set — "
    "the FAISS SQ8 memory posture), and the cosine is reconstructed "
    "from precomputed code moments with only an INTEGER code dot per "
    "candidate. The oracle pins the exact-pair count and asserts "
    "recall@5 >= 0.8 held; measured 1.00 at sf0.001 / 0.98 at sf0.01, "
    "so the flag flips only on a real quantization regression. "
    "Composes with the IVF index (quantize the cell lists) for the "
    "full memory-bounded ANN stack.",
)
def q_embedding_sq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quantize import quantized_cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, "vec_id", "embedding", k=5, batch_cosine=True)
    approx = quantized_cosine_topk(emb, queries, k=5)
    return _pair_recall(exact, approx, ["query_id", "neighbor_id"], threshold=0.8)


@register(
    "bm25_relevance_contract",
    oracle="""
    WITH tok AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  w -> len(w) > 0)) AS word
        FROM documents
    ),
    dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM tok GROUP BY 1),
    ad AS (SELECT avg(dl) AS avgdl FROM dl),
    nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    qt AS (
        SELECT doc_id, word FROM tok
        WHERE word IN ('spark', 'join', 'filter')
    ),
    tf AS (
        SELECT doc_id, word, CAST(count(*) AS DOUBLE) AS tf
        FROM qt GROUP BY 1, 2
    ),
    dfq AS (
        SELECT word, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
        FROM qt GROUP BY 1
    ),
    idf AS (
        SELECT word,
               ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) AS idf
        FROM dfq, nd
    )
    SELECT tf.doc_id,
           CAST(count(*) AS BIGINT) AS n_terms,
           round(sum(idf * (tf * (1.2 + 1.0))
                     / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 6)
             AS score
    FROM tf
    JOIN idf USING (word)
    JOIN dl USING (doc_id), ad
    GROUP BY 1
    """,
    description="Okapi BM25 relevance scores (operators/bm25.py:"
    "bm25_scores) of every document against the query {spark, join, "
    "filter} with Lucene's smoothed idf, tf saturation (k1=1.2) and "
    "length normalization (b=0.75) — the corpus-triage / weak-labeling "
    "scorer. Tokens explode once and feed both the document-length "
    "aggregation and the term statistics; the query-term filter cuts "
    "tf/df to |terms| keys before any shuffle, per-term idf broadcasts "
    "onto the tf frame, and corpus size / avgdl ride along as "
    "broadcast one-row frames. The oracle restates the identical "
    "tokenization (the operators/quality.py words() contract) and "
    "score arithmetic at 6 decimals.",
)
def q_bm25_relevance_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bm25 import bm25_scores

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return bm25_scores(docs, ["spark", "join", "filter"])


@register(
    "setsim_prefix_join_contract",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, text,
               list_filter(string_split_regex(text, '\s+'), w -> len(w) > 0) AS w
        FROM documents WHERE doc_id < 500
    ), sh AS (
        SELECT doc_id,
               list_distinct(
                   CASE WHEN len(w) >= 3 THEN
                       list_transform(range(1, len(w) - 1),
                                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                   ELSE [text] END
               ) AS sh
        FROM toks
    )
    SELECT id_a, id_b, round(jaccard, 6) AS jaccard
    FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               len(list_intersect(a.sh, b.sh))::DOUBLE
                 / len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
        FROM sh a, sh b
        WHERE a.doc_id < b.doc_id
    )
    WHERE jaccard >= 0.6
    """,
    description="Prefix-filtered EXACT set-similarity join "
    "(operators/setsim.py:jaccard_prefix_pairs — the PPJoin/AllPairs "
    "candidate-generation principle): word-3-gram Jaccard >= 0.6 "
    "pairs, but candidates come only from each document's "
    "|A|-ceil(0.6|A|)+1 RAREST shingles under a global "
    "doc-frequency-ascending order — provably lossless (prefix-filter "
    "theorem, proof in the docstring) while the self-join touches "
    "Sum df^2 over PREFIX shingles only, measured >5x below the full "
    "inverted index's join rows on this fixture "
    "(tests/test_setsim.py). No silent caps: completeness is by "
    "theorem, not by sampling. The oracle is the honest all-pairs "
    "restatement at fixture scale (doc_id < 500, the "
    "ngram_jaccard_pairs bounding pattern); equality with the full "
    "inverted index is ALSO pinned in pytest at three thresholds.",
)
def q_setsim_prefix_join_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.setsim import jaccard_prefix_pairs

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 500)
    )
    return jaccard_prefix_pairs(
        docs, "doc_id", "text", shingle_n=3, threshold=0.6
    ).withColumn("jaccard", F.round("jaccard", 6))


@register(
    "knn_ann_pq_recall",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 10
    ), c AS (
        SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
        FROM embeddings
    ), scored AS (
        SELECT query_id, neighbor_id,
               list_dot_product(qv, cv)
                 / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                 AS cosine_sim
        FROM q, c
        WHERE neighbor_id != query_id
    ), exact AS (
        SELECT query_id, neighbor_id
        FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
            FROM scored
        )
        WHERE rank <= 5
    )
    SELECT count(*) AS n_exact, 1 AS recall_ok FROM exact
    """,
    description="Product-quantization ADC top-k recall (the FAISS PQ "
    "index leg, operators/pq.py:pq_cosine_topk): 32 subspaces x 64 "
    "centroids = 24 bytes/vector (~11x below float32); codebooks fit "
    "by deterministic per-subspace Lloyd on an xxhash64-ordered "
    "bounded sample (the FAISS train-on-sample practice), encoding is "
    "one Arrow einsum pass, and scoring is asymmetric distance "
    "computation — m lookups into the broadcast query LUT per "
    "candidate, float corpus vectors never read. Exact reconstructed "
    "norms (subspaces are orthogonal blocks) make the PQ cosine equal "
    "the numpy-reconstruction cosine bit-for-bit (pinned in pytest, "
    "plus a zero-distortion k=n fixture). Same exact-baseline oracle "
    "and 0.5 flag threshold as the IVF/SQ gates; measured recall@5 "
    "0.80-0.82 on the (worst-case, unclustered) fixtures.",
)
def q_knn_ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pq import pq_cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, "vec_id", "embedding", k=5, batch_cosine=True)
    approx = pq_cosine_topk(emb, queries, k=5, m=32, n_centroids=64)
    return _pair_recall(exact, approx, ["query_id", "neighbor_id"], threshold=0.5)


@register(
    "knn_ann_ivf_pq_recall",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 10
    ), c AS (
        SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
        FROM embeddings
    ), scored AS (
        SELECT query_id, neighbor_id,
               list_dot_product(qv, cv)
                 / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                 AS cosine_sim
        FROM q, c
        WHERE neighbor_id != query_id
    ), exact AS (
        SELECT query_id, neighbor_id
        FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
            FROM scored
        )
        WHERE rank <= 5
    )
    SELECT count(*) AS n_exact, 1 AS recall_ok FROM exact
    """,
    description="Composed IVF+PQ top-k recall (the FAISS IVF,PQ index "
    "posture, operators/pq.py:ivf_pq_cosine_topk), completing the "
    "composition matrix next to IVF,SQ8: the coarse cell probe bounds "
    "WHICH rows a query touches (n_probe/n_cells), PQ codes bound "
    "BYTES per touched row (24 B/vector at 32x64) — candidates are "
    "scored by m LUT lookups from the broadcast query table; the cell "
    "id rides through the single Arrow encode pass so the corpus is "
    "scanned once and never shuffled. Codes fit on raw vectors "
    "(IVF,Flat+PQ; residual refinement documented as orthogonal). "
    "Same exact-baseline oracle and flag threshold style as the other "
    "ANN gates (0.4, below the measured 0.68-0.74 at probe 8/16).",
)
def q_knn_ann_ivf_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pq import ivf_pq_cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, "vec_id", "embedding", k=5, batch_cosine=True)
    approx = ivf_pq_cosine_topk(
        emb, queries, k=5, n_cells=16, n_probe=8, m=32, n_centroids=64
    )
    return _pair_recall(exact, approx, ["query_id", "neighbor_id"], threshold=0.4)


@register(
    "knn_ann_ivf_pq_refine_recall",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 10
    ), c AS (
        SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv
        FROM embeddings
    ), scored AS (
        SELECT query_id, neighbor_id,
               list_dot_product(qv, cv)
                 / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv)))
                 AS cosine_sim
        FROM q, c
        WHERE neighbor_id != query_id
    ), exact AS (
        SELECT query_id, neighbor_id
        FROM (
            SELECT query_id, neighbor_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
            FROM scored
        )
        WHERE rank <= 5
    )
    SELECT count(*) AS n_exact, 1 AS recall_ok FROM exact
    """,
    description="Two-stage ANN with exact re-rank (operators/pq.py:"
    "ivf_pq_refine_cosine_topk — the FAISS IVF,PQ + RefineFlat "
    "posture, VERDICT r8 item 5): the composed IVF,PQ index surfaces "
    "a top-50 candidate list per query (ADC lookups, recall's job), "
    "then refine_exact_topk recomputes TRUE cosines from the float "
    "vectors for those 50 candidates only and re-ranks — quantization "
    "error vanishes for every surfaced neighbor, lifting recall@5 "
    "from the unrefined 0.68-0.74 to a measured 0.92-0.94 across "
    "sf0.001/0.01/0.1 at probe 12/16. The re-rank is two BROADCAST "
    "joins (candidates and queries are answer-scale) over a map-only "
    "corpus read — bounded float reads (50/query), never a corpus "
    "scan. Flag threshold 0.85: below every measured refined recall, "
    "above the 0.82 probe-8 cell ceiling — the gate fails if the "
    "refine stage stops adding its lift. Candidate-superset dominance "
    "and exact-cosine-not-ADC scores are pytest-pinned in "
    "tests/test_pq.py.",
)
def q_knn_ann_ivf_pq_refine_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.pq import ivf_pq_refine_cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, queries, "vec_id", "embedding", k=5, batch_cosine=True)
    refined = ivf_pq_refine_cosine_topk(
        emb, queries, k=5, n_cells=16, n_probe=12, m=32, n_centroids=64,
        refine=50,
    )
    return _pair_recall(exact, refined, ["query_id", "neighbor_id"], threshold=0.85)


@register(
    "hybrid_search_rrf",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  w -> len(w) > 0)) AS word
        FROM documents
    ),
    dl AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS dl FROM tok GROUP BY 1),
    ad AS (SELECT avg(dl) AS avgdl FROM dl),
    nd AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    qt AS (SELECT doc_id, word FROM tok
           WHERE word IN ('spark', 'join', 'filter')),
    tf AS (SELECT doc_id, word, CAST(count(*) AS DOUBLE) AS tf
           FROM qt GROUP BY 1, 2),
    dfq AS (SELECT word, CAST(count(DISTINCT doc_id) AS DOUBLE) AS df
            FROM qt GROUP BY 1),
    idf AS (SELECT word, ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) AS idf
            FROM dfq, nd),
    bm AS (
        SELECT tf.doc_id,
               round(sum(idf * (tf * (1.2 + 1.0))
                         / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))), 6)
                   AS score
        FROM tf JOIN idf USING (word) JOIN dl USING (doc_id), ad GROUP BY 1
    ),
    lex AS (
        SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rnk
        FROM bm QUALIFY rnk <= 50
    ),
    qv AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
    sem0 AS (
        SELECT vec_id AS doc_id,
               round(list_dot_product(embedding::DOUBLE[], qv)
                     / (sqrt(list_dot_product(embedding::DOUBLE[],
                                              embedding::DOUBLE[]))
                        * sqrt(list_dot_product(qv, qv))), 6) AS cs
        FROM embeddings, qv WHERE vec_id != 0
    ),
    sem AS (
        SELECT doc_id, row_number() OVER (ORDER BY cs DESC, doc_id) AS rnk
        FROM sem0 QUALIFY rnk <= 50
    ),
    u AS (
        SELECT doc_id, 1.0 / (60 + rnk) AS c FROM lex
        UNION ALL SELECT doc_id, 1.0 / (60 + rnk) FROM sem
    ),
    f AS (SELECT doc_id, sum(c) AS s, CAST(count(*) AS BIGINT) AS n_lists
          FROM u GROUP BY 1)
    SELECT doc_id, round(s, 6) AS rrf_score, n_lists,
           row_number() OVER (ORDER BY s DESC, doc_id) AS fused_rank
    FROM f QUALIFY fused_rank <= 10
    """,
    description="Hybrid lexical+semantic retrieval fused by "
    "reciprocal-rank fusion (operators/rrf.py:rrf_fuse, Cormack et "
    "al. SIGIR'09): BM25 top-50 for {spark, join, filter} (the FULL "
    "bm25_relevance_contract machinery and oracle algebra, restated "
    "term for term as this gate's lexical leg) merges with the exact "
    "cosine top-50 against document 0's embedding via "
    "score(d)=SUM 1/(60+rank_l(d)) — rank-only fusion, so log-scores "
    "and cosines need no calibration. Both leg rankings order by "
    "6-decimal-rounded scores (id tie-break) so leg membership is "
    "ULP-stable across engines; fusion sums <=2 commutative doubles "
    "per doc. Inputs are answer-scale top-N frames by construction — "
    "the fusion never touches the corpus; the cosine leg uses the "
    "sequential-fold dot that matches DuckDB's list_dot_product "
    "bit-for-bit.",
)
def q_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.bm25 import bm25_scores
    from ..operators.rrf import rrf_fuse
    from ..operators.similarity import as_double_array, cosine

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    bm = bm25_scores(docs, ["spark", "join", "filter"])
    w_lex = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    lex = bm.select(
        "doc_id", F.row_number().over(w_lex).alias("rank")
    ).filter(F.col("rank") <= 50)

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(
        as_double_array("embedding").alias("qv")
    )
    sc = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(
                cosine(as_double_array("embedding"), F.col("qv")), 6
            ).alias("cs"),
        )
    )
    w_sem = Window.orderBy(F.desc("cs"), F.asc("doc_id"))
    sem = sc.select(
        "doc_id", F.row_number().over(w_sem).alias("rank")
    ).filter(F.col("rank") <= 50)
    return rrf_fuse([lex, sem], ["doc_id"], k=60, top_n=10)


@register(
    "negative_sampling_contract",
    oracle="""
    WITH pos AS (
        SELECT DISTINCT o_custkey AS u, l_partkey AS it
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_custkey < 200
    ),
    dim AS (SELECT DISTINCT l_partkey AS it FROM lineitem),
    idx AS (SELECT it, CAST(row_number() OVER (ORDER BY it) - 1 AS BIGINT)
                   AS i FROM dim),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM dim),
    users AS (SELECT DISTINCT u FROM pos),
    draws AS (
        SELECT u, j,
               (('0x' || substr(md5(u || ':neg:' || j), 1, 15))::BIGINT)
                   % n.n AS i
        FROM users, UNNEST(generate_series(1, 20)) AS t(j), n
    ),
    cand AS (SELECT d.u, idx.it, d.j FROM draws d JOIN idx USING (i)),
    neg AS (
        SELECT c.u, c.it, c.j FROM cand c
        WHERE NOT EXISTS (SELECT 1 FROM pos p
                          WHERE p.u = c.u AND p.it = c.it)
    ),
    first_hit AS (SELECT u, it, min(j) AS mj FROM neg GROUP BY 1, 2)
    SELECT u AS "user", it AS item,
           row_number() OVER (PARTITION BY u ORDER BY mj) AS draw_rank
    FROM first_hit QUALIFY draw_rank <= 5
    """,
    description="Deterministic negative sampling "
    "(operators/negatives.py:hash_negative_samples) — the BPR/"
    "contrastive data-prep step: 5 non-purchased parts per customer "
    "via indexed pseudo-random draws, draw j landing on item index "
    "md5int(user:salt:j) mod n_items (the house portable md5 band — "
    "conv(hex,16,10) in Spark, ('0x'||hex)::BIGINT in DuckDB — so the "
    "exact same draws replay on any engine; rand()-based sampling is "
    "partitioning-dependent and unverifiable). Work is O(users x "
    "k*oversample) draws + ONE anti-join against positives; the item "
    "universe is touched only through its dimension-sized dense "
    "index; repeats collapse to first hit and ranks are draw-order. "
    "Users whose positives blanket the universe honestly get fewer "
    "than k.",
)
def q_negative_sampling_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.negatives import hash_negative_samples

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pos = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .filter(F.col("o_custkey") < 200)
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    items = li.select("l_partkey")
    return hash_negative_samples(
        pos, "o_custkey", "l_partkey", items, k=5, oversample=4
    )


@register(
    "containment_pairs_contract",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id, text,
               list_filter(string_split_regex(text, '\s+'), w -> len(w) > 0) AS w
        FROM documents WHERE doc_id < 500
    ), sh AS (
        SELECT doc_id,
               list_distinct(
                   CASE WHEN len(w) >= 3 THEN
                       list_transform(range(1, len(w) - 1),
                                      i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
                   ELSE [text] END
               ) AS sh
        FROM toks
    ), pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(len(list_intersect(a.sh, b.sh)) AS BIGINT) AS common,
               CAST(len(a.sh) AS BIGINT) AS size_a,
               CAST(len(b.sh) AS BIGINT) AS size_b
        FROM sh a, sh b WHERE a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, common, size_a, size_b,
           round(common::DOUBLE / size_a, 6) AS containment_a,
           round(common::DOUBLE / size_b, 6) AS containment_b
    FROM pairs
    WHERE common::DOUBLE / size_a >= 0.6 OR common::DOUBLE / size_b >= 0.6
    """,
    description="Asymmetric containment near-dup pairs "
    "(operators/setsim.py:containment_pairs): |A∩B|/|A| >= 0.6 in "
    "EITHER direction over word-3-gram shingle sets — the "
    "quotation/subset case Jaccard structurally misses (a short doc "
    "fully quoted in a long one scores containment 1.0 but tiny "
    "Jaccard; 'drop the contained copy, keep the superset' is the "
    "curation rule this feeds). Same inverted-index shape as "
    "jaccard_pairs_index — docs only meet if they share a shingle, "
    "zero-overlap pairs never materialize; the prefix filter is "
    "deliberately NOT applied (its losslessness is Jaccard-specific — "
    "documented in the operator). Oracle: all-pairs intersect "
    "restatement at fixture scale (the doc_id < 500 bounding "
    "pattern).",
)
def q_containment_pairs_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.setsim import containment_pairs

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") < 500)
    )
    return containment_pairs(docs, "doc_id", "text", shingle_n=3, threshold=0.6)


@register(
    "weighted_ksample_contract",
    oracle="""
    WITH staged AS (
        SELECT lang, doc_id, n_chars,
               ln((('0x' || substr(md5('wsk:' || doc_id), 1, 15))::BIGINT + 1)
                  / 1152921504606846976.0)
                 / CAST(n_chars AS DOUBLE) AS es
        FROM documents
        WHERE n_chars IS NOT NULL AND n_chars > 0
    )
    SELECT lang, doc_id, n_chars
    FROM (SELECT lang, doc_id, n_chars,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY es DESC, doc_id) AS rn
          FROM staged)
    WHERE rn <= 5
    """,
    description="Exactly-k weighted sampling WITHOUT replacement per "
    "language (operators/split.py:weighted_sample_k — the "
    "Efraimidis-Spirakis A-ES scheme made deterministic): each row "
    "draws u from the portable md5 band of its key and wins on the "
    "largest u^(1/w), computed as the numerically-stable monotone "
    "equivalent ln(u)/w; u = (band+1)/16^15 is never 0 so ln stays "
    "finite. Content-keyed draws make the SELECTED SET itself "
    "hash-verifiable (an RNG A-ES never is); non-positive/NULL "
    "weights are excluded by contract. Complements "
    "weighted_sample_profile's proportional-stride selection with an "
    "exact per-group k; sort key is a pure projection, per-group "
    "top-k is a k-bounded window on the group key. The oracle "
    "restates the draw, the log-key and the ranking verbatim.",
)
def q_weighted_ksample_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.split import weighted_sample_k

    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", "n_chars"
    )
    return weighted_sample_k(docs, "doc_id", "n_chars", k=5, by=["lang"])


@register(
    "winnowing_fingerprint_contract",
    oracle="""
    WITH sub AS (
        SELECT doc_id,
               regexp_replace(lower(text), '[^a-z0-9]', '', 'g') AS t
        FROM documents
        WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':winnow'),
                    1, 15))::BIGINT) / 1152921504606846976.0 < 0.05
    ), g AS (
        SELECT doc_id, t, length(t) - 4 AS m
        FROM sub WHERE t IS NOT NULL AND length(t) >= 5
    ), h AS (
        SELECT doc_id, m,
               list_transform(generate_series(1, m),
                   p -> ('0x' || substr(md5(substr(t, p, 5)), 1, 15))::BIGINT)
                   AS hashes
        FROM g
    ), f AS (
        SELECT doc_id,
               list_distinct(CASE WHEN m >= 4
                   THEN list_transform(generate_series(1, m - 3),
                        i -> list_min(list_slice(hashes, i, i + 3)))
                   ELSE [list_min(hashes)] END) AS fps
        FROM h
    )
    SELECT doc_id,
           CAST(len(fps) AS BIGINT) AS n_fingerprints,
           CAST(list_min(fps) AS BIGINT) AS min_fp,
           CAST(list_max(fps) AS BIGINT) AS max_fp,
           CAST(list_aggregate(list_transform(fps, x -> x % 1000003),
                    'sum') AS BIGINT) AS fp_checksum
    FROM f
    """,
    description="Winnowing document fingerprints (operators/winnow.py, "
    "Schleimer et al. SIGMOD'03 / MOSS) on a deterministic 5% md5-band "
    "document subset: per doc the count, min, max and mod-1000003 checksum "
    "of the distinct selected k-gram hashes (k=5, w=4 — any shared "
    "normalized substring of length >= 8 is guaranteed a shared "
    "fingerprint). The whole computation is a map-only higher-order-"
    "function projection (sequence/transform/slice/array_min) inside "
    "whole-stage codegen — no shuffle before the per-doc profile agg, "
    "no UDF; the checksum pins the exact fingerprint SETS, not just "
    "their sizes. The winnowing guarantees (every-window-covered, "
    "shared-substring detection through the shared_fingerprint_pairs "
    "join — the setsim inverted-index shape) are property-tested "
    "against a pure hashlib twin in tests/test_winnow.py.",
)
def q_winnowing_fingerprint_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.mixing import _md5_fold
    from ..operators.winnow import winnowing_fingerprints

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    u = _md5_fold(
        F.concat(F.col("doc_id").cast("string"), F.lit(":winnow"))
    ) / F.lit(float(1 << 60))
    sub = docs.filter(u < 0.05)
    fps = winnowing_fingerprints(sub, "doc_id", "text", k=5, w=4)
    return fps.groupBy(F.col("id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_fingerprints"),
        F.min("fingerprint").alias("min_fp"),
        F.max("fingerprint").alias("max_fp"),
        F.sum(F.col("fingerprint") % 1000003).alias("fp_checksum"),
    )


@register(
    "duplicate_span_removal_contract",
    oracle="""
    WITH sub AS (
        SELECT doc_id, text FROM documents
        WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':span'),
                    1, 15))::BIGINT) / 1152921504606846976.0 < 0.10
    ), rn AS (
        SELECT doc_id, text, row_number() OVER (ORDER BY doc_id) AS rn
        FROM sub
    ), corpus AS (
        SELECT a.doc_id,
               CASE WHEN a.rn % 4 = 0 AND b.doc_id IS NOT NULL
                    THEN a.text || ' ' || substr(b.text, 5, 150)
                    ELSE a.text END AS text
        FROM rn a LEFT JOIN rn b ON b.rn = a.rn - 3 AND a.rn % 4 = 0
    ), g AS (
        SELECT doc_id, p AS pos,
               ('0x' || substr(md5(substr(text, p, 100)), 1, 15))::BIGINT AS h
        FROM corpus,
             LATERAL (SELECT unnest(range(1, length(text) - 100 + 2)) AS p) u
        WHERE length(text) >= 100
    ), k AS (
        SELECT h, min(doc_id) AS keeper, count(DISTINCT doc_id) AS ndocs
        FROM g GROUP BY h
    ), dup AS (
        SELECT g.doc_id, g.pos FROM g JOIN k USING (h)
        WHERE k.ndocs >= 2 AND g.doc_id > k.keeper
    ), isl AS (
        SELECT doc_id, pos,
               CASE WHEN max(pos + 99) OVER w IS NULL
                      OR pos > max(pos + 99) OVER w + 1 THEN 1 ELSE 0 END AS ni
        FROM dup
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), sp AS (
        SELECT doc_id, min(pos) AS s, max(pos) + 99 AS e
        FROM (SELECT doc_id, pos,
                     sum(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island
              FROM isl) t
        GROUP BY doc_id, island
    ), gaps AS (
        SELECT doc_id,
               coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) + 1
                   AS gs,
               s - 1 AS ge
        FROM sp
        UNION ALL
        SELECT doc_id, max(e) + 1 AS gs, NULL AS ge FROM sp GROUP BY doc_id
    ), clean AS (
        SELECT c.doc_id,
               string_agg(substr(c.text, gp.gs,
                                 coalesce(gp.ge, length(c.text)) - gp.gs + 1),
                          '' ORDER BY gp.gs) AS clean_text
        FROM corpus c JOIN gaps gp USING (doc_id)
        GROUP BY c.doc_id
    ), prof AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(e - s + 1) AS BIGINT) AS removed_chars
        FROM sp GROUP BY doc_id
    )
    SELECT p.doc_id, p.n_spans, p.removed_chars,
           CAST(length(c2.text) AS BIGINT) AS orig_len,
           CAST(length(cl.clean_text) AS BIGINT) AS clean_len,
           md5(cl.clean_text) AS clean_md5
    FROM prof p
    JOIN corpus c2 USING (doc_id)
    JOIN clean cl USING (doc_id)
    """,
    description="Exact duplicate-SPAN extraction + removal "
    "(operators/spandedup.py — the Lee et al. 2022 ExactSubstr posture "
    "as distributed algebra): a deterministic 10% document band gets "
    "cross-document quotes planted (every 4th doc appends 150 chars of "
    "an earlier doc), then duplicate_spans localizes every repeated "
    ">=100-char substring via the gram-position index -> per-gram "
    "min-id keeper -> per-document islands merge, and strip_spans "
    "removes each span with a per-row fold — exactly one occurrence of "
    "every long repeated substring survives the corpus. The Spark side "
    "runs the SCALE path (winnowing fingerprint prefilter bounds the "
    "char-level index to flagged candidates; prefilter==brute-force "
    "equality is pytest-pinned in tests/test_spandedup.py); the oracle "
    "deliberately restates the UNPRUNED brute-force algebra — a "
    "structurally different computation of the same answer (the "
    "triangle-counting different-algebra discipline). Gate hashes "
    "per-affected-doc span counts, removed char volume, and the md5 of "
    "the reassembled clean text (start/end/middle span positions all "
    "pinned by the digest). Hand-worked span fixtures + a pure-Python "
    "twin in tests/test_spandedup.py.",
)
def q_duplicate_span_removal_contract(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.mixing import _md5_fold
    from ..operators.spandedup import duplicate_spans, strip_spans

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    u = _md5_fold(
        F.concat(F.col("doc_id").cast("string"), F.lit(":span"))
    ) / F.lit(float(1 << 60))
    # Planted-quote corpus (answer-scale fixture construction: the 10%
    # band is small by design; the single-partition row_number window
    # runs over it, not the corpus).
    sub = docs.filter(u < 0.10).withColumn(
        "rn", F.row_number().over(Window.orderBy("doc_id"))
    )
    a = sub.alias("a")
    b = sub.alias("b")
    corpus = a.join(
        b,
        (F.col("b.rn") == F.col("a.rn") - 3) & (F.col("a.rn") % 4 == 0),
        "left",
    ).select(
        F.col("a.doc_id").alias("doc_id"),
        F.when(
            (F.col("a.rn") % 4 == 0) & F.col("b.doc_id").isNotNull(),
            F.concat(
                F.col("a.text"),
                F.lit(" "),
                F.col("b.text").substr(F.lit(5), F.lit(150)),
            ),
        )
        .otherwise(F.col("a.text"))
        .alias("text"),
    ).localCheckpoint(eager=False)
    # corpus feeds duplicate_spans AND strip_spans; spans feeds the
    # profile agg AND strip_spans — unpinned, the whole planted-quote
    # construction + candidate/gram/window subtree ran TWICE (r12 sf1
    # spot-probe; guide §5 recompute-less).
    spans = duplicate_spans(
        corpus, "doc_id", "text", min_span=100, prefilter=True
    ).localCheckpoint(eager=False)
    prof = spans.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_len").alias("removed_chars"),
    )
    cleaned = strip_spans(corpus, spans, "doc_id", "text")
    return (
        prof.join(cleaned, prof["id"] == cleaned["doc_id"])
        .select(
            "doc_id",
            "n_spans",
            F.col("removed_chars").cast("long").alias("removed_chars"),
            F.length("text").cast("long").alias("orig_len"),
            F.length("clean_text").cast("long").alias("clean_len"),
            F.md5("clean_text").alias("clean_md5"),
        )
    )


def _curate_split_case_sub(sql: str) -> str:
    """Inject the shared hash-split CASE (operators/split.py) into an
    oracle template — the split arithmetic stays single-sourced."""
    from ..operators.split import split_case_sql

    return sql.replace(
        "{split_case}",
        split_case_sql("doc_id", {"train": 0.9, "eval": 0.1}),
    )


@register(
    "curate_span_strip_contract",
    oracle=_curate_split_case_sub("""
    WITH sub AS (
        SELECT doc_id, text FROM documents
        WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':span'),
                    1, 15))::BIGINT) / 1152921504606846976.0 < 0.10
    ), rn AS (
        SELECT doc_id, text, row_number() OVER (ORDER BY doc_id) AS rn
        FROM sub
    ), corpus AS (
        SELECT a.doc_id,
               CASE WHEN a.rn % 4 = 0 AND b.doc_id IS NOT NULL
                    THEN a.text || ' ' || substr(b.text, 5, 150)
                    ELSE a.text END AS text
        FROM rn a LEFT JOIN rn b ON b.rn = a.rn - 3 AND a.rn % 4 = 0
    ), g AS (
        SELECT doc_id, p AS pos,
               ('0x' || substr(md5(substr(text, p, 100)), 1, 15))::BIGINT AS h
        FROM corpus,
             LATERAL (SELECT unnest(range(1, length(text) - 100 + 2)) AS p) u
        WHERE length(text) >= 100
    ), k AS (
        SELECT h, min(doc_id) AS keeper, count(DISTINCT doc_id) AS ndocs
        FROM g GROUP BY h
    ), dup AS (
        SELECT g.doc_id, g.pos FROM g JOIN k USING (h)
        WHERE k.ndocs >= 2 AND g.doc_id > k.keeper
    ), isl AS (
        SELECT doc_id, pos,
               CASE WHEN max(pos + 99) OVER w IS NULL
                      OR pos > max(pos + 99) OVER w + 1 THEN 1 ELSE 0 END AS ni
        FROM dup
        WINDOW w AS (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ), sp AS (
        SELECT doc_id, min(pos) AS s, max(pos) + 99 AS e
        FROM (SELECT doc_id, pos,
                     sum(ni) OVER (PARTITION BY doc_id ORDER BY pos) AS island
              FROM isl) t
        GROUP BY doc_id, island
    ), gaps AS (
        SELECT doc_id,
               coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) + 1
                   AS gs,
               s - 1 AS ge
        FROM sp
        UNION ALL
        SELECT doc_id, max(e) + 1 AS gs, NULL AS ge FROM sp GROUP BY doc_id
    ), clean AS (
        SELECT c.doc_id,
               string_agg(substr(c.text, gp.gs,
                                 coalesce(gp.ge, length(c.text)) - gp.gs + 1),
                          '' ORDER BY gp.gs) AS clean_text
        FROM corpus c JOIN gaps gp USING (doc_id)
        GROUP BY c.doc_id
    ), stripped AS (
        SELECT c.doc_id, coalesce(cl.clean_text, c.text) AS t
        FROM corpus c LEFT JOIN clean cl USING (doc_id)
    ), dd AS (
        SELECT doc_id, t FROM stripped
        WHERE doc_id IN (SELECT min(doc_id) FROM stripped GROUP BY md5(t))
    )
    SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(length(t)) AS BIGINT) AS total_chars,
           CAST(sum(('0x' || substr(md5(t), 1, 15))::BIGINT % 1000003)
                AS BIGINT) AS text_checksum
    FROM (SELECT t, doc_id, {split_case} FROM dd)
    GROUP BY split
    """),
    description="End-to-end contract for the curation pipeline's new "
    "duplicate-SPAN stage (pipelines/curation.py strip_spans=True -> "
    "exact dedup -> deterministic 90/10 split): the same planted-quote "
    "10% corpus as duplicate_span_removal_contract flows through the "
    "COMPOSED recipe a real training-data user runs (cli.py curate "
    "--strip-spans), and the per-split profile pins doc counts, "
    "char volume, and a mod-1000003 md5-fold checksum of every "
    "surviving text — so a single mis-stripped character anywhere in "
    "the corpus breaks the hash. Stage order is the semantic point: "
    "the strip runs BEFORE whole-doc dedup, so documents differing "
    "only by a quoted span collapse to one survivor (pinned by hand "
    "fixture in tests/test_curation_pipeline.py, which also pins "
    "prefilter==brute-force equality through the pipeline). The Spark "
    "side runs the winnowing-pruned scale path; the oracle restates "
    "the UNPRUNED brute-force span algebra + md5-group dedup + the "
    "split case — a structurally different computation of the same "
    "answer.",
)
def q_curate_span_strip_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.mixing import _md5_fold
    from ..pipelines.curation import CurationConfig, curate_documents

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    u = _md5_fold(
        F.concat(F.col("doc_id").cast("string"), F.lit(":span"))
    ) / F.lit(float(1 << 60))
    sub = docs.filter(u < 0.10).withColumn(
        "rn", F.row_number().over(Window.orderBy("doc_id"))
    )
    a = sub.alias("a")
    b = sub.alias("b")
    corpus = a.join(
        b,
        (F.col("b.rn") == F.col("a.rn") - 3) & (F.col("a.rn") % 4 == 0),
        "left",
    ).select(
        F.col("a.doc_id").alias("doc_id"),
        F.when(
            (F.col("a.rn") % 4 == 0) & F.col("b.doc_id").isNotNull(),
            F.concat(
                F.col("a.text"),
                F.lit(" "),
                F.col("b.text").substr(F.lit(5), F.lit(150)),
            ),
        )
        .otherwise(F.col("a.text"))
        .alias("text"),
    )
    cfg = CurationConfig(
        redact_pii=False,
        strip_spans=True,
        span_min_len=100,
        dedup="exact",
        split_fractions={"train": 0.9, "eval": 0.1},
    )
    curated = curate_documents(corpus, cfg)
    return curated.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.sum(_md5_fold(F.col("text")) % F.lit(1000003)).alias(
            "text_checksum"
        ),
    )


@register(
    "cosine_allpairs_contract",
    oracle=r"""
    WITH d AS (
        SELECT doc_id, text FROM documents WHERE doc_id < 500
    ), n AS (
        SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM d
    ), tok AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  w -> len(w) > 0)) AS term
        FROM d
    ), tf AS (
        SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf
        FROM tok GROUP BY 1, 2
    ), dfq AS (
        SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1
    ), w AS (
        SELECT doc_id, term, tf * ln(n_docs / df) AS w
        FROM tf JOIN dfq USING (term), n
        WHERE tf * ln(n_docs / df) > 0
    ), nrm AS (
        SELECT doc_id, sum(w * w) AS w2 FROM w GROUP BY 1
    ), dots AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, sum(a.w * b.w) AS dot
        FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           round(dot / (sqrt(na.w2) * sqrt(nb.w2)), 6) AS cosine
    FROM dots
    JOIN nrm na ON na.doc_id = id_a
    JOIN nrm nb ON nb.doc_id = id_b
    WHERE round(dot / (sqrt(na.w2) * sqrt(nb.w2)), 6) >= 0.9
    """,
    description="All-pairs weighted-cosine similarity join "
    "(operators/apss.py:cosine_similarity_pairs — Bayardo et al. WWW'07 "
    "APSS): EXACT tf-idf cosine pairs >= 0.9 on the bounded doc_id<500 "
    "subset (the simhash-gate sizing precedent: the synthetic corpus's "
    "~30-word shared vocabulary is APSS's dense worst case — on Zipf "
    "natural text the L2 prefix filter prunes by weight mass AND "
    "df-ascending order, the setsim discipline). Candidates come from "
    "the lossless L2 prefix filter (a pair escaping both prefixes is "
    "provably below threshold: the globally-first shared term bounds "
    "cos by the suffix norms), verification joins term lists for "
    "candidate pairs only. The oracle restates the UNPRUNED brute-force "
    "index join — a structurally different computation of the same "
    "pairs; both sides round to 6 decimals before the threshold "
    "compare so membership is ULP-stable. Prefix-filter losslessness "
    "is additionally pytest-pinned against a pure-Python twin at a low "
    "threshold (tests/test_apss.py).",
)
def q_cosine_allpairs_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.apss import cosine_similarity_pairs

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return cosine_similarity_pairs(docs, "doc_id", "text", threshold=0.9)


@register(
    "dsir_selection_contract",
    oracle=r"""
    WITH ws AS (
        SELECT doc_id, lang,
               list_filter(string_split_regex(lower(text), '\s+'),
                           w -> len(w) > 0) AS ws
        FROM documents
    ), allg AS (
        SELECT CASE WHEN lang = 'en' THEN 'T' ELSE 'R' END AS side,
               doc_id,
               unnest(CASE WHEN len(ws) >= 2
                   THEN list_transform(generate_series(1, len(ws) - 1),
                        i -> array_to_string(list_slice(ws, i, i + 1), ' '))
                   ELSE [] END) AS g
        FROM ws
    ), bkt AS (
        SELECT side, doc_id,
               ('0x' || substr(md5(g), 1, 15))::BIGINT % 1024 AS bucket
        FROM allg
    ), rawdoc AS (
        SELECT doc_id, bucket, CAST(count(*) AS DOUBLE) AS cnt
        FROM bkt WHERE side = 'R' GROUP BY 1, 2
    ), tcnt AS (
        SELECT bucket, CAST(count(*) AS DOUBLE) AS cnt
        FROM bkt WHERE side = 'T' GROUP BY 1
    ), qcnt AS (
        SELECT bucket, sum(cnt) AS cnt FROM rawdoc GROUP BY 1
    ), tt AS (
        SELECT coalesce(sum(cnt), 0) + 1024.0 AS dn FROM tcnt
    ), qt AS (
        SELECT coalesce(sum(cnt), 0) + 1024.0 AS dn FROM qcnt
    ), scored AS (
        SELECT r.doc_id,
               CAST(sum(r.cnt) AS BIGINT) AS n_ngrams,
               round(sum(r.cnt * (ln((coalesce(t.cnt, 0) + 1) / tt.dn)
                                  - ln((q.cnt + 1) / qt.dn))), 6) AS score
        FROM rawdoc r
        LEFT JOIN tcnt t USING (bucket)
        JOIN qcnt q USING (bucket), tt, qt
        GROUP BY 1
    )
    SELECT s.doc_id, d.lang, s.n_ngrams, s.score,
           row_number() OVER (ORDER BY s.score DESC, s.doc_id) AS rank
    FROM scored s JOIN documents d USING (doc_id)
    QUALIFY rank <= 20
    """,
    description="DSIR-style importance selection (operators/dsir.py, "
    "Xie et al. NeurIPS'23): every non-English document scored by the "
    "bag-of-hashed-bigrams log-likelihood ratio of the English (target) "
    "distribution vs the raw distribution — Laplace-smoothed over 1024 "
    "md5-fold buckets — and the top-20 most target-like selected "
    "deterministically (score desc, id tiebreak). Feature hashing is a "
    "map-only HOF projection; both distributions are one bucket-"
    "cardinality agg (KB-scale, broadcast back); scores are one "
    "per-doc reduce; top-k compiles to TakeOrderedAndProject. Scores "
    "round to 6 decimals BEFORE ranking so selection is ULP-stable "
    "across engines. The oracle restates the full pipeline bigram-for-"
    "bigram; the hand-worked Laplace fixture and a bucket-collision-"
    "checked hashlib twin live in tests/test_dsir.py.",
)
def q_dsir_selection_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dsir import dsir_select_topk

    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")
    raw = docs.filter(F.col("lang") != "en")
    top = dsir_select_topk(raw, target, "doc_id", "text", k=20, n=2, buckets=1024)
    return (
        top.join(docs.select(F.col("doc_id"), "lang"), top["id"] == F.col("doc_id"))
        .select(
            "doc_id",
            "lang",
            F.col("n_ngrams").cast("long").alias("n_ngrams"),
            "score",
            "rank",
        )
    )


@register(
    "gopher_rules_contract",
    oracle=r"""
    WITH sig AS (
        SELECT lang,
               list_filter(string_split_regex(text, '\s+'),
                           w -> len(w) > 0) AS ws,
               list_filter(string_split(text, chr(10)),
                           l -> len(trim(l)) > 0) AS ls,
               len(text) - len(replace(text, '#', '')) AS n_hash,
               (len(text) - len(replace(text, '...', ''))) // 3
               + (len(text) - len(replace(text, '…', '')))
                   AS n_ellipsis
        FROM documents
    ), per_doc AS (
        SELECT lang,
               len(ws) AS n_words,
               CASE WHEN len(ws) > 0
                    THEN list_sum(list_transform(ws, w -> len(w)))::DOUBLE
                         / len(ws) END AS mean_len,
               CASE WHEN len(ws) > 0
                    THEN (n_hash + n_ellipsis)::DOUBLE / len(ws)
               END AS symbol_ratio,
               CASE WHEN len(ls) > 0
                    THEN len(list_filter(ls,
                             l -> substr(trim(l), 1, 1) IN ('-', '*', '•')
                         ))::DOUBLE / len(ls) END AS bullet_frac,
               CASE WHEN len(ls) > 0
                    THEN len(list_filter(ls,
                             l -> ends_with(trim(l), '...')
                                  OR ends_with(trim(l), '…')
                         ))::DOUBLE / len(ls) END AS ellipsis_frac,
               CASE WHEN len(ws) > 0
                    THEN len(list_filter(ws,
                             w -> regexp_matches(w, '[A-Za-z]')
                         ))::DOUBLE / len(ws) END AS alpha_frac,
               len(list_intersect(
                   list_distinct(list_transform(ws, w -> lower(w))),
                   ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with']
               )) AS n_stop
        FROM sig
    ), flags AS (
        SELECT lang,
               coalesce(n_words >= 50 AND n_words <= 100000, FALSE)
                   AS word_count_ok,
               coalesce(mean_len >= 3.0 AND mean_len <= 10.0, FALSE)
                   AS mean_len_ok,
               coalesce(symbol_ratio <= 0.1, FALSE) AS symbol_ok,
               coalesce(bullet_frac <= 0.9, FALSE) AS bullet_ok,
               coalesce(ellipsis_frac <= 0.3, FALSE) AS ellipsis_ok,
               coalesce(alpha_frac >= 0.8, FALSE) AS alpha_ok,
               coalesce(n_stop >= 2, FALSE) AS stop_ok
        FROM per_doc
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN NOT word_count_ok THEN 1 ELSE 0 END)
                AS BIGINT) AS fail_word_count,
           CAST(sum(CASE WHEN NOT mean_len_ok THEN 1 ELSE 0 END)
                AS BIGINT) AS fail_mean_word_len,
           CAST(sum(CASE WHEN NOT symbol_ok THEN 1 ELSE 0 END)
                AS BIGINT) AS fail_symbol_ratio,
           CAST(sum(CASE WHEN NOT bullet_ok THEN 1 ELSE 0 END)
                AS BIGINT) AS fail_bullet,
           CAST(sum(CASE WHEN NOT ellipsis_ok THEN 1 ELSE 0 END)
                AS BIGINT) AS fail_ellipsis,
           CAST(sum(CASE WHEN NOT alpha_ok THEN 1 ELSE 0 END)
                AS BIGINT) AS fail_alpha,
           CAST(sum(CASE WHEN NOT stop_ok THEN 1 ELSE 0 END)
                AS BIGINT) AS fail_stop_words,
           CAST(sum(CASE WHEN word_count_ok AND mean_len_ok AND symbol_ok
                          AND bullet_ok AND ellipsis_ok AND alpha_ok
                          AND stop_ok THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pass,
           round(sum(CASE WHEN word_count_ok AND mean_len_ok AND symbol_ok
                           AND bullet_ok AND ellipsis_ok AND alpha_ok
                           AND stop_ok THEN 1 ELSE 0 END)::DOUBLE
                 / count(*), 6) AS pass_rate
    FROM flags GROUP BY 1
    """,
    description="Gopher document-quality rules rollup (operators/"
    "quality.py:gopher_quality_flags, Rae et al. 2021 Appendix A): "
    "every document scored against the seven document-shape MassiveWeb "
    "filters at the paper's default thresholds — word count [50, 100k], mean word "
    "length [3, 10], #/ellipsis symbol ratio <= 0.1, bullet-start "
    "lines <= 90%, ellipsis-end lines <= 30%, alphabetic-word fraction "
    ">= 0.8, >= 2 of the 8 stop words — then rolled up per language to "
    "per-rule fail counts + the overall pass rate. Every signal is a "
    "higher-order-function projection over the token/line arrays (NO "
    "shuffle, no Python, no explode->groupBy: documents are scored "
    "inside the scan stage; the rollup is the only aggregation). "
    "Counts are integers and ratios single divisions, so the oracle's "
    "restatement matches bit-for-bit; the per-rule hand-crafted "
    "fixture docs (one failing doc per rule, signal values hand-"
    "checked) live in tests/test_gopher.py.",
)
def q_gopher_rules_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.quality import gopher_quality_flags

    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    flagged = gopher_quality_flags(docs, "text")
    return flagged.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(~F.col("word_count_ok"), 1).otherwise(0)).alias(
            "fail_word_count"
        ),
        F.sum(F.when(~F.col("mean_word_len_ok"), 1).otherwise(0)).alias(
            "fail_mean_word_len"
        ),
        F.sum(F.when(~F.col("symbol_ratio_ok"), 1).otherwise(0)).alias(
            "fail_symbol_ratio"
        ),
        F.sum(F.when(~F.col("bullet_ok"), 1).otherwise(0)).alias("fail_bullet"),
        F.sum(F.when(~F.col("ellipsis_ok"), 1).otherwise(0)).alias(
            "fail_ellipsis"
        ),
        F.sum(F.when(~F.col("alpha_ok"), 1).otherwise(0)).alias("fail_alpha"),
        F.sum(F.when(~F.col("stop_words_ok"), 1).otherwise(0)).alias(
            "fail_stop_words"
        ),
        F.sum(F.when(F.col("gopher_pass"), 1).otherwise(0)).alias("n_pass"),
        F.round(
            F.sum(F.when(F.col("gopher_pass"), 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("pass_rate"),
    )


@register(
    "jl_projection_contract",
    oracle="""
    WITH sample AS (
        SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 30
    ), proj AS (
        SELECT vec_id,
               list_transform(embedding, x -> x::DOUBLE) AS v,
               list_transform(
                   generate_series(0, 15),
                   j -> list_reduce(
                        list_transform(
                            generate_series(1, 64),
                            i -> embedding[i]::DOUBLE *
                                 (CASE WHEN ('0x' || substr(md5(
                                        'jl:' || j::VARCHAR || ':'
                                        || (i - 1)::VARCHAR), 1, 15)
                                      )::BIGINT % 2 = 0
                                      THEN 1.0::DOUBLE
                                      ELSE -1.0::DOUBLE END)),
                        (a, b) -> a + b) * 0.25::DOUBLE
               ) AS p
        FROM sample
    ), pairs AS (
        SELECT l.vec_id AS id_a, r.vec_id AS id_b,
               list_reduce(
                   list_transform(generate_series(1, 64),
                                  i -> (l.v[i] - r.v[i]) * (l.v[i] - r.v[i])),
                   (a, b) -> a + b) AS d2o,
               list_reduce(
                   list_transform(generate_series(1, 16),
                                  i -> (l.p[i] - r.p[i]) * (l.p[i] - r.p[i])),
                   (a, b) -> a + b) AS d2p
        FROM proj l JOIN proj r ON l.vec_id < r.vec_id
    )
    SELECT id_a, id_b,
           round(d2o, 6) AS d2_orig,
           round(d2p, 6) AS d2_proj,
           round(CASE WHEN d2o > 0 THEN d2p / d2o END, 6) AS ratio
    FROM pairs
    """,
    description="Johnson-Lindenstrauss random projection + distance "
    "audit (operators/projection.py, Achlioptas ±1 projection): 64-d "
    "embeddings projected to k=16 signed md5-derived directions "
    "(sign(j,i) from the repo's portable md5 fold — the matrix regrows "
    "identically in any engine and on any re-run; 1/sqrt(16) = 0.25 is "
    "exact binary), then every pair among the 30 smallest vec_ids "
    "audited for squared-distance preservation (ratio = d2_proj / "
    "d2_orig, the JL distortion). The projection is a map-only HOF "
    "fold inside the scan stage (no shuffle/Python/UDF; k x dim "
    "literals in the plan, no driver state); the audit is the only "
    "quadratic piece and is explicitly sample-bounded (max_ids). The "
    "oracle regrows the sign matrix from the same md5 and replays the "
    "identical left folds; the NumPy matrix-multiply twin and the "
    "hand-checkable k=1 case live in tests/test_projection.py.",
)
def q_jl_projection_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.projection import jl_distance_audit

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return jl_distance_audit(
        emb, "vec_id", "embedding", dim=64, k=16, max_ids=30
    )


@register(
    "pmi_collocations_contract",
    oracle=r"""
    WITH toks AS (
        SELECT list_filter(string_split_regex(lower(text), '\s+'),
                           w -> len(w) > 0) AS ws
        FROM documents
    ),
    bg AS (
        SELECT ws[i] AS w1, ws[i + 1] AS w2
        FROM toks, unnest(generate_series(1, len(ws) - 1)) AS t(i)
    ),
    uni AS (
        SELECT u.term AS term, count(*) AS c
        FROM toks, unnest(ws) AS u(term) GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(c) AS DOUBLE) AS nn FROM uni),
    btot AS (SELECT CAST(count(*) AS DOUBLE) AS bb FROM bg),
    pc AS (
        SELECT w1, w2, count(*) AS n_pair
        FROM bg GROUP BY 1, 2 HAVING count(*) >= 5
    ),
    s AS (
        SELECT p.w1, p.w2, p.n_pair, u1.c AS n_w1, u2.c AS n_w2,
               ln(CAST(p.n_pair AS DOUBLE) * tot.nn * tot.nn
                  / (btot.bb * CAST(u1.c AS DOUBLE)
                     * CAST(u2.c AS DOUBLE))) AS pmi_raw
        FROM pc p
        JOIN uni u1 ON u1.term = p.w1
        JOIN uni u2 ON u2.term = p.w2
        CROSS JOIN tot CROSS JOIN btot
    )
    SELECT w1, w2, n_pair, n_w1, n_w2,
           round(pmi_raw, 6) AS pmi,
           CAST(row_number() OVER (ORDER BY pmi_raw DESC, w1 ASC, w2 ASC)
                AS INTEGER) AS rank
    FROM s
    ORDER BY pmi_raw DESC, w1 ASC, w2 ASC
    LIMIT 20
    """,
    description="PMI collocations (operators/collocations.py:"
    "pmi_collocations, Church & Hanks CL 1990): the top-20 adjacent "
    "word pairs of the documents corpus by pointwise mutual "
    "information ln(c_xy*N*N/(B*c_x*c_y)) with a min_count=5 bigram "
    "noise floor (PMI's classic failure mode is hapax pairs scoring "
    "maximal) and (w1, w2) tie-breaks — the phrase-mining readout a "
    "tokenizer/vocabulary designer runs before committing merges, "
    "the within-corpus association sibling of the keyness gate's "
    "between-slice G2. Bigrams build as a map-only arrays_zip of two "
    "token-array slices INSIDE the scan stage (pairing per document "
    "in the projection — no posexplode self-join, bigrams never "
    "cross documents), then ONE bigram-keyed count agg + ONE "
    "term-keyed unigram agg (both map-side combined, the tf-idf "
    "shuffle shape), two 1-row scalar totals crossJoined in, and "
    "TakeOrderedAndProject top-k — rank assigned AFTER the 20-row "
    "limit, never a vocabulary-wide window. Counts are integers "
    "entering one shared-operation-order double expression. "
    "Hand-worked ln(49/9) exact-tie fixture + pure-Python "
    "Counter twin on a random corpus in tests/test_collocations.py.",
)
def q_pmi_collocations_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.collocations import pmi_collocations

    docs = load_table(spark, sf_dir, "documents").select("text")
    return pmi_collocations(docs, "text", k=20, min_count=5)
