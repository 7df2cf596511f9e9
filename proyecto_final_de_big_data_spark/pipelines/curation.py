"""Document-curation pipeline: the training-data analogue of the
trips ETL (``pipelines/etl.py``) — compose the curation operators into
one configured pass: PII redaction → quality/repetition filtering →
dedup (exact or incremental vs an ingested corpus) → temperature
mixing → deterministic split.

Stage order is load-bearing for scale: the projection-only stages
(PII regexes, repetition signals, quality score — all fused into the
scan) run FIRST so the shuffling stages (dedup digest groupBy) see the
already-shrunk corpus; mixing and split are again pure projections on
the survivors.

Every stage is individually oracle-gated by its own registry query
(pii_redaction_profile, repetition_profile, dedup_exact_*,
incremental_dedup_profile, temperature_mix_profile,
doc_hash_split_profile); this module only composes them.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import exact_dedup, incremental_dedup
from ..operators.mixing import temperature_mix
from ..operators.pii import redact_pii
from ..operators.quality import with_repetition_stats
from ..operators.split import hash_split
from ..operators.text import quality_score


@dataclass
class CurationConfig:
    id_col: str = "doc_id"
    text_col: str = "text"
    redact_pii: bool = True
    min_quality: float | None = None  # drop docs scoring below (0..1)
    drop_repetitive: bool = False
    dedup: str = "exact"  # "exact" | "incremental" | "none"
    mix_stratum_col: str | None = None
    mix_alpha: float = 0.5
    split_fractions: dict[str, float] | None = field(
        default_factory=lambda: {"train": 0.9, "eval": 0.1}
    )


def curate_documents(
    df: DataFrame,
    cfg: CurationConfig,
    historical: DataFrame | None = None,
) -> DataFrame:
    """Run the configured curation pass; returns the curated frame
    (with ``split`` column when ``split_fractions`` is set).

    ``historical`` is required when ``cfg.dedup == "incremental"`` —
    the already-ingested corpus the new batch is deduped against.
    """
    out = df
    if cfg.redact_pii:
        out = out.withColumn(cfg.text_col, redact_pii(cfg.text_col))
    if cfg.min_quality is not None:
        out = out.filter(quality_score(cfg.text_col) >= cfg.min_quality)
    if cfg.drop_repetitive:
        out = with_repetition_stats(out, cfg.text_col).filter(~F.col("repetitive"))
        out = out.drop("distinct_word_ratio", "distinct_bigram_ratio", "repetitive")
    # Cache-lifetime discipline (utils/caching.py contract): dedup's
    # digest-groupBy + semi-join-back and mixing's rates + keep-filter
    # each reference their input TWICE. Un-persisted, that re-runs the
    # regex/HOF projection chain above once per reference; persist the
    # filtered corpus across the multi-reference stages and release it
    # before returning. At cluster scale this spills MEMORY_AND_DISK —
    # the same stage-materialization a production pipeline gets by
    # writing the filtered corpus before dedup.
    staged = None
    if cfg.dedup != "none" or cfg.mix_stratum_col is not None:
        from pyspark import StorageLevel

        out = staged = out.persist(StorageLevel.MEMORY_AND_DISK)
    if cfg.dedup == "exact":
        out = exact_dedup(out, [cfg.text_col], cfg.id_col)
    elif cfg.dedup == "incremental":
        if historical is None:
            raise ValueError("dedup='incremental' requires a historical frame")
        out = incremental_dedup(out, historical, [cfg.text_col], cfg.id_col)
    elif cfg.dedup != "none":
        raise ValueError(f"unknown dedup mode {cfg.dedup!r}")
    if cfg.mix_stratum_col is not None:
        out = temperature_mix(
            out, cfg.mix_stratum_col, cfg.id_col, alpha=cfg.mix_alpha
        ).drop("n_docs", "scaled_rate")
    if cfg.split_fractions:
        out = hash_split(out, cfg.id_col, cfg.split_fractions)
    if staged is not None:
        from ..utils.caching import materialize_and_release

        # Eagerly compute the curated frame and release the staged
        # cache (localCheckpoint: executor-local, see caching.py for
        # the fault-tolerance caveat — at cluster scale write the
        # curated corpus to its sink instead of holding it).
        out = materialize_and_release(out, staged)
    return out


def write_curated_documents(df: DataFrame, root: str) -> None:
    """Partitioned-by-split parquet sink (plain parquet when no split
    column — e.g. ``split_fractions=None``)."""
    writer = df.write.mode("overwrite")
    if "split" in df.columns:
        writer = writer.partitionBy("split")
    writer.parquet(root)
