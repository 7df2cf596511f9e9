"""Registry invariants: the external harness verifies only the FIRST 50
registered queries, so registration order is part of the verification
contract — these tests pin it against accidental drift (round 2 lost 18
queries from the gate to silent insertion order)."""

from __future__ import annotations

from proyecto_final_de_big_data_spark.queries import QUERIES, _VERIFICATION_WINDOW

# Queries whose results are not portably SQL-expressible; the harness
# runs a weaker rows-only check for these, documented per query.
EXPECTED_ROWS_ONLY = {
    "minhash_near_dup_pairs",
    "simhash_near_dup",
    "embedding_near_dup",
    "knn_ann_ivf",
    "ml_train_metrics",
    "ml_score_profile",
}


def test_first_50_match_declared_window():
    assert list(QUERIES)[:50] == _VERIFICATION_WINDOW
    assert len(_VERIFICATION_WINDOW) == 50


def test_every_query_has_oracle_or_documented_rows_only():
    for name, q in QUERIES.items():
        if name in EXPECTED_ROWS_ONLY:
            assert q.oracle is None, f"{name} gained an oracle; update EXPECTED_ROWS_ONLY"
        else:
            assert q.oracle is not None, (
                f"{name} has no oracle and is not in the documented rows-only set"
            )


def test_window_covers_every_family():
    window = set(_VERIFICATION_WINDOW)
    # One representative per family must sit inside the checked window.
    for probe in [
        # kpis rotated out after r1-r4 green on unchanged code; the
        # grouped clip profile carries a superset of its agg surface.
        "grouped_outlier_clip_profile",  # marts + per-group quantile fence
        "interpolated_user_series",  # time-series gap imputation
        # revenue_by_nation rotated out after r2+r4 green on unchanged
        # relational.py; the join surface keeps CUBE, snapshot diff's
        # full-outer join, and the bucketed co-located join in-window.
        "text_normalize_profile",    # Unicode normalization parity
        "snapshot_diff_profile",     # dataset-versioning audit
        "cube_returnflag_status",    # grouping sets (ROLLUP twin rotated out)
        "near_dup_clusters",         # dedup (pairs -> components)
        "cluster_keep_best_profile",  # quality-aware keep-best dedup
        "source_cap_profile",        # per-domain contribution cap
        "incremental_dedup_profile",  # batch-vs-corpus incremental dedup
        "temperature_mix_profile",   # temperature-scaled stratum mixing
        "curate_documents_contract",  # composed curation pipeline
        "boilerplate_removal_profile",  # sub-document boilerplate pruning
        "pack_chunks_profile",       # sequence packing
        "decontamination_profile",   # benchmark decontamination
        "stratified_sample_profile", # deterministic quota sampling
        "minhash_recall",            # approximate-dedup contracts
        # media_frame_sample rotated out after r2+r4 green on unchanged
        # multimodal.py; media_binary_ingest keeps multimodal in-window.
        "stream_cdc_apply_round_trip",  # streaming incremental maintenance
        "knn_ann_ivf_recall",        # similarity search
        "tumbling_stream_parity",    # streaming windows (batch twins rotated
                                     # out; parity pair gates the semantics)
        "stream_pii_curation_round_trip",  # streaming text curation
        "stream_dedup_counts",       # real-stream mode (dedup/join/sink)
        "stateful_user_profiles_stream",  # custom stateful streaming
        "ml_train_metrics",          # ML loop
        "ml_feature_matrix_contract",     # ML feature hash gate
        # canonicalize_contract (the sole P1-P4 gate) rotated out after
        # r2-r4 green on unchanged code — the same retire-after-
        # multi-green policy the set-op family followed.
        "export_round_trip_orc",     # export/sources (CSV/JSON/partitioned
                                     # twins rotated out after multi-green;
                                     # cdc_merge exercises partitioned writes)
        "cdc_merge_contract",        # partition-pruned CDC merge
        "session_stream_parity",     # real-stream session windows
        "media_binary_ingest",       # raw-file multimodal ingestion
        "pii_redaction_profile",     # PII redaction
        "repetition_profile",        # repetition/quality signals
        "tfidf_top_terms",           # term scoring
        "embedding_kmeans_contract",  # unsupervised clustering
        "text_quality_classifier_contract",  # model-based quality filter
        "semantic_dedup_profile",    # SemDeDup cluster-then-prune
        "lm_quality_by_lang",        # corpus-fit LM scoring
        "rolling_user_zscore",       # RANGE-frame rolling baseline
        "hourly_counts_gapfilled",   # dense time grid
        "manifest_ingest_contract",  # ingest manifest (S1-S3)
        "quarter_resolution_contract",    # F10/C3 month resolution
        "bucketed_colocated_join",   # bucketed storage
        "salted_event_type_stats",   # skew mitigation
    ]:
        assert probe in window, f"family representative {probe} fell out of the window"
