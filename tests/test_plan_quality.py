"""Physical-plan regression tests: the scale properties SURVEY §4 and
the 100-TB design rules promise (pushdown, pruning, broadcast joins,
top-k as TakeOrderedAndProject, partial aggregation, no cartesian
products) are asserted on the actual executed plan, so a refactor that
silently loses one fails here — not at cluster scale.
"""

from __future__ import annotations

import contextlib
import io

from proyecto_final_de_big_data_spark.queries import QUERIES


def _plan(spark, sf_dir, name: str, mode: str = "formatted") -> str:
    df = QUERIES[name].spark_fn(spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_topk_compiles_to_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "top_suppliers")
    assert "TakeOrderedAndProject" in plan  # no materialized global sort


def test_dim_decode_is_broadcast_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "customer_region_decode")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # dims must not shuffle the fact side


def test_exact_jaccard_has_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "ngram_jaccard_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_grand_agg_is_partial_plus_final(spark, sf_dir):
    plan = _plan(spark, sf_dir, "kpis")
    assert plan.count("HashAggregate") >= 2  # map-side combine before the shuffle


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "knn_bruteforce")
    assert "PushedFilters: [" in plan
    assert "vec_id" in plan.split("PushedFilters")[1][:200]


def test_column_pruning_reaches_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pricing_summary")
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema, "no ReadSchema in formatted plan"
    # pricing summary never touches join keys — the scan must not read them
    assert "l_orderkey" not in read_schema[0]
    assert "l_partkey" not in read_schema[0]


def test_whole_stage_codegen_active(spark, sf_dir):
    # AQE only finalizes the physical plan on execution; the "*(n)"
    # prefix in the executed plan marks whole-stage-codegen'd stages.
    df = QUERIES["quantity_bins"].spark_fn(spark, sf_dir)
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in executed
    assert "*(" in executed  # when-chain binning stays JVM-side
