"""Streaming CDC apply: a change feed (upserts + deletes) maintained
against a partitioned parquet dataset, one atomic partition-pruned
merge per micro-batch.

``foreachBatch`` is the idiomatic Structured-Streaming bridge to a
batch sink Spark doesn't ship natively: each micro-batch arrives as a
plain DataFrame and is applied with ``io.merge.merge_changes`` — the
same validated anti-join + staged partition swap the batch path uses,
so streaming and batch maintenance CANNOT drift semantically (one code
path, two drivers).

Scale shape: per micro-batch cost is the merge's cost — delta-scale
validation aggregation, pruned read of only the partitions that batch
mentions, broadcast anti-join, rewrite of just those partitions. State
is the checkpoint's source offsets only; nothing accumulates in the
stream itself. Exactly-once caveat, stated rather than papered over:
``foreachBatch`` provides at-least-once delivery — a crash between the
partition swap and the offset commit replays the batch. The merge is
IDEMPOTENT for replays of the same batch (upserts overwrite to the
same values, deletes of absent ids are no-ops), which is the standard
contract for CDC apply onto a non-transactional table format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..io.merge import MergeReport, merge_changes


def apply_change_stream(
    changes_stream: DataFrame,
    base_path: str,
    *,
    id_col: str,
    partition_col: str,
    op_col: str = "op",
    seq_col: str | None = None,
    checkpoint_location: str,
    query_name: str = "cdc_apply",
    on_batch=None,
) -> StreamingQuery:
    """Start a stream that merges every micro-batch of the change feed
    into ``base_path``. ``on_batch`` (optional) receives
    ``(batch_id, MergeReport)`` after each applied batch — the audit
    hook a deployment wires to its metrics/lineage sink."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        report: MergeReport = merge_changes(
            batch_df.sparkSession,
            base_path,
            batch_df,
            id_col=id_col,
            partition_col=partition_col,
            op_col=op_col,
            seq_col=seq_col,
        )
        if on_batch is not None:
            on_batch(batch_id, report)

    return (
        changes_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_location)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
