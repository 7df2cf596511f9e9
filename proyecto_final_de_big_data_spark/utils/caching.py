"""Cache-lifetime discipline for multi-reference subplans.

Operators that reference an expensive subframe more than once (LSH
self-joins, pair-table fan-outs) persist it; left pinned, those frames
accumulate across a long-lived session (the 68-query bench leaked three
of them per round-2 profiling). The contract here: an operator that
persists an intermediate must either hand the caller the persisted frame
(caller owns the lifetime) or materialize its — small — final output and
release the intermediates before returning.

``materialize_and_release`` implements the second path: an eager
``localCheckpoint`` computes the result once and cuts its lineage, so
the persisted parents are genuinely unreferenced and can be unpersisted
immediately instead of at session end. The checkpointed partitions live
on executors (still distributed — nothing is collected to the driver)
and are freed when the result frame is garbage collected.

Use only for results that are small relative to their inputs (verified
near-dup pairs, recall scalars) — exactly the frames these operators
return.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize_and_release(result: DataFrame, *intermediates: DataFrame) -> DataFrame:
    """Eagerly compute ``result`` (localCheckpoint: executes the plan,
    cuts lineage), then unpersist every frame in ``intermediates``.
    Intermediates are released even when the computation fails.

    Fault-tolerance caveat: ``localCheckpoint`` blocks are executor-local
    and NOT fault-tolerant — with the lineage truncated, losing an
    executor makes the result unrecoverable and fails the job. Fine in
    local mode and for ephemeral query results; on a real cluster prefer
    reliable ``checkpoint()`` to a durable ``checkpointDir`` (or write
    the — small — result to a table) when the frame must survive
    executor loss."""
    try:
        return result.localCheckpoint(eager=True)
    finally:
        for df in intermediates:
            # blocking: the release is observable immediately (tests and
            # long-lived sessions can rely on the cache being gone, not
            # merely scheduled for removal).
            df.unpersist(blocking=True)
