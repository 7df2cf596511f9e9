"""Sort-for-data-skipping parquet writes.

Parquet scans prune at two granularities: partition directories (handled
by ``partitionBy``/partition pruning) and ROW GROUPS, via each group's
min/max column statistics. Stats only help if they're narrow: a table
written in arrival order has every row group spanning nearly the full
key domain, so a selective filter still reads everything. Writing
range-partitioned and sorted-within-partitions makes row-group ranges
narrow and (across files) non-overlapping on the sort key — the
single-key analogue of Z-ordering — after which a pushed-down range or
point predicate skips the vast majority of groups at scan time.

Cost model: ONE range exchange (Spark samples the key distribution to
pick balanced bounds) plus a per-partition sort that spills gracefully.
That's the same price as any global sort — paid once at write time,
amortized over every selective read. The complement of
``io/compact.py``: compaction fixes file COUNT, this fixes file
CONTENT layout; a maintenance rewrite typically wants both
(``n_files`` caps the range partitions, giving compacted AND sorted
output in the same single shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_sorted(
    df: DataFrame,
    path: str,
    sort_cols: list[str] | str,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet range-partitioned and sorted on
    ``sort_cols`` so row-group min/max stats support aggressive scan
    pruning. ``n_files`` fixes the number of range partitions (= output
    files); default lets ``spark.sql.shuffle.partitions`` decide."""
    cols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
    if not cols:
        raise ValueError("sort_cols must name at least one column")
    ranged = (
        df.repartitionByRange(n_files, *cols)
        if n_files is not None
        else df.repartitionByRange(*cols)
    )
    ranged.sortWithinPartitions(*cols).write.mode(mode).parquet(path)
