"""Custom batch source via the Python Data Source API (Spark 4,
``pyspark.sql.datasource``) — the idiomatic extension point when a
format isn't parquet/CSV/JSON/ORC and the reader logic lives in Python.

The example source (``synthetic_corpus``) generates a deterministic
document-metadata corpus, which is genuinely useful here (seeded test
fixtures without shipping files), but the POINT is the scaffolding a
100-TB custom source needs and this one models:

- **Partition planning**: ``partitions()`` returns one
  ``InputPartition`` per shard, so Spark schedules shards across
  executors — a custom source that returns a single partition serializes
  the whole read through one task no matter the cluster size.
- **Filter pushdown** (``pushFilters``, 4.1): equality/range/IN
  predicates on the ``shard`` column PRUNE partitions before they are
  planned — the custom-source analog of parquet partition pruning. The
  generator never runs for pruned shards; unsupported filters are
  handed back to Spark for post-scan evaluation.
- **Determinism without RNG state**: every row derives from
  ``blake2b(seed, global_row_id)`` — same rows for any partitioning,
  any executor count, any retry (a task retry MUST reproduce its
  partition exactly, or speculative execution corrupts results).

Registered per-session via :func:`register_synthetic_corpus`; options:
``shards`` (default 4), ``rows_per_shard`` (default 1000), ``seed``
(default 0).

**One relation = one planned scan (Spark 4.1 sharing hazard).** Spark
plans a Python data source relation once — the pushdown worker creates
a fresh reader, applies ``pushFilters``, and returns the partition list
for THAT filter set, and the resulting scan is then shared by every
branch of the query that references the same ``.load()`` DataFrame.
If one branch is filtered on ``shard`` and another is not, both end up
reading the pruned partition list (observed: a full-read aggregate
returning the pruned totals). Reader-side state is NOT the cause (each
planning worker unpickles its own DataSource and builds a new reader);
the sharing happens JVM-side at the relation level. Rule: **create a
fresh ``.load()`` relation per differently-filtered branch** — use
:func:`load_synthetic_corpus` which does exactly that. Regression
coverage: ``tests/test_pydatasource.py``
(``test_mixed_filtered_and_full_branches_in_one_plan``).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

SCHEMA = (
    "doc_id long, shard int, lang string, n_tokens int, score_milli int"
)

_LANGS = ("en", "es", "fr", "de")


def _row(seed: int, gid: int) -> tuple:
    h = int.from_bytes(
        hashlib.blake2b(f"{seed}:{gid}".encode(), digest_size=8).digest(), "big"
    )
    return (
        gid,
        None,  # shard filled by caller
        _LANGS[h % 4],
        32 + (h >> 8) % 993,
        (h >> 20) % 10_000,
    )


class SyntheticCorpusReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self._shards = int(options.get("shards", 4))
        self._rows_per_shard = int(options.get("rows_per_shard", 1000))
        self._seed = int(options.get("seed", 0))
        self._keep: set[int] | None = None  # None = no pruning

    # -- pushdown ------------------------------------------------------
    def pushFilters(self, filters: list[Filter]) -> Iterable[Filter]:
        """Consume shard-pruning predicates; return the rest to Spark.

        Only filters that shrink the shard set are claimed — everything
        else (including anything on other columns) is returned so Spark
        evaluates it post-scan. Claimed filters are re-checked against
        each shard id; contradictory combinations prune to zero
        partitions, the correct empty-scan plan."""
        keep = set(range(self._shards))
        unsupported = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("shard",):
                keep &= {int(f.value)}
            elif isinstance(f, In) and f.attribute == ("shard",):
                keep &= {int(v) for v in f.value}
            elif isinstance(f, GreaterThan) and f.attribute == ("shard",):
                keep = {s for s in keep if s > int(f.value)}
            elif isinstance(f, GreaterThanOrEqual) and f.attribute == ("shard",):
                keep = {s for s in keep if s >= int(f.value)}
            elif isinstance(f, LessThan) and f.attribute == ("shard",):
                keep = {s for s in keep if s < int(f.value)}
            elif isinstance(f, LessThanOrEqual) and f.attribute == ("shard",):
                keep = {s for s in keep if s <= int(f.value)}
            else:
                unsupported.append(f)
        self._keep = keep
        return unsupported

    # -- planning ------------------------------------------------------
    def partitions(self) -> Sequence[InputPartition]:
        shards = sorted(self._keep) if self._keep is not None else range(
            self._shards
        )
        return [InputPartition(s) for s in shards]

    # -- execution (runs on executors) ---------------------------------
    def read(self, partition: InputPartition) -> Iterator[tuple]:
        shard = int(partition.value)
        base = shard * self._rows_per_shard
        for i in range(self._rows_per_shard):
            gid = base + i
            row = _row(self._seed, gid)
            yield (row[0], shard, row[2], row[3], row[4])


class SyntheticCorpusDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "synthetic_corpus"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> SyntheticCorpusReader:
        return SyntheticCorpusReader(self.options)


def register_synthetic_corpus(spark) -> None:
    """Idempotent per-session registration of the ``synthetic_corpus``
    format (re-registering overwrites, which is fine — the class is
    stateless). Python-source filter pushdown is opt-in
    (``spark.sql.python.filterPushdown.enabled``, default false, and a
    reader that implements ``pushFilters`` HARD-FAILS without it rather
    than silently skipping pruning) — enabled here so registration is
    sufficient for pruned reads.

    Side effect: the pushdown conf is session-wide and is left enabled
    (reads are lazy, so a set/restore window around registration would
    not cover planning time). Any other Python data source used later
    in the same session will also plan with pushdown enabled; a reader
    without ``pushFilters`` is unaffected (the base class just returns
    the filters)."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticCorpusDataSource)


def load_synthetic_corpus(
    spark, *, shards: int = 4, rows_per_shard: int = 1000, seed: int = 0
):
    """Return a FRESH ``synthetic_corpus`` relation.

    Always call this once per differently-filtered branch of a query:
    Spark plans a Python data source relation once and shares the
    planned scan (including its pruned partition list) across every
    reference to the same DataFrame, so mixing a shard-filtered branch
    and a full-read branch of ONE relation silently gives both the
    pruned scan (see module docstring)."""
    register_synthetic_corpus(spark)
    return (
        spark.read.format("synthetic_corpus")
        .option("shards", shards)
        .option("rows_per_shard", rows_per_shard)
        .option("seed", seed)
        .load()
    )
