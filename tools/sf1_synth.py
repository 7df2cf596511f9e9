#!/usr/bin/env python
"""Build the r12 sf1-equivalent SPOT-BENCH dataset (verdict item 6).

There is no driver-generated sf1 fixture (testdata is read-only,
TESTDATA.md), so the at-scale anchor uses a synthetic 10x scale-up of
sf0.1 built from KEY-SHIFTED replicas: replica i shifts every key
column by i * SHIFT (SHIFT > any base key), so the result is ten
disjoint copies with intact referential integrity — join cardinalities,
group sizes and support FRACTIONS scale exactly 10x, which is the
regime the structural claims are about. Document text gets a
per-replica token appended so the shingle/gram families do not see
ARTIFICIAL cross-replica exact duplicates (ten identical copies of
every doc would square the candidate-pair count instead of scaling it
linearly — a workload real 10x data does not present).

Measurement-only data: written under /tmp, never read by bench.py,
the oracle gates, or any registered query; results land in
BENCH_SF1_SPOT.json as the committed at-scale evidence.

Usage: python tools/sf1_synth.py [out_dir]   (default /tmp/sf1_synth)
"""

from __future__ import annotations

import os
import sys

import duckdb

SHIFT = 1_000_000_000  # > any base key (base keys are < 1e9)
REPLICAS = 10

KEY_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "part": ["p_partkey"],
    "documents": ["doc_id"],
    "customer": ["c_custkey"],  # c_nationkey unshifted (nation is 1x)
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
}

# Dimension tables copied 1x, unshifted — their keys (nation/region)
# are never replica-scoped above.
COPY_1X = ["nation", "region"]


def main() -> None:
    src = "/root/testdata/sf0.1"
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1_synth"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table, keys in KEY_COLS.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{table}.parquet'"
            ).fetchall()
        ]
        parts = []
        for i in range(REPLICAS):
            sel = []
            for c in cols:
                if c in keys:
                    sel.append(f"{c} + {i * SHIFT} AS {c}")
                elif table == "documents" and c == "text":
                    # distinct per replica: no cross-replica exact dups
                    sel.append(f"text || ' r{i}' AS text")
                elif table == "documents" and c == "n_chars":
                    sel.append(f"n_chars + {len(' r0')} AS n_chars")
                elif c in ("c_name", "s_name"):
                    # Names are key-derived ('Customer#%09d') in the base
                    # fixture; regenerate them per replica so a 10x corpus
                    # has 10x DISTINCT names — leaving them duplicated 10x
                    # squares every name-blocked self-join (the first
                    # sweep flagged fuzzy_name_match at 34x purely from
                    # this artifact). The name keeps the EXACT 18-char
                    # '%09d' layout of the base fixture (replica encoded
                    # in the leading digits via a small offset, not the
                    # 1e9 key shift): the fuzzy-match deletion-blocking
                    # passes slice fixed character positions, so a wider
                    # digit field would turn bounded blocks into
                    # 100k-name blocks — a construction artifact, not a
                    # workload 10x real data presents.
                    prefix = "Customer" if c == "c_name" else "Supplier"
                    key = keys[0]
                    sel.append(
                        f"'{prefix}#' || lpad(CAST({key} + {i * 10_000_000} "
                        f"AS VARCHAR), 9, '0') AS {c}"
                    )
                elif table == "embeddings" and c == "embedding":
                    # Rotate coordinates by the replica index: preserves
                    # norms and all WITHIN-replica geometry exactly while
                    # decorrelating replicas — otherwise every vector has
                    # nine exact twins (cosine 1.0) and every LSH bucket
                    # carries 10x co-located members, turning the
                    # near-dup candidate count quadratic in the
                    # duplication factor (a construction artifact real
                    # 10x data does not present).
                    if i == 0:
                        sel.append("embedding")
                    else:
                        sel.append(
                            f"list_concat(embedding[{i + 1}:], "
                            f"embedding[1:{i}]) AS embedding"
                        )
                else:
                    sel.append(c)
            parts.append(
                f"SELECT {', '.join(sel)} FROM '{src}/{table}.parquet'"
            )
        q = " UNION ALL ".join(parts)
        con.execute(
            f"COPY ({q}) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{table}.parquet'"
        ).fetchone()[0]
        print(f"{table}: {n} rows -> {out}/{table}.parquet", flush=True)
    for table in COPY_1X:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{table}.parquet') TO "
            f"'{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        print(f"{table}: copied 1x (dimension)", flush=True)


if __name__ == "__main__":
    main()
