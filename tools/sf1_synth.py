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
}


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


if __name__ == "__main__":
    main()
