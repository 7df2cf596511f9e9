"""Johnson–Lindenstrauss random projection for embedding columns —
dimensionality reduction with a distance-distortion guarantee
(Johnson & Lindenstrauss 1984; the ±1 "database-friendly" projection
follows Achlioptas, JCSS 2003 — public literature). The standard
pre-ANN shrink: project ``dim``-d vectors onto ``k`` signed random
directions, ``proj_j = (Σ_i sign(j,i)·v_i) / sqrt(k)``, preserving
pairwise Euclidean distances within (1±ε) w.h.p. for
k = O(log n / ε²).

The sign matrix is NOT random at run time: ``sign(j, i)`` derives
from the repo's portable md5 fold of ``"jl:<j>:<i>"`` (the
:mod:`.mixing` convention), so the projection is reproducible across
engines and sessions — a SQL oracle regrows the identical matrix from
the same hash, and re-running a 100 TB job after a failure projects
onto the same axes. The matrix is k×dim literals (KB-scale) embedded
in the plan; no driver state, no broadcast variable.

Scale shape (100 TB): the projection is a map-only higher-order-
function fold per vector — zip_with multiply + one fixed-order sum
per output dimension, all inside the scan stage; no shuffle, no
Python, no UDF. The distance audit is the only quadratic piece and
is explicitly sample-bounded (``max_ids`` — audit a pair sample, not
the corpus).

Extension surface — the reference has no embedding stage; extension
per SURVEY §8 next to the SQ8/PQ quantizers (JL shrinks dimensions,
quantizers shrink bytes per dimension; they compose).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def jl_sign(j: int, i: int, salt: str = "jl") -> float:
    """±1.0 from the md5 fold of ``"<salt>:<j>:<i>"`` — the Python twin
    of the SQL restatement ``('0x' || substr(md5(...), 1, 15))::BIGINT
    % 2`` (even → +1, odd → −1)."""
    h = hashlib.md5(f"{salt}:{j}:{i}".encode()).hexdigest()
    return 1.0 if int(h[:15], 16) % 2 == 0 else -1.0


def jl_sign_matrix(
    k: int, dim: int, salt: str = "jl", max_literals: int = 100_000
) -> list[list[float]]:
    """The deterministic k×dim ±1 matrix (row j = output dimension).

    ``max_literals`` bounds ``k*dim`` — the matrix is embedded in the
    plan as literals, and an unguarded dim=4096 × k=256 call would
    compile a million-literal plan (driver/codegen hazard; the same
    class the hyptest distinct-grid guard bounds). Raise the bound
    explicitly if you accept the plan-size cost."""
    if k < 1 or dim < 1:
        raise ValueError(f"need k >= 1 and dim >= 1, got k={k} dim={dim}")
    if k * dim > max_literals:
        raise ValueError(
            f"jl_sign_matrix: k*dim = {k}*{dim} = {k * dim} exceeds "
            f"max_literals={max_literals}; the sign matrix is embedded "
            f"in the plan as literals and a matrix this large risks "
            f"driver/codegen blow-up — reduce k, pre-shrink dim, or "
            f"pass a larger max_literals deliberately"
        )
    return [[jl_sign(j, i, salt) for i in range(dim)] for j in range(k)]


def jl_project(
    df: DataFrame,
    vec_col: str,
    dim: int,
    k: int,
    out_col: str = "proj",
    salt: str = "jl",
    max_literals: int = 100_000,
) -> DataFrame:
    """Append ``out_col``: the k-d projection ``(Σ_i sign(j,i)·v_i) /
    sqrt(k)`` of the ``dim``-d ``vec_col``. Elements cast to double
    (float→double is exact); the per-dimension sum is a LEFT fold in
    index order, so a SQL oracle replaying the same fold matches
    bit-for-bit. Prefer powers of four for ``k`` (1/sqrt(k) is then
    exact binary; k=16 → 0.25). ``max_literals`` bounds the embedded
    k×dim sign matrix (see :func:`jl_sign_matrix`)."""
    mat = jl_sign_matrix(k, dim, salt, max_literals=max_literals)
    inv = 1.0 / (k ** 0.5)
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    def _row(j: int) -> Column:
        row = F.array(*[F.lit(s) for s in mat[j]])
        return (
            F.aggregate(
                F.zip_with(v, row, lambda x, s: x * s),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            * F.lit(inv)
        )

    # Hard-fail on a dimension mismatch: zip_with pads the shorter
    # array with NULLs, so a ragged or mis-declared vec_col would
    # otherwise project to all-NULL silently (the series.py
    # raise_error posture).
    proj = F.array(*[_row(j) for j in range(k)])
    return df.withColumn(
        out_col,
        F.when(F.size(F.col(vec_col)) == dim, proj).otherwise(
            F.raise_error(
                F.format_string(
                    "jl_project: vector length %s != declared dim %d",
                    F.size(F.col(vec_col)).cast("string"),
                    F.lit(dim),
                )
            )
        ),
    )


def _sq_dist(a: Column, b: Column) -> Column:
    """Fixed-order Σ(a_i − b_i)² fold (shared by audit and oracle)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def jl_distance_audit(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    k: int,
    max_ids: int = 64,
    salt: str = "jl",
    decimals: int = 6,
    max_literals: int = 100_000,
) -> DataFrame:
    """Pairwise distance-preservation readout over a BOUNDED id sample:
    ``(id_a, id_b, d2_orig, d2_proj, ratio)`` for every pair among the
    ``max_ids`` smallest ids (deterministic sample; the audit is the
    only O(sample²) piece, and the bound makes that explicit). ``ratio
    = d2_proj / d2_orig`` (NULL for identical vectors) is the JL
    distortion — within (1±ε) for all but an exp(−k·ε²/8) fraction."""
    if max_ids < 2:
        raise ValueError(f"max_ids must be >= 2, got {max_ids}")
    sample = df.orderBy(F.col(id_col).asc()).limit(max_ids)
    proj = jl_project(
        sample, vec_col, dim, k, "__p", salt, max_literals=max_literals
    )
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    left = proj.select(
        F.col(id_col).alias("id_a"),
        v.alias("__va"),
        F.col("__p").alias("__pa"),
    )
    right = proj.select(
        F.col(id_col).alias("id_b"),
        v.alias("__vb"),
        F.col("__p").alias("__pb"),
    )
    pairs = left.join(right, F.col("id_a") < F.col("id_b"))
    d2o = _sq_dist(F.col("__va"), F.col("__vb"))
    d2p = _sq_dist(F.col("__pa"), F.col("__pb"))
    return pairs.select(
        "id_a",
        "id_b",
        F.round(d2o, decimals).alias("d2_orig"),
        F.round(d2p, decimals).alias("d2_proj"),
        F.round(F.when(d2o > 0, d2p / d2o), decimals).alias("ratio"),
    )
