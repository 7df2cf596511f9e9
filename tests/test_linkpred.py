"""Adamic-Adar link prediction (operators/graph.py:adamic_adar_topk).

Hand-worked fixture (mandatory discipline), undirected edges
{1-2, 1-3, 2-3, 3-4, 1-5, 4-5}:

  degrees: 1:3, 2:2, 3:3, 4:2, 5:2
  non-edge wedge pairs (u < w):
    (1,4): common {3, 5} -> aa = 1/ln3 + 1/ln2 = 2.352934...
    (3,5): common {1, 4} -> aa = 1/ln3 + 1/ln2   (exact tie with (1,4))
    (2,4): common {3}    -> aa = 1/ln3 = 0.910239...
    (2,5): common {1}    -> aa = 1/ln3            (tie with (2,4))
  ranking (aa desc, u asc, w asc):
    (1,4) #1, (3,5) #2, (2,4) #3, (2,5) #4.

With max_degree=2 the two degree-3 centers (1 and 3) stop producing
wedges: (1,4) and (3,5) each keep ONE common neighbor (5 resp. 4),
aa = 1/ln2, and (2,4)/(2,5) vanish entirely.
"""

from __future__ import annotations

import itertools
import math
import random

import pytest

from proyecto_final_de_big_data_spark.operators.graph import adamic_adar_topk

INV_LN2 = 1.0 / math.log(2.0)
INV_LN3 = 1.0 / math.log(3.0)


def _edges(spark):
    rows = [(1, 2), (1, 3), (2, 3), (3, 4), (1, 5), (4, 5),
            # noise: reversed duplicate, exact duplicate, self-loop
            (2, 1), (3, 4), (5, 5)]
    return spark.createDataFrame(rows, "src long, dst long")


def test_hand_worked_fixture(spark):
    rows = adamic_adar_topk(_edges(spark), k=10).collect()
    got = [(r["u"], r["w"], r["rank"], r["common"]) for r in rows]
    assert got == [(1, 4, 1, 2), (3, 5, 2, 2), (2, 4, 3, 1), (2, 5, 4, 1)]
    by_pair = {(r["u"], r["w"]): r for r in rows}
    assert by_pair[(1, 4)]["aa_score"] == round(INV_LN3 + INV_LN2, 6)
    assert by_pair[(3, 5)]["aa_score"] == by_pair[(1, 4)]["aa_score"]
    assert by_pair[(2, 4)]["aa_score"] == round(INV_LN3, 6)
    assert by_pair[(1, 4)]["ra_score"] == round(1.0 / 3.0 + 1.0 / 2.0, 6)
    assert by_pair[(2, 5)]["ra_score"] == round(1.0 / 3.0, 6)


def test_max_degree_cap(spark):
    rows = adamic_adar_topk(_edges(spark), k=10, max_degree=2).collect()
    got = [(r["u"], r["w"], r["common"], r["aa_score"]) for r in rows]
    assert got == [
        (1, 4, 1, round(INV_LN2, 6)),
        (3, 5, 1, round(INV_LN2, 6)),
    ]


def test_k_limits_output(spark):
    rows = adamic_adar_topk(_edges(spark), k=2).collect()
    assert [(r["u"], r["w"], r["rank"]) for r in rows] == [(1, 4, 1), (3, 5, 2)]


def test_existing_edges_never_predicted(spark):
    rows = adamic_adar_topk(_edges(spark), k=100).collect()
    edge_set = {(1, 2), (1, 3), (2, 3), (3, 4), (1, 5), (4, 5)}
    assert not edge_set & {(r["u"], r["w"]) for r in rows}


def test_python_brute_force_twin(spark):
    rng = random.Random(31)
    nodes = list(range(40))
    raw = {
        tuple(sorted(rng.sample(nodes, 2)))
        for _ in range(120)
    }
    df = spark.createDataFrame(sorted(raw), "src int, dst int")
    got = adamic_adar_topk(df, k=1000).collect()

    nbrs: dict[int, set[int]] = {n: set() for n in nodes}
    for a, b in raw:
        nbrs[a].add(b)
        nbrs[b].add(a)
    twin = {}
    for x, y in itertools.combinations(nodes, 2):
        if (x, y) in raw:
            continue
        common = nbrs[x] & nbrs[y]
        if common:
            twin[(x, y)] = (
                len(common),
                round(sum(1.0 / math.log(len(nbrs[c])) for c in common), 6),
                round(sum(1.0 / len(nbrs[c]) for c in common), 6),
            )
    assert {(r["u"], r["w"]): (r["common"], r["aa_score"], r["ra_score"])
            for r in got} == twin
    # ranking replays: rounded score desc, then (u, w) asc
    order = sorted(twin.items(), key=lambda kv: (-kv[1][1], kv[0]))
    assert [(r["u"], r["w"]) for r in got] == [p for p, _ in order]


def test_bad_params_raise(spark):
    with pytest.raises(ValueError, match="k >= 1"):
        adamic_adar_topk(_edges(spark), k=0)
    with pytest.raises(ValueError, match="max_degree"):
        adamic_adar_topk(_edges(spark), max_degree=1)
