"""explore_traversal / score_discoveries vs a naive path-enumerating BFS.

The naive reference enumerates ALL paths up to `hops` over the undirected
typed graph (the reference's `MATCH path = (start)-[*1..h]-(d)`,
recommend_queries.py:421-442) and reduces to (min dist, lex-min path) per
node — no Spark, no shared code.
"""

from __future__ import annotations

import random

import pytest

from discogsography_spark.operators.graph import (
    explore_traversal,
    score_discoveries,
)


def _naive_explore(edges, start, hops, keep_types):
    """edges: [(src, src_type, dst, dst_type, rel)]."""
    und = []
    types = {}
    for s, st, d, dt, r in edges:
        und.append((s, d, r))
        und.append((d, s, r))
        types[s] = st
        types[d] = dt
    paths = [(start, 0, start)]
    found = {}
    for _ in range(hops):
        nxt = []
        for node, dist, path in paths:
            for s, d, r in und:
                if s != node or d == start:
                    continue
                p2 = f"{path}—{r}→{d}"
                nxt.append((d, dist + 1, p2))
                key = (d, types[d])
                cur = found.get(key)
                cand = (dist + 1, p2)
                if cur is None or cand < cur:
                    found[key] = cand
        paths = nxt
    out = [
        (i, t, d, p)
        for (i, t), (d, p) in found.items()
        if (not keep_types or t in keep_types)
    ]
    return sorted(out)


def _rand_graph(rng):
    edges = []
    for i in range(12):
        edges.append((f"c{i}", "customer", f"p{rng.randint(0, 7)}", "part", "ORDERED"))
    for i in range(8):
        edges.append((f"s{i % 4}", "supplier", f"p{i}", "part", "SUPPLIES"))
    for i in range(8):
        edges.append((f"p{i}", "part", f"b{i % 3}", "brand", "IS"))
    return list(dict.fromkeys(edges))


@pytest.mark.parametrize("seed,hops", [(0, 1), (0, 2), (5, 2), (9, 3)])
def test_explore_traversal_matches_naive(spark, seed, hops):
    rng = random.Random(seed)
    edges = _rand_graph(rng)
    df = spark.createDataFrame(
        edges, "src string, src_type string, dst string, dst_type string, rel string"
    )
    keep = ["supplier", "brand", "customer"]
    got = sorted(
        (r["id"], r["type"], r["dist"], r["path"])
        for r in explore_traversal(df, "c1", hops=hops, keep_types=keep).collect()
    )
    assert got == _naive_explore(edges, "c1", hops, keep)


def test_score_discoveries_rules(spark):
    disc = spark.createDataFrame(
        [
            ("b1", "brand", 2, "c1—ORDERED→p1—IS→b1"),   # taste brand
            ("b9", "brand", 2, "c1—ORDERED→p2—IS→b9"),   # blind-spot brand
            ("n:X", "nation", 1, "c1—FROM→n:X"),          # known nation
            ("n:Y", "nation", 2, "c1—…→n:Y"),             # blind-spot nation
            ("s1", "supplier", 2, "c1—ORDERED→p1—SUPPLIES→s1"),
            ("c2", "customer", 2, "c1—ORDERED→p1—ORDERED→c2"),
        ],
        "id string, type string, dist int, path string",
    )
    taste = spark.createDataFrame([("b1", 0.25)], "value string, share double")
    bs = spark.createDataFrame([("b9",), ("n:Y",)], "value string")
    got = {
        r["id"]: (r["score"], r["reason"])
        for r in score_discoveries(disc, taste, bs, k=10).collect()
    }
    assert got["b1"] == (0.25, "graph_proximity")
    assert got["b9"] == (1.5, "blind_spot_boost")   # 1.0 * 1.5 boost
    assert got["n:X"] == (0.0, "graph_proximity")
    assert got["n:Y"] == (1.5, "blind_spot_boost")
    assert got["s1"] == (0.5, "graph_proximity")    # 1/dist
    assert got["c2"] == (0.5, "graph_proximity")


def test_explore_plan_broadcasts_frontier(spark):
    edges = _rand_graph(random.Random(1))
    df = spark.createDataFrame(
        edges, "src string, src_type string, dst string, dst_type string, rel string"
    )
    out = explore_traversal(df, "c1", hops=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
