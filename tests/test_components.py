"""Connected components + duplicate-cluster resolution vs a pure-Python
union-find oracle."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from discogsography_spark.operators.components import (
    connected_components,
    keep_canonical,
    resolve_duplicates,
)


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min member id
    comp = {}
    for n in list(parent):
        comp[n] = find(n)
    return comp


def _cc_spark(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = connected_components(df, "src", "dst").collect()
    return {r["node"]: r["component"] for r in got}


def test_cc_matches_union_find_random(spark):
    rng = random.Random(7)
    edges = [
        (rng.randrange(300), rng.randrange(300)) for _ in range(250)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert _cc_spark(spark, edges) == _union_find(edges)


def test_cc_long_chain_and_cliques(spark):
    # a 40-node chain exercises multi-round star contraction; two cliques
    # and a singleton pair exercise the near-clique dedup shape
    chain = [(i, i + 1) for i in range(100, 140)]
    clique_a = [(a, b) for a in range(0, 6) for b in range(a + 1, 6)]
    clique_b = [(a, b) for a in range(50, 54) for b in range(a + 1, 54)]
    lone = [(900, 901)]
    edges = chain + clique_a + clique_b + lone
    got = _cc_spark(spark, edges)
    assert got == _union_find(edges)
    assert got[139] == 100 and got[5] == 0 and got[901] == 900


def test_cc_empty_and_self_loops(spark):
    df = spark.createDataFrame([(1, 1), (2, 2)], "src long, dst long")
    assert connected_components(df, "src", "dst").count() == 0


def test_cc_stable_under_repartition(spark):
    edges = [(i, (i * 7) % 50) for i in range(50) if i != (i * 7) % 50]
    df = spark.createDataFrame(edges, "src long, dst long").repartition(13)
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, "src", "dst").collect()
    }
    assert got == _union_find(edges)


def test_resolve_duplicates_min_id_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5), (1, 2)], "doc_a long, doc_b long"
    )
    r = resolve_duplicates(docs, pairs).collect()
    by_id = {row["doc_id"]: row for row in r}
    assert by_id[5]["component_id"] == 0 and not by_id[5]["is_canonical"]
    assert by_id[3]["component_id"] == 0 and not by_id[3]["is_canonical"]
    assert by_id[0]["is_canonical"]
    assert by_id[2]["component_id"] == 1 and not by_id[2]["is_canonical"]
    # untouched docs are singleton canonicals
    for i in (4, 6, 7):
        assert by_id[i]["component_id"] == i and by_id[i]["is_canonical"]


def test_resolve_duplicates_quality_ordering(spark):
    docs = spark.createDataFrame(
        [(0, 0.1), (1, 0.9), (2, 0.5)], "doc_id long, quality double"
    )
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "doc_a long, doc_b long")
    r = resolve_duplicates(
        docs, pairs, order_cols=[F.col("quality").desc(), F.col("doc_id")]
    ).collect()
    canon = {row["doc_id"]: row["is_canonical"] for row in r}
    assert canon == {0: False, 1: True, 2: False}


def test_keep_canonical_shrinks_and_preserves_schema(spark):
    docs = spark.createDataFrame(
        [(i, f"doc {i}", f"s{i%2}") for i in range(6)],
        "doc_id long, text string, source string",
    )
    pairs = spark.createDataFrame([(0, 4), (2, 5)], "doc_a long, doc_b long")
    kept = keep_canonical(docs, pairs)
    assert kept.columns == ["doc_id", "text", "source"]
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 1, 2, 3]
