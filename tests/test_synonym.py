"""Synonym-aware BM25 (Lucene SynonymQuery / PG synonym-dictionary
semantics): engine vs pure-Python oracle vs DataFrame mirror."""

from __future__ import annotations

import os

import pytest

from discogsography_spark.oracle import bm25_topk, bm25_topk_synonym
from discogsography_spark.query.engine import LocalSearcher

CASES = [
    ("turn spark", {"spark": ["stream", "batch"]}),
    ("merge", {"merge": ["join"]}),
    ("index query", {"index": ["table"], "query": ["scan", "filter"]}),
    # overlapping member across two groups
    ("spark stream", {"spark": ["batch"], "stream": ["batch"]}),
    # synonym absent from the vocabulary — group falls back to the term
    ("merge", {"merge": ["zzzqqqxxx"]}),
]


@pytest.mark.parametrize("qtext,syn", CASES)
def test_engine_matches_oracle(built_index, oracle_index, qtext, syn):
    s = LocalSearcher(built_index)
    got = s.topk_synonym(qtext, 10, syn)
    want = bm25_topk_synonym(oracle_index, qtext, 10, syn)
    assert got == want  # bit-identical scores, identical ranking


def test_no_synonyms_equals_plain_topk(built_index, oracle_index):
    s = LocalSearcher(built_index)
    for q in ["merge", "turn spark", "index query"]:
        assert s.topk_synonym(q, 10, {}) == s.topk(q, 10)
        assert bm25_topk_synonym(oracle_index, q, 10, {}) == bm25_topk(
            oracle_index, q, 10
        )


def test_absent_group_is_empty(built_index):
    s = LocalSearcher(built_index)
    assert s.topk_synonym("zzqqxx merge", 10, {}) == []
    assert s.topk_synonym("zzqqxx merge", 10, {"zzqqxx": ["yyzzqq"]}) == []
    # ...but a synonym can rescue an absent term (the dictionary's point)
    rescued = s.topk_synonym("zzqqxx merge", 10, {"zzqqxx": ["spark"]})
    assert rescued == s.topk_synonym("spark merge", 10, {})


def test_synonym_group_df_is_max_not_union(built_index, oracle_index):
    # union-df would lower idf below every member idf; max keeps it at the
    # most common member's level — verify scores differ from a union-df
    # computation by checking against the oracle (which implements max).
    s = LocalSearcher(built_index)
    got = s.topk_synonym("turn", 5, {"turn": ["spark", "merge"]})
    want = bm25_topk_synonym(
        oracle_index, "turn", 5, {"turn": ["spark", "merge"]}
    )
    assert got == want and got


def test_dataframe_mirror_identity(spark, built_index, oracle_index, corpus_dir):
    from discogsography_spark.query.dataframe_bm25 import (
        bm25_synonym_topk_dataframe,
    )

    docs = (
        spark.read.parquet(os.path.join(built_index, "docs"))
        .select("doc_id", "conv_id", "turn_idx")
        .join(
            spark.read.parquet(
                os.path.join(corpus_dir, "transcripts.parquet")
            ),
            ["conv_id", "turn_idx"],
        )
        .select("doc_id", "text")
    )
    syn = {"spark": ["stream"], "turn": ["merge"]}
    rows = bm25_synonym_topk_dataframe(docs, "turn spark", syn, k=10).collect()
    want = bm25_topk_synonym(oracle_index, "turn spark", 10, syn)
    assert [(r["doc_id"], r["score"]) for r in rows] == [
        (d, round(sc, 5)) for d, sc in want
    ]


def test_budget_applies(built_index):
    from discogsography_spark.query.engine import QueryBudgetExceeded

    s = LocalSearcher(built_index)
    with pytest.raises(QueryBudgetExceeded):
        s.topk_synonym(
            "turn spark", 10, {"spark": ["stream"]}, budget_ms=0.0
        )
