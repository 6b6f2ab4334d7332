"""Disjunctive (OR) BM25 with max-score/block-max pruning must be
rank-identical (docIDs AND bit-identical scores) to the pure-Python OR
oracle across the reference query set."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from discogsography_spark.oracle import bm25_topk_or
from discogsography_spark.query.engine import LocalSearcher


@pytest.fixture(scope="module")
def query_set(corpus_dir):
    return pd.read_parquet(os.path.join(corpus_dir, "queries.parquet"))


def test_or_mode_rank_identity(built_index, oracle_index, query_set):
    searcher = LocalSearcher(built_index)
    for _, q in query_set.iterrows():
        expected = bm25_topk_or(oracle_index, q["query_text"], int(q["k"]))
        got = searcher.topk(q["query_text"], int(q["k"]), mode="or")
        assert len(got) == len(expected), q["query_text"]
        for i, ((gd, gs), (ed, es)) in enumerate(zip(got, expected)):
            assert gd == ed, f"{q['query_text']}: rank {i} doc {gd} != {ed}"
            assert gs == es, f"{q['query_text']}: rank {i} score {gs!r} != {es!r}"


def test_or_mode_partial_match(built_index, oracle_index):
    """OR with one absent term still returns the present term's ranking."""
    searcher = LocalSearcher(built_index)
    got = searcher.topk("spark zz-not-a-term", 10, mode="or")
    expected = bm25_topk_or(oracle_index, "spark zz-not-a-term", 10)
    assert [d for d, _ in got] == [d for d, _ in expected]
    assert len(got) > 0
    # all-absent → empty
    assert searcher.topk("zz-gone qq-gone", 10, mode="or") == []
