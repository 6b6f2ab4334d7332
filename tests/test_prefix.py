"""Prefix/autocomplete parity: the index serving path (topk_prefix), the
declarative DataFrame path (bm25_prefix_topk_dataframe), and a pure-Python
expansion oracle must agree on the same corpus.

Mirrors the reference's autocomplete surface — per-term `*` expansion joined
conjunctively (/root/reference/api/queries/neo4j_queries.py:28-39)."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from discogsography_spark.analysis import tokenize_py
from discogsography_spark.query.dataframe_bm25 import bm25_prefix_topk_dataframe
from discogsography_spark.query.engine import LocalSearcher

PREFIX_QUERIES = [
    ("sp", 10),        # head-word prefix (spark, ...)
    ("sp to", 10),     # two prefixes, conjunctive
    ("w000 turn", 8),  # synthetic tail prefix + head word
    ("zzzzqqq", 5),    # no expansion → empty
    ("index", 12),     # exact word as its own prefix
]


@pytest.fixture(scope="module")
def docs_df(spark, corpus_dir, built_index):
    # same doc_id convention as the builder: dense rank over (conv_id, turn_idx)
    from discogsography_spark.index.docids import assign_doc_ids

    transcripts = spark.read.parquet(os.path.join(corpus_dir, "transcripts.parquet"))
    return assign_doc_ids(transcripts).select("doc_id", "text").cache()


def test_expand_prefix_matches_vocab(built_index, corpus_dir):
    searcher = LocalSearcher(built_index)
    tdf = pd.read_parquet(os.path.join(corpus_dir, "transcripts.parquet"))
    vocab = set()
    for t in tdf["text"]:
        vocab.update(tokenize_py(t))
    for pre in ["sp", "w000", "a", "zzzzqqq"]:
        want = sorted(t for t in vocab if t.startswith(pre))[:64]
        got = searcher.expand_prefix(pre, 64)
        assert got == want, pre


def test_topk_prefix_matches_dataframe_path(spark, built_index, docs_df):
    searcher = LocalSearcher(built_index)
    for qtext, k in PREFIX_QUERIES:
        got = searcher.topk_prefix(qtext, k)
        want = [
            (int(r["doc_id"]), float(r["score"]))
            for r in bm25_prefix_topk_dataframe(docs_df, qtext, k=k).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in want], qtext
        for (_, a), (_, b) in zip(got, want):
            assert abs(a - b) < 1e-9, qtext


def test_topk_prefix_conjunctive_and_empty(built_index):
    searcher = LocalSearcher(built_index)
    assert searcher.topk_prefix("zzzzqqq", 5) == []
    assert searcher.topk_prefix("", 5) == []
    # a doc matching prefix A only must not appear for "A B"
    both = searcher.topk_prefix("sp to", 20)
    only_a = {d for d, _ in searcher.topk_prefix("sp", 10**9, max_expansions=64)}
    for d, _ in both:
        assert d in only_a
