"""The correctness gate of the north rule: Spark engine top-k docIDs AND BM25
scores rank-identical to the pure-Python oracle on the reference query set,
plus the per-turn text-equality invariant."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from discogsography_spark.oracle import bm25_topk
from discogsography_spark.query.engine import DistributedQueryEngine, LocalSearcher


@pytest.fixture(scope="session")
def query_set(corpus_dir):
    return pd.read_parquet(os.path.join(corpus_dir, "queries.parquet"))


def _assert_rank_identical(got, expected, qtext):
    assert len(got) == len(expected), f"{qtext}: count {len(got)} != {len(expected)}"
    for i, ((gd, gs), (ed, es)) in enumerate(zip(got, expected)):
        assert gd == ed, f"{qtext}: rank {i} docID {gd} != {ed}"
        assert gs == es, f"{qtext}: rank {i} score {gs!r} != {es!r} (bit-identical)"


def test_local_searcher_rank_identity(built_index, oracle_index, query_set):
    searcher = LocalSearcher(built_index)
    for _, q in query_set.iterrows():
        expected = bm25_topk(oracle_index, q["query_text"], int(q["k"]))
        got = searcher.topk(q["query_text"], int(q["k"]))
        _assert_rank_identical(got, expected, q["query_text"])


def test_distributed_engine_rank_identity(spark, built_index, oracle_index, query_set):
    engine = DistributedQueryEngine(spark, built_index)
    # distributed path is for batch scoring; spot-check a slice incl. edge cases
    sample = pd.concat([query_set.head(8), query_set.tail(6)])
    for _, q in sample.iterrows():
        expected = bm25_topk(oracle_index, q["query_text"], int(q["k"]))
        got = engine.topk(q["query_text"], int(q["k"]))
        _assert_rank_identical(got, expected, q["query_text"])


def test_per_turn_text_equality(spark, built_index, corpus_dir):
    """Index docID → (conv_id, turn_idx) → source lookup returns the original
    text, byte-equal, under stable ordering (FIXTURES.md invariant)."""
    docs = spark.read.parquet(os.path.join(built_index, "docs")).select(
        "doc_id", "conv_id", "turn_idx"
    )
    src = spark.read.parquet(os.path.join(corpus_dir, "transcripts.parquet"))
    joined = docs.join(src, ["conv_id", "turn_idx"]).select("doc_id", "text").toPandas()
    tdf = pd.read_parquet(os.path.join(corpus_dir, "transcripts.parquet"))
    ordered = tdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    joined = joined.sort_values("doc_id").reset_index(drop=True)
    assert len(joined) == len(ordered)
    assert (joined["doc_id"].to_numpy() == range(len(ordered))).all()
    assert (joined["text"].to_numpy() == ordered["text"].to_numpy()).all()


def test_distributed_or_and_bool_modes_match_serving(spark, built_index, oracle_index):
    """Batch-path OR and boolean modes are rank- and score-identical to the
    serving path (and therefore to the python oracle)."""
    engine = DistributedQueryEngine(spark, built_index)
    s = LocalSearcher(built_index)
    a, b, c, d = [
        t
        for t, pl in sorted(
            oracle_index.postings.items(), key=lambda tp: (-len(tp[1]), tp[0])
        )[:4]
    ]
    q_or = f"{a} {b} zz-absent"
    assert engine.topk(q_or, 12, mode="or") == s.topk(q_or, 12, mode="or")
    for q in (
        f"{a} AND ({b} OR {c}) AND NOT {d}",
        f"({a} OR {b}) AND NOT ({c} OR {d})",
    ):
        assert engine.topk(q, 12, mode="bool") == s.topk_bool(
            q, 12, use_result_cache=False
        ), q
