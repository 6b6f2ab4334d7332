"""Dense bitmap fast paths (AND / boolean / phrase candidates) must be
bit-identical to the oracle, and must actually ENGAGE on an all-head-term
corpus (a tiny vocabulary makes every term's df ≥ n_docs/64)."""

from __future__ import annotations

import os

import pytest

from discogsography_spark.corpus import make_transcripts
from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.oracle import bm25_topk, bm25_topk_bool, build_oracle_index
from discogsography_spark.query.engine import LocalSearcher


@pytest.fixture(scope="module")
def dense_setup(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("dense")
    # 50-word vocab over ~1.2k docs → every term df ≫ n_docs/64
    tdf = make_transcripts(n_conversations=200, mean_turns=6, vocab_size=50)
    p = str(d / "t.parquet")
    tdf.to_parquet(p, index=False)
    idx = str(d / "idx")
    IndexBuilder(idx, num_segments=2, with_positions=True).build(
        spark.read.parquet(p)
    )
    oracle = build_oracle_index(
        list(zip(tdf["conv_id"], tdf["turn_idx"], tdf["text"]))
    )
    return idx, oracle


def test_dense_path_engages_and_matches_oracle(dense_setup):
    idx, oracle = dense_setup
    s = LocalSearcher(idx)
    vocab = sorted(oracle.postings, key=lambda t: -len(oracle.postings[t]))
    a, b, c, d = vocab[:4]
    # every term is dense — the fast-path precondition must hold
    for t in (a, b, c, d):
        assert s.lookup_terms([t])[t].df * 64 >= s.meta.n_docs

    for q, k in ((f"{a} {b}", 10), (f"{a} {b} {c}", 25), (f"{c} {d}", 1)):
        got = s.topk(q, k, use_result_cache=False)
        want = bm25_topk(oracle, q, k)
        assert got == want, q


def test_dense_bool_bitmap_matches_oracle(dense_setup):
    idx, oracle = dense_setup
    s = LocalSearcher(idx)
    vocab = sorted(oracle.postings, key=lambda t: -len(oracle.postings[t]))
    a, b, c, d = vocab[:4]
    for q in (
        f"{a} AND NOT {b}",
        f"({a} OR {b}) AND NOT ({c} OR {d})",
        f"{a} AND ({b} OR {c}) AND NOT {d}",
    ):
        got = s.topk_bool(q, 20, use_result_cache=False)
        want = bm25_topk_bool(oracle, q, 20)
        assert got == want, q


def test_dense_phrase_candidates_consistent_with_and(dense_setup):
    """Phrase hits through the dense candidate path are a subset of the AND
    result set with IDENTICAL per-doc scores (phrase scoring == conjunctive
    scoring restricted to adjacency matches); the full phrase↔DataFrame
    identity lives in test_phrase_index.py — this pins the dense branch."""
    idx, oracle = dense_setup
    s = LocalSearcher(idx)
    vocab = sorted(oracle.postings, key=lambda t: -len(oracle.postings[t]))
    a, b = vocab[:2]
    got = s.topk_phrase(f"{a} {b}", 12)
    and_scores = dict(s.topk(f"{a} {b}", s.meta.n_docs, use_result_cache=False))
    # phrase scores are 5dp-rounded by the cross-engine contract
    assert got and all(
        d in and_scores and x == round(and_scores[d], 5) for d, x in got
    )
