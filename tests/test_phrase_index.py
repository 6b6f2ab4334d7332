"""Positional postings + index-side phrase serving: LocalSearcher.topk_phrase
over an index built with with_positions=True must agree exactly with the
declarative bm25_phrase_topk_dataframe path (which the DuckDB oracle grades),
including head-term salted builds and analyzer edge cases."""

from __future__ import annotations

import os

import pytest

from discogsography_spark.corpus import make_transcripts
from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.index.docids import assign_doc_ids
from discogsography_spark.query.dataframe_bm25 import bm25_phrase_topk_dataframe
from discogsography_spark.query.engine import LocalSearcher

PHRASES = [
    ("spark index", 10),
    ("index spark", 10),      # reversed order = different matches
    ("turn turn", 8),          # repeated-term phrase
    ("spark zzqqabsent", 5),   # absent term → empty
    ("merge", 10),             # single-token phrase == single-term query
    ("the spark index", 10),   # analyzer-normalized leading token
]


@pytest.fixture(scope="module")
def pos_setup(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("posidx")
    tdf = make_transcripts(n_conversations=250, mean_turns=6, vocab_size=600)
    p = str(d / "t.parquet")
    tdf.to_parquet(p, index=False)
    idx = str(d / "idx")
    # low head threshold → head terms exercise the salted positional path
    IndexBuilder(
        idx, num_segments=4, head_df_threshold=200, head_salts=3, with_positions=True
    ).build(spark.read.parquet(p))
    docs = assign_doc_ids(spark.read.parquet(p)).select("doc_id", "text").cache()
    docs.count()
    return {"idx": idx, "docs": docs}


def test_phrase_index_matches_dataframe_path(spark, pos_setup):
    s = LocalSearcher(pos_setup["idx"])
    n_nonempty = 0
    for phrase, k in PHRASES:
        got = s.topk_phrase(phrase, k)
        want = [
            (int(r["doc_id"]), float(r["score"]))
            for r in bm25_phrase_topk_dataframe(pos_setup["docs"], phrase, k=k).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in want], phrase
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9, phrase
        n_nonempty += bool(got)
    assert n_nonempty >= 3  # corpus genuinely exercises the phrase path


def test_phrase_requires_positional_index(spark, tmp_path):
    tdf = make_transcripts(n_conversations=30, mean_turns=4, vocab_size=100)
    p = str(tmp_path / "t.parquet")
    tdf.to_parquet(p, index=False)
    idx = str(tmp_path / "idx")
    IndexBuilder(idx, num_segments=2, head_df_threshold=10**9).build(
        spark.read.parquet(p)
    )
    s = LocalSearcher(idx)
    with pytest.raises(ValueError, match="with_positions"):
        s.topk_phrase("spark index", 5)


def test_non_positional_results_unchanged_by_schema_extension(spark, pos_setup):
    """The positional index still answers every non-phrase mode."""
    s = LocalSearcher(pos_setup["idx"])
    assert s.topk("spark", 5)
    assert s.topk("spark index", 5)
    assert s.topk("spark index", 5, mode="or")
    assert s.topk_prefix("spa", 5)


def test_proximity_index_matches_dataframe_path(spark, pos_setup):
    from discogsography_spark.query.dataframe_bm25 import (
        bm25_proximity_topk_dataframe,
    )

    s = LocalSearcher(pos_setup["idx"])
    cases = [
        ("spark", "index", 1, 10),   # unordered adjacency
        ("spark", "index", 3, 10),
        ("index", "spark", 3, 10),   # symmetric
        ("turn", "turn", 2, 8),      # same-term proximity
        ("spark", "zzqqabsent", 4, 5),
        ("merge", "query", 5, 12),
    ]
    n_nonempty = 0
    for w1, w2, win, k in cases:
        got = s.topk_within(w1, w2, win, k)
        want = [
            (int(r["doc_id"]), float(r["score"]))
            for r in bm25_proximity_topk_dataframe(
                pos_setup["docs"], w1, w2, win, k=k
            ).collect()
        ]
        assert [d for d, _ in got] == [d for d, _ in want], (w1, w2, win)
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9, (w1, w2, win)
        n_nonempty += bool(got)
    assert n_nonempty >= 3


def test_proximity_window_one_superset_of_phrase_pair(spark, pos_setup):
    """window=1 proximity (unordered adjacency) must contain both phrase
    orders' match sets."""
    s = LocalSearcher(pos_setup["idx"])
    near = {d for d, _ in s.topk_within("spark", "index", 1, 10**6)}
    ab = {d for d, _ in s.topk_phrase("spark index", 10**6)}
    ba = {d for d, _ in s.topk_phrase("index spark", 10**6)}
    assert (ab | ba) <= near


BOOL_PHRASE_QUERIES = [
    '"spark index" OR merge',
    'query AND NOT "spark index"',
    '"spark index" AND turn',
    '("spark index" OR "index spark") AND NOT merge',
    '"spark zzqqabsent" OR merge',     # absent phrase arm
]


def _oracle_from_docs(docs_df):
    from discogsography_spark.oracle import build_oracle_index

    pdf = docs_df.toPandas()
    rows = [(f"{int(d):010d}", 0, t) for d, t in zip(pdf["doc_id"], pdf["text"])]
    return build_oracle_index(rows)


def test_bool_with_phrases_matches_python_oracle(spark, pos_setup):
    from discogsography_spark.oracle import bm25_topk_bool

    s = LocalSearcher(pos_setup["idx"])
    oracle = _oracle_from_docs(pos_setup["docs"])
    n_nonempty = 0
    for q in BOOL_PHRASE_QUERIES:
        got = s.topk_bool(q, 12, use_result_cache=False)
        want = bm25_topk_bool(oracle, q, 12)
        assert [x[0] for x in got] == [x[0] for x in want], q
        for (gd, gs), (_, ws) in zip(got, want):
            assert gs == ws, f"{q}: doc {gd} {gs!r} != {ws!r}"
        n_nonempty += bool(got)
    assert n_nonempty >= 4


def test_bool_with_phrases_dataframe_identity(spark, pos_setup):
    from discogsography_spark.oracle import bm25_topk_bool
    from discogsography_spark.query.dataframe_bm25 import bm25_bool_topk_dataframe

    oracle = _oracle_from_docs(pos_setup["docs"])
    for q in BOOL_PHRASE_QUERIES[:3]:
        got = [
            (r["doc_id"], r["score"])
            for r in bm25_bool_topk_dataframe(pos_setup["docs"], q, k=10).collect()
        ]
        wide = bm25_topk_bool(oracle, q, 400)
        want = sorted(
            ((d, round(x, 5)) for d, x in wide), key=lambda y: (-y[1], y[0])
        )[:10]
        assert got == want, q


def test_bool_phrase_served_response(spark, pos_setup):
    from discogsography_spark.query.serving import SearchService

    svc = SearchService(pos_setup["idx"])
    q = '"spark index" OR merge'
    resp = svc.search(q, 8, mode="bool")
    s = LocalSearcher(pos_setup["idx"])
    assert resp.results == s.topk_bool(q, 8)
    matched = svc.matched_docs(q, mode="bool")
    assert resp.total_matched == int(matched.size) > 0


def test_bool_phrase_batch_path_identity(spark, pos_setup):
    """Quoted phrases on the batch/Distributed path: phrase nodes resolve to
    exact doc sets on the positional index and join into the plan as
    membership relations — results must be bit-identical to
    LocalSearcher.topk_bool on every composition shape."""
    from discogsography_spark.query.engine import DistributedQueryEngine

    eng = DistributedQueryEngine(spark, pos_setup["idx"])
    s = LocalSearcher(pos_setup["idx"])
    n_nonempty = 0
    for q in [
        '"spark index" OR merge',
        '"spark index" AND NOT merge',
        'merge AND NOT "spark index"',
        '("spark index" OR "index spark") AND turn',
        '"turn turn" OR spark',
    ]:
        got = [
            (r["doc_id"], r["score"])
            for r in eng.topk_bool_df(q, 10).collect()
        ]
        want = s.topk_bool(q, 10, use_result_cache=False)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (gd, gs), (wd, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-12, f"{q}: doc {gd} {gs!r} != {ws!r}"
        n_nonempty += bool(got)
    assert n_nonempty >= 4


def test_bool_phrase_sharded_identity(spark, pos_setup, tmp_path_factory):
    """Phrase-in-boolean across positional doc-shards must equal the
    whole-corpus index (phrase doc sets are shard-local exact)."""
    from discogsography_spark.query.sharded import ShardedSearcher

    d = tmp_path_factory.mktemp("boolph_sh")
    pdf = pos_setup["docs"].toPandas().sort_values("doc_id")
    mid = int(pdf["doc_id"].iloc[len(pdf) // 2])
    shard_dirs = []
    for i, part in enumerate((pdf[pdf["doc_id"] < mid], pdf[pdf["doc_id"] >= mid])):
        # conv_id = zero-padded doc_id keeps global dense-rank order across
        # consecutive shards (the ShardedSearcher offset contract)
        tdf = part.assign(
            conv_id=part["doc_id"].map(lambda x: f"{int(x):010d}"),
            turn_idx=0,
            role="user",
            tool=None,
            ts=None,
        )[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
        p = str(d / f"s{i}.parquet")
        tdf.to_parquet(p, index=False)
        idx = str(d / f"s{i}_idx")
        IndexBuilder(idx, num_segments=2, with_positions=True).build(
            spark.read.parquet(p)
        )
        shard_dirs.append(idx)
    sharded = ShardedSearcher(shard_dirs)
    single = LocalSearcher(pos_setup["idx"])
    for q in ('"spark index" OR merge', 'query AND NOT "spark index"'):
        got = sharded.topk_bool(q, 10)
        want = single.topk_bool(q, 10, use_result_cache=False)
        assert got == want, q


WITHIN_BOOL_QUERIES = [
    "spark <3> index AND NOT merge",
    "spark <2> index OR merge",
    "turn <2> turn AND spark",
    "(spark <1> index) OR (index <1> spark)",
    "merge AND NOT (spark <2> index)",
    # n-ary chains (r5): `a <N1> b <N2> c` — per-link windows, left-fold
    "spark <3> index <5> merge",
    "spark <4> index <4> query AND NOT merge",
    "turn <2> turn <3> spark OR merge",
]


def test_bool_within_matches_python_oracle(spark, pos_setup):
    """`a <N> b` composed with AND/OR/NOT: LocalSearcher.topk_bool over the
    positional index must equal the brute-force python oracle."""
    from discogsography_spark.oracle import bm25_topk_bool

    oracle = _oracle_from_docs(pos_setup["docs"])
    s = LocalSearcher(pos_setup["idx"])
    n_nonempty = 0
    for q in WITHIN_BOOL_QUERIES:
        got = s.topk_bool(q, 10, use_result_cache=False)
        want = bm25_topk_bool(oracle, q, 10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (gd, gs), (wd, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9, f"{q}: doc {gd}"
        n_nonempty += bool(got)
    assert n_nonempty >= 4


def test_bool_within_dataframe_identity(spark, pos_setup):
    from discogsography_spark.oracle import bm25_topk_bool
    from discogsography_spark.query.dataframe_bm25 import bm25_bool_topk_dataframe

    oracle = _oracle_from_docs(pos_setup["docs"])
    for q in WITHIN_BOOL_QUERIES[:3] + WITHIN_BOOL_QUERIES[5:]:
        got = [
            (r["doc_id"], r["score"])
            for r in bm25_bool_topk_dataframe(pos_setup["docs"], q, k=10).collect()
        ]
        wide = bm25_topk_bool(oracle, q, 400)
        want = sorted(
            ((d, round(x, 5)) for d, x in wide), key=lambda y: (-y[1], y[0])
        )[:10]
        assert got == want, q


def test_bool_within_batch_path_identity(spark, pos_setup):
    from discogsography_spark.query.engine import DistributedQueryEngine

    eng = DistributedQueryEngine(spark, pos_setup["idx"])
    s = LocalSearcher(pos_setup["idx"])
    for q in WITHIN_BOOL_QUERIES[:3] + WITHIN_BOOL_QUERIES[5:]:
        got = [
            (r["doc_id"], r["score"]) for r in eng.topk_bool_df(q, 10).collect()
        ]
        want = s.topk_bool(q, 10, use_result_cache=False)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (gd, gs), (wd, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-12, q


def test_bool_within_served_and_sharded(spark, pos_setup, tmp_path_factory):
    from discogsography_spark.query.serving import SearchService
    from discogsography_spark.query.sharded import ShardedSearcher

    s = LocalSearcher(pos_setup["idx"])
    svc = SearchService(pos_setup["idx"])
    for q in ("spark <3> index AND NOT merge", "spark <3> index <5> merge"):
        resp = svc.search(q, 8, mode="bool")
        assert resp.results == s.topk_bool(q, 8)
        assert resp.total_matched == int(svc.matched_docs(q, mode="bool").size) > 0

    # sharded: split the positional corpus in two, expect bit-identity
    d = tmp_path_factory.mktemp("within_sh")
    pdf = pos_setup["docs"].toPandas().sort_values("doc_id")
    mid = int(pdf["doc_id"].iloc[len(pdf) // 2])
    from discogsography_spark.index.builder import IndexBuilder as IB

    shard_dirs = []
    for i, m in enumerate([pdf["doc_id"] < mid, pdf["doc_id"] >= mid]):
        p = str(d / f"s{i}.parquet")
        part = pdf[m].rename(columns={"doc_id": "turn_idx"})
        part["conv_id"] = "c"
        part[["conv_id", "turn_idx", "text"]].to_parquet(p, index=False)
        idx = str(d / f"s{i}_idx")
        IB(idx, num_segments=2, with_positions=True).build(spark.read.parquet(p))
        shard_dirs.append(idx)
    sharded = ShardedSearcher(shard_dirs)
    for q2 in WITHIN_BOOL_QUERIES[:3] + WITHIN_BOOL_QUERIES[5:]:
        assert sharded.topk_bool(q2, 10) == s.topk_bool(q2, 10, use_result_cache=False), q2


def test_topk_fuzzy_bool_mode(spark, pos_setup):
    """fuzzy=bool: vocabulary-absent plain terms rewrite via trigram
    suggestion, then the boolean evaluator runs the rewritten AST —
    identical to querying with the corrected term."""
    s = LocalSearcher(pos_setup["idx"])
    res, rw = s.topk_fuzzy("sparkz AND index", 8, mode="bool")
    assert rw == {"sparkz": "spark"}
    assert res == s.topk_bool("spark AND index", 8, use_result_cache=False)
    res2, rw2 = s.topk_fuzzy("sparkz <3> index", 8, mode="bool")
    # within operands are exact-match: no rewrite, empty result
    assert rw2 == {} and res2 == []


def test_lazy_verify_multi_tier_identity(spark, pos_setup, monkeypatch):
    """The score-tier lazy verifier (_lazy_verified_topk) normally starts
    at T=4096, so small fixtures finish in one tier. Force T=1/2/3 so the
    loop takes MANY tiers (argpartition pools, bound updates, the strict
    stop rule with ties) and assert results identical to the single-tier
    answer for both topk_phrase and topk_within — including k=1, k mid,
    and k larger than the match count."""
    import discogsography_spark.query.engine as eng

    s = LocalSearcher(pos_setup["idx"])
    phrase_cases = [("spark index", None), ("turn turn", None), ("merge", None)]
    within_cases = [
        ("spark", "index", 3),
        ("turn", "turn", 2),
        ("merge", "query", 5),
    ]
    for k in (1, 4, 10**6):
        base_p = {ph: s.topk_phrase(ph, k) for ph, _ in phrase_cases}
        base_w = {c: s.topk_within(*c, k) for c in within_cases}
        for tier in (1, 2, 3):
            monkeypatch.setattr(eng, "_FIRST_TIER", tier)
            for ph, _ in phrase_cases:
                assert s.topk_phrase(ph, k) == base_p[ph], (ph, k, tier)
            for c in within_cases:
                assert s.topk_within(*c, k) == base_w[c], (c, k, tier)
            monkeypatch.setattr(eng, "_FIRST_TIER", 4096)
