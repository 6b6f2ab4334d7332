"""Field-collapsed top-k (query/collapse.py): best turn per conversation,
top-k conversations — checked against an independent python collapse of the
engine's full exact ranking, a pandas token-scan for group counts, the
DataFrame mirror, the sharded fan-out, and the live merged (tombstone)
view. The reference's analog: per-entity-type rank-capped subqueries
UNION ALL'd into one ranked list (api/queries/search_queries.py:105-197)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from discogsography_spark.corpus import make_transcripts
from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.query.collapse import collapse_topk
from discogsography_spark.query.serving import SearchService


# ---------------------------------------------------------------- unit

def test_collapse_topk_deepening_exact():
    # ranked list (score DESC, doc ASC); groups: doc -> doc % 3
    ranked = [(1, 9.0), (4, 8.0), (7, 8.0), (2, 7.0), (6, 6.0), (5, 5.0), (3, 4.0)]

    def fn(kp):
        return ranked[:kp]

    got = collapse_topk(fn, lambda d: d % 3, k=3, probe_k=1)
    # group 1 best = doc 1 (9.0); group 1 again for 4? 4%3=1 — no: first-seen
    # wins, so group 1 -> (1, 9.0), group 0 -> (6, 6.0), group 2 -> (2, 7.0)
    assert got == [(1, 1, 9.0), (2, 2, 7.0), (0, 6, 6.0)]
    # identical at any probe depth
    for pk in (2, 3, 100):
        assert collapse_topk(fn, lambda d: d % 3, k=3, probe_k=pk) == got
    # k beyond available groups terminates via exhaustion
    assert len(collapse_topk(fn, lambda d: d % 3, k=10, probe_k=1)) == 3


def test_collapse_topk_property_random_rankings():
    """Property: for ANY ranked list (score DESC, doc ASC), ANY group
    assignment, ANY k, and ANY probe depth, collapse_topk equals the
    brute-force collapse of the full ranking."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rows = st.lists(
        st.tuples(st.integers(0, 50), st.integers(0, 1000)),  # (doc, score)
        min_size=0, max_size=60, unique_by=lambda t: t[0],
    )

    @settings(max_examples=200, deadline=None)
    @given(rows, st.integers(1, 8), st.integers(2, 7), st.integers(1, 5))
    def check(pairs, k, n_groups, probe):
        ranked = sorted(
            [(d, float(s)) for d, s in pairs], key=lambda ds: (-ds[1], ds[0])
        )
        fn = lambda kp: ranked[:kp]  # noqa: E731
        group_of = lambda d: d % n_groups  # noqa: E731
        best: dict = {}
        for d, s in ranked:
            best.setdefault(group_of(d), (d, s))
        want = [(g, d, s) for g, (d, s) in list(best.items())[:k]]
        assert collapse_topk(fn, group_of, k, probe_k=probe) == want

    check()


# ---------------------------------------------------------------- fixtures

@pytest.fixture(scope="module")
def collapse_setup(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("collapse")
    tdf = make_transcripts(n_conversations=120, mean_turns=6, vocab_size=400)
    p = str(d / "t.parquet")
    tdf.to_parquet(p, index=False)
    idx = str(d / "idx")
    IndexBuilder(idx, num_segments=4, store_text=True).build(
        spark.read.parquet(p)
    )
    svc = SearchService(idx, facet_defs={"role": "role"})
    tdf = tdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    tdf["doc_id"] = range(len(tdf))
    return svc, tdf, p, str(d)


def _brute_collapse(svc, query, mode, field_of, k):
    """Independent collapse of the engine's FULL exact ranking."""
    n = svc.meta.n_docs
    if mode == "bool":
        full = svc.searcher.topk_bool(query, n + 1)
    else:
        full = svc.searcher.topk(query, n + 1, mode=mode)
    seen: dict = {}
    for doc, s in full:
        g = field_of(doc)
        if g not in seen:
            seen[g] = (doc, s)
    return [(g, doc, s) for g, (doc, s) in list(seen.items())[:k]]


def _scan_counts(tdf, query_terms, mode, field):
    from discogsography_spark.analysis import tokenize_py

    toks = tdf["text"].map(lambda t: set(tokenize_py(t)))
    if mode == "or":
        m = toks.map(lambda s: any(t in s for t in query_terms))
    else:
        m = toks.map(lambda s: all(t in s for t in query_terms))
    return tdf[m].groupby(field).size().to_dict()


@pytest.mark.parametrize(
    "query,mode",
    [
        ("spark index", "and"),
        ("merge shuffle", "or"),
        ("spark AND (index OR merge) AND NOT w00040", "bool"),
    ],
)
@pytest.mark.parametrize("field", ["conv_id", "role"])
def test_service_collapse_matches_brute(collapse_setup, query, mode, field):
    svc, tdf, _p, _d = collapse_setup
    field_vals = tdf.set_index("doc_id")[field]
    want = _brute_collapse(svc, query, mode, lambda d: field_vals[d], k=8)
    got = svc.collapse(query, field, k=8, mode=mode)
    assert [(g, d, s) for g, d, s, _c in got] == want
    # group counts == pandas token-scan groupby (and/or only: the bool
    # matched set is the engine's own algebra, already oracled elsewhere)
    if mode != "bool":
        counts = _scan_counts(tdf, sorted(set(query.split())), mode, field)
        for g, _d, _s, c in got:
            assert c == counts[g], (g, c)


def test_collapse_probe_forces_deepening(collapse_setup):
    svc, _tdf, _p, _d = collapse_setup
    a = svc.collapse("spark index", "conv_id", k=10, probe_k=1)
    b = svc.collapse("spark index", "conv_id", k=10)
    assert a == b
    assert len(a) == 10


def test_collapse_dataframe_mirror(collapse_setup, spark):
    from discogsography_spark.query.dataframe_bm25 import (
        bm25_collapse_topk_dataframe,
    )

    svc, tdf, p, _d = collapse_setup
    docs = (
        spark.read.parquet(p)
        .orderBy("conv_id", "turn_idx")
        .selectExpr(
            "conv_id",
            "text",
            "row_number() over (order by conv_id, turn_idx) - 1 as doc_id",
        )
    )
    rows = bm25_collapse_topk_dataframe(
        docs, "spark index", "conv_id", k=8
    ).collect()
    served = svc.collapse("spark index", "conv_id", k=8)
    assert [(r["conv_id"], r["doc_id"], r["group_matched"]) for r in rows] == [
        (g, d, c) for g, d, _s, c in served
    ]
    for r, (_g, _d, s, _c) in zip(rows, served):
        assert r["score"] == pytest.approx(round(s, 5), abs=1e-9)


def test_collapse_sharded_identical_to_single(collapse_setup, spark, tmp_path_factory):
    from discogsography_spark.query.serving import ShardedSearchService

    svc, tdf, _p, _d = collapse_setup
    d = tmp_path_factory.mktemp("collapse_shards")
    convs = sorted(tdf["conv_id"].unique())
    bounds = [convs[len(convs) // 3], convs[2 * len(convs) // 3]]
    ranges = list(zip([None, *bounds], [*bounds, None]))
    shard_dirs = []
    for i, (lo, hi) in enumerate(ranges):
        m = tdf["conv_id"].map(
            lambda c: (lo is None or c >= lo) and (hi is None or c < hi)
        )
        p = str(d / f"s{i}.parquet")
        tdf[m].drop(columns=["doc_id"]).to_parquet(p, index=False)
        idx = str(d / f"s{i}_idx")
        IndexBuilder(idx, num_segments=2).build(spark.read.parquet(p))
        shard_dirs.append(idx)
    sh = ShardedSearchService(shard_dirs, parallel=False)
    try:
        for query, mode in [
            ("spark index", "and"),
            ("merge shuffle", "or"),
            ("spark AND (index OR merge)", "bool"),
        ]:
            single = svc.collapse(query, "conv_id", k=8, mode=mode)
            sharded = sh.collapse(query, "conv_id", k=8, mode=mode)
            # same groups, same scores, same counts; best-doc ids are
            # shard-global on the sharded side — compare via conv label
            assert [(g, round(s, 9), c) for g, _d, s, c in single] == [
                (g, round(s, 9), c) for g, _d, s, c in sharded
            ]
    finally:
        sh.close()


def test_collapse_merged_live_equals_alive_rebuild(spark, tmp_path_factory):
    from discogsography_spark.query.serving import MergedSearchService
    from discogsography_spark.streaming.incremental import DeltaIndexWriter

    d = tmp_path_factory.mktemp("collapse_live")
    tdf = make_transcripts(n_conversations=80, mean_turns=5, vocab_size=300)
    convs = sorted(tdf["conv_id"].unique())
    base = tdf[tdf["conv_id"].isin(convs[:60])].reset_index(drop=True)
    repl = base[base["conv_id"].isin(convs[:8])].copy()
    repl["text"] = repl["text"] + " spark index editmarker"
    dead = convs[8:12]

    base_p = str(d / "base.parquet")
    base.to_parquet(base_p, index=False)
    idx = str(d / "idx")
    IndexBuilder(idx, num_segments=2, store_text=True).build(
        spark.read.parquet(base_p)
    )
    w = DeltaIndexWriter(idx)
    b0 = str(d / "b0.parquet")
    repl.to_parquet(b0, index=False)
    w.write_batch(spark.read.parquet(b0), 0, upsert=True)
    w.write_deletes(spark.createDataFrame(pd.DataFrame({"conv_id": dead})), 1)

    alive = pd.concat(
        [base[~base["conv_id"].isin(convs[:8])], repl], ignore_index=True
    )
    alive = alive[~alive["conv_id"].isin(dead)]
    ref_p = str(d / "alive.parquet")
    alive.to_parquet(ref_p, index=False)
    ref_idx = str(d / "ref_idx")
    IndexBuilder(ref_idx, num_segments=2, store_text=True).build(
        spark.read.parquet(ref_p)
    )

    live = MergedSearchService(idx)
    ref = SearchService(ref_idx)
    for query, mode in [("spark index", "and"), ("merge shuffle", "or")]:
        lv = live.collapse(query, "conv_id", k=8, mode=mode)
        rf = ref.collapse(query, "conv_id", k=8, mode=mode)
        # docIDs differ between the live view and a rebuild; the collapsed
        # relation (group, score, count) must be identical
        assert [(g, round(s, 9), c) for g, _d, s, c in lv] == [
            (g, round(s, 9), c) for g, _d, s, c in rf
        ]
        # no deleted conversation may appear
        assert not set(g for g, *_ in lv) & set(dead)
