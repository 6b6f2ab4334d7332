"""search_after cursor pagination (Elasticsearch search_after / PIT
semantics — the scale-correct deep-pagination primitive: OFFSET ranks to
depth offset+k and ships offset+k rows per shard, a cursor page keeps an
O(k) pool and ships k rows per shard at ANY depth).

Contract under test: for every evaluator, walking the ranking in pages of
k via `after=(last_score, last_doc)` reproduces the full deep ranking
exactly — docIDs, bit-identical scores, (score DESC, doc_id ASC) order —
on the static, sharded, live merged, and served paths, composing with
boolean/synonym modes and faceted drill-down."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from discogsography_spark.corpus import make_transcripts
from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.query.engine import LocalSearcher
from discogsography_spark.query.sharded import ShardedSearcher
from discogsography_spark.query.serving import SearchService


def walk(fetch_page, k):
    """Exhaust a ranking through cursor pages of size k."""
    out, cur = [], None
    while True:
        page = fetch_page(k, cur)
        assert len(page) <= k
        if not page:
            break
        out.extend(page)
        cur = (page[-1][1], page[-1][0])
    return out


# ---------------------------------------------------------------- local


def test_local_cursor_walk_and_or(built_index):
    s = LocalSearcher(built_index)
    for mode in ("and", "or"):
        for q in ("turn spark", "merge index", "spark"):
            deep = s.topk(q, 10**6, mode=mode, use_result_cache=False)
            assert deep, (mode, q)
            got = walk(
                lambda kk, a: s.topk(
                    q, kk, mode=mode, after=a, use_result_cache=False
                ),
                7,
            )
            assert got == deep, (mode, q)


def test_local_page_equals_deep_slice(built_index):
    s = LocalSearcher(built_index)
    deep = s.topk("turn spark", 100, use_result_cache=False)
    assert len(deep) >= 30
    cur = (deep[9][1], deep[9][0])
    assert s.topk("turn spark", 10, after=cur) == deep[10:20]
    # cursor past the end of the ranking → empty page
    last = (deep[-1][1], deep[-1][0])
    full = s.topk("turn spark", 10**6, use_result_cache=False)
    if len(full) == len(deep[: len(full)]):
        pass  # deep may be shorter than the ranking; only check true end
    tail = s.topk("turn spark", 10**6, use_result_cache=False)
    end = (tail[-1][1], tail[-1][0])
    assert s.topk("turn spark", 5, after=end) == []
    assert last is not None


def test_local_cursor_respects_score_ties(spark, tmp_path_factory):
    """Duplicate documents force exact score ties: the cursor must break
    them by doc_id with no loss or duplication at page boundaries."""
    d = tmp_path_factory.mktemp("ties")
    rows = []
    for i in range(40):
        rows.append(
            {
                "conv_id": f"c{i:03d}",
                "turn_idx": 0,
                "role": "user",
                "text": "alpha beta gamma" if i % 2 == 0 else "alpha beta",
                "tool": "",
                "ts": pd.Timestamp("2026-01-01").to_datetime64(),
            }
        )
    pdf = pd.DataFrame(rows)
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    p = str(d / "t.parquet")
    pdf.to_parquet(p, index=False)
    idx = str(d / "idx")
    IndexBuilder(idx, num_segments=2).build(spark.read.parquet(p))
    s = LocalSearcher(idx)
    deep = s.topk("alpha beta", 10**6, use_result_cache=False)
    assert len(deep) == 40
    scores = [x for _, x in deep]
    assert len(set(scores)) == 2  # two tie plateaus
    got = walk(lambda kk, a: s.topk("alpha beta", kk, after=a), 3)
    assert got == deep
    assert len({d0 for d0, _ in got}) == 40  # no dup, no loss


def test_local_bool_and_synonym_cursor_walk(built_index):
    s = LocalSearcher(built_index)
    q = "(spark OR index) AND NOT merge"
    deep = s.topk_bool(q, 10**6, use_result_cache=False)
    assert deep
    got = walk(
        lambda kk, a: s.topk_bool(q, kk, after=a, use_result_cache=False), 9
    )
    assert got == deep
    syn = {"spark": ["stream", "batch"]}
    deep = s.topk_synonym("turn spark", 10**6, syn, use_result_cache=False)
    assert deep
    got = walk(
        lambda kk, a: s.topk_synonym(
            "turn spark", kk, syn, after=a, use_result_cache=False
        ),
        6,
    )
    assert got == deep


# ---------------------------------------------------------------- served


def test_service_next_after_roundtrip(built_index):
    svc = SearchService(built_index, facet_defs={"role": "role"})
    page1 = svc.search("turn spark", 10)
    assert page1.next_after == (
        page1.results[-1][1],
        page1.results[-1][0],
    )
    page2 = svc.search("turn spark", 10, search_after=page1.next_after)
    by_offset = svc.search("turn spark", 10, offset=10)
    assert page2.results == by_offset.results
    # facets/total describe the whole matched set on every page
    assert page2.total_matched == page1.total_matched
    assert page2.facets == page1.facets
    # empty page → next_after None
    deep = svc.search("turn spark", 10**6)
    tailcur = deep.next_after
    empty = svc.search("turn spark", 5, search_after=tailcur)
    assert empty.results == [] and empty.next_after is None


def test_service_offset_and_after_mutually_exclusive(built_index):
    svc = SearchService(built_index)
    with pytest.raises(ValueError, match="mutually exclusive"):
        svc.search("turn spark", 5, offset=5, search_after=(1.0, 3))


def test_service_drilldown_cursor_walk(built_index):
    svc = SearchService(built_index, facet_defs={"role": "role"})
    deep = svc.search(
        "turn spark", 10**6, filter={"role": "assistant"}
    ).results
    assert deep
    got, cur = [], None
    while True:
        page = svc.search(
            "turn spark", 8, filter={"role": "assistant"}, search_after=cur
        )
        if not page.results:
            break
        got.extend(page.results)
        cur = page.next_after
    assert got == deep


# --------------------------------------------------------------- sharded


@pytest.fixture(scope="module")
def after_shards(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("after_shards")
    tdf = make_transcripts(n_conversations=120, mean_turns=6, vocab_size=300)
    convs = sorted(tdf["conv_id"].unique())
    full_p = str(d / "full.parquet")
    tdf.to_parquet(full_p, index=False)
    full_idx = str(d / "full_idx")
    IndexBuilder(full_idx, num_segments=4, head_df_threshold=10**9).build(
        spark.read.parquet(full_p)
    )
    shard_dirs = []
    for i, lo in enumerate(range(0, 120, 40)):
        part = tdf[tdf["conv_id"].isin(convs[lo : lo + 40])]
        p = str(d / f"s{i}.parquet")
        part.to_parquet(p, index=False)
        idx = str(d / f"shard{i}")
        IndexBuilder(idx, num_segments=2, head_df_threshold=10**9).build(
            spark.read.parquet(p)
        )
        shard_dirs.append(idx)
    return {"full_idx": full_idx, "shards": shard_dirs}


@pytest.mark.parametrize("par", [False, True])
def test_sharded_cursor_matches_single_index(after_shards, par):
    sh = ShardedSearcher(after_shards["shards"], parallel=par)
    try:
        full = LocalSearcher(after_shards["full_idx"])
        for mode in ("and", "or"):
            deep = full.topk(
                "turn spark", 10**6, mode=mode, use_result_cache=False
            )
            got = walk(
                lambda kk, a: sh.topk("turn spark", kk, mode=mode, after=a),
                9,
            )
            # consecutive conv-range shards ⇒ global ids == single-index ids
            assert got == deep, mode
        deep = full.topk_bool(
            "(spark OR index) AND NOT merge", 10**6, use_result_cache=False
        )
        got = walk(
            lambda kk, a: sh.topk_bool(
                "(spark OR index) AND NOT merge", kk, after=a
            ),
            9,
        )
        assert got == deep
        syn = {"spark": ["stream"]}
        deep = full.topk_synonym(
            "turn spark", 10**6, syn, use_result_cache=False
        )
        got = walk(
            lambda kk, a: sh.topk_synonym("turn spark", kk, syn, after=a), 9
        )
        assert got == deep
    finally:
        sh.close()


# ----------------------------------------------------------- live merged


def test_merged_live_cursor_walk(spark, tmp_path_factory):
    """Cursor pages on the live view (upserts + tombstones) walk the
    alive ranking exactly — fast path == exact reference per page."""
    from discogsography_spark.streaming.incremental import (
        DeltaIndexWriter,
        MergedSearcher,
    )

    d = tmp_path_factory.mktemp("after_live")
    tdf = make_transcripts(n_conversations=90, mean_turns=5, vocab_size=250)
    convs = sorted(tdf["conv_id"].unique())
    base = tdf[tdf["conv_id"].isin(convs[:70])]
    batch = tdf[tdf["conv_id"].isin(convs[70:])]
    bp = str(d / "b.parquet")
    base.to_parquet(bp, index=False)
    idx = str(d / "idx")
    IndexBuilder(idx, num_segments=4, head_df_threshold=10**9).build(
        spark.read.parquet(bp)
    )
    w = DeltaIndexWriter(idx)
    xp = str(d / "x.parquet")
    batch.to_parquet(xp, index=False)
    w.write_batch(spark.read.parquet(xp), 0, upsert=True)
    w.write_deletes(
        spark.createDataFrame(pd.DataFrame({"conv_id": convs[:5]})), 1
    )
    ms = MergedSearcher(idx)
    for q in ("turn spark", "merge"):
        deep = ms.topk(q, 10**6)
        assert deep
        got = walk(lambda kk, a: ms.topk(q, kk, after=a), 7)
        assert got == deep, q
        # pruned == exact under an arbitrary mid-ranking cursor
        cur = (deep[len(deep) // 2][1], deep[len(deep) // 2][0])
        assert ms.topk(q, 9, after=cur) == ms.topk_exact(q, 9, after=cur)
    q = "(spark OR index) AND NOT merge"
    deep = ms.topk_bool(q, 10**6)
    assert deep
    got = walk(lambda kk, a: ms.topk_bool(q, kk, after=a), 7)
    assert got == deep


# -------------------------------------------------- O(k) pool assertion


def test_cursor_page_pool_stays_small(built_index):
    """The structural scale claim: a deep cursor page never materializes
    an offset-deep pool — the partition cut in _topk_and keeps at most
    4k candidates after filtering (indirectly: results equal the deep
    slice while k stays tiny)."""
    s = LocalSearcher(built_index)
    deep = s.topk("turn", 10**6, mode="and", use_result_cache=False)
    assert len(deep) > 200
    depth = len(deep) - 20
    cur = (deep[depth - 1][1], deep[depth - 1][0])
    page = s.topk("turn", 5, after=cur, use_result_cache=False)
    assert page == deep[depth : depth + 5]
