"""Conversation-context retrieval (query/context.py): the alive turns
surrounding a hit, by TURN distance within the hit's conversation —
checked against pandas recomputation on single, sharded, and live merged
(tombstone) paths, plus the DataFrame mirror."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from discogsography_spark.corpus import make_transcripts
from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.query.context import ContextIndex
from discogsography_spark.query.serving import SearchService


def _pd_window(pdf: pd.DataFrame, doc_id: int, w: int) -> list[tuple]:
    row = pdf[pdf["doc_id"] == doc_id]
    if row.empty:
        return []
    conv, t = row.iloc[0]["conv_id"], row.iloc[0]["turn_idx"]
    got = pdf[
        (pdf["conv_id"] == conv) & ((pdf["turn_idx"] - t).abs() <= w)
    ].sort_values("turn_idx")
    return [
        (int(r["doc_id"]), str(r["conv_id"]), int(r["turn_idx"]))
        for _, r in got.iterrows()
    ]


def test_context_index_random_docmap():
    rng = np.random.default_rng(7)
    rows = []
    did = 0
    for conv in range(30):
        turns = sorted(rng.choice(40, size=rng.integers(1, 12), replace=False))
        for t in turns:
            rows.append((did, f"c{conv:03d}", int(t)))
            did += 1
    pdf = pd.DataFrame(rows, columns=["doc_id", "conv_id", "turn_idx"])
    # shuffle row order AND punch id holes (dead slots) — ContextIndex
    # must not assume contiguity or order
    pdf = pdf.sample(frac=0.9, random_state=3).reset_index(drop=True)
    pdf["doc_id"] = pdf["doc_id"] * 2 + 1
    idx = ContextIndex(pdf, id_space=int(pdf["doc_id"].max()) + 1)
    for d in pdf["doc_id"].sample(25, random_state=5):
        for w in (0, 1, 3):
            assert idx.window(int(d), w) == _pd_window(pdf, int(d), w)
    # absent id (a punched hole) -> []
    assert idx.window(0, 2) == []


@pytest.fixture(scope="module")
def ctx_setup(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("ctx")
    tdf = make_transcripts(n_conversations=80, mean_turns=7, vocab_size=300)
    p = str(d / "t.parquet")
    tdf.to_parquet(p, index=False)
    idx = str(d / "idx")
    IndexBuilder(idx, num_segments=2, store_text=True).build(
        spark.read.parquet(p)
    )
    svc = SearchService(idx)
    tdf = tdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    tdf["doc_id"] = range(len(tdf))
    return svc, tdf, str(d)


def test_service_context_matches_scan(ctx_setup):
    svc, tdf, _ = ctx_setup
    hits = svc.searcher.topk("spark index", 10)
    assert hits
    for doc, _s in hits:
        assert svc.context(doc, 2) == _pd_window(tdf, doc, 2)
    # hit always included; text variant carries the turn text
    doc = hits[0][0]
    rows = svc.context(doc, 1, text=True)
    assert any(d == doc for d, _c, _t, _x in rows)
    texts = tdf.set_index("doc_id")["text"]
    for d, _c, _t, x in rows:
        assert x == texts[d]


def test_sharded_context_matches_single(ctx_setup, spark, tmp_path_factory):
    from discogsography_spark.query.serving import ShardedSearchService

    svc, tdf, _ = ctx_setup
    d = tmp_path_factory.mktemp("ctx_shards")
    convs = sorted(tdf["conv_id"].unique())
    mid = convs[len(convs) // 2]
    dirs = []
    for i, m in enumerate(
        [tdf["conv_id"] < mid, tdf["conv_id"] >= mid]
    ):
        p = str(d / f"s{i}.parquet")
        tdf[m].drop(columns=["doc_id"]).to_parquet(p, index=False)
        idx = str(d / f"s{i}_idx")
        IndexBuilder(idx, num_segments=2).build(spark.read.parquet(p))
        dirs.append(idx)
    sh = ShardedSearchService(dirs, parallel=False)
    try:
        for doc, _s in sh.sharded.topk("spark index", 10):
            assert sh.context(doc, 2) == _pd_window(tdf, doc, 2)
    finally:
        sh.close()


def test_merged_context_alive_only(spark, tmp_path_factory):
    from discogsography_spark.query.serving import MergedSearchService
    from discogsography_spark.streaming.incremental import DeltaIndexWriter

    d = tmp_path_factory.mktemp("ctx_live")
    tdf = make_transcripts(n_conversations=40, mean_turns=8, vocab_size=200)
    tdf = tdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    convs = sorted(tdf["conv_id"].unique())
    base_p = str(d / "base.parquet")
    tdf.to_parquet(base_p, index=False)
    idx = str(d / "idx")
    IndexBuilder(idx, num_segments=2, store_text=True).build(
        spark.read.parquet(base_p)
    )
    w = DeltaIndexWriter(idx)
    # upsert ONE mid-conversation turn of conv[0] (replacement lives in the
    # delta, far from base siblings) and delete one other turn of the same
    # conversation
    c0 = tdf[tdf["conv_id"] == convs[0]].reset_index(drop=True)
    assert len(c0) >= 5
    up = c0.iloc[[2]].copy()
    up["text"] = up["text"] + " livemarker"
    up_p = str(d / "up.parquet")
    up.to_parquet(up_p, index=False)
    w.write_batch(spark.read.parquet(up_p), 0, upsert=True)
    dele = c0.iloc[[3]][["conv_id", "turn_idx"]]
    w.write_deletes(spark.createDataFrame(dele), 1)

    svc = MergedSearchService(idx)
    # the alive frame: base minus replaced/deleted turns, plus the delta row
    alive = pd.concat(
        [
            tdf[
                ~(
                    (tdf["conv_id"] == convs[0])
                    & (tdf["turn_idx"].isin([c0.iloc[2]["turn_idx"], c0.iloc[3]["turn_idx"]]))
                )
            ],
            up,
        ],
        ignore_index=True,
    )
    # look the upserted turn's new docID up through the live search itself
    hits = svc.searcher.topk("livemarker", 5)
    assert len(hits) == 1
    new_id = hits[0][0]
    rows = svc.context(new_id, 2)
    want_turns = sorted(
        int(t)
        for t in alive[alive["conv_id"] == convs[0]]["turn_idx"]
        if abs(int(t) - int(c0.iloc[2]["turn_idx"])) <= 2
    )
    assert [t for _d, _c, t in rows] == want_turns
    # the deleted turn is the gap
    assert int(c0.iloc[3]["turn_idx"]) not in [t for _d, _c, t in rows]
    # and the upserted doc appears as ITSELF (the delta docID)
    assert any(dd == new_id for dd, _c, _t in rows)


def test_context_dataframe_mirror(ctx_setup, spark):
    from discogsography_spark.query.dataframe_bm25 import (
        context_windows_dataframe,
    )

    svc, tdf, base = ctx_setup
    docs = spark.createDataFrame(tdf[["doc_id", "conv_id", "turn_idx"]])
    hits = svc.searcher.topk("spark index", 5)
    hits_df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [d for d, _ in hits]})
    )
    got = context_windows_dataframe(docs, hits_df, window=2).collect()
    want = [
        (hd, d, c, t)
        for hd, _s in hits
        for d, c, t in _pd_window(tdf, hd, 2)
    ]
    got_rows = [
        (r["hit_doc_id"], r["doc_id"], r["conv_id"], r["turn_idx"]) for r in got
    ]
    assert sorted(got_rows) == sorted(want)
