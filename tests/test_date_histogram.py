"""Date-histogram aggregation over the matched set (Elasticsearch
date_histogram; the reference's time-bucketed dashboard counts scoped to
a full-text match): dense period codes factorized once from the docmap's
timestamp column, one bincount per query, summable across doc-disjoint
shards, alive-only on the live view."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from discogsography_spark.corpus import make_transcripts
from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.query.serving import SearchService


def pandas_histogram(tdf_matched: pd.Series, period: str) -> list[tuple[str, int]]:
    lab = pd.to_datetime(tdf_matched).dt.to_period(period).astype(str)
    vc = lab.value_counts()
    return sorted((str(k), int(v)) for k, v in vc.items())


def test_date_histogram_matches_pandas(built_index, corpus_dir):
    svc = SearchService(built_index)
    tdf = pd.read_parquet(
        os.path.join(corpus_dir, "transcripts.parquet")
    ).sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    for q in ("turn spark", "merge"):
        matched = svc.matched_docs(q)
        assert matched.size > 0
        for interval, per in (("month", "M"), ("day", "D"), ("year", "Y")):
            got = svc.date_histogram(matched, "ts", interval)
            # docIDs are the dense (conv_id, turn_idx) rank == row order
            want = pandas_histogram(tdf["ts"].iloc[matched], per)
            assert sorted(got) == want, (q, interval)
            assert got == sorted(got)  # label-ASC == chronological
            assert sum(n for _, n in got) == matched.size


def test_date_histogram_invalid_interval(built_index):
    svc = SearchService(built_index)
    with pytest.raises(ValueError, match="interval"):
        svc.date_histogram(np.arange(3), "ts", "fortnight")


@pytest.fixture(scope="module")
def hist_shards(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("hist_shards")
    tdf = make_transcripts(n_conversations=60, mean_turns=5, vocab_size=200)
    convs = sorted(tdf["conv_id"].unique())
    full_p = str(d / "full.parquet")
    tdf.to_parquet(full_p, index=False)
    full_idx = str(d / "full_idx")
    IndexBuilder(full_idx, num_segments=2).build(spark.read.parquet(full_p))
    dirs = []
    for i, lo in enumerate(range(0, 60, 30)):
        part = tdf[tdf["conv_id"].isin(convs[lo : lo + 30])]
        p = str(d / f"s{i}.parquet")
        part.to_parquet(p, index=False)
        idx = str(d / f"shard{i}")
        IndexBuilder(idx, num_segments=2).build(spark.read.parquet(p))
        dirs.append(idx)
    return {"full_idx": full_idx, "shards": dirs}


def test_date_histogram_sharded_sums_to_single(hist_shards):
    from discogsography_spark.query.serving import ShardedSearchService

    single = SearchService(hist_shards["full_idx"])
    sh = ShardedSearchService(hist_shards["shards"], parallel=False)
    try:
        q = "turn spark"
        m_single = single.matched_docs(q)
        per_shard = [svc.matched_docs(q) for svc in sh.services]
        got = sh.date_histogram(per_shard, "ts", "month")
        want = single.date_histogram(m_single, "ts", "month")
        assert got == want
        assert sum(n for _, n in got) == sum(s.size for s in per_shard)
    finally:
        sh.close()


def test_date_histogram_live_alive_only(spark, tmp_path_factory):
    """Tombstoned turns never count; upserted turns count once with their
    latest timestamp — the histogram equals a pandas recompute over the
    alive frame."""
    from discogsography_spark.query.serving import MergedSearchService
    from discogsography_spark.streaming.incremental import (
        DeltaIndexWriter,
        list_deltas,
    )

    d = tmp_path_factory.mktemp("hist_live")
    tdf = make_transcripts(n_conversations=50, mean_turns=5, vocab_size=200)
    convs = sorted(tdf["conv_id"].unique())
    base = tdf[tdf["conv_id"].isin(convs[:40])]
    batch = tdf[tdf["conv_id"].isin(convs[40:])]
    dead = convs[:4]
    bp = str(d / "b.parquet")
    base.to_parquet(bp, index=False)
    idx = str(d / "idx")
    IndexBuilder(idx, num_segments=2).build(spark.read.parquet(bp))
    w = DeltaIndexWriter(idx)
    xp = str(d / "x.parquet")
    batch.to_parquet(xp, index=False)
    w.write_batch(spark.read.parquet(xp), 0, upsert=True)
    w.write_deletes(
        spark.createDataFrame(pd.DataFrame({"conv_id": dead})), 1
    )
    svc = MergedSearchService(idx)
    q = "turn"
    matched = svc.matched_docs(q)
    got = svc.date_histogram(matched, "ts", "month")

    # alive frame keyed the same way the view keys docs
    parts = [os.path.join(idx, "docs")] + [
        os.path.join(dd, "docs")
        for dd in list_deltas(idx)
        if os.path.isdir(os.path.join(dd, "docs"))
    ]
    dm = pd.concat(
        [pd.read_parquet(p, columns=["doc_id", "ts"]) for p in parts],
        ignore_index=True,
    ).set_index("doc_id")
    want = pandas_histogram(dm["ts"].loc[matched], "M")
    assert sorted(got) == want
    assert sum(n for _, n in got) == matched.size
