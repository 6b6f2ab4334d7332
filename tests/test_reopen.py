"""Live-view reopen(): a long-lived serving node advances to newly
committed deltas without reconstructing its searcher — Lucene's
SearcherManager.maybeRefresh / the reference's consumers seeing each
batch as it lands (tableinator/batch_processor.py:151-215).

Reader model under test:
- construction SNAPSHOTS committed deltas — commits made while serving
  are invisible until reopen() (no torn reads mid-query);
- reopen() returns False (pure no-op, caches kept) when nothing changed,
  True after atomically swapping in the fresh view;
- after reopen, every mode is bit-identical to a freshly constructed
  searcher — queries warmed on the OLD snapshot must not serve stale
  term caches, matched sets, stats, or expansions;
- still-valid per-delta state carries over (segment readers and promoted
  leg searchers keyed by surviving delta dir; the base searcher when the
  base is untouched), and consolidation — which REPLACES delta dirs —
  drops the folded entries;
- the services rebuild facet/text/collapse/context arrays on reopen;
  the sharded tier reopens worker-held searchers via one RPC per shard.
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest

from discogsography_spark.corpus import make_transcripts
from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.streaming.incremental import (
    DeltaIndexWriter,
    MergedSearcher,
    consolidate_deltas,
    list_deltas,
)


@pytest.fixture(scope="module")
def reopen_env(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("reopen")
    tdf = make_transcripts(n_conversations=120, mean_turns=5, vocab_size=300)
    convs = sorted(tdf["conv_id"].unique())
    base = tdf[tdf["conv_id"].isin(convs[:80])]
    base_p = str(d / "base.parquet")
    base.to_parquet(base_p, index=False)
    idx = str(d / "idx")
    IndexBuilder(
        idx, num_segments=4, with_positions=True, store_text=True
    ).build(spark.read.parquet(base_p))

    stream_dir = str(d / "stream_in")
    os.makedirs(stream_dir)
    state = {"n_files": 0, "t0": time.time() - 600}

    def commit_via_stream(frame: pd.DataFrame) -> None:
        """One foreachBatch micro-batch commit — the serving node's writer
        side (FileStreamSource + availableNow, checkpoint carried across
        calls so batch ids keep incrementing)."""
        i = state["n_files"]
        p = os.path.join(stream_dir, f"part-{i}.parquet")
        frame.to_parquet(p, index=False)
        t = state["t0"] + i * 30
        os.utime(p, (t, t))
        state["n_files"] = i + 1
        writer = DeltaIndexWriter(idx)
        stream = (
            spark.readStream.schema(spark.read.parquet(base_p).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(stream_dir)
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: writer.write_batch(df, bid, upsert=True)
            )
            .option("checkpointLocation", os.path.join(str(d), "chk"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    return {
        "idx": idx,
        "tdf": tdf,
        "convs": convs,
        "commit": commit_via_stream,
        "dir": str(d),
    }


def _probe(ms) -> list:
    return [
        ms.topk("spark index", 15),
        ms.topk_bool("(spark OR index) AND NOT zzq", 15),
        ms.topk_phrase("spark index", 10),
        ms.topk_within("spark", "index", 3, 10),
        ms.expand_prefix("spa", 16),
    ]


def test_reopen_snapshot_isolation_and_identity(reopen_env):
    idx, tdf, convs = (
        reopen_env["idx"],
        reopen_env["tdf"],
        reopen_env["convs"],
    )
    ms = MergedSearcher(idx)
    before = _probe(ms)  # warms every term/merged cache on the snapshot
    assert ms.reopen() is False  # nothing committed yet — pure no-op

    # foreachBatch commits WHILE ms serves: 20 new convs + edits of 3
    # base convs (tombstones in the base id range)
    edit = tdf[tdf["conv_id"].isin(convs[:3])].copy()
    edit["text"] = edit["text"] + " reopenmark"
    reopen_env["commit"](
        pd.concat(
            [tdf[tdf["conv_id"].isin(convs[80:100])], edit],
            ignore_index=True,
        )
    )

    # snapshot isolation: the open searcher still serves the OLD view
    assert _probe(ms) == before
    assert ms.topk_bool("reopenmark", 10) == []

    # reopen advances atomically; results equal a FRESH searcher across
    # every mode (warm caches must not leak stale state)
    assert ms.reopen() is True
    fresh = MergedSearcher(idx)
    assert _probe(ms) == _probe(fresh)
    got = ms.topk_bool("reopenmark", 10)
    assert got and got == fresh.topk_bool("reopenmark", 10)
    # second reopen with no new commits: no-op
    assert ms.reopen() is False
    assert ms.topk_bool("reopenmark", 10) == got


def test_reopen_carries_surviving_delta_state(reopen_env):
    idx, tdf, convs = (
        reopen_env["idx"],
        reopen_env["tdf"],
        reopen_env["convs"],
    )
    ms = MergedSearcher(idx)
    ms.topk("spark index", 10)  # warm delta readers for current deltas
    old_readers = dict(ms._delta_readers)
    assert old_readers  # the first commit's delta is open

    reopen_env["commit"](tdf[tdf["conv_id"].isin(convs[100:110])])
    assert ms.reopen() is True
    # surviving delta dirs keep their reader objects (no re-open cost)
    for key, rd in old_readers.items():
        if rd is not None and key[0] in ms._delta_dirs:
            assert ms._delta_readers.get(key) is rd

    # consolidation REPLACES delta dirs: reopen drops folded entries and
    # opens the promoted leg
    from discogsography_spark.session import get_spark

    spark = get_spark(app_name="reopen-consolidate")
    n = consolidate_deltas(spark, idx)
    assert n >= 2
    assert ms.reopen() is True
    assert ms._promoted_dirs and not any(
        key[0] not in ms._delta_dirs for key in ms._delta_readers
    )
    fresh = MergedSearcher(idx)
    assert _probe(ms) == _probe(fresh)
    assert ms.reopen() is False


def test_service_reopen_rebuilds_facets_and_text(reopen_env):
    from discogsography_spark.query.serving import MergedSearchService

    idx, tdf, convs = (
        reopen_env["idx"],
        reopen_env["tdf"],
        reopen_env["convs"],
    )
    svc = MergedSearchService(idx, facet_defs={"role": "role"})
    r0 = svc.search("spark index", 5, facets=["role"], highlight=True)
    edit = tdf[tdf["conv_id"].isin(convs[110:120])].copy()
    edit["text"] = edit["text"] + " svcreopen"
    reopen_env["commit"](edit)
    # snapshot isolation at the service layer too
    assert svc.search("svcreopen", 5).total_matched == 0
    assert svc.reopen() is True
    fresh = MergedSearchService(idx, facet_defs={"role": "role"})
    got = svc.search("svcreopen", 5, facets=["role"], highlight=True)
    want = fresh.search("svcreopen", 5, facets=["role"], highlight=True)
    assert got.results == want.results
    assert got.facets == want.facets
    assert got.headlines == want.headlines
    assert got.total_matched == want.total_matched and got.total_matched > 0
    # unchanged view: no-op, previous responses still served identically
    assert svc.reopen() is False
    again = svc.search("spark index", 5, facets=["role"], highlight=True)
    ref = fresh.search("spark index", 5, facets=["role"], highlight=True)
    assert again.results == ref.results and again.facets == ref.facets
    del r0


def test_sharded_live_reopen(spark, tmp_path_factory):
    """Worker-pool live tier: a commit to ONE shard becomes visible on
    reopen; results equal a freshly constructed sharded searcher."""
    from discogsography_spark.query.sharded import ShardedSearcher

    d = tmp_path_factory.mktemp("reopensh")
    tdf = make_transcripts(n_conversations=80, mean_turns=5, vocab_size=250)
    convs = sorted(tdf["conv_id"].unique())
    mid = convs[len(convs) // 2]
    dirs = []
    for i, m in enumerate([tdf["conv_id"] < mid, tdf["conv_id"] >= mid]):
        p = str(d / f"s{i}.parquet")
        tdf[m].to_parquet(p, index=False)
        sidx = str(d / f"s{i}_idx")
        IndexBuilder(sidx, num_segments=2, with_positions=True).build(
            spark.read.parquet(p)
        )
        dirs.append(sidx)
    # seed one delta so the tier opens LIVE
    seed = tdf[tdf["conv_id"].isin(convs[:2])].copy()
    seed["text"] = seed["text"] + " seedmark"
    sp = str(d / "seed.parquet")
    seed.to_parquet(sp, index=False)
    DeltaIndexWriter(dirs[0]).write_batch(
        spark.read.parquet(sp), 0, upsert=True
    )
    for parallel in (False, True):
        sh = ShardedSearcher(dirs, parallel=parallel)
        try:
            assert sh.live
            assert sh.reopen() is False
            before = sh.topk("spark index", 10)
            edit = tdf[tdf["conv_id"].isin(convs[-2:])].copy()
            edit["text"] = edit["text"] + f" shmark{int(parallel)}"
            ep = str(d / f"e{int(parallel)}.parquet")
            edit.to_parquet(ep, index=False)
            DeltaIndexWriter(dirs[1]).write_batch(
                spark.read.parquet(ep), 10 + int(parallel), upsert=True
            )
            # snapshot isolation, then reopen
            assert sh.topk_bool(f"shmark{int(parallel)}", 5) == []
            assert sh.reopen() is True
            fresh = ShardedSearcher(dirs, parallel=False)
            assert sh.topk("spark index", 10) == fresh.topk("spark index", 10)
            got = sh.topk_bool(f"shmark{int(parallel)}", 5)
            assert got and got == fresh.topk_bool(
                f"shmark{int(parallel)}", 5
            )
            assert before  # old page was served from the old snapshot
        finally:
            sh.close()
