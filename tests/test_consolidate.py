"""Minor compaction (consolidate_deltas): fold the delta tail into ONE
delta without touching the base — the LSM L0→L1 merge / Lucene small-tier
segment merge. Contract: the merged view is BIT-IDENTICAL before and
after across every query mode; batch idempotence survives folding;
full compact() composes on top; a crash between commit and cleanup
double-counts nothing."""

from __future__ import annotations

import json
import os

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
def cons_setup(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cons"))
    tdf = make_transcripts(n_conversations=120, mean_turns=5, vocab_size=300)
    convs = sorted(tdf["conv_id"].unique())
    base = tdf[tdf["conv_id"].isin(convs[:70])]
    bp = os.path.join(d, "base.parquet")
    base.to_parquet(bp, index=False)
    idx = os.path.join(d, "idx")
    IndexBuilder(
        idx, num_segments=4, with_positions=True, store_text=True
    ).build(spark.read.parquet(bp))
    w = DeltaIndexWriter(idx)
    bid = 0
    batches = []
    for i in range(5):
        cs = convs[70 + i * 8 : 70 + (i + 1) * 8]
        b = tdf[tdf["conv_id"].isin(cs)]
        if i == 2:
            # delta-over-delta: edit delta-0's conversations
            e = tdf[tdf["conv_id"].isin(convs[70:72])].copy()
            e["text"] = e["text"] + " editcons"
            b = pd.concat([b, e], ignore_index=True)
        p = os.path.join(d, f"b{i}.parquet")
        b.to_parquet(p, index=False)
        w.write_batch(spark.read.parquet(p), bid, upsert=True)
        batches.append((bid, p))
        bid += 1
    # tombstone-only delta deleting BASE conversations
    w.write_deletes(
        spark.createDataFrame(pd.DataFrame({"conv_id": convs[3:5]})), bid
    )
    bid += 1
    return {"idx": idx, "dir": d, "tdf": tdf, "batches": batches, "next_bid": bid}


def _probe(ms: MergedSearcher):
    out = []
    for q in ("spark index", "merge", "editcons"):
        out.append(ms.topk(q, 15))
        out.append(ms._topk_or(sorted(set(q.split())), 15))
        out.append(ms.topk_bool(f"{q.split()[0]} AND NOT zzq", 15))
        out.append(ms.topk_phrase(q, 10))
        out.append(ms.topk_within(q.split()[0], "index", 3, 10))
    return out


def test_consolidate_bit_identity_and_idempotence(cons_setup, spark):
    idx = cons_setup["idx"]
    before = _probe(MergedSearcher(idx))
    n_before = len(list_deltas(idx))
    assert n_before == 6
    assert consolidate_deltas(spark, idx) == 6
    after_dirs = list_deltas(idx)
    assert len(after_dirs) == 1
    assert os.path.basename(after_dirs[0]) == "delta-000000-c1"
    assert _probe(MergedSearcher(idx)) == before

    # the fixture HAS tombstones, so this view exercises the PROMOTED leg
    # inside the tombstone fast path (oversample-filter-retry on the
    # consolidated leg) — pin it against the exact reference evaluator
    mafter = MergedSearcher(idx)
    assert mafter._dead.size and mafter._promoted_dirs
    for q in ("spark index", "merge", "editcons"):
        assert mafter.topk(q, 15) == mafter.topk_exact(q, 15), q

    # structural integrity of the re-encoded consolidated delta (blob
    # decode, docID ascent, df agreement, positional stream == sum(tf))
    from discogsography_spark.index.fsck import fsck_index

    r = fsck_index(idx)
    assert r["errors"] == [], r["errors"]
    assert len(r["deltas"]) == 1 and r["deltas"][0]["terms"] > 0

    # folded batch idempotence: re-delivering batch 0 must be a no-op
    w = DeltaIndexWriter(idx)
    bid0, p0 = cons_setup["batches"][0]
    w.write_batch(spark.read.parquet(p0), bid0, upsert=True)
    assert len(list_deltas(idx)) == 1
    assert _probe(MergedSearcher(idx)) == before

    # consolidate again: single delta -> no-op
    assert consolidate_deltas(spark, idx) == 0

    # a NEW batch on top of the consolidated delta, then a second
    # consolidation generation
    tdf = cons_setup["tdf"]
    convs = sorted(tdf["conv_id"].unique())
    extra = tdf[tdf["conv_id"].isin(convs[110:])]
    p = os.path.join(cons_setup["dir"], "extra.parquet")
    extra.to_parquet(p, index=False)
    w.write_batch(spark.read.parquet(p), cons_setup["next_bid"], upsert=True)
    live2 = _probe(MergedSearcher(idx))
    assert consolidate_deltas(spark, idx) == 2
    dirs = list_deltas(idx)
    assert len(dirs) == 1 and os.path.basename(dirs[0]) == "delta-000000-c2"
    assert _probe(MergedSearcher(idx)) == live2


def _keyed(results, keymap):
    return sorted((keymap[int(d)], round(x, 9)) for d, x in results)


def test_consolidate_then_compact_preserves_relation(cons_setup, spark):
    """compact() composes on top of a consolidated delta: the keyed
    (conv_id, turn_idx, score) relation of the live view survives the
    docID reassignment."""
    from discogsography_spark.query.engine import LocalSearcher
    from discogsography_spark.streaming.incremental import compact

    idx = cons_setup["idx"]
    # live keymap spans base + every live delta docmap (ids are absolute)
    frames = [
        pd.read_parquet(
            os.path.join(root, "docs"),
            columns=["doc_id", "conv_id", "turn_idx"],
        )
        for root in [idx, *list_deltas(idx)]
    ]
    live_km = {
        int(r.doc_id): (r.conv_id, int(r.turn_idx))
        for fr in frames
        for r in fr.itertuples()
        if pd.notna(r.doc_id)
    }
    ms = MergedSearcher(idx)
    live_rel = {
        q: _keyed(ms.topk(q, 15), live_km)
        for q in ("spark index", "merge", "editcons")
    }
    compact(spark, idx)
    assert list_deltas(idx) == []
    s = LocalSearcher(idx)
    dm = pd.read_parquet(
        os.path.join(idx, "docs"), columns=["doc_id", "conv_id", "turn_idx"]
    )
    km = {
        int(r.doc_id): (r.conv_id, int(r.turn_idx)) for r in dm.itertuples()
    }
    for q, want in live_rel.items():
        assert _keyed(s.topk(q, 15), km) == want, q


def test_promoted_leg_parity_append_only(spark, tmp_path):
    """On a tombstone-free view, the consolidated delta serves as a
    PROMOTED pruned leg (LocalSearcher over its mini-manifest). Every
    mode must stay bit-identical to an unconsolidated twin of the same
    corpus AND to the exact reference evaluator."""
    d = str(tmp_path)
    tdf = make_transcripts(n_conversations=140, mean_turns=5, vocab_size=300)
    convs = sorted(tdf["conv_id"].unique())

    def build(tag, consolidate):
        idx = os.path.join(d, f"idx_{tag}")
        base = tdf[tdf["conv_id"].isin(convs[:80])]
        bp = os.path.join(d, f"b_{tag}.parquet")
        base.to_parquet(bp, index=False)
        IndexBuilder(idx, num_segments=4, with_positions=True).build(
            spark.read.parquet(bp)
        )
        w = DeltaIndexWriter(idx)
        for i in range(4):  # append-only: no tombstones anywhere
            cs = convs[80 + i * 15 : 80 + (i + 1) * 15]
            b = tdf[tdf["conv_id"].isin(cs)]
            p = os.path.join(d, f"{tag}{i}.parquet")
            b.to_parquet(p, index=False)
            w.write_batch(spark.read.parquet(p), i)
        if consolidate:
            assert consolidate_deltas(spark, idx) == 4
        return idx

    ma = MergedSearcher(build("plain", False))
    mb = MergedSearcher(build("cons", True))
    assert not mb._dead.size
    assert len(mb._promoted_dirs) == 1  # the leg actually engages
    for q in ("spark index", "merge", "turn token"):
        assert ma.topk(q, 20) == mb.topk(q, 20) == mb.topk_exact(q, 20), q
        u = sorted(set(q.split()))
        assert ma._topk_or(u, 20) == mb._topk_or(u, 20), ("or", q)
        bq = f"{q.split()[0]} AND NOT zzq"
        assert ma.topk_bool(bq, 15) == mb.topk_bool(bq, 15), ("bool", q)
        assert ma.topk_phrase(q, 10) == mb.topk_phrase(q, 10), ("phrase", q)


def test_router_auto_consolidation_policy(spark, tmp_path):
    """ShardedDeltaRouter(consolidate_every=N): a long-running stream
    keeps every shard's tail bounded (minor compaction fires in-band when
    a write leaves N deltas), and the view stays bit-identical to a
    policy-free twin of the same batch sequence."""
    from discogsography_spark.query.sharded import ShardedSearcher
    from discogsography_spark.streaming.incremental import ShardedDeltaRouter

    d = str(tmp_path)
    tdf = make_transcripts(n_conversations=80, mean_turns=4, vocab_size=250)
    convs = sorted(tdf["conv_id"].unique())
    mid = convs[40]

    def setup(tag, every):
        dirs = []
        for i, m in enumerate([tdf["conv_id"] < mid, tdf["conv_id"] >= mid]):
            base = tdf[m & tdf["conv_id"].isin(convs[:50])]
            p = os.path.join(d, f"{tag}{i}.parquet")
            base.to_parquet(p, index=False)
            idx = os.path.join(d, f"{tag}_shard{i}")
            IndexBuilder(idx, num_segments=2).build(spark.read.parquet(p))
            dirs.append(idx)
        r = ShardedDeltaRouter(
            dirs, [(None, mid), (mid, None)], consolidate_every=every
        )
        return dirs, r

    batches = [convs[50 + i * 4 : 50 + (i + 1) * 4] for i in range(7)]
    dirs_a, ra = setup("auto", 3)
    dirs_b, rb = setup("plain", None)
    for bid, cs in enumerate(b for b in batches if b):
        bdf = spark.createDataFrame(tdf[tdf["conv_id"].isin(cs)])
        ra.write_batch(bdf, bid)
        rb.write_batch(bdf, bid)
        for sd in dirs_a:  # the policy holds the bound at every step
            assert len(list_deltas(sd)) < 3, sd

    sa, sb = ShardedSearcher(dirs_a, parallel=False), ShardedSearcher(
        dirs_b, parallel=False
    )
    try:
        for q in ("spark index", "merge"):
            assert sa.topk(q, 20) == sb.topk(q, 20), q
    finally:
        sa.close()
        sb.close()
    # the plain twin accumulated real tails; the policy twin stayed flat
    assert any(len(list_deltas(sd)) >= 3 for sd in dirs_b)


def test_crash_between_commit_and_cleanup(spark, tmp_path):
    """Simulate the crash window: consolidated stats.json committed but
    replaced dirs still on disk — list_deltas must see ONLY the
    consolidated delta, and the next consolidate cleans up."""
    d = str(tmp_path)
    tdf = make_transcripts(n_conversations=40, mean_turns=4, vocab_size=200)
    convs = sorted(tdf["conv_id"].unique())
    base = tdf[tdf["conv_id"].isin(convs[:25])]
    bp = os.path.join(d, "base.parquet")
    base.to_parquet(bp, index=False)
    idx = os.path.join(d, "idx")
    IndexBuilder(idx, num_segments=2).build(spark.read.parquet(bp))
    w = DeltaIndexWriter(idx)
    for i in range(3):
        b = tdf[tdf["conv_id"].isin(convs[25 + i * 5 : 30 + i * 5])]
        p = os.path.join(d, f"b{i}.parquet")
        b.to_parquet(p, index=False)
        w.write_batch(spark.read.parquet(p), i)
    before = MergedSearcher(idx).topk("spark", 10)
    assert consolidate_deltas(spark, idx) == 3
    cons = list_deltas(idx)[0]
    # resurrect one replaced dir (as if cleanup crashed mid-way)
    ghost = os.path.join(os.path.dirname(cons), "delta-000001")
    os.makedirs(ghost)
    with open(os.path.join(ghost, "stats.json"), "w") as f:
        json.dump({"n_docs": 999, "total_tokens": 1, "doc_offset": 0,
                   "batch_id": 1}, f)
    assert [os.path.basename(x) for x in list_deltas(idx)] == [
        "delta-000000-c1"
    ]
    assert MergedSearcher(idx).topk("spark", 10) == before
    # next consolidate is a no-op that still cleans the ghost
    assert consolidate_deltas(spark, idx) == 0
    assert not os.path.isdir(ghost)
