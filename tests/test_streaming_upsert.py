"""End-to-end Structured Streaming UPSERT: readStream -> foreachBatch
write_batch(upsert=True) -> the merged live view equals a fresh rebuild
over the latest-version corpus.

The reference's live path has exactly this shape: AMQP messages arrive in
micro-batches and tableinator upserts rows by key with a content-hash gate
(SURVEY 2.1 rows 4-5; reference tableinator/batch_processor.py). Here the
stream carries both brand-new conversations and edited re-sends of
already-indexed ones; each micro-batch rides the delta commit protocol
with upsert=True, so prior versions are tombstoned in the same atomic
rename as the delta that replaces them -- including versions introduced by
an EARLIER micro-batch of the same stream (delta-over-delta replacement)
and keys replaced twice across the stream (last writer wins).
"""

from __future__ import annotations

import os
import time

import pandas as pd
import pytest

from discogsography_spark.analysis import get_analyzer
from discogsography_spark.corpus import make_transcripts
from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.query.engine import LocalSearcher
from discogsography_spark.streaming.incremental import (
    DeltaIndexWriter,
    MergedSearcher,
    compact,
    list_deltas,
)

BIGK = 10**6  # compare full (key, score) relations: live-view docIDs are
# arrival-ordered, rebuild docIDs dense-ranked, so page tiebreaks differ


def _edit(df: pd.DataFrame, marker: str) -> pd.DataFrame:
    out = df.copy()
    out["text"] = out["text"] + f" {marker}"
    return out


@pytest.fixture(scope="module")
def upsert_stream(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_upsert")
    tdf = make_transcripts(n_conversations=140, mean_turns=5, vocab_size=400)
    convs = sorted(tdf["conv_id"].unique())
    by_conv = lambda cs: tdf[tdf["conv_id"].isin(cs)]  # noqa: E731

    base = by_conv(convs[:90]).reset_index(drop=True)
    base_p = str(d / "base.parquet")
    base.to_parquet(base_p, index=False)
    idx = str(d / "idx")
    IndexBuilder(
        idx, num_segments=4, head_df_threshold=10**9, with_positions=True
    ).build(spark.read.parquet(base_p))

    # three stream files -> three micro-batches (maxFilesPerTrigger=1):
    #   f0: 20 new conversations + edits of 6 base conversations
    #   f1: 15 new conversations + edits of 5 conversations f0 introduced
    #       (replaces docs living in delta-000000, not the base)
    #   f2: second edit of 3 conversations f0 already edited once
    f0 = pd.concat(
        [by_conv(convs[90:110]), _edit(by_conv(convs[:6]), "editv2")],
        ignore_index=True,
    )
    f1 = pd.concat(
        [by_conv(convs[110:125]), _edit(by_conv(convs[90:95]), "editv3")],
        ignore_index=True,
    )
    f2 = _edit(by_conv(convs[:3]), "editv4")

    stream_dir = str(d / "stream_in")
    os.makedirs(stream_dir)
    for i, f in enumerate((f0, f1, f2)):
        p = os.path.join(stream_dir, f"part-{i}.parquet")
        f.to_parquet(p, index=False)
        # FileStreamSource orders by modification time: pin an ascending
        # sequence so micro-batch order is deterministic
        t = time.time() - 300 + i * 60
        os.utime(p, (t, t))

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

    # latest-version corpus: replay the same edits in micro-batch order
    latest = {c: by_conv([c]) for c in convs[:125]}
    for c in convs[:6]:
        latest[c] = _edit(by_conv([c]), "editv2")
    for c in convs[90:95]:
        latest[c] = _edit(by_conv([c]), "editv3")
    for c in convs[:3]:
        latest[c] = _edit(by_conv([c]), "editv4")
    alive = pd.concat(
        [latest[c] for c in convs[:125]], ignore_index=True
    )
    ref_p = str(d / "alive.parquet")
    alive.to_parquet(ref_p, index=False)
    ref_idx = str(d / "ref_idx")
    IndexBuilder(
        ref_idx, num_segments=4, head_df_threshold=10**9, with_positions=True
    ).build(spark.read.parquet(ref_p))

    return {
        "idx": idx,
        "ref_idx": ref_idx,
        "alive": alive,
        "convs": convs,
        "dir": str(d),
    }


def _docmap(index_dir):
    parts = [os.path.join(index_dir, "docs")]
    for dd in list_deltas(index_dir):
        p = os.path.join(dd, "docs")
        if os.path.isdir(p):
            parts.append(p)
    return pd.concat(
        [
            pd.read_parquet(p, columns=["doc_id", "conv_id", "turn_idx"])
            for p in parts
        ],
        ignore_index=True,
    )


def _keyed(docs_pdf):
    return {
        int(r["doc_id"]): (r["conv_id"], int(r["turn_idx"]))
        for _, r in docs_pdf.iterrows()
        if pd.notna(r["doc_id"])
    }


def _as_keyset(results, keymap):
    return sorted((keymap[d], round(s, 5)) for d, s in results)


def test_stream_commits_three_upsert_deltas(upsert_stream):
    deltas = list_deltas(upsert_stream["idx"])
    assert len(deltas) == 3
    import json

    tomb_counts = []
    for dd in deltas:
        with open(os.path.join(dd, "stats.json")) as fh:
            tomb_counts.append(json.load(fh).get("n_tombstoned", 0))
    # every micro-batch with an edited re-send tombstoned something
    assert all(c > 0 for c in tomb_counts), tomb_counts


def test_streamed_upserts_match_alive_rebuild(upsert_stream):
    ms = MergedSearcher(upsert_stream["idx"])
    ref = LocalSearcher(upsert_stream["ref_idx"])
    alive = upsert_stream["alive"]
    assert ms.n_docs == len(alive)
    assert abs(ms.avgdl - ref.meta.avgdl) < 1e-9

    live_keys = _keyed(_docmap(upsert_stream["idx"]))
    ref_keys = _keyed(_docmap(upsert_stream["ref_idx"]))

    an = get_analyzer("simple")
    toks = [t for text in alive["text"].head(50) for t in an.tokenize_py(text)]
    t_head, t_mid = toks[0], toks[len(toks) // 2]

    for q in [t_head, f"{t_head} {t_mid}", "editv2", "editv3", "editv4"]:
        got = _as_keyset(ms.topk(q, BIGK), live_keys)
        want = _as_keyset(ref.topk(q, BIGK, use_result_cache=False), ref_keys)
        assert got == want, q
        assert ms.topk(q, BIGK) == ms.topk_exact(q, BIGK), q

    for q in [f"{t_head} OR editv3", f"editv2 AND NOT editv4"]:
        got = _as_keyset(ms.topk_bool(q, BIGK), live_keys)
        want = _as_keyset(ref.topk_bool(q, BIGK, use_result_cache=False), ref_keys)
        assert got == want, q

    got = _as_keyset(ms.topk_phrase(f"{t_head} {t_mid}", BIGK), live_keys)
    want = _as_keyset(ref.topk_phrase(f"{t_head} {t_mid}", BIGK), ref_keys)
    assert got == want


def test_twice_replaced_keys_serve_only_final_version(upsert_stream):
    """convs[:3] were edited in micro-batch 0 (editv2) and again in
    micro-batch 2 (editv4): their editv2 versions must be invisible."""
    ms = MergedSearcher(upsert_stream["idx"])
    live_keys = _keyed(_docmap(upsert_stream["idx"]))
    twice = set(upsert_stream["convs"][:3])

    v2_convs = {live_keys[d][0] for d, _ in ms.topk("editv2", BIGK)}
    assert not (v2_convs & twice)  # editv2 copies of twice-edited convs dead
    v4_convs = {live_keys[d][0] for d, _ in ms.topk("editv4", BIGK)}
    assert v4_convs == twice


def test_compact_after_streamed_upserts_matches_rebuild(spark, upsert_stream):
    ms_pre = MergedSearcher(upsert_stream["idx"])
    pre_keys = _keyed(_docmap(upsert_stream["idx"]))
    an = get_analyzer("simple")
    toks = [
        t
        for text in upsert_stream["alive"]["text"].head(20)
        for t in an.tokenize_py(text)
    ]
    probe = toks[0]
    pre = _as_keyset(ms_pre.topk(probe, BIGK), pre_keys)

    compact(spark, upsert_stream["idx"])
    assert list_deltas(upsert_stream["idx"]) == []
    ls = LocalSearcher(upsert_stream["idx"])
    post_keys = _keyed(_docmap(upsert_stream["idx"]))
    post = _as_keyset(ls.topk(probe, BIGK, use_result_cache=False), post_keys)
    assert post == pre

    ref = LocalSearcher(upsert_stream["ref_idx"])
    assert ls.meta.n_docs == ref.meta.n_docs
    assert abs(ls.meta.avgdl - ref.meta.avgdl) < 1e-9
