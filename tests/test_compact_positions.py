"""Positional payloads must survive streaming appends and compaction.

Regression for two coupled defects: (1) DeltaIndexWriter dropped positions,
so a phrase-capable base silently degraded as batches arrived; (2) compact()
re-encoded without pos_blob, destroying ALL positional postings while the
manifest still claimed with_positions=true, leaving topk_phrase broken.

Now: deltas carry per-posting positions when the base is positional, and
compact() merges pos_blob through the distributed docID remap — the compacted
index answers phrase queries identically to a fresh positional build over the
union corpus.
"""

from __future__ import annotations

import pytest

from discogsography_spark.corpus import make_transcripts
from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.query.engine import LocalSearcher
from discogsography_spark.streaming.incremental import (
    DeltaIndexWriter,
    compact,
    list_deltas,
)

PHRASES = [("spark index", 10), ("turn turn", 8), ("merge", 10)]


@pytest.fixture()
def pos_stream(spark, tmp_path):
    """Positional base over the LAST third of convs; two deltas arriving in
    DESCENDING conv order (the compact determinism-repair scenario)."""
    tdf = make_transcripts(n_conversations=120, mean_turns=6, vocab_size=400)
    convs = sorted(tdf["conv_id"].unique())
    base = tdf[tdf["conv_id"].isin(convs[80:])]
    base_p = str(tmp_path / "base.parquet")
    base.to_parquet(base_p, index=False)
    idx_dir = str(tmp_path / "idx")
    IndexBuilder(
        idx_dir, num_segments=4, head_df_threshold=150, head_salts=3,
        with_positions=True,
    ).build(spark.read.parquet(base_p))
    writer = DeltaIndexWriter(idx_dir)
    for i, cs in enumerate([convs[40:80], convs[:40]]):
        chunk = tdf[tdf["conv_id"].isin(cs)]
        p = str(tmp_path / f"chunk{i}.parquet")
        chunk.to_parquet(p, index=False)
        writer.write_batch(spark.read.parquet(p), i)
    return {"idx": idx_dir, "tdf": tdf, "tmp": tmp_path}


def test_compacted_phrase_matches_fresh_positional_build(spark, pos_stream):
    n = compact(spark, pos_stream["idx"])
    assert n == 2
    assert list_deltas(pos_stream["idx"]) == []

    fresh_p = str(pos_stream["tmp"] / "union.parquet")
    pos_stream["tdf"].to_parquet(fresh_p, index=False)
    fresh_dir = str(pos_stream["tmp"] / "fresh_idx")
    IndexBuilder(
        fresh_dir, num_segments=4, head_df_threshold=150, head_salts=3,
        with_positions=True,
    ).build(spark.read.parquet(fresh_p))

    compacted = LocalSearcher(pos_stream["idx"])
    fresh = LocalSearcher(fresh_dir)
    assert compacted.meta.stats.get("with_positions") is True
    n_nonempty = 0
    for phrase, k in PHRASES:
        got = compacted.topk_phrase(phrase, k)
        want = fresh.topk_phrase(phrase, k)
        assert got == want, phrase
        n_nonempty += bool(got)
    assert n_nonempty >= 2
    # AND path equally intact after the distributed remap
    for q in ["spark index", "merge window"]:
        assert compacted.topk(q, 10) == fresh.topk(q, 10), q


def test_compact_rejects_positionless_delta(spark, pos_stream, tmp_path):
    """A delta written WITHOUT positions under a positional manifest must
    fail compaction loudly, not silently strip phrase capability."""
    import glob
    import os

    import pandas as pd

    idx = pos_stream["idx"]
    # corrupt one delta: blank its pos_blob column (simulates a writer from
    # before positional deltas existed)
    delta = list_deltas(idx)[0]
    for f in glob.glob(os.path.join(delta, "segments", "seg=*", "*.parquet")):
        pdf = pd.read_parquet(f)
        if len(pdf):
            pdf["pos_blob"] = b""
            pdf.to_parquet(f, index=False)
        crc = os.path.join(os.path.dirname(f), f".{os.path.basename(f)}.crc")
        if os.path.exists(crc):
            os.remove(crc)  # rewritten in place — stale hadoop checksum
    with pytest.raises(Exception, match="positional|with_positions"):
        compact(spark, idx)


def test_merged_view_phrase_before_compact(spark, tmp_path):
    """Phrase queries work on the LIVE merged (base+delta) view — capability
    does not pause between compactions. In-order batches keep merged docIDs
    equal to a fresh build's, so the comparison is exact."""
    from discogsography_spark.streaming.incremental import MergedSearcher

    tdf = make_transcripts(n_conversations=90, mean_turns=6, vocab_size=300)
    convs = sorted(tdf["conv_id"].unique())
    base = tdf[tdf["conv_id"].isin(convs[:30])]
    base_p = str(tmp_path / "base.parquet")
    base.to_parquet(base_p, index=False)
    idx_dir = str(tmp_path / "idx")
    IndexBuilder(idx_dir, num_segments=2, with_positions=True).build(
        spark.read.parquet(base_p)
    )
    writer = DeltaIndexWriter(idx_dir)
    for i, cs in enumerate([convs[30:60], convs[60:]]):  # IN order
        p = str(tmp_path / f"c{i}.parquet")
        tdf[tdf["conv_id"].isin(cs)].to_parquet(p, index=False)
        writer.write_batch(spark.read.parquet(p), i)

    fresh_p = str(tmp_path / "union.parquet")
    tdf.to_parquet(fresh_p, index=False)
    fresh_dir = str(tmp_path / "fresh")
    IndexBuilder(fresh_dir, num_segments=2, with_positions=True).build(
        spark.read.parquet(fresh_p)
    )
    merged = MergedSearcher(idx_dir)
    fresh = LocalSearcher(fresh_dir)
    n_nonempty = 0
    for phrase, k in [("spark index", 10), ("turn turn", 8), ("merge", 10)]:
        got = merged.topk_phrase(phrase, k)
        want = fresh.topk_phrase(phrase, k)
        assert got == want, phrase
        n_nonempty += bool(got)
    assert n_nonempty >= 2


def test_merged_bool_with_phrases_before_compaction(spark, pos_stream):
    """Boolean queries with quoted phrases answer on the LIVE merged
    base+delta view. The merged view's docID order differs from a fresh
    rebuild until compact() (batch-arrival order), so verify against a
    python oracle built in the SAME arrival order."""
    import pandas as pd

    from discogsography_spark.oracle import bm25_topk_bool, build_oracle_index
    from discogsography_spark.streaming.incremental import MergedSearcher

    tdf = pos_stream["tdf"]
    convs = sorted(tdf["conv_id"].unique())
    # arrival order: base (last third), then delta chunks in written order
    parts = [
        tdf[tdf["conv_id"].isin(convs[80:])],
        tdf[tdf["conv_id"].isin(convs[40:80])],
        tdf[tdf["conv_id"].isin(convs[:40])],
    ]
    rows = []
    offset_tag = 0
    for part in parts:
        ordered = part.sort_values(["conv_id", "turn_idx"])
        for conv, turn, text in zip(ordered["conv_id"], ordered["turn_idx"], ordered["text"]):
            rows.append((f"{offset_tag:04d}-{conv}", int(turn), text))
        offset_tag += 1
    oracle = build_oracle_index(rows)

    m = MergedSearcher(pos_stream["idx"])
    n_nonempty = 0
    for q in (
        '"spark index" OR merge',
        'query AND NOT "spark index"',
        '("spark index" OR "index spark") AND NOT merge',
    ):
        got = m.topk_bool(q, 10)
        want = bm25_topk_bool(oracle, q, 10)
        assert got == want, q
        n_nonempty += bool(got)
    assert n_nonempty >= 2


def test_merged_view_within_and_prefix_bool_before_compact(spark, tmp_path):
    """The two remaining merged-view parity cells: proximity (`a <N> b`) and
    prefix-in-boolean both answer on the LIVE base+delta view. In-order
    batches keep merged docIDs equal to a fresh build's, so both compare
    exactly against a fresh whole-corpus index."""
    from discogsography_spark.streaming.incremental import MergedSearcher

    tdf = make_transcripts(n_conversations=90, mean_turns=6, vocab_size=300)
    convs = sorted(tdf["conv_id"].unique())
    base = tdf[tdf["conv_id"].isin(convs[:30])]
    base_p = str(tmp_path / "base.parquet")
    base.to_parquet(base_p, index=False)
    idx_dir = str(tmp_path / "idx")
    IndexBuilder(idx_dir, num_segments=2, with_positions=True).build(
        spark.read.parquet(base_p)
    )
    writer = DeltaIndexWriter(idx_dir)
    for i, cs in enumerate([convs[30:60], convs[60:]]):  # IN order
        p = str(tmp_path / f"c{i}.parquet")
        tdf[tdf["conv_id"].isin(cs)].to_parquet(p, index=False)
        writer.write_batch(spark.read.parquet(p), i)

    fresh_p = str(tmp_path / "union.parquet")
    tdf.to_parquet(fresh_p, index=False)
    fresh_dir = str(tmp_path / "fresh")
    IndexBuilder(fresh_dir, num_segments=2, with_positions=True).build(
        spark.read.parquet(fresh_p)
    )
    merged = MergedSearcher(idx_dir)
    fresh = LocalSearcher(fresh_dir)

    n_nonempty = 0
    for w1, w2, win, k in [
        ("spark", "index", 3, 10),
        ("index", "spark", 2, 10),
        ("turn", "turn", 2, 8),
        ("merge", "window", 5, 10),
    ]:
        got = merged.topk_within(w1, w2, win, k)
        want = fresh.topk_within(w1, w2, win, k)
        assert got == want, (w1, w2, win)
        n_nonempty += bool(got)
    assert n_nonempty >= 2

    # prefix expansion spans base AND delta vocabularies
    assert merged.expand_prefix("spa") == fresh.expand_prefix("spa")
    assert merged.expand_prefix("w0", 64) == fresh.expand_prefix("w0", 64)
    n_nonempty = 0
    for q in ["spa* AND NOT merge", "w0* AND spark", "spa* OR w00*"]:
        got = merged.topk_bool(q, 10)
        want = fresh.topk_bool(q, 10, use_result_cache=False)
        assert got == want, q
        n_nonempty += bool(got)
    assert n_nonempty >= 2


def test_merged_prefix_expansion_sees_delta_only_terms(spark, tmp_path):
    """A vocabulary term that exists ONLY in a delta must be reachable via
    prefix expansion on the merged view (the old fail-fast claimed delta
    vocabularies weren't range-scannable)."""
    import pandas as pd

    from discogsography_spark.streaming.incremental import MergedSearcher

    base = pd.DataFrame(
        {"conv_id": ["a"], "turn_idx": [0], "role": ["user"],
         "text": ["plain base document"], "tool": [None]}
    )
    delta = pd.DataFrame(
        {"conv_id": ["b"], "turn_idx": [0], "role": ["user"],
         "text": ["qqzupdated qqzunique plain"], "tool": [None]}
    )
    base_p, delta_p = str(tmp_path / "b.parquet"), str(tmp_path / "d.parquet")
    base.to_parquet(base_p, index=False)
    delta.to_parquet(delta_p, index=False)
    idx = str(tmp_path / "idx")
    IndexBuilder(idx, num_segments=2, with_positions=True).build(
        spark.read.parquet(base_p)
    )
    DeltaIndexWriter(idx).write_batch(spark.read.parquet(delta_p), 0)
    m = MergedSearcher(idx)
    assert m.expand_prefix("qqz") == ["qqzunique", "qqzupdated"]
    got = m.topk_bool("qqz* AND plain", 5)
    assert [d for d, _ in got] == [1]  # the delta doc (base doc is 0)


def test_merged_bool_within_before_compaction(spark, pos_stream):
    """`a <N> b` inside boolean queries on the LIVE merged view: verify
    against the python oracle built in the same arrival order."""
    import pandas as pd

    from discogsography_spark.oracle import bm25_topk_bool, build_oracle_index
    from discogsography_spark.streaming.incremental import MergedSearcher

    tdf = pos_stream["tdf"]
    convs = sorted(tdf["conv_id"].unique())
    parts = [
        tdf[tdf["conv_id"].isin(convs[80:])],
        tdf[tdf["conv_id"].isin(convs[40:80])],
        tdf[tdf["conv_id"].isin(convs[:40])],
    ]
    rows = []
    for tag, part in enumerate(parts):  # arrival-order docIDs via tag prefix
        ordered = part.sort_values(["conv_id", "turn_idx"])
        rows.extend(
            (f"{tag:04d}-{c}", int(t), x)
            for c, t, x in zip(ordered["conv_id"], ordered["turn_idx"], ordered["text"])
        )
    oracle = build_oracle_index(rows)
    m = MergedSearcher(pos_stream["idx"])
    n_nonempty = 0
    for q in (
        "spark <3> index AND NOT merge",
        "spark <2> index OR merge",
        "turn <2> turn AND spark",
        "spark <3> index <5> merge",          # n-ary chain (r5)
        "turn <2> turn <3> spark OR merge",
    ):
        got = m.topk_bool(q, 12)
        want = bm25_topk_bool(oracle, q, 12)
        assert [x[0] for x in got] == [x[0] for x in want], q
        for (gd, gs), (_, ws) in zip(got, want):
            assert gs == ws, f"{q}: doc {gd}"
        n_nonempty += bool(got)
    assert n_nonempty >= 2
