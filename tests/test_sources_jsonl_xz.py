"""XZ JSONL streaming source: round-trip fidelity, per-file parallelism,
malformed-line quarantine, end-to-end indexability — the reference's
MusicBrainz .jsonl.xz ingest path (jsonl_parser.rs:120-262) restated as
one-file-per-task mapInPandas (Spark has no native xz codec)."""

from __future__ import annotations

import lzma

import pandas as pd
import pytest

from discogsography_spark.corpus import make_transcripts
from discogsography_spark.sources.jsonl_xz import (
    load_transcripts_jsonl_xz,
    write_transcripts_jsonl_xz,
)


@pytest.fixture(scope="module")
def xz_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("xz_dump")
    tdf = make_transcripts(n_conversations=60, mean_turns=5, vocab_size=300)
    convs = sorted(tdf["conv_id"].unique())
    for i, cs in enumerate([convs[:20], convs[20:40], convs[40:]]):
        write_transcripts_jsonl_xz(
            tdf[tdf["conv_id"].isin(cs)], str(d / f"dump-{i}.jsonl.xz")
        )
    return {"dir": str(d), "tdf": tdf}


def test_jsonl_xz_roundtrip_exact(spark, xz_dir):
    got = (
        load_transcripts_jsonl_xz(spark, xz_dir["dir"])
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert got["_quarantine_reason"].isna().all()
    want = xz_dir["tdf"].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["turn_idx"].tolist() == want["turn_idx"].astype(int).tolist()
    # per-turn text equality — the BASELINE.json per-row invariant
    assert got["text"].fillna("").tolist() == want["text"].fillna("").tolist()
    assert got["role"].tolist() == want["role"].tolist()
    assert (
        pd.to_datetime(got["ts"]).astype("datetime64[s]").tolist()
        == pd.to_datetime(want["ts"]).astype("datetime64[s]").tolist()
    )


def test_jsonl_xz_one_task_per_file(spark, xz_dir):
    df = load_transcripts_jsonl_xz(spark, xz_dir["dir"])
    assert df.rdd.getNumPartitions() == 3


def test_jsonl_xz_malformed_lines_quarantined(spark, tmp_path):
    p = str(tmp_path / "bad.jsonl.xz")
    lines = [
        '{"conv_id": "c0", "turn_idx": 0, "role": "user", "text": "ok", "ts": "2026-01-01T00:00:00"}',
        "{not json at all",
        '["an", "array"]',
        '{"conv_id": "c0", "turn_idx": "x", "role": "user", "text": "bad idx"}',
        '{"conv_id": "c0", "turn_idx": 1, "role": "user", "text": "bad ts", "ts": "not-a-date"}',
        '{"conv_id": "c0", "turn_idx": 2, "role": "user", "text": "ok2"}',
    ]
    with lzma.open(p, "wt", encoding="utf-8") as f:
        f.write("\n".join(lines) + "\n")
    got = load_transcripts_jsonl_xz(spark, p).toPandas()
    assert len(got) == 6
    reasons = got["_quarantine_reason"].fillna("").tolist()
    assert sorted(r for r in reasons if r) == [
        "bad_json",
        "bad_ts",
        "bad_turn_idx",
        "not_object",
    ]
    ok = got[got["_quarantine_reason"].isna()]
    assert sorted(ok["text"]) == ["ok", "ok2"]


def test_jsonl_xz_feeds_builder(spark, xz_dir, tmp_path):
    """The source plugs straight into IndexBuilder (quarantined rows
    filtered) and the index answers queries — the full MusicBrainz-style
    ingest path end-to-end."""
    from pyspark.sql import functions as F

    from discogsography_spark.index.builder import IndexBuilder
    from discogsography_spark.query.engine import LocalSearcher

    src = load_transcripts_jsonl_xz(spark, xz_dir["dir"]).filter(
        F.col("_quarantine_reason").isNull()
    ).drop("_quarantine_reason")
    idx = str(tmp_path / "idx")
    res = IndexBuilder(idx, num_segments=2).build(src)
    assert res.n_docs == len(xz_dir["tdf"])
    s = LocalSearcher(idx)
    assert s.topk("spark", 5)
