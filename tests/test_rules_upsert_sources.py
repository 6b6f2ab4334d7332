from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F


def test_rules_skip_nullify_remove(spark):
    from discogsography_spark.operators.rules import Rule, RuleSet

    df = spark.createDataFrame(
        [
            (1, "ok name", 1999, ["rock", "xx-bad", "jazz"]),
            (2, "", 2050, ["pop"]),          # fails required → skipped
            (3, "fine", 99999, ["xx-bad"]),  # year out of range → nullified
            (4, None, 1975, []),             # null name fails required → skipped
        ],
        ["id", "name", "year", "genres"],
    )
    rs = RuleSet(
        skip_rules=[Rule("name", "required")],
        nullify_rules=[Rule("year", "range", min=1860, max=2027)],
        remove_matching=[("genres", "^xx-")],
    )
    out = rs.apply(df).orderBy("id").collect()
    assert [r["id"] for r in out] == [1, 3]
    assert out[0]["year"] == 1999 and out[0]["genres"] == ["rock", "jazz"]
    assert out[1]["year"] is None and out[1]["genres"] == []

    v = rs.violations(df).collect()[0]
    assert v["name_required"] == 2
    assert v["year_range"] == 2


def test_rules_regex_length_enum(spark):
    from discogsography_spark.operators.rules import Rule

    df = spark.createDataFrame(
        [("1999", "abcdef", "user"), ("x9", "ab", "robot"), (None, None, None)],
        ["year", "code", "role"],
    )
    checks = {
        "regex": Rule("year", "regex", pattern=r"^[0-9]{4}$"),
        "length": Rule("code", "length", min=3, max=10),
        "enum": Rule("role", "enum", values=("user", "assistant")),
    }
    got = df.select(
        *[r.predicate().alias(k) for k, r in checks.items()]
    ).collect()
    assert [row["regex"] for row in got] == [True, False, True]  # null passes
    assert [row["length"] for row in got] == [True, False, True]
    assert [row["enum"] for row in got] == [True, False, True]


def test_upsert_hash_gate(spark):
    from discogsography_spark.operators.upsert import upsert_changed, with_content_hash

    cur = with_content_hash(
        spark.createDataFrame(
            [("a", "v1"), ("b", "v1"), ("c", "v1")], ["data_id", "payload"]
        ),
        ["payload"],
    )
    inc = with_content_hash(
        spark.createDataFrame(
            [("a", "v1"), ("b", "v2"), ("d", "v1")], ["data_id", "payload"]
        ),
        ["payload"],
    )
    snap, stats = upsert_changed(cur, inc)
    assert stats.incoming == 3
    assert stats.unchanged_skipped == 1  # a unchanged
    assert stats.written == 2  # b changed, d new
    rows = {r["data_id"]: r["payload"] for r in snap.collect()}
    assert rows == {"a": "v1", "b": "v2", "c": "v1", "d": "v1"}


def test_purge_stale_guards(spark):
    from discogsography_spark.operators.upsert import purge_stale

    t0 = dt.datetime(2026, 1, 1)
    old = dt.datetime(2025, 1, 1)
    df = spark.createDataFrame(
        [("a", old), ("b", old), ("c", t0)], ["data_id", "updated_at"]
    )
    # guard 1: zero records processed → no delete
    kept, rep = purge_stale(df, t0, records_processed=0)
    assert rep["skipped_reason"] == "zero_records_processed" and kept.count() == 3
    # guard 2: would delete 2/3 ≥ 0.6 → veto
    kept, rep = purge_stale(df, t0, records_processed=10, max_delete_fraction=0.6)
    assert rep["skipped_reason"] == "delete_fraction_veto" and kept.count() == 3
    # normal purge
    kept, rep = purge_stale(df, t0, records_processed=10, max_delete_fraction=0.9)
    assert rep["purged"] == 2 and kept.count() == 1


def test_sources_roundtrip(spark, tmp_path):
    from discogsography_spark.corpus import make_transcripts
    from discogsography_spark.sources import load_transcripts, write_transcripts

    pdf = make_transcripts(n_conversations=20, mean_turns=4, vocab_size=100)
    src = spark.createDataFrame(pdf)
    pq = str(tmp_path / "t_parquet")
    js = str(tmp_path / "t_json")
    write_transcripts(src, pq)
    src.write.mode("overwrite").json(js)

    a = load_transcripts(spark, pq).orderBy("conv_id", "turn_idx")
    b = load_transcripts(spark, js, format="jsonl").orderBy("conv_id", "turn_idx")
    assert a.count() == b.count() == len(pdf)
    assert [f.name for f in a.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    ta = [r["text"] for r in a.select("text").collect()]
    tb = [r["text"] for r in b.select("text").collect()]
    assert ta == tb
    # iceberg format falls back to parquet in this sandbox
    c = load_transcripts(spark, pq, format="iceberg")
    assert c.count() == len(pdf)
