"""Custom stateful streaming: per-conversation applyInPandasWithState
sessionization must converge to the batch ground truth when conversations
SPAN micro-batches, and the watermarked window agg must drop late rows."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from discogsography_spark.analysis import tokenize_py
from discogsography_spark.corpus import make_transcripts
from discogsography_spark.streaming.stateful import (
    sessionize_conversations,
    windowed_turn_counts,
)


@pytest.fixture(scope="module")
def turn_stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("turn_stream")
    tdf = make_transcripts(n_conversations=40, mean_turns=6, vocab_size=200)
    # split each conversation's turns ACROSS the three files: state must
    # carry between micro-batches for counts to come out right
    src = str(d / "in")
    os.makedirs(src)
    for i in range(3):
        chunk = tdf[tdf["turn_idx"] % 3 == i]
        chunk.to_parquet(os.path.join(src, f"part-{i}.parquet"), index=False)
    return {"dir": str(d), "src": src, "tdf": tdf}


def test_sessionize_state_spans_batches(spark, turn_stream_dir):
    tdf = turn_stream_dir["tdf"]
    stream = (
        spark.readStream.schema(
            spark.read.parquet(turn_stream_dir["src"]).schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(turn_stream_dir["src"])
    )
    sessions = sessionize_conversations(stream)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("update")
        .option(
            "checkpointLocation", os.path.join(turn_stream_dir["dir"], "chk1")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = (
        spark.sql("select * from sessions")
        .toPandas()
        .sort_values(["conv_id", "n_turns"])
        .groupby("conv_id")
        .last()  # update mode: the LAST emitted snapshot per conv is final
    )
    want = tdf.groupby("conv_id").agg(
        n_turns=("turn_idx", "size"), max_turn_idx=("turn_idx", "max")
    )
    assert got["n_turns"].astype(int).to_dict() == want["n_turns"].astype(int).to_dict()
    assert (
        got["max_turn_idx"].astype(int).to_dict()
        == want["max_turn_idx"].astype(int).to_dict()
    )
    # token counts carry across batches too (tokenize inside the state fn)
    want_tokens = {
        conv: sum(len(tokenize_py(t)) for t in grp["text"])
        for conv, grp in tdf.groupby("conv_id")
    }
    assert got["n_tokens"].astype(int).to_dict() == want_tokens


def _write_turns(src: str, name: str, rows: dict) -> None:
    pd.DataFrame(rows).astype({"ts": "datetime64[us]"}).to_parquet(
        os.path.join(src, name), index=False
    )


def test_windowed_counts_drop_late_rows(spark, tmp_path):
    """A row arriving beyond the watermark is dropped by the engine
    (numRowsDroppedByWatermark) and never emitted. Real processing-time
    triggers: availableNow pre-plans its batches and does not advance the
    filtering watermark between them, so it cannot demonstrate the drop."""
    import time

    src = str(tmp_path / "in")
    os.makedirs(src)
    base = pd.Timestamp("2024-06-01 10:00:00")
    # batch 0: on-time rows; max event time 18:00 → watermark 16:00 after
    _write_turns(
        src,
        "part-0.parquet",
        {
            "conv_id": ["c1"] * 3,
            "turn_idx": [0, 1, 2],
            "role": ["user"] * 3,
            "text": ["a"] * 3,
            "tool": [None] * 3,
            "ts": [base, base + pd.Timedelta(hours=4), base + pd.Timedelta(hours=8)],
        },
    )
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    counts = windowed_turn_counts(stream, window="1 hour", watermark="2 hours")
    q = (
        counts.writeStream.format("memory")
        .queryName("wcounts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk2"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            p = q.lastProgress
            if p and p["batchId"] >= 1 and "2024-06-01T16:00" in (
                p["eventTime"].get("watermark") or ""
            ):
                break
            time.sleep(0.5)
        # late row: 10 h behind the watermark → must be dropped
        _write_turns(
            src,
            "part-1.parquet",
            {
                "conv_id": ["c2"],
                "turn_idx": [0],
                "role": ["user"],
                "text": ["late"],
                "tool": [None],
                "ts": [base - pd.Timedelta(hours=2)],
            },
        )
        dropped = 0
        deadline = time.time() + 120
        while time.time() < deadline and not dropped:
            for p in q.recentProgress:
                for so in p.get("stateOperators", []):
                    dropped += int(so.get("numRowsDroppedByWatermark", 0))
            time.sleep(0.5)
    finally:
        q.stop()
    assert dropped == 1, "the beyond-watermark row must be engine-dropped"
    got = spark.sql("select * from wcounts").toPandas()
    starts = set(pd.to_datetime(got["window_start"]))
    assert base - pd.Timedelta(hours=2) not in starts
    # on-time windows closed by the watermark were emitted exactly once
    assert base in starts and base + pd.Timedelta(hours=4) in starts
    assert got["n_turns"].tolist() == [1] * len(got)
