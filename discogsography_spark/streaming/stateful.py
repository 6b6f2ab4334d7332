"""Custom stateful streaming operators over the transcript turn stream.

The reference's consumers keep per-entity state across message batches —
hash registries gating rewrites and per-file progress counters
(/root/reference/tableinator/batch_processor.py:151-215,
/root/reference/extractor/src/state_marker.rs:63-77). The Structured
Streaming restatement:

- sessionize_conversations: per-conversation running aggregate via
  applyInPandasWithState — state = (n_turns, n_tokens, first/last ts,
  last turn_idx) per conv_id, updated every micro-batch, emitted as the
  current session snapshot (update semantics). State is partitioned by the
  group key, so it scales horizontally with executors and is checkpointed
  by the engine — the per-entity registry pattern without an external DB.

- windowed_turn_counts: event-time tumbling-window counts with a watermark;
  rows later than the watermark are dropped by the engine (the reference's
  staleness cutoffs, tableinator.py:497-616, expressed as stream semantics
  instead of a post-hoc purge).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = (
    "conv_id string, n_turns long, n_tokens long, first_ts timestamp, "
    "last_ts timestamp, max_turn_idx int"
)
_STATE_SCHEMA = "n_turns long, n_tokens long, first_ts double, last_ts double, max_turn_idx int"


def _sessionize_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    from discogsography_spark.analysis import tokenize_pandas

    if state.exists:
        n_turns, n_tokens, first_ts, last_ts, max_idx = state.get
    else:
        n_turns, n_tokens, first_ts, last_ts, max_idx = 0, 0, None, None, -1
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n_turns += len(pdf)
        n_tokens += int(tokenize_pandas(pdf["text"]).map(len).sum())
        ts = pd.to_datetime(pdf["ts"])
        ts_min = ts.min().timestamp() if ts.notna().any() else None
        ts_max = ts.max().timestamp() if ts.notna().any() else None
        if ts_min is not None:
            first_ts = ts_min if first_ts is None else min(first_ts, ts_min)
        if ts_max is not None:
            last_ts = ts_max if last_ts is None else max(last_ts, ts_max)
        max_idx = max(max_idx, int(pdf["turn_idx"].max()))
    state.update((n_turns, n_tokens, first_ts, last_ts, max_idx))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "n_turns": [n_turns],
            "n_tokens": [n_tokens],
            # `is not None`, not truthiness: epoch 0.0 (1970-01-01T00:00:00)
            # is a legitimate timestamp and must not be emitted as NaT
            "first_ts": [
                pd.Timestamp(first_ts, unit="s") if first_ts is not None else pd.NaT
            ],
            "last_ts": [
                pd.Timestamp(last_ts, unit="s") if last_ts is not None else pd.NaT
            ],
            "max_turn_idx": [max_idx],
        }
    )


def sessionize_conversations(stream: DataFrame) -> DataFrame:
    """Per-conversation running session snapshot (update output mode)."""
    return stream.groupBy("conv_id").applyInPandasWithState(
        _sessionize_fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def windowed_turn_counts(
    stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time windows of turn counts per role with a late-data
    watermark: rows arriving more than `watermark` behind the max seen event
    time are dropped by the engine before the stateful aggregation."""
    return (
        # NTZ parquet timestamps can't carry an event-time watermark
        stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "role")
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("w.start").alias("window_start"),
            "role",
            "n_turns",
        )
    )
