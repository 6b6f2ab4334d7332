"""XZ-compressed JSONL streaming source — the reference's MusicBrainz ingest
format (/root/reference/extractor/src/jsonl_parser.rs:120-262 stream-reads
.jsonl.xz dumps line-by-line with an xz decoder, constant memory).

Spark has no native xz codec, and xz (like gzip) is not splittable — so the
parallel unit is the FILE, exactly like sources/xml_source.py: the file list
becomes a one-column DataFrame repartitioned one-file-per-task; each task
streams lzma.open(path) line-by-line inside mapInPandas, yielding
fixed-schema transcript rows in bounded pandas chunks. At 100 TB this scales
with the number of dump files (how non-splittable-container ingest scales on
any engine); the pipeline re-shards to splittable parquet immediately
downstream (IndexBuilder materializes docs/).

Malformed lines (bad JSON, missing/unparsable fields) are emitted with a
`_quarantine_reason` instead of killing the task — the DLQ discipline of the
XML source and the builder's key-contract quarantine
(/root/reference/tableinator/tableinator.py:1132-1137).
"""

from __future__ import annotations

import json
import lzma
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHUNK_ROWS = 50_000

_JSONL_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, _quarantine_reason string"
)


def _parse_line(raw: bytes) -> dict:
    out = {
        "conv_id": None,
        "turn_idx": None,
        "role": None,
        "text": None,
        "tool": None,
        "ts": None,
        "_quarantine_reason": None,
    }
    try:
        obj = json.loads(raw)
    except (json.JSONDecodeError, UnicodeDecodeError):
        out["_quarantine_reason"] = "bad_json"
        return out
    if not isinstance(obj, dict):
        out["_quarantine_reason"] = "not_object"
        return out
    out["conv_id"] = obj.get("conv_id")
    out["role"] = obj.get("role")
    out["text"] = obj.get("text")
    out["tool"] = obj.get("tool")
    try:
        out["turn_idx"] = int(obj["turn_idx"])
    except (KeyError, TypeError, ValueError):
        out["_quarantine_reason"] = "bad_turn_idx"
    ts_raw = obj.get("ts")
    if ts_raw is not None:
        try:
            out["ts"] = pd.Timestamp(ts_raw).to_pydatetime()
        except (ValueError, TypeError):
            out["_quarantine_reason"] = out["_quarantine_reason"] or "bad_ts"
    return out


def _stream_file(path: str) -> Iterator[dict]:
    opener = lzma.open if path.endswith(".xz") else open
    with opener(path, "rb") as f:
        for raw in f:
            raw = raw.strip()
            if raw:
                yield _parse_line(raw)


def load_transcripts_jsonl_xz(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory (or single file) of .jsonl / .jsonl.xz transcript
    dumps into the fixed transcripts schema + `_quarantine_reason`. One task
    per file; rows stream out in bounded chunks (constant memory per task)."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith((".jsonl", ".jsonl.xz"))
        )
    else:
        files = [path]
    if not files:
        return spark.createDataFrame([], _JSONL_SCHEMA)
    paths_df = spark.createDataFrame(
        [(p,) for p in files], "path string"
    ).repartition(len(files), "path")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p in pdf["path"]:
                buf: list[dict] = []
                for row in _stream_file(p):
                    buf.append(row)
                    if len(buf) >= CHUNK_ROWS:
                        yield pd.DataFrame(buf)
                        buf = []
                if buf:
                    yield pd.DataFrame(buf)

    return paths_df.mapInPandas(parse, schema=_JSONL_SCHEMA).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    )


def write_transcripts_jsonl_xz(pdf: pd.DataFrame, path: str) -> None:
    """Test helper: write a transcripts pandas frame as one .jsonl.xz dump
    (inverse of load_transcripts_jsonl_xz; stable key order)."""
    with lzma.open(path, "wt", encoding="utf-8") as f:
        for row in pdf.sort_values(["conv_id", "turn_idx"]).itertuples(index=False):
            obj = {
                "conv_id": row.conv_id,
                "turn_idx": int(row.turn_idx),
                "role": row.role,
                "text": row.text,
                "tool": None if pd.isna(row.tool) else row.tool,
                "ts": (
                    pd.Timestamp(row.ts).isoformat()
                    if row.ts is not None and not pd.isna(row.ts)
                    else None
                ),
            }
            f.write(json.dumps(obj, ensure_ascii=False) + "\n")
