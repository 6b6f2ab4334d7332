"""Gzip XML streaming source — the reference's primary ingest format
(/root/reference/extractor/src/parser.rs:127-325 stream-parses the discogs
gzip XML dumps with quick-xml, constant memory, one worker per file).

Spark-first restatement: gzip is not splittable, so the parallel unit is the
FILE — exactly the reference's granularity (its 4 dump files fan out to 4
workers). The file list becomes a one-column DataFrame repartitioned so each
file is one task; each task stream-parses its file with
xml.etree.iterparse over gzip.open (constant memory — elements are cleared
as soon as a turn is emitted) inside mapInPandas, yielding fixed-schema
transcript rows in bounded pandas chunks. At 100 TB the operator scales with
the number of input files, which is how non-splittable-container ingest
scales on any engine; re-sharding to splittable parquet is the first thing
the pipeline does downstream (IndexBuilder materializes docs/ parquet).

Transcript XML shape (the conversations analog of the discogs dumps):

    <conversations>
      <conversation id="conv-000">
        <turn idx="0" role="user" ts="2024-01-01T00:00:00">
          <text>...</text><tool>search</tool>
        </turn>
      </conversation>
    </conversations>

Malformed turns (missing idx / unparsable attributes) are emitted with a
`_quarantine_reason` so the caller can divert them — the same DLQ discipline
as the builder's key-contract quarantine.
"""

from __future__ import annotations

import gzip
import os
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHUNK_ROWS = 50_000

_XML_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, _quarantine_reason string"
)


def _parse_file(path: str) -> Iterator[dict]:
    from xml.etree import ElementTree as ET

    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rb") as f:
        conv_id = None
        for event, elem in ET.iterparse(f, events=("start", "end")):
            if event == "start" and elem.tag == "conversation":
                conv_id = elem.get("id")
            elif event == "end" and elem.tag == "turn":
                idx_raw = elem.get("idx")
                reason = None
                idx = None
                try:
                    idx = int(idx_raw)  # type: ignore[arg-type]
                except (TypeError, ValueError):
                    reason = "bad_turn_idx"
                ts_raw = elem.get("ts")
                ts = None
                if ts_raw:
                    try:
                        ts = pd.Timestamp(ts_raw).to_pydatetime()
                    except ValueError:
                        reason = reason or "bad_ts"
                text_el = elem.find("text")
                tool_el = elem.find("tool")
                yield {
                    "conv_id": conv_id,
                    "turn_idx": idx,
                    "role": elem.get("role"),
                    "text": text_el.text if text_el is not None else None,
                    "tool": tool_el.text if tool_el is not None else None,
                    "ts": ts,
                    "_quarantine_reason": reason,
                }
                elem.clear()  # constant memory: drop the parsed subtree
            elif event == "end" and elem.tag == "conversation":
                elem.clear()
                conv_id = None


def load_transcripts_xml(spark: SparkSession, path: str) -> DataFrame:
    """Read a directory (or single file) of .xml / .xml.gz transcript dumps
    into the fixed transcripts schema + `_quarantine_reason`. One task per
    file; rows stream out in bounded chunks."""
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.endswith((".xml", ".xml.gz"))
        )
    else:
        files = [path]
    if not files:
        return spark.createDataFrame([], _XML_SCHEMA)
    paths_df = spark.createDataFrame(
        [(p,) for p in files], "path string"
    ).repartition(len(files), "path")

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for p in pdf["path"]:
                buf: list[dict] = []
                for row in _parse_file(p):
                    buf.append(row)
                    if len(buf) >= CHUNK_ROWS:
                        yield pd.DataFrame(buf)
                        buf = []
                if buf:
                    yield pd.DataFrame(buf)

    return paths_df.mapInPandas(parse, schema=_XML_SCHEMA).withColumn(
        "turn_idx", F.col("turn_idx").cast("int")
    )


def write_transcripts_xml(pdf: pd.DataFrame, path: str) -> None:
    """Test helper: write a transcripts pandas frame as one .xml.gz dump
    (inverse of load_transcripts_xml; attribute order fixed)."""
    from xml.sax.saxutils import escape, quoteattr

    out: list[str] = ["<conversations>"]
    for conv_id, grp in pdf.groupby("conv_id", sort=True):
        out.append(f"  <conversation id={quoteattr(str(conv_id))}>")
        for row in grp.sort_values("turn_idx").itertuples(index=False):
            attrs = f'idx="{int(row.turn_idx)}"'
            if row.role is not None:
                attrs += f" role={quoteattr(str(row.role))}"
            if row.ts is not None and not pd.isna(row.ts):
                attrs += f' ts="{pd.Timestamp(row.ts).isoformat()}"'
            body = f"<text>{escape(str(row.text))}</text>" if row.text is not None else ""
            if getattr(row, "tool", None) is not None and not pd.isna(row.tool):
                body += f"<tool>{escape(str(row.tool))}</tool>"
            out.append(f"    <turn {attrs}>{body}</turn>")
        out.append("  </conversation>")
    out.append("</conversations>")
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("\n".join(out))
