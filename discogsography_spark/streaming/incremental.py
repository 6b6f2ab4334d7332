"""Incremental / streaming index maintenance.

The reference is a long-running message-driven pipeline: extractor publishes
batches, consumers upsert incrementally with hash-gated writes and
completion-protocol control messages (SURVEY.md §2.9;
/root/reference/extractor/src/extractor.rs:633-705,
/root/reference/tableinator/batch_processor.py:151-215). The Spark-native
restatement is Structured Streaming `foreachBatch` writing **delta segments**:

- every micro-batch becomes an immutable delta directory
  (deltas/delta-%06d/) holding its own term→postings parquet + stats JSON,
  committed atomically tmp+rename AFTER the data is durable (send-then-commit,
  /root/reference/extractor/src/extractor.rs:584-600);
- delta docIDs continue the global dense sequence: offset = base + prior
  deltas (recorded in each delta's manifest — exactly-once via batch_id
  idempotence: a re-delivered batch_id is skipped, the foreachBatch contract);
- queries merge base + delta posting lists at lookup time (doc ranges are
  disjoint and ascending, so the merge is concatenation) and score with
  COMBINED corpus stats — equivalent to a full rebuild over the union corpus
  (tested rank-identical vs the oracle);
- `compact()` folds deltas into the base segments: per (seg, term) group,
  concatenate postings in docID order and re-encode — a real segment merge,
  not a rebuild.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from discogsography_spark.analysis import analyze_query, tokenize_pandas
from discogsography_spark.codec import decode_postings, varbyte_decode
from discogsography_spark.index.builder import (
    SEGMENT_SCHEMA,
    IndexBuilder,
    _encode_pdf,
    term_segment,
)
from discogsography_spark.index.manifest import _atomic_write_json
from discogsography_spark.params import BM25Params
from discogsography_spark.query.engine import IndexMeta, LocalSearcher, TermPostings


def _deltas_root(index_dir: str) -> str:
    return os.path.join(index_dir, "deltas")


def list_deltas(index_dir: str) -> list[str]:
    root = _deltas_root(index_dir)
    if not os.path.isdir(root):
        return []
    out = []
    for name in sorted(os.listdir(root)):
        d = os.path.join(root, name)
        if name.startswith("delta-") and os.path.exists(os.path.join(d, "stats.json")):
            out.append(d)
    return out


def _combined_offsets(index_dir: str) -> tuple[int, int]:
    """(next_doc_id, combined_total_tokens) across base + committed deltas."""
    meta = IndexMeta(index_dir)
    n, tt = meta.n_docs, meta.total_tokens
    for d in list_deltas(index_dir):
        with open(os.path.join(d, "stats.json")) as f:
            s = json.load(f)
        n += int(s["n_docs"])
        tt += int(s["total_tokens"])
    return n, tt


class DeltaIndexWriter:
    """foreachBatch sink: call `write_batch(df, batch_id)` from
    `stream.writeStream.foreachBatch(writer.write_batch)`."""

    def __init__(self, index_dir: str, block_size: int = 128):
        self.index_dir = index_dir
        self.block_size = block_size
        self.meta = IndexMeta(index_dir)

    def _delta_dir(self, batch_id: int) -> str:
        return os.path.join(_deltas_root(self.index_dir), f"delta-{batch_id:06d}")

    def write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        final = self._delta_dir(batch_id)
        if os.path.exists(os.path.join(final, "stats.json")):
            return  # idempotent re-delivery (exactly-once via batch_id)

        doc_offset, _ = _combined_offsets(self.index_dir)
        k1, b = self.meta.params.k1, self.meta.params.b
        block_size = self.block_size
        num_segments = self.meta.num_segments

        # batch-local dense docIDs continuing the global sequence. Micro-batch
        # sizes are bounded (maxFilesPerTrigger / maxOffsetsPerTrigger), so a
        # single-partition sort inside one batch is the honest trade; huge
        # backfills go through IndexBuilder instead.
        pdf = (
            batch_df.select("conv_id", "turn_idx", "text")
            .toPandas()
            .sort_values(["conv_id", "turn_idx"], kind="stable")
            .reset_index(drop=True)
        )
        if len(pdf) == 0:
            os.makedirs(final, exist_ok=True)
            _atomic_write_json(
                os.path.join(final, "stats.json"),
                {"n_docs": 0, "total_tokens": 0, "doc_offset": doc_offset},
            )
            return
        pdf["doc_id"] = np.arange(doc_offset, doc_offset + len(pdf), dtype=np.int64)
        toks = tokenize_pandas(pdf["text"])
        pdf["dl"] = toks.map(len).astype(np.int64)
        total_tokens = int(pdf["dl"].sum())

        spark = batch_df.sparkSession
        docs = spark.createDataFrame(
            pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "conv_id": pdf["conv_id"],
                    "turn_idx": pdf["turn_idx"].astype("int32"),
                    "dl": pdf["dl"],
                    "tokens": toks,
                }
            )
        )
        # avgdl in the delta's tfnorm must be the COMBINED corpus avgdl at
        # query time — unknowable ahead of future batches. Store raw blobs;
        # block_max_tfnorm here uses the current combined avgdl and is only a
        # pruning hint for merged queries (exact scoring re-derives tfnorm
        # from tf+dl, so correctness never depends on it).
        n_after, tt_after = doc_offset + len(pdf), 0
        _base_tt = _combined_offsets(self.index_dir)[1] + total_tokens
        avgdl_hint = _base_tt / n_after if n_after else 1.0

        def encode(g: pd.DataFrame) -> pd.DataFrame:
            return _encode_pdf(g, k1, b, avgdl_hint, block_size, is_head=False)

        encoded = (
            docs.select("doc_id", "dl", F.explode("tokens").alias("term"))
            .groupBy("term", "doc_id")
            .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
            .withColumn(
                "seg", (F.crc32(F.col("term")) % F.lit(num_segments)).cast("int")
            )
            .groupBy("seg", "term")
            .applyInPandas(encode, schema=SEGMENT_SCHEMA)
        )

        tmp = final + "__tmp"
        if os.path.isdir(tmp):
            shutil.rmtree(tmp)
        encoded.write.mode("overwrite").partitionBy("seg").parquet(
            os.path.join(tmp, "segments")
        )
        docs.select("doc_id", "conv_id", "turn_idx", "dl").write.mode(
            "overwrite"
        ).parquet(os.path.join(tmp, "docs"))
        os.makedirs(_deltas_root(self.index_dir), exist_ok=True)
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.replace(tmp, final)
        # commit marker LAST (send-then-commit)
        _atomic_write_json(
            os.path.join(final, "stats.json"),
            {
                "n_docs": len(pdf),
                "total_tokens": total_tokens,
                "doc_offset": doc_offset,
                "batch_id": batch_id,
            },
        )


class MergedSearcher:
    """Exact BM25 top-k over base + deltas with combined corpus stats."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.base = LocalSearcher(index_dir)
        self.params: BM25Params = self.base.meta.params
        self.n_docs, self.total_tokens = _combined_offsets(index_dir)
        self.avgdl = self.total_tokens / self.n_docs if self.n_docs else 1.0
        self._delta_dirs = list_deltas(index_dir)

    def _delta_rows(self, delta: str, terms: list[str]) -> dict[str, TermPostings]:
        import pyarrow.compute as pc
        import pyarrow.dataset as pads

        segroot = os.path.join(delta, "segments")
        out: dict[str, TermPostings] = {}
        by_seg: dict[int, list[str]] = {}
        for t in terms:
            by_seg.setdefault(term_segment(t, self.base.meta.num_segments), []).append(t)
        for seg, seg_terms in by_seg.items():
            d = os.path.join(segroot, f"seg={seg}")
            if not os.path.isdir(d):
                continue
            files = [
                os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")
            ]
            if not files:
                continue
            ds = pads.dataset(files, format="parquet")
            tbl = ds.to_table(
                columns=["term", "df", "doc_blob", "tf_blob", "dl_blob"],
                filter=pc.field("term").isin(seg_terms),
            )
            for row in tbl.to_pylist():
                out[row["term"]] = row  # raw dict is enough for decode
        return out

    def topk(self, query_text: str, k: int) -> list[tuple[int, float]]:
        terms = analyze_query(query_text)
        if not terms:
            return []
        base_rows = self.base.lookup_terms(terms)
        delta_rows = [self._delta_rows(d, terms) for d in self._delta_dirs]

        merged: dict[str, tuple[np.ndarray, np.ndarray, np.ndarray]] = {}
        for t in terms:
            parts_docs, parts_tf, parts_dl = [], [], []
            if t in base_rows:
                d, tf, dl = base_rows[t].decode_all()
                parts_docs.append(d)
                parts_tf.append(tf)
                parts_dl.append(dl)
            for dr in delta_rows:  # deltas in batch order → ascending doc ranges
                if t in dr:
                    row = dr[t]
                    d, tf = decode_postings(row["doc_blob"], row["tf_blob"])
                    dl = varbyte_decode(row["dl_blob"]).astype(np.int64)
                    parts_docs.append(d)
                    parts_tf.append(tf)
                    parts_dl.append(dl)
            if not parts_docs:
                return []  # conjunctive AND: term absent everywhere
            merged[t] = (
                np.concatenate(parts_docs),
                np.concatenate(parts_tf),
                np.concatenate(parts_dl),
            )

        # conjunctive intersection driven by the rarest merged list
        by_df = sorted(terms, key=lambda t: (merged[t][0].size, t))
        cand, tf0, dl0 = merged[by_df[0]]
        tf_by_term = {by_df[0]: tf0}
        for t in by_df[1:]:
            d, tf, _dl = merged[t]
            pos = np.searchsorted(d, cand)
            ok = pos < d.size
            hit = np.zeros(cand.shape, dtype=bool)
            hit[ok] = d[pos[ok]] == cand[ok]
            cand, dl0 = cand[hit], dl0[hit]
            for tt in tf_by_term:
                tf_by_term[tt] = tf_by_term[tt][hit]
            tf_by_term[t] = tf[pos[hit]]
            if cand.size == 0:
                return []

        p = self.params
        idfs = {t: p.idf(self.n_docs, int(merged[t][0].size)) for t in terms}
        norm = p.k1 * (1.0 - p.b + p.b * (dl0.astype(np.float64) / self.avgdl))
        score = np.zeros(cand.shape, dtype=np.float64)
        for t in terms:  # sorted order — oracle-identical summation
            tf = tf_by_term[t].astype(np.float64)
            score = score + idfs[t] * (tf / (tf + norm))
        order = np.lexsort((cand, -score))[:k]
        return [(int(cand[i]), float(score[i])) for i in order]


def compact(spark: SparkSession, index_dir: str) -> int:
    """Fold all committed deltas into the base segments (real per-term merge,
    not a rebuild). Returns the number of deltas folded.

    Steps: read base + delta segment rows for every seg → groupBy(seg, term)
    → decode, concat in docID order, re-encode with the combined avgdl →
    overwrite base segments atomically → append delta docs to base docs →
    update manifest stats → clear deltas.
    """
    deltas = list_deltas(index_dir)
    if not deltas:
        return 0
    meta = IndexMeta(index_dir)
    n_docs, total_tokens = _combined_offsets(index_dir)
    avgdl = total_tokens / n_docs if n_docs else 1.0
    k1, b = meta.params.k1, meta.params.b
    block_size = int(meta.stats["block_size"])

    seg_dirs = [meta.seg_dir(s) for s in range(meta.num_segments)]
    seg_dirs = [d for d in seg_dirs if os.path.isdir(d) and os.listdir(d)]
    sources = seg_dirs + [
        os.path.join(d, "segments", f"seg={s}")
        for d in deltas
        for s in range(meta.num_segments)
        if os.path.isdir(os.path.join(d, "segments", f"seg={s}"))
    ]
    rows = spark.read.parquet(*sources).select("term", "doc_blob", "tf_blob", "dl_blob")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for _, r in g.iterrows():
            d, tf = decode_postings(r["doc_blob"], r["tf_blob"])
            dl = varbyte_decode(r["dl_blob"]).astype(np.int64)
            if d.size:
                parts.append((int(d[0]), d, tf, dl))
        # scan order of the source rows is arbitrary; component docID ranges
        # are disjoint, so sorting parts by first docID restores global order
        parts.sort(key=lambda p: p[0])
        doc_ids = np.concatenate([p[1] for p in parts])
        tfs = np.concatenate([p[2] for p in parts])
        dls = np.concatenate([p[3] for p in parts])
        pdf = pd.DataFrame(
            {
                "term": g["term"].iloc[0],
                "seg": term_segment(g["term"].iloc[0], meta.num_segments),
                "doc_id": doc_ids,
                "tf": tfs,
                "dl": dls,
            }
        )
        return _encode_pdf(pdf, k1, b, avgdl, block_size, is_head=False)

    merged = rows.groupBy("term").applyInPandas(merge, schema=SEGMENT_SCHEMA)
    tmp = os.path.join(index_dir, "segments__compact_tmp")
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    merged.write.mode("overwrite").partitionBy("seg").parquet(tmp)

    # append delta docmaps to base docs
    delta_docs = [os.path.join(d, "docs") for d in deltas if os.path.isdir(os.path.join(d, "docs"))]
    docs_dir = os.path.join(index_dir, "docs")
    if delta_docs:
        all_docs = spark.read.parquet(docs_dir, *delta_docs)
        docs_tmp = docs_dir + "__compact_tmp"
        all_docs.write.mode("overwrite").parquet(docs_tmp)
        shutil.rmtree(docs_dir)
        os.replace(docs_tmp, docs_dir)

    seg_root = os.path.join(index_dir, "segments")
    shutil.rmtree(seg_root)
    os.replace(tmp, seg_root)

    stats = dict(meta.stats)
    stats["n_docs"] = n_docs
    stats["total_tokens"] = total_tokens
    meta.manifest.commit_docs(stats)
    for d in deltas:
        shutil.rmtree(d)
    return len(deltas)
