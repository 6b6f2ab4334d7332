"""BM25 top-k query engines over the segment index.

Two paths, mirroring the reference's split between its serving layer (FastAPI
→ GIN/Lucene index probes, /root/reference/api/queries/search_queries.py:105-197)
and its batch analytics (insights scans):

- **LocalSearcher** — low-latency serving path: driver-side posting lookup via
  pyarrow with segment pruning (crc32 shard) + parquet predicate pushdown on
  `term`, then an exact conjunctive document-at-a-time evaluator with
  block-range skipping and block-max upper-bound pruning (the block-max WAND
  family, specialized to AND semantics — candidates are always a subset of
  the rarest term's postings). This is what the p95 latency benchmark runs.

- **DistributedQueryEngine** — Spark DataFrame path for batch scoring: scans
  ONLY the pruned segment files with `term IN (...)` pushed to parquet,
  decodes postings in an Arrow mapInPandas, then scores with NATIVE column
  math (whole-stage codegen; no Python in the scoring loop) and takes the
  global top-k via orderBy/limit (Spark's TakeOrderedAndProject = per-partition
  heaps + merge, exactly the reference's per-table rank cap then global merge,
  /root/reference/api/queries/search_queries.py:213-234).

Determinism (rank-identity vs the oracle): idf and avgdl are computed in
CPython and injected as literals; per-doc score sums partials in sorted-term
order — locally via elementwise accumulation over sorted terms, distributed
via F.aggregate over array_sort(collect_list(struct(term, partial))) — so the
IEEE float64 addition order is identical everywhere. Ties break
(score DESC, doc_id ASC) (/root/reference/api/queries/search_queries.py:132-134).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow.dataset as pads
import pyarrow.compute as pc
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from discogsography_spark.analysis import analyze_query
from discogsography_spark.codec import decode_block, decode_postings, varbyte_decode
from discogsography_spark.index.builder import term_segment
from discogsography_spark.index.manifest import Manifest
from discogsography_spark.params import BM25Params


@dataclass
class TermPostings:
    term: str
    df: int
    doc_blob: bytes
    tf_blob: bytes
    dl_blob: bytes
    block_last_doc: np.ndarray
    block_doc_off: np.ndarray
    block_tf_off: np.ndarray
    block_dl_off: np.ndarray
    block_max_tfnorm: np.ndarray

    def decode_all(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        doc_ids, tfs = decode_postings(self.doc_blob, self.tf_blob)
        dls = varbyte_decode(self.dl_blob).astype(np.int64)
        return doc_ids, tfs, dls

    def decode_blocks(
        self, block_indices: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        docs_l, tfs_l, dls_l = [], [], []
        for bi in block_indices:
            d, t = decode_block(
                self.doc_blob,
                self.tf_blob,
                int(bi),
                self.block_last_doc,
                self.block_doc_off,
                self.block_tf_off,
            )
            l0 = int(self.block_dl_off[bi])
            l1 = (
                int(self.block_dl_off[bi + 1])
                if bi + 1 < len(self.block_dl_off)
                else len(self.dl_blob)
            )
            dl = varbyte_decode(self.dl_blob[l0:l1]).astype(np.int64)
            docs_l.append(d)
            tfs_l.append(t)
            dls_l.append(dl)
        if not docs_l:
            e = np.empty(0, dtype=np.int64)
            return e, e.copy(), e.copy()
        return (
            np.concatenate(docs_l),
            np.concatenate(tfs_l),
            np.concatenate(dls_l),
        )


class IndexMeta:
    """Shared stats + segment path resolution."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.manifest = Manifest(index_dir)
        stats = self.manifest.docs()
        if stats is None:
            raise FileNotFoundError(f"no committed index at {index_dir}")
        self.stats = stats
        self.n_docs = int(stats["n_docs"])
        self.total_tokens = int(stats["total_tokens"])
        self.avgdl = self.total_tokens / self.n_docs if self.n_docs else 1.0
        self.num_segments = int(stats["num_segments"])
        self.params = BM25Params(k1=float(stats["k1"]), b=float(stats["b"]))

    def seg_dir(self, seg: int) -> str:
        return os.path.join(self.index_dir, "segments", f"seg={seg}")

    def seg_dirs_for_terms(self, terms: list[str]) -> dict[int, list[str]]:
        out: dict[int, list[str]] = {}
        for t in terms:
            out.setdefault(term_segment(t, self.num_segments), []).append(t)
        return out


_TP_COLS = [
    "term",
    "df",
    "doc_blob",
    "tf_blob",
    "dl_blob",
    "block_last_doc",
    "block_doc_off",
    "block_tf_off",
    "block_dl_off",
    "block_max_tfnorm",
]


class LocalSearcher:
    def __init__(self, index_dir: str):
        self.meta = IndexMeta(index_dir)
        self._datasets: dict[int, pads.Dataset] = {}

    def _dataset(self, seg: int) -> pads.Dataset | None:
        if seg not in self._datasets:
            d = self.meta.seg_dir(seg)
            files = (
                [
                    os.path.join(d, f)
                    for f in sorted(os.listdir(d))
                    if f.endswith(".parquet")
                ]
                if os.path.isdir(d)
                else []
            )
            self._datasets[seg] = pads.dataset(files, format="parquet") if files else None
        return self._datasets[seg]

    def lookup_terms(self, terms: list[str]) -> dict[str, TermPostings]:
        """Segment-pruned, predicate-pushed term row fetch."""
        out: dict[str, TermPostings] = {}
        for seg, seg_terms in self.meta.seg_dirs_for_terms(terms).items():
            ds = self._dataset(seg)
            if ds is None:
                continue
            tbl = ds.to_table(
                columns=_TP_COLS, filter=pc.field("term").isin(seg_terms)
            )
            for row in tbl.to_pylist():
                out[row["term"]] = TermPostings(
                    term=row["term"],
                    df=int(row["df"]),
                    doc_blob=row["doc_blob"],
                    tf_blob=row["tf_blob"],
                    dl_blob=row["dl_blob"],
                    block_last_doc=np.asarray(row["block_last_doc"], dtype=np.int64),
                    block_doc_off=np.asarray(row["block_doc_off"], dtype=np.int64),
                    block_tf_off=np.asarray(row["block_tf_off"], dtype=np.int64),
                    block_dl_off=np.asarray(row["block_dl_off"], dtype=np.int64),
                    block_max_tfnorm=np.asarray(
                        row["block_max_tfnorm"], dtype=np.float64
                    ),
                )
        return out

    def topk(self, query_text: str, k: int) -> list[tuple[int, float]]:
        """Exact conjunctive BM25 top-k with block skipping + block-max
        pruning. Returns [(doc_id, score)] ordered (score DESC, doc_id ASC)."""
        terms = analyze_query(query_text)
        if not terms:
            return []
        rows = self.lookup_terms(terms)
        if len(rows) != len(terms):
            return []  # AND semantics: any missing term → empty

        m = self.meta
        p = m.params
        idfs = {t: p.idf(m.n_docs, rows[t].df) for t in terms}

        # drive from the rarest term — candidates ⊆ its postings
        by_df = sorted(terms, key=lambda t: (rows[t].df, t))
        t0 = by_df[0]
        cand_docs, cand_tf0, cand_dl = rows[t0].decode_all()

        # per-candidate tf for every term, via block-range skipping
        tf_by_term: dict[str, np.ndarray] = {t0: cand_tf0}
        ub_extra = np.zeros(cand_docs.shape, dtype=np.float64)  # block-max UBs
        for t in by_df[1:]:
            tp = rows[t]
            if cand_docs.size == 0:
                return []
            # which blocks of t can contain remaining candidates?
            blk = np.searchsorted(tp.block_last_doc, cand_docs, side="left")
            valid = blk < len(tp.block_last_doc)
            cand_docs, cand_dl = cand_docs[valid], cand_dl[valid]
            blk = blk[valid]
            for tt in tf_by_term:
                tf_by_term[tt] = tf_by_term[tt][valid]
            ub_extra = ub_extra[valid]
            if cand_docs.size == 0:
                return []
            needed = np.unique(blk)
            d, tfv, _dl = tp.decode_blocks(needed)
            pos = np.searchsorted(d, cand_docs)
            pos_ok = pos < d.size
            hit = np.zeros(cand_docs.shape, dtype=bool)
            hit[pos_ok] = d[pos[pos_ok]] == cand_docs[pos_ok]
            cand_docs, cand_dl = cand_docs[hit], cand_dl[hit]
            for tt in tf_by_term:
                tf_by_term[tt] = tf_by_term[tt][hit]
            ub_extra = ub_extra[hit]
            blk = blk[hit]
            tf_by_term[t] = tfv[pos[hit]]
            # accumulate this term's block-max bound per surviving candidate
            ub_extra = ub_extra + idfs[t] * tp.block_max_tfnorm[blk]
            if cand_docs.size == 0:
                return []

        # block-max pruning: exact-safe candidate skipping when the upper
        # bound cannot beat the current kth score. Upper bound = driving
        # term's block max + other terms' block maxes.
        blk0 = np.searchsorted(rows[t0].block_last_doc, cand_docs, side="left")
        ub = ub_extra + idfs[t0] * rows[t0].block_max_tfnorm[blk0]

        k1, b, avgdl = p.k1, p.b, m.avgdl
        norm = k1 * (1.0 - b + b * (cand_dl.astype(np.float64) / avgdl))

        def score_subset(sel: np.ndarray) -> np.ndarray:
            s = np.zeros(sel.sum() if sel.dtype == bool else len(sel), np.float64)
            nrm = norm[sel]
            for t in terms:  # sorted order — oracle-identical summation
                tf = tf_by_term[t][sel].astype(np.float64)
                s = s + idfs[t] * (tf / (tf + nrm))
            return s

        n_cand = cand_docs.size
        if n_cand <= max(4 * k, 1024):
            scores = score_subset(np.arange(n_cand))
            sel_docs = cand_docs
        else:
            # score in descending-UB chunks; stop once the next chunk's max
            # UB is strictly below the kth best score.
            order = np.argsort(-ub, kind="stable")
            chunk = max(4 * k, 1024)
            kept_scores: list[np.ndarray] = []
            kept_docs: list[np.ndarray] = []
            kth = -np.inf
            for s0 in range(0, n_cand, chunk):
                idx = order[s0 : s0 + chunk]
                if kth > -np.inf and ub[idx].max() < kth:
                    break
                sc = score_subset(idx)
                kept_scores.append(sc)
                kept_docs.append(cand_docs[idx])
                allsc = np.concatenate(kept_scores)
                if allsc.size >= k:
                    kth = np.partition(allsc, allsc.size - k)[allsc.size - k]
            scores = np.concatenate(kept_scores)
            sel_docs = np.concatenate(kept_docs)

        order = np.lexsort((sel_docs, -scores))[:k]
        return [(int(sel_docs[i]), float(scores[i])) for i in order]


class DistributedQueryEngine:
    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.meta = IndexMeta(index_dir)
        self._searcher = LocalSearcher(index_dir)

    def _decoded_postings_df(self, terms: list[str]) -> DataFrame | None:
        """(term, doc_id, tf, dl) DataFrame for the given terms: segment-pruned
        file list, `term IN (...)` pushed to the parquet scan, Arrow-batched
        decode with chunked yield (head-term lists decode to millions of rows)."""
        seg_map = self.meta.seg_dirs_for_terms(terms)
        dirs = [
            self.meta.seg_dir(s)
            for s in sorted(seg_map)
            if os.path.isdir(self.meta.seg_dir(s)) and os.listdir(self.meta.seg_dir(s))
        ]
        if not dirs:
            return None
        idx = (
            self.spark.read.parquet(*dirs)
            .filter(F.col("term").isin(terms))
            .select("term", "doc_blob", "tf_blob", "dl_blob")
        )
        out_schema = T.StructType(
            [
                T.StructField("term", T.StringType(), False),
                T.StructField("doc_id", T.LongType(), False),
                T.StructField("tf", T.LongType(), False),
                T.StructField("dl", T.LongType(), False),
            ]
        )

        def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            CHUNK = 1 << 18
            for pdf in batches:
                for _, row in pdf.iterrows():
                    doc_ids, tfs = decode_postings(row["doc_blob"], row["tf_blob"])
                    dls = varbyte_decode(row["dl_blob"]).astype(np.int64)
                    for s in range(0, doc_ids.size, CHUNK):
                        e = s + CHUNK
                        yield pd.DataFrame(
                            {
                                "term": row["term"],
                                "doc_id": doc_ids[s:e],
                                "tf": tfs[s:e],
                                "dl": dls[s:e],
                            }
                        )

        return idx.mapInPandas(decode, schema=out_schema)

    def topk_df(self, query_text: str, k: int) -> DataFrame:
        """Distributed exact conjunctive BM25 top-k as a DataFrame
        (doc_id, score): decode → native-expression partials → deterministic
        ordered aggregation → global top-k."""
        m = self.meta
        p = m.params
        terms = analyze_query(query_text)
        empty = self.spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("doc_id", T.LongType()),
                    T.StructField("score", T.DoubleType()),
                ]
            ),
        )
        if not terms:
            return empty
        rows = self._searcher.lookup_terms(terms)
        if len(rows) != len(terms):
            return empty
        decoded = self._decoded_postings_df(terms)
        if decoded is None:
            return empty
        idf_map = F.create_map(
            *[
                x
                for t in terms
                for x in (F.lit(t), F.lit(p.idf(m.n_docs, rows[t].df)))
            ]
        )
        partial = idf_map[F.col("term")] * (
            F.col("tf").cast("double")
            / (
                F.col("tf").cast("double")
                + F.lit(p.k1)
                * (
                    F.lit(1.0 - p.b)
                    + F.lit(p.b) * (F.col("dl").cast("double") / F.lit(m.avgdl))
                )
            )
        )
        scored = (
            decoded.withColumn("partial", partial)
            .groupBy("doc_id")
            .agg(
                F.count("*").alias("nt"),
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("term", "partial"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["partial"],
                ).alias("score"),
            )
            .filter(F.col("nt") == F.lit(len(terms)))  # conjunctive AND
            .select("doc_id", "score")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )
        return scored

    def topk(self, query_text: str, k: int) -> list[tuple[int, float]]:
        rows = self.topk_df(query_text, k).collect()
        return [(r["doc_id"], r["score"]) for r in rows]
