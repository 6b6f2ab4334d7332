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
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from discogsography_spark.analysis import analyze_query
from discogsography_spark.codec import decode_postings, delta_decode, varbyte_decode
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
    champ_doc: np.ndarray | None = None
    champ_tf: np.ndarray | None = None
    champ_dl: np.ndarray | None = None

    def decode_all(self) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        doc_ids, tfs = decode_postings(self.doc_blob, self.tf_blob)
        dls = varbyte_decode(self.dl_blob).astype(np.int64)
        return doc_ids, tfs, dls

    def decode_blocks(
        self, block_indices: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Decode the given (sorted, unique) blocks. Consecutive blocks are
        decoded as single contiguous runs — docID gaps chain across block
        boundaries (block k's first gap is relative to block k-1's last doc),
        so one varbyte+delta pass covers a whole run. For dense candidate
        sets (head terms) this collapses thousands of per-block decodes into
        one vectorized call."""
        bi = np.asarray(block_indices, dtype=np.int64)
        if bi.size == 0:
            e = np.empty(0, dtype=np.int64)
            return e, e.copy(), e.copy()
        run_starts = np.flatnonzero(np.concatenate(([True], np.diff(bi) != 1)))
        run_ends = np.concatenate((run_starts[1:], [bi.size]))
        n_blocks = len(self.block_last_doc)

        def span(offsets: np.ndarray, blob: bytes, b0: int, b1: int) -> bytes:
            s = int(offsets[b0])
            e = int(offsets[b1 + 1]) if b1 + 1 < n_blocks else len(blob)
            return blob[s:e]

        docs_l, tfs_l, dls_l = [], [], []
        for rs, re_ in zip(run_starts, run_ends):
            b0, b1 = int(bi[rs]), int(bi[re_ - 1])
            prev = -1 if b0 == 0 else int(self.block_last_doc[b0 - 1])
            gaps = varbyte_decode(span(self.block_doc_off, self.doc_blob, b0, b1))
            docs_l.append(delta_decode(gaps, prev=prev))
            tfs_l.append(
                varbyte_decode(span(self.block_tf_off, self.tf_blob, b0, b1)).astype(
                    np.int64
                )
            )
            dls_l.append(
                varbyte_decode(span(self.block_dl_off, self.dl_blob, b0, b1)).astype(
                    np.int64
                )
            )
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
    "champ_doc",
    "champ_tf",
    "champ_dl",
]


class _SegmentReader:
    """Lucene-terms-dictionary analog over a term-sorted parquet segment:
    the `term` column is loaded once at open (cheap — no blobs); a lookup
    binary-searches the dictionary, then reads ONLY the row group containing
    the hit (segment files are written with small row groups for exactly this
    access pattern). A tiny row-group cache makes repeated head-term lookups
    free."""

    def __init__(self, files: list[str]):
        import pyarrow.parquet as pq

        self._pfs = [pq.ParquetFile(f) for f in files]
        self._terms: list[np.ndarray] = []
        self._rg_ends: list[np.ndarray] = []
        self._order: list[np.ndarray] = []  # argsort per file (robust to
        # unsorted files, e.g. hand-written or legacy segments)
        for pf in self._pfs:
            tcol = pf.read(columns=["term"]).column("term")
            terms = np.asarray(tcol.to_pylist(), dtype=object)
            order = np.argsort(terms, kind="stable")
            self._terms.append(terms[order])  # sorted dictionary view
            self._order.append(order)
            counts = [pf.metadata.row_group(i).num_rows for i in range(pf.num_row_groups)]
            self._rg_ends.append(np.cumsum(counts))
        self._rg_cache: dict[tuple[int, int], object] = {}

    def lookup(self, wanted: list[str]) -> list[dict]:
        out: list[dict] = []
        for fi, terms in enumerate(self._terms):
            if terms.size == 0:
                continue
            order = self._order[fi]
            pos = np.searchsorted(terms, wanted)
            for w, p in zip(wanted, pos):
                if p >= terms.size or terms[p] != w:
                    continue
                idx = int(order[p])  # raw row index in file order
                rg = int(np.searchsorted(self._rg_ends[fi], idx, side="right"))
                key = (fi, rg)
                tbl = self._rg_cache.get(key)
                if tbl is None:
                    avail = set(self._pfs[fi].schema_arrow.names)
                    cols = [c for c in _TP_COLS if c in avail]
                    tbl = self._pfs[fi].read_row_group(rg, columns=cols)
                    if len(self._rg_cache) > 64:
                        self._rg_cache.clear()
                    self._rg_cache[key] = tbl
                start = 0 if rg == 0 else int(self._rg_ends[fi][rg - 1])
                out.append(tbl.slice(idx - start, 1).to_pylist()[0])
        return out


class LocalSearcher:
    def __init__(self, index_dir: str):
        self.meta = IndexMeta(index_dir)
        self._readers: dict[int, _SegmentReader | None] = {}

    def _reader(self, seg: int) -> _SegmentReader | None:
        if seg not in self._readers:
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
            self._readers[seg] = _SegmentReader(files) if files else None
        return self._readers[seg]

    def lookup_terms(self, terms: list[str]) -> dict[str, TermPostings]:
        """Segment-pruned, dictionary-indexed term row fetch."""
        out: dict[str, TermPostings] = {}
        for seg, seg_terms in self.meta.seg_dirs_for_terms(terms).items():
            rd = self._reader(seg)
            if rd is None:
                continue
            for row in rd.lookup(sorted(seg_terms)):
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
                    champ_doc=np.asarray(row.get("champ_doc") or [], dtype=np.int64),
                    champ_tf=np.asarray(row.get("champ_tf") or [], dtype=np.int64),
                    champ_dl=np.asarray(row.get("champ_dl") or [], dtype=np.int64),
                )
        return out

    def topk(
        self, query_text: str, k: int, mode: str = "and"
    ) -> list[tuple[int, float]]:
        """Exact BM25 top-k. mode='and' (default): conjunctive, plainto_tsquery
        semantics; mode='or': disjunctive with max-score/block-max pruning.
        Returns [(doc_id, score)] ordered (score DESC, doc_id ASC)."""
        if mode == "or":
            return self._topk_or(query_text, k)
        terms = analyze_query(query_text)
        if not terms:
            return []
        rows = self.lookup_terms(terms)
        if len(rows) != len(terms):
            return []  # AND semantics: any missing term → empty

        m = self.meta
        p = m.params
        idfs = {t: p.idf(m.n_docs, rows[t].df) for t in terms}

        # single-term fast path: rank is monotone in tfnorm, so the champion
        # list answers k ≤ |champions| EXACTLY without decoding the postings
        # (impact-ordered early termination — the reference's 4-7 ms Lucene
        # autocomplete design point)
        if len(terms) == 1:
            tp = rows[terms[0]]
            if (
                tp.champ_doc is not None
                and tp.champ_doc.size
                and (k <= tp.champ_doc.size or tp.champ_doc.size == tp.df)
            ):
                tf = tp.champ_tf.astype(np.float64)
                norm = p.k1 * (
                    1.0 - p.b + p.b * (tp.champ_dl.astype(np.float64) / m.avgdl)
                )
                scores = idfs[terms[0]] * (tf / (tf + norm))
                # champions are already (tfnorm DESC, doc ASC) == final order
                return [
                    (int(d), float(s))
                    for d, s in zip(tp.champ_doc[:k], scores[:k])
                ]

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

        # Exact scoring, fully vectorized. Block-level pruning already
        # happened where it pays — non-driving terms decode only the blocks
        # whose docID ranges contain candidates — so scoring the surviving
        # candidate set is a handful of elementwise ops per term (~10 ms per
        # million candidates), cheaper than any upper-bound chunk machinery.
        # `ub_extra` (block-max sums) remains available as the pruning bound
        # for a future disjunctive (OR) mode.
        k1, b, avgdl = p.k1, p.b, m.avgdl
        norm = k1 * (1.0 - b + b * (cand_dl.astype(np.float64) / avgdl))
        scores = np.zeros(cand_docs.size, dtype=np.float64)
        for t in terms:  # sorted order — oracle-identical summation
            tf = tf_by_term[t].astype(np.float64)
            scores = scores + idfs[t] * (tf / (tf + norm))

        # top-k: argpartition to k survivors, then exact (score DESC, doc ASC)
        n_cand = cand_docs.size
        if n_cand > 4 * k:
            # every doc scoring >= the kth score stays in play, so boundary
            # ties still resolve by the doc_id tiebreak — exact
            kth = np.partition(-scores, k - 1)[k - 1]
            sel = np.flatnonzero(-scores <= kth)
        else:
            sel = np.arange(n_cand)
        sub_docs, sub_scores = cand_docs[sel], scores[sel]
        order = np.lexsort((sub_docs, -sub_scores))[:k]
        return [(int(sub_docs[i]), float(sub_scores[i])) for i in order]

    def _topk_or(self, query_text: str, k: int) -> list[tuple[int, float]]:
        """Disjunctive BM25 top-k with max-score pruning over block-max
        metadata (the WAND family):

        1. seed a threshold θ from champion lists — each champion doc's exact
           partial contribution is a LOWER bound of its true OR score;
        2. split terms into essential/non-essential by descending max
           contribution: a maximal suffix whose summed max contributions stay
           strictly below θ cannot, even best-case, lift a doc that appears
           ONLY there into the top-k (strict < keeps doc_id tie candidates);
        3. candidates = union of ESSENTIAL postings only — the pruning win:
           a 1M-posting head term that lands non-essential is never decoded
           in full, only block-skip probed for the candidates;
        4. exact scoring in sorted-term order (absent term adds nothing —
           float-identical to the oracle's skip).
        """
        terms = analyze_query(query_text)
        if not terms:
            return []
        rows = self.lookup_terms(terms)
        present = sorted(t for t in terms if t in rows)
        if not present:
            return []
        m, p = self.meta, self.meta.params
        k1, b, avgdl = p.k1, p.b, m.avgdl
        idfs = {t: p.idf(m.n_docs, rows[t].df) for t in present}
        maxcontrib = {
            t: idfs[t] * float(rows[t].block_max_tfnorm.max()) for t in present
        }

        # 1. θ from champion partials (exact lower bounds)
        champ_scores: dict[int, float] = {}
        for t in present:
            tp = rows[t]
            if tp.champ_doc is None or tp.champ_doc.size == 0:
                continue
            tf = tp.champ_tf.astype(np.float64)
            norm = k1 * (1.0 - b + b * (tp.champ_dl.astype(np.float64) / avgdl))
            contrib = idfs[t] * (tf / (tf + norm))
            for d, c in zip(tp.champ_doc, contrib):
                champ_scores[int(d)] = champ_scores.get(int(d), 0.0) + float(c)
        theta = (
            sorted(champ_scores.values(), reverse=True)[k - 1]
            if len(champ_scores) >= k
            else -np.inf
        )

        # 2. essential prefix under (maxcontrib DESC, term ASC)
        by_contrib = sorted(present, key=lambda t: (-maxcontrib[t], t))
        essential = list(by_contrib)
        tail_sum = 0.0
        for t in reversed(by_contrib):
            if len(essential) == 1:
                break
            if tail_sum + maxcontrib[t] < theta:
                tail_sum += maxcontrib[t]
                essential.pop()
            else:
                break

        # 3. candidate union from essential lists
        cand = np.unique(
            np.concatenate([rows[t].decode_all()[0] for t in essential])
        )
        if cand.size == 0:
            return []

        # 4. exact scoring, sorted-term accumulation
        scores = np.zeros(cand.size, dtype=np.float64)
        for t in present:
            tp = rows[t]
            blk = np.searchsorted(tp.block_last_doc, cand, side="left")
            valid = blk < len(tp.block_last_doc)
            if not valid.any():
                continue
            needed = np.unique(blk[valid])
            d, tfv, dlv = tp.decode_blocks(needed)
            pos = np.searchsorted(d, cand[valid])
            ok = pos < d.size
            hit_local = np.zeros(valid.sum(), dtype=bool)
            hit_local[ok] = d[pos[ok]] == cand[valid][ok]
            hit = np.flatnonzero(valid)[hit_local]
            tf = tfv[pos[hit_local]].astype(np.float64)
            dl = dlv[pos[hit_local]].astype(np.float64)
            norm = k1 * (1.0 - b + b * (dl / avgdl))
            scores[hit] = scores[hit] + idfs[t] * (tf / (tf + norm))

        if cand.size > 4 * k:
            kth = np.partition(-scores, k - 1)[k - 1]
            sel = np.flatnonzero(-scores <= kth)
        else:
            sel = np.arange(cand.size)
        sub_docs, sub_scores = cand[sel], scores[sel]
        order = np.lexsort((sub_docs, -sub_scores))[:k]
        return [(int(sub_docs[i]), float(sub_scores[i])) for i in order]


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
