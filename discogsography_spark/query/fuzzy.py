"""Trigram fuzzy term matching — the pg_trgm / Lucene-FuzzyQuery analog.

The reference's PostgreSQL can serve `SELECT ... WHERE name % 'tabel'`
through pg_trgm's GIN trigram index; Lucene exposes the same capability as
FuzzyQuery/spellcheck. This module is that capability over the engine's
vocabulary, in both serving and DataFrame form:

- trigram rule = pg_trgm's documented one: lowercase, pad two spaces in
  front and one behind, take DISTINCT 3-grams ("cat" → {"  c", " ca",
  "cat", "at "});
- similarity  = |A ∩ B| / |A ∪ B| (pg_trgm's similarity());
- serving     = GIN-style inverted map trigram → term ids over the term
  dictionary, so a query probes only terms SHARING at least one trigram
  (candidate-driven, never a full-vocab scan), then scores exactly;
- DataFrame   = native trigram arrays + array_intersect — one scan over the
  distinct-token vocabulary, SQL-mirrorable for the DuckDB oracle.

Determinism: similarity is a ratio of small ints (identical float64 in any
engine); ordering is (similarity DESC, term ASC).
"""

from __future__ import annotations

from collections import Counter

import numpy as np


def char_trigrams(word: str) -> list[str]:
    """Distinct pg_trgm-style trigrams of one lowercased word, sorted."""
    w = (word or "").lower()
    if not w:
        return []
    p = "  " + w + " "
    return sorted({p[i : i + 3] for i in range(len(p) - 2)})


def trigram_similarity(a: str, b: str) -> float:
    ta, tb = set(char_trigrams(a)), set(char_trigrams(b))
    if not ta or not tb:
        return 0.0
    inter = len(ta & tb)
    return inter / (len(ta) + len(tb) - inter)


class TrigramVocabIndex:
    """GIN-style trigram → term-id inverted map over a vocabulary.

    suggest(word) touches only the posting lists of the query's trigrams
    (pg_trgm's index strategy): candidate intersection counts come from one
    Counter pass over those lists, similarity needs no per-term set
    construction (|B| is precomputed), and the result is exact."""

    def __init__(self, terms: list[str]):
        self.terms = sorted(set(terms))
        self.n_trigrams = np.empty(len(self.terms), dtype=np.int32)
        self._post: dict[str, list[int]] = {}
        for i, t in enumerate(self.terms):
            tgs = char_trigrams(t)
            self.n_trigrams[i] = len(tgs)
            for g in tgs:
                self._post.setdefault(g, []).append(i)

    def suggest(
        self, word: str, k: int = 10, min_sim: float = 0.3
    ) -> list[tuple[str, float]]:
        q = char_trigrams(word)
        if not q:
            return []
        nq = len(q)
        inter = Counter()
        for g in q:
            for tid in self._post.get(g, ()):
                inter[tid] += 1
        scored = []
        for tid, shared in inter.items():
            sim = shared / (nq + int(self.n_trigrams[tid]) - shared)
            if sim >= min_sim:
                scored.append((self.terms[tid], sim))
        scored.sort(key=lambda ts: (-ts[1], ts[0]))
        return scored[:k]

    def probe_all(self, trigrams: set[str]) -> np.ndarray:
        """Sorted term ids containing EVERY given trigram — the pg_trgm
        GIN LIKE probe (gin_trgm_ops supports LIKE by requiring all
        extracted trigrams): posting-list intersection, rarest first."""
        lists = []
        for g in trigrams:
            post = self._post.get(g)
            if not post:
                return np.empty(0, dtype=np.int64)
            lists.append(np.asarray(post, dtype=np.int64))
        lists.sort(key=len)
        cand = lists[0]
        for arr in lists[1:]:
            cand = np.intersect1d(cand, arr, assume_unique=True)
            if cand.size == 0:
                break
        return cand


def like_trigrams(pattern: str) -> set[str]:
    """Trigrams every wildcard/LIKE match must contain — pg_trgm's
    query-extraction strategy for LIKE: 3-char windows fully inside a
    literal run, plus the padded boundary windows when the run is
    anchored at the word start ('  x', ' xy') or end ('yz '). `?` (one
    unknown char) breaks runs like `*` does. An empty set means the
    pattern has no probeable window — callers fall back to a dictionary
    scan."""
    req: set[str] = set()
    runs: list[tuple[str, bool, bool]] = []
    cur: list[str] = []
    for i, c in enumerate(pattern):
        if c in "*?":
            if cur:
                runs.append(("".join(cur), i - len(cur) == 0, False))
                cur = []
        else:
            cur.append(c)
    if cur:
        runs.append(("".join(cur), len(pattern) - len(cur) == 0, True))
    for run, at_start, at_end in runs:
        s = ("  " if at_start else "") + run + (" " if at_end else "")
        if len(s) >= 3:
            req.update(s[i : i + 3] for i in range(len(s) - 2))
    return req


def fuzzy_term_matches(
    docs,
    word: str,
    k: int = 10,
    min_sim: float = 0.3,
    text_col: str = "text",
    round_dp: int = 6,
):
    """DataFrame path: distinct-token vocabulary → native trigram arrays →
    pg_trgm similarity vs `word` → top-k (sim DESC, term ASC). One scan +
    one distinct shuffle; the per-term trigram work is whole-stage-codegen
    string ops, no Python."""
    from pyspark.sql import functions as F

    from discogsography_spark.operators.textstats import tokens_col

    q = char_trigrams(word)
    spark = docs.sparkSession
    if not q:
        return spark.createDataFrame([], "term string, similarity double")
    vocab = (
        docs.select(F.explode(tokens_col(text_col)).alias("term")).distinct()
    )
    tgs = F.array_distinct(
        F.expr(
            "transform(sequence(1, length(concat('  ', term, ' ')) - 2), "
            "i -> substring(concat('  ', term, ' '), i, 3))"
        )
    )
    qarr = F.array(*[F.lit(g) for g in q])
    out = (
        vocab.withColumn("_tg", tgs)
        .withColumn("_inter", F.size(F.array_intersect(F.col("_tg"), qarr)))
        .filter(F.col("_inter") > 0)
        .withColumn(
            "similarity",
            F.round(
                F.col("_inter")
                / (F.size("_tg") + F.lit(len(q)) - F.col("_inter")),
                round_dp,
            ),
        )
        .filter(F.col("similarity") >= min_sim)
        .select("term", "similarity")
        .orderBy(F.desc("similarity"), F.asc("term"))
        .limit(k)
    )
    return out
