"""More-like-this: find documents similar to a given document.

Lucene's MoreLikeThisQuery (the engine behind "similar releases" features;
the reference stack's Neo4j fulltext indexes are Lucene BM25,
api/queries/neo4j_queries.py:120-129): select the source document's most
characteristic terms by tf·idf, then run a disjunctive BM25 query with
them, excluding the source itself.

Determinism contract: the selection score rounds to `round_dp` decimals
and ties break term-ASC (the engine-wide round-then-rank discipline), so
term selection is bit-identical between the index path, the DataFrame
mirror, and the SQL oracle regardless of libm ulp differences.
"""

from __future__ import annotations

from collections import Counter

from discogsography_spark.params import BM25Params

__all__ = ["select_mlt_terms", "service_more_like_this"]


def select_mlt_terms(
    tokens: list[str],
    dfs: dict[str, int],
    n_docs: int,
    params: BM25Params,
    max_terms: int = 8,
    min_df: int = 2,
    max_df_frac: float = 0.25,
    round_dp: int = 5,
) -> list[str]:
    """The source document's top `max_terms` terms by round(tf·idf, dp),
    ties term-ASC. Terms with corpus df < min_df are noise (near-unique
    strings select nothing transferable) — Lucene MLT's minDocFreq; terms
    in more than `max_df_frac` of the corpus are non-discriminative head
    terms — Lucene MLT's maxDocFreq(Pct). The head guard matters doubly
    at scale: a high-tf head term can out-score rare terms on raw tf·idf
    (measured at 12M docs: df-8M terms selected), polluting the neighbor
    set AND turning the OR evaluation into a multi-million-posting scan
    (p50 592 -> 19 ms after the guard)."""
    tf = Counter(tokens)
    max_df = max_df_frac * n_docs
    scored = []
    for t, f in tf.items():
        df = dfs.get(t)
        if df is None or df < min_df or df > max_df:
            continue
        scored.append((-round(f * params.idf(n_docs, df), round_dp), t))
    scored.sort()
    return [t for _s, t in scored[:max_terms]]


def service_more_like_this(
    svc,
    doc_id: int,
    k: int,
    max_terms: int = 8,
    min_df: int = 2,
    max_df_frac: float = 0.25,
) -> list[tuple[int, float]]:
    """Shared service implementation. `svc` supplies
    `_mlt_source_tokens(doc_id)` (the doc's ANALYZED token stream from the
    docmap — exact indexed tokens, available on every index),
    `_mlt_stats(terms) -> (dfs, n_docs, params)`, and
    `_mlt_or_eval(terms) -> (k' -> ranked list)`. Returns the top-k
    [(doc_id, score)] by disjunctive BM25 over the selected terms, source
    document excluded."""
    tokens = svc._mlt_source_tokens(doc_id)
    if not tokens or k <= 0:
        return []
    uniq = sorted(set(tokens))
    dfs, n_docs, params = svc._mlt_stats(uniq)
    terms = select_mlt_terms(
        tokens, dfs, n_docs, params,
        max_terms=max_terms, min_df=min_df, max_df_frac=max_df_frac,
    )
    if not terms:
        return []
    # k+1 covers the source doc appearing anywhere in the top k+1; any
    # doc below stays below after the single removal. Terms evaluate in
    # SORTED order — the engine-wide fixed float64 summation order.
    res = svc._mlt_or_eval(sorted(terms))(k + 1)
    return [(d, s) for d, s in res if d != doc_id][:k]
