"""Field-collapsed top-k (result grouping): best document per group.

The transcript deployment's natural result shape — search TURNS, return
CONVERSATIONS, each represented by its best-scoring turn. This is Lucene/
Solr field collapsing / Elasticsearch `collapse`; the reference's search
endpoint has the same shape with entity type as the group key: one
subquery per entity table with a per-table rank cap, UNION ALL'd into a
single ranked list (api/queries/search_queries.py:105-197), so each
entity type surfaces its best-ranked rows exactly once.

Exactness by iterative deepening over any EXACT top-k' evaluator
----------------------------------------------------------------
`collapse_topk` asks the underlying evaluator for its top-k' documents
under the engine-wide (score DESC, doc_id ASC) tiebreak. A group's best
document is its FIRST document in that total order, and group rank order
is first-occurrence order. If the k' fetched documents collapse to >= k
distinct groups — or fewer than k' documents matched at all, so the
evaluator is exhausted — the collapsed prefix is exact: every unseen
document orders strictly after the deepest fetched one, so an unseen
group's best key orders after every returned group's key, and an unseen
document can never improve an already-seen group (later order never
replaces a group's first-seen best). Otherwise k' quadruples and the
evaluator re-runs (memoized decoded postings make the retry cheap).

This wraps ANY exact ranked evaluator — AND / OR / boolean / phrase /
proximity, local, live-merged, or sharded fan-out — without touching the
pruning machinery: block-max pruning with a k-th GROUP threshold would
need a lower (weaker) theta than the k-th DOC threshold it maintains, so
deepening keeps WAND untouched and provably exact.
"""

from __future__ import annotations

from typing import Callable, Hashable

import numpy as np

__all__ = ["collapse_topk", "service_collapse"]


def collapse_topk(
    topk_fn: Callable[[int], list[tuple[int, float]]],
    group_of: Callable[[int], Hashable],
    k: int,
    probe_k: int | None = None,
) -> list[tuple[Hashable, int, float]]:
    """Exact top-k (group, best_doc_id, best_score) triples.

    topk_fn(k') must return the EXACT top-k' [(doc_id, score)] ordered by
    (score DESC, doc_id ASC); group_of maps a docID to a hashable group
    key. `probe_k` overrides the first fetch depth (default max(4k, 16))
    — tests force it to 1 to exercise the deepening loop.
    """
    if k <= 0:
        return []
    kp = max(probe_k if probe_k is not None else max(4 * k, 16), 1)
    while True:
        res = topk_fn(kp)
        exhausted = len(res) < kp
        best: dict[Hashable, tuple[int, float]] = {}
        for d, s in res:  # already (score DESC, doc ASC)
            g = group_of(d)
            if g not in best:
                best[g] = (d, s)
        if exhausted or len(best) >= k:
            # dict insertion order == first-occurrence order == the exact
            # (best_score DESC, best_doc ASC) group order — no re-sort
            return [(g, d, s) for g, (d, s) in list(best.items())[:k]]
        kp *= 4


def service_collapse(
    svc,
    query_text: str,
    field: str,
    k: int,
    mode: str = "and",
    counts: bool = True,
    probe_k: int | None = None,
) -> list[tuple]:
    """Shared SearchService / MergedSearchService collapse implementation.

    `svc` supplies `_collapse_codes(field) -> (codes, cats)` (dense
    per-docID int codes + category labels, the facet-array layout),
    `_collapse_eval(query_text, mode) -> (k' -> exact ranked list)`, and
    `matched_docs`. Returns
    [(group_label, doc_id, score, group_matched)] — group_matched is the
    group's EXACT total matched-document count (one bincount over the
    full matched set, the facet-counting recipe), or triples when
    counts=False.
    """
    codes, cats = svc._collapse_codes(field)
    fn = svc._collapse_eval(query_text, mode)
    rows = collapse_topk(fn, lambda d: int(codes[d]), k, probe_k=probe_k)
    if not counts:
        return [(cats[g], d, s) for g, d, s in rows]
    matched = svc.matched_docs(query_text, mode=mode)
    cnt = (
        np.bincount(codes[matched], minlength=len(cats))
        if matched.size
        else np.zeros(len(cats), dtype=np.int64)
    )
    return [(cats[g], d, s, int(cnt[g])) for g, d, s in rows]
