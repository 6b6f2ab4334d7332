"""Elasticsearch-style request-body API: one JSON-able dict in, one
JSON-able dict out, over any of the three services (single, sharded,
live merged) — the "switch your ES client over" surface that packages
every served capability behind a single deterministic request shape
(reference analog: its API layer dispatches every frontend through one
query module, SURVEY.md §3.3).

    body = {
        "query": "spark^2 index",          # ^boost routes via topk_boosted
        "mode": "and" | "or" | "bool",
        "k": 10, "offset": 0,              # or "search_after": [score, id]
        "filter": {"role": "user",         # categorical drill-down
                   "turn_idx": {"gte": 2, "lte": 8}},   # numeric range
        "synonyms": {"spark": ["stream"]},
        "fuzzy": true,
        "highlight": true | {"fragments": 2, "mode": "cover"},
        "aggs": {
            "roles":   {"terms": {"field": "role"}},
            "len":     {"stats": {"field": "n_chars"}},
            "hist":    {"histogram": {"field": "turn_idx", "interval": 5}},
            "months":  {"date_histogram": {"field": "ts", "interval": "month"}},
            "pct":     {"percentiles": {"field": "n_chars"}},
            "card":    {"cardinality": {"field": "n_chars"}},
            "sig":     {"significant_terms": {"k": 10}},
            "by_conv": {"grouped": {"field": "conv_id", "k": 10}},
            "best":    {"top_hits": {"field": "conv_id", "k": 5}},
        },
    }

Aggregations run over the request's MATCHED set (drill-down filters
applied), except significant_terms and grouped (query-level aggregates
with their own exact semantics). Unknown keys or agg kinds raise — a
typo must never silently return the unfiltered corpus.
"""

from __future__ import annotations

import time
from typing import Any

import numpy as np

_BODY_KEYS = {
    "query", "mode", "k", "size", "offset", "search_after", "filter",
    "synonyms", "fuzzy", "highlight", "aggs", "budget_ms",
}
_AGG_KINDS = {
    "terms", "stats", "histogram", "date_histogram", "percentiles",
    "cardinality", "significant_terms", "grouped", "top_hits",
}


def _parse_filter(spec: dict | None) -> dict | None:
    """{"role": "user", "turn_idx": {"gte": 2, "lte": 8}} → the services'
    filter dict (range dicts become (lo, hi) tuples)."""
    if not spec:
        return None
    out: dict[str, Any] = {}
    for field, val in spec.items():
        if isinstance(val, dict):
            extra = set(val) - {"gte", "lte"}
            if extra:
                raise ValueError(
                    f"range filter on {field!r}: unknown keys {sorted(extra)}"
                )
            out[field] = (val.get("gte"), val.get("lte"))
        else:
            out[field] = val
    return out


def _matched_for(
    svc,
    query_text: str,
    mode: str,
    filt: dict | None,
    synonyms: dict | None = None,
):
    """Matched set(s) for agg evaluation: one sorted array on the single/
    merged services, a per-shard list on the sharded service (its agg
    methods combine exactly across doc-disjoint shards). A synonym query
    aggregates over the GROUP-matched set (every group has ≥1 member),
    not the plain conjunctive one."""
    from discogsography_spark.query.serving import (
        _facet_filter_keep,
        _synonym_groups,
    )

    if hasattr(svc, "services"):  # ShardedSearchService
        if synonyms:
            an = svc.services[0]._an
            groups = _synonym_groups(an, query_text, synonyms)
            out = []
            for s in svc.services:
                m = s.matched_docs_synonym(groups)
                if filt:
                    m = _facet_filter_keep(
                        s._facet_codes, s._facet_cats, m, filt, svc=s
                    )
                out.append(m)
            return out
        return [
            s._filtered_matched(query_text, mode, filt)
            if filt
            else s.matched_docs(query_text, mode=mode)
            for s in svc.services
        ]
    if synonyms:
        groups = _synonym_groups(svc._an, query_text, synonyms)
        m = svc.matched_docs_synonym(groups)
        if filt:
            m = _facet_filter_keep(
                svc._facet_codes, svc._facet_cats, m, filt, svc=svc
            )
        return m
    if filt:
        return svc._filtered_matched(query_text, mode, filt)
    return svc.matched_docs(query_text, mode=mode)


def _run_agg(svc, name: str, spec: dict, ctx: dict) -> Any:
    if not isinstance(spec, dict) or len(spec) != 1:
        raise ValueError(f"agg {name!r}: expected one {{kind: params}} entry")
    kind, params = next(iter(spec.items()))
    if kind not in _AGG_KINDS:
        raise ValueError(f"agg {name!r}: unknown kind {kind!r}")
    params = dict(params or {})

    if kind == "significant_terms":
        rows = svc.significant_terms(
            ctx["query"], k=int(params.pop("k", 10)),
            mode=ctx["mode"], **params,
        )
        return [
            {"term": t, "fg": fg, "bg": bg, "score": s}
            for t, fg, bg, s in rows
        ]
    if kind == "top_hits":
        # ES top_hits-per-bucket: the best-scoring doc of each group with
        # the group's exact matched count (the collapse surface)
        rows = svc.collapse(
            ctx["query"], params["field"], int(params.get("k", 10)),
            mode=ctx["mode"],
        )
        return [
            {
                "group": g, "doc_id": int(d), "score": float(s),
                "group_matched": int(c),
            }
            for g, d, s, c in rows
        ]
    if kind == "grouped":
        rows = svc.grouped_topk(
            ctx["query"], params["field"], int(params.get("k", 10)),
            mode=ctx["mode"],
        )
        return [
            {
                "group": g, "sum_score": s, "avg_score": a,
                "max_score": x, "n_matched": n,
            }
            for g, s, a, x, n in rows
        ]

    matched = ctx["matched"]
    if kind == "terms":
        field = params["field"]
        if isinstance(matched, list):  # sharded: sum per-shard counts
            acc: dict[str, int] = {}
            for s, m in zip(svc.services, matched):
                for v, n in s.facet_counts(m, [field])[field]:
                    acc[v] = acc.get(v, 0) + n
            return sorted(acc.items())
        return svc.facet_counts(matched, [field])[field]
    if kind == "stats":
        field = params["field"]
        if isinstance(matched, list):
            from discogsography_spark.query.serving import _combine_stats

            return _combine_stats(
                [
                    s.field_stats(m, [field])
                    for s, m in zip(svc.services, matched)
                ]
            )[field]
        return svc.field_stats(matched, [field])[field]
    if kind == "histogram":
        return svc.numeric_histogram(
            matched, params["field"], float(params["interval"])
        )
    if kind == "date_histogram":
        return svc.date_histogram(
            matched, params.get("field", "ts"),
            params.get("interval", "month"),
        )
    if kind == "percentiles":
        pct = svc.field_percentiles(
            matched, params["field"],
            tuple(params.get("percents", (25.0, 50.0, 75.0, 95.0))),
        )
        return {str(q): v for q, v in pct.items()}
    if kind == "cardinality":
        return svc.field_cardinality(matched, params["field"])
    raise AssertionError(kind)


def run_request(svc, body: dict) -> dict:
    """Execute one request body against a service; returns a JSON-able
    response dict (hits, total, facets-as-aggs, headlines, next_after,
    aggregations, took_ms)."""
    unknown = set(body) - _BODY_KEYS
    if unknown:
        raise ValueError(f"unknown request keys: {sorted(unknown)}")
    t0 = time.time()
    query = body.get("query", "")
    mode = body.get("mode", "and")
    k = int(body.get("k", body.get("size", 10)))
    filt = _parse_filter(body.get("filter"))
    hl = body.get("highlight", False)
    hl_kwargs: dict[str, Any] = {}
    if isinstance(hl, dict):
        hl_kwargs = {
            "highlight_fragments": hl.get("fragments"),
            "fragment_mode": hl.get("mode", "term"),
        }
        hl = True
    after = body.get("search_after")
    if "^" in query:
        # boosted clauses route through topk_boosted (the analyzer would
        # otherwise split `spark^2` into two tokens and silently change
        # the query); matching is boost-independent, so totals/aggs use
        # the plain analyzed terms
        if body.get("synonyms") or body.get("fuzzy") or mode == "bool":
            raise ValueError(
                "^boost composes with mode='and'/'or' plain queries"
            )
        from discogsography_spark.analysis import parse_boosted_query

        terms, _boosts = parse_boosted_query(query)
        plain = " ".join(terms)
        ranker = (
            svc.sharded.topk_boosted
            if hasattr(svc, "sharded")
            else svc.searcher.topk_boosted
        )
        offset = int(body.get("offset", 0))
        # drill-down needs the FULL ranking before the filter cut (a
        # k+offset prefix can under-fill the filtered page); unfiltered
        # requests rank only to page depth
        depth = 2**31 if filt else k + offset
        kw = {
            "budget_ms": body.get("budget_ms"),
            "after": tuple(after) if after is not None else None,
        }
        if filt and not hasattr(svc, "sharded"):
            # full-depth drill-down rankings are corpus-sized — keep them
            # out of the COUNT-bounded result memo, where one head query
            # could pin a corpus of tuples (ADVICE r6)
            kw["use_result_cache"] = False
        hits = ranker(query, depth, mode=mode, **kw)
        matched = _matched_for(svc, plain, mode, filt)
        if filt:
            if isinstance(matched, list):
                # per-shard matched are LOCAL ids; the fan-out ranking is
                # GLOBAL — translate through the shard offsets
                keep = {
                    int(off) + int(d)
                    for off, m in zip(svc.offsets, matched)
                    for d in m
                }
            else:
                keep = set(matched.tolist())
            hits = [(d, s) for d, s in hits if int(d) in keep]
        hits = hits[offset:offset + k]
        total = (
            sum(int(m.size) for m in matched)
            if isinstance(matched, list)
            else int(matched.size)
        )
        out: dict[str, Any] = {
            "total": total,
            "hits": [
                {"doc_id": int(d), "score": float(s)} for d, s in hits
            ],
            "next_after": (
                [float(hits[-1][1]), int(hits[-1][0])] if hits else None
            ),
        }
        aggs = body.get("aggs") or {}
        if aggs:
            ctx = {"query": plain, "mode": mode, "matched": matched}
            out["aggregations"] = {
                name: _run_agg(svc, name, spec, ctx)
                for name, spec in aggs.items()
            }
        out["took_ms"] = round((time.time() - t0) * 1000.0, 3)
        return out
    resp = svc.search(
        query, k, mode=mode, filter=filt, highlight=bool(hl),
        fuzzy=bool(body.get("fuzzy", False)),
        synonyms=body.get("synonyms"),
        offset=int(body.get("offset", 0)),
        search_after=tuple(after) if after is not None else None,
        budget_ms=body.get("budget_ms"),
        **hl_kwargs,
    )
    out: dict[str, Any] = {
        "total": resp.total_matched,
        "hits": [
            {"doc_id": int(d), "score": float(s)} for d, s in resp.results
        ],
        "next_after": list(resp.next_after) if resp.next_after else None,
    }
    if resp.rewrites:
        out["rewrites"] = resp.rewrites
    if resp.headlines:
        out["headlines"] = {
            str(d): h for d, h in resp.headlines.items()
        }
    aggs = body.get("aggs") or {}
    if aggs:
        ctx = {
            "query": query,
            "mode": mode,
            "matched": _matched_for(
                svc, query, mode, filt, synonyms=body.get("synonyms")
            ),
        }
        out["aggregations"] = {
            name: _run_agg(svc, name, spec, ctx)
            for name, spec in aggs.items()
        }
    out["took_ms"] = round((time.time() - t0) * 1000.0, 3)
    return out
