"""Sharded serving: exact BM25 over many shard indexes with GLOBAL stats.

This is the 10^12-turn serving architecture the build side already assumes
(scripts/executor_scaling.py builds one index per disjoint conv-range
shard — the standard doc-sharded layout every distributed search engine
uses, and the reference's per-table fan-out of search_queries.py:213-234
taken to its cluster form):

- each shard is a complete, independently-built index over a conv_id range;
- shard docIDs are the shard-local dense rank; the GLOBAL docID is the
  shard offset (cumulative doc counts in shard order) + local id — identical
  to the single-index dense rank because shards are consecutive key ranges;
- BM25 statistics must be GLOBAL for scores to be comparable: n_docs and
  total_tokens sum across shard manifests at open; per-term df sums across
  shard lookups per query. Global idf/avgdl are injected into each shard's
  evaluator (the stats override in LocalSearcher._topk_and), so a shard
  scores its local postings with corpus-wide constants;
- merge = concatenate per-shard top-k, sort (score DESC, global doc ASC),
  cut at k. Exact: scores are doc-local given global stats, so the global
  top-k is a subset of the union of per-shard top-k's.

Result: bit-identical to a single index built over the whole corpus
(tested), while every shard serves independently — the fan-out a 1000-node
serving tier performs with one RPC per shard.

Shard probes run CONCURRENTLY: the default (`parallel=True`) forks one
worker PROCESS per shard (query/shardpool.py) — the shared-nothing model of
a real per-shard serving node, and the only fan-out that actually scales on
CPython (per-shard probes are interpreter-glued numpy, so a thread pool
serializes on the GIL and measures SLOWER than sequential; the process pool
holds p95 flat as shard count doubles). `parallel="thread"` keeps the
thread-pool variant (the right shape when per-shard work is a remote RPC),
`parallel=False` the sequential loop — both for A/B measurement, all three
bit-identical (tested). Every query costs two fan-out rounds: a stats RPC
(per-term df; the coordinator derives global idfs without moving posting
blobs) and the evaluator RPC returning the per-shard top-k.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Iterable, TypeVar

import numpy as np

from discogsography_spark.analysis import get_analyzer
from discogsography_spark.query.engine import LocalSearcher

_A = TypeVar("_A")
_R = TypeVar("_R")


class ShardedSearcher:
    def __init__(
        self,
        index_dirs: list[str],
        parallel: bool | str = True,
        live: bool | None = None,
    ):
        """`live` opens each shard as a MergedSearcher over its own
        base + streaming deltas + tombstones — the LIVE sharded tier (every
        serving node carries its LSM delta tail between compactions; the
        reference's continuously-upserted tables, sharded). None
        auto-detects: live iff any shard directory has committed deltas.
        Global stats are the ALIVE sums, so live sharded rankings equal a
        fresh single rebuild over the latest-version alive corpus (tested);
        global docIDs offset by each shard's id_space (dead ids keep their
        slots until compact), so they stay unique across shards."""
        if not index_dirs:
            raise ValueError("at least one shard required")
        from discogsography_spark.streaming.incremental import list_deltas

        if live is None:
            live = any(list_deltas(d) for d in index_dirs)
        self.live = bool(live)
        if self.live:
            from discogsography_spark.streaming.incremental import (
                MergedSearcher,
            )

            self.shards = [MergedSearcher(d) for d in index_dirs]
            metas = [s.base.meta for s in self.shards]
            counts = [s.id_space for s in self.shards]
            self.n_docs = int(sum(s.n_docs for s in self.shards))
            self.total_tokens = int(
                sum(s.total_tokens for s in self.shards)
            )
        else:
            self.shards = [LocalSearcher(d) for d in index_dirs]
            metas = [s.meta for s in self.shards]
            counts = [m.n_docs for m in metas]
            self.n_docs = int(sum(counts))
            self.total_tokens = int(sum(m.total_tokens for m in metas))
        self._procs = None
        self._pool: ThreadPoolExecutor | None = None
        self._heavy_pool: ThreadPoolExecutor | None = None
        if len(index_dirs) > 1 and parallel == "thread":
            self._pool = ThreadPoolExecutor(
                max_workers=min(len(index_dirs), os.cpu_count() or 4),
                thread_name_prefix="shard-fanout",
            )
        elif len(index_dirs) > 1 and parallel:
            from discogsography_spark.query.shardpool import ShardWorkerPool

            self._procs = ShardWorkerPool(index_dirs, live=self.live)
        analyzers = {m.analyzer for m in metas}
        if len(analyzers) != 1:
            raise ValueError(f"shards disagree on analyzer: {analyzers}")
        self.analyzer = analyzers.pop()
        params = {(m.params.k1, m.params.b) for m in metas}
        if len(params) != 1:
            raise ValueError(f"shards disagree on BM25 params: {params}")
        self.params = metas[0].params
        self.offsets = np.concatenate(([0], np.cumsum(counts)[:-1])).astype(np.int64)
        self.avgdl = self.total_tokens / self.n_docs if self.n_docs else 1.0

    def close(self) -> None:
        if self._procs is not None:
            self._procs.close()
        if self._pool is not None:
            self._pool.shutdown(wait=False)
        if self._heavy_pool is not None:
            self._heavy_pool.shutdown(wait=False)

    def reopen(self) -> bool:
        """Advance every LIVE shard's delta snapshot (MergedSearcher.
        reopen) and recompute the global offsets/stats — the long-lived
        coordinator's view refresh between compactions. Worker-pool
        deployments reopen the worker-held searchers through one RPC per
        shard; the coordinator's own shard copies reopen locally so both
        views stay in lockstep. Static (no-delta) tiers return False —
        a static shard never changes under a committed write (deltas make
        it live; open a live searcher to serve them)."""
        if not self.live:
            return False
        changed = [bool(s.reopen()) for s in self.shards]
        if self._procs is not None:
            worker_changed = self._procs.call(
                "reopen", [{}] * len(self.shards)
            )
            changed = [a or bool(b) for a, b in zip(changed, worker_changed)]
        if not any(changed):
            return False
        counts = [s.id_space for s in self.shards]
        self.n_docs = int(sum(s.n_docs for s in self.shards))
        self.total_tokens = int(sum(s.total_tokens for s in self.shards))
        self.offsets = np.concatenate(
            ([0], np.cumsum(counts)[:-1])
        ).astype(np.int64)
        self.avgdl = self.total_tokens / self.n_docs if self.n_docs else 1.0
        return True

    def _fanout(self, fn: Callable[[_A], _R], items: Iterable[_A]) -> list[_R]:
        """Order-preserving map over coordinator-side per-shard work (used
        by ShardedSearchService's facet/count loops): thread-pooled only in
        thread mode, else sequential — measured fastest in both cases for
        SMALL per-item work (the GIL eats thread wins on glue-dominated
        calls). Numpy-heavy per-shard work goes through _fanout_heavy."""
        if self._pool is None:
            return [fn(x) for x in items]
        return list(self._pool.map(fn, items))

    def _fanout_heavy(
        self, fn: Callable[[_A], _R], items: list[_A]
    ) -> list[_R]:
        """Order-preserving THREADED map for numpy-heavy coordinator-side
        per-shard work (matched-set intersections, facet/count bincounts):
        the kernels release the GIL, so threads parallelize across shards
        even in worker-pool mode — measured 16x on the sf1.0 8-shard
        exact-group-count leg (p95 1074 -> 67 ms). Falls back to the
        sequential loop for a single shard."""
        if len(items) <= 1:
            return [fn(x) for x in items]
        if self._heavy_pool is None:
            self._heavy_pool = ThreadPoolExecutor(
                max_workers=min(len(self.shards), os.cpu_count() or 4),
                thread_name_prefix="shard-heavy",
            )
        return list(self._heavy_pool.map(fn, items))

    def _call_shards(self, method: str, kwargs_list: list[dict | None]) -> list:
        """Invoke a LocalSearcher method per shard (None kwargs = skip that
        shard, result slot None). Routes to the worker-process pool, the
        thread pool, or a sequential loop — results in shard order."""
        if self._procs is not None:
            return self._procs.call(method, kwargs_list)

        def one(arg):
            shard, kw = arg
            if kw is None:
                return None
            kw = dict(kw)
            bm = kw.pop("_budget_ms", None)
            if bm is None:
                return getattr(shard, method)(**kw)
            with shard.deadline(bm):  # same contract as the worker pool
                return getattr(shard, method)(**kw)

        return self._fanout(one, list(zip(self.shards, kwargs_list)))

    def _global_idfs(
        self, terms: list[str], budget_ms: float | None = None
    ) -> tuple[list[dict[str, int]], dict[str, float]]:
        """Per-shard {term: df} + global idfs (df summed across shard
        dictionaries — the stats RPC of a real serving tier; only df
        numbers move, never posting data). `budget_ms` rides the RPC per
        leg — a significant-terms candidate sweep can feed thousands of
        terms, and the worker-side dictionary fetch must honor the
        deadline like every other leg."""
        if self._procs is not None:
            kw: dict = {"terms": terms}
            if budget_ms is not None:
                kw["_budget_ms"] = budget_ms
            per_shard_dfs = self._procs.call(
                "term_stats", [dict(kw)] * len(self.shards)
            )
        elif budget_ms is not None:
            def _leg(s):
                with s.deadline(budget_ms):
                    return s.term_dfs(terms)

            per_shard_dfs = self._fanout(_leg, self.shards)
        else:
            per_shard_dfs = self._fanout(
                lambda s: s.term_dfs(terms), self.shards
            )
        gdf = {t: sum(r[t] for r in per_shard_dfs if t in r) for t in terms}
        idfs = {
            t: self.params.idf(self.n_docs, gdf[t]) for t in terms if gdf[t] > 0
        }
        return per_shard_dfs, idfs

    def _per_shard_kws(
        self,
        kw: dict,
        after: tuple[float, int] | None,
        flags: list[bool],
    ) -> list[dict | None]:
        """Per-shard kwargs for a cursor-paged fan-out: a global
        search_after cursor (score, GLOBAL doc_id) translates to each
        shard's LOCAL id space as (score, cursor_doc - shard_offset) —
        local_doc > cursor_doc - offset ⟺ global_doc > cursor_doc, and
        scores are globally comparable (injected global stats), so each
        shard returns its exact k-after-cursor and the merge is the usual
        concatenate-sort-cut. This is WHY search_after beats OFFSET at
        scale: every shard ships k rows per page instead of offset+k."""
        out: list[dict | None] = []
        for off, ok in zip(self.offsets, flags):
            if not ok:
                out.append(None)
            elif after is None:
                out.append(kw)
            else:
                kwi = dict(kw)
                kwi["after"] = (after[0], int(after[1]) - int(off))
                out.append(kwi)
        return out

    def _merge(self, per_shard: list[list[tuple[int, float]] | None], k: int):
        merged: list[tuple[int, float]] = []
        for offset, hits in zip(self.offsets, per_shard):
            if hits:
                merged.extend((int(offset) + d, s) for d, s in hits)
        merged.sort(key=lambda ds: (-ds[1], ds[0]))
        return merged[:k]

    def topk(
        self,
        query_text: str,
        k: int,
        mode: str = "and",
        terms: list[str] | None = None,
        budget_ms: float | None = None,
        after: tuple[float, int] | None = None,
    ) -> list[tuple[int, float]]:
        """Exact BM25 top-k across all shards, global docIDs, ordered
        (score DESC, global doc_id ASC) — bit-identical to a single
        whole-corpus index. mode: 'and' (conjunctive) or 'or' (disjunctive;
        shards holding any query term contribute). `terms` bypasses query
        analysis with an already-analyzed list (the did-you-mean rewrite
        path — re-analyzing a suggested term can re-stem it differently)."""
        if terms is None:
            terms = get_analyzer(self.analyzer).analyze_query(query_text)
        if not terms or k <= 0:
            return []
        per_shard_dfs, idfs = self._global_idfs(terms)
        kw = {"terms": terms, "k": k, "idfs": idfs, "avgdl": self.avgdl}
        if budget_ms is not None:
            # per-shard wall-clock cap: shards evaluate in parallel, so
            # each leg gets the query's full budget (the coordinator's
            # merge is O(k); reference analog: per-statement timeout)
            kw["_budget_ms"] = budget_ms
        if mode == "or":
            hits = self._call_shards(
                "_topk_or",
                self._per_shard_kws(
                    kw, after, [bool(r) for r in per_shard_dfs]
                ),
            )
            return self._merge(hits, k)
        if len(idfs) != len(terms):
            return []  # conjunctive: term absent from the whole corpus
        hits = self._call_shards(
            "_topk_and",
            self._per_shard_kws(
                kw, after, [len(r) == len(terms) for r in per_shard_dfs]
            ),
        )
        return self._merge(hits, k)

    def topk_boosted(
        self,
        query_text: str,
        k: int,
        mode: str = "and",
        budget_ms: float | None = None,
        after: tuple[float, int] | None = None,
    ) -> list[tuple[int, float]]:
        """Per-term boosted BM25 across shards — Lucene `clause^boost`
        syntax (see LocalSearcher.topk_boosted). Boosts scale the GLOBAL
        idfs (df summed across shard dictionaries), then the fan-out is
        the standard stats-injection call — per-shard scores stay
        directly comparable and the merge is bit-identical to a single
        whole-corpus index's topk_boosted."""
        from discogsography_spark.analysis import parse_boosted_query

        terms, boosts = parse_boosted_query(
            query_text, get_analyzer(self.analyzer)
        )
        if not terms or k <= 0:
            return []
        per_shard_dfs, idfs = self._global_idfs(terms)
        idfs = {t: boosts[t] * v for t, v in idfs.items()}
        kw = {"terms": terms, "k": k, "idfs": idfs, "avgdl": self.avgdl}
        if budget_ms is not None:
            kw["_budget_ms"] = budget_ms
        if mode == "or":
            hits = self._call_shards(
                "_topk_or",
                self._per_shard_kws(
                    kw, after, [bool(r) for r in per_shard_dfs]
                ),
            )
            return self._merge(hits, k)
        if len(idfs) != len(terms):
            return []  # conjunctive: term absent from the whole corpus
        hits = self._call_shards(
            "_topk_and",
            self._per_shard_kws(
                kw, after, [len(r) == len(terms) for r in per_shard_dfs]
            ),
        )
        return self._merge(hits, k)

    def topk_phrase(
        self, phrase: str, k: int, budget_ms: float | None = None
    ) -> list[tuple[int, float]]:
        """Exact-phrase top-k across positional shard indexes, global
        stats + docIDs — bit-identical to a whole-corpus positional index."""
        ordered = get_analyzer(self.analyzer).tokenize_py(phrase)
        terms = sorted(set(ordered))
        if not ordered or k <= 0:
            return []
        per_shard_dfs, idfs = self._global_idfs(terms)
        if len(idfs) != len(terms):
            return []
        kw = {"phrase": phrase, "k": k, "idfs": idfs, "avgdl": self.avgdl}
        if budget_ms is not None:
            kw["_budget_ms"] = budget_ms
        hits = self._call_shards(
            "topk_phrase",
            [kw if len(r) == len(terms) else None for r in per_shard_dfs],
        )
        return self._merge(hits, k)

    def topk_prefix(
        self, query_text: str, k: int, max_expansions: int = 64
    ) -> list[tuple[int, float]]:
        """Autocomplete prefix top-k across shards. The GLOBAL expansion is
        the term-ASC-capped union of per-shard expansions (any term inside
        the global first-max_expansions is within its own shard's
        first-max_expansions, so per-shard caps lose nothing); per-term df
        sums across shards; every shard then evaluates the SAME expansion
        with the global constants."""
        from discogsography_spark.analysis import analyze_query

        prefixes = analyze_query(query_text)
        if not prefixes or k <= 0:
            return []
        # ONE batched expansion round for every prefix (not one per prefix)
        per_shard = self._call_shards(
            "expand_prefixes",
            [{"prefixes": sorted(set(prefixes)), "max_expansions": max_expansions}]
            * len(self.shards),
        )
        exp: dict[str, list[str]] = {}
        for pre in prefixes:
            union: set[str] = set()
            for maps in per_shard:
                union.update((maps or {}).get(pre, []))
            exp[pre] = sorted(union)[:max_expansions]
            if not exp[pre]:
                return []
        union_terms = sorted({t for ts in exp.values() for t in ts})
        _, idfs = self._global_idfs(union_terms)
        kw = {
            "prefixes": prefixes,
            "k": k,
            "max_expansions": max_expansions,
            "exp": exp,
            "idfs": idfs,
            "avgdl": self.avgdl,
        }
        hits = self._call_shards(
            "_topk_prefix_uncached", [kw] * len(self.shards)
        )
        return self._merge(hits, k)

    def topk_wildcard(
        self,
        query_text: str,
        k: int,
        max_expansions: int = 64,
        budget_ms: float | None = None,
    ) -> list[tuple[int, float]]:
        """Wildcard term-match top-k across shards — topk_prefix's shape
        with expand_wildcards as the expansion RPC. The same cap argument
        holds: per-shard expansions are term-ASC capped, so any term inside
        the GLOBAL first-max_expansions is within its own shard's
        first-max_expansions; per-term df sums across shards; every shard
        evaluates the SAME expansion with the global constants."""
        from discogsography_spark.analysis import parse_wildcard_query

        patterns = parse_wildcard_query(query_text)
        if not patterns or k <= 0:
            return []
        per_shard = self._call_shards(
            "expand_wildcards",
            [{"patterns": patterns, "max_expansions": max_expansions}]
            * len(self.shards),
        )
        exp: dict[str, list[str]] = {}
        for pat in patterns:
            union: set[str] = set()
            for maps in per_shard:
                union.update((maps or {}).get(pat, []))
            exp[pat] = sorted(union)[:max_expansions]
            if not exp[pat]:
                return []
        union_terms = sorted({t for ts in exp.values() for t in ts})
        _, idfs = self._global_idfs(union_terms)
        kw = {
            "prefixes": patterns,
            "k": k,
            "max_expansions": max_expansions,
            "exp": exp,
            "idfs": idfs,
            "avgdl": self.avgdl,
        }
        if budget_ms is not None:
            kw["_budget_ms"] = budget_ms
        hits = self._call_shards(
            "_topk_prefix_uncached", [kw] * len(self.shards)
        )
        return self._merge(hits, k)

    def global_prefix_expansions(self, ast) -> dict[str, list[str]] | None:
        """GLOBAL prefix expansion map for a boolean AST: per prefix node,
        the term-ASC-capped union of per-shard expansions (every term inside
        the global first-64 is within its own shard's first-64 — the
        topk_prefix argument). None when the AST has no prefix nodes. The
        SAME map must be injected into every shard-local evaluation (ranking
        AND matched-set counting) so all of them see one rewrite."""
        from discogsography_spark.query.boolquery import (
            expand_prefix_nodes,
            has_prefix_nodes,
        )

        if ast is None or not has_prefix_nodes(ast):
            return None
        # collect every expansion-leaf string (prefix AND wild — disjoint
        # key spaces) first, then ONE batched fan-out round
        wanted: list[str] = []
        expand_prefix_nodes(ast, lambda p: (wanted.append(p), [])[1])
        prefixes = sorted(set(wanted))
        per_shard = self._call_shards(
            "expand_patterns",
            [{"strings": prefixes, "max_expansions": 64}] * len(self.shards),
        )
        expansions: dict[str, list[str]] = {}
        for p in prefixes:
            union: set[str] = set()
            for maps in per_shard:
                union.update((maps or {}).get(p, []))
            expansions[p] = sorted(union)[:64]
        return expansions

    def topk_bool(
        self,
        query_text: str,
        k: int,
        expansions: dict[str, list[str]] | None = None,
        ast_override=None,
        budget_ms: float | None = None,
        after: tuple[float, int] | None = None,
    ) -> list[tuple[int, float]]:
        """Boolean AND/OR/NOT top-k across shards. Doc-disjoint sharding
        makes the predicate exactly shard-local (every term occurrence of a
        doc lives in its own shard), so each shard runs the full set algebra
        on its own postings with the GLOBAL idf/avgdl injected, and the
        merge is the usual exact concatenate-sort-cut. `expansions` supplies
        a precomputed global prefix-expansion map (ShardedSearchService
        computes it once and shares it between ranking and facet counting)."""
        from discogsography_spark.query.boolquery import (
            all_terms,
            expand_prefix_nodes,
            parse_bool_query,
        )

        if ast_override is not None:
            ast = ast_override
        else:
            an = get_analyzer(self.analyzer)
            ast = parse_bool_query(
                query_text, an.analyze_query, tokenize=an.tokenize_py
            )
        if ast is None or k <= 0:
            return []
        if expansions is None:
            expansions = self.global_prefix_expansions(ast)
        if expansions is not None:
            expanded = expand_prefix_nodes(
                ast, lambda p: expansions.get(p, [])
            )
            if expanded is None:
                return []
            terms = all_terms(expanded)
        else:
            terms = all_terms(ast)
        _, idfs = self._global_idfs(terms)
        kw = {
            "query_text": query_text,
            "k": k,
            "idfs": idfs,
            "avgdl": self.avgdl,
            "prefix_expansions": expansions,
            # ship the parsed AST so workers skip re-parsing and fuzzy
            # rewrites evaluate identically on every shard (plain tuples —
            # picklable)
            "ast_override": ast,
        }
        if budget_ms is not None:
            kw["_budget_ms"] = budget_ms
        hits = self._call_shards(
            "topk_bool",
            self._per_shard_kws(kw, after, [True] * len(self.shards)),
        )
        return self._merge(hits, k)

    def topk_within(
        self,
        word1: str,
        word2: str,
        window: int,
        k: int,
        budget_ms: float | None = None,
    ) -> list[tuple[int, float]]:
        """Proximity top-k (`a <N> b`, either order) across positional
        shards. A doc's positions live entirely in its own shard, so the
        within-window predicate is exactly shard-local; scores use the
        injected GLOBAL idf/avgdl — the same recipe as sharded phrase.
        Bit-identical to a whole-corpus positional index (tested)."""
        an = get_analyzer(self.analyzer)
        ts1 = an.analyze_query(word1)
        ts2 = an.analyze_query(word2)
        if not ts1 or not ts2 or k <= 0:
            return []
        terms = sorted({ts1[0], ts2[0]})
        per_shard_dfs, idfs = self._global_idfs(terms)
        if len(idfs) != len(terms):
            return []  # conjunctive: a term absent from the whole corpus
        kw = {
            "word1": word1,
            "word2": word2,
            "window": window,
            "k": k,
            "idfs": idfs,
            "avgdl": self.avgdl,
        }
        if budget_ms is not None:
            kw["_budget_ms"] = budget_ms
        hits = self._call_shards(
            "topk_within",
            [kw if len(r) == len(terms) else None for r in per_shard_dfs],
        )
        return self._merge(hits, k)

    def topk_synonym(
        self,
        query_text: str,
        k: int,
        synonyms: dict[str, list[str]],
        budget_ms: float | None = None,
        after: tuple[float, int] | None = None,
        restricts: list[np.ndarray | None] | None = None,
    ) -> list[tuple[int, float]]:
        """Synonym-aware conjunctive BM25 across shards (SynonymQuery
        semantics; see LocalSearcher.topk_synonym). Group statistics are
        GLOBAL: member dfs summed across shard dictionaries, group
        docFreq = max over global member dfs, idf/avgdl injected into each
        shard's _topk_synonym_groups — bit-identical to a whole-corpus
        index. Shards missing any group entirely are skipped (no doc there
        can satisfy the conjunction)."""
        if k <= 0:
            return []
        an = get_analyzer(self.analyzer)
        base = an.analyze_query(query_text)
        seen: set[str] = set()
        qterms = [t for t in base if not (t in seen or seen.add(t))]
        if not qterms:
            return []
        groups: list[tuple[str, list[str]]] = []
        for t in qterms:
            mem = {t}
            for s in synonyms.get(t, ()):
                mem.update(an.analyze_query(s))
            groups.append((t, sorted(mem)))
        groups.sort(key=lambda g: g[0])
        members = sorted({x for _, ms in groups for x in ms})
        per_shard_dfs, _ = self._global_idfs(members)
        gdf = {
            t: sum(r[t] for r in per_shard_dfs if t in r) for t in members
        }
        idfs: dict[str, float] = {}
        for leader, ms in groups:
            df = max(gdf[x] for x in ms)
            if df <= 0:
                return []  # a whole group absent from the corpus
            idfs[leader] = self.params.idf(self.n_docs, df)
        kw = {
            "groups": groups,
            "k": k,
            "idfs": idfs,
            "avgdl": self.avgdl,
        }
        if budget_ms is not None:
            kw["_budget_ms"] = budget_ms
        # a shard participates only if EVERY group has ≥1 member there
        flags = [
            all(any(r.get(x, 0) > 0 for x in ms) for _, ms in groups)
            for r in per_shard_dfs
        ]
        kws = self._per_shard_kws(kw, after, flags)
        if restricts is not None:
            # drill-down: each shard ranks only its LOCAL filtered matched
            # set (scores unchanged — they depend only on group tf/dl and
            # the injected global stats)
            kws = [
                (None if kwi is None else {**kwi, "restrict": r})
                for kwi, r in zip(kws, restricts)
            ]
        hits = self._call_shards("_topk_synonym_groups", kws)
        return self._merge(hits, k)

    def suggest_terms(
        self, word: str, k: int = 10, min_sim: float = 0.3
    ) -> list[tuple[str, float]]:
        """Fuzzy vocabulary suggestions across shards. Trigram similarity is
        a function of the term string alone, and every shard vocabulary is a
        subset of the global one — so a term in the GLOBAL top-k ranks
        within top-k of any shard containing it, and the union of per-shard
        top-k lists provably contains the global top-k. Merge = dedupe,
        re-sort, cut."""
        per_shard = self._call_shards(
            "suggest_terms",
            [{"word": word, "k": k, "min_sim": min_sim}] * len(self.shards),
        )
        seen: dict[str, float] = {}
        for hits in per_shard:
            for term, sim in hits or []:
                seen[term] = sim
        out = sorted(seen.items(), key=lambda ts: (-ts[1], ts[0]))
        return out[:k]
