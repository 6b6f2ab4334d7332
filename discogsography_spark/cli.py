"""Command-line frontend — the engine's analog of the reference's rule that
one query layer serves every frontend (HTTP API, MCP server, NLQ all dispatch
to the same query functions, SURVEY.md §3.3). This CLI, the pytest suite,
and bench.py all consume the same library surface.

    python -m discogsography_spark.cli build  <transcripts.parquet> <index_dir> [--segments N]
    python -m discogsography_spark.cli query  <index_dir> "<query text or term^boost clauses>" [--k K] [--mode and|or|prefix|wildcard|phrase|bool|suggest|near|mlt] [--syn TERM=ALT1,ALT2] [--show-text <transcripts>]
    python -m discogsography_spark.cli request <index_dir> '<json body>' [--shards|--merged] [--facets role,tool]
    python -m discogsography_spark.cli stats  <index_dir>
    python -m discogsography_spark.cli compact <index_dir>
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="discogsography_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build the inverted index")
    b.add_argument("transcripts")
    b.add_argument("index_dir")
    b.add_argument("--segments", type=int, default=16)
    b.add_argument("--format", default="parquet")
    b.add_argument(
        "--analyzer", choices=("simple", "english"), default="simple",
        help="english = snowball stopwords + Porter stemming (recorded in the manifest)",
    )
    b.add_argument(
        "--positions", action="store_true",
        help="store token positions (enables --mode phrase queries)",
    )

    q = sub.add_parser("query", help="BM25 top-k query (serving path, no Spark)")
    q.add_argument("index_dir")
    q.add_argument("query_text")
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--window", type=int, default=3, help="proximity window for --mode near")
    q.add_argument("--fuzzy", action="store_true", help="did-you-mean rewrite of vocabulary-absent terms (and/or/bool modes)")
    q.add_argument("--mode", choices=("and", "or", "prefix", "wildcard", "phrase", "bool", "suggest", "near", "mlt"), default="and")
    q.add_argument(
        "--syn", action="append", default=[], metavar="TERM=ALT1,ALT2",
        help="synonym group (repeatable); routes the query through "
        "topk_synonym (SynonymQuery semantics: df=max, tf=sum)",
    )
    q.add_argument("--show-text", metavar="TRANSCRIPTS", default=None)

    sr = sub.add_parser(
        "search",
        help="full search response (results + facets + headlines), the "
        "/api/search analog over SearchService",
    )
    sr.add_argument("index_dir")
    sr.add_argument("query_text")
    sr.add_argument("--k", type=int, default=10)
    sr.add_argument("--mode", choices=("and", "or", "bool"), default="and")
    sr.add_argument(
        "--facets", default=None,
        help="comma-separated docmap columns to facet on (e.g. role,tool)",
    )
    sr.add_argument(
        "--filter", default=None, metavar="FIELD=VALUE",
        help="faceted drill-down: --filter role=assistant, or a numeric range --filter turn_idx=2..8 (open bounds: =..8 / =2..)",
    )
    sr.add_argument("--fuzzy", action="store_true")
    sr.add_argument(
        "--offset", type=int, default=0,
        help="result pagination: skip the first N ranked hits "
        "(LIMIT k OFFSET n semantics)",
    )
    sr.add_argument(
        "--after", default=None, metavar="SCORE,DOC_ID",
        help="search_after cursor pagination: return the top-k strictly "
        "after this (score, doc_id) position — O(k) per page at any "
        "depth (use the response's next_after verbatim); mutually "
        "exclusive with --offset",
    )
    sr.add_argument("--highlight", action="store_true")
    sr.add_argument(
        "--fragments", type=int, default=None, metavar="N",
        help="snippet headlines: up to N windowed fragments (implies --highlight)",
    )
    sr.add_argument(
        "--fragment-mode", choices=("term", "cover"), default="term",
        help="fragment selection: per-term windows, or PostgreSQL "
        "cover-density (tightest windows containing ALL present terms)",
    )
    sr.add_argument(
        "--shards", action="store_true",
        help="treat index_dir as a comma-separated list of shard dirs "
        "(ShardedSearchService fan-out)",
    )
    sr.add_argument(
        "--merged", action="store_true",
        help="serve the LIVE base+delta view (MergedSearchService)",
    )
    sr.add_argument(
        "--context", type=int, default=None, metavar="W",
        help="attach conversation context to each hit: every alive turn "
        "of the hit's conversation within W turn indexes",
    )
    sr.add_argument(
        "--facet-tree", default=None, metavar="PARENT,CHILD",
        help="hierarchical facet tree over the matched set: nested "
        "parent→child co-occurrence counts (the reference's genre→style "
        "tree), e.g. --facet-tree role,tool",
    )
    sr.add_argument(
        "--stats", default=None, metavar="FIELD1,FIELD2",
        help="metric stats aggregation over the matched set "
        "(count/min/max/sum/avg of each numeric docmap field)",
    )
    sr.add_argument(
        "--significant", action="store_true",
        help="also return significant terms (JLH) for the matched set",
    )
    sr.add_argument(
        "--syn", action="append", default=[], metavar="TERM=ALT1,ALT2",
        help="synonym group (repeatable); full synonym-aware response",
    )
    sr.add_argument(
        "--grouped", default=None, metavar="FIELD",
        help="grouped relevance: rank FIELD groups by sum/avg/max of "
        "matched members' scores (vs --collapse's best-representative)",
    )
    sr.add_argument(
        "--collapse", default=None, metavar="FIELD",
        help="field-collapsed results: best hit per FIELD value (e.g. "
        "--collapse conv_id returns top-k CONVERSATIONS, each "
        "represented by its best-scoring turn, with the group's total "
        "matched count)",
    )

    rq = sub.add_parser(
        "request",
        help="ES-style JSON request body (query/dsl.py): hits + "
        "aggregations in one deterministic round trip",
    )
    rq.add_argument("index_dir")
    rq.add_argument(
        "body",
        help="JSON request body, or @path/to/body.json",
    )
    rq.add_argument("--shards", action="store_true",
                    help="index_dir is a comma-separated shard list")
    rq.add_argument("--merged", action="store_true",
                    help="serve the LIVE base+delta view")
    rq.add_argument(
        "--facets", default=None,
        help="comma-separated docmap columns to register as facet fields",
    )

    s = sub.add_parser("stats", help="print index manifest stats")
    s.add_argument("index_dir")

    fk = sub.add_parser(
        "fsck", help="validate every stored index invariant (and deltas)"
    )
    fk.add_argument("index_dir")
    fk.add_argument("--no-deltas", action="store_true",
                    help="check only the base index")
    fk.add_argument("--sample", type=int, default=1,
                    help="check every Nth term row (10^12-scale spot mode)")

    c = sub.add_parser("compact", help="fold streaming deltas into the base index")
    c.add_argument("index_dir")

    cd = sub.add_parser(
        "consolidate",
        help="MINOR compaction: fold the delta tail into ONE delta "
        "(base untouched, docIDs unchanged — the LSM L0->L1 merge; "
        "bounds the per-query tail cost between full compacts)",
    )
    cd.add_argument("index_dir")

    u = sub.add_parser(
        "upsert",
        help="ingest a batch as a delta, replacing prior versions of its "
        "(conv_id, turn_idx) keys (tombstones; latest write wins)",
    )
    u.add_argument("index_dir")
    u.add_argument("batch", help="transcript rows (same formats as build)")
    u.add_argument("--batch-id", type=int, required=True)
    u.add_argument("--format", default="parquet")

    dl = sub.add_parser(
        "delete",
        help="delete documents by key — keys parquet with (conv_id, "
        "turn_idx), or conv_id only for whole conversations",
    )
    dl.add_argument("index_dir")
    dl.add_argument("keys", help="parquet of keys to delete")
    dl.add_argument("--batch-id", type=int, required=True)

    args = ap.parse_args(argv)

    if args.cmd == "build":
        from discogsography_spark.index.builder import IndexBuilder
        from discogsography_spark.session import get_spark
        from discogsography_spark.sources import load_transcripts

        spark = get_spark("cli-build")
        df = load_transcripts(spark, args.transcripts, format=args.format)
        res = IndexBuilder(
            args.index_dir,
            num_segments=args.segments,
            analyzer=args.analyzer,
            with_positions=args.positions,
        ).build(df)
        print(
            json.dumps(
                {
                    "n_docs": res.n_docs,
                    "total_tokens": res.total_tokens,
                    "resumed": res.resumed,
                    "segments_built": res.segments_built,
                    "timings": res.timings,
                }
            )
        )
        return 0

    if args.cmd == "query":
        from discogsography_spark.query.engine import LocalSearcher

        searcher = LocalSearcher(args.index_dir)
        if args.syn and args.mode == "and":
            syn: dict[str, list[str]] = {}
            for spec in args.syn:
                term, _, alts = spec.partition("=")
                if not alts:
                    raise SystemExit("--syn expects TERM=ALT1,ALT2")
                syn[term] = [a for a in alts.split(",") if a]
            hits = searcher.topk_synonym(args.query_text, args.k, syn)
        elif args.mode == "prefix":
            hits = searcher.topk_prefix(args.query_text, args.k)
        elif args.mode == "wildcard":
            hits = searcher.topk_wildcard(args.query_text, args.k)
        elif args.mode == "phrase":
            hits = searcher.topk_phrase(args.query_text, args.k)
        elif args.mode == "bool":
            if args.fuzzy:
                hits, rewrites = searcher.topk_fuzzy(
                    args.query_text, args.k, mode="bool"
                )
                for orig, repl in rewrites.items():
                    print(f"# did you mean: {orig} -> {repl}")
            else:
                hits = searcher.topk_bool(args.query_text, args.k)
        elif args.mode == "near":
            w = args.query_text.split()
            if len(w) != 2:
                raise SystemExit("--mode near expects exactly two words")
            hits = searcher.topk_within(w[0], w[1], args.window, args.k)
        elif args.mode == "suggest":
            for term, sim in searcher.suggest_terms(args.query_text, k=args.k):
                print(f"{sim:8.4f}  {term}")
            return
        elif args.mode == "mlt":
            # more-like-this: query_text is the source docID
            from discogsography_spark.query.serving import SearchService

            try:
                src = int(args.query_text)
            except ValueError:
                raise SystemExit("--mode mlt expects a source docID")
            hits = SearchService(args.index_dir).more_like_this(src, args.k)
        elif args.fuzzy:
            hits, rewrites = searcher.topk_fuzzy(
                args.query_text, args.k, mode=args.mode
            )
            for orig, repl in rewrites.items():
                print(f"# did you mean: {orig} -> {repl}")
        elif "^" in args.query_text:
            # Lucene clause^boost syntax routes to the boosted evaluator
            hits = searcher.topk_boosted(
                args.query_text, args.k, mode=args.mode
            )
        else:
            hits = searcher.topk(args.query_text, args.k, mode=args.mode)
        texts = {}
        if args.show_text and hits:
            import pandas as pd
            import pyarrow.dataset as pads

            import os

            docs = (
                pads.dataset(os.path.join(args.index_dir, "docs"))
                .to_table(columns=["doc_id", "conv_id", "turn_idx"])
                .to_pandas()
            )
            docmap = docs.set_index("doc_id")
            src = pd.read_parquet(args.show_text, columns=["conv_id", "turn_idx", "text"])
            src = src.set_index(["conv_id", "turn_idx"])
            for d, _ in hits:
                row = docmap.loc[d]
                texts[d] = str(src.loc[(row["conv_id"], int(row["turn_idx"]))]["text"])[:160]
        for rank, (doc_id, score) in enumerate(hits, 1):
            line = {"rank": rank, "doc_id": doc_id, "score": round(score, 6)}
            if doc_id in texts:
                line["text"] = texts[doc_id]
            print(json.dumps(line))
        if not hits:
            print(json.dumps({"matches": 0}))
        return 0

    if args.cmd == "search":
        facet_defs = (
            {f: f for f in args.facets.split(",")} if args.facets else None
        )
        filt = None
        if args.filter:
            if "=" not in args.filter:
                raise SystemExit("--filter expects FIELD=VALUE or FIELD=LO..HI")
            fk, fv = args.filter.split("=", 1)
            if ".." in fv:  # numeric range drill-down (either bound empty)
                lo_s, hi_s = fv.split("..", 1)
                filt = {fk: (float(lo_s) if lo_s else None,
                             float(hi_s) if hi_s else None)}
            else:
                filt = {fk: fv}
        search_after = None
        if args.after:
            if "," not in args.after:
                raise SystemExit("--after expects SCORE,DOC_ID")
            a_s, a_d = args.after.split(",", 1)
            search_after = (float(a_s), int(a_d))
        synonyms = None
        if args.syn:
            synonyms = {}
            for spec in args.syn:
                term, _, alts = spec.partition("=")
                if not alts:
                    raise SystemExit("--syn expects TERM=ALT1,ALT2")
                synonyms[term] = [a for a in alts.split(",") if a]
        kwargs = dict(
            mode=args.mode,
            facets=sorted(facet_defs) if facet_defs else None,
            highlight=args.highlight,
            filter=filt,
            highlight_fragments=args.fragments,
            fragment_mode=args.fragment_mode,
            offset=args.offset,
            search_after=search_after,
            synonyms=synonyms,
            stats_fields=args.stats.split(",") if args.stats else None,
        )
        if args.merged:
            from discogsography_spark.query.serving import MergedSearchService

            svc = MergedSearchService(args.index_dir, facet_defs=facet_defs)
        elif args.shards:
            from discogsography_spark.query.serving import ShardedSearchService

            svc = ShardedSearchService(
                args.index_dir.split(","), facet_defs=facet_defs
            )
        else:
            from discogsography_spark.query.serving import SearchService

            svc = SearchService(args.index_dir, facet_defs=facet_defs)
        if args.facet_tree:
            if "," not in args.facet_tree:
                raise SystemExit("--facet-tree expects PARENT,CHILD")
            parent, child = args.facet_tree.split(",", 1)
            if hasattr(svc, "facet_tree_pairs"):  # single / merged service
                matched = svc.matched_docs(args.query_text, mode=args.mode)
                tree = svc.facet_tree(matched, parent, child)
            else:  # sharded coordinator sums per-shard pair vectors
                tree = svc.facet_tree(
                    args.query_text, parent, child, mode=args.mode
                )
            print(json.dumps({"facet_tree": [
                {
                    "name": node["name"],
                    "count": node["count"],
                    "children": [
                        {"name": c, "count": n} for c, n in node["children"]
                    ],
                }
                for node in tree
            ]}, indent=2))
            if hasattr(svc, "close"):
                svc.close()
            return 0
        if args.grouped:
            rows = svc.grouped_topk(
                args.query_text, args.grouped, args.k, mode=args.mode
            )
            print(json.dumps({"grouped": args.grouped, "groups": [
                {
                    "group": g, "sum_score": round(s, 6),
                    "avg_score": round(a, 6), "max_score": round(x, 6),
                    "n_matched": n,
                }
                for g, s, a, x, n in rows
            ]}, indent=2))
            if hasattr(svc, "close"):
                svc.close()
            return 0
        if args.collapse:
            rows = svc.collapse(
                args.query_text, args.collapse, args.k, mode=args.mode
            )
            print(
                json.dumps(
                    {
                        "collapse": args.collapse,
                        "groups": [
                            {
                                "group": g,
                                "doc_id": d,
                                "score": round(s, 6),
                                "group_matched": c,
                            }
                            for g, d, s, c in rows
                        ],
                    },
                    indent=2,
                )
            )
            if hasattr(svc, "close"):
                svc.close()
            return 0
        resp = svc.search(args.query_text, args.k, fuzzy=args.fuzzy, **kwargs)
        payload = {
            "results": [
                {"doc_id": d, "score": round(x, 6)}
                for d, x in resp.results
            ],
            "total_matched": resp.total_matched,
            "facets": resp.facets,
            "rewrites": resp.rewrites,
            "headlines": {str(d): h for d, h in resp.headlines.items()},
            "next_after": (
                [resp.next_after[0], resp.next_after[1]]
                if resp.next_after is not None
                else None
            ),
        }
        if resp.stats:
            payload["stats"] = resp.stats
        if args.significant:
            payload["significant_terms"] = [
                {"term": t, "fg": fg, "bg": bg, "score": round(s, 6)}
                for t, fg, bg, s in svc.significant_terms(
                    args.query_text, k=10, mode=args.mode
                )
            ]
        if args.context is not None:
            payload["context"] = {
                str(d): [
                    {"doc_id": cd, "conv_id": cc, "turn_idx": ct}
                    for cd, cc, ct in svc.context(d, args.context)
                ]
                for d, _ in resp.results
            }
        print(json.dumps(payload, indent=2))
        return 0

    if args.cmd == "request":
        from discogsography_spark.query.dsl import run_request

        raw = args.body
        if raw.startswith("@"):
            with open(raw[1:]) as f:
                raw = f.read()
        body = json.loads(raw)
        facet_defs = (
            {f: f for f in args.facets.split(",")} if args.facets else None
        )
        if args.merged:
            from discogsography_spark.query.serving import MergedSearchService

            svc = MergedSearchService(args.index_dir, facet_defs=facet_defs)
        elif args.shards:
            from discogsography_spark.query.serving import ShardedSearchService

            svc = ShardedSearchService(
                args.index_dir.split(","), facet_defs=facet_defs
            )
        else:
            from discogsography_spark.query.serving import SearchService

            svc = SearchService(args.index_dir, facet_defs=facet_defs)
        try:
            print(json.dumps(run_request(svc, body), indent=2))
        finally:
            if hasattr(svc, "close"):
                svc.close()
        return 0

    if args.cmd == "stats":
        from discogsography_spark.index.manifest import Manifest

        man = Manifest(args.index_dir)
        out = {"docs": man.docs(), "complete": man.is_complete(), "segments": {}}
        for seg in sorted(man.committed_segments()):
            out["segments"][seg] = man.segment(seg)
        print(json.dumps(out, indent=2))
        return 0

    if args.cmd == "fsck":
        from discogsography_spark.index.fsck import fsck_index

        report = fsck_index(args.index_dir, check_deltas=not args.no_deltas,
                            sample=args.sample)
        print(json.dumps(report, indent=2))
        return 0 if not report["errors"] else 1

    if args.cmd == "compact":
        from discogsography_spark.session import get_spark
        from discogsography_spark.streaming.incremental import compact

        spark = get_spark("cli-compact")
        n = compact(spark, args.index_dir)
        print(json.dumps({"deltas_folded": n}))
        return 0

    if args.cmd == "consolidate":
        from discogsography_spark.session import get_spark
        from discogsography_spark.streaming.incremental import (
            consolidate_deltas,
        )

        spark = get_spark("cli-consolidate")
        n = consolidate_deltas(spark, args.index_dir)
        print(json.dumps({"deltas_consolidated": n}))
        return 0

    if args.cmd == "upsert":
        from discogsography_spark.session import get_spark
        from discogsography_spark.sources import load_transcripts
        from discogsography_spark.streaming.incremental import DeltaIndexWriter

        spark = get_spark("cli-upsert")
        w = DeltaIndexWriter(args.index_dir)
        # the SAME schema contract as build: a raw spark.read would infer
        # ts as TIMESTAMP_NTZ from pandas-written parquet while the base
        # docmap stores TIMESTAMP, and compact()'s docmap union would fail
        w.write_batch(
            load_transcripts(spark, args.batch, format=args.format),
            args.batch_id,
            upsert=True,
        )
        with open(
            f"{w._delta_dir(args.batch_id)}/stats.json"
        ) as f:
            print(json.dumps(json.load(f)))
        return 0

    if args.cmd == "delete":
        from discogsography_spark.session import get_spark
        from discogsography_spark.streaming.incremental import DeltaIndexWriter

        spark = get_spark("cli-delete")
        w = DeltaIndexWriter(args.index_dir)
        n = w.write_deletes(spark.read.parquet(args.keys), args.batch_id)
        print(json.dumps({"n_tombstoned": n}))
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
