"""Fully-declarative BM25 over an arbitrary documents DataFrame — no
prebuilt index, single logical plan, SQL-mirrorable (the DuckDB oracle in
__spark_entry__ runs the byte-for-byte analogous query).

This is the "one query layer serves all frontends" restatement (SURVEY.md
§3.3): the segment-index engine (query/engine.py) and this ad-hoc pipeline
share the analyzer, the BM25 formula, the conjunctive-AND semantics
(/root/reference/api/queries/search_queries.py:228), and the deterministic
(score DESC, id ASC) tiebreak.

Scale notes: the whole plan is native expressions (tokenize via
regexp_extract_all inside codegen); corpus stats are two scalar aggregates
broadcast as a 1-row cross join; the conjunctive filter prunes candidates
BEFORE scoring (filter-before-rank-cap, the semantic contract of
/root/reference/api/queries/search_queries.py:119-139); top-k is Spark's
TakeOrderedAndProject (per-partition heaps + merge).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from discogsography_spark.analysis import (
    analyze_query,
    parse_boosted_query,
    tokenize_py,
)
from discogsography_spark.operators.textstats import tokens_col
from discogsography_spark.params import BM25Params


# ---------------------------------------------------------------------------
# Shared two-pass skeleton (round-7 optimization; spark_optimization_guide
# §2.3/§2.4 "shuffle fewer bytes / remove shuffles outright"):
#
# Pass 1 — ONE corpus scan feeding ONE map-side-combined scalar aggregate
# (n_docs, total_tokens, per-term df), collected to the driver as bounded
# planning state (exactly the contract of the index path's term_dfs and the
# engine's cap-64 vocabulary expansions: O(#query terms) scalars, never
# corpus rows).
#
# Pass 2 — ONE corpus scan that filters candidates with native
# array_contains predicates and computes every per-term tf map-side
# (size(filter(toks, = term))), scoring with the df/avgdl values folded in
# as literals; global top-k is TakeOrderedAndProject.
#
# This replaces the previous shape — explode → filter → groupBy(_id, term)
# shuffle, a second groupBy(term) shuffle for df, a separate stats scan,
# two broadcast exchanges and a final groupBy(_id) shuffle — with ZERO
# data-proportional shuffles: the only exchange left is the 1-row scalar
# aggregate. At 10^12 docs the explode shuffle moved one row per matching
# token occurrence; the new plan moves #terms + 2 numbers.
#
# Float parity with the previous plan (and the DuckDB oracle) is exact:
# the literal idf/avgdl expressions replicate the former column expression
# trees operation-for-operation (long→double casts, +0.5 promotions,
# Math.log via Catalyst constant folding), per-term partials are summed in
# term-ASC order starting from 0.0 (the former array_sort fold), and an
# absent term's partial is exactly 0.0, which is an exact no-op in IEEE
# addition of non-negative partials.
# ---------------------------------------------------------------------------


def _corpus_term_stats(
    docs: DataFrame, terms: list[str], text_col: str = "text"
) -> tuple[int, int, dict[str, int]]:
    """One-scan corpus statistics: (n_docs, total_tokens, {term: df}).

    df(term) = number of docs whose analyzed token array contains the term —
    identical to the former tf-table groupBy(term).count(). The aggregate is
    map-side combined; a single 1-row exchange reaches the driver.

    Wide-vocabulary callers (MLT over a long source document) would build
    one aggregate column per term; past 256 terms that expression list
    strains codegen, so the per-term dfs fall back to the bounded
    explode→isin→groupBy aggregation (identical values, one map-side-
    combined shuffle of #terms rows)."""
    toks = docs.select(tokens_col(text_col).alias("_toks"))
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum(F.size("_toks")), F.lit(0)).alias("total_tokens"),
    ]
    if len(terms) <= 256:
        for i, t in enumerate(terms):
            aggs.append(
                F.count(
                    F.when(F.array_contains("_toks", t), F.lit(1))
                ).alias(f"_df{i}")
            )
        row = toks.agg(*aggs).collect()[0]
        return (
            int(row["n_docs"]),
            int(row["total_tokens"]),
            {t: int(row[f"_df{i}"]) for i, t in enumerate(terms)},
        )
    row = toks.agg(*aggs).collect()[0]
    dfs = dict.fromkeys(terms, 0)
    for r in (
        toks.select(
            F.explode(F.array_distinct("_toks")).alias("term")
        )
        .filter(F.col("term").isin(list(terms)))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"))
        .collect()
    ):
        dfs[r["term"]] = int(r["df"])
    return int(row["n_docs"]), int(row["total_tokens"]), dfs


def _tf_expr(term: str):
    """Per-doc term frequency over the pre-projected `_toks` array — the
    map-side replacement for the explode→groupBy(_id, term) shuffle."""
    return F.size(F.filter("_toks", lambda x: x == F.lit(term))).cast("double")


def _idf_expr(df: int, n_docs: int):
    """Literal-folded BM25 idf, replicating the former column expression
    (long arithmetic then +0.5 double promotion, Math.log via constant
    folding) so the value is bit-identical to the joined-plan one."""
    return F.log(
        F.lit(1.0)
        + (F.lit(n_docs) - F.lit(df) + F.lit(0.5)) / (F.lit(df) + F.lit(0.5))
    )


def _partial_expr(
    term: str, df: int, n_docs: int, total_tokens: int, p: BM25Params,
    boost: float | None = None,
):
    """idf(term) * tfnorm(term) for one doc row (`_toks`, `_dl` projected) —
    the exact expression tree of the former joined plan with stats inlined."""
    idf = _idf_expr(df, n_docs)
    if boost is not None:
        idf = F.lit(float(boost)) * idf
    tf = _tf_expr(term)
    return idf * (
        tf
        / (
            tf
            + F.lit(p.k1)
            * (
                F.lit(1.0 - p.b)
                + F.lit(p.b)
                * (
                    F.col("_dl").cast("double")
                    / (F.lit(total_tokens) / F.lit(n_docs))
                )
            )
        )
    )


def _score_sum(
    terms: list[str], dfs: dict[str, int], n_docs: int, total_tokens: int,
    p: BM25Params, boosts: dict[str, float] | None = None,
):
    """Sum of per-term partials in term-ASC order from 0.0 — the former
    array_sort(collect_list(struct(term, partial))) left fold, with absent
    terms contributing an exact 0.0 (an IEEE no-op over non-negative
    partials)."""
    raw = F.lit(0.0)
    for t in sorted(set(terms)):
        raw = raw + _partial_expr(
            t, dfs[t], n_docs, total_tokens, p,
            boost=None if boosts is None else boosts[t],
        )
    return raw


def _project_toks(
    docs: DataFrame, id_col: str, text_col: str, extra_cols: list[str] | None = None
) -> DataFrame:
    """(_id, [extras], _toks, _dl) projection — tokenize evaluated once per
    row; everything downstream references the attribute."""
    cols = [F.col(id_col).alias("_id")] + [
        F.col(c) for c in (extra_cols or [])
    ] + [tokens_col(text_col).alias("_toks")]
    return docs.select(*cols).withColumn("_dl", F.size("_toks"))


def bm25_batch_dataframe(
    docs: DataFrame,
    queries: list[tuple[str, str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    params: BM25Params | None = None,
    round_dp: int = 5,
) -> DataFrame:
    """Score MANY conjunctive BM25 queries in ONE plan: (query_id, doc_id,
    score, rank). The reference runs its search fan-out as concurrent
    single-query SQL (search_queries.py:410-416); batched scoring shares the
    corpus scan, the tf build, and the stats pass across every query — the
    shape that matters when replaying a large query log at 100 TB.

    Per-query top-k = rank-cap window (row_number over score DESC, doc ASC),
    the per-table LIMIT discipline of search_queries.py:130-134.
    """
    from pyspark.sql import Window as W

    p = params or BM25Params()
    spark = docs.sparkSession
    qterms = [
        (qid, t) for qid, qtext in queries for t in analyze_query(qtext)
    ]
    if not qterms:
        return spark.createDataFrame(
            [], f"query_id string, {id_col} long, score double, rank int"
        )
    qdf = spark.createDataFrame(qterms, "query_id string, term string")
    nq = qdf.groupBy("query_id").agg(F.count("*").alias("n_query_terms"))
    all_terms = sorted({t for _, t in qterms})

    toks = docs.select(
        F.col(id_col).alias("_id"), tokens_col(text_col).alias("_toks")
    ).withColumn("_dl", F.size("_toks"))
    stats = toks.agg(
        F.count("*").alias("n_docs"),
        F.coalesce(F.sum("_dl"), F.lit(0)).alias("total_tokens"),
    )
    tf = (
        toks.select("_id", "_dl", F.explode("_toks").alias("term"))
        .filter(F.col("term").isin(all_terms))
        .groupBy("_id", "term")
        .agg(F.count("*").alias("tf"), F.first("_dl").alias("dl"))
    )
    df_per_term = tf.groupBy("term").agg(F.count("*").alias("df"))

    partial = (
        F.log(
            F.lit(1.0)
            + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        )
        * (
            F.col("tf").cast("double")
            / (
                F.col("tf").cast("double")
                + F.lit(p.k1)
                * (
                    F.lit(1.0 - p.b)
                    + F.lit(p.b)
                    * (F.col("dl").cast("double") / (F.col("total_tokens") / F.col("n_docs")))
                )
            )
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("score"), F.asc(id_col))
    return (
        tf.join(F.broadcast(qdf), "term")
        .join(F.broadcast(df_per_term), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("partial", partial)
        .groupBy("query_id", "_id")
        .agg(
            F.count("*").alias("nt"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "partial"))),
                F.lit(0.0),
                lambda acc, x: acc + x["partial"],
            ).alias("raw_score"),
        )
        .join(F.broadcast(nq), "query_id")
        .filter(F.col("nt") == F.col("n_query_terms"))
        .select(
            "query_id",
            F.col("_id").alias(id_col),
            F.round("raw_score", round_dp).alias("score"),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def bm25_topk_dataframe(
    docs: DataFrame,
    query_text: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    params: BM25Params | None = None,
    round_dp: int = 5,
) -> DataFrame:
    """Top-k (id, score) for a conjunctive BM25 query over `docs`.

    Scores are rounded to `round_dp` decimals and the tiebreak is
    (rounded score DESC, id ASC) so results are stable across engines.

    Two-pass plan (see module-level skeleton note): one scalar-aggregate
    stats scan, one candidate scan with map-side tf + TakeOrdered top-k —
    no data-proportional shuffle, no joins.
    """
    p = params or BM25Params()
    terms = analyze_query(query_text)
    spark = docs.sparkSession
    if not terms:
        return spark.createDataFrame([], f"{id_col} long, score double")
    uterms = sorted(set(terms))
    if len(uterms) != len(terms):
        # duplicate analyzed terms make the conjunctive nt == len(terms)
        # contract unsatisfiable (nt counts distinct matched terms)
        return spark.createDataFrame([], f"{id_col} long, score double")
    n_docs, total_tokens, dfs = _corpus_term_stats(docs, uterms, text_col)
    if n_docs == 0:
        return spark.createDataFrame([], f"{id_col} long, score double")

    toks = _project_toks(docs, id_col, text_col)
    pred = reduce(
        lambda a, b: a & b, [F.array_contains("_toks", t) for t in uterms]
    )
    raw = _score_sum(uterms, dfs, n_docs, total_tokens, p)
    return (
        toks.filter(pred)
        .select(F.col("_id").alias(id_col), F.round(raw, round_dp).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )

def bm25_boosted_topk_dataframe(
    docs: DataFrame,
    query_text: str,
    k: int = 10,
    mode: str = "and",
    id_col: str = "doc_id",
    text_col: str = "text",
    params: BM25Params | None = None,
    round_dp: int = 5,
) -> DataFrame:
    """Per-term boosted BM25 — the declarative mirror of
    LocalSearcher.topk_boosted (Lucene `clause^boost` query syntax:
    `spark^2 index^0.5 merge`; boost multiplies the term idf, scaling that
    term's contribution linearly).

    Two-pass literal plan (module skeleton note): the boost multiplies the
    literal idf exactly where the former broadcast relation did. mode='and'
    keeps conjunctive semantics (every term present); mode='or' is the
    disjunctive union.
    """
    p = params or BM25Params()
    terms, boosts = parse_boosted_query(query_text)
    spark = docs.sparkSession
    if not terms:
        return spark.createDataFrame([], f"{id_col} long, score double")
    uterms = sorted(set(terms))
    if mode != "or" and len(uterms) != len(terms):
        return spark.createDataFrame([], f"{id_col} long, score double")
    n_docs, total_tokens, dfs = _corpus_term_stats(docs, uterms, text_col)
    if n_docs == 0:
        return spark.createDataFrame([], f"{id_col} long, score double")

    toks = _project_toks(docs, id_col, text_col)
    contains = [F.array_contains("_toks", t) for t in uterms]
    pred = reduce(lambda a, b: (a & b) if mode != "or" else (a | b), contains)
    raw = _score_sum(uterms, dfs, n_docs, total_tokens, p, boosts=boosts)
    return (
        toks.filter(pred)
        .select(F.col("_id").alias(id_col), F.round(raw, round_dp).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def bm25_prefix_topk_dataframe(
    docs: DataFrame,
    query_text: str,
    k: int = 10,
    max_expansions: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    params: BM25Params | None = None,
    round_dp: int = 5,
) -> DataFrame:
    """Autocomplete-style prefix BM25 top-k — the reference's most-used FTS
    surface (per-term `*` expansion, /root/reference/api/queries/
    neo4j_queries.py:28-39, backing its autocomplete endpoints).

    Semantics (shared verbatim by LocalSearcher.topk_prefix and the DuckDB
    oracle): every analyzed token is a prefix; each prefix expands to the
    first `max_expansions` matching vocabulary terms in term-ASC order
    (Lucene's deterministic rewrite cap); a doc qualifies iff EVERY prefix
    matched at least one of its terms (conjunctive across prefixes, the
    reference's AND join of starred terms); score = sum of idf*tfnorm over
    the DISTINCT matched expanded terms, rounded to `round_dp`.

    Three-job literal plan (module skeleton note): one vocabulary-expansion
    job (explode → distinct → per-prefix capped term-ASC window, collected
    as ≤ max_expansions × #prefixes strings — the engine's sanctioned
    bounded expansion state), then the shared two-pass scoring skeleton
    with per-prefix presence = OR over that prefix's expansions.
    """
    p = params or BM25Params()
    prefixes = analyze_query(query_text)
    spark = docs.sparkSession
    if not prefixes:
        return spark.createDataFrame([], f"{id_col} long, score double")

    exp = _expand_patterns_driver(
        docs, prefixes, max_expansions, text_col, like=False
    )
    return _expanded_group_topk(
        docs, exp, k, id_col, text_col, p, round_dp
    )

def bm25_wildcard_topk_dataframe(
    docs: DataFrame,
    query_text: str,
    k: int = 10,
    max_expansions: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    params: BM25Params | None = None,
    round_dp: int = 5,
) -> DataFrame:
    """Wildcard term-match BM25 top-k — Lucene WildcardQuery / pg_trgm
    LIKE over the vocabulary, the generalization of the autocomplete
    prefix surface (a prefix is the special case `lit*`).

    Semantics (shared verbatim by LocalSearcher.topk_wildcard and the
    DuckDB oracle): every `[a-z0-9*?]+` token of the query is a pattern
    (`*` = any run, `?` = one char); each pattern expands to the first
    `max_expansions` matching vocabulary terms in term-ASC order; a doc
    qualifies iff EVERY pattern matched at least one of its terms; score
    = sum of idf*tfnorm over the DISTINCT matched expanded terms, rounded
    to `round_dp`. The vocabulary join uses native LIKE (term-side column
    vs the broadcast pattern relation), so expansion stays inside
    whole-stage codegen.

    Three-job literal plan — the prefix impl generalized (see
    bm25_prefix_topk_dataframe): LIKE expansion job, then the shared
    two-pass scoring skeleton.
    """
    from discogsography_spark.analysis import parse_wildcard_query

    p = params or BM25Params()
    patterns = parse_wildcard_query(query_text)
    spark = docs.sparkSession
    if not patterns:
        return spark.createDataFrame([], f"{id_col} long, score double")

    exp = _expand_patterns_driver(
        docs, patterns, max_expansions, text_col, like=True
    )
    return _expanded_group_topk(
        docs, exp, k, id_col, text_col, p, round_dp
    )


def _expand_patterns_driver(
    docs: DataFrame,
    patterns: list[str],
    max_expansions: int,
    text_col: str,
    like: bool,
) -> dict[str, list[str]]:
    """pattern → first `max_expansions` matching vocabulary terms in
    term-ASC order, collected to the driver (bounded: ≤ 64 × #patterns
    strings — the same planning-state contract as the index path's
    expand_prefix). One job: explode → distinct vocabulary → broadcast
    pattern join (startswith / native LIKE) → per-pattern capped window."""
    from pyspark.sql import Window as W

    from discogsography_spark.analysis import wildcard_to_like

    spark = docs.sparkSession
    if like:
        pdf = spark.createDataFrame(
            [(x, wildcard_to_like(x)) for x in patterns],
            "prefix string, like_pat string",
        )
        cond = F.expr("term LIKE like_pat")
        any_match = reduce(
            lambda a, b: a | b,
            [F.col("term").like(wildcard_to_like(x)) for x in patterns],
        )
    else:
        pdf = spark.createDataFrame([(x,) for x in patterns], "prefix string")
        cond = F.col("term").startswith(F.col("prefix"))
        any_match = reduce(
            lambda a, b: a | b,
            [F.col("term").startswith(x) for x in patterns],
        )
    # filter BEFORE the distinct exchange: only pattern-matching tokens
    # shuffle (the former shape deduped the whole vocabulary first)
    vocab = (
        docs.select(F.explode(tokens_col(text_col)).alias("term"))
        .filter(any_match)
        .distinct()
    )
    wexp = W.partitionBy("prefix").orderBy(F.asc("term"))
    rows = (
        vocab.join(F.broadcast(pdf), cond)
        .select("prefix", "term")
        .withColumn("rn", F.row_number().over(wexp))
        .filter(F.col("rn") <= max_expansions)
        .select("prefix", "term")
        .collect()
    )
    exp: dict[str, list[str]] = {x: [] for x in patterns}
    for r in rows:
        exp[r["prefix"]].append(r["term"])
    return exp


def _expanded_group_topk(
    docs: DataFrame,
    exp: dict[str, list[str]],
    k: int,
    id_col: str,
    text_col: str,
    p: BM25Params,
    round_dp: int,
) -> DataFrame:
    """Shared scoring tail for prefix/wildcard expansion queries: per-group
    presence = OR over the group's expanded terms, conjunctive across
    groups; score = sum over the distinct expanded terms' partials
    (term-ASC, absent terms an exact 0.0) — the two-pass literal skeleton."""
    spark = docs.sparkSession
    uterms = sorted({t for ts in exp.values() for t in ts})
    if any(not ts for ts in exp.values()) or not uterms:
        # some pattern matched nothing — conjunctive semantics → empty
        return spark.createDataFrame([], f"{id_col} long, score double")
    n_docs, total_tokens, dfs = _corpus_term_stats(docs, uterms, text_col)
    if n_docs == 0:
        return spark.createDataFrame([], f"{id_col} long, score double")

    toks = _project_toks(docs, id_col, text_col)
    group_preds = [
        reduce(lambda a, b: a | b, [F.array_contains("_toks", t) for t in ts])
        for ts in exp.values()
    ]
    pred = reduce(lambda a, b: a & b, group_preds)
    raw = _score_sum(uterms, dfs, n_docs, total_tokens, p)
    return (
        toks.filter(pred)
        .select(F.col("_id").alias(id_col), F.round(raw, round_dp).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )

def bm25_or_topk_dataframe(
    docs: DataFrame,
    query_text: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    params: BM25Params | None = None,
    round_dp: int = 5,
) -> DataFrame:
    """Disjunctive (OR) BM25 top-k: any doc containing ≥1 query term scores;
    absent terms contribute nothing — websearch-style OR semantics, the
    LocalSearcher.topk(mode='or') mirror. Identical plan shape to the AND
    variant minus the all-terms filter."""
    p = params or BM25Params()
    terms = analyze_query(query_text)
    spark = docs.sparkSession
    if not terms:
        return spark.createDataFrame([], f"{id_col} long, score double")
    toks = docs.select(
        F.col(id_col).alias("_id"), tokens_col(text_col).alias("_toks")
    ).withColumn("_dl", F.size("_toks"))
    stats = toks.agg(
        F.count("*").alias("n_docs"),
        F.coalesce(F.sum("_dl"), F.lit(0)).alias("total_tokens"),
    )
    tf = (
        toks.select("_id", "_dl", F.explode("_toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("_id", "term")
        .agg(F.count("*").alias("tf"), F.first("_dl").alias("dl"))
    )
    df_per_term = tf.groupBy("term").agg(F.count("*").alias("df"))
    partial = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    ) * (
        F.col("tf").cast("double")
        / (
            F.col("tf").cast("double")
            + F.lit(p.k1)
            * (
                F.lit(1.0 - p.b)
                + F.lit(p.b)
                * (F.col("dl").cast("double") / (F.col("total_tokens") / F.col("n_docs")))
            )
        )
    )
    return (
        tf.join(F.broadcast(df_per_term), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("partial", partial)
        .groupBy("_id")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "partial"))),
                F.lit(0.0),
                lambda acc, x: acc + x["partial"],
            ).alias("raw_score")
        )
        .select(
            F.col("_id").alias(id_col), F.round("raw_score", round_dp).alias("score")
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def _phrase_pred_core(toks, phrase_terms: list[str]):
    """TRUE iff the token array `toks` (a let-bound variable or attribute)
    contains `phrase_terms` consecutively. Occurrence-positions-first form:
    one O(len) transform+filter finds the first term's in-range start
    positions, then the (rare) candidate starts probe the remaining offsets
    with element_at — replacing the former exists-over-every-start scan,
    whose interpreted per-start lambda was ~14x slower per doc (and every
    probed index stays in range, ANSI-safe)."""
    n = len(phrase_terms)
    if n == 0:
        return F.lit(False)
    if n == 1:
        return F.array_contains(toks, phrase_terms[0])
    first = phrase_terms[0]
    limit = F.size(toks) - F.lit(n - 1)
    starts = F.filter(
        F.transform(toks, lambda x, i: F.when(x == F.lit(first), i + 1)),
        lambda p: p.isNotNull() & (p <= limit),
    )

    def match_at(p):  # p: 1-based in-range start position Column
        cond = F.lit(True)
        for j, t in enumerate(phrase_terms[1:], start=1):
            cond = cond & (F.element_at(toks, p + F.lit(j)) == F.lit(t))
        return cond

    return F.exists(starts, match_at)


def phrase_match_col(
    phrase_terms: list[str], text_col: str = "text"
):
    """TRUE iff the analyzed token stream contains the terms consecutively —
    `phraseto_tsquery` / Lucene PhraseQuery semantics, as one native
    expression (no UDF). The tokenize expression is _let-bound so it
    evaluates ONCE per row (referencing it inside the positional lambdas
    would re-tokenize per element — the shingles_col O(len²) trap)."""
    if not phrase_terms:
        return F.lit(False)
    return _let(
        tokens_col(text_col), lambda toks: _phrase_pred_core(toks, phrase_terms)
    )


def bm25_phrase_topk_dataframe(
    docs: DataFrame,
    phrase: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    params: BM25Params | None = None,
    round_dp: int = 5,
) -> DataFrame:
    """Exact-phrase top-k: docs containing the analyzed phrase consecutively,
    ranked by the BM25 score of the phrase's terms — Lucene PhraseQuery with
    BM25 similarity. Statistics (n_docs, avgdl, per-term df) are
    CORPUS-GLOBAL, exactly like Lucene's phrase scoring; only the candidate
    set is phrase-filtered (filter-before-rank-cap).

    Two-pass literal plan (module skeleton note): a phrase match implies
    every phrase term is present, so the candidate scan is one native
    phrase predicate and the score sums every term's partial."""
    p = params or BM25Params()
    terms = analyze_query(phrase)
    ordered = tokenize_py(phrase)
    spark = docs.sparkSession
    if not terms:
        return spark.createDataFrame([], f"{id_col} long, score double")
    n_docs, total_tokens, dfs = _corpus_term_stats(docs, terms, text_col)
    if n_docs == 0:
        return spark.createDataFrame([], f"{id_col} long, score double")

    toks = _project_toks(docs, id_col, text_col)
    raw = _score_sum(terms, dfs, n_docs, total_tokens, p)
    return (
        toks.filter(_phrase_pred_on_toks(ordered))
        .select(F.col("_id").alias(id_col), F.round(raw, round_dp).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def _let(value, body):
    """Expression-level let-binding: evaluate `value` ONCE and expose it to
    `body` as a lambda VARIABLE (O(1) lookups) instead of an inlined
    expression subtree. Without this, an array expression referenced inside
    a nested higher-order lambda re-evaluates per element — a 3-link
    proximity chain went O(n^3)-ish per row (measured 97 s vs 5 s on the
    bench corpus). transform over a 1-element array is the standard
    Catalyst-safe binding trick (no projection boundary to collapse)."""
    return F.element_at(F.transform(F.array(value), body), 1)


def _within_pred_on_toks(chain: tuple, windows: tuple):
    """Proximity-chain predicate on a pre-tokenized `_toks` column — the
    boolean DataFrame path's within-node leaf (`a <N1> b <N2> c …`):
    left-fold of alive occurrence-position arrays, one link per window
    (adjacent equal terms need distinct occurrences). Chain constraints
    form a path, so the forward fold is exact. Each stage array is
    let-bound, so per-row cost is Σ occ_i · occ_{i+1}, linear in chain
    length."""
    toks = F.col("_toks")
    alive = _occurrence_positions(toks, chain[0])
    for i, w in enumerate(windows):
        nxt = _occurrence_positions(toks, chain[i + 1])
        alive = _chain_step_arrays(alive, nxt, int(w), chain[i] == chain[i + 1])
    return F.size(alive) > 0


def _chain_step_arrays(alive, nxt, w: int, same: bool):
    """Keep occurrences in `nxt` having an alive neighbor within `w`
    (distinct occurrence when the adjacent chain terms are equal). Both
    input arrays are let-bound to lambda variables before the quadratic
    membership check — see _let."""
    if same:
        return _let(
            alive,
            lambda A: _let(
                nxt,
                lambda N: F.filter(
                    N,
                    lambda q: F.exists(
                        A, lambda p: (q != p) & (F.abs(q - p) <= F.lit(w))
                    ),
                ),
            ),
        )
    return _let(
        alive,
        lambda A: _let(
            nxt,
            lambda N: F.filter(
                N, lambda q: F.exists(A, lambda p: F.abs(q - p) <= F.lit(w))
            ),
        ),
    )


def _phrase_pred_on_toks(phrase_terms: list[str]):
    """phrase_match_col specialized to a pre-tokenized `_toks` column —
    the boolean DataFrame path's phrase-node leaf (positions-first form,
    see _phrase_pred_core)."""
    return _phrase_pred_core(F.col("_toks"), phrase_terms)


def bm25_bool_topk_dataframe(
    docs: DataFrame,
    query_text: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    params: BM25Params | None = None,
    round_dp: int = 5,
    ast=None,
) -> DataFrame:
    """Boolean AND/OR/NOT BM25 top-k — the DataFrame mirror of
    `LocalSearcher.topk_bool` (grammar + scoring contract in boolquery.py;
    phrase and `a <N> b` within nodes evaluate as native exists-over-
    positions predicates on the token stream).

    The predicate folds to ONE native Column of array_contains conjunctions/
    disjunctions/negations (whole-stage codegen, no Python); scoring reuses
    the OR plan restricted to matching docs, with idf from CORPUS document
    frequency so index-path and DataFrame-path scores agree. `ast` supplies
    a pre-parsed (possibly fuzzy-rewritten) AST, skipping the parse."""
    from discogsography_spark.query.boolquery import (
        fold_predicate,
        parse_bool_query,
        polarity_terms,
    )

    from discogsography_spark.query.boolquery import (
        expand_prefix_nodes,
        has_prefix_nodes,
    )

    p = params or BM25Params()
    spark = docs.sparkSession
    if ast is None:
        ast = parse_bool_query(query_text, analyze_query, tokenize=tokenize_py)
    if ast is not None and has_prefix_nodes(ast):
        # vocabulary expansion with expand_prefix's exact deterministic
        # rule: distinct corpus tokens, term-ASC, capped at 64. The
        # pattern filter runs BEFORE the distinct exchange (round 7) so
        # only matching tokens shuffle, not the whole vocabulary.
        exploded = docs.select(F.explode(tokens_col(text_col)).alias("t"))

        def expand(pre: str) -> list[str]:
            # wild leaves carry the raw pattern, prefix leaves the bare
            # string — native LIKE vs startswith
            from discogsography_spark.analysis import (
                is_wild_pattern,
                wildcard_to_like,
            )

            if is_wild_pattern(pre):
                cond = F.col("t").like(wildcard_to_like(pre))
            else:
                cond = F.col("t").startswith(pre)
            rows_ = (
                exploded.filter(cond).distinct().orderBy("t").limit(64).collect()
            )
            return [r["t"] for r in rows_]

        ast = expand_prefix_nodes(ast, expand)
    if ast is None:
        return spark.createDataFrame([], f"{id_col} long, score double")
    pos_terms, _ = polarity_terms(ast)
    if not pos_terms:  # only-negative predicates are unsatisfiable post-parse
        return spark.createDataFrame([], f"{id_col} long, score double")

    # two-pass literal plan (module skeleton note): pass 1 collects corpus
    # stats + positive-term dfs; pass 2 is ONE scan applying the folded
    # boolean predicate and summing the present positive terms' partials
    # (absent terms are an exact 0.0) — no explode shuffle, no joins
    uterms = sorted(set(pos_terms))
    n_docs, total_tokens, dfs = _corpus_term_stats(docs, uterms, text_col)
    if n_docs == 0:
        return spark.createDataFrame([], f"{id_col} long, score double")

    toks = _project_toks(docs, id_col, text_col)
    pred = fold_predicate(
        ast,
        lambda t: F.array_contains(F.col("_toks"), t),
        lambda a, b: a & b,
        lambda a, b: a | b,
        lambda a: ~a,
        phrase_leaf=lambda ph: _phrase_pred_on_toks(list(ph)),
        within_leaf=lambda terms, ws: _within_pred_on_toks(terms, ws),
    )
    raw = _score_sum(uterms, dfs, n_docs, total_tokens, p)
    return (
        toks.filter(pred)
        .select(F.col("_id").alias(id_col), F.round(raw, round_dp).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def _occurrence_positions(toks, term: str):
    """1-based positions of `term` in a token-array column — one O(n)
    transform+filter, no per-position window scans."""
    return F.filter(
        F.transform(
            toks,
            lambda x, i: F.when(x == F.lit(term), i + 1),
        ),
        lambda p: p.isNotNull(),
    )


def _proximity_pred_on(toks, t1: str, t2: str, window: int):
    """TRUE iff `t1` and `t2` occur within `window` positions (either
    order; same-term proximity needs two DISTINCT occurrences). Occurrence
    positions are extracted once per term (O(n) codegen), then the check is
    O(occ1·occ2) — occurrence counts are tiny next to doc length, so this
    beats the O(n·window) sliding-window form by ~5-10x on long docs."""
    p1 = _occurrence_positions(toks, t1)
    p2 = _occurrence_positions(toks, t2)
    return _let(
        p2,
        lambda P2: F.exists(
            p1,
            lambda i: F.exists(
                P2,
                lambda j: (j != i)
                & (F.abs(j - i) <= F.lit(window)),
            ),
        ),
    )


def proximity_match_col(t1: str, t2: str, window: int, text_col: str = "text"):
    """TRUE iff the analyzed token stream contains `t1` and `t2` within
    `window` positions of each other (either order; same-term proximity
    needs two distinct occurrences) — native position-array expressions,
    no UDF."""
    return _proximity_pred_on(tokens_col(text_col), t1, t2, window)


def bm25_proximity_topk_dataframe(
    docs: DataFrame,
    word1: str,
    word2: str,
    window: int,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    params: BM25Params | None = None,
    round_dp: int = 5,
) -> DataFrame:
    """Proximity top-k — the DataFrame mirror of LocalSearcher.topk_within:
    docs where the two analyzed terms occur within `window` positions
    (either order), ranked by conjunctive BM25 of the terms with
    corpus-global stats (filter-before-rank-cap, phrase-style).

    Two-pass literal plan (module skeleton note): a proximity match implies
    both terms are present, so the candidate scan is one native position
    predicate and the score sums both terms' partials."""
    p = params or BM25Params()
    spark = docs.sparkSession
    ts1 = analyze_query(word1)
    ts2 = analyze_query(word2)
    if not ts1 or not ts2:
        return spark.createDataFrame([], f"{id_col} long, score double")
    t1, t2 = ts1[0], ts2[0]
    terms = sorted({t1, t2})
    n_docs, total_tokens, dfs = _corpus_term_stats(docs, terms, text_col)
    if n_docs == 0:
        return spark.createDataFrame([], f"{id_col} long, score double")

    toks = _project_toks(docs, id_col, text_col)
    raw = _score_sum(terms, dfs, n_docs, total_tokens, p)
    return (
        toks.filter(_proximity_pred_on(F.col("_toks"), t1, t2, window))
        .select(F.col("_id").alias(id_col), F.round(raw, round_dp).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def bm25_filtered_topk_dataframe(
    docs: DataFrame,
    query_text: str,
    filter_col: str,
    filter_val: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    params: BM25Params | None = None,
    round_dp: int = 5,
) -> DataFrame:
    """Faceted drill-down search — the DataFrame mirror of
    SearchService.search(filter=...): conjunctive match restricted to rows
    where `filter_col == filter_val`, scored with CORPUS-GLOBAL statistics
    (the drill-down contract: a doc's score does not change when the user
    narrows the facet).

    Two-pass literal plan (module skeleton note): statistics stay
    corpus-global (pass 1 sees the whole corpus); the facet equality is one
    more native predicate on the candidate scan — pushed to the parquet
    scan as an EqualTo filter."""
    p = params or BM25Params()
    terms = analyze_query(query_text)
    spark = docs.sparkSession
    if not terms:
        return spark.createDataFrame([], f"{id_col} long, score double")
    n_docs, total_tokens, dfs = _corpus_term_stats(docs, terms, text_col)
    if n_docs == 0:
        return spark.createDataFrame([], f"{id_col} long, score double")

    toks = _project_toks(docs, id_col, text_col, extra_cols=[filter_col])
    pred = reduce(
        lambda a, b: a & b, [F.array_contains("_toks", t) for t in terms]
    )
    raw = _score_sum(terms, dfs, n_docs, total_tokens, p)
    return (
        toks.filter((F.col(filter_col) == F.lit(filter_val)) & pred)
        .select(F.col("_id").alias(id_col), F.round(raw, round_dp).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def bm25_collapse_topk_dataframe(
    docs: DataFrame,
    query_text: str,
    group_col: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    params: BM25Params | None = None,
    round_dp: int = 5,
) -> DataFrame:
    """Field-collapsed search — the DataFrame mirror of
    SearchService.collapse (query/collapse.py): the best-scoring matching
    document per `group_col` value, top-k groups ordered by that best
    document's (score DESC, id ASC), each row carrying the group's total
    matched-document count. Search turns, return conversations — the
    reference's per-entity-type rank-capped subqueries UNION ALL'd
    (api/queries/search_queries.py:105-197) with entity type as the group.

    Plan shape at scale (two-pass literal plan, module skeleton note): the
    candidate scan emits only MATCHED (group, id, score) rows; ONE
    map-side-combined groupBy(group) computes the group best — max of
    struct(score, -id), the lexicographic restatement of the former
    (score DESC, id ASC) row_number window — and the group count together,
    replacing the window exchange + counts groupBy + join with a single
    aggregation on the same key."""
    p = params or BM25Params()
    terms = analyze_query(query_text)
    spark = docs.sparkSession
    if not terms:
        return spark.createDataFrame(
            [], f"{group_col} string, {id_col} long, score double, group_matched long"
        )
    n_docs, total_tokens, dfs = _corpus_term_stats(docs, terms, text_col)
    if n_docs == 0:
        return spark.createDataFrame(
            [], f"{group_col} string, {id_col} long, score double, group_matched long"
        )

    toks = _project_toks(docs, id_col, text_col, extra_cols=[group_col])
    pred = reduce(
        lambda a, b: a & b, [F.array_contains("_toks", t) for t in terms]
    )
    raw = _score_sum(terms, dfs, n_docs, total_tokens, p)
    scored = toks.filter(pred).select(
        F.col(group_col).alias("_gv"),
        "_id",
        F.round(raw, round_dp).alias("score"),
    )
    best = F.max(F.struct(F.col("score"), (-F.col("_id")).alias("_nid")))
    return (
        scored.groupBy("_gv")
        .agg(best.alias("_best"), F.count(F.lit(1)).alias("group_matched"))
        .select(
            F.col("_gv").alias(group_col),
            (-F.col("_best._nid")).alias(id_col),
            F.col("_best.score").alias("score"),
            "group_matched",
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def context_windows_dataframe(
    docs: DataFrame,
    hits: DataFrame,
    window: int = 2,
    id_col: str = "doc_id",
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
) -> DataFrame:
    """Conversation-context retrieval, DataFrame mirror of
    SearchService.context (query/context.py): for each hit, every turn of
    the hit's conversation within `window` turn indexes (turn DISTANCE,
    not row adjacency). `hits` carries id_col (a top-k result frame).

    Plan shape: the hit set is top-k-small, so the conv-equality join
    broadcasts it — one broadcast-hash join + a range filter, no shuffle
    of the corpus."""
    d = docs.select(id_col, conv_col, turn_col)
    h = (
        hits.select(F.col(id_col).alias("hit_doc_id"))
        .join(
            d.select(
                F.col(id_col).alias("hit_doc_id"),
                F.col(conv_col).alias("_hc"),
                F.col(turn_col).alias("_ht"),
            ),
            "hit_doc_id",
        )
    )
    return (
        d.join(
            F.broadcast(h),
            (F.col(conv_col) == F.col("_hc"))
            & (F.abs(F.col(turn_col) - F.col("_ht")) <= F.lit(window)),
        )
        .select("hit_doc_id", id_col, conv_col, turn_col)
        .orderBy("hit_doc_id", turn_col, id_col)
    )


def more_like_this_dataframe(
    docs: DataFrame,
    source_id: int,
    k: int = 10,
    max_terms: int = 8,
    min_df: int = 2,
    max_df_frac: float = 0.25,
    id_col: str = "doc_id",
    text_col: str = "text",
    params: BM25Params | None = None,
    round_dp: int = 5,
) -> DataFrame:
    """More-like-this, DataFrame mirror of SearchService.more_like_this
    (query/mlt.py; Lucene MoreLikeThisQuery): the source document's top
    `max_terms` terms by round(tf·idf, dp) (ties term-ASC, corpus df >=
    min_df), then disjunctive BM25 top-k over them, source excluded.

    Four-job literal plan (module skeleton note): (1) source-doc term
    vector — a pushed-down id-equality scan, collected (Lucene MLT loads
    the source term vector too; bounded by one doc's vocabulary); (2) the
    shared one-scan stats aggregate over the source terms; (3) term
    selection re-run as Spark expressions over a LITERAL (term, src_tf, df)
    relation — no corpus scan, but bit-identical HALF_UP rounding and
    (tf·idf DESC, term ASC) ordering; (4) one candidate scan scoring the
    disjunctive union of the selected terms, source excluded."""
    p = params or BM25Params()
    spark = docs.sparkSession
    empty = f"{id_col} long, score double"
    src_rows = (
        docs.filter(F.col(id_col) == F.lit(source_id))
        .select(F.explode(tokens_col(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("src_tf"))
        .collect()
    )
    if not src_rows:
        return spark.createDataFrame([], empty)
    src_tf = {r["term"]: int(r["src_tf"]) for r in src_rows}
    src_terms = sorted(src_tf)
    n_docs, total_tokens, dfs = _corpus_term_stats(docs, src_terms, text_col)
    if n_docs == 0:
        return spark.createDataFrame([], empty)

    # term selection over the literal relation — the same guard filters,
    # round(tf·idf) expression and (DESC, term ASC) cap as the former
    # windowed plan, evaluated by Spark so rounding semantics are identical
    lit_rel = spark.createDataFrame(
        [(t, src_tf[t], dfs[t]) for t in src_terms],
        "term string, src_tf long, df long",
    )
    idf_rel = F.log(
        F.lit(1.0)
        + (F.lit(n_docs) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    sel_rows = (
        lit_rel.filter(
            (F.col("df") >= F.lit(min_df))
            & (F.col("df") <= F.lit(max_df_frac) * F.lit(n_docs))
        )
        .withColumn(
            "_mlt", F.round(F.col("src_tf").cast("double") * idf_rel, round_dp)
        )
        .orderBy(F.desc("_mlt"), F.asc("term"))
        .limit(max_terms)
        .select("term")
        .collect()
    )
    sel = sorted(r["term"] for r in sel_rows)
    if not sel:
        return spark.createDataFrame([], empty)

    toks = _project_toks(docs, id_col, text_col)
    pred = reduce(
        lambda a, b: a | b, [F.array_contains("_toks", t) for t in sel]
    )
    raw = _score_sum(sel, dfs, n_docs, total_tokens, p)
    return (
        toks.filter(pred & (F.col("_id") != F.lit(source_id)))
        .select(F.col("_id").alias(id_col), F.round(raw, round_dp).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def bm25_fuzzy_bool_topk_dataframe(
    docs: DataFrame,
    query_text: str,
    k: int = 10,
    min_sim: float = 0.3,
    id_col: str = "doc_id",
    text_col: str = "text",
    params: BM25Params | None = None,
    round_dp: int = 5,
) -> DataFrame:
    """Did-you-mean boolean search — the DataFrame mirror of
    `LocalSearcher.topk_fuzzy(mode='bool')`: every PLAIN term leaf of the
    parsed query absent from the corpus vocabulary rewrites to its top
    trigram suggestion (pg_trgm rule via fuzzy_term_matches: similarity
    DESC, term ASC, ≥ min_sim; phrase/within/prefix nodes stay exact), then
    the rewritten AST runs through bm25_bool_topk_dataframe. Vocabulary
    membership and per-absent-term suggestion are driver-side lookups over
    tiny results (bounded by query length), never a corpus collect."""
    from discogsography_spark.query.boolquery import (
        parse_bool_query,
        polarity_terms,
        rewrite_fuzzy_terms,
    )
    from discogsography_spark.query.fuzzy import fuzzy_term_matches

    spark = docs.sparkSession
    ast = parse_bool_query(query_text, analyze_query, tokenize=tokenize_py)
    if ast is None:
        return spark.createDataFrame([], f"{id_col} long, score double")
    pos_t, neg_t = polarity_terms(ast)
    qterms = sorted(set(pos_t) | set(neg_t))
    vocab_hits = {
        r["t"]
        for r in docs.select(F.explode(tokens_col(text_col)).alias("t"))
        .filter(F.col("t").isin(qterms))
        .distinct()
        .collect()
    }

    def _suggest(t: str) -> str | None:
        rows_ = fuzzy_term_matches(
            docs, t, k=1, min_sim=min_sim, text_col=text_col
        ).collect()
        return rows_[0]["term"] if rows_ else None

    fixed_ast, _rewrites = rewrite_fuzzy_terms(
        ast, known=vocab_hits.__contains__, suggest=_suggest
    )
    return bm25_bool_topk_dataframe(
        docs, query_text, k=k, id_col=id_col, text_col=text_col,
        params=params, round_dp=round_dp, ast=fixed_ast,
    )


def bm25_synonym_topk_dataframe(
    docs: DataFrame,
    query_text: str,
    synonyms: dict[str, list[str]],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    params: BM25Params | None = None,
    round_dp: int = 5,
    restrict: DataFrame | None = None,
) -> DataFrame:
    """Synonym-aware conjunctive BM25 — the declarative mirror of
    LocalSearcher.topk_synonym (Lucene SynonymQuery semantics: per query
    term the synonym GROUP scores as one pseudo-term with docFreq = MAX of
    member dfs and per-doc tf = SUM of member tfs).

    The member→group mapping is a literal lookup relation broadcast-joined
    against the exploded token stream, so a member shared by two groups
    contributes to both (exactly like the index evaluator's independent
    group gathers). One token-explode scan feeds both the group tf and the
    member df aggregates; everything else is the standard BM25 plan.

    `restrict` (a one-column `id_col` DataFrame) is the drill-down
    contract of the served path (SearchService._search_synonym with
    `filter=`): group statistics stay GLOBAL — scores are unchanged —
    and only the ranked candidate set is narrowed, via a broadcast
    semi-join before the top-k.
    """
    p = params or BM25Params()
    base = analyze_query(query_text)
    seen: set = set()
    terms = [t for t in base if not (t in seen or seen.add(t))]
    spark = docs.sparkSession
    if not terms:
        return spark.createDataFrame([], f"{id_col} long, score double")
    pairs = []
    for t in terms:
        mem = {t}
        for s in synonyms.get(t, ()):
            mem.update(analyze_query(s))
        for x in sorted(mem):
            pairs.append((x, t))
    syn = F.broadcast(
        spark.createDataFrame(pairs, "member string, leader string")
    )

    toks = docs.select(
        F.col(id_col).alias("_id"), tokens_col(text_col).alias("_toks")
    ).withColumn("_dl", F.size("_toks"))
    stats = toks.agg(
        F.count("*").alias("n_docs"),
        F.coalesce(F.sum("_dl"), F.lit(0)).alias("total_tokens"),
    )
    mt = (
        toks.select("_id", "_dl", F.explode("_toks").alias("member"))
        .join(syn, "member")
    )
    gtf = mt.groupBy("_id", "leader").agg(
        F.count("*").alias("tf"), F.first("_dl").alias("dl")
    )
    mdf = mt.groupBy("member").agg(
        F.countDistinct("_id").alias("df")
    )
    gdf = (
        mdf.join(syn, "member")
        .groupBy("leader")
        .agg(F.max("df").alias("df"))
    )
    scored = (
        gtf.join(F.broadcast(gdf), "leader")
        .crossJoin(F.broadcast(stats))
        .withColumn("avgdl", F.col("total_tokens") / F.col("n_docs"))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "partial",
            F.col("idf")
            * (
                F.col("tf").cast("double")
                / (
                    F.col("tf").cast("double")
                    + F.lit(p.k1)
                    * (
                        F.lit(1.0 - p.b)
                        + F.lit(p.b) * (F.col("dl").cast("double") / F.col("avgdl"))
                    )
                )
            ),
        )
        .groupBy("_id")
        .agg(
            F.count("*").alias("nt"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("leader", "partial"))),
                F.lit(0.0),
                lambda acc, x: acc + x["partial"],
            ).alias("raw_score"),
        )
        .filter(F.col("nt") == F.lit(len(terms)))
        .select(
            F.col("_id").alias(id_col),
            F.round("raw_score", round_dp).alias("score"),
        )
    )
    if restrict is not None:
        scored = scored.join(
            F.broadcast(restrict.select(id_col).distinct()), id_col, "semi"
        )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def matched_stats_dataframe(
    docs: DataFrame,
    query_text: str,
    value_col: str,
    mode: str = "and",
    id_col: str = "doc_id",
    text_col: str = "text",
    round_dp: int = 5,
) -> DataFrame:
    """Metric stats aggregation over the MATCHED set — the declarative
    mirror of SearchService.field_stats on search()'s stats_fields= (the
    Elasticsearch `stats` aggregation: count/min/max/sum/avg of a numeric
    field over the docs a query matches; the reference computes the same
    shape with filtered SQL aggregates in its dashboard queries).

    One token-explode scan finds the matched docs (conjunctive or
    disjunctive term containment), then ONE aggregate over the semi-joined
    doc rows — no per-doc Python, no second scan of the text.
    """
    terms = analyze_query(query_text)
    spark = docs.sparkSession
    if not terms:
        return spark.createDataFrame(
            [],
            "count long, min double, max double, sum double, avg double",
        )
    hits = (
        docs.select(F.col(id_col).alias("_id"), tokens_col(text_col).alias("_toks"))
        .select("_id", F.explode(F.array_distinct("_toks")).alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("_id")
        .agg(F.count("*").alias("nt"))
    )
    if mode != "or":
        hits = hits.filter(F.col("nt") == F.lit(len(terms)))
    matched = docs.join(
        hits.select(F.col("_id").alias(id_col)), id_col, "semi"
    )
    v = F.col(value_col).cast("double")
    return matched.agg(
        F.count(v).alias("count"),
        F.round(F.min(v), round_dp).alias("min"),
        F.round(F.max(v), round_dp).alias("max"),
        F.round(F.sum(v), round_dp).alias("sum"),
        F.round(F.avg(v), round_dp).alias("avg"),
    )


def significant_terms_dataframe(
    docs: DataFrame,
    query_text: str,
    k: int = 10,
    mode: str = "and",
    min_doc_count: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_dp: int = 5,
) -> DataFrame:
    """Significant-terms aggregation — the declarative mirror of
    SearchService.significant_terms (Elasticsearch significant_terms with
    the JLH heuristic): terms over-represented in the MATCHED set vs the
    whole corpus, score = (fg% − bg%)·(fg%/bg%), query terms excluded,
    fg ≥ min_doc_count, ordered (score DESC, term ASC).

    ONE distinct (doc, term) explode feeds foreground counts (semi-join
    against the matched docs), background dfs, and the matched total —
    Catalyst reuses the exchange; nothing is quadratic in vocabulary.
    """
    terms = analyze_query(query_text)
    spark = docs.sparkSession
    if not terms:
        return spark.createDataFrame(
            [], f"term string, fg long, bg long, score double"
        )
    doc_terms = docs.select(
        F.col(id_col).alias("_id"), tokens_col(text_col).alias("_toks")
    ).select("_id", F.explode(F.array_distinct("_toks")).alias("term"))
    hits = (
        doc_terms.filter(F.col("term").isin(terms))
        .groupBy("_id")
        .agg(F.count("*").alias("nt"))
    )
    if mode != "or":
        hits = hits.filter(F.col("nt") == F.lit(len(terms)))
    matched_ids = hits.select("_id")
    totals = matched_ids.agg(F.count("*").alias("n_matched")).crossJoin(
        docs.agg(F.count("*").alias("n_docs"))
    )
    fg = (
        doc_terms.join(F.broadcast(matched_ids), "_id", "semi")
        .groupBy("term")
        .agg(F.count("*").alias("fg"))
        .filter(~F.col("term").isin(terms))
        .filter(F.col("fg") >= F.lit(min_doc_count))
    )
    bg = doc_terms.groupBy("term").agg(F.count("*").alias("bg"))
    scored = (
        fg.join(bg, "term")
        .crossJoin(F.broadcast(totals))
        .withColumn("fg_pct", F.col("fg") / F.col("n_matched"))
        .withColumn("bg_pct", F.col("bg") / F.col("n_docs"))
        .filter(F.col("fg_pct") > F.col("bg_pct"))
        .withColumn(
            "score",
            (F.col("fg_pct") - F.col("bg_pct"))
            * (F.col("fg_pct") / F.col("bg_pct")),
        )
        .select(
            "term",
            F.col("fg").cast("long").alias("fg"),
            F.col("bg").cast("long").alias("bg"),
            F.round("score", round_dp).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(k)
    )
    return scored


def matched_histogram_dataframe(
    docs: DataFrame,
    query_text: str,
    value_col: str,
    interval: float,
    mode: str = "and",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Numeric histogram aggregation over the MATCHED set — the
    declarative mirror of SearchService.numeric_histogram (Elasticsearch
    `histogram`: bucket = floor(value/interval)·interval, counts bucket-ASC,
    empty buckets dropped, nulls excluded). One explode scan for the match,
    one groupBy over the semi-joined rows."""
    terms = analyze_query(query_text)
    spark = docs.sparkSession
    if not terms:
        return spark.createDataFrame([], "bucket double, n long")
    hits = (
        docs.select(
            F.col(id_col).alias("_id"), tokens_col(text_col).alias("_toks")
        )
        .select("_id", F.explode(F.array_distinct("_toks")).alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("_id")
        .agg(F.count("*").alias("nt"))
    )
    if mode != "or":
        hits = hits.filter(F.col("nt") == F.lit(len(terms)))
    matched = docs.join(
        hits.select(F.col("_id").alias(id_col)), id_col, "semi"
    )
    bucket = (
        F.floor(F.col(value_col).cast("double") / F.lit(float(interval)))
        * F.lit(float(interval))
    ).alias("bucket")
    return (
        matched.filter(F.col(value_col).isNotNull())
        .groupBy(bucket)
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


def matched_percentiles_dataframe(
    docs: DataFrame,
    query_text: str,
    value_col: str,
    mode: str = "and",
    id_col: str = "doc_id",
    text_col: str = "text",
    round_dp: int = 5,
) -> DataFrame:
    """Exact percentiles (p25/p50/p75/p95, linear interpolation) + exact
    distinct-value cardinality of a numeric field over the MATCHED set —
    the declarative mirror of SearchService.field_percentiles /
    field_cardinality. `percentile()` is Spark's exact evaluator (the
    SQL quantile_cont semantics DuckDB mirrors); ES's t-digest/HLL
    approximations are unnecessary when the gather is one scan."""
    terms = analyze_query(query_text)
    spark = docs.sparkSession
    if not terms:
        return spark.createDataFrame(
            [],
            "p25 double, p50 double, p75 double, p95 double, distinct_vals long",
        )
    hits = (
        docs.select(
            F.col(id_col).alias("_id"), tokens_col(text_col).alias("_toks")
        )
        .select("_id", F.explode(F.array_distinct("_toks")).alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("_id")
        .agg(F.count("*").alias("nt"))
    )
    if mode != "or":
        hits = hits.filter(F.col("nt") == F.lit(len(terms)))
    matched = docs.join(
        hits.select(F.col("_id").alias(id_col)), id_col, "semi"
    )
    v = F.col(value_col).cast("double")
    pct = F.percentile(v, F.array(*[F.lit(x) for x in (0.25, 0.5, 0.75, 0.95)]))
    return matched.agg(
        F.round(pct[0], round_dp).alias("p25"),
        F.round(pct[1], round_dp).alias("p50"),
        F.round(pct[2], round_dp).alias("p75"),
        F.round(pct[3], round_dp).alias("p95"),
        F.countDistinct(v).alias("distinct_vals"),
    )


def bm25_grouped_topk_dataframe(
    docs: DataFrame,
    query_text: str,
    group_col: str,
    k: int = 10,
    mode: str = "and",
    id_col: str = "doc_id",
    text_col: str = "text",
    params: BM25Params | None = None,
    round_dp: int = 5,
) -> DataFrame:
    """Grouped relevance — the declarative mirror of
    SearchService.grouped_topk (Lucene grouping score modes): rank
    `group_col` GROUPS by aggregates of their matched members' BM25
    scores, one row per group (group, n_matched, sum_score, avg_score,
    max_score) ordered (sum DESC, group ASC). collapse() returns the best
    REPRESENTATIVE per group; this returns the group AGGREGATE — the
    "rank conversations by total relevance of their turns" shape.

    Plan: the standard BM25 scoring sub-plan (raw scores, no per-doc
    rounding — aggregates round once) + one broadcast join to the group
    column + one groupBy. Nothing beyond the facet-tier O(matched) cost.
    """
    p = params or BM25Params()
    terms = analyze_query(query_text)
    spark = docs.sparkSession
    if not terms:
        return spark.createDataFrame(
            [],
            "group string, n_matched long, sum_score double, "
            "avg_score double, max_score double",
        )
    toks = docs.select(
        F.col(id_col).alias("_id"), tokens_col(text_col).alias("_toks")
    ).withColumn("_dl", F.size("_toks"))
    stats = toks.agg(
        F.count("*").alias("n_docs"),
        F.coalesce(F.sum("_dl"), F.lit(0)).alias("total_tokens"),
    )
    tf = (
        toks.select("_id", "_dl", F.explode("_toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("_id", "term")
        .agg(F.count("*").alias("tf"), F.first("_dl").alias("dl"))
    )
    df_per_term = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(F.broadcast(df_per_term), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("avgdl", F.col("total_tokens") / F.col("n_docs"))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "partial",
            F.col("idf")
            * (
                F.col("tf").cast("double")
                / (
                    F.col("tf").cast("double")
                    + F.lit(p.k1)
                    * (
                        F.lit(1.0 - p.b)
                        + F.lit(p.b)
                        * (F.col("dl").cast("double") / F.col("avgdl"))
                    )
                )
            ),
        )
        .groupBy("_id")
        .agg(
            F.count("*").alias("nt"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "partial"))),
                F.lit(0.0),
                lambda acc, x: acc + x["partial"],
            ).alias("raw_score"),
        )
    )
    if mode != "or":
        scored = scored.filter(F.col("nt") == F.lit(len(terms)))
    return (
        scored.join(
            docs.select(
                F.col(id_col).alias("_id"),
                F.col(group_col).cast("string").alias("group"),
            ),
            "_id",
        )
        .groupBy("group")
        .agg(
            F.count("*").alias("n_matched"),
            F.round(F.sum("raw_score"), round_dp).alias("sum_score"),
            F.round(F.avg("raw_score"), round_dp).alias("avg_score"),
            F.round(F.max("raw_score"), round_dp).alias("max_score"),
        )
        .orderBy(F.desc("sum_score"), F.asc("group"))
        .limit(k)
    )


def bm25_range_filtered_topk_dataframe(
    docs: DataFrame,
    query_text: str,
    range_col: str,
    lo: float | None,
    hi: float | None,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    params: BM25Params | None = None,
    round_dp: int = 5,
) -> DataFrame:
    """Numeric-range drill-down search — the DataFrame mirror of
    SearchService.search(filter={col: (lo, hi)}): conjunctive match
    restricted to rows with lo ≤ range_col ≤ hi (either bound None =
    open), scored with CORPUS-GLOBAL statistics (the drill-down
    contract — narrowing never changes a doc's score)."""
    p = params or BM25Params()
    terms = analyze_query(query_text)
    spark = docs.sparkSession
    if not terms:
        return spark.createDataFrame([], f"{id_col} long, score double")
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.col(range_col).cast("double").alias("_rv"),
        tokens_col(text_col).alias("_toks"),
    ).withColumn("_dl", F.size("_toks"))
    stats = toks.agg(
        F.count("*").alias("n_docs"),
        F.coalesce(F.sum("_dl"), F.lit(0)).alias("total_tokens"),
    )
    tf_all = (
        toks.select("_id", "_dl", F.explode("_toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("_id", "term")
        .agg(F.count("*").alias("tf"), F.first("_dl").alias("dl"))
    )
    df_per_term = tf_all.groupBy("term").agg(F.count("*").alias("df"))
    pred = F.col("_rv").isNotNull()
    if lo is not None:
        pred = pred & (F.col("_rv") >= F.lit(float(lo)))
    if hi is not None:
        pred = pred & (F.col("_rv") <= F.lit(float(hi)))
    matched = toks.filter(pred).select("_id")
    tf = tf_all.join(matched, "_id", "left_semi")
    partial = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    ) * (
        F.col("tf").cast("double")
        / (
            F.col("tf").cast("double")
            + F.lit(p.k1)
            * (
                F.lit(1.0 - p.b)
                + F.lit(p.b)
                * (
                    F.col("dl").cast("double")
                    / (F.col("total_tokens") / F.col("n_docs"))
                )
            )
        )
    )
    return (
        tf.join(F.broadcast(df_per_term), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("partial", partial)
        .groupBy("_id")
        .agg(
            F.count("*").alias("nt"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "partial"))),
                F.lit(0.0),
                lambda acc, x: acc + x["partial"],
            ).alias("raw_score"),
        )
        .filter(F.col("nt") == F.lit(len(terms)))  # conjunctive
        .select(
            F.col("_id").alias(id_col),
            F.round("raw_score", round_dp).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
