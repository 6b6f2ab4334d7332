"""Pure-Python reference engine (NO Spark): tokenizer + inverted index + BM25
top-k. This is "the reference engine" that BASELINE.json's north_rule demands
rank-identity against — an executable restatement of the reference's two
full-text engines (PostgreSQL ts_rank top-k, /root/reference/api/queries/
search_queries.py:227-234; Lucene BM25 `ORDER BY score DESC LIMIT k`,
/root/reference/api/queries/neo4j_queries.py:120-129).

Determinism discipline (matched exactly by the Spark engine):
- docIDs = dense rank over global (conv_id ASC, turn_idx ASC) sort;
- conjunctive AND over distinct analyzed terms (plainto_tsquery semantics);
- score = sum of idf*tfnorm in SORTED term order, float64 throughout;
- top-k tiebreak (score DESC, doc_id ASC) — the `rank DESC, data_id`
  discipline of /root/reference/api/queries/search_queries.py:132-134.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

from discogsography_spark.analysis import analyze_query, get_analyzer, tokenize_py
from discogsography_spark.params import BM25Params


@dataclass
class OracleIndex:
    n_docs: int = 0
    total_tokens: int = 0
    # term -> {doc_id: tf}
    postings: dict[str, dict[int, int]] = field(default_factory=dict)
    doc_len: dict[int, int] = field(default_factory=dict)
    doc_tokens: dict[int, list[str]] = field(default_factory=dict)
    params: BM25Params = field(default_factory=BM25Params)
    analyzer: str = "simple"

    @property
    def avgdl(self) -> float:
        return self.total_tokens / self.n_docs if self.n_docs else 0.0

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))


def build_oracle_index(
    rows: list[tuple[str, int, str]],
    params: BM25Params | None = None,
    analyzer: str = "simple",
) -> OracleIndex:
    """rows: (conv_id, turn_idx, text). docIDs assigned by sorted
    (conv_id, turn_idx) dense rank — identical to the Spark engine."""
    an = get_analyzer(analyzer)
    idx = OracleIndex(params=params or BM25Params(), analyzer=analyzer)
    ordered = sorted(rows, key=lambda r: (r[0], r[1]))
    for doc_id, (_conv, _turn, text) in enumerate(ordered):
        toks = an.tokenize_py(text)
        idx.doc_len[doc_id] = len(toks)
        idx.doc_tokens[doc_id] = toks
        idx.total_tokens += len(toks)
        for term, tf in Counter(toks).items():
            idx.postings.setdefault(term, {})[doc_id] = tf
    idx.n_docs = len(ordered)
    return idx


def bm25_topk_or(
    idx: OracleIndex, query_text: str, k: int
) -> list[tuple[int, float]]:
    """Disjunctive (OR) BM25 top-k: candidates = union of postings; missing
    terms contribute nothing. Same determinism discipline: per-doc sum in
    sorted term order (absent terms skipped), (score DESC, doc_id ASC)."""
    terms = get_analyzer(idx.analyzer).analyze_query(query_text)
    present = [t for t in terms if idx.postings.get(t)]
    if not present:
        return []
    p_ = idx.params
    n, avgdl = idx.n_docs, idx.avgdl
    idfs = {t: p_.idf(n, len(idx.postings[t])) for t in present}
    candidates: set[int] = set()
    for t in present:
        candidates.update(idx.postings[t].keys())
    scored: list[tuple[int, float]] = []
    for d in candidates:
        dl = idx.doc_len[d]
        norm = p_.k1 * (1.0 - p_.b + p_.b * (dl / avgdl))
        s = 0.0
        for t in present:  # sorted order — fixed float64 summation order
            tf = idx.postings[t].get(d)
            if tf is not None:
                s = s + idfs[t] * (float(tf) / (float(tf) + norm))
        scored.append((d, s))
    scored.sort(key=lambda ds: (-ds[1], ds[0]))
    return scored[:k]


def bm25_topk(
    idx: OracleIndex, query_text: str, k: int
) -> list[tuple[int, float]]:
    """Conjunctive BM25 top-k: [(doc_id, score)] sorted by
    (score DESC, doc_id ASC). Empty if any term is absent (AND semantics)."""
    terms = get_analyzer(idx.analyzer).analyze_query(query_text)
    if not terms:
        return []
    plists = []
    for t in terms:
        p = idx.postings.get(t)
        if not p:
            return []
        plists.append((t, p))
    # intersect on the smallest list
    plists_by_size = sorted(plists, key=lambda tp: len(tp[1]))
    candidates = set(plists_by_size[0][1].keys())
    for _t, p in plists_by_size[1:]:
        candidates &= p.keys()
        if not candidates:
            return []
    p_ = idx.params
    n, avgdl = idx.n_docs, idx.avgdl
    idfs = {t: p_.idf(n, len(p)) for t, p in plists}
    scored: list[tuple[int, float]] = []
    for d in candidates:
        dl = idx.doc_len[d]
        norm = p_.k1 * (1.0 - p_.b + p_.b * (dl / avgdl))
        s = 0.0
        for t in terms:  # sorted order — fixed float64 summation order
            tf = float(idx.postings[t][d])
            s = s + idfs[t] * (tf / (tf + norm))
        scored.append((d, s))
    scored.sort(key=lambda ds: (-ds[1], ds[0]))
    return scored[:k]


def bm25_topk_boosted(
    idx: OracleIndex, query_text: str, k: int, mode: str = "and"
) -> list[tuple[int, float]]:
    """Per-term boosted BM25 oracle — Lucene `clause^boost` syntax (see
    analysis.parse_boosted_query / LocalSearcher.topk_boosted). The boost
    pre-multiplies the term idf (boost·idf, THEN ·tfnorm — the engine's
    float64 association order); summation in sorted term order."""
    from discogsography_spark.analysis import parse_boosted_query

    terms, boosts = parse_boosted_query(
        query_text, get_analyzer(idx.analyzer)
    )
    present = [t for t in terms if idx.postings.get(t)]
    if not present or (mode != "or" and len(present) != len(terms)):
        return []
    p_ = idx.params
    n, avgdl = idx.n_docs, idx.avgdl
    idfs = {
        t: boosts[t] * p_.idf(n, len(idx.postings[t])) for t in present
    }
    if mode == "or":
        candidates: set[int] = set()
        for t in present:
            candidates.update(idx.postings[t].keys())
    else:
        by_size = sorted(present, key=lambda t: len(idx.postings[t]))
        candidates = set(idx.postings[by_size[0]].keys())
        for t in by_size[1:]:
            candidates &= idx.postings[t].keys()
            if not candidates:
                return []
    scored: list[tuple[int, float]] = []
    for d in candidates:
        dl = idx.doc_len[d]
        norm = p_.k1 * (1.0 - p_.b + p_.b * (dl / avgdl))
        s = 0.0
        for t in present:  # sorted order — fixed float64 summation order
            tf = idx.postings[t].get(d)
            if tf is not None:
                s = s + idfs[t] * (float(tf) / (float(tf) + norm))
        scored.append((d, s))
    scored.sort(key=lambda ds: (-ds[1], ds[0]))
    return scored[:k]


def bm25_topk_bool(
    idx: OracleIndex, query_text: str, k: int
) -> list[tuple[int, float]]:
    """Boolean AND/OR/NOT BM25 top-k oracle: brute-force predicate
    evaluation over every doc, scoring the present positive-polarity terms
    in sorted order (the contract in query/boolquery.py)."""
    from discogsography_spark.query.boolquery import (
        eval_predicate,
        parse_bool_query,
        polarity_terms,
    )

    from discogsography_spark.query.boolquery import expand_prefix_nodes

    analyzer = get_analyzer(idx.analyzer)
    ast = parse_bool_query(
        query_text, analyzer.analyze_query, tokenize=analyzer.tokenize_py
    )
    def _expand_leaf(p: str) -> list[str]:
        # wild leaves carry the raw pattern, prefix leaves the bare string
        # (engine expand_patterns' dispatch rule)
        from discogsography_spark.analysis import is_wild_pattern, wildcard_regex

        if is_wild_pattern(p):
            rx = wildcard_regex(p)
            return sorted(t for t in idx.postings if rx.fullmatch(t))[:64]
        return sorted(t for t in idx.postings if t.startswith(p))[:64]

    if ast is not None:
        ast = expand_prefix_nodes(ast, _expand_leaf)
    if ast is None:
        return []

    def contains_phrase(doc_id: int, ph: tuple) -> bool:
        toks = idx.doc_tokens.get(doc_id, [])
        n = len(ph)
        return any(
            tuple(toks[i : i + n]) == ph for i in range(len(toks) - n + 1)
        )

    def contains_within(doc_id: int, terms: tuple, windows: tuple) -> bool:
        # chain left-fold: alive positions of terms[i+1] reachable from an
        # alive terms[i] occurrence within windows[i] (adjacent equal
        # terms need distinct occurrences) — arc consistency on a path is
        # globally consistent, so a non-empty final set proves a chain
        toks = idx.doc_tokens.get(doc_id, [])
        alive = [i for i, t in enumerate(toks) if t == terms[0]]
        for step, w in enumerate(windows):
            nxt = [i for i, t in enumerate(toks) if t == terms[step + 1]]
            same = terms[step] == terms[step + 1]
            alive = [
                q
                for q in nxt
                if any(
                    abs(q - p) <= w and (not same or q != p) for p in alive
                )
            ]
            if not alive:
                return False
        return True

    pos_terms, _ = polarity_terms(ast)
    p_ = idx.params
    n, avgdl = idx.n_docs, idx.avgdl
    present = [t for t in pos_terms if idx.postings.get(t)]
    idfs = {t: p_.idf(n, len(idx.postings[t])) for t in present}
    scored: list[tuple[int, float]] = []
    for d in range(idx.n_docs):
        if not eval_predicate(
            ast,
            lambda t: d in idx.postings.get(t, {}),
            has_phrase=lambda ph: contains_phrase(d, ph),
            has_within=lambda pair, w: contains_within(d, pair, w),
        ):
            continue
        dl = idx.doc_len[d]
        norm = p_.k1 * (1.0 - p_.b + p_.b * (dl / avgdl))
        s = 0.0
        for t in present:  # sorted order — fixed float64 summation order
            tf = idx.postings[t].get(d)
            if tf is not None:
                s = s + idfs[t] * (float(tf) / (float(tf) + norm))
        scored.append((d, s))
    scored.sort(key=lambda ds: (-ds[1], ds[0]))
    return scored[:k]


def bm25_topk_synonym(
    idx: OracleIndex,
    query_text: str,
    k: int,
    synonyms: dict[str, list[str]],
) -> list[tuple[int, float]]:
    """Synonym-aware conjunctive BM25 (Lucene SynonymQuery semantics): per
    query term the synonym group scores as one pseudo-term with
    docFreq = MAX over member dfs and per-doc tf = SUM of member tfs.
    Same determinism discipline as bm25_topk: per-doc sum in sorted
    group-leader order, (score DESC, doc_id ASC)."""
    an = get_analyzer(idx.analyzer)
    base = an.analyze_query(query_text)
    seen: set[str] = set()
    terms = [t for t in base if not (t in seen or seen.add(t))]
    if not terms or k <= 0:
        return []
    groups: list[tuple[str, list[str]]] = []
    for t in terms:
        mem = {t}
        for s in synonyms.get(t, ()):
            mem.update(an.analyze_query(s))
        groups.append((t, sorted(mem)))
    groups.sort(key=lambda g: g[0])
    p_ = idx.params
    n, avgdl = idx.n_docs, idx.avgdl
    rels: list[tuple[float, dict[int, int]]] = []
    for _leader, ms in groups:
        present = [x for x in ms if idx.postings.get(x)]
        if not present:
            return []
        df = max(len(idx.postings[x]) for x in present)
        tfmap: dict[int, int] = {}
        for x in present:
            for d, tf in idx.postings[x].items():
                tfmap[d] = tfmap.get(d, 0) + tf
        rels.append((p_.idf(n, df), tfmap))
    cand = set(rels[0][1])
    for _idf, tm in rels[1:]:
        cand &= set(tm)
    out: list[tuple[int, float]] = []
    for d in cand:
        norm = p_.k1 * (1.0 - p_.b + p_.b * (idx.doc_len[d] / avgdl))
        score = 0.0
        for idf, tm in rels:
            tf = float(tm[d])
            score += idf * (tf / (tf + norm))
        out.append((d, score))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]
