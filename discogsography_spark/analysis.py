"""The analyzer: ONE tokenizer shared verbatim by index build, query parsing,
the pure-Python oracle, and the DuckDB oracle SQL.

The reference enforces the same invariant — its Lucene query builder
normalizes query text with the same analyzer the index was built with
(/root/reference/api/queries/neo4j_queries.py:28-39), and PostgreSQL's
`plainto_tsquery('english', q)` applies the identical tsvector configuration
used at index time (/root/reference/api/queries/search_queries.py:143-147).

Tokenization = lowercase, then extract maximal runs of [a-z0-9]. This is
deliberately expressible in four dialects with identical results:

- CPython: ``TOKEN_RE.findall(text.lower())``
- pandas (vectorized): ``series.str.lower().str.findall(TOKEN_PATTERN)``
- Spark SQL: ``regexp_extract_all(lower(text), '[a-z0-9]+', 0)``
- DuckDB SQL: ``regexp_extract_all(lower(text), '[a-z0-9]+')``

No stemming / stopwords in v1 (the reference's english stemmer is a Lucene/
PG-internal detail; rank-identity is defined against OUR oracle, which shares
this analyzer).
"""

from __future__ import annotations

import re
from typing import Iterable

import pandas as pd

TOKEN_PATTERN = r"[a-z0-9]+"
TOKEN_RE = re.compile(TOKEN_PATTERN)


def tokenize_py(text: str | None) -> list[str]:
    """Pure-Python reference tokenizer (oracle side)."""
    if not text:
        return []
    return TOKEN_RE.findall(text.lower())


def tokenize_pandas(texts: pd.Series) -> pd.Series:
    """Vectorized pandas tokenizer (pandas-UDF side). Same output as
    tokenize_py element-wise; nulls/empties → empty list."""
    filled = texts.fillna("")
    return filled.str.lower().str.findall(TOKEN_RE)


def analyze_query(query_text: str) -> list[str]:
    """Query-side analysis: tokenize, dedupe, SORT. Sorted order is the
    deterministic BM25 summation order (see params.py docstring).
    Conjunctive AND semantics over the distinct terms — mirrors
    plainto_tsquery (/root/reference/api/queries/search_queries.py:228)."""
    return sorted(set(tokenize_py(query_text)))


_BOOST_CLAUSE_RE = re.compile(r"^(.*?)\^(\d+(?:\.\d+)?)$")


def parse_boosted_query(
    query_text: str, analyzer: "Analyzer | None" = None
) -> tuple[list[str], dict[str, float]]:
    """Lucene `clause^boost` query syntax (e.g. `spark^2 index^0.5 merge`):
    whitespace-separated clauses, each optionally suffixed `^<float>`
    (default 1.0). Each clause is analyzed with the index analyzer; every
    resulting token carries the clause boost. A token produced by several
    clauses SUMS their boosts — identical to Lucene's BooleanQuery scoring
    two boosted clauses of the same term (b1·s + b2·s = (b1+b2)·s).

    Returns (sorted unique terms, {term: boost}) — the sorted term list is
    the deterministic BM25 summation order every evaluator uses.
    """
    an = analyzer if analyzer is not None else get_analyzer("simple")
    boosts: dict[str, float] = {}
    for clause in query_text.split():
        m = _BOOST_CLAUSE_RE.match(clause)
        raw, b = (m.group(1), float(m.group(2))) if m else (clause, 1.0)
        for t in an.analyze_query(raw):
            boosts[t] = boosts.get(t, 0.0) + b
    return sorted(boosts), boosts


WILD_TOKEN_RE = re.compile(r"[a-z0-9*?]+")


def parse_wildcard_query(query_text: str) -> list[str]:
    """Wildcard-query analysis: lowercase, extract `[a-z0-9*?]+` tokens,
    dedupe, SORT (the analyze_query contract). `*` matches any run, `?`
    exactly one character — Lucene WildcardQuery / SQL LIKE `%`/`_`
    (pg_trgm-accelerated LIKE is the reference-stack analog). Patterns are
    NOT stemmed: like prefixes, they are partial words matched against the
    stored dictionary. A pattern with no literal character (`*`, `??`) is
    rejected — its expansion is the entire vocabulary."""
    pats = sorted(set(WILD_TOKEN_RE.findall((query_text or "").lower())))
    for p in pats:
        if all(c in "*?" for c in p):
            raise ValueError(
                f"wildcard pattern {p!r} has no literal characters"
            )
    return pats


def is_wild_pattern(s: str) -> bool:
    """True for wildcard patterns (contain `*` or `?`) — THE dispatch rule
    between prefix leaves (bare strings) and wild leaves (patterns) in
    every expansion resolver. Single definition so the wildcard character
    set can never drift between call sites."""
    return "*" in s or "?" in s


def wildcard_to_like(pattern: str) -> str:
    """SQL LIKE form of a wildcard pattern: `*` → `%`, `?` → `_` (the
    vocabulary alphabet is [a-z0-9], so nothing needs escaping)."""
    return pattern.replace("*", "%").replace("?", "_")


def wildcard_regex(pattern: str) -> "re.Pattern[str]":
    """Compiled regex fullmatching a wildcard pattern over the [a-z0-9]
    vocabulary alphabet."""
    parts = []
    for c in pattern:
        if c == "*":
            parts.append("[a-z0-9]*")
        elif c == "?":
            parts.append("[a-z0-9]")
        else:
            parts.append(re.escape(c))
    return re.compile("".join(parts))


def wildcard_literal_prefix(pattern: str) -> str:
    """Literal run before the first wildcard character — the dictionary
    range [lit, lit+'{') every match must fall in (empty for leading
    wildcards: the whole dictionary is the range)."""
    i = min(
        (pattern.index(c) for c in "*?" if c in pattern), default=len(pattern)
    )
    return pattern[:i]


def spark_tokens_expr(col: str = "text") -> str:
    """Spark SQL expression string producing the token array for a column.

    Native regexp_extract_all keeps tokenization inside whole-stage codegen
    for plans that don't need the pandas-UDF path.
    """
    return f"regexp_extract_all(lower(coalesce({col}, '')), '{TOKEN_PATTERN}', 0)"


def duckdb_tokens_expr(col: str = "text") -> str:
    """DuckDB SQL expression equivalent of spark_tokens_expr (oracle SQL)."""
    return f"regexp_extract_all(lower(coalesce({col}, '')), '{TOKEN_PATTERN}')"


def terms_of(texts: Iterable[str]) -> set[str]:
    out: set[str] = set()
    for t in texts:
        out.update(tokenize_py(t))
    return out


# ---------------------------------------------------------------------------
# Pluggable analyzers — the reference stems on BOTH its engines:
# to_tsvector('english', ...) in PostgreSQL
# (/root/reference/schema-init/postgres_schema.py:66-83) and Lucene's english
# analyzer in Neo4j fulltext indexes. `plainto_tsquery('english', 'running
# shoes')` matches "run shoe"; the default 'simple' analyzer here does not.
#
# Analyzer parity stays the hard invariant: ONE analyzer object is used at
# index time, query time, and in the pure-Python oracle; the index manifest
# records the analyzer name so an index can never be queried with the wrong
# one. The 'english' analyzer = simple tokenizer + snowball stopword removal
# + the classic Porter (1980) stemmer, implemented below from the public
# algorithm description (pure function — identical output everywhere).
# ---------------------------------------------------------------------------

_VOWELS = set("aeiou")

# Snowball English stopword list (public domain)
ENGLISH_STOPWORDS = frozenset(
    """i me my myself we our ours ourselves you your yours yourself yourselves
he him his himself she her hers herself it its itself they them their theirs
themselves what which who whom this that these those am is are was were be
been being have has had having do does did doing a an the and but if or
because as until while of at by for with about against between into through
during before after above below to from up down in out on off over under
again further then once here there when where why how all any both each few
more most other some such no nor not only own same so than too very s t can
will just don should now""".split()
)


def _is_consonant(word: str, i: int) -> bool:
    ch = word[i]
    if ch in _VOWELS:
        return False
    if ch == "y":
        return i == 0 or not _is_consonant(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Porter's m: number of VC sequences in the [C](VC)^m[V] form."""
    m = 0
    prev_c = None
    for i in range(len(stem)):
        c = _is_consonant(stem, i)
        if prev_c and not c:
            pass  # entering a vowel run
        if prev_c is False and c:
            m += 1  # vowel→consonant closes a VC
        prev_c = c
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_consonant(stem, i) for i in range(len(stem)))


def _ends_double_consonant(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_consonant(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    if (
        _is_consonant(word, len(word) - 3)
        and not _is_consonant(word, len(word) - 2)
        and _is_consonant(word, len(word) - 1)
    ):
        return word[-1] not in "wxy"
    return False


def porter_stem(word: str) -> str:
    """Classic Porter (1980) stemmer — pure function, ASCII lowercase input
    (our analyzer alphabet). Digits and words ≤ 2 chars pass through."""
    if len(word) <= 2 or not word.isalpha():
        return word
    w = word

    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]

    # step 1b
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    else:
        flag = False
        if w.endswith("ed") and _has_vowel(w[:-2]):
            w, flag = w[:-2], True
        elif w.endswith("ing") and _has_vowel(w[:-3]):
            w, flag = w[:-3], True
        if flag:
            if w.endswith(("at", "bl", "iz")):
                w += "e"
            elif _ends_double_consonant(w) and not w.endswith(("l", "s", "z")):
                w = w[:-1]
            elif _measure(w) == 1 and _cvc(w):
                w += "e"

    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # step 2
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
        ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
        ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 3
    for suf, rep in (
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # step 4
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ):
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 1:
                w = w[: -len(suf)]
            break
    else:
        if w.endswith("ion") and len(w) > 3 and w[-4] in "st":
            if _measure(w[:-3]) > 1:
                w = w[:-3]

    # step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # step 5b
    if _measure(w) > 1 and _ends_double_consonant(w) and w.endswith("l"):
        w = w[:-1]
    return w


class Analyzer:
    """Named, pluggable analyzer. 'simple' = the v1 tokenizer; 'english' =
    tokenizer + snowball stopwords + Porter stemming. The same object (by
    name) must be used for indexing, querying, and oracles — the manifest
    records the name, and get_analyzer() resolves it at query time."""

    def __init__(self, name: str = "simple"):
        if name not in ("simple", "english"):
            raise ValueError(f"unknown analyzer: {name}")
        self.name = name
        self._memo: dict[str, str] = {}

    def _stem(self, tok: str) -> str:
        out = self._memo.get(tok)
        if out is None:
            if len(self._memo) >= 1_000_000:  # vocab blow-out guard
                self._memo.clear()
            out = porter_stem(tok)
            self._memo[tok] = out
        return out

    def tokenize_py(self, text: str | None) -> list[str]:
        toks = tokenize_py(text)
        if self.name == "simple":
            return toks
        return [self._stem(t) for t in toks if t not in ENGLISH_STOPWORDS]

    def tokenize_pandas(self, texts: pd.Series) -> pd.Series:
        if self.name == "simple":
            return tokenize_pandas(texts)
        # Zipfian vocab → the memo makes per-token stemming amortized O(1);
        # the token extraction itself stays vectorized
        return tokenize_pandas(texts).map(
            lambda toks: [
                self._stem(t) for t in toks if t not in ENGLISH_STOPWORDS
            ]
        )

    def analyze_query(self, query_text: str) -> list[str]:
        return sorted(set(self.tokenize_py(query_text)))


_ANALYZERS: dict[str, Analyzer] = {}


def get_analyzer(name: str = "simple") -> Analyzer:
    a = _ANALYZERS.get(name)
    if a is None:
        a = _ANALYZERS[name] = Analyzer(name)
    return a
