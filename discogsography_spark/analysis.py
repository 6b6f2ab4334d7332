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
