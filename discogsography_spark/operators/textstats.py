"""Text-analysis operators over a documents table (doc_id, text, ...).

All operators are pure native-expression DataFrame transforms (whole-stage
codegen; zero Python in the hot path) so they hold at 100 TB: one scan, no
shuffle, filters/projections pushed to parquet.

Reference parity: quality-rule predicates (Range/Required/Regex/Length,
/root/reference/extractor/src/rules.rs:79-126), content hashing
(/root/reference/extractor/src/types.rs:163-168), entropy analytics
(/root/reference/api/queries/user_queries.py:284-294).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from discogsography_spark.analysis import TOKEN_PATTERN

# tiny per-language stopword marker sets for the n-gram/stopword heuristic
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von"],
    "fr": ["le", "la", "les", "et", "est", "une", "pour", "dans", "que"],
    "es": ["el", "los", "las", "es", "una", "por", "para", "con", "del"],
}


def tokens_col(col: str = "text") -> Column:
    return F.expr(
        f"regexp_extract_all(lower(coalesce({col}, '')), '{TOKEN_PATTERN}', 0)"
    )


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace+regex token counting (BPE-ish approximation: word tokens
    plus a count of non-word symbol runs)."""
    word_tokens = F.size(tokens_col(text_col))
    symbol_runs = F.size(
        F.expr(f"regexp_extract_all(coalesce({text_col}, ''), '[^a-zA-Z0-9\\\\s]+', 0)")
    )
    return df.withColumn("n_word_tokens", word_tokens).withColumn(
        "n_tokens_bpeish", word_tokens + symbol_runs
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality signals plus a composite
    [0,1] score — the weighted-composite pattern of
    /root/reference/api/queries/rarity_queries.py:28-35,161-166."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(t)
    toks = tokens_col(text_col)
    n_toks = F.size(toks)
    stop = F.array([F.lit(w) for w in _LANG_MARKERS["en"]])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), stop))
    punct = F.length(F.regexp_replace(t, "[a-zA-Z0-9\\s]", ""))
    punct_ratio = F.when(n_chars > 0, punct / n_chars).otherwise(F.lit(0.0))
    mean_wlen = F.when(n_toks > 0, n_chars / n_toks).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_toks > 0, n_stop / F.lit(10.0)).otherwise(F.lit(0.0))
    len_ok = F.when((n_toks >= 5) & (n_toks <= 5000), F.lit(1.0)).otherwise(F.lit(0.0))
    wlen_ok = F.when((mean_wlen >= 3.0) & (mean_wlen <= 12.0), F.lit(1.0)).otherwise(
        F.lit(0.0)
    )
    punct_ok = F.when(punct_ratio <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    composite = F.round(
        0.3 * len_ok + 0.2 * wlen_ok + 0.2 * punct_ok + 0.3 * F.least(stop_ratio, F.lit(1.0)),
        6,
    )
    return (
        df.withColumn("n_chars_q", n_chars.cast("long"))
        .withColumn("n_tokens_q", n_toks.cast("long"))
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn("quality", composite)
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language-ID heuristic: score each language by the number
    of its marker stopwords present; pick argmax (tie → 'und'). Pure
    expressions — a real n-gram model would be a broadcast-joined lookup."""
    toks = F.array_distinct(tokens_col(text_col))
    scores = []
    for lang, markers in sorted(_LANG_MARKERS.items()):
        arr = F.array([F.lit(w) for w in markers])
        scores.append(
            F.struct(
                F.size(F.array_intersect(toks, arr)).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        "lang_pred",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints: SHA-256 content hash (the reference's identity
    hash, /root/reference/extractor/src/types.rs:163-168) and a normalized
    fingerprint hashing the sorted distinct token set (case/punct-insensitive
    near-identity)."""
    toks = tokens_col(text_col)
    return df.withColumn(
        "content_sha256", F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256)
    ).withColumn(
        "token_fingerprint",
        F.sha2(F.array_join(F.array_sort(F.array_distinct(toks)), " "), 256),
    )
