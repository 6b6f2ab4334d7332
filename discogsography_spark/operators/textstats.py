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
    "it": ["il", "gli", "che", "di", "non", "sono", "per", "con", "della"],
    "pt": ["o", "os", "das", "em", "um", "uma", "para", "com", "não"],
    "nl": ["de", "het", "een", "van", "en", "dat", "niet", "zijn", "voor"],
}

# script-range detectors (checked BEFORE the Latin stopword vote): languages
# whose writing system identifies them far more reliably than any stopword
# list. Priority ladder resolves mixed scripts (kana ⇒ ja even when han
# chars are present; han without kana ⇒ zh). Patterns are plain char-class
# ranges valid in both Java regex (Spark) and RE2 (DuckDB oracle mirrors).
_SCRIPT_LADDER: list[tuple[str, str]] = [
    ("ko", f"[{chr(0xAC00)}-{chr(0xD7AF)}]"),  # hangul syllables
    ("ja", f"[{chr(0x3040)}-{chr(0x30FF)}]"),  # hiragana + katakana
    ("zh", f"[{chr(0x4E00)}-{chr(0x9FFF)}]"),  # CJK unified ideographs
    ("ru", f"[{chr(0x0400)}-{chr(0x04FF)}]"),  # cyrillic
    ("ar", f"[{chr(0x0600)}-{chr(0x06FF)}]"),  # arabic
]
_SCRIPT_MIN_CHARS = 2  # one stray char (an emoji-adjacent symbol, a quoted
# name) must not override the stopword vote


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
    """Two-stage language-ID heuristic, all native expressions:

    1. SCRIPT detection — count chars in each non-Latin script range; the
       first ladder entry with ≥ _SCRIPT_MIN_CHARS wins (kana before han so
       Japanese text with kanji reads ja, not zh).
    2. Latin STOPWORD vote — number of a language's marker stopwords present
       among the distinct tokens; argmax, ties → larger struct (lang DESC
       inside array_max) and zero hits → 'und'.

    A real system would swap stage 2 for a broadcast-joined char-n-gram
    profile model; the operator shape (pure expressions, no Python in the
    row path) is the part that carries to 100 TB."""
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
    pred = F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
    for lang, pattern in reversed(_SCRIPT_LADDER):
        n = F.size(
            F.expr(
                f"regexp_extract_all(coalesce({text_col}, ''), '{pattern}', 0)"
            )
        )
        pred = F.when(n >= _SCRIPT_MIN_CHARS, F.lit(lang)).otherwise(pred)
    return df.withColumn("lang_pred", pred)


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


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    "Scaling Language Models" §A1.1 — the published repetition filters,
    adapted from character- to token-fractions for tokenizer neutrality):

    - word_rep_ratio        1 − distinct/total tokens
    - mean_word_len         average token length
    - frac_top_bigram       tokens covered by the single most frequent
                            bigram (min(1, 2 · max count / n_tokens) —
                            overlapping occurrences make the raw product an
                            upper bound, so it is clamped)
    - frac_dup_trigram      tokens covered by trigrams occurring ≥ 2 times
                            (min(1, 3 · Σ counts≥2 / n_tokens), same clamp)

    word_rep/mean_word_len are per-row native expressions; the n-gram
    counters are explode → (doc, gram) groupBy — map-side combined, one
    shuffle keyed by (doc, gram), NO per-doc quadratic work (a transform/
    filter-in-place counter would be O(len²) per document — fatal on long
    docs at corpus scale). Fractions are ratios of per-doc integers, so
    they are bit-identical in any engine. Docs without tokens are dropped.
    """
    toks = df.select(F.col(id_col).alias("_id"), tokens_col(text_col).alias("_t"))
    base = toks.filter(F.size("_t") > 0).select(
        "_id",
        F.size("_t").alias("n_tok"),
        (1.0 - F.size(F.array_distinct("_t")) / F.size("_t")).alias(
            "word_rep_ratio"
        ),
        (
            F.aggregate("_t", F.lit(0), lambda a, x: a + F.length(x))
            / F.size("_t")
        ).alias("mean_word_len"),
    )

    def grams(n: int):
        return F.expr(
            f"transform(sequence(1, size(_t) - {n - 1}), "
            f"i -> array_join(slice(_t, i, {n}), ' '))"
        )

    def gram_stats(n: int, top_alias: str, dup_alias: str):
        g = (
            toks.filter(F.size("_t") >= n)
            .select("_id", F.explode(grams(n)).alias("g"))
            .groupBy("_id", "g")
            .agg(F.count("*").alias("c"))
            .groupBy("_id")
            .agg(
                F.max("c").alias(top_alias),
                F.coalesce(
                    F.sum(F.when(F.col("c") >= 2, F.col("c"))), F.lit(0)
                ).alias(dup_alias),
            )
        )
        return g

    bi = gram_stats(2, "top2", "dup2")
    tri = gram_stats(3, "top3", "dup3")
    return (
        base.join(bi, "_id", "left")
        .join(tri, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.col("n_tok").cast("long").alias("n_tokens"),
            F.round("word_rep_ratio", 6).alias("word_rep_ratio"),
            F.round("mean_word_len", 6).alias("mean_word_len"),
            F.round(
                F.least(
                    F.lit(1.0),
                    F.coalesce(F.col("top2"), F.lit(0)) * 2 / F.col("n_tok"),
                ),
                6,
            ).alias("frac_top_bigram"),
            F.round(
                F.least(
                    F.lit(1.0),
                    F.coalesce(F.col("dup3"), F.lit(0)) * 3 / F.col("n_tok"),
                ),
                6,
            ).alias("frac_dup_trigram"),
        )
    )
