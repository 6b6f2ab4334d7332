"""Byte-pair-encoding tokenizer: distributed training + Arrow-batched encode.

Upgrades `operators/textstats.token_count`'s "BPE-ish" approximation to the
real algorithm (Sennrich, Haddow & Birch 2016, "Neural Machine Translation
of Rare Words with Subword Units" — public pseudocode), with the work split
the way a 100 TB corpus demands:

- **word_frequencies** — the corpus-scale pass. One scan + explode +
  map-side-combined groupBy; output size is the VOCABULARY (millions), not
  the corpus (trillions). `max_words` caps the table at the most frequent
  words (ties broken lexicographically — deterministic), which is the
  standard trainer behavior: tail hapaxes contribute nothing to merges.
- **train_bpe** — the vocab-scale loop. BPE merge selection is inherently
  sequential (merge i+1's counts depend on merge i), so iterating it as
  Spark jobs would be `num_merges` shuffles over a table that already fits
  in memory; instead the driver trains over the bounded word-frequency
  table with incrementally-updated pair counts (only words containing the
  merged pair are touched). Deterministic: best pair by
  (count DESC, pair lexicographic ASC).
- **bpe_encode_col / bpe_token_count** — the corpus-scale encode.
  mapInPandas with the merge ranks broadcast in the closure; per batch the
  UNIQUE analyzer words are encoded once (GPT-2-style lowest-rank-first
  greedy merge) and the result is mapped back — Zipf repetition makes the
  memo hit rate extreme. No per-row Python UDF; Arrow batches throughout.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from discogsography_spark.operators.textstats import tokens_col

_EOW = "</w>"  # end-of-word symbol, per the published algorithm


def word_frequencies(
    docs: DataFrame, text_col: str = "text", max_words: int = 200_000
) -> list[tuple[str, int]]:
    """Distributed (word, count) table over the analyzer's word tokens,
    capped at the `max_words` most frequent (count DESC, word ASC).
    The ONLY corpus-sized stage of BPE training."""
    wc = (
        docs.select(F.explode(tokens_col(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), F.asc("w"))
        .limit(max_words)
    )
    return [(r["w"], int(r["c"])) for r in wc.collect()]


def train_bpe(
    word_counts: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str]]:
    """Learn `num_merges` merges from a word-frequency table (driver-local:
    the table is vocab-sized by construction). Returns the ordered merge
    list [(left, right), ...]."""
    # word id → (symbol tuple, count); identical words already aggregated
    words: list[list[str]] = []
    counts: list[int] = []
    for w, c in word_counts:
        if not w:
            continue
        words.append(list(w) + [_EOW])
        counts.append(c)

    # pair → total count, pair → {word ids containing it}
    pair_count: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(words):
        c = counts[i]
        for a, b in zip(syms, syms[1:]):
            pair_count[(a, b)] = pair_count.get((a, b), 0) + c
            pair_words.setdefault((a, b), set()).add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_count:
            break
        # deterministic argmax: count DESC, pair lexicographic ASC
        best = min(pair_count.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_count[best] < 2:
            break  # merging hapax pairs memorizes the corpus — stop, as the
            # published trainer does with its min-frequency threshold
        merges.append(best)
        merged = best[0] + best[1]
        # touch ONLY the words that contain the merged pair
        for i in list(pair_words.get(best, ())):
            syms, c = words[i], counts[i]
            for a, b in zip(syms, syms[1:]):
                p = (a, b)
                pair_count[p] -= c
                if pair_count[p] <= 0:
                    pair_count.pop(p, None)
                    pair_words.pop(p, None)
                else:
                    s = pair_words.get(p)
                    if s is not None:
                        s.discard(i)
            out: list[str] = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == best[0] and syms[j + 1] == best[1]:
                    out.append(merged)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            for a, b in zip(out, out[1:]):
                pair_count[(a, b)] = pair_count.get((a, b), 0) + c
                pair_words.setdefault((a, b), set()).add(i)
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge of one word (the GPT-2 encode shape,
    which reproduces the training merge order exactly)."""
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank = None
        best_idx = -1
        for j in range(len(syms) - 1):
            r = ranks.get((syms[j], syms[j + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_idx = r, j
        if best_rank is None:
            break
        syms[best_idx : best_idx + 2] = [syms[best_idx] + syms[best_idx + 1]]
    return syms


def bpe_encode_col(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """docs + an array<string> column of BPE subword tokens. Arrow-batched;
    per batch each UNIQUE word is encoded once and broadcast-mapped back."""
    ranks = {p: i for i, p in enumerate(merges)}
    fields = docs.schema.fields + [
        T.StructField(out_col, T.ArrayType(T.StringType()))
    ]
    schema = T.StructType(fields)
    tokenized = docs.withColumn("_words", tokens_col(text_col))

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, list[str]] = {}

        def word_tokens(w: str) -> list[str]:
            hit = memo.get(w)
            if hit is None:
                hit = memo[w] = encode_word(w, ranks)
            return hit

        for pdf in batches:
            out = pdf.drop(columns=["_words"]).copy()
            out[out_col] = [
                [t for w in ws for t in word_tokens(w)] for ws in pdf["_words"]
            ]
            yield out

    return tokenized.mapInPandas(enc, schema=schema)


def bpe_token_count(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_token_count",
) -> DataFrame:
    """docs + exact learned-subword token count — the real version of
    textstats' regex approximation (what a token-budgeted pretraining mix
    actually budgets by)."""
    enc = bpe_encode_col(docs, merges, text_col=text_col, out_col="_bpe")
    return enc.withColumn(out_col, F.size("_bpe")).drop("_bpe")
