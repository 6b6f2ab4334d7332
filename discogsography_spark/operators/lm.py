"""N-gram language-model quality scoring (the CCNet/KenLM-perplexity stage).

Large-scale pretraining pipelines filter documents by cross-entropy under a
small n-gram LM trained on a trusted corpus (CCNet does it with KenLM). This
is that stage in Spark-native form, with the public "stupid backoff" scoring
rule (Brants et al. 2007, "Large Language Models in Machine Translation" —
the standard web-scale simplification: no discounting, a fixed backoff
multiplier, probabilities need not normalize):

    p(w2 | w1) = c(w1 w2) / c(w1)          if the bigram was seen
               = 0.4 * p_uni(w2)           otherwise
    p_uni(w)   = c(w) / N                  if the unigram was seen
               = 1 / (N + V)               for OOV

Training = two groupBy counts over the corpus (map-side combined; the
output is vocabulary-sized, prunable with min_count). Scoring = native
bigram extraction (arrays_zip over slices — no Python), LEFT JOINs against
the model tables (AQE broadcasts them when min_count pruning keeps them
small — the typical shape; an unpruned web-scale vocabulary falls back to
a shuffle join instead of a forced-broadcast driver OOM), and
a POSITION-ORDERED per-doc log-sum (F.aggregate over array_sort by pos) so
the float64 total is bit-identical on every engine — the same determinism
discipline as the BM25 entries.

Everything is DataFrame-native; the only Python is this module's plan
construction.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from discogsography_spark.operators.textstats import tokens_col

BACKOFF = 0.4  # the published stupid-backoff constant


@dataclass
class NgramLM:
    unigrams: DataFrame  # (w, c)
    bigrams: DataFrame  # (w1, w2, c)
    n_tokens: int
    vocab_size: int


def train_ngram_lm(
    docs: DataFrame, text_col: str = "text", min_count: int = 1
) -> NgramLM:
    """Unigram + bigram count tables from one tokenized pass each.
    `min_count` prunes the bigram tail (the standard size lever; pruned
    bigrams back off to unigrams, exactly as unseen ones do)."""
    toks = docs.select(tokens_col(text_col).alias("_t"))
    uni = (
        toks.select(F.explode("_t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    big = (
        toks.select(
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("_t"), 1, F.greatest(F.size("_t") - 1, F.lit(0))),
                    F.expr("slice(_t, 2, greatest(size(_t) - 1, 0))"),
                )
            ).alias("bg")
        )
        .select(F.col("bg.`0`").alias("w1"), F.col("bg.`1`").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= min_count)
    )
    stats = uni.agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("n"), F.count("*").alias("v")
    ).first()
    return NgramLM(
        unigrams=uni,
        bigrams=big,
        n_tokens=int(stats["n"]),
        vocab_size=int(stats["v"]),
    )


def lm_cross_entropy(
    docs: DataFrame,
    lm: NgramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "cross_entropy",
    round_dp: int = 6,
) -> DataFrame:
    """(id, n_scored_tokens, cross_entropy): average -log2 p per token under
    stupid backoff; the first token scores with p_uni. Docs with no tokens
    are dropped (no defined entropy). Rounded to `round_dp` for the
    cross-engine comparison contract."""
    n, v = float(lm.n_tokens), float(lm.vocab_size)
    if n <= 0:
        raise ValueError("empty language model")
    oov = 1.0 / (n + v)

    toks = docs.select(F.col(id_col).alias("_id"), tokens_col(text_col).alias("_t"))
    toks = toks.filter(F.size("_t") > 0)
    pairs = toks.select(
        "_id",
        F.posexplode(
            F.arrays_zip(
                F.expr("concat(array(cast(null as string)), slice(_t, 1, greatest(size(_t) - 1, 0)))"),
                F.col("_t"),
            )
        ).alias("pos", "bg"),
    ).select(
        "_id", "pos", F.col("bg.`0`").alias("w1"), F.col("bg._t").alias("w2")
    )

    uni2 = lm.unigrams.select(F.col("w").alias("w2"), F.col("c").alias("c_uni"))
    uni1 = lm.unigrams.select(F.col("w").alias("w1"), F.col("c").alias("c_prev"))
    big = lm.bigrams.select("w1", "w2", F.col("c").alias("c_big"))

    p_uni = F.when(
        F.col("c_uni").isNotNull(), F.col("c_uni").cast("double") / F.lit(n)
    ).otherwise(F.lit(oov))
    p = F.when(
        F.col("c_big").isNotNull() & F.col("c_prev").isNotNull(),
        F.col("c_big").cast("double") / F.col("c_prev").cast("double"),
    ).otherwise(
        F.when(F.col("w1").isNull(), p_uni).otherwise(F.lit(BACKOFF) * p_uni)
    )
    # no broadcast hints: a min_count-pruned model is MBs and AQE
    # broadcasts it on its own; an unpruned vocabulary over a web-scale
    # corpus can exceed any broadcast limit, and a forced hint would then
    # OOM the driver instead of falling back to a shuffle join
    scored = (
        pairs.join(uni2, "w2", "left")
        .join(uni1, "w1", "left")
        .join(big, ["w1", "w2"], "left")
        .withColumn("_logp", -F.log2(p))
    )
    return (
        scored.groupBy("_id")
        .agg(
            F.count("*").alias("n_scored_tokens"),
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("pos", "_logp"))),
                F.lit(0.0),
                lambda acc, x: acc + x["_logp"],
            ).alias("_total"),
        )
        .select(
            F.col("_id").alias(id_col),
            F.col("n_scored_tokens").cast("long").alias("n_scored_tokens"),
            F.round(
                F.col("_total") / F.col("n_scored_tokens"), round_dp
            ).alias(out_col),
        )
    )
