"""Stupid-backoff n-gram LM scoring vs a brute-force Python oracle."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest

from discogsography_spark.operators.lm import (
    BACKOFF,
    lm_cross_entropy,
    train_ngram_lm,
)

_TOK = re.compile(r"[a-z0-9]+")


def _naive(train_texts, score_rows):
    uni = Counter()
    big = Counter()
    for t in train_texts:
        ws = _TOK.findall((t or "").lower())
        uni.update(ws)
        big.update(zip(ws, ws[1:]))
    n = sum(uni.values())
    v = len(uni)
    oov = 1.0 / (n + v)

    def p_uni(w):
        return uni[w] / n if w in uni else oov

    out = {}
    for doc_id, text in score_rows:
        ws = _TOK.findall((text or "").lower())
        if not ws:
            continue
        total = 0.0
        prev = None
        for w in ws:
            if prev is not None and (prev, w) in big:
                p = big[(prev, w)] / uni[prev]
            elif prev is None:
                p = p_uni(w)
            else:
                p = BACKOFF * p_uni(w)
            total = total + (-math.log2(p))
            prev = w
        out[doc_id] = (len(ws), round(total / len(ws), 6))
    return out


def test_lm_matches_naive(spark):
    rows = [
        (0, "spark builds an index and the index serves queries"),
        (1, "spark spark spark"),
        (2, "totally unseen zebra words here"),
        (3, ""),
        (4, None),
        (5, "the index serves"),
    ]
    train = [t for _, t in rows]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    lm = train_ngram_lm(docs)
    got = {
        r["doc_id"]: (r["n_scored_tokens"], r["cross_entropy"])
        for r in lm_cross_entropy(docs, lm).collect()
    }
    want = _naive(train, rows)
    assert got == want
    assert 3 not in got and 4 not in got  # empty docs dropped


def test_lm_scores_fresh_docs_with_oov(spark):
    train_docs = spark.createDataFrame(
        [(0, "alpha beta gamma alpha beta")], "doc_id long, text string"
    )
    lm = train_ngram_lm(train_docs)
    fresh = [(10, "alpha beta zzz"), (11, "zzz yyy")]
    got = {
        r["doc_id"]: (r["n_scored_tokens"], r["cross_entropy"])
        for r in lm_cross_entropy(
            spark.createDataFrame(fresh, "doc_id long, text string"), lm
        ).collect()
    }
    want = _naive(["alpha beta gamma alpha beta"], fresh)
    assert got == want
    # OOV-heavy doc scores strictly worse (higher entropy)
    assert got[11][1] > got[10][1]


def test_lm_min_count_prunes_bigrams(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b c d")], "doc_id long, text string"
    )
    lm = train_ngram_lm(docs, min_count=2)
    kept = {(r["w1"], r["w2"]) for r in lm.bigrams.collect()}
    assert kept == {("a", "b")}  # only the repeated bigram survives
