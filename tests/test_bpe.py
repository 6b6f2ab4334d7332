"""BPE trainer + encoder vs a naive reference implementation of the
published algorithm (recompute-everything training, apply-merges-in-order
encoding)."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from discogsography_spark.operators.bpe import (
    bpe_encode_col,
    bpe_token_count,
    encode_word,
    train_bpe,
    word_frequencies,
)

_EOW = "</w>"


# ---------- naive reference (independent of the implementation) ----------

def naive_train(word_counts, num_merges):
    vocab = {tuple(w) + (_EOW,): c for w, c in word_counts if w}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        new_vocab = {}
        for syms, c in vocab.items():
            out, j = [], 0
            while j < len(syms):
                if j + 1 < len(syms) and (syms[j], syms[j + 1]) == best:
                    out.append(syms[j] + syms[j + 1])
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def naive_encode(word, merges):
    syms = list(word) + [_EOW]
    for a, b in merges:
        out, j = [], 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                out.append(a + b)
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


_WORDS = [
    ("lower", 5), ("low", 7), ("lowest", 2), ("newer", 6), ("new", 4),
    ("wider", 3), ("widest", 2), ("slow", 3), ("slower", 2), ("aaa", 4),
    ("aaaa", 2), ("banana", 3),
]


def test_train_matches_naive():
    assert train_bpe(_WORDS, 30) == naive_train(_WORDS, 30)


def test_encode_matches_naive_and_training_segmentation():
    merges = train_bpe(_WORDS, 25)
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in _WORDS + [("unseenword", 0), ("z", 0), ("lowlow", 0)]:
        assert encode_word(w, ranks) == naive_encode(w, merges), w


def test_encode_unseen_chars_fall_back():
    merges = train_bpe(_WORDS, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    got = encode_word("xyz", ranks)
    assert "".join(got) == "xyz" + _EOW  # lossless


def test_hapax_pair_stop():
    # all pair counts 1 → no merges learned
    assert train_bpe([("abc", 1)], 10) == []


# ---------- Spark-side ----------

def test_word_frequencies_and_cap(spark):
    docs = spark.createDataFrame(
        [(0, "spark spark index"), (1, "spark index merge")],
        "doc_id long, text string",
    )
    wf = word_frequencies(docs)
    assert wf[0] == ("spark", 3)
    assert dict(wf)["index"] == 2
    assert word_frequencies(docs, max_words=1) == [("spark", 3)]


def test_bpe_token_count_matches_naive(spark):
    rows = [
        (0, "lower and lower the new slow banana"),
        (1, "the widest newer banana is slower"),
        (2, ""),
        (3, None),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    wf = word_frequencies(docs)
    merges = train_bpe(wf, 20)
    got = {
        r["doc_id"]: r["bpe_token_count"]
        for r in bpe_token_count(docs, merges).collect()
    }
    for doc_id, text in rows:
        words = re.findall(r"[a-z0-9]+", (text or "").lower())
        want = sum(len(naive_encode(w, merges)) for w in words)
        assert got[doc_id] == want, doc_id

    enc = bpe_encode_col(docs, merges).collect()
    by_id = {r["doc_id"]: r["bpe_tokens"] for r in enc}
    assert by_id[2] == [] and by_id[3] == []
    # schema passthrough: original columns survive
    assert {f.name for f in bpe_encode_col(docs, merges).schema.fields} == {
        "doc_id", "text", "bpe_tokens",
    }
