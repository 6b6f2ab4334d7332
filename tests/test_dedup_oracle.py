"""Independent pure-Python oracles for the approximate dedup operators.

The driver records MinHash-LSH and SimHash as rows-only (`no_oracle`) because
their hash families aren't expressible in DuckDB SQL. These tests close that
verification gap with from-scratch CPython reimplementations (plain ints, no
numpy vectorization, XXH64 from the public spec) checked against the Spark
operators on the real sf0.001 documents table:

- MinHash: per-doc signatures, banded buckets, candidate pair set and
  estimated Jaccard must match minhash_lsh_pairs exactly.
- SimHash: 64-bit fingerprints must match simhash_fingerprints exactly,
  including the two's-complement bit-63 behavior of Spark's shiftleft.
"""

from __future__ import annotations

import hashlib
import os

import pandas as pd
import pytest

from discogsography_spark.analysis import tokenize_py
from discogsography_spark.operators.dedup import (
    _minhash_seeds,
    hash_shingle,
    minhash_lsh_pairs,
    minhash_signatures,
    simhash_fingerprints,
)

SF_DIR = "/root/testdata/sf0.001"

M64 = (1 << 64) - 1


# ---------------------------------------------------------------- xxh64
# Pure-Python XXH64 (public algorithm, https://xxhash.com spec) — Spark's
# F.xxhash64(string) hashes the UTF-8 bytes with seed 42.

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & M64
    acc = _rotl(acc, 31)
    return (acc * _P1) & M64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & M64


def xxh64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & M64
        v2 = (seed + _P2) & M64
        v3 = seed
        v4 = (seed - _P1) & M64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & M64
    h = (h + n) & M64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & M64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & M64
        h = (_rotl(h, 23) * _P2 + _P3) & M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & M64
        h = (_rotl(h, 11) * _P1) & M64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & M64
    h ^= h >> 29
    h = (h * _P3) & M64
    h ^= h >> 32
    return h


def _signed64(u: int) -> int:
    return u - (1 << 64) if u & (1 << 63) else u


# ---------------------------------------------------------------- oracles


def _splitmix64_py(x: int) -> int:
    x = (x + 0x9E3779B97F4A7C15) & M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & M64
    return x ^ (x >> 31)


def py_minhash_signature(text: str, seeds: list[int], n: int = 3) -> list[int] | None:
    toks = tokenize_py(text)
    if len(toks) < n:
        return None
    shingles = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    hvs = [hash_shingle(s) & M64 for s in shingles]
    sig = []
    for seed in seeds:
        m = min(_splitmix64_py(h ^ seed) for h in hvs)
        sig.append(m >> 1)  # stays in signed-long range
    return sig


def py_minhash_pairs(
    docs: list[tuple[int, str]],
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.2,
    n: int = 2,
    seed: int = 42,
) -> dict[tuple[int, int], float]:
    seeds = [int(s) for s in _minhash_seeds(num_hashes, seed)]
    rows_per_band = num_hashes // bands
    sigs = {}
    buckets: dict[tuple[int, str], list[int]] = {}
    for doc_id, text in docs:
        sig = py_minhash_signature(text, seeds, n)
        if sig is None:
            continue
        sigs[doc_id] = sig
        for b in range(bands):
            chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
            h = hashlib.sha256(",".join(str(v) for v in chunk).encode()).hexdigest()
            buckets.setdefault((b, h), []).append(doc_id)
    pairs: dict[tuple[int, int], float] = {}
    for ids in buckets.values():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                key = (ids[i], ids[j])
                if key in pairs:
                    continue
                sa, sb = sigs[key[0]], sigs[key[1]]
                est = round(sum(x == y for x, y in zip(sa, sb)) / num_hashes, 6)
                if est >= threshold:
                    pairs[key] = est
    return pairs


def py_simhash(text: str) -> int | None:
    toks = tokenize_py(text)
    if not toks:
        return None
    tf: dict[str, int] = {}
    for t in toks:
        tf[t] = tf.get(t, 0) + 1
    votes = [0] * 64
    for tok, c in tf.items():
        h = xxh64(tok.encode("utf-8"), seed=42)
        for i in range(64):
            votes[i] += c if (h >> i) & 1 else -c
    u = 0
    for i in range(64):
        if votes[i] > 0:
            u |= 1 << i
    return _signed64(u)


# ---------------------------------------------------------------- tests


@pytest.fixture(scope="module")
def docs_pdf() -> pd.DataFrame:
    return pd.read_parquet(os.path.join(SF_DIR, "documents.parquet"))[
        ["doc_id", "text"]
    ]


def test_xxh64_matches_spark(spark):
    samples = ["", "a", "spark", "hello world", "0123456789abcdef0123456789abcdef-long"]
    sdf = spark.createDataFrame([(s,) for s in samples], ["s"])
    from pyspark.sql import functions as F

    got = {r["s"]: r["h"] for r in sdf.select("s", F.xxhash64("s").alias("h")).collect()}
    for s in samples:
        assert got[s] == _signed64(xxh64(s.encode("utf-8"), seed=42)), s


def test_minhash_signatures_match_oracle(spark, docs_pdf):
    num_hashes, n, seed = 32, 2, 42
    sdf = spark.createDataFrame(docs_pdf)
    got = {
        int(r["doc_id"]): list(r["sig"])
        for r in minhash_signatures(sdf, num_hashes=num_hashes, n=n, seed=seed).collect()
    }
    seeds = [int(s) for s in _minhash_seeds(num_hashes, seed)]
    n_checked = 0
    for doc_id, text in zip(docs_pdf["doc_id"], docs_pdf["text"]):
        want = py_minhash_signature(text, seeds, n)
        if want is None:
            assert int(doc_id) not in got
            continue
        assert got[int(doc_id)] == want, doc_id
        n_checked += 1
    assert n_checked > 100  # the table genuinely exercises the operator


def test_minhash_lsh_pairs_match_oracle(spark, docs_pdf):
    # same parameters as the graded __spark_entry__ dedup_minhash_lsh query
    kw = dict(num_hashes=32, bands=8, threshold=0.2, n=2, seed=42)
    sdf = spark.createDataFrame(docs_pdf)
    got = {
        (int(r["doc_a"]), int(r["doc_b"])): float(r["est_jaccard"])
        for r in minhash_lsh_pairs(sdf, **kw).collect()
    }
    want = py_minhash_pairs(
        list(zip(docs_pdf["doc_id"].astype(int), docs_pdf["text"])), **kw
    )
    assert got == want
    assert len(want) > 0  # the corpus plants real near-dups


def test_simhash_fingerprints_match_oracle(spark, docs_pdf):
    sdf = spark.createDataFrame(docs_pdf)
    got = {
        int(r["doc_id"]): int(r["simhash"])
        for r in simhash_fingerprints(sdf).collect()
    }
    n_checked = 0
    for doc_id, text in zip(docs_pdf["doc_id"], docs_pdf["text"]):
        want = py_simhash(text)
        if want is None:
            assert int(doc_id) not in got
            continue
        assert got[int(doc_id)] == want, doc_id
        n_checked += 1
    assert n_checked > 100


def test_simhash_near_pairs_match_bruteforce(spark, docs_pdf):
    """Banded-Hamming expansion == exhaustive O(n^2) Hamming over the
    spec-faithful fingerprints (pigeonhole recall is EXACT for
    bands = max_hamming + 1), and it strictly extends equal-fingerprint
    grouping with Hamming ≥ 1 near-dups."""
    from discogsography_spark.operators.dedup import simhash_near_pairs

    max_h = 3
    sdf = spark.createDataFrame(docs_pdf)
    got = {
        (int(r["doc_a"]), int(r["doc_b"])): int(r["hamming"])
        for r in simhash_near_pairs(sdf, max_hamming=max_h).collect()
    }
    fps = {
        int(d): py_simhash(t)
        for d, t in zip(docs_pdf["doc_id"].astype(int), docs_pdf["text"])
        if py_simhash(t) is not None
    }
    ids = sorted(fps)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin((fps[a] ^ fps[b]) & ((1 << 64) - 1)).count("1")
            if h <= max_h:
                want[(a, b)] = h
    assert got == want
    near = {p for p, h in want.items() if h >= 1}
    assert len(near) > 0, "corpus must plant Hamming>=1 near-dups"


def test_simhash_near_pairs_planted_hamming2(spark):
    """A planted Hamming-2 pair that equal-fingerprint grouping misses is
    found by the banded expansion (the VERDICT acceptance case)."""
    from discogsography_spark.operators.dedup import (
        simhash_dup_groups,
        simhash_near_pairs,
    )

    # long base → per-bit votes are large, so a one-token mutation flips
    # only the near-tied bits ("query" lands at Hamming 2 on this base)
    words = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango "
        "uniform victor whiskey xray yankee zulu"
    ).split()
    base = " ".join((words * 8)[:180])
    rows = [
        (0, base),
        (1, base + " query"),            # small perturbation → Hamming 1-3
        (2, "totally different words about cooking pasta tonight"),
        (3, base),                       # exact dup of 0 → Hamming 0
    ]
    sdf = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = {r["doc_id"]: r["simhash"] for r in
           __import__("discogsography_spark.operators.dedup", fromlist=["x"])
           .simhash_fingerprints(sdf).collect()}
    h01 = bin((fps[0] ^ fps[1]) & ((1 << 64) - 1)).count("1")
    assert 1 <= h01 <= 3, f"fixture drift: planted pair at Hamming {h01}"
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in simhash_near_pairs(sdf, max_hamming=3).collect()}
    assert pairs[(0, 1)] == h01 and pairs[(0, 3)] == 0
    # equal-fingerprint grouping sees only the exact dup
    groups = simhash_dup_groups(sdf).collect()
    grouped = {tuple(g["doc_ids"]) for g in groups}
    assert (0, 3) in grouped and not any(1 in g for g in grouped)


def test_minhash_hot_bucket_cap(spark):
    """A planted pathological bucket (many near-identical docs collapsing
    into one band bucket) goes quadratic without the cap; with
    max_bucket set, the degenerate bucket is skipped (documented recall
    trade) while pairs outside it survive — the simhash_near_pairs knob
    ported to the MinHash path."""
    from discogsography_spark.operators.dedup import minhash_lsh_pairs

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6
    rows = [(i, base) for i in range(30)]  # 30 identical docs: one bucket
    rows += [
        (100, "unrelated text about cooking pasta dinner tonight folks yes"),
        (101, "unrelated text about cooking pasta dinner tonight folks yes"),
    ]
    sdf = spark.createDataFrame(rows, ["doc_id", "text"])
    uncapped = minhash_lsh_pairs(
        sdf, num_hashes=32, bands=8, threshold=0.5, n=3
    ).collect()
    got = {(r["doc_a"], r["doc_b"]) for r in uncapped}
    assert (100, 101) in got
    n_planted = sum(1 for a, b in got if a < 100 and b < 100)
    assert n_planted == 30 * 29 // 2  # quadratic inside the hot bucket

    capped = minhash_lsh_pairs(
        sdf, num_hashes=32, bands=8, threshold=0.5, n=3, max_bucket=10
    ).collect()
    got_c = {(r["doc_a"], r["doc_b"]) for r in capped}
    assert (100, 101) in got_c  # small buckets untouched
    assert not any(a < 100 and b < 100 for a, b in got_c)  # hot bucket skipped
