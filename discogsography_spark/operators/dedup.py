"""Deduplication operators over a documents table (doc_id, text).

Four tiers, each returning a DataFrame and designed for 100 TB scale:

- exact_dedup: SHA-256 hash groupBy — one shuffle on a 64-hex key, map-side
  combined. The reference's identity-hash skip
  (/root/reference/tableinator/batch_processor.py:453-479) as a corpus op.
- ngram_jaccard_pairs: shingle → explode → self-join on shingle → Jaccard
  from co-occurrence counts. Exact, but quadratic in bucket size; the
  frequent-shingle cap bounds the blowup (the reference's mega-genre cap
  discipline, /root/reference/api/queries/recommend_queries.py:160-191 — but
  lossy only for shingles shared by >max_df docs).
- minhash_lsh_pairs: MinHash signatures (vectorized pandas UDF over Arrow
  batches) → band buckets → bucket self-join → candidate pairs with estimated
  Jaccard; optional exact verify. Near-linear: the self-join key is
  (band, bucket-hash), so only probable near-dups ever meet in a shuffle.
- simhash: 64-bit SimHash fingerprint; near-dups = equal fingerprints or
  banded Hamming buckets.

Determinism: all hash families are seeded constants — same corpus → same
pairs at any parallelism.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from discogsography_spark.operators.textstats import tokens_col

# 64-bit FNV-ish mix constants for the MinHash permutation family
_MERSENNE = (1 << 61) - 1


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents: (content_sha256, n_dups, doc_ids
    sorted, keeper = min doc_id)."""
    return (
        df.withColumn("content_sha256", F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256))
        .groupBy("content_sha256")
        .agg(
            F.count("*").alias("n_dups"),
            F.sort_array(F.collect_list(F.col(id_col))).alias("doc_ids"),
            F.min(F.col(id_col)).alias("keeper"),
        )
        .filter(F.col("n_dups") > 1)
    )


def shingles_col(text_col: str = "text", n: int = 3):
    """Word n-gram shingles as an array column (native expressions).

    The token array MUST be let-bound (evaluated once per row): referencing
    the tokenize expression directly inside the transform lambda makes
    Catalyst re-evaluate the full regexp tokenize per ELEMENT — O(len²)
    tokenizes per document (measured: the sf0.25 pipeline decontaminate
    stage dropped 404 s → see BENCH/BASELINE.md round 5 after this bind)."""
    from discogsography_spark.query.dataframe_bm25 import _let

    return _let(
        tokens_col(text_col),
        lambda toks: F.array_distinct(
            F.filter(
                F.transform(
                    toks,
                    lambda _x, i: F.when(
                        i + n <= F.size(toks),
                        F.array_join(F.slice(toks, i + 1, n), " "),
                    ),
                ),
                lambda s: s.isNotNull(),
            )
        ),
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    max_shingle_df: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs above threshold.

    Plan: doc→shingles (one pass) → explode → drop shingles shared by more
    than max_shingle_df docs (skew cap; they carry almost no signal) →
    self-join on shingle → per-pair intersection count → Jaccard via
    |A∩B| / (|A|+|B|−|A∩B|).
    """
    sh = (
        df.select(F.col(id_col).alias("doc_id"), shingles_col(text_col, n).alias("sh"))
        .withColumn("n_sh", F.size("sh"))
        .filter(F.col("n_sh") > 0)
    )
    sizes = sh.select("doc_id", "n_sh")
    exploded = sh.select("doc_id", F.explode("sh").alias("shingle"))
    hot = (
        exploded.groupBy("shingle")
        .count()
        .filter(F.col("count") > max_shingle_df)
        .select("shingle")
    )
    # no broadcast hint: the >max_df shingle set is unbounded at corpus scale
    # (10^12 turns can push it past any broadcast limit) — let AQE pick
    # broadcast when it is actually small, shuffled anti-join otherwise
    pruned = exploded.join(hot, "shingle", "left_anti")
    a = pruned.alias("a")
    b = pruned.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        pairs.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "size_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "size_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("size_a") + F.col("size_b") - F.col("inter")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


def _minhash_seeds(num_hashes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(1, 2**63 - 1, num_hashes).astype(np.uint64)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer — a full-avalanche 64-bit permutation
    per seed, pure uint64 wraparound (no object-dtype bigint math)."""
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        x = ((x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)).astype(np.uint64)
        x = ((x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)).astype(np.uint64)
        return x ^ (x >> np.uint64(31))


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 64,
    n: int = 3,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, sig array<long>) MinHash signatures over word n-gram shingles.
    Shingle hashing + permutations are numpy-vectorized inside an Arrow
    mapInPandas — the engine's one sanctioned slow-path shape."""
    seeds = _minhash_seeds(num_hashes, seed)
    src = df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_text"))
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("sig", T.ArrayType(T.LongType()), False),
        ]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # tokenize + shingle + hash in ONE Arrow pass: nested higher-order
        # expressions (transform+slice per position) are ~100x slower JVM-side
        # for this shape than a vectorized pandas pass
        from discogsography_spark.analysis import tokenize_pandas

        for pdf in batches:
            toks_series = tokenize_pandas(pdf["_text"])
            ids, sigs = [], []
            for doc_id, toks in zip(pdf["doc_id"], toks_series):
                if len(toks) < n:
                    continue
                shingles = {
                    " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                }
                hv = np.fromiter(
                    (hash_shingle(s) for s in shingles),
                    dtype=np.uint64,
                    count=len(shingles),
                )
                with np.errstate(over="ignore"):
                    mixed = _splitmix64(hv[:, None] ^ seeds[None, :])
                # min over shingles per hash fn; shift into signed-long range
                sig = (np.min(mixed, axis=0) >> np.uint64(1)).astype(np.int64)
                sigs.append(sig.tolist())
                ids.append(doc_id)
            yield pd.DataFrame({"doc_id": ids, "sig": sigs})

    return src.mapInPandas(compute, schema=out_schema)


def hash_shingle(s: str) -> int:
    """Deterministic 64-bit shingle hash: two independent crc32 passes
    (C-speed), concatenated. Stable across processes — unlike Python's
    salted hash(); the splitmix64 finalizer downstream provides avalanche."""
    b = s.encode("utf-8")
    return (zlib.crc32(b) << 32) | zlib.crc32(b, 0x9E3779B9)


def minhash_lsh_pairs(
    df: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    n: int = 3,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_bucket: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs via banded LSH over MinHash signatures, with
    estimated Jaccard = fraction of matching signature positions.

    Shuffle profile: one shuffle to bucket (band_idx, band_hash), self-join
    inside buckets only, distinct pair dedup — no all-pairs comparison.

    `max_bucket` (same knob as simhash_near_pairs): skip degenerate band
    buckets shared by more than that many docs — a corpus of thousands of
    near-identical documents otherwise goes quadratic INSIDE one bucket
    (the pairs are real near-dups, but emitting n² of them is usually not
    what a dedup pipeline wants; connected components reach the same
    clusters from the surviving pairs). A documented recall trade for skew
    safety at corpus scale; None (default) keeps exact LSH recall.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    # materialize the signature table ONCE (localCheckpoint): both sides of
    # the banded self-join read it, and without the checkpoint each side
    # re-runs the full tokenize+shingle+MinHash Arrow pass (2x the only
    # Python stage in the pipeline). Signatures are num_hashes longs/doc —
    # the standard materialization point of an LSH pipeline at any scale.
    sig = minhash_signatures(df, num_hashes, n, seed, id_col, text_col)
    sig = sig.localCheckpoint(eager=True)
    banded = sig.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda i: F.sha2(
                    F.array_join(
                        F.slice("sig", i * rows_per_band + 1, rows_per_band), ","
                    ),
                    256,
                ),
            )
        ).alias("band_idx", "band_hash"),
    )
    if max_bucket is not None:
        hot = (
            banded.groupBy("band_idx", "band_hash")
            .count()
            .filter(F.col("count") > max_bucket)
            .select("band_idx", "band_hash")
        )
        banded = banded.join(hot, ["band_idx", "band_hash"], "left_anti")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = F.round(
        F.size(
            F.filter(
                F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.lit(float(num_hashes)),
        6,
    )
    return (
        cand.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def md5_token_hash64(tok):
    """Deterministic 64-bit token hash both Spark and DuckDB can compute
    bit-identically (md5 hex → two 32-bit halves → signed 64-bit wrap) —
    the cross-engine hash behind the dedup_simhash_verify oracle closure.
    xxhash64 stays the production default (faster, JVM-native); this
    variant exists so the ENTIRE banded near-dup pipeline is checkable by
    an independent SQL engine."""
    hexc = F.md5(tok)
    hi = F.conv(F.substring(hexc, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(hexc, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def simhash_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_hash=None,
) -> DataFrame:
    """64-bit SimHash over tokens: per-token hash bit votes weighted by
    tf, sign of the vote sum per bit. Entirely native expressions: explode →
    hash → bit extraction via shiftright/bitwise-and → weighted sum →
    bit reassembly. `token_hash` (Column → Column) overrides the xxhash64
    default — e.g. md5_token_hash64 for cross-engine verification."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens_col(text_col)).alias("tok")
    )
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    hash_fn = token_hash if token_hash is not None else F.xxhash64
    h = tf.withColumn("h", hash_fn(F.col("tok")))
    bits = h.select(
        "doc_id",
        "tf",
        *[
            (
                F.when(
                    F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, F.col("tf")
                )
                .otherwise(-F.col("tf"))
                .alias(f"b{i}")
            )
            for i in range(64)
        ],
    )
    votes = bits.groupBy("doc_id").agg(
        *[F.sum(f"b{i}").alias(f"v{i}") for i in range(64)]
    )
    fp = F.lit(0).cast("long")
    for i in range(64):
        # shiftleft keeps bit 63 in two's-complement long range
        fp = fp + F.when(
            F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return votes.select("doc_id", fp.alias("simhash"))


def simhash_dup_groups(df: DataFrame, **kwargs) -> DataFrame:
    """Documents sharing an identical SimHash fingerprint (strong near-dup
    signal). For Hamming-distance near-dups — SimHash's actual point — use
    simhash_near_pairs."""
    fps = simhash_fingerprints(df, **kwargs)
    return (
        fps.groupBy("simhash")
        .agg(
            F.count("*").alias("n_docs"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def simhash_near_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    bands: int | None = None,
    max_bucket: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_hash=None,
) -> DataFrame:
    """Near-duplicate pairs within Hamming distance `max_hamming` of the
    64-bit SimHash — the banded expansion equal-fingerprint grouping misses
    (the standard industry SimHash retrieval: split into B = max_hamming + 1
    bands; by pigeonhole, ≤ max_hamming differing bits leave ≥ 1 band
    byte-identical, so a band-equality self-join has PERFECT recall).
    Candidates are then verified EXACTLY with one native
    bit_count(xor) ≤ max_hamming — no false positives.

    Shuffle profile: one banded self-join (same shape as MinHash-LSH), no
    all-pairs comparison. `max_bucket` optionally skips degenerate band
    values shared by more than that many docs (e.g. the all-zero band of
    near-empty docs) — a documented recall trade for skew safety at corpus
    scale; None (default) keeps exact recall.
    """
    B = bands if bands is not None else max_hamming + 1
    if 64 % B:
        raise ValueError(f"bands must divide 64, got {B}")
    w = 64 // B
    mask = F.lit((1 << w) - 1).cast("long")
    fps = simhash_fingerprints(
        df, id_col=id_col, text_col=text_col, token_hash=token_hash
    )
    banded = fps.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("simhash", i * w)
                    .bitwiseAND(mask)
                    .cast("long")
                    for i in range(B)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    if max_bucket is not None:
        hot = (
            banded.groupBy("band_idx", "band_val")
            .count()
            .filter(F.col("count") > max_bucket)
            .select("band_idx", "band_val")
        )
        banded = banded.join(hot, ["band_idx", "band_val"], "left_anti")
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("fp_a"),
            F.col("b.simhash").alias("fp_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        cand.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
