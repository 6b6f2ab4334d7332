"""Sequence packing: BPE-encoded documents → fixed-length training rows.

The last dataset-assembly stage of a pretraining pipeline (downstream of
dedup → sampling → tokenization, operators/bpe.py): concatenate every
document's token stream in a deterministic global order and chunk the
stream into sequences of exactly `seq_len` tokens — the GPT-style
concat-and-chunk packing where documents may span sequence boundaries and
no token is padded or duplicated. The bin assignment is a pure function of
(order key, token count), so it is reproducible by a window-cumsum oracle
and identical at any parallelism.

Scale design (the part that matters at 10^12 docs):

- the global exclusive cumsum of token counts is NOT one
  `Window.orderBy(doc_id)` — that funnels the corpus through a single
  reducer. Instead: bucket by `order_col // bucket` (order-correlated
  buckets), per-bucket exclusive cumsum (a window partitioned BY BUCKET —
  every bucket is an independent reducer), then one tiny per-bucket-total
  collect (id_range / bucket rows ≈ 10^6 at trillion scale) whose python
  running sum becomes a broadcast base-offset map. Two shuffles, no
  single-reducer stage, O(#buckets) driver memory.
- sequence assembly shuffles (seq_id, slice) pieces — each sequence
  receives only the 1-3 document slices that overlap it, so the groupBy
  key fan-in is bounded by seq_len / min_doc_len, never corpus-sized.
- the shard writer is one `partitionBy(shard)` parquet write plus a JSON
  manifest (sequence counts, token totals, dropped remainder) — the same
  commit shape as the index builder's manifests.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def exclusive_cumsum(
    df: DataFrame,
    n_col: str,
    order_col: str = "doc_id",
    bucket: int = 1 << 20,
) -> DataFrame:
    """Add `start_offset` = sum of `n_col` over all rows with a smaller
    `order_col` (exclusive running total in order-key order), without a
    global single-reducer window: per-bucket windows + a broadcast map of
    bucket base offsets (see module docstring)."""
    # floor division, not truncate-toward-zero: a negative order key in
    # -bucket+1..-1 must land in bucket -1, not collapse into bucket 0 with
    # the positives (which would corrupt the global order / base offsets)
    b = df.withColumn(
        "_b", F.floor(F.col(order_col) / F.lit(bucket)).cast("long")
    )
    w = (
        Window.partitionBy("_b")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    b = b.withColumn(
        "_in_bucket", F.coalesce(F.sum(n_col).over(w), F.lit(0)).cast("long")
    )
    totals = {
        r["_b"]: r["_t"]
        for r in b.groupBy("_b").agg(F.sum(n_col).alias("_t")).collect()
    }
    bases: dict[int, int] = {}
    acc = 0
    for bk in sorted(totals):
        bases[bk] = acc
        acc += int(totals[bk])
    spark = df.sparkSession
    base_df = spark.createDataFrame(
        [(int(k), int(v)) for k, v in bases.items()], "_b long, _base long"
    )
    return (
        b.join(F.broadcast(base_df), "_b")
        .withColumn(
            "start_offset", (F.col("_base") + F.col("_in_bucket")).cast("long")
        )
        .drop("_b", "_in_bucket", "_base")
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    n_col: str = "n_tokens",
    order_col: str = "doc_id",
    bucket: int = 1 << 20,
) -> DataFrame:
    """Deterministic bin assignment: each doc (with `n_col` > 0) gets its
    global `start_offset` in the concatenated token stream (order-key
    order) and the window of sequences it overlaps —
    `first_seq = start_offset div seq_len`,
    `last_seq = (start_offset + n - 1) div seq_len`. Zero-token docs are
    dropped (they occupy no stream positions). Pure function of the input,
    identical at any parallelism (tested at 2 vs 32 partitions)."""
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    out = exclusive_cumsum(
        df.filter(F.col(n_col) > 0), n_col, order_col=order_col, bucket=bucket
    )
    return (
        out.withColumn(
            "first_seq", F.floor(F.col("start_offset") / F.lit(seq_len)).cast("long")
        )
        .withColumn(
            "last_seq",
            F.floor(
                (F.col("start_offset") + F.col(n_col) - 1) / F.lit(seq_len)
            ).cast("long"),
        )
    )


def explode_assignments(
    packed: DataFrame, seq_len: int, n_col: str = "n_tokens"
) -> DataFrame:
    """(seq_id, doc slice) pieces from a pack_sequences frame: one row per
    (sequence, overlapping doc) with the doc-local slice
    `[slice_start, slice_start + slice_len)` (0-based) and the in-sequence
    position `seq_pos`. Native sequence()+explode — a doc of n tokens
    emits at most ceil(n / seq_len) + 1 rows."""
    s = F.col("seq_id")
    start, n = F.col("start_offset"), F.col(n_col)
    frm = F.greatest(start, s * seq_len)
    to = F.least(start + n, (s + 1) * seq_len)
    return (
        packed.withColumn(
            "seq_id", F.explode(F.sequence(F.col("first_seq"), F.col("last_seq")))
        )
        .withColumn("slice_start", (frm - start).cast("long"))
        .withColumn("slice_len", (to - frm).cast("long"))
        .withColumn("seq_pos", (frm - s * seq_len).cast("long"))
        .drop("first_seq", "last_seq")
    )


def write_training_shards(
    docs: DataFrame,
    out_dir: str,
    seq_len: int,
    seqs_per_shard: int = 1024,
    token_col: str = "tokens",
    order_col: str = "doc_id",
    bucket: int = 1 << 20,
    drop_remainder: bool = True,
) -> dict:
    """Pack `docs[token_col]` (array of token ids/strings) into fixed-length
    training sequences and write parquet shards partitioned by
    `shard = seq_id div seqs_per_shard`, plus a `manifest.json`.

    Every written sequence has EXACTLY `seq_len` tokens; with
    `drop_remainder` (the standard choice) the trailing partial sequence is
    dropped and accounted in the manifest. Returns the manifest dict."""
    # F.size(NULL) is -1 under non-ANSI Spark — clamp so a null token array
    # counts as an empty doc instead of silently shrinking total_tokens
    # (which would drop a legitimate final full sequence)
    counted = docs.select(
        F.col(order_col), F.col(token_col).alias("_toks")
    ).withColumn("_pack_n", F.greatest(F.size("_toks"), F.lit(0)))
    packed = pack_sequences(
        counted, seq_len, n_col="_pack_n", order_col=order_col, bucket=bucket
    )

    pieces = explode_assignments(packed, seq_len, n_col="_pack_n").select(
        "seq_id",
        "seq_pos",
        F.slice(
            F.col("_toks"),
            (F.col("slice_start") + 1).cast("int"),
            F.col("slice_len").cast("int"),
        ).alias("piece"),
    )
    seqs = (
        pieces.groupBy("seq_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seq_pos", "piece"))),
                    lambda x: x["piece"],
                )
            ).alias("tokens")
        )
        .withColumn("n", F.size("tokens"))
    )
    total_tokens = int(
        counted.agg(F.coalesce(F.sum("_pack_n"), F.lit(0))).collect()[0][0]
    )
    n_full = total_tokens // seq_len
    dropped = total_tokens - n_full * seq_len
    if drop_remainder:
        seqs = seqs.filter(F.col("seq_id") < F.lit(n_full))
    (
        seqs.withColumn(
            "shard", (F.col("seq_id") / F.lit(seqs_per_shard)).cast("long")
        )
        .repartition("shard")
        .sortWithinPartitions("seq_id")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(out_dir, "shards"))
    )
    n_seqs = int(n_full if drop_remainder else n_full + (1 if dropped else 0))
    manifest = {
        "seq_len": int(seq_len),
        "seqs_per_shard": int(seqs_per_shard),
        "n_sequences": n_seqs,
        # shard count follows the sequences actually WRITTEN (the trailing
        # partial sequence occupies a shard too when drop_remainder=False)
        "n_shards": int((n_seqs + seqs_per_shard - 1) // seqs_per_shard),
        "total_tokens": total_tokens,
        "dropped_remainder_tokens": int(dropped if drop_remainder else 0),
        "drop_remainder": bool(drop_remainder),
    }
    tmp = os.path.join(out_dir, "manifest.json.tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, "manifest.json"))
    return manifest
