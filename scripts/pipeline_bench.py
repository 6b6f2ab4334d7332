"""End-to-end LLM training-data pipeline bench — the composed run a
dataset-assembly user actually executes, not the per-stage micro-entries:

  assemble docs → exact dedup → MinHash-LSH near-dedup (keep canonical)
  → decontaminate vs a probe set → source mixing → BPE train + encode
  → pack to fixed-length sequences → training-shard write + manifest

Corpus: conversations from the deterministic bench corpus at the given sf
(one document per conversation, a synthetic `source` label from a content
hash — no external data). Reports per-stage wall seconds, rows in/out,
and end-to-end docs/s + packed tokens/s, plus an exact manifest
reconciliation (total_tokens == sum of encoded lengths; sequences ==
total_tokens div seq_len).

Usage: python scripts/pipeline_bench.py [sf=0.25] [cpus=8]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 0.25
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    seq_len = 2048

    from bench import ensure_corpus
    from discogsography_spark.session import get_spark

    spark = get_spark(
        "pipeline-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    corpus = ensure_corpus(sf)
    out_root = f"/tmp/spark_graft_bench/pipeline_sf{sf}"
    if os.path.isdir(out_root):
        shutil.rmtree(out_root)
    os.makedirs(out_root)

    stages: dict[str, dict] = {}

    def stage(name: str, fn):
        t0 = time.time()
        out = fn()
        stages[name] = {"sec": round(time.time() - t0, 2)}
        return out

    # ---- 0. assemble: one document per conversation, 3 hash-bucketed
    # sources (the mixture surface needs a source column) ----
    def assemble():
        t = spark.read.parquet(os.path.join(corpus, "transcripts.parquet"))
        # deterministic turn order INSIDE the doc: sort the struct list
        docs = (
            t.groupBy("conv_id")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("turn_idx", "text"))
                        ),
                        lambda s: s["text"],
                    ),
                    " ",
                ).alias("text")
            )
            .withColumn(
                "doc_id",
                F.xxhash64("conv_id").bitwiseAND(F.lit((1 << 62) - 1)),
            )
            .withColumn(
                "source",
                F.concat(
                    F.lit("src"), (F.abs(F.xxhash64("conv_id")) % 3)
                ),
            )
            .select("doc_id", "source", "text")
        )
        docs.write.mode("overwrite").parquet(f"{out_root}/docs")
        return spark.read.parquet(f"{out_root}/docs")

    docs = stage("assemble", assemble)
    n0 = docs.count()
    stages["assemble"]["rows_out"] = n0

    # ---- 1. exact dedup (drop non-keeper byte-identical copies) ----
    from discogsography_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
    )

    def exact_stage():
        groups = exact_dedup(docs)
        losers = groups.select(
            F.explode("doc_ids").alias("doc_id"), "keeper"
        ).filter(F.col("doc_id") != F.col("keeper")).select("doc_id")
        kept = docs.join(losers, "doc_id", "left_anti")
        kept.write.mode("overwrite").parquet(f"{out_root}/exact")
        return spark.read.parquet(f"{out_root}/exact")

    docs = stage("exact_dedup", exact_stage)
    stages["exact_dedup"]["rows_out"] = docs.count()

    # ---- 2. near-dedup: MinHash-LSH pairs → canonical representative ----
    from discogsography_spark.operators.components import keep_canonical

    def near_stage():
        pairs = minhash_lsh_pairs(
            docs, num_hashes=64, bands=16, threshold=0.8, n=3
        ).select("doc_a", "doc_b")
        kept = keep_canonical(docs, pairs)
        kept.write.mode("overwrite").parquet(f"{out_root}/near")
        return spark.read.parquet(f"{out_root}/near")

    docs = stage("near_dedup", near_stage)
    stages["near_dedup"]["rows_out"] = docs.count()

    # ---- 3. decontaminate vs a probe set (synthetic benchmark: snippets
    # of a deterministic 0.1% doc sample — guarantees real hits) ----
    from discogsography_spark.operators.sampling import (
        decontaminate,
        deterministic_sample,
        mix_sources,
    )

    def decon_stage():
        probe = deterministic_sample(docs, 0.001).select(
            F.array_join(
                F.slice(F.split("text", " "), 5, 12), " "
            ).alias("text")
        )
        kept = decontaminate(docs, probe, n=8)
        kept.write.mode("overwrite").parquet(f"{out_root}/decon")
        return spark.read.parquet(f"{out_root}/decon")

    docs = stage("decontaminate", decon_stage)
    stages["decontaminate"]["rows_out"] = docs.count()

    # ---- 4. curated mixture (per-source deterministic rates) ----
    def mix_stage():
        kept = mix_sources(
            docs, {"src0": 1.0, "src1": 0.6, "src2": 0.3}
        )
        kept.write.mode("overwrite").parquet(f"{out_root}/mixed")
        return spark.read.parquet(f"{out_root}/mixed")

    docs = stage("mix_sources", mix_stage)
    n_mixed = docs.count()
    stages["mix_sources"]["rows_out"] = n_mixed

    # ---- 5. BPE: corpus word frequencies → merges → subword encode ----
    from discogsography_spark.operators.bpe import (
        bpe_encode_col,
        train_bpe,
        word_frequencies,
    )

    def bpe_stage():
        wf = word_frequencies(docs, max_words=30_000)
        merges = train_bpe(wf, num_merges=500)
        enc = bpe_encode_col(docs, merges, out_col="tokens").select(
            "doc_id", "tokens"
        )
        enc.write.mode("overwrite").parquet(f"{out_root}/encoded")
        return spark.read.parquet(f"{out_root}/encoded")

    encoded = stage("bpe_encode", bpe_stage)
    tok_total = encoded.select(
        F.sum(F.greatest(F.size("tokens"), F.lit(0))).alias("n")
    ).collect()[0]["n"]
    stages["bpe_encode"]["tokens_out"] = int(tok_total)

    # ---- 6. pack + shard write ----
    from discogsography_spark.operators.packing import write_training_shards

    def pack_stage():
        return write_training_shards(
            encoded,
            f"{out_root}/shards",
            seq_len=seq_len,
            seqs_per_shard=1024,
            token_col="tokens",
        )

    manifest = stage("pack_write", pack_stage)

    # ---- manifest reconciliation: exact, not approximate ----
    assert manifest["total_tokens"] == int(tok_total), (
        manifest["total_tokens"],
        int(tok_total),
    )
    assert manifest["n_sequences"] == int(tok_total) // seq_len
    written = spark.read.parquet(f"{out_root}/shards/shards")
    n_written = written.count()
    assert n_written == manifest["n_sequences"], (
        n_written,
        manifest["n_sequences"],
    )

    e2e = sum(s["sec"] for s in stages.values())
    print(
        json.dumps(
            {
                "metric": "llm_pipeline_e2e_sec",
                "value": round(e2e, 2),
                "sf": sf,
                "cpus": cpus,
                "seq_len": seq_len,
                "stages": stages,
                "docs_in": n0,
                "docs_packed": n_mixed,
                "packed_tokens": int(tok_total),
                "n_sequences": manifest["n_sequences"],
                "docs_per_sec": round(n0 / e2e, 1),
                "packed_tokens_per_sec": round(int(tok_total) / e2e, 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
