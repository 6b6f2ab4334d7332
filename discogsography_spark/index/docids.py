"""Parallelism-independent docID assignment.

docID = dense rank over the global sort (conv_id ASC, turn_idx ASC) — the
"stable ordering" invariant of BASELINE.json's input_hint and the analog of
the reference's stable record IDs extracted at parse time
(/root/reference/extractor/src/parser.rs:183,222).

NOT `monotonically_increasing_id` (partition-dependent) and NOT a global
single-partition window. Instead the scalable two-pass zipWithIndex pattern:

1. range-repartition + sort-within-partitions on the key — partitions hold
   disjoint, ordered key ranges;
2. count rows per partition (cheap agg on the persisted partitioning);
3. broadcast the prefix-sum offsets; a narrow mapInPandas adds
   `offset[pid] + local_row_number`.

The result depends only on the global key order, never on partition
boundaries or core count — dense rank is invariant to where the range
splits fall. That is what makes N-core and 4N-core builds byte-identical.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def assign_doc_ids(
    df: DataFrame,
    key_cols: tuple[str, str] = ("conv_id", "turn_idx"),
    num_partitions: int | None = None,
    with_tokens: bool = False,
    analyzer: str = "simple",
) -> DataFrame:
    """Return df + `doc_id` (long) = dense rank over key_cols.

    The input's key must be unique per row (enforced by the transcripts
    fixture; violations would make the rank order ambiguous).

    with_tokens=True fuses tokenization (+ `tokens`, `dl` columns, `text`
    dropped) into the same Arrow pass — one Python stage for the whole
    docID+analyze step instead of two.
    """
    spark = df.sparkSession
    num_partitions = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    parted = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in key_cols])
        .sortWithinPartitions(*key_cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    counts = {
        r["_pid"]: r["cnt"]
        for r in parted.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    boff = spark.sparkContext.broadcast(offsets)

    base_fields = [f for f in parted.schema.fields if not (with_tokens and f.name == "text")]
    extra = [T.StructField("doc_id", T.LongType(), False)]
    if with_tokens:
        extra += [
            T.StructField("tokens", T.ArrayType(T.StringType()), False),
            T.StructField("dl", T.IntegerType(), False),
        ]
    out_schema = T.StructType(base_fields + extra)
    out_cols = [f.name for f in out_schema.fields]

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from discogsography_spark.analysis import get_analyzer

        an = get_analyzer(analyzer)

        local = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pid = int(pdf["_pid"].iloc[0])
            start = boff.value[pid] + local
            pdf = pdf.copy()
            pdf["doc_id"] = range(start, start + len(pdf))
            local += len(pdf)
            if with_tokens:
                toks = an.tokenize_pandas(pdf["text"])
                pdf["tokens"] = toks
                pdf["dl"] = toks.map(len).astype("int32")
            yield pdf[out_cols]

    out = parted.mapInPandas(add_ids, schema=out_schema).drop("_pid")
    return out
