"""Transcript table sources/sinks.

The reference ingests gzip XML (streaming quick-xml,
/root/reference/extractor/src/parser.rs:127-325) and XZ JSONL
(/root/reference/extractor/src/jsonl_parser.rs:120-262). On Spark those are
`spark.read` one-liners; the engine is source-agnostic behind this module:

- parquet (default), json/jsonl (gz transparently), csv — all with the FIXED
  transcripts schema applied (schema-on-read never infers: inference is a
  full extra scan at 100 TB);
- Iceberg when a catalog is configured (`iceberg` format → table identifier),
  falling back to plain parquet paths in this sandbox (no Iceberg runtime
  jar) — the BASELINE.json input contract allows exactly this fallback.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[attr-defined]
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def load_transcripts(
    spark: SparkSession, path_or_table: str, format: str = "parquet"
) -> DataFrame:
    if format == "iceberg":
        if _iceberg_available(spark):
            return spark.read.format("iceberg").load(path_or_table)
        # sandbox fallback: treat as a parquet path with the same schema
        return spark.read.schema(TRANSCRIPTS_SCHEMA).parquet(path_or_table)
    if format in ("json", "jsonl"):
        return spark.read.schema(TRANSCRIPTS_SCHEMA).json(path_or_table)
    if format == "csv":
        return spark.read.schema(TRANSCRIPTS_SCHEMA).option("header", "true").csv(
            path_or_table
        )
    return spark.read.schema(TRANSCRIPTS_SCHEMA).parquet(path_or_table)


def write_transcripts(
    df: DataFrame, path_or_table: str, format: str = "parquet", mode: str = "overwrite"
) -> None:
    if format == "iceberg" and _iceberg_available(df.sparkSession):
        df.writeTo(path_or_table).createOrReplace()
        return
    df.write.mode(mode).parquet(path_or_table)
