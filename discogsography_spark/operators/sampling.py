"""Training-data sampling / mixing / decontamination operators.

The three dataset-assembly primitives every large-scale pretraining pipeline
runs between dedup and tokenization:

- **deterministic_sample** — content-hash sampling: a row is kept iff a hex
  prefix of sha256(key) is below the rate threshold. No RNG, no state: the
  same row gets the same verdict on every engine, every run, every cluster
  size (re-runs and backfills stay consistent, and the DuckDB oracle can
  reproduce the exact sample). Granularity 1/16^6 ≈ 6e-8.
- **mix_sources** — per-source quota mixing: each source gets its own keep
  rate (the standard "wiki ×2.0-equivalent, web ×0.3" mixture recipe
  expressed as rates ≤ 1); implemented as ONE broadcast map lookup + the
  same hash predicate — a single scan, no shuffle, no per-source passes.
- **decontaminate** — benchmark n-gram decontamination: drop every document
  sharing ANY word n-gram with a probe (benchmark/eval) corpus. Probe
  shingles are exact-matched via an anti-join on the shingle value; at
  cluster scale the probe side is small (benchmarks are MBs) so Catalyst
  broadcasts it — the corpus side stays a single scan + explode with no
  self-join.

All Spark-side logic is native expressions (whole-stage codegen); nothing
touches Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from discogsography_spark.operators.dedup import shingles_col

# hex-prefix width for the sampling predicate: 6 nibbles = 24 bits
_PREFIX_LEN = 6
_PREFIX_SPACE = 16**_PREFIX_LEN


def rate_threshold_hex(rate: float) -> str:
    """Lowercase hex threshold for a keep-rate in [0, 1]; a row survives iff
    its sha256 prefix is LEXICOGRAPHICALLY below this (hex compare == value
    compare at fixed width, identical in every engine)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    t = min(int(rate * _PREFIX_SPACE), _PREFIX_SPACE)
    if t == _PREFIX_SPACE:
        return "g" * _PREFIX_LEN  # > every hex digit → keep all
    return format(t, f"0{_PREFIX_LEN}x")


def _hash_prefix(key_col: str):
    return F.substring(F.sha2(F.coalesce(F.col(key_col), F.lit("")), 256), 1, _PREFIX_LEN)


def deterministic_sample(
    df: DataFrame, rate: float, key_col: str = "text"
) -> DataFrame:
    """Keep ~rate of rows, decided by content hash of `key_col` — stable
    across runs, partitionings, and engines."""
    return df.filter(_hash_prefix(key_col) < F.lit(rate_threshold_hex(rate)))


def mix_sources(
    df: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    key_col: str = "text",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-source deterministic sampling in one scan: sources absent from
    `rates` fall back to default_rate (0 = drop unlisted sources — the
    allowlist shape of a curated mixture)."""
    thresh = F.lit(rate_threshold_hex(default_rate))
    expr = None
    for src, rate in sorted(rates.items()):
        cond = F.col(source_col) == F.lit(src)
        val = F.lit(rate_threshold_hex(rate))
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    thresh = thresh if expr is None else expr.otherwise(thresh)
    return df.filter(_hash_prefix(key_col) < thresh)


def decontaminate(
    df: DataFrame,
    probe: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop documents sharing ANY word n-gram with the probe corpus.

    Conservative containment: a doc shorter than n tokens can't carry an
    n-gram and is always kept; probe docs shorter than n contribute their
    FULL token sequence as one shingle (a 3-token benchmark answer still
    decontaminates). Returns the surviving rows of `df` unchanged."""
    probe_sh = probe.select(
        F.explode(
            F.when(
                F.size(shingles_col(text_col, n)) > 0, shingles_col(text_col, n)
            ).otherwise(F.array(F.array_join(_toks(text_col), " ")))
        ).alias("shingle")
    ).distinct()
    doc_sh = df.select(
        F.col(id_col).alias("_did"), F.explode(shingles_col(text_col, n)).alias("shingle")
    )
    dirty = doc_sh.join(probe_sh, "shingle").select("_did").distinct()
    return df.join(dirty.withColumnRenamed("_did", id_col), id_col, "left_anti")


def _toks(text_col: str):
    from discogsography_spark.operators.textstats import tokens_col

    return tokens_col(text_col)
