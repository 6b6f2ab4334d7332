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
from pyspark.sql.window import Window

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

    Containment: a probe doc with ≥ n tokens contributes its n-gram
    shingles; a SHORTER probe (an m-token benchmark answer, m < n)
    contributes its full m-token sequence, and the corpus side is
    additionally shingled at each such width m — so a 3-token benchmark
    answer decontaminates every doc containing it as a CONSECUTIVE run.
    Matching is keyed (shingle, width), so an m-gram only matches an
    m-token probe. The short widths are discovered with one tiny
    probe-side aggregation (benchmark corpora are MBs); each extra width
    adds one corpus-side explode, so cost scales with the number of
    DISTINCT short widths (< n of them, in practice 0-2), never with
    probe rows. Docs shorter than a width can't carry its shingles and
    are kept. Returns the surviving rows of `df` unchanged."""
    probe_t = probe.select(_toks(text_col).alias("_pt")).withColumn(
        "_m", F.size("_pt")
    )
    short_widths = sorted(
        r["_m"]
        for r in probe_t.select("_m")
        .filter((F.col("_m") > 0) & (F.col("_m") < n))
        .distinct()
        .collect()
    )
    probe_sh = probe.select(
        F.explode(shingles_col(text_col, n)).alias("shingle"),
        F.lit(n).alias("w"),
    )
    if short_widths:
        probe_sh = probe_sh.unionByName(
            probe_t.filter((F.col("_m") > 0) & (F.col("_m") < n)).select(
                F.array_join("_pt", " ").alias("shingle"),
                F.col("_m").alias("w"),
            )
        )
    probe_sh = probe_sh.distinct()
    doc_sh = df.select(
        F.col(id_col).alias("_did"),
        F.explode(shingles_col(text_col, n)).alias("shingle"),
        F.lit(n).alias("w"),
    )
    for m in short_widths:
        doc_sh = doc_sh.unionByName(
            df.select(
                F.col(id_col).alias("_did"),
                F.explode(shingles_col(text_col, int(m))).alias("shingle"),
                F.lit(int(m)).alias("w"),
            )
        )
    dirty = doc_sh.join(probe_sh, ["shingle", "w"]).select("_did").distinct()
    return df.join(dirty.withColumnRenamed("_did", id_col), id_col, "left_anti")


def _toks(text_col: str):
    from discogsography_spark.operators.textstats import tokens_col

    return tokens_col(text_col)


def stratified_sample_exact(
    df: DataFrame,
    quotas: dict[str, int],
    strata_col: str = "source",
    key_col: str = "text",
    id_col: str = "doc_id",
    oversample: float = 4.0,
) -> DataFrame:
    """EXACTLY `quotas[s]` rows per stratum (fewer only if the stratum is
    smaller), selected as the quota smallest (sha256(key), id) pairs —
    deterministic across engines/runs/cluster sizes, so a plain
    row_number-over-everything oracle reproduces it.

    The naive form — one window partitioned by stratum over the FULL table —
    funnels each stratum through a single sort: a 50 TB "web" stratum
    becomes one reducer. This runs the window only on a hash-prefiltered
    sliver instead:

    1. one agg for per-stratum counts;
    2. keep rows whose hash PREFIX falls below ``oversample * quota/count``
       (the deterministic_sample predicate) — survivors per stratum
       concentrate around oversample*quota, independent of stratum size;
    3. exact row_number window over the survivors only.

    Filtering by hash prefix preserves the selection exactly: every kept
    row orders strictly below every dropped row (fixed-width prefix ⇒
    prefix < threshold ⇒ full hash smaller), so whenever a stratum keeps at
    least `quota` survivors the window's winners equal the global winners.
    That sufficiency is CHECKED (one tiny agg over the window output); any
    under-filled stratum — binomially rare at oversample≥4, or a stratum
    genuinely smaller than its quota — is re-run unfiltered and stitched
    back in, preserving exactness in every case."""
    if not quotas:
        return df.limit(0)
    for s, n in quotas.items():
        if n < 0:
            raise ValueError(f"negative quota for {s!r}: {n}")

    spark = df.sparkSession
    listed = df.filter(F.col(strata_col).isin(list(quotas)))
    counts = {
        r["s"]: r["n"]
        for r in listed.groupBy(F.col(strata_col).alias("s"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    quota_col = F.lit(None).cast("long")
    rate_col = None
    for s, n in sorted(quotas.items()):
        cond = F.col(strata_col) == F.lit(s)
        rate = min(1.0, oversample * n / counts[s]) if counts.get(s) else 1.0
        quota_col = F.when(cond, F.lit(n)).otherwise(quota_col)
        thresh = F.lit(rate_threshold_hex(rate))
        rate_col = F.when(cond, thresh) if rate_col is None else rate_col.when(cond, thresh)

    hashed = listed.withColumn(
        "_h", F.sha2(F.coalesce(F.col(key_col), F.lit("")), 256)
    ).withColumn("_quota", quota_col)

    def pick(src: DataFrame) -> DataFrame:
        w = Window.partitionBy(strata_col).orderBy(F.col("_h"), F.col(id_col))
        return (
            src.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= F.col("_quota"))
        )

    survivors = hashed.filter(F.substring("_h", 1, _PREFIX_LEN) < rate_col)
    picked = pick(survivors)

    # sufficiency check: a stratum is PROVEN exact if it either filled its
    # quota from the sliver, or the sliver held the whole stratum
    got = {
        r["s"]: (r["n_sel"], r["n_surv"])
        for r in picked.groupBy(F.col(strata_col).alias("s"))
        .agg(F.count("*").alias("n_sel"), F.max("_rn").alias("n_surv"))
        .collect()
    }
    surv_counts = {
        r["s"]: r["n"]
        for r in survivors.groupBy(F.col(strata_col).alias("s"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    redo = [
        s
        for s, n in sorted(quotas.items())
        if counts.get(s, 0) > 0
        and got.get(s, (0, 0))[0] < min(n, counts[s])
        and surv_counts.get(s, 0) < counts[s]
    ]
    if redo:
        picked = picked.filter(~F.col(strata_col).isin(redo)).unionByName(
            pick(hashed.filter(F.col(strata_col).isin(redo)))
        )
    return picked.drop("_h", "_quota", "_rn")


def plan_mixture(
    docs: DataFrame,
    budgets: dict[str, int],
    strata_col: str = "source",
    text_col: str = "text",
) -> dict[str, float]:
    """Per-source keep rates that hit per-source TOKEN budgets in
    expectation: rate_s = min(1, budget_s / tokens_s), from ONE
    map-side-combined stats pass (the only corpus-sized work). Feed the
    result straight into `mix_sources` — the standard way a pretraining
    recipe is stated ("cap web at N tokens, keep all of wiki")."""
    from discogsography_spark.operators.textstats import tokens_col

    totals = {
        r["s"]: r["n"]
        for r in docs.filter(F.col(strata_col).isin(list(budgets)))
        .groupBy(F.col(strata_col).alias("s"))
        .agg(F.sum(F.size(tokens_col(text_col))).alias("n"))
        .collect()
    }
    return {
        s: (min(1.0, b / totals[s]) if totals.get(s) else 1.0)
        for s, b in budgets.items()
    }


def mix_to_token_budgets(
    docs: DataFrame,
    budgets: dict[str, int],
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """plan_mixture + mix_sources in one call: deterministic content-hash
    subset whose per-source token mass lands on the budgets in expectation.
    Sources without a budget are dropped (curated-mixture allowlist)."""
    rates = plan_mixture(docs, budgets, strata_col=strata_col, text_col=text_col)
    return mix_sources(
        docs, rates, source_col=strata_col, key_col=text_col, default_rate=0.0
    )
