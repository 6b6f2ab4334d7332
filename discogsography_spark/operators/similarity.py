"""Similarity search over an embedding column (array<float>).

- brute_force_cosine_topk: exact top-k neighbors. Dot products via native
  F.zip_with + F.aggregate (JVM-side); the query vector is a literal array,
  so the plan is scan → project → TakeOrderedAndProject — no shuffle beyond
  the top-k merge. Baseline and oracle for the ANN path.
- lsh_bucketed_topk: random-hyperplane (sign) LSH variant — the scale path.
  Each vector is assigned a bucket signature; a query probes only its bucket
  (plus optional multi-probe neighbors), turning the 100 TB scan into a
  partition-pruned lookup when the table is written partitioned by bucket.
- pairwise_cosine_topk_df: all-pairs top-k via bucket self-join (embedding
  dedup / clustering primitive).

Generalizes /root/reference/api/queries/similarity.py:15-25 (dict-based
sparse cosine) to dense vectors at corpus scale.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def cosine_to_query(
    df: DataFrame, query_vec: list[float], vec_col: str = "embedding"
) -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.linalg.norm(np.asarray(query_vec, dtype=np.float64)))
    v = F.col(vec_col).cast("array<double>")
    cos = _dot(v, q) / (F.lit(qn) * _norm(v))
    return df.withColumn("cosine", F.round(cos, 6))


def brute_force_cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: (vec_id, cosine) ordered (cosine DESC, id ASC)."""
    return (
        cosine_to_query(df, query_vec, vec_col)
        .select(F.col(id_col), "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def signature_col(vec_col: str, planes: np.ndarray) -> Column:
    """Sign-LSH bucket id (int): bit i = sign(v · plane_i). Native
    expressions: each plane dot is a zip_with/aggregate over a literal."""
    v = F.col(vec_col).cast("array<double>")
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        sig = sig + F.when(_dot(v, p) > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def _lsh_probe_set(
    query_vec: list[float], planes: np.ndarray, multiprobe_bits: int
) -> list[int]:
    """Query bucket plus all buckets within `multiprobe_bits` sign flips."""
    qv = np.asarray(query_vec, dtype=np.float64)
    n_planes = planes.shape[0]
    qsig = 0
    for i, plane in enumerate(planes):
        if float(qv @ plane) > 0:
            qsig |= 1 << i
    probe = {qsig}
    if multiprobe_bits >= 1:
        probe.update(qsig ^ (1 << i) for i in range(n_planes))
    if multiprobe_bits >= 2:
        for i in range(n_planes):
            for j in range(i + 1, n_planes):
                probe.add(qsig ^ (1 << i) ^ (1 << j))
    return sorted(probe)


def lsh_bucketed_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    multiprobe_bits: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: probe the query's sign-LSH bucket plus all buckets within
    `multiprobe_bits` Hamming distance, recomputing buckets over a full scan
    (the ad-hoc path). For the 100 TB path write the table once with
    write_lsh_bucketed() and probe with lsh_bucketed_topk_stored() — the
    bucket filter becomes parquet PARTITION PRUNING instead of a scan."""
    planes = _hyperplanes(len(query_vec), n_planes, seed)
    probe = _lsh_probe_set(query_vec, planes, multiprobe_bits)
    bucketed = df.withColumn("bucket", signature_col(vec_col, planes))
    cand = bucketed.filter(F.col("bucket").isin(probe))
    return (
        cosine_to_query(cand, query_vec, vec_col)
        .select(F.col(id_col), "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def write_lsh_bucketed(
    df: DataFrame,
    path: str,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
    mode: str = "overwrite",
) -> None:
    """Materialize the embedding table partitionBy(bucket) — sign-LSH cell
    as a PHYSICAL partition column. One shuffle-free pass (bucket is a
    native per-row expression); every stored-probe query afterwards reads
    only the probed partitions (O(probed cells / 2^n_planes) of the data)
    instead of scanning and hashing the full table."""
    planes = _hyperplanes_dim(df, vec_col, n_planes, seed)
    df.withColumn("bucket", signature_col(vec_col, planes)).write.mode(
        mode
    ).partitionBy("bucket").parquet(path)


def _hyperplanes_dim(
    df: DataFrame, vec_col: str, n_planes: int, seed: int
) -> np.ndarray:
    """Planes for a DataFrame whose vector width comes from the schema-level
    contract (TESTDATA.md: fixed-dim array) — sniffed once per write."""
    first = df.select(F.size(vec_col).alias("d")).first()
    return _hyperplanes(int(first["d"]) if first else 0, n_planes, seed)


def lsh_bucketed_topk_stored(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    multiprobe_bits: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a write_lsh_bucketed() table: `bucket` is a partition column, so
    the IN-filter is evaluated against directory names (PartitionFilters in
    the scan node — asserted by tests/test_plans.py), never against row
    data. Identical results to lsh_bucketed_topk by construction (same
    planes, same probe set, exact cosine re-rank)."""
    planes = _hyperplanes(len(query_vec), n_planes, seed)
    probe = _lsh_probe_set(query_vec, planes, multiprobe_bits)
    cand = spark.read.parquet(path).filter(F.col("bucket").isin(probe))
    return (
        cosine_to_query(cand, query_vec, vec_col)
        .select(F.col(id_col), "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def pairwise_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs: bucket self-join (same sign-LSH bucket) →
    exact cosine ≥ threshold. The bucket key bounds the join fan-out.

    Pass `dim` explicitly when known (schema-level constant) — the fallback
    sniff costs a driver action."""
    if dim is None:
        first = df.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"]) if first else 0
    planes = _hyperplanes(dim, n_planes, seed)
    b = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("bucket", signature_col("v", planes))
    a1 = b.alias("a")
    a2 = b.alias("b")
    pairs = a1.join(
        a2,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vid") < F.col("b.vid")),
    ).select(
        F.col("a.vid").alias("id_a"),
        F.col("b.vid").alias("id_b"),
        (
            _dot(F.col("a.v"), F.col("b.v"))
            / (_norm(F.col("a.v")) * _norm(F.col("b.v")))
        ).alias("cos_raw"),
    )
    return (
        pairs.withColumn("cosine", F.round(F.col("cos_raw"), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the second scale path next to sign-LSH. The
# vector space is partitioned into nlist Voronoi cells around trained
# centroids; each vector is assigned to its nearest centroid (one int col —
# at scale the table is written partitioned/bucketed by it), and a query
# scans only the nprobe cells nearest to the query vector. Training is a
# deterministic seeded k-means on a driver-side sample (centroids are tiny:
# nlist × dim floats — broadcast as plan literals); assignment is a native
# expression (array of centroid dots → array_position of the max), so the
# scan stays inside codegen with no Python in the row path.
# ---------------------------------------------------------------------------


def train_ivf_centroids(
    sample: np.ndarray, nlist: int = 16, iters: int = 8, seed: int = 42
) -> np.ndarray:
    """Deterministic k-means (seeded init, fixed iterations) over a sample
    matrix (n × dim). Empty cells re-seed to the farthest points — stable
    under the fixed seed. Returns (nlist × dim) float64, L2-normalized so
    max-dot == nearest-cosine assignment."""
    rng = np.random.default_rng(seed)
    x = np.asarray(sample, dtype=np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    idx = rng.choice(x.shape[0], size=min(nlist, x.shape[0]), replace=False)
    cent = x[np.sort(idx)].copy()
    for _ in range(iters):
        sims = x @ cent.T
        assign = np.argmax(sims, axis=1)
        for c in range(cent.shape[0]):
            members = x[assign == c]
            if len(members):
                m = members.mean(axis=0)
                cent[c] = m / max(np.linalg.norm(m), 1e-12)
            else:  # re-seed an empty cell to the worst-covered point
                worst = int(np.argmin(np.max(sims, axis=1)))
                cent[c] = x[worst]
    return cent


def ivf_cell_col(vec_col: str, centroids: np.ndarray) -> Column:
    """Native assignment expression: 0-based index of the max-dot centroid
    (first occurrence on ties — matched by the DuckDB oracle's
    list_position semantics)."""
    v = F.col(vec_col).cast("array<double>")
    dots = F.array(
        *[
            _dot(v, F.array(*[F.lit(float(x)) for x in c]))
            for c in centroids
        ]
    )
    return (F.array_position(dots, F.array_max(dots)) - F.lit(1)).cast("int")


def _ivf_probe_cells(
    query_vec: list[float], centroids: np.ndarray, nprobe: int
) -> list[int]:
    qv = np.asarray(query_vec, dtype=np.float64)
    sims = centroids @ (qv / max(np.linalg.norm(qv), 1e-12))
    return [int(c) for c in np.argsort(-sims, kind="stable")[:nprobe]]


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: scan only the nprobe cells whose centroids are nearest
    the query (computed driver-side — centroids are driver-resident), exact
    cosine within them, recomputing cell assignment over a full scan (the
    ad-hoc path). The 100 TB path is write_ivf() once + ivf_topk_stored():
    the cell filter becomes parquet partition pruning."""
    probe = _ivf_probe_cells(query_vec, centroids, nprobe)
    cells = df.withColumn("ivf_cell", ivf_cell_col(vec_col, centroids))
    cand = cells.filter(F.col("ivf_cell").isin(probe))
    return (
        cosine_to_query(cand, query_vec, vec_col)
        .select(F.col(id_col), "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def write_ivf(
    df: DataFrame,
    path: str,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    mode: str = "overwrite",
) -> None:
    """Materialize the embedding table partitionBy(ivf_cell). Cell
    assignment is the native max-dot expression — one shuffle-free pass;
    stored probes then read nprobe/nlist of the data via directory pruning."""
    df.withColumn("ivf_cell", ivf_cell_col(vec_col, centroids)).write.mode(
        mode
    ).partitionBy("ivf_cell").parquet(path)


def ivf_topk_stored(
    spark,
    path: str,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a write_ivf() table: the ivf_cell IN-filter is evaluated
    against partition directories (PartitionFilters), not row data. Results
    identical to ivf_topk by construction (same centroids, same probe
    order, exact cosine re-rank)."""
    probe = _ivf_probe_cells(query_vec, centroids, nprobe)
    cand = spark.read.parquet(path).filter(F.col("ivf_cell").isin(probe))
    return (
        cosine_to_query(cand, query_vec, vec_col)
        .select(F.col(id_col), "cosine")
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )
