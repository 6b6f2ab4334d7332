"""Distributed connected components + duplicate-cluster resolution.

Near-dup detectors (MinHash-LSH, SimHash, n-gram Jaccard — `operators/
dedup.py`) emit PAIRS; an actual dedup pipeline must then resolve pairs into
clusters and keep one canonical document per cluster (similarity is not
transitive, so clusters must come from graph connectivity, not from the
pairs alone). The reference's dedup analog is exact-hash only
(tableinator/batch_processor.py:453-479 — per-row SHA-256 skip), so this is
the scale-path generalization, not a port.

`connected_components` implements the alternating large-star / small-star
algorithm (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC 2014) on DataFrames:

- each round is two groupBy-min + join passes over the edge set — no
  per-node adjacency lists are ever materialized (no collect_list), so a
  hot node with millions of neighbors is just a big group for a min()
  aggregate, which Spark partial-aggregates map-side;
- edges always point large→small and are kept distinct, so the edge set
  only shrinks or re-targets — it never blows up mid-round;
- converges in O(log n) rounds on real graphs (near-cliques from dedup
  converge in 2-3); every round ends in an eager localCheckpoint so the
  lineage (and the plan Catalyst must optimize) stays constant-size
  regardless of round count;
- at convergence every edge is (node, component_min) — the component label
  IS the smallest member id, which is deterministic and engine-independent
  (a recursive-CTE oracle can reproduce it exactly).

The driver-side loop is the standard Spark pattern for iterative graph
algorithms (GraphFrames/GraphX do the same); only O(1) booleans cross the
driver per round — never row data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected input → distinct directed edges (u, v) with v < u."""
    e = edges.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    ).filter(F.col("a") != F.col("b"))
    return (
        e.select(
            F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
        ).distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node reachable through `edges` with its component's
    minimum node id.

    Returns (node: long, component: long) with one row per distinct node in
    the edge set — including the roots themselves (component == node).
    Raises if the star-contraction has not converged after max_iter rounds
    (each round at least halves tree heights, so 25 covers any graph that
    fits in an exabyte).
    """
    e = _canonical_edges(edges, src, dst).localCheckpoint(eager=True)
    if e.isEmpty():
        return e.select(
            F.col("u").alias("node"), F.col("v").alias("component")
        )

    def _sig(df: DataFrame):
        # one-pass commutative signature of the distinct edge set: count +
        # 64-bit hash sum + coordinate sums. Used only to SKIP the exact
        # comparison on rounds that clearly changed; equality is always
        # confirmed by exceptAll before declaring convergence.
        dec = "decimal(38,0)"  # exact wide sums — xxhash64 sums overflow long
        row = df.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("u", "v").cast(dec)).alias("h"),
            F.sum(F.col("u").cast(dec)).alias("su"),
            F.sum(F.col("v").cast(dec)).alias("sv"),
        ).first()
        return (row["n"], row["h"], row["su"], row["sv"])

    sig = _sig(e)
    for _ in range(max_iter):
        # -- large-star: for every node x over the SYMMETRIZED graph,
        #    m = min(N(x) ∪ {x}); connect each strictly-larger neighbor to m.
        sym = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("u", "mn").alias("m"))
        )
        lg = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # -- small-star: edges now all point large→small; for every node u,
        #    m = min(N(u)); connect u and every other small neighbor to m.
        mins2 = lg.groupBy("u").agg(F.min("v").alias("m"))
        sm_self = mins2.select("u", F.col("m").alias("v"))
        sm_nbr = (
            lg.join(mins2, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        e_new = (
            sm_self.unionByName(sm_nbr)
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)  # truncate lineage every round
        )
        # converged when the (distinct, canonical-direction) edge set is
        # unchanged. The cheap signature rules out inequality in one
        # aggregate pass; only a signature MATCH pays the exact exceptAll
        # confirmation (at that point the set is a star forest — one row
        # per non-root node, far smaller than the input pair set).
        sig_new = _sig(e_new)
        converged = sig_new == sig and (
            e_new.exceptAll(e).limit(1).isEmpty()
            and e.exceptAll(e_new).limit(1).isEmpty()
        )
        e, sig = e_new, sig_new
        if converged:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )

    roots = e.select(F.col("v").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return (
        e.select(F.col("u").alias("node"), F.col("v").alias("component"))
        .unionByName(roots)
        .distinct()
    )


def resolve_duplicates(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
    order_cols: list | None = None,
) -> DataFrame:
    """Assign every document its duplicate-cluster id and mark the one
    canonical survivor per cluster.

    Docs untouched by any pair form singleton clusters (component_id ==
    their own id, canonical). Canonical choice: the component minimum by
    default (deterministic, engine-reproducible); pass `order_cols` (e.g.
    [F.col("quality").desc(), F.col(id_col)]) to keep the best-quality
    member instead. Returns docs + (component_id, is_canonical)."""
    cc = connected_components(pairs, src=src, dst=dst).withColumnRenamed(
        "node", id_col
    )
    out = (
        docs.join(cc, id_col, "left")
        .withColumn("component_id", F.coalesce("component", F.col(id_col)))
        .drop("component")
    )
    if order_cols is None:
        out = out.withColumn(
            "is_canonical", F.col(id_col) == F.col("component_id")
        )
    else:
        w = Window.partitionBy("component_id").orderBy(*order_cols)
        out = out.withColumn(
            "is_canonical", F.row_number().over(w) == F.lit(1)
        )
    return out


def keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
    order_cols: list | None = None,
) -> DataFrame:
    """The end-to-end dedup step: docs minus non-canonical cluster members,
    original schema preserved."""
    resolved = resolve_duplicates(
        docs, pairs, id_col=id_col, src=src, dst=dst, order_cols=order_cols
    )
    return resolved.filter(F.col("is_canonical")).drop(
        "component_id", "is_canonical"
    )
