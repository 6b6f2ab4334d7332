"""Graph-traversal operators over a derived edge table.

The reference models artists/labels/releases as a Neo4j property graph and
serves traversal queries over it: degree counting
(/root/reference/api/queries/rarity_queries.py:274-284), shared-credit
self-joins (/root/reference/api/queries/credits_queries.py:97-152), and
2-hop collaborator expansion with NOT-EXISTS exclusion of direct partners
(/root/reference/api/queries/network_queries.py:49-54).

Spark-first restatement: the graph is an EDGE TABLE (src, dst) derived from
the relational tables (customer→part via orders⨝lineitem — the bipartite
"credited on the same work" analog). Traversals are joins:

- degree: one groupBy — map-side combined, single shuffle on src;
- 1-hop partnership (share ≥1 dst): self-join on dst;
- 2-hop with exclusion: two self-joins + a left_anti (NOT EXISTS) —
  distributed BFS frontier expansion, one shuffle per hop;
- shared-pair strength: self-join on dst with a dst-degree skew cap (the
  same hot-key discipline as the shingle join in dedup.py) then groupBy
  pair — bounded fan-out even when one dst touches millions of srcs.

At 10^12-edge scale the edge table is bucketed by dst so every self-join
below co-locates without a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edges_customer_part(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Bipartite edge table (src=custkey, dst=partkey): customer ordered
    part. Distinct — edges are unweighted."""
    return (
        orders.select(F.col("o_orderkey").alias("ok"), F.col("o_custkey").alias("src"))
        .join(
            lineitem.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst")),
            "ok",
        )
        .select("src", "dst")
        .distinct()
    )


def degree_counts(edges: DataFrame, top: int = 20) -> DataFrame:
    """(src, degree) — distinct-neighbor degree per source, top-N by
    (degree DESC, src ASC). The rarity 'haves' count restated
    (rarity_queries.py:274-284)."""
    return (
        edges.groupBy("src")
        .agg(F.count("*").cast("long").alias("degree"))
        .orderBy(F.desc("degree"), F.asc("src"))
        .limit(top)
    )


def one_hop_partners(edges: DataFrame, anchor: int) -> DataFrame:
    """Distinct sources sharing at least one dst with `anchor` (excluding
    it) — the direct-collaborator set."""
    mine = edges.filter(F.col("src") == anchor).select("dst")
    return (
        edges.join(F.broadcast(mine), "dst")
        .filter(F.col("src") != anchor)
        .select("src")
        .distinct()
    )


def two_hop_exclusion(edges: DataFrame, anchor: int) -> DataFrame:
    """Sources reachable in exactly two partnership hops from `anchor`:
    partners-of-partners that are NOT direct partners and not the anchor —
    the reference's 2-hop expansion with NOT-EXISTS exclusion
    (network_queries.py:49-54). Frontier expansion = join per hop;
    exclusion = left_anti (no row materialization of the NOT EXISTS)."""
    hop1 = one_hop_partners(edges, anchor)  # frontier 1
    # partners of the frontier: edges of hop1 members → dst set → srcs
    hop1_dsts = edges.join(hop1, "src").select("dst").distinct()
    reach2 = (
        edges.join(hop1_dsts, "dst")
        .filter(F.col("src") != anchor)
        .select("src")
        .distinct()
    )
    return reach2.join(hop1, "src", "left_anti").orderBy("src")


def shared_pair_strength(
    edges: DataFrame, min_shared: int = 2, max_dst_degree: int = 10_000
) -> DataFrame:
    """(src_a, src_b, shared) pairs sharing ≥ min_shared dsts — the
    shared-credits self-join (credits_queries.py:97-152). dsts touching more
    than max_dst_degree sources are dropped first (hot-key cap): they add
    O(degree²) pair rows but almost no discrimination."""
    deg = edges.groupBy("dst").agg(F.count("*").alias("d"))
    pruned = (
        edges.join(deg, "dst").filter(F.col("d") <= max_dst_degree).select("src", "dst")
    )
    a, b = pruned.alias("a"), pruned.alias("b")
    return (
        a.join(b, (F.col("a.dst") == F.col("b.dst")) & (F.col("a.src") < F.col("b.src")))
        .groupBy(F.col("a.src").alias("src_a"), F.col("b.src").alias("src_b"))
        .agg(F.count("*").cast("long").alias("shared"))
        .filter(F.col("shared") >= min_shared)
        .orderBy(F.desc("shared"), F.asc("src_a"), F.asc("src_b"))
    )


class GraphSink:
    """Hash-gated graph table sink — the reference's Neo4j consumer restated
    for table storage (/root/reference/graphinator/batch_processor.py:438-571:
    `UNWIND $batch MERGE (node) SET ... WHERE hash changed`). Vertices and
    edges live as parquet snapshot tables; every upsert is the MERGE shape
    built from operators/upsert.py (content-hash anti-join → union), written
    atomically tmp+rename. At scale the snapshot is an Iceberg MERGE INTO on
    the same plan.
    """

    def __init__(self, path: str):
        self.path = path

    def _table(self, name: str) -> str:
        import os

        return os.path.join(self.path, name)

    def _upsert(self, name: str, incoming: DataFrame, id_col: str, payload: list[str]):
        import os
        import shutil

        from discogsography_spark.operators.upsert import (
            upsert_changed,
            with_content_hash,
        )

        spark = incoming.sparkSession
        inc = with_content_hash(incoming, payload)
        tgt = self._table(name)
        if os.path.isdir(tgt):
            current = spark.read.parquet(tgt)
        else:
            current = spark.createDataFrame([], inc.schema)
        snapshot, stats = upsert_changed(current, inc, id_col=id_col)
        tmp = tgt + "__tmp"
        snapshot.write.mode("overwrite").parquet(tmp)
        if os.path.isdir(tgt):
            shutil.rmtree(tgt)
        os.replace(tmp, tgt)
        return stats

    def upsert_vertices(self, vertices: DataFrame, id_col: str = "vid"):
        """vertices: (vid, label, props...) — hash over everything but vid."""
        payload = [c for c in vertices.columns if c != id_col]
        return self._upsert("vertices", vertices, id_col, payload)

    def upsert_edges(self, edges: DataFrame):
        """edges: (src, dst, rel, props...) — identity = (src, dst, rel)
        collapsed into one edge id column; hash over the props."""
        keyed = edges.withColumn(
            "eid", F.concat_ws("→", F.col("src"), F.col("dst"), F.col("rel"))
        )
        payload = [c for c in keyed.columns if c != "eid"]
        return self._upsert("edges", keyed, "eid", payload)
