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


def edges_customer_part(
    orders: DataFrame, lineitem: DataFrame, distinct: bool = True
) -> DataFrame:
    """Bipartite edge table (src=custkey, dst=partkey): customer ordered
    part. Distinct — edges are unweighted. `distinct=False` skips the
    global dedup exchange for consumers whose downstream operations are
    already set-based (e.g. two_hop_exclusion: every hop ends in a
    distinct/anti over small frontiers, so duplicate input edges cannot
    change the result and the corpus-sized shuffle is pure cost)."""
    edges = (
        orders.select(F.col("o_orderkey").alias("ok"), F.col("o_custkey").alias("src"))
        .join(
            lineitem.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("dst")),
            "ok",
        )
        .select("src", "dst")
    )
    return edges.distinct() if distinct else edges


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
    # materialize reused frontiers once (localCheckpoint): the edge table
    # feeds three joins and the hop-1 frontier two — without the
    # checkpoints each consumer re-derives the whole edge build (the
    # before-plan re-ran the orders⨝lineitem→distinct subtree six times)
    edges = edges.localCheckpoint(eager=True)
    hop1 = one_hop_partners(edges, anchor).localCheckpoint(eager=True)
    # partners of the frontier: edges of hop1 members → dst set → srcs.
    # Frontier sides are broadcast explicitly: anchored traversals have
    # frontiers bounded by the anchor's neighborhood (the same assumption
    # one_hop_partners makes for `mine`), and size estimates over a
    # checkpointed join are too poor for the planner to pick broadcast on
    # its own — without the hints each hop pays a full shuffle of the
    # edge table instead of a map-side hash probe.
    hop1_dsts = edges.join(F.broadcast(hop1), "src").select("dst").distinct()
    reach2 = (
        edges.join(F.broadcast(hop1_dsts), "dst")
        .filter(F.col("src") != anchor)
        .select("src")
        .distinct()
    )
    return reach2.join(F.broadcast(hop1), "src", "left_anti").orderBy("src")


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


def undirected_typed_edges(edges: DataFrame) -> DataFrame:
    """(src, src_type, dst, dst_type, rel) → symmetric closure. Cypher's
    `-[:R]-` matches both directions and type(r) is direction-independent
    (recommend_queries.py:421-424); the union restates that for an edge
    table."""
    fwd = edges.select("src", "src_type", "dst", "dst_type", "rel")
    rev = edges.select(
        F.col("dst").alias("src"),
        F.col("dst_type").alias("src_type"),
        F.col("src").alias("dst"),
        F.col("src_type").alias("dst_type"),
        "rel",
    )
    return fwd.unionAll(rev)


def explore_traversal(
    edges: DataFrame,
    start: str,
    hops: int = 2,
    keep_types: list[str] | None = None,
) -> DataFrame:
    """Variable-length traversal from `start` over a typed undirected edge
    table — the reference's Explore From Here discovery query
    (recommend_queries.py:400-442: `MATCH path = (start)-[*1..hops]-(d)`,
    DISTINCT discovered with path names, rel types and dist).

    Returns (id, type, dist, path): dist = SHORTEST path length (the
    reference's ORDER BY dist + DISTINCT keeps each node at its first,
    i.e. minimal, depth), path = the lexicographically smallest
    "n—REL→n—REL→n" string among shortest paths (the reference returns an
    arbitrary member; a total order makes the result reproducible and
    oracle-checkable). keep_types filters discovered node types (the
    reference keeps Artist/Label/Genre/Style and drops Release).

    Scale shape: each hop is frontier ⨝ edges — the frontier starts at one
    node, so the per-hop join broadcasts the frontier; nothing corpus-wide
    is ever shuffled. Hot intermediate nodes (the "Rock genre" problem)
    inflate the frontier multiplicatively — the reference answers with
    LIMIT 100; at 10^12 edges cap the frontier per hop (top-N by node id)
    or pre-drop super-nodes as in shared_pair_strength's max_dst_degree.
    """
    und = undirected_typed_edges(edges)
    frontier = und.where(F.col("src") == start).select(
        F.col("dst").alias("id"),
        F.col("dst_type").alias("type"),
        F.lit(1).alias("dist"),
        F.concat_ws("", F.lit(start + "—"), F.col("rel"), F.lit("→"), F.col("dst")).alias("path"),
    )
    layers = [frontier]
    for depth in range(2, hops + 1):
        prev = layers[-1].select("id", "path").distinct()
        nxt = (
            und.join(F.broadcast(prev.withColumnRenamed("id", "src")), "src")
            .where(F.col("dst") != F.lit(start))
            .select(
                F.col("dst").alias("id"),
                F.col("dst_type").alias("type"),
                F.lit(depth).alias("dist"),
                F.concat_ws(
                    "", F.col("path"), F.lit("—"), F.col("rel"), F.lit("→"), F.col("dst")
                ).alias("path"),
            )
        )
        layers.append(nxt)
    allr = layers[0]
    for l in layers[1:]:
        allr = allr.unionAll(l)
    if keep_types:
        allr = allr.where(F.col("type").isin(keep_types))
    dmin = allr.groupBy("id", "type").agg(F.min("dist").alias("dist"))
    return (
        allr.join(dmin, ["id", "type", "dist"])
        .groupBy("id", "type", "dist")
        .agg(F.min("path").alias("path"))
    )


def score_discoveries(
    discovered: DataFrame,
    taste: DataFrame,
    blindspots: DataFrame,
    genre_type: str = "brand",
    style_type: str = "nation",
    item_types: tuple[str, ...] = ("supplier", "customer"),
    k: int = 10,
) -> DataFrame:
    """Taste-aware ranking of traversal discoveries — the reference's
    score_discoveries (recommend_queries.py:445-499) as one declarative
    projection:

    - genre-typed node: 1.0 if a blind spot else the user's taste share;
    - style-typed node: 1.0 if a blind spot else 0;
    - item-typed node (artist/label analog): 1/dist;
    - blind-spot genre/style rows get a ×1.5 boost and reason
      'blind_spot_boost', everything else 'graph_proximity'.

    taste: (value, share) — the user's normalized affinity vector;
    blindspots: (value) — values absent from the user's history. Both are
    user-sized → broadcast; the discovered set is already tiny.
    Returns (id, type, dist, score, reason, path) ordered
    (score DESC, id ASC) limit k.
    """
    t = F.broadcast(taste.select(F.col("value").alias("id"), "share"))
    b = F.broadcast(
        blindspots.select(F.col("value").alias("id")).withColumn(
            "_bs", F.lit(True)
        )
    )
    d = discovered.join(t, "id", "left").join(b, "id", "left")
    is_bs = F.col("_bs").isNotNull()
    base = (
        F.when((F.col("type") == genre_type) & is_bs, F.lit(1.0))
        .when(
            F.col("type") == genre_type,
            F.coalesce(F.col("share"), F.lit(0.0)),
        )
        .when((F.col("type") == style_type) & is_bs, F.lit(1.0))
        .when(F.col("type") == style_type, F.lit(0.0))
        .when(
            F.col("type").isin(list(item_types)),
            F.lit(1.0) / F.col("dist").cast("double"),
        )
        .otherwise(F.lit(0.0))
    )
    boosted = F.when(
        F.col("type").isin([genre_type, style_type]) & is_bs,
        base * F.lit(1.5),
    ).otherwise(base)
    reason = F.when(
        F.col("type").isin([genre_type, style_type]) & is_bs,
        F.lit("blind_spot_boost"),
    ).otherwise(F.lit("graph_proximity"))
    return (
        d.select(
            "id",
            "type",
            F.col("dist").cast("long").alias("dist"),
            F.round(boosted, 4).alias("score"),
            reason.alias("reason"),
            "path",
        )
        .orderBy(F.desc("score"), F.asc("id"))
        .limit(k)
    )
