"""Recommendation engine: sparse-profile cosine similarity + multi-signal merge.

Grafts the computable core of the reference's recommendation layer
(/root/reference/api/queries/recommend_queries.py) into declarative Spark:

- profile_cosine_topk: the "similar artists" engine
  (recommend_queries.py:215-268 compute_similar_artists +
  get_candidate_artists:146-199). Entities are profiled as sparse
  count-vectors over several dimensions (the reference's
  genre/style/label/collaborator, each built by one aggregate Cypher query);
  candidates are entities sharing values on a seed dimension with the target
  (capped like the reference's LIMIT 200 / MIN_ARTIST_RELEASES guards, but
  with a deterministic tiebreak); each candidate is scored by a weighted sum
  of per-dimension cosine similarities (weights 0.35/0.25/0.25/0.15,
  recommend_queries.py:20-26).

- merge_signal_candidates: the "enhanced recommendations" merger
  (recommend_queries.py:281-330 merge_recommendation_candidates). Candidate
  lists from independent signals are max-normalized per signal
  (_normalize_scores:271-278), blended with signal weights
  (0.35/0.25/0.25, :28-33), and an obscurity bonus
  0.15 * (1 - collectors/max_collectors) is added (:320-326, fewer
  collectors = higher bonus; ids missing from the collector map score 0
  bonus, matching the reference's collectors=max default).

Scale notes (the 100 TB shape):
- Profiles are long-format (entity, dim, value, cnt) — one shuffle per
  dimension to build, all downstream joins are equi-joins on (dim, value).
- The target's own profile and the capped candidate list are broadcast; the
  corpus-sized profile relation is only ever filtered by broadcast semi-join
  and hash-joined against the tiny target profile — no cartesian, no
  corpus-wide window.
- Counts are integers, so dot products and squared norms are EXACT in
  doubles (< 2^53); the only float ops are one sqrt/divide per
  (entity, dim) and one fixed-order weighted sum — bit-reproducible across
  engines, which is what lets the DuckDB oracle hash-match.
- The reference's mega-genre caps (per-genre LIMIT 500, inner scan cap
  100K, recommend_queries.py:160-191) are the skew guards; here the analog
  is `hot_value_cap`, which drops profile values whose entity fan-out
  exceeds the cap (the same "don't traverse Rock" decision, but applied
  declaratively before the join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_cosine_topk(
    profiles: DataFrame,
    target_id,
    dim_weights: list[tuple[str, float]],
    k: int = 20,
    candidate_dim: str | None = None,
    min_shared: int = 3,
    candidate_cap: int = 200,
    hot_value_cap: int | None = None,
    entity_col: str = "entity",
) -> DataFrame:
    """Rank entities by weighted per-dimension cosine similarity to a target.

    profiles: long-format DataFrame (entity, dim: string, value: string,
    cnt: integral). Returns (entity, similarity, sim_<dim>..., shared_count)
    ordered (similarity DESC, entity ASC), limit k.

    candidate_dim: the seed dimension used for candidate generation (the
    reference seeds on shared genres). Defaults to the first weighted dim.
    min_shared / candidate_cap mirror MIN_ARTIST_RELEASES / LIMIT 200 with a
    deterministic (shared DESC, entity ASC) tiebreak.
    """
    dims = [d for d, _ in dim_weights]
    if candidate_dim is None:
        candidate_dim = dims[0]
    e = F.col(entity_col)
    prof = profiles.select(
        e.alias("_ent"),
        F.col("dim"),
        F.col("value"),
        F.col("cnt").cast("long").alias("cnt"),
    ).where(F.col("dim").isin(dims))

    if hot_value_cap is not None:
        # Skew guard: drop (dim, value) keys whose entity fan-out exceeds the
        # cap before any join touches them (the reference's mega-genre caps).
        hot = (
            prof.groupBy("dim", "value")
            .agg(F.countDistinct("_ent").alias("fanout"))
            .where(F.col("fanout") > hot_value_cap)
            .select("dim", "value")
        )
        prof = prof.join(F.broadcast(hot), ["dim", "value"], "left_anti")

    # One entity's profile is bounded (its distinct values per dim), so it
    # broadcasts; everything corpus-sized stays on the build side.
    tgt = (
        prof.where(F.col("_ent") == F.lit(target_id))
        .select("dim", "value", F.col("cnt").alias("tcnt"))
    )

    # Candidate generation: entities sharing candidate_dim values with the
    # target, scored by the candidate's own count mass on the shared values
    # (the reference's shared_count), thresholded and capped deterministically.
    cand = (
        prof.where(F.col("dim") == candidate_dim)
        .where(F.col("_ent") != F.lit(target_id))
        .join(
            F.broadcast(tgt.where(F.col("dim") == candidate_dim)),
            ["dim", "value"],
        )
        .groupBy("_ent")
        .agg(F.sum("cnt").alias("shared_count"))
        .where(F.col("shared_count") >= min_shared)
        # LIMIT 200 analog — orderBy+limit plans as TakeOrderedAndProject
        # (per-partition top-N then merge), not a single-partition window.
        .orderBy(F.desc("shared_count"), F.asc("_ent"))
        .limit(candidate_cap)
    )

    cand_prof = prof.join(
        F.broadcast(cand.select("_ent")), "_ent", "left_semi"
    )

    # Integer dot products and squared norms — exact in doubles.
    dots = (
        cand_prof.join(F.broadcast(tgt), ["dim", "value"])
        .groupBy("_ent", "dim")
        .agg(F.sum(F.col("cnt") * F.col("tcnt")).alias("dot"))
    )
    cnorm = cand_prof.groupBy("_ent", "dim").agg(
        F.sum(F.col("cnt") * F.col("cnt")).alias("n2")
    )
    tnorm = tgt.groupBy("dim").agg(
        F.sum(F.col("tcnt") * F.col("tcnt")).alias("t2")
    )

    sims = (
        cnorm.join(dots, ["_ent", "dim"], "left")
        .join(F.broadcast(tnorm), "dim")
        .select(
            "_ent",
            "dim",
            (
                F.coalesce(F.col("dot"), F.lit(0)).cast("double")
                / F.sqrt(F.col("n2").cast("double") * F.col("t2").cast("double"))
            ).alias("sim"),
        )
    )

    # Pivot to fixed dim columns so the weighted sum has a fixed evaluation
    # order (bit-reproducible vs the SQL oracle).
    wide = sims.groupBy("_ent").pivot("dim", dims).agg(F.first("sim"))
    score = None
    for d, w in dim_weights:
        term = F.lit(float(w)) * F.coalesce(F.col(d), F.lit(0.0))
        score = term if score is None else score + term
    out = (
        wide.join(F.broadcast(cand), "_ent")
        .select(
            F.col("_ent").alias(entity_col),
            F.round(score, 6).alias("similarity"),
            *[
                F.round(F.coalesce(F.col(d), F.lit(0.0)), 4).alias(f"sim_{d}")
                for d in dims
            ],
            F.col("shared_count").cast("long").alias("shared_count"),
        )
        .where(F.col("similarity") > 0.0)
        .orderBy(F.desc("similarity"), F.asc(entity_col))
        .limit(k)
    )
    return out


def merge_signal_candidates(
    signals: list[tuple[str, float, DataFrame]],
    collectors: DataFrame | None = None,
    obscurity_weight: float = 0.15,
    k: int = 20,
    id_col: str = "id",
) -> DataFrame:
    """Blend per-signal candidate lists into one ranked recommendation list.

    signals: [(source_name, weight, DataFrame(id, score))]. Each signal's
    scores are max-normalized to [0, 1] (recommend_queries.py:271-278), then
    blended as a fixed-order weighted sum. collectors: optional
    DataFrame(id, collectors) for the obscurity bonus
    (recommend_queries.py:320-326): ids absent from `collectors` get
    collectors = max (bonus 0), matching the reference.

    Returns (id, score, reasons) ordered (score DESC, id ASC) limit k, with
    `reasons` the sorted comma-joined source names that proposed the id.
    """
    normed = []
    for name, weight, df in signals:
        mx = df.agg(F.max(F.col("score").cast("double")).alias("_mx"))
        nd = (
            df.crossJoin(F.broadcast(mx))  # 1-row stats table
            .select(
                F.col(id_col).alias("_id"),
                F.when(
                    F.col("_mx") > 0,
                    F.col("score").cast("double") / F.col("_mx"),
                )
                .otherwise(F.col("score").cast("double"))
                .alias(f"s_{name}"),
            )
        )
        normed.append((name, weight, nd))

    merged = None
    for name, _w, nd in normed:
        merged = nd if merged is None else merged.join(nd, "_id", "full_outer")

    blended = None
    for name, w, _nd in normed:
        term = F.lit(float(w)) * F.coalesce(F.col(f"s_{name}"), F.lit(0.0))
        blended = term if blended is None else blended + term
    reasons = F.array_join(
        F.array_sort(
            F.filter(
                F.array(
                    *[
                        F.when(
                            F.col(f"s_{name}").isNotNull(), F.lit(name)
                        )
                        for name, _w, _nd in normed
                    ]
                ),
                lambda x: x.isNotNull(),
            )
        ),
        ",",
    )
    out = merged.select(
        F.col("_id").alias(id_col),
        blended.alias("_base"),
        reasons.alias("reasons"),
    )

    if collectors is not None and obscurity_weight > 0:
        coll = collectors.select(
            F.col(id_col).alias("_id"),
            F.col("collectors").cast("double").alias("_coll"),
        )
        # max over the CANDIDATE set only, as the reference computes it over
        # the collector_counts it fetched for the merged ids.
        cand_coll = out.select(F.col(id_col).alias("_id")).join(
            coll, "_id", "left"
        )
        mx = cand_coll.agg(F.max("_coll").alias("_mxc"))
        bonus = (
            cand_coll.crossJoin(F.broadcast(mx))
            .select(
                "_id",
                F.when(
                    F.col("_mxc") > 0,
                    F.lit(float(obscurity_weight))
                    * (
                        F.lit(1.0)
                        - F.coalesce(F.col("_coll"), F.col("_mxc"))
                        / F.col("_mxc")
                    ),
                )
                .otherwise(F.lit(0.0))
                .alias("_bonus"),
            )
        )
        out = (
            out.withColumnRenamed(id_col, "_id")
            .join(bonus, "_id")
            .select(
                F.col("_id").alias(id_col),
                (F.col("_base") + F.col("_bonus")).alias("_base"),
                "reasons",
            )
        )

    return (
        out.select(
            id_col,
            F.round(F.col("_base"), 6).alias("score"),
            "reasons",
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
