"""Scale contracts, enforced on physical plans: predicate pushdown reaches
the parquet scan, query-term lookup prunes segments, small dimensions
broadcast, and hot paths stay inside whole-stage codegen."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from discogsography_spark.plans.inspect import explain_str, plan_report

SF_DIR = "/root/testdata/sf0.001"


def test_term_filter_pushed_to_segment_scan(spark, built_index):
    from discogsography_spark.query.engine import DistributedQueryEngine

    eng = DistributedQueryEngine(spark, built_index)
    terms = ["spark", "index"]
    decoded = eng._decoded_postings_df(terms)
    assert decoded is not None
    s = explain_str(decoded)
    assert "PushedFilters" in s and "In(term" in s, s


def test_segment_pruning_reads_only_matching_shards(built_index):
    from discogsography_spark.index.builder import term_segment
    from discogsography_spark.query.engine import IndexMeta

    meta = IndexMeta(built_index)
    seg_map = meta.seg_dirs_for_terms(["spark"])
    assert set(seg_map) == {term_segment("spark", meta.num_segments)}


def test_bm25_dataframe_plan_shape(spark):
    """Round-7 two-pass literal contract: the candidate scan plan has NO
    joins and NO exchanges (stats are collected scalars; tf is map-side),
    and the global top-k is a heap-merge TakeOrderedAndProject."""
    from discogsography_spark.query.dataframe_bm25 import bm25_topk_dataframe

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    top = bm25_topk_dataframe(docs, "table value", k=10)
    s = explain_str(top, "simple")
    assert "TakeOrderedAndProject" in s, "global top-k must be heap-merge, not full sort"
    assert "Exchange" not in s, f"candidate scan must be shuffle-free: {s}"
    assert "Join" not in s, f"candidate scan must be join-free: {s}"
    assert "CartesianProduct" not in s


def test_broadcast_join_for_small_dim(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    j = orders.join(customer, orders.o_custkey == customer.c_custkey).join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    )
    rep = plan_report(j)
    assert rep["has_broadcast_join"]


def test_filter_pushdown_documents(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    q = docs.filter(F.col("lang") == "en").select("doc_id", "n_chars")
    s = explain_str(q)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in s
    # column pruning: scan schema should not include `text`
    assert "text" not in s.split("ReadSchema")[-1]


def test_dup_pairs_plan_has_no_cartesian(spark):
    """The graded embedding near-dup entry must plan as an equi-join on the
    LSH bucket key — never a cartesian / broadcast-nested-loop shape."""
    import __spark_entry__ as entry

    df = entry.queries()["embedding_dup_pairs"](spark, SF_DIR)
    s = explain_str(df, "simple")
    assert "CartesianProduct" not in s, s
    assert "BroadcastNestedLoopJoin" not in s, s
    assert "bucket" in s


def test_graph_2hop_uses_anti_join(spark):
    import __spark_entry__ as entry

    df = entry.queries()["graph_2hop_exclusion"](spark, SF_DIR)
    s = explain_str(df, "simple")
    assert "LeftAnti" in s, "NOT-EXISTS exclusion must be a left_anti join"
    assert "CartesianProduct" not in s


def test_offset_pagination_plan(spark):
    import __spark_entry__ as entry

    df = entry.queries()["page_offset_orders"](spark, SF_DIR)
    s = explain_str(df, "simple")
    # offset+limit collapse into one bounded global sort operator — no
    # full-result materialization before the cut
    assert "TakeOrderedAndProject" in s and "offset=100" in s, s


def test_ivf_filter_is_native(spark):
    """IVF cell assignment + probe filter must stay in native expressions
    (no Python UDF in the row path)."""
    import __spark_entry__ as entry

    df = entry.queries()["embedding_ivf_topk"](spark, SF_DIR)
    s = explain_str(df, "simple")
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s, s
    assert "TakeOrderedAndProject" in s


def test_prefix_expansion_plan_shape(spark):
    """Round-7 contract: after the capped driver-side vocabulary expansion,
    the prefix scoring plan is the shuffle-free two-pass candidate scan."""
    import __spark_entry__ as entry

    df = entry.queries()["fts_autocomplete_prefix"](spark, SF_DIR)
    s = explain_str(df, "simple")
    assert "TakeOrderedAndProject" in s
    assert "Exchange" not in s, f"candidate scan must be shuffle-free: {s}"


def test_pack_sequences_plan_has_no_single_partition_exchange(spark):
    """The packing cumsum must stay bucketed: the physical plan may shuffle
    by bucket (hashpartitioning(_b)) but must NEVER contain a
    SinglePartition exchange or a global (non-window-partitioned) sort —
    the single-reducer shape a naive Window.orderBy would produce."""
    from discogsography_spark.operators.packing import pack_sequences

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    counted = docs.select("doc_id", F.size(F.split("text", " ")).alias("n_tokens"))
    packed = pack_sequences(counted, 256, bucket=64)
    s = explain_str(packed, "simple")
    assert "SinglePartition" not in s, s
    assert "hashpartitioning(_b" in s, "cumsum window must partition by bucket"
    # contrast: the naive global window DOES produce the single-reducer plan
    from pyspark.sql.window import Window

    naive = counted.withColumn(
        "start",
        F.sum("n_tokens").over(
            Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
        ),
    )
    assert "SinglePartition" in explain_str(naive, "simple")
