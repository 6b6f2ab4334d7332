"""Determinism under parallelism change: the index content (and therefore all
BM25 ranks) must be identical when built at different partition counts —
SURVEY.md §7 hard part 5. This is the sandbox evidence that N-executor and
4N-executor cluster builds agree."""

from __future__ import annotations

import os

import pandas as pd

from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.index.docids import assign_doc_ids


def test_doc_ids_invariant_to_partition_count(spark, corpus_dir):
    transcripts = spark.read.parquet(os.path.join(corpus_dir, "transcripts.parquet"))
    a = (
        assign_doc_ids(transcripts, num_partitions=2)
        .select("conv_id", "turn_idx", "doc_id")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        assign_doc_ids(transcripts, num_partitions=13)
        .select("conv_id", "turn_idx", "doc_id")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    # dense 0..N-1, and equals pandas dense rank over the stable sort
    n = len(a)
    assert list(a["doc_id"]) == list(range(n))
    expected = (
        pd.read_parquet(os.path.join(corpus_dir, "transcripts.parquet"))
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert (a["conv_id"].to_numpy() == expected["conv_id"].to_numpy()).all()
    assert (a["turn_idx"].to_numpy() == expected["turn_idx"].to_numpy()).all()


def test_index_identical_across_parallelism(spark, corpus_dir, built_index, tmp_path):
    """Rebuild with different shuffle partitioning + different salt count —
    postings bytes must be identical (salting is loss-free + order-stable)."""
    transcripts = spark.read.parquet(
        os.path.join(corpus_dir, "transcripts.parquet")
    ).repartition(7)
    idx_dir = str(tmp_path / "idx_par")
    builder = IndexBuilder(
        idx_dir, num_segments=4, head_df_threshold=200, head_salts=2
    )
    builder.build(transcripts)

    cols = ["term", "seg", "df", "cf", "doc_blob", "tf_blob", "dl_blob"]
    a = (
        spark.read.parquet(os.path.join(idx_dir, "segments"))
        .select(*cols)
        .toPandas()
        .sort_values(["seg", "term"])
        .reset_index(drop=True)
    )
    b = (
        spark.read.parquet(os.path.join(built_index, "segments"))
        .select(*cols)
        .toPandas()
        .sort_values(["seg", "term"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
