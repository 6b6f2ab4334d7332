"""Resumability: a build killed mid-way resumes from the segment manifests
and produces an index identical to an uninterrupted build — the
StateMarker::pending_files discipline
(/root/reference/extractor/src/state_marker.rs:424-432) and the
send-then-commit ordering (/root/reference/extractor/src/extractor.rs:584-600).
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.index.manifest import Manifest


def _index_content(spark, index_dir: str) -> pd.DataFrame:
    df = (
        spark.read.parquet(os.path.join(index_dir, "segments"))
        .select("term", "seg", "df", "cf", "doc_blob", "tf_blob", "dl_blob")
        .toPandas()
        .sort_values(["seg", "term"])
        .reset_index(drop=True)
    )
    return df


def test_kill_and_resume_identical(spark, corpus_dir, built_index, tmp_path):
    transcripts = spark.read.parquet(os.path.join(corpus_dir, "transcripts.parquet"))
    idx_dir = str(tmp_path / "idx_resume")
    builder = IndexBuilder(idx_dir, num_segments=4, head_df_threshold=200, head_salts=4)

    with pytest.raises(RuntimeError, match="injected failure"):
        builder.build(transcripts, fail_after_segments=2)

    man = Manifest(idx_dir)
    assert not man.is_complete()
    assert len(man.committed_segments()) == 2
    assert sorted(man.pending_segments(4)) == sorted(
        set(range(4)) - man.committed_segments()
    )

    # resume: only pending segments rebuilt; completion marker written last
    res = builder.build(transcripts)
    assert res.resumed
    assert sorted(res.segments_built) == sorted(set(range(4)) - {0, 1})
    assert man.is_complete()

    # identical to the uninterrupted reference build
    a = _index_content(spark, idx_dir)
    b = _index_content(spark, built_index)
    pd.testing.assert_frame_equal(a, b)


def test_manifest_metrics_lineage(built_index):
    man = Manifest(built_index)
    assert man.is_complete()
    segs = man.committed_segments()
    assert segs == {0, 1, 2, 3}
    total_postings = 0
    for s in segs:
        rec = man.segment(s)
        assert rec["status"] == "committed"
        assert rec["terms"] >= 0 and rec["postings"] >= 0
        assert rec["doc_blob_bytes"] > 0
        total_postings += rec["postings"]
    stats = man.docs()
    # postings across all segments = number of (term, doc) pairs ≤ total tokens
    assert 0 < total_postings <= stats["total_tokens"]


def test_completed_build_is_noop(spark, corpus_dir, built_index):
    transcripts = spark.read.parquet(os.path.join(corpus_dir, "transcripts.parquet"))
    builder = IndexBuilder(
        built_index, num_segments=4, head_df_threshold=200, head_salts=4
    )
    res = builder.build(transcripts)
    assert res.resumed and res.segments_built == []
