"""Index integrity checker: a clean index (base + deltas + tombstones)
passes; every injected corruption class is detected with a precise
message. The checker reads the parquet layout directly — independent of
the query-time readers it polices."""

from __future__ import annotations

import glob
import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from discogsography_spark.corpus import make_transcripts
from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.index.fsck import fsck_index


@pytest.fixture(scope="module")
def fsck_setup(spark, tmp_path_factory):
    from discogsography_spark.streaming.incremental import DeltaIndexWriter

    d = tmp_path_factory.mktemp("fsck")
    tdf = make_transcripts(n_conversations=120, mean_turns=5, vocab_size=300)
    convs = sorted(tdf["conv_id"].unique())
    base = tdf[tdf["conv_id"].isin(convs[:100])].reset_index(drop=True)
    extra = tdf[tdf["conv_id"].isin(convs[100:])].reset_index(drop=True)
    bp = str(d / "base.parquet")
    base.to_parquet(bp, index=False)
    idx = str(d / "idx")
    IndexBuilder(
        idx, num_segments=4, head_df_threshold=100, with_positions=True
    ).build(spark.read.parquet(bp))
    w = DeltaIndexWriter(idx)
    ep = str(d / "extra.parquet")
    extra.to_parquet(ep, index=False)
    w.write_batch(spark.read.parquet(ep), 0)
    w.write_deletes(
        spark.createDataFrame(pd.DataFrame({"conv_id": convs[:3]})), 1
    )
    return {"idx": idx, "dir": str(d)}


def test_clean_index_passes(fsck_setup):
    r = fsck_index(fsck_setup["idx"])
    assert r["errors"] == []
    assert r["base"]["terms"] > 0
    assert len(r["deltas"]) >= 1 and r["deltas"][0]["terms"] > 0


def _copy_index(fsck_setup, tmp_path, name):
    dst = str(tmp_path / name)
    shutil.copytree(fsck_setup["idx"], dst)
    return dst


def _rewrite_first_seg_file(idx, mutate):
    """Apply `mutate(pylist_rows) -> rows` to the first base segment file
    that has at least one row; return the mutated term."""
    for f in sorted(
        glob.glob(os.path.join(idx, "segments", "**", "*.parquet"),
                  recursive=True)
    ):
        tbl = pq.read_table(f)
        rows = tbl.to_pylist()
        if not rows:
            continue
        term = mutate(rows)
        pq.write_table(
            pa.Table.from_pylist(rows, schema=tbl.schema), f, row_group_size=64
        )
        return term
    raise AssertionError("no segment rows")


def test_detects_truncated_pos_blob(fsck_setup, tmp_path):
    idx = _copy_index(fsck_setup, tmp_path, "trunc")

    def mutate(rows):
        row = max(rows, key=lambda r: len(r["pos_blob"] or b""))
        row["pos_blob"] = row["pos_blob"][:-1]
        return row["term"]

    term = _rewrite_first_seg_file(idx, mutate)
    errs = fsck_index(idx, check_deltas=False)["errors"]
    assert any(term in e and "positional stream" in e or term in e and "decode failed" in e
               for e in errs), errs


def test_detects_bad_block_last_doc(fsck_setup, tmp_path):
    idx = _copy_index(fsck_setup, tmp_path, "bld")

    def mutate(rows):
        row = max(rows, key=lambda r: len(r["block_last_doc"] or []))
        row["block_last_doc"] = [x + 1 for x in row["block_last_doc"]]
        return row["term"]

    term = _rewrite_first_seg_file(idx, mutate)
    errs = fsck_index(idx, check_deltas=False)["errors"]
    assert any(term in e and "block_last_doc" in e for e in errs), errs


def test_detects_df_mismatch(fsck_setup, tmp_path):
    idx = _copy_index(fsck_setup, tmp_path, "df")

    def mutate(rows):
        rows[0]["df"] = int(rows[0]["df"]) + 1
        return rows[0]["term"]

    term = _rewrite_first_seg_file(idx, mutate)
    errs = fsck_index(idx, check_deltas=False)["errors"]
    assert any(term in e and "decoded sizes" in e for e in errs), errs


def test_detects_docmap_count_drift(fsck_setup, tmp_path):
    idx = _copy_index(fsck_setup, tmp_path, "docmap")
    f = sorted(glob.glob(os.path.join(idx, "docs", "**", "*.parquet"),
                         recursive=True))[0]
    pdf = pd.read_parquet(f)
    pdf.iloc[:-1].to_parquet(f, index=False)
    errs = fsck_index(idx, check_deltas=False)["errors"]
    assert any("docmap rows" in e for e in errs), errs


def test_cli_fsck_exit_codes(fsck_setup, tmp_path, capsys):
    import json
    import sys
    from unittest import mock

    from discogsography_spark.cli import main

    with mock.patch.object(sys, "argv",
                           ["cli", "fsck", fsck_setup["idx"]]):
        assert main() == 0
    out = json.loads(capsys.readouterr().out)
    assert out["errors"] == []
    idx = _copy_index(fsck_setup, tmp_path, "cli_bad")

    def mutate(rows):
        rows[0]["df"] = int(rows[0]["df"]) + 1
        return rows[0]["term"]

    _rewrite_first_seg_file(idx, mutate)
    with mock.patch.object(sys, "argv", ["cli", "fsck", idx]):
        assert main() == 1
