"""Gzip XML streaming source + input-file planner: round-trip fidelity,
per-file parallelism, malformed-row tagging, and resume-diff planning."""

from __future__ import annotations

import gzip
import os

import pandas as pd
import pytest

from discogsography_spark.corpus import make_transcripts
from discogsography_spark.sources.listing import FilePlanner, list_input_files
from discogsography_spark.sources.xml_source import (
    load_transcripts_xml,
    write_transcripts_xml,
)


@pytest.fixture(scope="module")
def xml_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("xml_dump")
    tdf = make_transcripts(n_conversations=60, mean_turns=5, vocab_size=300)
    convs = sorted(tdf["conv_id"].unique())
    # three dump files — the reference's multi-file fan-out shape
    for i, cs in enumerate([convs[:20], convs[20:40], convs[40:]]):
        write_transcripts_xml(
            tdf[tdf["conv_id"].isin(cs)], str(d / f"dump-{i}.xml.gz")
        )
    return {"dir": str(d), "tdf": tdf}


def test_xml_roundtrip_exact(spark, xml_dir):
    got = (
        load_transcripts_xml(spark, xml_dir["dir"])
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert got["_quarantine_reason"].isna().all()
    want = (
        xml_dir["tdf"]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["turn_idx"].tolist() == want["turn_idx"].astype(int).tolist()
    # per-turn text equality — the BASELINE.json per-row invariant
    assert got["text"].fillna("").tolist() == want["text"].fillna("").tolist()
    assert got["role"].tolist() == want["role"].tolist()
    assert (
        pd.to_datetime(got["ts"]).astype("datetime64[s]").tolist()
        == pd.to_datetime(want["ts"]).astype("datetime64[s]").tolist()
    )


def test_xml_one_task_per_file(spark, xml_dir):
    df = load_transcripts_xml(spark, xml_dir["dir"])
    assert df.rdd.getNumPartitions() == 3


def test_xml_malformed_turn_tagged(spark, tmp_path):
    p = str(tmp_path / "bad.xml.gz")
    with gzip.open(p, "wt") as f:
        f.write(
            '<conversations><conversation id="c1">'
            '<turn idx="0" role="user"><text>good</text></turn>'
            '<turn role="user"><text>no idx</text></turn>'
            "</conversation></conversations>"
        )
    got = load_transcripts_xml(spark, p).toPandas()
    assert len(got) == 2
    bad = got[got["_quarantine_reason"].notna()]
    assert bad["_quarantine_reason"].tolist() == ["bad_turn_idx"]
    assert bad["text"].tolist() == ["no idx"]


def test_file_planner_resume_diff(tmp_path, xml_dir):
    state = str(tmp_path / "files_state.json")
    files = list_input_files(xml_dir["dir"])
    assert len(files) == 3
    planner = FilePlanner(state)
    assert len(planner.pending(files)) == 3
    planner.commit(files[0])
    planner.commit(files[1])
    # a fresh planner (process restart) resumes from the committed state
    planner2 = FilePlanner(state)
    pending = planner2.pending(list_input_files(xml_dir["dir"]))
    assert [os.path.basename(f.path) for f in pending] == ["dump-2.xml.gz"]
    # content change re-queues the file (checksum-gated re-download)
    with gzip.open(files[0].path, "at") as f:
        f.write("\n<!-- appended -->")
    pending = planner2.pending(list_input_files(xml_dir["dir"]))
    assert sorted(os.path.basename(f.path) for f in pending) == [
        "dump-0.xml.gz",
        "dump-2.xml.gz",
    ]
