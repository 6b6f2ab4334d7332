from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args: list[str]) -> str:
    out = subprocess.run(
        [sys.executable, "-m", "discogsography_spark.cli", *args],
        capture_output=True,
        text=True,
        cwd=REPO,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-1000:]
    return out.stdout


def test_cli_query_and_stats(built_index):
    lines = [json.loads(x) for x in _run(["query", built_index, "spark", "--k", "3"]).splitlines()]
    assert len(lines) == 3
    assert lines[0]["rank"] == 1 and lines[0]["score"] >= lines[1]["score"]

    ors = [json.loads(x) for x in _run(
        ["query", built_index, "spark zz-missing", "--k", "3", "--mode", "or"]
    ).splitlines()]
    assert len(ors) == 3  # OR ignores the absent term

    empty = [json.loads(x) for x in _run(["query", built_index, "zz-missing"]).splitlines()]
    assert empty == [{"matches": 0}]

    mlt = [json.loads(x) for x in _run(
        ["query", built_index, "0", "--mode", "mlt", "--k", "5"]
    ).splitlines()]
    assert len(mlt) == 5 and all(m["doc_id"] != 0 for m in mlt)

    stats = json.loads(_run(["stats", built_index]))
    assert stats["complete"] is True
    assert stats["docs"]["n_docs"] > 0
    assert set(map(int, stats["segments"])) == {0, 1, 2, 3}


def test_champion_fallback_beyond_width(built_index, oracle_index):
    """Single-term k larger than the champion width must fall back to the
    full decode path and stay rank-identical."""
    from discogsography_spark.oracle import bm25_topk
    from discogsography_spark.query.engine import LocalSearcher

    s = LocalSearcher(built_index)
    # 'spark' is a seeded head word; df >> 128 in the conftest corpus
    assert s.lookup_terms(["spark"])["spark"].df > 128
    got = s.topk("spark", 300)
    exp = bm25_topk(oracle_index, "spark", 300)
    assert [d for d, _ in got] == [d for d, _ in exp]
    assert all(gs == es for (_, gs), (_, es) in zip(got, exp))


def test_year_plausibility_gate(spark):
    from pyspark.sql import functions as F

    from discogsography_spark.operators.rules import year_plausibility

    df = spark.createDataFrame(
        [("1999",), ("1850",), ("2093",), ("not-a-year",), (None,)], ["y"]
    )
    out = [r["yy"] for r in df.select(year_plausibility("y").alias("yy")).collect()]
    assert out == [1999, None, None, None, None]


def test_cli_search_subcommand(built_index):
    """`cli search` returns the full response shape: results + facets +
    total_matched, drill-down --filter narrows it, --fuzzy reports the
    rewrite, --mode bool accepts the boolean language."""
    resp = json.loads(_run(
        ["search", built_index, "spark index", "--k", "5", "--facets", "role,tool"]
    ))
    assert resp["results"] and resp["total_matched"] >= len(resp["results"])
    assert set(resp["facets"]) == {"role", "tool"}
    assert sum(n for _, n in resp["facets"]["role"]) == resp["total_matched"]

    filt = json.loads(_run(
        ["search", built_index, "spark index", "--k", "5",
         "--facets", "role", "--filter", "role=assistant"]
    ))
    assert 0 < filt["total_matched"] < resp["total_matched"]

    fz = json.loads(_run(
        ["search", built_index, "sparkz index", "--k", "5", "--fuzzy"]
    ))
    assert fz["rewrites"] == {"sparkz": "spark"}
    assert [r["doc_id"] for r in fz["results"]] == [
        r["doc_id"] for r in json.loads(
            _run(["search", built_index, "spark index", "--k", "5"])
        )["results"]
    ]

    bl = json.loads(_run(
        ["search", built_index, "(spark OR index) AND NOT merge",
         "--k", "5", "--mode", "bool"]
    ))
    assert bl["results"]

    ctx = json.loads(_run(
        ["search", built_index, "spark index", "--k", "3", "--context", "2"]
    ))
    for r in ctx["results"]:
        rows = ctx["context"][str(r["doc_id"])]
        assert any(c["doc_id"] == r["doc_id"] for c in rows)  # hit included
        turns = [c["turn_idx"] for c in rows]
        assert turns == sorted(turns)
        assert len({c["conv_id"] for c in rows}) == 1

    col = json.loads(_run(
        ["search", built_index, "spark index", "--k", "5",
         "--collapse", "conv_id"]
    ))
    groups = [g["group"] for g in col["groups"]]
    assert len(groups) == 5 and len(set(groups)) == 5  # one row per conv
    assert all(g["group_matched"] >= 1 for g in col["groups"])
    scores = [g["score"] for g in col["groups"]]
    assert scores == sorted(scores, reverse=True)


def test_cli_upsert_delete_roundtrip(spark, tmp_path):
    """upsert replaces prior versions (tombstones), delete kills keys;
    the merged CLI query sees only the latest alive corpus, and compact
    folds it all back to a plain index with the same answers."""
    import pandas as pd

    from discogsography_spark.corpus import make_transcripts

    tdf = make_transcripts(n_conversations=40, mean_turns=4, vocab_size=200)
    convs = sorted(tdf["conv_id"].unique())
    src = str(tmp_path / "t.parquet")
    tdf.to_parquet(src, index=False)
    idx = str(tmp_path / "idx")
    _run(["build", src, idx, "--segments", "2"])

    # upsert: rewrite conv[0] with a marker token
    patch = tdf[tdf["conv_id"] == convs[0]].copy()
    patch["text"] = patch["text"] + " climarker"
    pp = str(tmp_path / "patch.parquet")
    patch.to_parquet(pp, index=False)
    out = json.loads(_run(["upsert", idx, pp, "--batch-id", "0"]))
    assert out["n_tombstoned"] == len(patch)

    # delete conv[1] wholesale (conv_id-only keys)
    kp = str(tmp_path / "keys.parquet")
    pd.DataFrame({"conv_id": [convs[1]]}).to_parquet(kp, index=False)
    out = json.loads(_run(["delete", idx, kp, "--batch-id", "1"]))
    assert out["n_tombstoned"] == int((tdf["conv_id"] == convs[1]).sum())

    from discogsography_spark.streaming.incremental import MergedSearcher

    ms = MergedSearcher(idx)
    alive = len(tdf) - out["n_tombstoned"]
    assert ms.n_docs == alive
    hits = ms.topk("climarker", 10**6)
    assert len(hits) == len(patch)

    # minor compaction via the CLI: tail folds to one, answers unchanged
    before = ms.topk("climarker", 10)
    out = json.loads(_run(["consolidate", idx]))
    assert out["deltas_consolidated"] == 2
    ms2 = MergedSearcher(idx)
    assert ms2.n_docs == alive and ms2.topk("climarker", 10) == before

    _run(["compact", idx])
    stats = json.loads(_run(["stats", idx]))
    assert int(stats["docs"]["n_docs"]) == alive


def test_cli_query_synonym(built_index):
    import json as _json

    syn = [_json.loads(x) for x in _run(
        ["query", built_index, "turn spark", "--k", "5",
         "--syn", "spark=stream,batch"]
    ).splitlines()]
    assert len(syn) == 5 and syn[0]["rank"] == 1
    # identical to the API path
    from discogsography_spark.query.engine import LocalSearcher

    want = LocalSearcher(built_index).topk_synonym(
        "turn spark", 5, {"spark": ["stream", "batch"]}
    )
    assert [(r["doc_id"], r["score"]) for r in syn] == [
        (d, round(s, 6)) for d, s in want
    ]


def test_cli_query_boosted(built_index):
    import json as _json

    rows = [_json.loads(x) for x in _run(
        ["query", built_index, "turn spark^2", "--k", "5"]
    ).splitlines()]
    assert len(rows) == 5 and rows[0]["rank"] == 1
    from discogsography_spark.query.engine import LocalSearcher

    want = LocalSearcher(built_index).topk_boosted("turn spark^2", 5)
    assert [(r["doc_id"], r["score"]) for r in rows] == [
        (d, round(s, 6)) for d, s in want
    ]


def test_cli_search_stats_significant_synonym(built_index):
    import json as _json

    out = _json.loads(_run(
        ["search", built_index, "turn spark", "--k", "3",
         "--stats", "turn_idx", "--significant",
         "--syn", "spark=stream"]
    ))
    st = out["stats"]["turn_idx"]
    assert st["count"] > 0 and st["min"] <= st["avg"] <= st["max"]
    assert isinstance(out["significant_terms"], list)
    from discogsography_spark.query.serving import SearchService

    svc = SearchService(built_index)
    want = svc.search(
        "turn spark", 3, synonyms={"spark": ["stream"]},
        stats_fields=["turn_idx"],
    )
    assert out["total_matched"] == want.total_matched
    assert [(r["doc_id"], r["score"]) for r in out["results"]] == [
        (d, round(s, 6)) for d, s in want.results
    ]


def test_cli_search_grouped(built_index):
    import json as _json

    out = _json.loads(_run(
        ["search", built_index, "turn spark", "--k", "5",
         "--grouped", "role"]
    ))
    groups = out["groups"]
    assert groups and groups[0]["n_matched"] > 0
    from discogsography_spark.query.serving import SearchService

    want = SearchService(built_index).grouped_topk("turn spark", "role", 5)
    assert [(g["group"], g["n_matched"]) for g in groups] == [
        (label, n) for label, _s, _a, _x, n in want
    ]
