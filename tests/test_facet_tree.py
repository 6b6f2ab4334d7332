"""Hierarchical (nested) facet tree over the matched set — the reference's
genre→style explore backbone (api/queries/genre_tree_queries.py:13-31):
each parent facet value with its matched count and the child values
co-occurring under it, both levels ordered count DESC (name ASC tiebreak).

Contracts under test:
- SearchService.facet_tree == a pandas groupby over the scanned matched set
  (counts, nesting, ordering);
- parent totals equal the flat facet_counts for the parent field (the tree
  is a refinement, not a different matched set);
- ShardedSearchService.facet_tree == the single whole-corpus tree (pair
  vectors sum exactly across doc-disjoint shards);
- MergedSearchService.facet_tree over base + deltas + tombstones == a tree
  over the alive corpus only.
"""

from __future__ import annotations

import os

import pandas as pd
import pytest

from discogsography_spark.analysis import tokenize_py
from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.query.serving import (
    _NULL_FACET,
    SearchService,
    ShardedSearchService,
    assemble_facet_tree,
)


def _scan_tree(tdf: pd.DataFrame, terms: list[str], parent: str, child: str):
    toks = tdf["text"].map(lambda t: set(tokenize_py(t)))
    m = tdf[toks.map(lambda s: all(t in s for t in terms))]
    pairs = (
        m.groupby([parent, child], dropna=False)
        .size()
        .reset_index(name="n")
    )

    def lbl(v) -> str:
        return _NULL_FACET if pd.isna(v) else str(v)

    return assemble_facet_tree(
        [
            (lbl(r[parent]), lbl(r[child]), int(r["n"]))
            for _, r in pairs.iterrows()
        ]
    )


@pytest.fixture(scope="module")
def tree_served(spark, corpus_dir, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("treeidx") / "idx")
    transcripts = spark.read.parquet(
        os.path.join(corpus_dir, "transcripts.parquet")
    )
    IndexBuilder(idx, num_segments=4, store_text=True).build(transcripts)
    svc = SearchService(idx, facet_defs={"role": "role", "tool": "tool"})
    tdf = pd.read_parquet(os.path.join(corpus_dir, "transcripts.parquet"))
    tdf = tdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    return svc, tdf


@pytest.mark.parametrize("query", ["spark index", "merge"])
def test_tree_matches_scan(tree_served, query):
    svc, tdf = tree_served
    terms = query.split()
    matched = svc.matched_docs(query)
    got = svc.facet_tree(matched, "role", "tool")
    want = _scan_tree(tdf, terms, "role", "tool")
    assert got == want


def test_parent_totals_equal_flat_facet(tree_served):
    svc, _ = tree_served
    matched = svc.matched_docs("spark index")
    tree = svc.facet_tree(matched, "role", "tool")
    flat = dict(svc.facet_counts(matched, ["role"])["role"])
    assert {n["name"]: n["count"] for n in tree} == flat
    for node in tree:
        assert node["count"] == sum(n for _, n in node["children"])
        # ordering contract: count DESC, name ASC, both levels
        assert node["children"] == sorted(
            node["children"], key=lambda cn: (-cn[1], cn[0])
        )
    assert tree == sorted(tree, key=lambda r: (-r["count"], r["name"]))


@pytest.fixture(scope="module")
def tree_sharded(spark, tmp_path_factory):
    """Two conv-range shards + the equivalent whole-corpus index."""
    from discogsography_spark.corpus import make_transcripts

    d = tmp_path_factory.mktemp("treesh")
    tdf = make_transcripts(n_conversations=80, mean_turns=6, vocab_size=300)
    convs = sorted(tdf["conv_id"].unique())
    full_p = str(d / "full.parquet")
    tdf.to_parquet(full_p, index=False)
    full_idx = str(d / "full_idx")
    IndexBuilder(full_idx, num_segments=4, store_text=True).build(
        spark.read.parquet(full_p)
    )
    shard_dirs = []
    mid = convs[len(convs) // 2]
    for i, m in enumerate([tdf["conv_id"] < mid, tdf["conv_id"] >= mid]):
        p = str(d / f"s{i}.parquet")
        tdf[m].to_parquet(p, index=False)
        idx = str(d / f"s{i}_idx")
        IndexBuilder(idx, num_segments=2, store_text=True).build(
            spark.read.parquet(p)
        )
        shard_dirs.append(idx)
    return full_idx, shard_dirs


def test_sharded_tree_equals_single(tree_sharded):
    full_idx, shard_dirs = tree_sharded
    defs = {"role": "role", "tool": "tool"}
    single = SearchService(full_idx, facet_defs=defs)
    sharded = ShardedSearchService(shard_dirs, facet_defs=defs)
    try:
        for q in ("spark index", "merge", "zzqqxx"):
            matched = single.matched_docs(q)
            want = single.facet_tree(matched, "role", "tool")
            got = sharded.facet_tree(q, "role", "tool")
            assert got == want, q
    finally:
        sharded.close()


def test_merged_tree_alive_only(spark, tmp_path_factory):
    """Tree over a live view with an upsert + delete delta must equal the
    tree over a fresh rebuild of the alive corpus."""
    from discogsography_spark.corpus import make_transcripts
    from discogsography_spark.query.serving import MergedSearchService
    from discogsography_spark.streaming.incremental import DeltaIndexWriter

    d = tmp_path_factory.mktemp("treelive")
    tdf = make_transcripts(n_conversations=60, mean_turns=5, vocab_size=200)
    convs = sorted(tdf["conv_id"].unique())
    base = tdf[tdf["conv_id"].isin(convs[:40])]
    base_p = str(d / "base.parquet")
    base.to_parquet(base_p, index=False)
    idx = str(d / "idx")
    IndexBuilder(idx, num_segments=2, store_text=True).build(
        spark.read.parquet(base_p)
    )
    w = DeltaIndexWriter(idx)
    edit = tdf[tdf["conv_id"].isin(convs[2:4] + convs[40:50])].copy()
    edit.loc[:, "text"] = edit["text"] + " treemark"
    ep = str(d / "edit.parquet")
    edit.to_parquet(ep, index=False)
    w.write_batch(spark.read.parquet(ep), 0, upsert=True)
    w.write_deletes(
        spark.createDataFrame(pd.DataFrame({"conv_id": convs[5:8]})), 1
    )

    svc = MergedSearchService(idx, facet_defs={"role": "role", "tool": "tool"})
    alive = pd.concat(
        [
            tdf[
                tdf["conv_id"].isin(
                    sorted(set(convs[:40]) - set(convs[2:4]) - set(convs[5:8]))
                )
            ],
            edit,
        ],
        ignore_index=True,
    )
    for q in ("spark index", "treemark"):
        matched = svc.matched_docs(q)
        got = svc.facet_tree(matched, "role", "tool")
        want = _scan_tree(alive, q.split(), "role", "tool")
        assert got == want, q
