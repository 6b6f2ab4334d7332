"""Positional block directory (block_pos_off): block-skip decode of the
flat position stream. Phrase/proximity verification on a directory-bearing
index must touch only the posting blocks containing candidate docs, and
stay bit-identical to the full-stream decode — including on legacy indexes
whose segments predate the column (fallback path)."""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pytest

from discogsography_spark.codec import (
    pos_block_byte_offsets,
    varbyte_decode,
    varbyte_encode,
)
from discogsography_spark.corpus import make_transcripts
from discogsography_spark.index.builder import IndexBuilder
from discogsography_spark.index.docids import assign_doc_ids
from discogsography_spark.query.engine import LocalSearcher, _position_keys


def test_pos_block_byte_offsets_slices_decode_independently():
    rng = np.random.default_rng(7)
    tfs = rng.integers(1, 10, size=1000).astype(np.int64)
    pos = rng.integers(0, 5000, size=int(tfs.sum())).astype(np.uint64)
    blob = varbyte_encode(pos)
    full = varbyte_decode(blob)
    voff = np.concatenate(([0], np.cumsum(tfs)))
    for bs in (4, 7, 128, 1000, 4096):
        off = pos_block_byte_offsets(pos, tfs, bs)
        nblocks = (tfs.size + bs - 1) // bs
        assert off.size == nblocks + 1
        assert off[-1] == len(blob)
        parts = [
            varbyte_decode(blob[off[i] : off[i + 1]]) for i in range(nblocks)
        ]
        assert np.array_equal(np.concatenate(parts), full)
        for i in range(nblocks):  # value counts align with cumsum(tf)
            want = voff[min((i + 1) * bs, tfs.size)] - voff[i * bs]
            assert parts[i].size == want


@pytest.fixture(scope="module")
def tiny_block_setup(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("posblk")
    tdf = make_transcripts(n_conversations=250, mean_turns=6, vocab_size=600)
    p = str(d / "t.parquet")
    tdf.to_parquet(p, index=False)
    idx = str(d / "idx")
    # block_size=8 → many posting blocks, so candidate subsets genuinely
    # skip; low head threshold exercises the salted positional merge
    IndexBuilder(
        idx,
        num_segments=4,
        block_size=8,
        head_df_threshold=200,
        head_salts=3,
        with_positions=True,
    ).build(spark.read.parquet(p))
    docs = assign_doc_ids(spark.read.parquet(p)).select("doc_id", "text").cache()
    docs.count()
    return {"idx": idx, "docs": docs, "dir": str(d)}


def test_block_keys_match_full_stream(tiny_block_setup):
    # tiny budget: the decode-once guard (4*cf <= budget) must NOT route
    # these fixture-sized streams to the full path — this test pins the
    # block-granular path itself
    s = LocalSearcher(tiny_block_setup["idx"], postings_cache_budget=8)
    rng = np.random.default_rng(3)
    checked = 0
    for t in ["spark", "index", "merge", "turn", "query"]:
        rows = s.lookup_terms([t])
        if t not in rows:
            continue
        tp = rows[t]
        assert tp.block_pos_off is not None
        assert tp.block_pos_off.size == len(tp.block_last_doc) + 1
        d_full, tf_full, _ = s._decoded(tp)
        flat = varbyte_decode(tp.pos_blob).astype(np.int64)
        voff = np.concatenate(([0], np.cumsum(tf_full)))
        shift = np.int64(21)
        for _ in range(6):
            n = int(rng.integers(1, max(2, d_full.size)))
            docs = np.sort(rng.choice(d_full, size=n, replace=False))
            got = s._term_position_keys(tp, docs, shift)
            want = _position_keys(d_full, tf_full, flat, voff, docs, shift)
            assert np.array_equal(got, want), t
            checked += 1
        empty = np.empty(0, dtype=np.int64)
        assert s._term_position_keys(tp, empty, shift).size == 0
    assert checked >= 18
    assert len(s._pos_block_cache) > 0  # sparse subsets took the block path


def test_positional_queries_identical_across_block_sizes(
    spark, tiny_block_setup, tmp_path
):
    import discogsography_spark.query.engine as eng

    p = os.path.join(tiny_block_setup["dir"], "t.parquet")
    idx2 = str(tmp_path / "idx_default_bs")
    IndexBuilder(
        idx2, num_segments=4, head_df_threshold=200, head_salts=3,
        with_positions=True,
    ).build(spark.read.parquet(p))
    s2 = LocalSearcher(idx2)
    old = eng._FIRST_TIER
    eng._FIRST_TIER = 4  # force multi-tier lazy verification
    try:
        # tiny budget forces the block path under the decode-once guard
        s = LocalSearcher(tiny_block_setup["idx"], postings_cache_budget=8)
        for q, k in [("spark index", 10), ("turn turn", 8), ("the spark index", 10)]:
            assert s.topk_phrase(q, k) == s2.topk_phrase(q, k), q
        for w1, w2, win, k in [
            ("spark", "index", 1, 10),
            ("turn", "turn", 2, 8),
            ("merge", "query", 5, 12),
        ]:
            assert s.topk_within(w1, w2, win, k) == s2.topk_within(w1, w2, win, k)
        for b in [
            "spark <3> index <5> merge",
            '"spark index" OR merge',
            "turn <2> turn <2> turn",
        ]:
            assert s.topk_bool(b, 10) == s2.topk_bool(b, 10), b
    finally:
        eng._FIRST_TIER = old


def test_legacy_index_without_directory_column(tiny_block_setup, tmp_path):
    """Segments written before the directory existed lack the column —
    readers must fall back to full-stream decode with identical answers."""
    import pyarrow.parquet as pq

    src = tiny_block_setup["idx"]
    legacy = str(tmp_path / "legacy")
    shutil.copytree(src, legacy)
    stripped = 0
    for f in glob.glob(os.path.join(legacy, "segments", "**", "*.parquet"),
                       recursive=True):
        tbl = pq.read_table(f)
        if "block_pos_off" in tbl.schema.names:
            pq.write_table(tbl.drop_columns(["block_pos_off"]), f,
                           row_group_size=64)
            stripped += 1
    assert stripped > 0
    s_new = LocalSearcher(src)
    s_old = LocalSearcher(legacy)
    tp = s_old.lookup_terms(["spark"]).get("spark")
    assert tp is not None and tp.block_pos_off is None
    for q, k in [("spark index", 10), ("turn turn", 8)]:
        assert s_old.topk_phrase(q, k) == s_new.topk_phrase(q, k), q
    assert s_old.topk_within("spark", "index", 3, 10) == s_new.topk_within(
        "spark", "index", 3, 10
    )
    assert s_old.topk_bool("spark <3> index <5> merge", 10) == s_new.topk_bool(
        "spark <3> index <5> merge", 10
    )
