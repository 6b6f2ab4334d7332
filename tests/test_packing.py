"""Sequence packing (operators/packing.py): concat-and-chunk bin assignment
must equal the pandas cumsum oracle, be identical at any parallelism, and
the shard writer must reproduce the exact concatenated token stream in
fixed-length rows."""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pytest

from discogsography_spark.operators.packing import (
    exclusive_cumsum,
    explode_assignments,
    pack_sequences,
    write_training_shards,
)


@pytest.fixture(scope="module")
def tok_docs(spark):
    """60 docs with irregular token counts (including one spanning several
    sequences and two empty docs), sparse non-contiguous doc_ids."""
    rng = np.random.default_rng(11)
    rows = []
    for i in range(60):
        doc_id = i * 7 + (3 if i % 2 else 0)  # sparse, increasing
        n = int(rng.integers(0, 40))
        if i == 17:
            n = 700  # spans many seq_len=128 sequences
        if i in (5, 30):
            n = 0
        rows.append((doc_id, [f"t{doc_id}_{j}" for j in range(n)]))
    return spark.createDataFrame(rows, "doc_id long, tokens array<string>")


def _pdf(tok_docs):
    pdf = tok_docs.toPandas().sort_values("doc_id").reset_index(drop=True)
    pdf["n"] = pdf["tokens"].map(len)
    return pdf


def test_assignment_matches_pandas_cumsum(spark, tok_docs):
    from pyspark.sql import functions as F

    L = 128
    counted = tok_docs.select("doc_id", F.size("tokens").alias("n_tokens"))
    got = (
        pack_sequences(counted, L, bucket=64)  # small bucket → many buckets
        .orderBy("doc_id")
        .toPandas()
    )
    pdf = _pdf(tok_docs)
    pdf = pdf[pdf["n"] > 0].reset_index(drop=True)
    pdf["start"] = pdf["n"].cumsum() - pdf["n"]
    assert got["doc_id"].tolist() == pdf["doc_id"].tolist()
    assert got["start_offset"].tolist() == pdf["start"].tolist()
    assert got["first_seq"].tolist() == (pdf["start"] // L).tolist()
    assert got["last_seq"].tolist() == ((pdf["start"] + pdf["n"] - 1) // L).tolist()
    # the 700-token doc spans >5 sequences
    assert (got["last_seq"] - got["first_seq"]).max() >= 5


def test_determinism_under_parallelism(spark, tok_docs):
    from pyspark.sql import functions as F

    L = 100
    counted = tok_docs.select("doc_id", F.size("tokens").alias("n_tokens"))
    outs = []
    for parts in (2, 32):
        got = (
            pack_sequences(counted.repartition(parts), L, bucket=32)
            .orderBy("doc_id")
            .select("doc_id", "start_offset", "first_seq", "last_seq")
            .toPandas()
        )
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_explode_assignments_covers_stream(spark, tok_docs):
    """Slices per sequence tile the stream exactly: lengths sum to n per
    doc, and per sequence the pieces are contiguous from seq_pos 0 (except
    the final partial sequence)."""
    from pyspark.sql import functions as F

    L = 64
    counted = tok_docs.select("doc_id", F.size("tokens").alias("n_tokens"))
    packed = pack_sequences(counted, L, bucket=64)
    pieces = explode_assignments(packed, L).toPandas()
    per_doc = pieces.groupby("doc_id")["slice_len"].sum()
    pdf = _pdf(tok_docs)
    want = pdf[pdf["n"] > 0].set_index("doc_id")["n"]
    assert per_doc.sort_index().tolist() == want.sort_index().tolist()
    total = int(want.sum())
    for sid, g in pieces.groupby("seq_id"):
        g = g.sort_values("seq_pos")
        expect_len = min(L, total - sid * L)
        assert g["slice_len"].sum() == expect_len, sid
        # contiguity: each piece starts where the previous ended
        pos = 0
        for _, r in g.iterrows():
            assert r["seq_pos"] == pos
            pos += r["slice_len"]


def test_shard_writer_roundtrip(spark, tok_docs, tmp_path):
    L, SPS = 128, 4
    out = str(tmp_path / "shards_out")
    manifest = write_training_shards(
        tok_docs, out, seq_len=L, seqs_per_shard=SPS
    )
    pdf = _pdf(tok_docs)
    stream = [t for toks in pdf["tokens"] for t in toks]
    n_full = len(stream) // L
    assert manifest["n_sequences"] == n_full
    assert manifest["total_tokens"] == len(stream)
    assert manifest["dropped_remainder_tokens"] == len(stream) - n_full * L
    with open(os.path.join(out, "manifest.json")) as f:
        assert json.load(f) == manifest

    got = spark.read.parquet(os.path.join(out, "shards")).toPandas()
    got = got.sort_values("seq_id").reset_index(drop=True)
    assert got["seq_id"].tolist() == list(range(n_full))
    assert (got["n"] == L).all()  # every written sequence is exactly seq_len
    assert (got["shard"] == got["seq_id"] // SPS).all()
    rebuilt = [t for toks in got["tokens"] for t in toks]
    assert rebuilt == stream[: n_full * L]  # byte-exact stream reconstruction


def test_shard_writer_on_bpe_encoded_docs(spark, tmp_path):
    """The intended composition: BPE-encode documents, then pack the encoded
    streams — stream reconstruction stays exact through the tokenizer."""
    from pyspark.sql import functions as F

    from discogsography_spark.operators.bpe import (
        bpe_encode_col,
        train_bpe,
        word_frequencies,
    )

    rows = [(i, f"the spark engine packs token streams number {i} tightly "
                * (1 + i % 3)) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(word_frequencies(docs, text_col="text"), num_merges=40)
    enc = bpe_encode_col(docs, merges, text_col="text", out_col="tokens")
    out = str(tmp_path / "bpe_shards")
    manifest = write_training_shards(
        enc.select("doc_id", "tokens"), out, seq_len=32, seqs_per_shard=8
    )
    assert manifest["n_sequences"] > 0
    got = spark.read.parquet(os.path.join(out, "shards")).toPandas()
    assert (got["n"] == 32).all()
    want_stream = [
        t
        for toks in enc.orderBy("doc_id").select("tokens").toPandas()["tokens"]
        for t in toks
    ]
    got = got.sort_values("seq_id")
    rebuilt = [t for toks in got["tokens"] for t in toks]
    assert rebuilt == want_stream[: manifest["n_sequences"] * 32]


def test_assignment_property_random_counts(spark):
    """Property: for random sparse doc_ids and token counts (zeros
    included), the bucketed distributed cumsum equals the pandas oracle at
    several bucket widths and partitionings."""
    import numpy as np
    from pyspark.sql import functions as F

    rng = np.random.default_rng(99)
    for trial in range(3):
        ids = np.unique(rng.integers(0, 5000, size=120))
        ns = rng.integers(0, 50, size=ids.size)
        pdf = pd.DataFrame({"doc_id": ids, "n_tokens": ns})
        df = spark.createDataFrame(pdf)
        live = pdf[pdf["n_tokens"] > 0].sort_values("doc_id").reset_index(drop=True)
        live["start"] = live["n_tokens"].cumsum() - live["n_tokens"]
        L = int(rng.integers(16, 200))
        for bucket, parts in ((7, 3), (256, 17), (1 << 20, 2)):
            got = (
                pack_sequences(df.repartition(parts), L, bucket=bucket)
                .orderBy("doc_id")
                .toPandas()
            )
            assert got["doc_id"].tolist() == live["doc_id"].tolist(), (trial, bucket)
            assert got["start_offset"].tolist() == live["start"].tolist(), (trial, bucket)
            assert got["first_seq"].tolist() == (live["start"] // L).tolist()
            assert (
                got["last_seq"].tolist()
                == ((live["start"] + live["n_tokens"] - 1) // L).tolist()
            )


def test_shard_writer_null_tokens_and_keep_remainder(spark, tmp_path):
    """Null token arrays count as empty docs (F.size(NULL) is -1 — must not
    shrink total_tokens and drop a real final sequence); with
    drop_remainder=False the trailing partial sequence is written and the
    manifest's n_shards covers it."""
    L = 8
    rows = [
        (0, [f"a{j}" for j in range(2 * L)]),  # exactly two full sequences
        (1, None),                              # null array
        (2, [f"b{j}" for j in range(3)]),       # remainder
    ]
    docs = spark.createDataFrame(rows, "doc_id long, tokens array<string>")
    out1 = str(tmp_path / "drop")
    m1 = write_training_shards(docs, out1, seq_len=L, seqs_per_shard=1)
    assert m1["total_tokens"] == 2 * L + 3
    assert m1["n_sequences"] == 2          # null row didn't eat a sequence
    assert m1["dropped_remainder_tokens"] == 3
    assert m1["n_shards"] == 2
    got = spark.read.parquet(os.path.join(out1, "shards")).toPandas()
    assert sorted(got["seq_id"]) == [0, 1] and (got["n"] == L).all()

    out2 = str(tmp_path / "keep")
    m2 = write_training_shards(
        docs, out2, seq_len=L, seqs_per_shard=1, drop_remainder=False
    )
    assert m2["n_sequences"] == 3 and m2["n_shards"] == 3
    got2 = spark.read.parquet(os.path.join(out2, "shards")).toPandas()
    assert sorted(got2["seq_id"]) == [0, 1, 2]
    assert sorted(got2["shard"]) == [0, 1, 2]
    assert got2.sort_values("seq_id")["n"].tolist() == [L, L, 3]
