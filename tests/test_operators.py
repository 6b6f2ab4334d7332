from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_exact_dedup_finds_planted_dups(spark):
    from discogsography_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, "other"), (4, "same text")],
        ["doc_id", "text"],
    )
    out = exact_dedup(df).collect()
    assert len(out) == 1
    assert out[0]["n_dups"] == 3
    assert out[0]["doc_ids"] == [1, 2, 4]
    assert out[0]["keeper"] == 1


def test_minhash_lsh_finds_near_dups(spark):
    from discogsography_spark.operators.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base + " ok"
    far = "completely different words nothing shared here at all whatsoever truly"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], ["doc_id", "text"]
    )
    pairs = minhash_lsh_pairs(df, num_hashes=32, bands=8, threshold=0.3).collect()
    keys = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert (1, 2) in keys
    assert (1, 3) not in keys and (2, 3) not in keys


def test_ngram_jaccard_exact(spark):
    from discogsography_spark.operators.dedup import ngram_jaccard_pairs

    a = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [(1, a), (2, a), (3, "nine ten eleven twelve thirteen")], ["doc_id", "text"]
    )
    out = ngram_jaccard_pairs(df, threshold=0.9).collect()
    assert len(out) == 1
    assert (out[0]["doc_a"], out[0]["doc_b"]) == (1, 2)
    assert out[0]["jaccard"] == pytest.approx(1.0)


def test_simhash_identical_docs_same_fp(spark):
    from discogsography_spark.operators.dedup import simhash_dup_groups

    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha beta gamma"), (3, "delta epsilon")],
        ["doc_id", "text"],
    )
    groups = simhash_dup_groups(df).collect()
    assert len(groups) == 1
    assert groups[0]["doc_ids"] == [1, 2]


def test_brute_force_cosine_matches_numpy(embeddings):
    from discogsography_spark.operators.similarity import brute_force_cosine_topk

    pdf = embeddings.toPandas()
    q = list(map(float, pdf["embedding"].iloc[0]))
    got = brute_force_cosine_topk(embeddings, q, k=5).collect()

    mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    qv = np.asarray(q)
    cos = (mat @ qv) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qv))
    order = np.lexsort((pdf["vec_id"].to_numpy(), -np.round(cos, 6)))[:5]
    expected = [int(pdf["vec_id"].iloc[i]) for i in order]
    assert [r["vec_id"] for r in got] == expected
    assert got[0]["cosine"] == pytest.approx(1.0)


def test_lsh_topk_recall(embeddings):
    """ANN bucket probe must recover most of the exact top-10."""
    from discogsography_spark.operators.similarity import (
        brute_force_cosine_topk,
        lsh_bucketed_topk,
    )

    pdf = embeddings.limit(1).toPandas()
    q = list(map(float, pdf["embedding"].iloc[0]))
    exact = {r["vec_id"] for r in brute_force_cosine_topk(embeddings, q, k=10).collect()}
    ann = {
        r["vec_id"]
        for r in lsh_bucketed_topk(
            embeddings, q, k=10, n_planes=6, multiprobe_bits=2
        ).collect()
    }
    assert len(exact & ann) >= 5  # recall ≥ 0.5 with multiprobe on 500 vecs


def test_textstats_columns(documents):
    from discogsography_spark.operators.textstats import (
        fingerprint,
        language_id,
        quality_score,
        token_count,
    )

    out = fingerprint(language_id(quality_score(token_count(documents)))).limit(20).toPandas()
    assert (out["n_word_tokens"] > 0).all()
    assert out["quality"].between(0, 1).all()
    assert set(out["lang_pred"]).issubset({"en", "de", "fr", "es", "und"})
    assert out["content_sha256"].str.len().eq(64).all()


def test_token_count_matches_python(documents):
    from discogsography_spark.analysis import tokenize_py
    from discogsography_spark.operators.textstats import token_count

    out = token_count(documents).select("doc_id", "text", "n_word_tokens").limit(50).toPandas()
    for _, r in out.iterrows():
        assert r["n_word_tokens"] == len(tokenize_py(r["text"]))


def test_multimodal_feature_plumbing(spark):
    from discogsography_spark.operators.multimodal import (
        extract_image_features,
        frame_sample_plan,
        synthetic_media,
    )

    media = synthetic_media(spark, n=30)
    feats = extract_image_features(media, feature_dim=8).toPandas()
    assert len(feats) == 30
    assert feats["decode_ok"].all()
    assert feats["feature"].map(len).eq(8).all()
    # determinism: same payload → same feature
    again = extract_image_features(media, feature_dim=8).toPandas()
    pd.testing.assert_frame_equal(
        feats.sort_values("media_id").reset_index(drop=True),
        again.sort_values("media_id").reset_index(drop=True),
    )

    frames = frame_sample_plan(media, every_ms=1000)
    counts = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 5 for r in counts)  # 5000ms / 1000ms


def test_multimodal_real_decode_quarantines_unknown_formats(spark):
    """fake=False is the REAL codec path (PNG/BMP decode natively); the
    synthetic table's hash-noise payloads are not a supported format, so
    every row quarantines with the plug-a-decoder guidance instead of
    failing the job."""
    from discogsography_spark.operators.multimodal import (
        extract_image_features,
        synthetic_media,
    )

    media = synthetic_media(spark, n=3)
    feats = extract_image_features(media, fake=False).toPandas()
    assert (~feats["decode_ok"]).all()
    assert feats["error"].str.contains("NotImplementedError|ValueError").all()


def test_ivf_trained_recall_and_determinism(spark):
    """IVF with a data-trained codebook: assignment expression matches the
    numpy argmax, training is seed-deterministic, and nprobe=4/16 recall@10
    vs exact brute force is high on the real embeddings table."""
    import numpy as np

    from discogsography_spark.operators.similarity import (
        brute_force_cosine_topk,
        ivf_cell_col,
        ivf_topk,
        train_ivf_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    pdf = emb.toPandas()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    cent = train_ivf_centroids(mat, nlist=16, iters=8, seed=42)
    assert np.array_equal(cent, train_ivf_centroids(mat, nlist=16, iters=8, seed=42))

    # native assignment == numpy argmax (first-occurrence ties)
    from pyspark.sql import functions as F

    got = {
        int(r["vec_id"]): int(r["c"])
        for r in emb.select(
            "vec_id", ivf_cell_col("embedding", cent).alias("c")
        ).collect()
    }
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    want = np.argmax((mat @ cent.T), axis=1)  # unnormalized rows: same argmax order
    for vid, row in zip(pdf["vec_id"].astype(int), want):
        assert got[vid] == int(row), vid

    # recall@10 against brute force over 5 seeded queries
    rng = np.random.default_rng(11)
    hits = total = 0
    for _ in range(5):
        q = [float(x) for x in rng.standard_normal(mat.shape[1])]
        exact = {r["vec_id"] for r in brute_force_cosine_topk(emb, q, k=10).collect()}
        approx = {
            r["vec_id"] for r in ivf_topk(emb, q, cent, k=10, nprobe=4).collect()
        }
        hits += len(exact & approx)
        total += len(exact)
    assert hits / total >= 0.5, f"recall {hits}/{total}"


def test_graph_sink_hash_gated(spark, tmp_path):
    """GraphSink MERGE semantics: unchanged rows skipped, changed rows
    rewritten, snapshot keeps one row per key across upserts."""
    from discogsography_spark.operators.graph import GraphSink

    sink = GraphSink(str(tmp_path / "graph"))
    v1 = spark.createDataFrame(
        [(1, "customer", "alice"), (2, "customer", "bob")],
        "vid long, label string, name string",
    )
    st = sink.upsert_vertices(v1)
    assert (st.incoming, st.written, st.unchanged_skipped) == (2, 2, 0)
    # re-upsert identical → all skipped
    st = sink.upsert_vertices(v1)
    assert (st.written, st.unchanged_skipped) == (0, 2)
    # one changed, one new
    v2 = spark.createDataFrame(
        [(2, "customer", "bobby"), (3, "customer", "carol")],
        "vid long, label string, name string",
    )
    st = sink.upsert_vertices(v2)
    assert (st.written, st.unchanged_skipped) == (2, 0)
    snap = spark.read.parquet(str(tmp_path / "graph" / "vertices")).toPandas()
    assert sorted(snap["vid"]) == [1, 2, 3]
    assert snap.set_index("vid")["name"].to_dict()[2] == "bobby"

    e1 = spark.createDataFrame(
        [(1, 10, "ORDERED", 3), (2, 11, "ORDERED", 1)],
        "src long, dst long, rel string, weight long",
    )
    st = sink.upsert_edges(e1)
    assert st.written == 2
    st = sink.upsert_edges(e1)
    assert (st.written, st.unchanged_skipped) == (0, 2)


def test_pluggable_image_decoder(spark):
    """A user-supplied decoder callable replaces the stub — same plumbing."""
    import numpy as np

    from discogsography_spark.operators.multimodal import (
        extract_image_features,
        synthetic_media,
    )

    media = synthetic_media(spark, n=8)

    def tiny_decoder(payload: bytes):
        v = float(len(payload or b""))
        return np.full((4, 4, 3), v % 256, dtype=np.float32)

    out = extract_image_features(media, feature_dim=4, decoder=tiny_decoder).toPandas()
    assert out["decode_ok"].all()
    assert all(len(f) == 4 for f in out["feature"])


def test_language_id_scripts_and_stopwords(spark):
    """Two-stage langid: script ranges (ko/ja/zh/ru/ar) win before the Latin
    stopword vote (en/de/fr/es/it/pt/nl); kana beats han so Japanese text
    with kanji reads ja; < 2 script chars cannot override; no signal → und."""
    from discogsography_spark.operators.textstats import language_id

    samples = [
        (0, "the cat is in the house and it is warm for winter", "en"),
        (1, "der hund ist nicht mit der katze und das haus von", "de"),
        (2, "le chat est dans la maison et les jardins pour que", "fr"),
        (3, "el perro es una mascota por para con los gatos del", "es"),
        (4, "il cane che non sono per con della gli amici", "it"),
        (5, "o gato e os dias em um para com visita", "pt"),
        (6, "het huis een van en dat niet zijn voor morgen", "nl"),
        (7, "这是一个测试文档，用于语言识别", "zh"),
        (8, "これはテストです", "ja"),
        (9, "日本語のテスト文書です", "ja"),  # kanji + kana → ja, not zh
        (10, "이것은 테스트 문서입니다", "ko"),
        (11, "это тестовый документ для проверки", "ru"),
        (12, "هذا مستند تجريبي للاختبار", "ar"),
        (13, "zzz qqq xxx yyy", "und"),
        (14, None, "und"),
        (15, "the house 中 is english with one stray char and the", "en"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in samples], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["lang_pred"] for r in language_id(df).collect()
    }
    for i, _, want in samples:
        assert got[i] == want, f"doc {i}: {got[i]} != {want}"


def test_repetition_signals_match_python(spark):
    import re
    from collections import Counter

    from discogsography_spark.operators.textstats import repetition_signals

    rows = [
        (0, "a b a b a b c"),
        (1, "alpha beta gamma delta"),
        (2, ""),
        (3, None),
        (4, "spam spam spam spam spam"),
        (5, "one two one two three one two"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in repetition_signals(df).collect()}
    assert 2 not in got and 3 not in got  # tokenless docs dropped

    for doc_id, text in rows:
        ws = re.findall(r"[a-z0-9]+", (text or "").lower())
        if not ws:
            continue
        n = len(ws)
        r = got[doc_id]
        assert r["n_tokens"] == n
        assert r["word_rep_ratio"] == round(1 - len(set(ws)) / n, 6)
        assert r["mean_word_len"] == round(sum(map(len, ws)) / n, 6)
        bi = Counter(zip(ws, ws[1:]))
        tri = Counter(zip(ws, ws[1:], ws[2:]))
        top2 = max(bi.values()) if bi else 0
        dup3 = sum(c for c in tri.values() if c >= 2)
        assert r["frac_top_bigram"] == round(min(1.0, 2 * top2 / n), 6)
        assert r["frac_dup_trigram"] == round(min(1.0, 3 * dup3 / n), 6)


def test_audio_feature_plumbing_and_quarantine(spark):
    import numpy as np

    from discogsography_spark.operators.multimodal import (
        extract_audio_features,
        synthetic_media,
    )

    media = synthetic_media(spark, n=12).filter("kind = 'audio'")
    out = extract_audio_features(media, n_windows=8).collect()
    assert len(out) == media.count() and all(r["decode_ok"] for r in out)
    for r in out:
        assert len(r["feature"]) == 8
        assert all(x >= 0 for x in r["feature"])  # RMS energies
    # deterministic: same payload → same features across runs/partitions
    again = extract_audio_features(media.repartition(5), n_windows=8).collect()
    assert {r["media_id"]: r["feature"] for r in again} == {
        r["media_id"]: r["feature"] for r in out
    }

    # pluggable decoder + per-row quarantine (one poisoned payload)
    def dec(payload):
        if payload and payload[0] % 2 == 0:
            raise ValueError("bad stream")
        return np.ones(64, dtype=np.float32)

    mixed = extract_audio_features(media, n_windows=4, decoder=dec).collect()
    assert any(not r["decode_ok"] and "bad stream" in r["error"] for r in mixed) or all(
        r["decode_ok"] for r in mixed
    )
    ok_rows = [r for r in mixed if r["decode_ok"]]
    for r in ok_rows:
        assert r["feature"] == [1.0, 1.0, 1.0, 1.0]


def test_audio_real_decode_junk_raises_real_wav_decodes(spark):
    """fake=False audio is the REAL RIFF PCM codec: junk bytes raise (the
    operator quarantines them); an actual WAV payload decodes exactly."""
    import numpy as np
    import pytest as _pytest

    from discogsography_spark.operators.codecs import encode_wav
    from discogsography_spark.operators.multimodal import _decode_audio_impl

    with _pytest.raises(Exception):
        _decode_audio_impl(b"x", fake=False)
    pcm = np.linspace(-0.5, 0.5, 256).astype(np.float32)
    out = _decode_audio_impl(encode_wav(pcm), fake=False)
    assert np.abs(out - pcm).max() < 2 / 32767
