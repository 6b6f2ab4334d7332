"""Multimodal columns: image/audio/video as opaque `binary` with typed
metadata, processed via Arrow-batched mapInPandas.

Decode is REAL for the dependency-free formats — PNG and uncompressed BMP
images, RIFF PCM WAV audio (operators/codecs.py: stdlib zlib/struct/wave +
numpy, byte-exact roundtrip-tested) — with `fake=False`. Formats that
genuinely need a native library (JPEG, lossy audio, video) raise
NotImplementedError from the codec sniffer unless a pluggable `decoder=`
callable is supplied; `fake=True` keeps the deterministic payload-hash
fake for pipeline-shape tests. Everything Spark-side — schema,
partitioning, UDF signature, Arrow batch shape, per-row quarantine — is
identical across all three decode sources.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)


def _decode_image_impl(payload: bytes, fake: bool) -> np.ndarray:
    """fake=False: REAL decode via operators/codecs.py (PNG/BMP natively;
    other formats raise with guidance to plug a decoder). fake=True: the
    deterministic payload-hash fake, which exercises the full pipeline
    (batching, pooling, feature shape) without real media bytes."""
    if not fake:
        from discogsography_spark.operators.codecs import decode_image

        return decode_image(payload).astype(np.float32)
    h = hashlib.sha256(payload or b"").digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    return rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8).astype(np.float32)


def extract_image_features(
    media: DataFrame,
    feature_dim: int = 8,
    fake: bool = True,
    decoder=None,
) -> DataFrame:
    """binary payload → decode → resize → mean-pool feature vector, one Arrow
    batch at a time. Rows that fail to decode land in the quarantine columns
    (decode_ok=false, error) instead of failing the job — the poison-message
    DLQ pattern (/root/reference/tableinator/tableinator.py:1132-1137).

    `decoder` plugs a REAL decode: any picklable `bytes -> np.ndarray(H,W,C)`
    callable (e.g. PIL/libvips wrapped) replaces the stub — the Spark-side
    plumbing is identical either way; this container just lacks the libs."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats, oks, errs = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                ids.append(mid)
                try:
                    img = (
                        decoder(payload)
                        if decoder is not None
                        else _decode_image_impl(payload, fake)
                    )
                    pooled = img.mean(axis=(0, 1))  # (3,)
                    reps = int(np.ceil(feature_dim / pooled.size))
                    feat = np.tile(pooled, reps)[:feature_dim] / 255.0
                    feats.append([float(x) for x in feat])
                    oks.append(True)
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — quarantine, don't fail
                    feats.append(None)
                    oks.append(False)
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(
                {"media_id": ids, "feature": feats, "decode_ok": oks, "error": errs}
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)


def _decode_audio_impl(payload: bytes, fake: bool) -> np.ndarray:
    """fake=False: REAL RIFF PCM WAV decode via operators/codecs.py
    (lossy formats need a pluggable decoder). fake=True: deterministic
    pseudo-PCM from the payload hash for pipeline-shape tests."""
    if not fake:
        from discogsography_spark.operators.codecs import decode_wav

        return decode_wav(payload)
    h = hashlib.sha256(payload or b"").digest()
    rng = np.random.default_rng(int.from_bytes(h[8:16], "little"))
    return (rng.standard_normal(4096)).astype(np.float32)


def extract_audio_features(
    media: DataFrame,
    n_windows: int = 8,
    fake: bool = True,
    decoder=None,
) -> DataFrame:
    """binary payload → PCM decode → fixed window split → per-window RMS
    energy vector. Same contract as extract_image_features: Arrow-batched
    mapInPandas, per-row quarantine columns instead of job failure, and a
    pluggable `decoder` (any picklable bytes -> np.ndarray(float) mono PCM,
    e.g. a soundfile wrapper) replacing the container-limited stub."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats, oks, errs = [], [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                ids.append(mid)
                try:
                    pcm = (
                        decoder(payload)
                        if decoder is not None
                        else _decode_audio_impl(payload, fake)
                    )
                    pcm = np.asarray(pcm, dtype=np.float32)
                    if pcm.size == 0:
                        raise ValueError("empty PCM stream")
                    w = max(1, pcm.size // n_windows)
                    rms = [
                        float(np.sqrt(np.mean(pcm[j * w : (j + 1) * w] ** 2)))
                        if pcm[j * w : (j + 1) * w].size
                        else 0.0
                        for j in range(n_windows)
                    ]
                    feats.append(rms)
                    oks.append(True)
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — quarantine, don't fail
                    feats.append(None)
                    oks.append(False)
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(
                {"media_id": ids, "feature": feats, "decode_ok": oks, "error": errs}
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expand each video row into frame
    timestamps (native sequence/explode — the expensive decode would attach
    per frame via mapInPandas in a real deployment)."""
    return (
        media.filter(F.col("kind") == "video")
        .withColumn(
            "frame_ts_ms",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ),
        )
        .select("media_id", "frame_ts_ms")
    )


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(str(i).encode()).digest() * 4
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                bytearray(payload),
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                5000 if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
