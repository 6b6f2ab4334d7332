"""Real media codecs (operators/codecs.py): byte-exact PNG roundtrips
through every filter type, BMP parsing, WAV PCM roundtrips, and the
multimodal operators running REAL (fake=False) decodes end-to-end."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from discogsography_spark.operators.codecs import (
    decode_bmp,
    decode_image,
    decode_png,
    decode_wav,
    encode_png,
    encode_wav,
)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_roundtrip_every_filter(filter_type, channels):
    rng = np.random.default_rng(filter_type * 10 + channels)
    img = rng.integers(0, 256, size=(13, 17, channels), dtype=np.uint8)
    payload = encode_png(img, filter_type=filter_type)
    out = decode_png(payload)
    assert out.shape == img.shape
    np.testing.assert_array_equal(out, img)


def test_png_gradient_and_dispatch():
    # smooth gradients are where Sub/Up/Average/Paeth actually differ
    y, x = np.mgrid[0:32, 0:48]
    img = np.stack([(x * 5) % 256, (y * 7) % 256, (x + y) % 256], axis=-1).astype(np.uint8)
    for ft in range(5):
        np.testing.assert_array_equal(decode_png(encode_png(img, ft)), img)
    # decode_image sniffs the signature
    np.testing.assert_array_equal(decode_image(encode_png(img)), img)


def test_png_rejects_unsupported():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"notapng")
    with pytest.raises(NotImplementedError, match="magic"):
        decode_image(b"\xff\xd8\xff\xe0JFIF....")  # JPEG magic


def _make_bmp(img: np.ndarray, top_down: bool = False) -> bytes:
    h, w, _ = img.shape
    row_size = (w * 3 + 3) & ~3
    data = bytearray()
    rows = range(h) if top_down else range(h - 1, -1, -1)
    for y in rows:
        row = img[y][:, [2, 1, 0]].tobytes()  # RGB → BGR
        data.extend(row)
        data.extend(b"\x00" * (row_size - len(row)))
    hsize = 14 + 40
    height_field = -h if top_down else h
    header = (
        b"BM"
        + struct.pack("<IHHI", hsize + len(data), 0, 0, hsize)
        + struct.pack("<IiiHHIIiiII", 40, w, height_field, 1, 24, 0,
                      len(data), 2835, 2835, 0, 0)
    )
    return bytes(header) + bytes(data)


@pytest.mark.parametrize("top_down", [False, True])
def test_bmp_decode(top_down):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(9, 5, 3), dtype=np.uint8)
    out = decode_bmp(_make_bmp(img, top_down=top_down))
    np.testing.assert_array_equal(out, img)
    np.testing.assert_array_equal(decode_image(_make_bmp(img)), img)


def test_wav_roundtrip_mono_and_stereo():
    t = np.linspace(0, 1, 8000, endpoint=False)
    pcm = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    for sw, tol in [(2, 2 / 32767), (1, 2 / 127), (4, 1e-6)]:
        out = decode_wav(encode_wav(pcm, sampwidth=sw))
        assert out.dtype == np.float32 and out.size == pcm.size
        assert np.abs(out - pcm).max() <= tol + 1e-6, sw

    # stereo downmix: build a 2-channel WAV by hand
    import io
    import wave

    left = (0.25 * np.sin(2 * np.pi * 220 * t)).astype(np.float64)
    right = (0.75 * np.sin(2 * np.pi * 220 * t)).astype(np.float64)
    inter = np.empty(left.size * 2)
    inter[0::2], inter[1::2] = left, right
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes((inter * 32767.0).astype("<i2").tobytes())
    out = decode_wav(buf.getvalue())
    np.testing.assert_allclose(out, (left + right) / 2, atol=2 / 32767)


def test_extract_image_features_real_decode(spark):
    """fake=False runs the REAL codec: PNG payloads decode to their actual
    pixel means; a JPEG payload quarantines with guidance, never fails."""
    from discogsography_spark.operators.multimodal import extract_image_features

    rng = np.random.default_rng(3)
    imgs = {i: rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8) for i in range(3)}
    rows = [(i, "image", "image/png", bytearray(encode_png(imgs[i])), 8, 8, None)
            for i in range(3)]
    rows.append((9, "image", "image/jpeg", bytearray(b"\xff\xd8\xff\xe0 fake jpeg"),
                 8, 8, None))
    from discogsography_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in
           extract_image_features(media, feature_dim=3, fake=False).collect()}
    for i in range(3):
        assert got[i]["decode_ok"] is True
        want = imgs[i].astype(np.float32).mean(axis=(0, 1)) / 255.0
        np.testing.assert_allclose(got[i]["feature"], want, rtol=1e-6)
    assert got[9]["decode_ok"] is False
    assert "NotImplementedError" in got[9]["error"]


def test_extract_audio_features_real_decode(spark):
    from discogsography_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_audio_features,
    )

    t = np.linspace(0, 1, 4096, endpoint=False)
    pcm = (0.5 * np.sin(2 * np.pi * 100 * t)).astype(np.float32)
    rows = [(0, "audio", "audio/wav", bytearray(encode_wav(pcm)), None, None, 1000)]
    media = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    row = extract_audio_features(media, n_windows=4, fake=False).collect()[0]
    assert row["decode_ok"] is True
    dec = decode_wav(encode_wav(pcm))
    w = dec.size // 4
    want = [float(np.sqrt(np.mean(dec[j * w:(j + 1) * w] ** 2))) for j in range(4)]
    np.testing.assert_allclose(row["feature"], want, rtol=1e-6)
