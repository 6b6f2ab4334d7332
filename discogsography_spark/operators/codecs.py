"""Real, dependency-free media codecs for the multimodal operators.

This container has no PIL/libvips/soundfile/ffmpeg — but the three most
common interchange formats need none of them:

- **WAV** (RIFF PCM): the stdlib `wave` module + numpy frombuffer. 8/16/32
  bit integer PCM, any channel count (downmixed to mono by mean), output
  float32 in [-1, 1].
- **PNG**: hand-rolled chunk parser + zlib inflate + per-row unfiltering
  (all five filter types incl. Paeth, PNG spec §9). Supports bit depth 8,
  color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA),
  non-interlaced — the overwhelming majority of real PNGs. Palette or
  interlaced images raise with a clear message (plug a PIL decoder for
  those).
- **BMP**: uncompressed 24/32-bit Windows bitmaps (BITMAPINFOHEADER),
  bottom-up or top-down rows, 4-byte row padding.

JPEG and lossy audio stay behind the pluggable `decoder=` escape hatch —
an entropy-coded DCT decoder is out of scope without a library. The
unfilter loop is per-row python over numpy byte rows: exact and fine at
feature-extraction sizes (a 64x64 RGB PNG unfilters in ~1 ms); a
throughput-critical deployment would plug libvips via `decoder=`.

A matching `encode_png` (any per-row filter type) and `encode_wav` exist so
tests can synthesize REAL files and prove byte-exact roundtrips through
every filter path.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# channels per PNG color type (bit depth 8 only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> np.ndarray:
    """PNG → uint8 array (H, W, C). Bit depth 8; color types 0/2/4/6;
    non-interlaced (see module docstring)."""
    if not payload or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8:
        raise NotImplementedError(f"PNG bit depth {bit_depth} (only 8 supported)")
    if color_type not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG color type {color_type} (palette images need a real decoder)"
        )
    if interlace:
        raise NotImplementedError("interlaced PNG (Adam7) not supported")
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"PNG data length {len(raw)} != expected {height * (stride + 1)}"
        )
    out = np.zeros((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        off = y * (stride + 1)
        ftype = raw[off]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).copy()
        if ftype == 0:  # None
            recon = row
        elif ftype == 1:  # Sub
            recon = row
            for i in range(ch, stride):
                # int-cast before adding: uint8 + uint8 overflows (numpy
                # RuntimeWarning, crash under np.seterr(over='raise'))
                recon[i] = (int(recon[i]) + int(recon[i - ch])) & 0xFF
        elif ftype == 2:  # Up
            recon = (row.astype(np.int16) + prior).astype(np.uint8)
        elif ftype == 3:  # Average
            recon = row
            for i in range(stride):
                left = int(recon[i - ch]) if i >= ch else 0
                recon[i] = (recon[i] + ((left + int(prior[i])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            recon = row
            for i in range(stride):
                left = int(recon[i - ch]) if i >= ch else 0
                up = int(prior[i])
                ul = int(prior[i - ch]) if i >= ch else 0
                recon[i] = (recon[i] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype}")
        out[y] = recon
        prior = out[y]
    return out.reshape(height, width, ch)


def encode_png(
    arr: np.ndarray, filter_type: int = 0, level: int = 6
) -> bytes:
    """uint8 (H, W, C in {1,2,3,4}) → PNG bytes, every row filtered with
    `filter_type` (0-4) — the test harness for decode_png's filter paths."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, ch = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = a.reshape(h, w * ch)
    stride = w * ch
    lines = bytearray()
    prior = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        recon = flat[y].astype(np.int16)
        if filter_type == 0:
            filt = recon
        elif filter_type == 1:
            left = np.concatenate((np.zeros(ch, np.int16), recon[:-ch]))
            filt = recon - left
        elif filter_type == 2:
            filt = recon - prior
        elif filter_type == 3:
            left = np.concatenate((np.zeros(ch, np.int16), recon[:-ch]))
            filt = recon - ((left + prior.astype(np.int16)) >> 1)
        elif filter_type == 4:
            filt = recon.copy()
            for i in range(stride):
                left = int(flat[y][i - ch]) if i >= ch else 0
                up = int(prior[i])
                ul = int(prior[i - ch]) if i >= ch else 0
                filt[i] = int(recon[i]) - _paeth(left, up, ul)
        else:
            raise ValueError(f"filter type {filter_type}")
        lines.append(filter_type)
        lines.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prior = flat[y]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines), level))
        + chunk(b"IEND", b"")
    )


def decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP → uint8 (H, W, 3) in RGB order."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack("<I", payload[10:14])
    (hdr_size,) = struct.unpack("<I", payload[14:18])
    if hdr_size < 40:
        raise NotImplementedError(f"BMP header size {hdr_size}")
    width, height = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"BMP bpp={bpp} compression={compression} (only uncompressed 24/32)"
        )
    top_down = height < 0
    height = abs(height)
    ch = bpp // 8
    row_size = (width * ch + 3) & ~3
    out = np.zeros((height, width, 3), dtype=np.uint8)
    for y in range(height):
        off = data_off + y * row_size
        row = np.frombuffer(payload, dtype=np.uint8, count=width * ch, offset=off)
        row = row.reshape(width, ch)
        dst = y if top_down else height - 1 - y
        out[dst] = row[:, [2, 1, 0]]  # BGR(A) → RGB
    return out


def decode_image(payload: bytes) -> np.ndarray:
    """Sniff the magic and dispatch: PNG or BMP decode for real; anything
    else (JPEG, WebP, …) raises NotImplementedError — plug a PIL/libvips
    wrapper via the operators' `decoder=` parameter."""
    if payload and payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload and payload[:2] == b"BM":
        return decode_bmp(payload)
    head = bytes(payload[:4]) if payload else b""
    raise NotImplementedError(
        f"unsupported image format (magic {head!r}) — PNG and BMP decode "
        "natively; other formats need a pluggable decoder (PIL/libvips)"
    )


def decode_wav(payload: bytes) -> np.ndarray:
    """RIFF PCM WAV → mono float32 in [-1, 1] (channels downmixed by
    mean). 8-bit unsigned, 16/32-bit signed PCM."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        n_ch = wf.getnchannels()
        sw = wf.getsampwidth()
        frames = wf.readframes(wf.getnframes())
    if sw == 1:
        pcm = np.frombuffer(frames, dtype=np.uint8).astype(np.float32)
        pcm = (pcm - 128.0) / 128.0
    elif sw == 2:
        pcm = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 4:
        pcm = np.frombuffer(frames, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise NotImplementedError(f"WAV sample width {sw} bytes")
    if n_ch > 1:
        pcm = pcm.reshape(-1, n_ch).mean(axis=1)
    return pcm.astype(np.float32)


def encode_wav(
    pcm: np.ndarray, rate: int = 16000, sampwidth: int = 2
) -> bytes:
    """mono float32 [-1, 1] → PCM WAV bytes (test harness for decode_wav)."""
    x = np.clip(np.asarray(pcm, dtype=np.float64), -1.0, 1.0)
    if sampwidth == 2:
        data = (x * 32767.0).astype("<i2").tobytes()
    elif sampwidth == 1:
        data = (x * 127.0 + 128.0).astype(np.uint8).tobytes()
    elif sampwidth == 4:
        data = (x * 2147483647.0).astype("<i4").tobytes()
    else:
        raise ValueError(f"sample width {sampwidth}")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(sampwidth)
        wf.setframerate(rate)
        wf.writeframes(data)
    return buf.getvalue()
