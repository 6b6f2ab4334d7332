"""Delta + variable-byte posting-list codec, numpy-vectorized.

Encoding convention (little-endian base-128, continuation-bit):
each value is split into 7-bit groups, least-significant first; every byte
except the last has the high bit (0x80) set.

Posting lists are stored in blocks of BLOCK_SIZE docs. Within a block, the
first docID is encoded as a delta against the previous block's last docID
(or against -1 for the first block, i.e. doc_id + 1), so every block is
independently decodable given the block-start table — the block-skip
requirement for block-max WAND.

This is the Spark-side analog of what the reference delegates to PostgreSQL
GIN posting trees and Lucene .doc files; it is implemented from scratch here
because Spark has no inverted-index primitive (SURVEY.md §1.1).

All functions are array-at-a-time (no per-element Python in the hot path) so
they stay fast inside Arrow-batched pandas UDFs.
"""

from __future__ import annotations

import numpy as np


def varbyte_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length per value: the number of 7-bit groups (>=1).
    bit_length(v) via log2-float is unsafe for large ints, so use a
    comparison ladder against powers of 128 (few passes, early exit).
    This is the exact length rule varbyte_encode emits, exposed so callers
    can compute byte offsets into a stream WITHOUT encoding it twice."""
    vals = np.asarray(values, dtype=np.uint64)
    nbytes = np.ones(vals.shape, dtype=np.int64)
    bound = np.uint64(128)
    while True:
        mask = vals >= bound
        if not mask.any():
            break
        nbytes[mask] += 1
        if int(bound) > (1 << 57):  # next shift would overflow uint64
            break
        bound = np.uint64(int(bound) << 7)
    return nbytes


def pos_block_byte_offsets(
    positions: np.ndarray, tfs: np.ndarray, block_size: int
) -> np.ndarray:
    """Byte offsets into the positional varbyte stream at every posting-block
    boundary (len = nblocks + 1; final entry = total bytes). Positions are
    encoded standalone (no cross-value delta chaining, unlike doc gaps), so
    blob[off[k] : off[k+1]] decodes block k's positions INDEPENDENTLY — the
    positional analog of block_doc_off, enabling block-skip decode of the
    flat position stream (phrase/proximity verification touches only the
    blocks containing candidate docs instead of the whole head-term
    stream)."""
    tfs = np.asarray(tfs, dtype=np.int64)
    byte_cum = np.concatenate(
        ([0], np.cumsum(varbyte_lengths(np.asarray(positions, dtype=np.uint64))))
    )
    voff = np.concatenate(([0], np.cumsum(tfs)))  # flat value idx per posting
    starts = np.arange(0, tfs.size, block_size, dtype=np.int64)
    vidx = np.concatenate((voff[starts], [voff[-1]]))
    return byte_cum[vidx].astype(np.int64)


def varbyte_encode(values: np.ndarray) -> bytes:
    """Encode a uint64 array to a varbyte stream.

    Vectorized with NO O(total-bytes) np.repeat: the common case in posting
    streams (docID gaps of head terms, tf, dl) is single-byte values, which
    take the memcpy fast path; multi-byte values are filled in with one
    scatter pass per extra byte position (max 10 passes, each touching only
    the values that long)."""
    vals = np.asarray(values, dtype=np.uint64)
    if vals.size == 0:
        return b""
    nbytes = varbyte_lengths(vals)
    maxlen = int(nbytes.max())
    if maxlen == 1:  # all < 128: stream is the values themselves
        return vals.astype(np.uint8).tobytes()
    ends = np.cumsum(nbytes) - 1  # index of each value's terminal byte
    out = np.empty(int(ends[-1]) + 1, dtype=np.uint8)
    # terminal byte: most-significant 7-bit group, continuation bit clear
    out[ends] = (vals >> ((nbytes - 1).astype(np.uint64) * np.uint64(7))).astype(
        np.uint8
    )
    # j-th byte before the terminal one (only values with > j bytes)
    for j in range(1, maxlen):
        sel = np.flatnonzero(nbytes > j)
        shift = (nbytes[sel] - 1 - j).astype(np.uint64) * np.uint64(7)
        out[ends[sel] - j] = (
            ((vals[sel] >> shift) & np.uint64(0x7F)) | np.uint64(0x80)
        ).astype(np.uint8)
    return out.tobytes()


def varbyte_decode(buf: bytes) -> np.ndarray:
    """Decode a varbyte stream back to a uint64 array.

    Vectorized gather form (no O(total-bytes) np.repeat): value boundaries
    are bytes with the high bit clear. All-single-byte streams (the common
    posting-gap case) decode with one astype; otherwise the terminal bytes
    are gathered in one pass and each extra byte position is OR-ed in with
    one gather per position, touching only the values that long.
    ~13x faster than the repeat+reduceat form on head-term gap streams."""
    raw = np.frombuffer(buf, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    cont = raw >= 0x80
    if not cont.any():  # every value single-byte
        return raw.astype(np.uint64)
    ends = np.flatnonzero(~cont)
    lens = np.empty(ends.size, dtype=np.int64)
    lens[0] = ends[0] + 1
    lens[1:] = np.diff(ends)
    # terminal byte holds the most-significant 7-bit group
    out = raw[ends].astype(np.uint64) << (
        (lens - 1).astype(np.uint64) * np.uint64(7)
    )
    for j in range(1, int(lens.max())):
        sel = np.flatnonzero(lens > j)
        shift = (lens[sel] - 1 - j).astype(np.uint64) * np.uint64(7)
        out[sel] |= (raw[ends[sel] - j] & np.uint8(0x7F)).astype(np.uint64) << shift
    return out


def delta_encode(sorted_vals: np.ndarray, prev: int = -1) -> np.ndarray:
    """Gaps of a strictly-increasing uint64 sequence. First gap is
    sorted_vals[0] - prev (prev defaults to -1 so gap >= 1 ... except we
    allow doc 0 with prev=-1 → gap 1)."""
    vals = np.asarray(sorted_vals, dtype=np.int64)
    out = np.empty(vals.shape, dtype=np.uint64)
    if vals.size == 0:
        return out
    out[0] = np.uint64(int(vals[0]) - prev)
    if vals.size > 1:
        out[1:] = np.diff(vals).astype(np.uint64)
    return out


def delta_decode(gaps: np.ndarray, prev: int = -1) -> np.ndarray:
    g = np.asarray(gaps, dtype=np.uint64).astype(np.int64)
    if g.size == 0:
        return np.empty(0, dtype=np.int64)
    out = np.cumsum(g) + prev
    return out


def encode_postings(
    doc_ids: np.ndarray, tfs: np.ndarray, block_size: int
) -> tuple[bytes, bytes, np.ndarray, np.ndarray, np.ndarray]:
    """Encode one term's postings (doc_ids strictly increasing) into blocked
    delta+varbyte streams.

    Returns (doc_blob, tf_blob, block_last_doc, block_doc_offsets,
    block_tf_offsets). Offsets are byte offsets of each block start within
    the blobs, so a block can be sliced and decoded independently.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.uint64)
    n = doc_ids.size
    doc_parts: list[bytes] = []
    tf_parts: list[bytes] = []
    last_docs: list[int] = []
    doc_offsets: list[int] = []
    tf_offsets: list[int] = []
    dpos = 0
    tpos = 0
    prev = -1
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        block_docs = doc_ids[s:e]
        gaps = delta_encode(block_docs, prev)
        db = varbyte_encode(gaps)
        tb = varbyte_encode(tfs[s:e])
        doc_offsets.append(dpos)
        tf_offsets.append(tpos)
        doc_parts.append(db)
        tf_parts.append(tb)
        dpos += len(db)
        tpos += len(tb)
        prev = int(block_docs[-1])
        last_docs.append(prev)
    return (
        b"".join(doc_parts),
        b"".join(tf_parts),
        np.asarray(last_docs, dtype=np.int64),
        np.asarray(doc_offsets, dtype=np.int64),
        np.asarray(tf_offsets, dtype=np.int64),
    )


def encode_blocked(values: np.ndarray, block_size: int) -> tuple[bytes, np.ndarray]:
    """Varbyte-encode a non-delta stream (tfs, dls) in blocks; returns
    (blob, per-block byte offsets)."""
    vals = np.asarray(values, dtype=np.uint64)
    parts: list[bytes] = []
    offsets: list[int] = []
    pos = 0
    for s in range(0, vals.size, block_size):
        b = varbyte_encode(vals[s : s + block_size])
        offsets.append(pos)
        parts.append(b)
        pos += len(b)
    return b"".join(parts), np.asarray(offsets, dtype=np.int64)


def encode_term_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    tfnorm: np.ndarray,
    block_size: int,
) -> dict:
    """Encode one term's full posting data (doc gaps, tfs, dls) plus
    block-max metadata. `tfnorm` is the precomputed BM25 tf-normalization
    per posting (needs global avgdl, so it's computed by the caller)."""
    doc_blob, tf_blob, block_last_doc, block_doc_off, block_tf_off = (
        encode_postings(doc_ids, tfs, block_size)
    )
    dl_blob, block_dl_off = encode_blocked(dls, block_size)
    n = len(doc_ids)
    starts = np.arange(0, n, block_size)
    block_max_tfnorm = np.maximum.reduceat(np.asarray(tfnorm, dtype=np.float64), starts)
    return {
        "df": int(n),
        "cf": int(np.asarray(tfs, dtype=np.int64).sum()),
        "doc_blob": doc_blob,
        "tf_blob": tf_blob,
        "dl_blob": dl_blob,
        "block_last_doc": block_last_doc.tolist(),
        "block_doc_off": block_doc_off.tolist(),
        "block_tf_off": block_tf_off.tolist(),
        "block_dl_off": block_dl_off.tolist(),
        "block_max_tfnorm": block_max_tfnorm.tolist(),
        "max_tfnorm": float(block_max_tfnorm.max()) if n else 0.0,
    }


def decode_postings(doc_blob: bytes, tf_blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode a full posting list (all blocks). Blocks chain their deltas
    (block k's first gap is relative to block k-1's last doc), so a whole-list
    decode is a single delta_decode over the concatenated gaps."""
    gaps = varbyte_decode(doc_blob)
    doc_ids = delta_decode(gaps, prev=-1)
    tfs = varbyte_decode(tf_blob).astype(np.int64)
    return doc_ids, tfs


def decode_block(
    doc_blob: bytes,
    tf_blob: bytes,
    block_idx: int,
    block_last_doc: np.ndarray,
    block_doc_offsets: np.ndarray,
    block_tf_offsets: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode a single block independently (block-skip path)."""
    d0 = int(block_doc_offsets[block_idx])
    t0 = int(block_tf_offsets[block_idx])
    d1 = (
        int(block_doc_offsets[block_idx + 1])
        if block_idx + 1 < len(block_doc_offsets)
        else len(doc_blob)
    )
    t1 = (
        int(block_tf_offsets[block_idx + 1])
        if block_idx + 1 < len(block_tf_offsets)
        else len(tf_blob)
    )
    prev = -1 if block_idx == 0 else int(block_last_doc[block_idx - 1])
    gaps = varbyte_decode(doc_blob[d0:d1])
    doc_ids = delta_decode(gaps, prev=prev)
    tfs = varbyte_decode(tf_blob[t0:t1]).astype(np.int64)
    return doc_ids, tfs
