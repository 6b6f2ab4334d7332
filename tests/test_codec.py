from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from discogsography_spark.codec import (
    decode_block,
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    encode_term_postings,
    varbyte_decode,
    varbyte_encode,
)


def test_varbyte_roundtrip_small():
    vals = np.array([0, 1, 127, 128, 129, 16383, 16384, 2**30, 2**45], dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(vals)), vals)


def test_varbyte_empty():
    assert varbyte_encode(np.array([], dtype=np.uint64)) == b""
    assert varbyte_decode(b"").size == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=300))
def test_varbyte_roundtrip_property(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varbyte_decode(varbyte_encode(arr)), arr)


def test_delta_roundtrip():
    docs = np.array([0, 1, 5, 6, 100, 10**9], dtype=np.int64)
    gaps = delta_encode(docs)
    assert np.array_equal(delta_decode(gaps), docs)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=500, unique=True)
)
def test_postings_roundtrip_property(docs):
    docs = np.sort(np.array(docs, dtype=np.int64))
    tfs = (docs % 17 + 1).astype(np.uint64)
    for block_size in (4, 128):
        doc_blob, tf_blob, last, doff, toff = encode_postings(docs, tfs, block_size)
        d2, t2 = decode_postings(doc_blob, tf_blob)
        assert np.array_equal(d2, docs)
        assert np.array_equal(t2, tfs.astype(np.int64))
        # every block independently decodable
        for bi in range(len(last)):
            bd, bt = decode_block(doc_blob, tf_blob, bi, last, doff, toff)
            s, e = bi * block_size, min((bi + 1) * block_size, len(docs))
            assert np.array_equal(bd, docs[s:e])
            assert np.array_equal(bt, tfs[s:e].astype(np.int64))


def test_encode_term_postings_blockmax():
    docs = np.arange(0, 300, dtype=np.int64)
    tfs = np.ones(300, dtype=np.int64)
    dls = np.full(300, 10, dtype=np.int64)
    tfnorm = np.linspace(0.1, 0.9, 300)
    enc = encode_term_postings(docs, tfs, dls, tfnorm, block_size=128)
    assert enc["df"] == 300
    assert enc["cf"] == 300
    assert len(enc["block_last_doc"]) == 3
    assert enc["block_last_doc"] == [127, 255, 299]
    assert enc["max_tfnorm"] == pytest.approx(0.9)
    assert enc["block_max_tfnorm"][0] == pytest.approx(tfnorm[127])
