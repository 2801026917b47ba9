import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from siem_on_amazon_opensearch_service_spark.codec import (
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    vb_decode,
    vb_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**62), max_size=500))
@settings(max_examples=200, deadline=None)
def test_vb_roundtrip(values):
    arr = np.array(values, dtype=np.uint64)
    assert np.array_equal(vb_decode(vb_encode(arr)), arr)


def test_vb_empty():
    assert vb_encode(np.array([], dtype=np.uint64)) == b""
    assert vb_decode(b"").size == 0


def test_vb_boundaries():
    # 7-bit group boundaries
    vals = np.array([0, 1, 127, 128, 16383, 16384, 2**32, 2**62], dtype=np.uint64)
    assert np.array_equal(vb_decode(vb_encode(vals)), vals)


@given(
    st.lists(st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300, unique=True)
)
@settings(max_examples=100, deadline=None)
def test_delta_roundtrip(ids):
    arr = np.sort(np.array(ids, dtype=np.uint64))
    assert np.array_equal(delta_decode(delta_encode(arr)), arr)


def test_postings_roundtrip():
    rng = np.random.default_rng(0)
    ids = np.sort(rng.choice(10**9, size=1000, replace=False)).astype(np.uint64)
    tfs = rng.integers(1, 50, size=1000).astype(np.uint64)
    dvb, tvb = encode_postings(ids, tfs)
    d2, t2 = decode_postings(dvb, tvb)
    assert np.array_equal(d2, ids)
    assert np.array_equal(t2, tfs)


def test_compression_ratio():
    # dense doc ids -> ~1 byte per id
    ids = np.arange(0, 100_000, 3, dtype=np.uint64)
    enc = vb_encode(delta_encode(ids))
    assert len(enc) < ids.size * 1.2
