"""Codec invariants (SURVEY.md §5.2): varint/delta round-trip identity,
including property-based random arrays."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from mahout_spark.index.codec import (
    decode_doc_block,
    delta_decode,
    delta_encode,
    encode_doc_block,
    varint_decode,
    varint_encode,
)


def test_varint_known_values():
    vals = np.array([0, 1, 127, 128, 300, 2**21, 2**35, 2**63 - 1], np.uint64)
    enc = varint_encode(vals)
    assert list(varint_decode(enc)) == list(vals)
    # 127 -> 1 byte, 128 -> 2 bytes
    assert len(varint_encode(np.array([127], np.uint64))) == 1
    assert len(varint_encode(np.array([128], np.uint64))) == 2


def test_empty():
    assert varint_encode(np.empty(0, np.uint64)) == b""
    assert len(varint_decode(b"")) == 0


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=300))
def test_varint_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    assert list(varint_decode(varint_encode(vals))) == xs


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40), min_size=1, max_size=300,
        unique=True,
    )
)
def test_block_roundtrip_property(docids):
    doc = np.array(sorted(docids), dtype=np.uint64)
    rng = np.random.default_rng(42)
    tf = rng.integers(1, 1000, len(doc)).astype(np.uint64)
    dl = rng.integers(1, 100000, len(doc)).astype(np.uint64)
    d2, t2, l2 = decode_doc_block(*encode_doc_block(doc, tf, dl))
    assert list(d2) == list(doc)
    assert list(t2) == list(tf)
    assert list(l2) == list(dl)


def test_delta_identity():
    v = np.array([5, 6, 100, 1000], np.uint64)
    assert list(delta_decode(delta_encode(v))) == list(v)
