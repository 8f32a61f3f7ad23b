"""Property tests for the posting codec (SURVEY.md §5.4)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from engine.codec import (
    decode_block,
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    varint_decode,
    varint_encode,
)


@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
@settings(max_examples=200, deadline=None)
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(arr)), arr)


def test_varint_known_bytes():
    # 0→00, 127→7f, 128→80 01, 300→ac 02 (LEB128)
    assert varint_encode(np.array([0], dtype=np.uint64)) == b"\x00"
    assert varint_encode(np.array([127], dtype=np.uint64)) == b"\x7f"
    assert varint_encode(np.array([128], dtype=np.uint64)) == b"\x80\x01"
    assert varint_encode(np.array([300], dtype=np.uint64)) == b"\xac\x02"


@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=300, unique=True)
)
@settings(max_examples=200, deadline=None)
def test_delta_roundtrip(ids):
    arr = np.sort(np.array(ids, dtype=np.int64))
    assert np.array_equal(delta_decode(delta_encode(arr)), arr)


def test_delta_rejects_duplicates():
    with pytest.raises(ValueError):
        delta_encode(np.array([1, 1, 2]))


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),  # doc_id
            st.integers(min_value=1, max_value=1000),  # tf
            st.integers(min_value=1, max_value=5000),  # dl
        ),
        min_size=1,
        max_size=1000,
    )
)
@settings(max_examples=100, deadline=None)
def test_postings_roundtrip(rows):
    # unique doc_ids
    seen, uniq = set(), []
    for d, tf, dl in rows:
        if d not in seen:
            seen.add(d)
            uniq.append((d, tf, dl))
    doc_ids = np.array([r[0] for r in uniq])
    tfs = np.array([r[1] for r in uniq])
    dls = np.array([r[2] for r in uniq])
    enc = encode_postings(doc_ids, tfs, dls, avgdl=100.0, block_size=16)
    ids2, tfs2, dls2 = decode_postings(
        enc["doc_ids_enc"], enc["tfs_enc"], enc["dls_enc"], enc["skips"]
    )
    order = np.argsort(doc_ids, kind="stable")
    assert np.array_equal(ids2, doc_ids[order])
    assert np.array_equal(tfs2, tfs[order])
    assert np.array_equal(dls2, dls[order])
    assert enc["df"] == len(uniq)
    assert enc["cf"] == int(tfs.sum())
    # skip metadata: first_doc per block, block_max = max block impact
    assert enc["skips"][0][0] == int(doc_ids[order][0])
    assert enc["block_max"] == pytest.approx(max(s[4] for s in enc["skips"]))


def test_block_seek_decode():
    n = 1000
    rng = np.random.default_rng(7)
    doc_ids = np.sort(rng.choice(10**7, size=n, replace=False))
    tfs = rng.integers(1, 50, size=n)
    dls = rng.integers(20, 500, size=n)
    enc = encode_postings(doc_ids, tfs, dls, avgdl=250.0, block_size=128)
    # decoding block i alone must match the corresponding slice
    for i in range(len(enc["skips"])):
        ids_b, tfs_b, dls_b = decode_block(
            enc["doc_ids_enc"], enc["tfs_enc"], enc["dls_enc"], enc["skips"], i
        )
        s, e = i * 128, min((i + 1) * 128, n)
        assert np.array_equal(ids_b, doc_ids[s:e])
        assert np.array_equal(tfs_b, tfs[s:e])
        assert np.array_equal(dls_b, dls[s:e])


def test_compression_is_effective():
    # dense ascending ids ⇒ gaps are tiny ⇒ ~1 byte per doc
    doc_ids = np.arange(0, 100_000, dtype=np.int64)
    tfs = np.ones(100_000, dtype=np.int64)
    dls = np.full(100_000, 100)
    enc = encode_postings(doc_ids, tfs, dls, avgdl=100.0)
    assert len(enc["doc_ids_enc"]) < 110_000  # ≈1.0–1.1 B/doc vs 8 B raw


@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=300, unique=True),
)
@settings(max_examples=30, deadline=None)
def test_block_max_is_float32_safe_upper_bound(ids):
    """Stored impact bounds must remain UPPER bounds after the float32
    parquet round-trip: for every block, float32(stored) >= max exact
    float64 impact of the block (cast-to-nearest could round below, making
    WAND's block skip unsound)."""
    import numpy as np

    from engine.codec import bm25_impact, encode_postings

    ids = np.sort(np.asarray(ids, dtype=np.int64))
    rng = np.random.default_rng(7)
    tfs = rng.integers(1, 50, len(ids)).astype(np.int64)
    dls = rng.integers(5, 500, len(ids)).astype(np.int64)
    avgdl = 100.0
    enc = encode_postings(ids, tfs, dls, avgdl, block_size=32)
    impacts = bm25_impact(tfs, dls, avgdl)
    bounds = np.append(np.arange(0, len(ids), 32), len(ids))
    for bi, s in enumerate(enc["skips"]):
        true_max = float(impacts[bounds[bi]:bounds[bi + 1]].max())
        stored_f32 = np.float32(s[4])
        assert float(stored_f32) >= true_max
    assert float(np.float32(enc["block_max"])) >= float(impacts.max())
