"""quantize_norms flag (SURVEY.md §7.1 risk / VERDICT r01 missing #7):
ES-style lossy doc-length norms in the spirit of Lucene's 1-byte SmallFloat
norm encoding [public]. Default OFF — these tests pin the opt-in behavior."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from engine.codec import decode_postings, quantize_norm
from engine.index import build_index
from engine.io import read_fixture
from engine.searcher import LoadedIndex


def test_quantize_norm_properties():
    dl = np.arange(0, 5000, dtype=np.int64)
    q = quantize_norm(dl)
    # identity below 16 (4 significant bits hold everything)
    assert np.array_equal(q[:16], dl[:16])
    # never exceeds the input; dropped bits < 2^(nbits-4) ≤ dl/8
    assert np.all(q <= dl)
    assert np.all(dl - q <= dl // 8)
    # monotone and idempotent
    assert np.all(np.diff(q) >= 0)
    assert np.array_equal(quantize_norm(q), q)
    # actually lossy somewhere
    assert (q != dl).any()


@pytest.fixture(scope="module")
def pair(spark, sf_dir, tmp_path_factory):
    docs = read_fixture(spark, sf_dir, "documents").select("doc_id", "text")
    base = tmp_path_factory.mktemp("norms")
    build_index(spark, docs, str(base / "exact"), n_buckets=4,
                docs_per_shard=128, block_size=32)
    build_index(spark, docs, str(base / "quant"), n_buckets=4,
                docs_per_shard=128, block_size=32, quantize_norms=True)
    return LoadedIndex(spark, str(base / "exact")), LoadedIndex(spark, str(base / "quant"))


def test_quantized_index_dls_are_quantized(pair):
    exact, quant = pair
    assert quant.manifest.quantize_norms and not exact.manifest.quantize_norms
    # avgdl derives from EXACT lengths in both (Lucene-style)
    assert quant.manifest.avgdl == pytest.approx(exact.manifest.avgdl)
    for r in quant.postings.limit(50).collect():
        _, _, dls = decode_postings(
            r["doc_ids_enc"], r["tfs_enc"], r["dls_enc"], [tuple(s) for s in r["skips"]]
        )
        assert np.array_equal(quantize_norm(dls), dls)
    # Spark-side quantizer == NumPy quantizer, doc by doc
    got = {r["doc_id"]: r["dl"] for r in quant.doc_stats.collect()}
    want = {
        r["doc_id"]: int(quantize_norm(np.array([r["dl"]]))[0])
        for r in exact.doc_stats.collect()
    }
    assert got == want


def test_quantized_search_self_consistent_and_close(pair):
    exact, quant = pair
    for q, mode in [("table", "or"), ("sort merge join", "and"), ("window stream", "or")]:
        w = [(r["doc_id"], r["score"]) for r in quant.search(q, k=10, mode=mode).collect()]
        e = [(r["doc_id"], r["score"]) for r in quant.search(q, k=10, mode=mode, algo="exhaustive").collect()]
        assert w == e, q  # WAND pruning stays sound under quantized norms
        # ranking stays close to the exact index: top-10 sets mostly overlap
        ex = {r["doc_id"] for r in exact.search(q, k=10, mode=mode).collect()}
        assert len(ex & {d for d, _ in w}) >= 8, q


class TestSmallFloatTable:
    """quantize_norm is pinned to the PUBLIC Lucene SmallFloat intToByte4
    table: identical quantized values, monotone byte encoding, roundtrip."""

    def test_quantize_equals_byte4_roundtrip_exhaustive(self):
        from engine.codec import byte4_to_int, int_to_byte4, quantize_norm

        v = np.arange(0, 200_000, dtype=np.int64)
        np.testing.assert_array_equal(
            quantize_norm(v), byte4_to_int(int_to_byte4(v))
        )

    def test_quantize_equals_byte4_roundtrip_large_random(self):
        from engine.codec import byte4_to_int, int_to_byte4, quantize_norm

        rng = np.random.default_rng(3)
        v = rng.integers(0, 2**31, 100_000, dtype=np.int64)
        np.testing.assert_array_equal(
            quantize_norm(v), byte4_to_int(int_to_byte4(v))
        )

    def test_byte_encoding_monotone_and_compact(self):
        from engine.codec import int_to_byte4

        v = np.arange(0, 1_000_000, dtype=np.int64)
        b = int_to_byte4(v).astype(np.int64)
        assert b.dtype == np.int64 and b.max() <= 255
        assert (np.diff(b) >= 0).all()  # non-decreasing in the value
        # distinct quantized values <-> distinct bytes (an injective table)
        from engine.codec import quantize_norm

        q = quantize_norm(v)
        assert len(np.unique(b)) == len(np.unique(q))

    def test_idempotent(self):
        from engine.codec import quantize_norm

        v = np.arange(0, 100_000, dtype=np.int64)
        q = quantize_norm(v)
        np.testing.assert_array_equal(quantize_norm(q), q)
