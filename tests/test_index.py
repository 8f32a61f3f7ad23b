"""Index build + index-backed search integration tests (SURVEY.md M2/M3/M4).

Asserts the property chain: compressed-index WAND search == exact SQL scorer
== NumPy oracle; index invariant under segmentation and salting.
"""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine.codec import decode_postings
from engine.corpus import corpus_stats, term_stats, tf_table, tokens, with_tokens
from engine.index import build_index, build_term_dict
from engine.io import read_fixture
from engine.search import exact_search
from engine.searcher import LoadedIndex

QUERIES = [
    ("table", 10, "or"),
    ("dup", 10, "or"),
    ("sort merge join", 10, "and"),
    ("window stream", 10, "or"),
    ("scan -filter", 10, "or"),
    ("customer order", 100, "and"),
    ("the", 5, "or"),
    ("zzznonexistent", 10, "or"),
]


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return read_fixture(spark, sf_dir, "documents").select("doc_id", "text")


@pytest.fixture(scope="module")
def exact(spark, sf_dir):
    docs = read_fixture(spark, sf_dir, "documents")
    dwt = with_tokens(docs).cache()
    tf = tf_table(tokens(dwt)).cache()
    ds = dwt.select("doc_id", "dl").cache()
    ts = term_stats(tf).cache()
    n, avgdl = corpus_stats(ds)
    return tf, ds, ts, n, avgdl


@pytest.fixture(scope="module")
def index(spark, docs, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("index") / "idx")
    build_index(
        spark, docs, root, n_buckets=4, docs_per_shard=128, n_segments=1,
        hot_df=None, block_size=32,
    )
    return LoadedIndex(spark, root)


def test_manifest_and_layout(index, exact):
    _, _, _, n, avgdl = exact
    assert index.manifest.n_docs == n
    assert index.manifest.avgdl == pytest.approx(avgdl)
    # every term maps to exactly one bucket; df consistent with term_stats
    td = {r["term"]: r for r in index.term_dict.collect()}
    for r in exact[2].collect():
        assert td[r["term"]]["df"] == r["df"]
        assert td[r["term"]]["cf"] == r["cf"]


def test_postings_roundtrip_totals(index, exact):
    tf = exact[0]
    want_postings = tf.count()
    got = 0
    for r in index.postings.collect():
        skips = [tuple(s) for s in r["skips"]]
        ids, tfs, dls = decode_postings(r["doc_ids_enc"], r["tfs_enc"], r["dls_enc"], skips)
        assert len(ids) == r["df"]
        assert int(tfs.sum()) == r["cf"]
        assert np.all(np.diff(ids) > 0)
        got += len(ids)
    assert got == want_postings


@pytest.mark.parametrize("query,k,mode", QUERIES)
@pytest.mark.parametrize("algo", ["wand", "exhaustive"])
def test_index_search_matches_exact(index, exact, query, k, mode, algo):
    tf, ds, ts, n, avgdl = exact
    want = exact_search(tf, ds, ts, n, avgdl, query, k=k, mode=mode, round_to=None).collect()
    got = index.search(query, k=k, mode=mode, algo=algo, round_to=None).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]
    np.testing.assert_allclose(
        [r["score"] for r in got], [r["score"] for r in want], rtol=1e-9
    )


@pytest.mark.parametrize("bulk", [True, False])
def test_segment_invariance(spark, docs, exact, index, tmp_path_factory, bulk):
    """Index built in 3 segments + merged == single-segment index, on BOTH
    merge paths: bulk (concatenation-by-relabel over disjoint doc ranges)
    and the general decode/merge/encode job."""
    root = str(tmp_path_factory.mktemp(f"index_seg_{bulk}") / "idx")
    build_index(
        spark, docs, root, n_buckets=4, docs_per_shard=128, n_segments=3,
        hot_df=None, block_size=32, bulk_merge=bulk,
    )
    seg_idx = LoadedIndex(spark, root)
    for query, k, mode in QUERIES[:5]:
        a = index.search(query, k=k, mode=mode, round_to=None).collect()
        b = seg_idx.search(query, k=k, mode=mode, round_to=None).collect()
        # rank-identical; scores to float-sum associativity (chunk boundaries
        # differ between layouts, so per-doc partial sums may differ by ULPs)
        assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b], query
        np.testing.assert_allclose(
            [r["score"] for r in a], [r["score"] for r in b], rtol=1e-12
        )


def test_salting_invariance(spark, docs, index, tmp_path_factory):
    """hot-term salting (S_term=4 for df>50 terms) must not change results."""
    root = str(tmp_path_factory.mktemp("index_salt") / "idx")
    build_index(
        spark, docs, root, n_buckets=4, docs_per_shard=128, n_segments=1,
        hot_df=50, n_salts=4, block_size=32,
    )
    salted = LoadedIndex(spark, root)
    for query, k, mode in QUERIES[:5]:
        a = index.search(query, k=k, mode=mode, round_to=None).collect()
        b = salted.search(query, k=k, mode=mode, round_to=None).collect()
        assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b], query
        np.testing.assert_allclose(
            [r["score"] for r in a], [r["score"] for r in b], rtol=1e-12
        )


def test_merge_dedup_latest_segment_wins(spark):
    """A doc re-indexed in a later segment replaces its older posting."""
    from engine.index import encode_segment
    from engine.merge import merge_postings

    rows = [  # (term, doc_id, tf, dl)
        ("a", 1, 2, 10),
        ("a", 2, 1, 10),
    ]
    old = spark.createDataFrame(rows, "term string, doc_id long, tf long, dl long")
    new = spark.createDataFrame(
        [("a", 1, 9, 12)], "term string, doc_id long, tf long, dl long"
    )
    seg0 = encode_segment(old, avgdl=10.0, n_buckets=2, docs_per_shard=100, seg_id=0)
    seg1 = encode_segment(new, avgdl=10.0, n_buckets=2, docs_per_shard=100, seg_id=1)
    merged = merge_postings(seg0.unionByName(seg1), avgdl=10.0).collect()
    assert len(merged) == 1
    r = merged[0]
    ids, tfs, dls = decode_postings(
        r["doc_ids_enc"], r["tfs_enc"], r["dls_enc"], [tuple(s) for s in r["skips"]]
    )
    assert list(ids) == [1, 2]
    assert list(tfs) == [9, 1]  # doc 1 took the seg_id=1 values
    assert list(dls) == [12, 10]


def test_partition_pruning_in_plan(index):
    """D3: the posting fetch must prune on the bucket partition column and
    push the numeric tid predicate to the parquet scan."""
    row = index.term_dict.filter(F.col("term") == "table").collect()[0]
    df = index.postings.filter(
        F.col("bucket").isin([int(row["bucket"])])
        & F.col("tid").isin([int(row["tid"])])
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan
    assert "PushedFilters" in plan and "tid" in plan


def test_search_many_matches_single(index):
    """Batched query execution == per-query execution, rank-identical."""
    batch = {f"q{i}": q for i, (q, _, _) in enumerate(QUERIES[:6])}
    got = index.search_many(batch, k=10, mode="or").collect()
    by_qid: dict[str, list] = {}
    for r in got:
        by_qid.setdefault(r["qid"], []).append((r["doc_id"], r["score"]))
    for i, (q, _, _) in enumerate(QUERIES[:6]):
        single = [(r["doc_id"], r["score"]) for r in index.search(q, k=10, mode="or").collect()]
        assert by_qid.get(f"q{i}", []) == single, q


def test_build_offset_doc_ids_multi_segment(spark, sf_dir, tmp_path):
    """Segment assignment must split the ACTUAL id range: offset/sparse
    doc_ids (streaming continuations, caller ids) previously mapped to
    segment numbers >= n_segments and were SILENTLY DROPPED from the index."""
    from engine.index import build_index
    from engine.io import read_fixture
    from engine.searcher import LoadedIndex

    docs = (
        read_fixture(spark, sf_dir, "documents")
        .select((F.col("doc_id") + 100000).alias("doc_id"), "text")
        .limit(200)
    )
    n = docs.count()
    root = str(tmp_path / "offidx")
    m = build_index(
        spark, docs, root, n_buckets=4, docs_per_shard=1 << 20, n_segments=3,
        hot_df=None, block_size=32,
    )
    assert m.n_docs == n
    idx = LoadedIndex(spark, root)
    hits = idx.search("table", k=10, mode="or").collect()
    assert hits, "offset-id index must be searchable"
    assert all(r["doc_id"] >= 100000 for r in hits)


def test_partial_encode_equivalence(spark, docs, exact):
    """Map-side partial posting encode (blobs through the salted exchange)
    must be byte-identical per (bucket, shard, seg_id, part, tid) to the
    raw-pair path — same df/cf/streams/skips/block_max."""
    from engine.corpus import corpus_base, exploded_tf
    from engine.index import detect_hot_terms, encode_segment

    _, _, ts, _, avgdl = exact
    base = corpus_base(docs)
    tf_dl = exploded_tf(base)
    hot = detect_hot_terms(ts, 50)
    kw = dict(
        avgdl=avgdl, n_buckets=4, docs_per_shard=128, seg_id=0, n_salts=4,
        hot_terms=hot, block_size=32, doc_bounds=(0, 10**6),
    )
    key = lambda r: (r["bucket"], r["shard"], r["seg_id"], r["part"], r["tid"])
    da = {key(r): r for r in encode_segment(tf_dl, partial_encode=False, **kw).collect()}
    db = {key(r): r for r in encode_segment(tf_dl, partial_encode=True, **kw).collect()}
    assert set(da) == set(db)
    for k, ra in da.items():
        rb = db[k]
        for c in ("df", "cf", "doc_ids_enc", "tfs_enc", "dls_enc", "block_max"):
            assert ra[c] == rb[c], (k, c)
        assert [tuple(s) for s in ra["skips"]] == [tuple(s) for s in rb["skips"]], k


def test_partial_encode_multi_flush_roundtrip(spark):
    """A tiny max_pairs forces several flushes per partition (many partial
    rows per (group, tid)); the reduce-side expand+merge must still rebuild
    exact postings."""
    import pandas as pd

    from engine.index import (
        PARTIAL_SCHEMA, POSTINGS_SCHEMA, _GROUP_COLS, _partial_encode_fn,
        _partial_merge_fn,
    )
    from engine.codec import decode_postings

    rng = np.random.default_rng(7)
    n = 5000
    pdf = pd.DataFrame(
        {
            "tid": rng.integers(0, 40, n),
            "doc_id": rng.permutation(n * 3)[:n],
            "tf": rng.integers(1, 9, n),
            "dl": rng.integers(10, 300, n),
        }
    ).drop_duplicates(["tid", "doc_id"])
    pdf["bucket"] = (pdf["tid"] % 4).astype("int32")
    pdf["shard"] = (pdf["doc_id"] // 4096).astype("int32")
    pdf["seg_id"] = np.int32(0)
    pdf["part"] = (pdf["doc_id"] % 2).astype("int32")
    pairs = spark.createDataFrame(pdf)
    out = (
        pairs.repartition(8)  # scatter rows of a group across partitions
        .mapInPandas(_partial_encode_fn(max_pairs=100), PARTIAL_SCHEMA)
        .repartition(4, "bucket", "shard", "seg_id", "part")
        .sortWithinPartitions(*_GROUP_COLS)
        .mapInPandas(_partial_merge_fn(avgdl=100.0, block_size=16), POSTINGS_SCHEMA)
    ).collect()
    got = {}
    for r in out:
        ids, tfs, dls = decode_postings(
            r["doc_ids_enc"], r["tfs_enc"], r["dls_enc"], r["skips"]
        )
        got[(r["bucket"], r["shard"], r["seg_id"], r["part"], r["tid"])] = (
            ids.tolist(), tfs.tolist(), dls.tolist(), r["df"], r["cf"]
        )
    exp = pdf.sort_values(["bucket", "shard", "seg_id", "part", "tid", "doc_id"])
    for gk, g in exp.groupby(["bucket", "shard", "seg_id", "part", "tid"]):
        key = tuple(int(x) for x in gk)
        ids, tfs, dls, df_, cf_ = got[key]
        assert ids == g["doc_id"].tolist(), key
        assert tfs == g["tf"].tolist() and dls == g["dl"].tolist(), key
        assert df_ == len(g) and cf_ == int(g["tf"].sum()), key
