"""Regression tests for the round-5 latent-bug fixes (VERDICT r04 "What's
wrong" + ADVICE r04): atomic index-cache publish, percentile_ranks alias
mangling, bucket_sort offset ordering, codec bit-length, update_by_query
snapshot GC, geohash lower clamp."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F


# --- atomic cache publish (registry._publish_dir) ---------------------------


def test_publish_dir_is_atomic(tmp_path):
    """The final directory only ever appears COMPLETE: the build writes into
    a tmp sibling, the rename is the publish. A builder that loses the race
    adopts the winner's output and leaves no tmp litter."""
    from engine.registry import _publish_dir

    root = str(tmp_path / "cache" / "sf-tag")
    os.makedirs(os.path.dirname(root), exist_ok=True)
    seen = {}

    def build(out):
        # while building, the final path must not exist yet
        seen["root_during_build"] = os.path.exists(root)
        os.makedirs(out)
        with open(os.path.join(out, "manifest.json"), "w") as f:
            f.write("{}")

    _publish_dir(root, build)
    assert seen["root_during_build"] is False
    assert os.path.exists(os.path.join(root, "manifest.json"))

    # second builder: root exists → build_fn must NOT run (no clobber of a
    # cache a live reader in another process may be scanning)
    def must_not_run(out):
        raise AssertionError("rebuild over a published cache")

    _publish_dir(root, must_not_run)
    # no tmp leftovers either way
    assert [d for d in os.listdir(tmp_path / "cache") if ".tmp-" in d] == []


def test_publish_dir_lost_race_adopts_winner(tmp_path, monkeypatch):
    """If another process publishes between our existence check and our
    rename, the rename failure is swallowed and the winner's dir is used."""
    from engine.registry import _publish_dir

    root = str(tmp_path / "idx")

    def build(out):
        os.makedirs(out)
        with open(os.path.join(out, "mine"), "w") as f:
            f.write("loser")
        # simulate the winner publishing first
        os.makedirs(root)
        with open(os.path.join(root, "winner"), "w") as f:
            f.write("won")

    _publish_dir(root, build)  # must not raise
    assert os.path.exists(os.path.join(root, "winner"))
    assert not os.path.exists(os.path.join(root, "mine"))
    assert [d for d in os.listdir(tmp_path) if ".tmp-" in d] == []


def test_publish_dir_build_failure_cleans_tmp(tmp_path):
    from engine.registry import _publish_dir

    root = str(tmp_path / "idx2")

    def build(out):
        os.makedirs(out)
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        _publish_dir(root, build)
    assert not os.path.exists(root)
    assert [d for d in os.listdir(tmp_path) if ".tmp-" in d] == []


# --- percentile_ranks alias (aggs.py) ---------------------------------------


def test_percentile_ranks_integer_aliases(spark):
    """Integer 100 must alias pr_100, not pr_1 (and must not collide with
    10) — the rstrip('0') mangle from ADVICE r04."""
    from engine.aggs import percentile_ranks_agg

    df = spark.createDataFrame(
        [("a", float(v)) for v in (5, 15, 150)], "g string, value double"
    )
    out = percentile_ranks_agg(df, "value", [10, 100, 99.5], group_by="g")
    assert out.columns == ["g", "pr_10", "pr_100", "pr_99_5"]
    row = out.collect()[0]
    assert row["pr_10"] == pytest.approx(100 / 3, abs=1e-3)
    assert row["pr_100"] == pytest.approx(200 / 3, abs=1e-3)


# --- bucket_sort offset page ordering (aggs.py) ------------------------------


def test_bucket_sort_offset_page_is_ordered(spark):
    from engine.aggs import bucket_sort_agg

    df = spark.createDataFrame(
        [(f"k{i:02d}", float(100 - i)) for i in range(20)],
        "g string, v double",
    )
    out = bucket_sort_agg(df, "g", "v", sort_desc=True, from_=5, size=5)
    rows = out.collect()
    # page 2 of the desc-by-sum ranking: k05..k09, IN THAT ORDER
    assert [r["g"] for r in rows] == [f"k{i:02d}" for i in range(5, 10)]
    vals = [r["sum_v"] for r in rows]
    assert vals == sorted(vals, reverse=True)


# --- codec exact bit length ---------------------------------------------------


def test_bit_length_exact_near_powers_of_two():
    from engine.codec import _bit_length

    vals = []
    for k in range(1, 63):
        vals += [(1 << k) - 1, 1 << k, (1 << k) + 1]
    vals += [0, 1, 2**63 - 1]
    v = np.array(vals, dtype=np.int64)
    assert (_bit_length(v) == np.array([int(x).bit_length() for x in vals])).all()


def test_quantize_norm_matches_byte_roundtrip_int32():
    """quantize_norm == byte4_to_int(int_to_byte4(v)) across the byte
    encoding's whole domain (int32, as in Lucene — larger shifts don't fit
    the 5-bit exponent field), including the 2^k±1 boundaries."""
    from engine.codec import byte4_to_int, int_to_byte4, quantize_norm

    vals = np.array(
        [(1 << k) + d for k in range(4, 31) for d in (-1, 0, 1)] + [0, 2**31 - 1],
        dtype=np.int64,
    )
    assert (quantize_norm(vals) == byte4_to_int(int_to_byte4(vals))).all()


def test_quantize_norm_keeps_top4_bits_high_range():
    """Above int32 the quantizer itself must still be exact top-4-bit
    truncation (the float-log2 path misrounded at 2^k − 1 for k ≳ 49)."""
    from engine.codec import quantize_norm

    vals = [(1 << k) + d for k in range(45, 62) for d in (-1, 0, 1)]
    v = np.array(vals, dtype=np.int64)
    got = quantize_norm(v)
    for x, g in zip(vals, got.tolist()):
        shift = max(x.bit_length() - 4, 0)
        assert g == (x >> shift) << shift, x


# --- update_by_query snapshot GC ---------------------------------------------


def test_update_by_query_gcs_old_snapshots(spark, tmp_path):
    from engine.index import build_index
    from engine.mutate import delete_by_query, update_by_query
    from engine.searcher import LoadedIndex

    root = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [(i, f"alpha beta doc{i} gamma") for i in range(40)],
        "doc_id long, text string",
    )
    build_index(spark, docs, root, n_buckets=2, docs_per_shard=16)
    snap_root = os.path.join(root, "_dead_snapshots")

    def n_snaps():
        return len(os.listdir(snap_root)) if os.path.isdir(snap_root) else 0

    for pass_no in range(3):
        # a delete each pass → the next update has prior tombstones to snapshot
        delete_by_query(LoadedIndex(spark, root), f"doc{pass_no}")
        token = f"upd{pass_no}"
        update_by_query(
            spark, root, docs, F.col("text").contains("beta"),
            lambda m, t=token: m.withColumn(
                "text", F.concat(F.col("text"), F.lit(" " + t))
            ),
            key_col="doc_id",
        )
        docs = docs  # original corpus frame reused; identity is by doc_id
        assert n_snaps() <= 1, "snapshots from previous passes must be GC'd"


# --- geohash lower clamp -------------------------------------------------------


def test_geohash_clamps_out_of_range_low(spark):
    import duckdb

    from engine.geo import geohash_expr, geohash_sql

    pts = [(-95.0, -200.0), (-90.0, -180.0), (95.0, 200.0), (90.0, 180.0),
           (12.3, 45.6)]
    df = spark.createDataFrame(pts, "lat double, lon double")
    got = [
        r["h"]
        for r in df.select(
            geohash_expr(F.col("lat"), F.col("lon"), 4).alias("h")
        ).collect()
    ]
    # out-of-range-low clamps to the edge cell instead of corrupt bits
    assert got[0] == got[1]
    assert got[2] == got[3]
    assert all(len(h) == 4 and h.strip() for h in got)
    # SQL twin stays identical on the same inputs
    vals = ", ".join(f"({lat}, {lon})" for lat, lon in pts)
    sql = (
        f"SELECT {geohash_sql('lat', 'lon', 4)} FROM (VALUES {vals}) t(lat, lon)"
    )
    assert [r[0] for r in duckdb.connect().execute(sql).fetchall()] == got
