"""Round-5b operator tail: binary-quantized ANN rescore, geo_distance rings
aggregation, serial_diff pipeline aggregation."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _emb_df(spark, n=60, dim=64, seed=3):
    rng = np.random.RandomState(seed)
    rows = [(i, [float(x) for x in rng.randn(dim)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_hamming_rescore_matches_two_stage_reference(spark):
    """Engine result == numpy replay of the same two-stage pipeline
    (sign-bit hamming coarse top-C, exact cosine rescore top-k)."""
    from engine.ann import hamming_rescore_topk

    df = _emb_df(spark)
    vecs = {r["vec_id"]: np.array(r["embedding"]) for r in df.collect()}
    q = list(vecs[0])
    got = hamming_rescore_topk(df, q, k=5, n_candidates=12).collect()

    qbits = np.array(q) > 0
    ham = {i: int(np.sum((v > 0) != qbits)) for i, v in vecs.items()}
    cand = sorted(ham, key=lambda i: (ham[i], i))[:12]
    qa = np.array(q)

    def cos(i):
        v = vecs[i]
        return round(float(v @ qa / (np.linalg.norm(v) * np.linalg.norm(qa))), 4)

    want = sorted(cand, key=lambda i: (-cos(i), i))[:5]
    assert [r["vec_id"] for r in got] == want
    for r in got:
        assert r["cosine"] == pytest.approx(cos(r["vec_id"]), abs=1e-4)


def test_hamming_coarse_is_sign_invariant(spark):
    """Scaling any vector by a positive constant never changes its packed
    bits, so the candidate set is magnitude-blind (the quantizer's defining
    property)."""
    from engine.ann import hamming_rescore_topk

    df = _emb_df(spark, n=30)
    q = [float(x) for x in np.random.RandomState(9).randn(64)]
    base = [r["vec_id"] for r in hamming_rescore_topk(df, q, k=30, n_candidates=30).collect()]
    scaled = df.withColumn(
        "embedding", F.transform("embedding", lambda x: x * F.lit(7.0))
    )
    got = [r["vec_id"] for r in hamming_rescore_topk(scaled, q, k=30, n_candidates=30).collect()]
    # same candidate membership; cosine is scale-invariant too, so same order
    assert got == base


def test_geo_distance_rings_partition_and_count(spark):
    from engine.geo import geo_distance_rings_agg

    ev = spark.createDataFrame(
        [(i, i % 7, float(i)) for i in range(500)],
        "event_id long, user_id long, value double",
    )
    out = geo_distance_rings_agg(ev, 40.5, -74.5, [2000.0, 5000.0, 10000.0]).collect()
    labels = [r["ring"] for r in out]
    assert set(labels) <= {"*-2000.0", "2000.0-5000.0", "5000.0-10000.0", "10000.0-*"}
    assert labels == sorted(labels)
    # every event lands in exactly one ring
    assert sum(r["doc_count"] for r in out) == 500


def test_serial_diff_lag_semantics(spark):
    from engine.aggs import serial_diff_agg

    import datetime as dt

    rows = []
    eid = 0
    for day in range(10):
        for _ in range(day + 1):  # doc_count on day d is d+1
            rows.append((eid, dt.datetime(2024, 1, 1 + day, 12, 0, 0)))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = serial_diff_agg(ev, "ts", unit="day", lag=7).collect()
    assert [r["doc_count"] for r in out] == list(range(1, 11))
    # first `lag` buckets have no predecessor
    assert [r["serial_diff"] for r in out[:7]] == [None] * 7
    # thereafter: count(d) - count(d-7)
    assert [r["serial_diff"] for r in out[7:]] == [7, 7, 7]
