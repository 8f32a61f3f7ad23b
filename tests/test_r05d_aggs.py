"""Round-5d aggregation tail: change_point (CUSUM), bucket_correlation,
terms ordered by sub-agg metric, reverse_nested."""

import datetime as dt

from pyspark.sql import functions as F


def _shift_events(spark, low=5, high=20, days=10, split=5):
    """Daily events with a mean shift: `low` rows/day before `split`,
    `high` rows/day from `split` on."""
    base = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for d in range(days):
        n = low if d < split else high
        for _ in range(n):
            rows.append((eid, base + dt.timedelta(days=d, minutes=eid % 60)))
            eid += 1
    return spark.createDataFrame(rows, "event_id long, ts timestamp")


def test_change_point_finds_mean_shift(spark):
    from engine.aggs import change_point_agg

    out = change_point_agg(_shift_events(spark), "ts", unit="day").collect()
    assert len(out) == 1
    r = out[0]
    # CUSUM |S_t| peaks at the LAST low-regime bucket (day index 4):
    # mean=12.5, S_4 = 5*(5-12.5) = -37.5.
    assert r["change_point"] == dt.datetime(2024, 3, 5)
    assert r["cusum"] == -37.5
    assert r["mean_before"] == 5.0
    assert r["mean_after"] == 20.0
    assert r["direction"] == "increase"


def test_change_point_decrease_and_tiebreak(spark):
    from engine.aggs import change_point_agg

    out = change_point_agg(
        _shift_events(spark, low=20, high=5), "ts", unit="day"
    ).collect()[0]
    assert out["direction"] == "decrease"
    assert out["change_point"] == dt.datetime(2024, 3, 5)


def test_change_point_excludes_last_bucket(spark):
    """The final bucket has no right side and can never be the split."""
    from engine.aggs import change_point_agg

    df = _shift_events(spark, low=5, high=50, days=2, split=1)
    r = change_point_agg(df, "ts", unit="day").collect()[0]
    assert r["change_point"] == dt.datetime(2024, 3, 1)
    assert r["mean_after"] == 50.0


def test_bucket_correlation_perfect_ramp(spark):
    from engine.aggs import bucket_correlation_agg

    rows = []
    eid = 0
    for i, n in enumerate([1, 2, 3, 4]):
        for _ in range(n):
            rows.append((eid, float(i * 10) + 1.0))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, value double")
    r = bucket_correlation_agg(df, "value", interval=10.0).collect()[0]
    assert r["correlation"] == 1.0
    assert r["n_buckets"] == 4


def test_bucket_correlation_anti_ramp(spark):
    from engine.aggs import bucket_correlation_agg

    rows = []
    eid = 0
    for i, n in enumerate([4, 3, 2, 1]):
        for _ in range(n):
            rows.append((eid, float(i * 10) + 1.0))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, value double")
    assert bucket_correlation_agg(df, "value", 10.0).collect()[0][
        "correlation"
    ] == -1.0


def test_terms_ordered_by_metric(spark):
    from engine.aggs import terms_ordered_by_metric_agg

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 10.0), ("c", 5.0), ("c", 5.0)],
        "k string, m double",
    )
    out = terms_ordered_by_metric_agg(df, "k", "m", size=2).collect()
    assert [(r["k"], r["avg_metric"], r["doc_count"]) for r in out] == [
        ("b", 10.0, 1),
        ("c", 5.0, 2),
    ]


def test_reverse_nested_counts_parents_once(spark):
    from engine.aggs import reverse_nested_agg

    items = spark.createDataFrame(
        [
            (1, "AIR", 40.0),
            (1, "AIR", 35.0),  # same parent, same bucket -> 1 parent, 2 docs
            (2, "AIR", 31.0),
            (2, "SHIP", 50.0),
            (3, "SHIP", 10.0),  # filtered out by the predicate
        ],
        "l_orderkey long, l_shipmode string, l_quantity double",
    )
    out = reverse_nested_agg(
        items, "l_orderkey", "l_shipmode", F.col("l_quantity") >= 30
    ).collect()
    got = {r["l_shipmode"]: (r["doc_count"], r["parent_count"]) for r in out}
    assert got == {"AIR": (3, 2), "SHIP": (1, 1)}


def test_esql_change_point_marks_cusum_argmax(spark):
    from engine.esql import esql

    df = _shift_events(spark)
    out = esql(
        'FROM ev | EVAL day = DATE_TRUNC("day", ts) '
        "| STATS x = COUNT(*) BY day | CHANGE_POINT x ON day",
        lambda name: {"ev": df}[name],
    ).collect()
    marked = [r for r in out if r["type"] is not None]
    assert len(marked) == 1
    assert marked[0]["day"] == dt.datetime(2024, 3, 5)
    assert marked[0]["type"] == "step_change"
    assert marked[0]["cusum"] == -37.5
    assert all(r["cusum"] is None for r in out if r["type"] is None)


def test_esql_change_point_agrees_with_agg(spark):
    """The ES|QL command and the pipeline agg pin the same estimator."""
    from engine.aggs import change_point_agg
    from engine.esql import esql

    df = _shift_events(spark, low=7, high=3, days=12, split=8)
    via_agg = change_point_agg(df, "ts", unit="day").collect()[0]
    via_esql = esql(
        'FROM ev | EVAL day = DATE_TRUNC("day", ts) '
        "| STATS x = COUNT(*) BY day | CHANGE_POINT x ON day "
        "| WHERE type IS NOT NULL",
        lambda name: {"ev": df}[name],
    ).collect()
    assert len(via_esql) == 1
    assert via_esql[0]["day"] == via_agg["change_point"]
    assert via_esql[0]["cusum"] == via_agg["cusum"]


def test_terms_sum_other_exact_remainder(spark):
    from engine.aggs import terms_sum_other_agg

    df = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2 + [("d",)] * 1, "k string"
    )
    out = terms_sum_other_agg(df, "k", size=2).collect()
    got = {r["k"]: r["doc_count"] for r in out}
    assert got == {"a": 5, "b": 3, "__other__": 3}  # c(2)+d(1)
    # no remainder -> explicit zero row, as ES reports sum_other_doc_count=0
    out2 = terms_sum_other_agg(df, "k", size=10).collect()
    assert {r["k"]: r["doc_count"] for r in out2}["__other__"] == 0


def test_maxsim_matches_numpy_reference(spark):
    import numpy as np

    from engine.ann import maxsim_topk

    rng = np.random.RandomState(7)
    vecs = rng.randn(24, 4).round(3)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(24)],
        "vec_id long, embedding array<float>",
    )
    qs = [[1.0, 0.0, -1.0, 0.5], [0.2, 0.3, 0.0, -0.4]]
    out = maxsim_topk(emb, qs, group_size=4, k=3).collect()
    # numpy reference: docs of 4 consecutive vectors, sum of per-query maxes
    docs = vecs.astype(np.float32).astype(np.float64).reshape(6, 4, 4)
    scores = sorted(
        ((d, round(sum((docs[d] @ np.array(q)).max() for q in qs), 4))
         for d in range(6)),
        key=lambda t: (-t[1], t[0]),
    )[:3]
    assert [(r["doc_id"], r["maxsim"]) for r in out] == scores


def test_maxsim_is_single_scan_take_ordered(spark):
    import __spark_entry__ as se

    df = se.queries()["ann_maxsim_topk"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 1
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
