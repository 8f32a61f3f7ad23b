"""Round-5c operator tail: EQL result pipes, cross_fields multi_match,
cosine reranker retriever, geo_line aggregation."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F


def _results_df(spark):
    """A small 'sequence result' frame: (user_id, event_id, ts, gap)."""
    base = dt.datetime(2024, 1, 1)
    rows = [
        (u, eid, base + dt.timedelta(minutes=eid), float(eid % 7))
        for eid, u in enumerate([1, 2, 1, 3, 2, 1, 3, 2, 1, 3])
    ]
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, gap double"
    )


def test_eql_pipe_head_tail_are_ts_ordered(spark):
    from engine.eql import eql_pipes

    df = _results_df(spark)
    head = eql_pipes(df, [("head", 3)]).collect()
    assert [r["event_id"] for r in head] == [0, 1, 2]
    tail = eql_pipes(df, [("tail", 3)]).collect()
    assert sorted(r["event_id"] for r in tail) == [7, 8, 9]


def test_eql_pipe_unique_keeps_earliest_per_key(spark):
    from engine.eql import eql_pipes

    out = eql_pipes(_results_df(spark), [("unique", "user_id")]).collect()
    got = {r["user_id"]: r["event_id"] for r in out}
    assert got == {1: 0, 2: 1, 3: 3}


def test_eql_pipe_count_and_chaining(spark):
    from engine.eql import eql_pipes

    df = _results_df(spark)
    n = eql_pipes(df, [("unique", "user_id"), ("count", None)]).collect()
    assert n[0]["count"] == 3
    with pytest.raises(ValueError, match="unknown EQL pipe"):
        eql_pipes(df, [("explode", 1)])


def test_cross_fields_is_term_centric(spark):
    """The driver query returns a full ranked page whose scores include
    docs matched through the secondary field (term-centric semantics are
    value-checked against the DuckDB twin by the driver; here we pin shape
    and ordering)."""
    import __spark_entry__ as se

    out = se.queries()["bm25_cross_fields"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert 0 < len(rows) <= 10
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_rerank_cosine_shape_and_bounds(spark):
    """Reranker output: ≤k rows, cosine in [0, 1], ordered by rerank score,
    and every reranked doc came from the BM25 candidate set."""
    from engine.corpus import corpus_base, exploded_tf
    from engine.corpus import corpus_stats, term_stats
    from engine.io import read_fixture
    from engine.search import exact_search, rerank_cosine

    docs = read_fixture(spark, "/root/testdata/sf0.001", "documents")
    base = corpus_base(docs)
    tf = exploded_tf(base).select("term", "doc_id", "tf", "dl")
    ds = base.select("doc_id", "dl")
    ts = term_stats(tf)
    n, avgdl = corpus_stats(ds)

    out = rerank_cosine(tf, ds, ts, n, avgdl, "table scan", first_k=20, k=5)
    rows = out.collect()
    assert 0 < len(rows) <= 5
    rr = [r["score"] for r in rows]
    assert rr == sorted(rr, reverse=True)
    assert all(0.0 <= s <= 1.0 + 1e-9 for s in rr)
    cand = {
        r["doc_id"]
        for r in exact_search(tf, ds, ts, n, avgdl, "table scan", k=20).collect()
    }
    assert {r["doc_id"] for r in rows} <= cand


def test_rerank_cosine_matches_hand_formula(spark):
    """One candidate checked by hand: cos = sum tf_t / (||d|| * sqrt(|q|))."""
    from engine.corpus import corpus_base, exploded_tf
    from engine.corpus import corpus_stats, term_stats
    from engine.io import read_fixture
    from engine.search import rerank_cosine

    docs = read_fixture(spark, "/root/testdata/sf0.001", "documents")
    base = corpus_base(docs)
    tf = exploded_tf(base).select("term", "doc_id", "tf", "dl")
    ds = base.select("doc_id", "dl")
    ts = term_stats(tf)
    n, avgdl = corpus_stats(ds)

    rows = rerank_cosine(tf, ds, ts, n, avgdl, "table scan", first_k=20, k=5).collect()
    top = rows[0]
    tfs = {
        r["term"]: r["tf"]
        for r in tf.filter(F.col("doc_id") == top["doc_id"]).collect()
    }
    dot = tfs.get("table", 0) + tfs.get("scan", 0)
    dnorm = math.sqrt(sum(v * v for v in tfs.values()))
    assert top["score"] == pytest.approx(dot / (dnorm * math.sqrt(2)), abs=1e-4)


def test_geo_line_truncation_and_order(spark):
    from engine.geo import geo_line_agg

    base = dt.datetime(2024, 3, 1)
    rows = [
        (7, i, base + dt.timedelta(hours=i), "click", 1.0, "{}")
        for i in range(13)
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string, "
        "value double, props string"
    )
    out = geo_line_agg(ev, group_by="user_id", size=10).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_points"] == 13 and r["complete"] is False
    pts = r["line"].split(", ")
    assert len(pts) == 10  # truncated to size
    # first point = earliest ts → event_id 0 → lon = 0 % 359 - 179 + .5 =
    # -178.5; lat = 7 % 179 - 89 + .5 = -81.5
    assert pts[0] == "-178.5 -81.5"
    # order follows event_id (ts strictly increasing with it)
    lons = [float(p.split(" ")[0]) for p in pts]
    assert lons == sorted(lons)


def test_geo_line_complete_flag_true_when_under_size(spark):
    from engine.geo import geo_line_agg

    base = dt.datetime(2024, 3, 1)
    rows = [
        (1, i, base + dt.timedelta(minutes=i), "view", 0.0, "{}") for i in range(4)
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, event_type string, "
        "value double, props string"
    )
    r = geo_line_agg(ev, group_by="user_id", size=10).collect()[0]
    assert r["complete"] is True and r["n_points"] == 4
    assert len(r["line"].split(", ")) == 4
