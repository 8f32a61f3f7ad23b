"""Tests for batch 4: filtered kNN, terms lookup, runtime fields, collapse
inner_hits, significant_text."""

from pyspark.sql import functions as F

from engine.io import read_fixture
from engine.registry import queries


def test_filtered_knn_is_prefilter_not_postfilter(spark, sf_dir):
    """ES knn.filter semantics: k nearest AMONG filter-passing vectors.
    Post-filtering a global top-10 would return fewer rows whenever some of
    the global top-10 fail the filter — assert the pre-filter set differs
    and is always full-size."""
    from engine.ann import brute_force_topk

    emb = read_fixture(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    qv = [float(x) for x in q]
    casted = emb.withColumn("embedding", F.col("embedding").cast("array<double>"))

    pre = brute_force_topk(casted.filter(F.col("label") % 3 == 0), qv, k=10).collect()
    assert len(pre) == 10
    pre_ids = {r.vec_id for r in pre}
    # EVERY pre-filter hit passes the filter
    pre_labels = {
        r.vec_id: r.label
        for r in emb.filter(F.col("vec_id").isin([*pre_ids])).collect()
    }
    assert all(lbl % 3 == 0 for lbl in pre_labels.values())
    post_ids = {
        r.vec_id for r in brute_force_topk(casted, qv, k=10).collect()
    }
    post_labels = {
        r.vec_id: r.label
        for r in emb.filter(F.col("vec_id").isin([*post_ids])).collect()
    }
    # whenever the global top-10 contains filter-failing vectors, the
    # pre-filter result must differ (post-filtering would return < k)
    if any(lbl % 3 != 0 for lbl in post_labels.values()):
        assert pre_ids != post_ids


def test_terms_lookup_matches_self(spark, sf_dir):
    rows = queries()["search_terms_lookup"](spark, sf_dir).collect()
    docs = read_fixture(spark, sf_dir, "documents")
    src = docs.filter(F.col("doc_id") == 42).collect()[0]["source"]
    assert all(r.source == src for r in rows)
    assert 42 in {r.doc_id for r in rows} or len(rows) == 20  # 42 beyond page only if >20 earlier ids


def test_terms_lookup_plan_broadcasts_lookup_side(spark, sf_dir):
    df = queries()["search_terms_lookup"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_runtime_field_pushes_stored_column_filter(spark, sf_dir):
    df = queries()["search_runtime_field"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the lang filter on the STORED column still reaches the scan even though
    # the sort key is a runtime expression
    assert "PushedFilters" in plan and "lang" in plan


def test_collapse_inner_hits_shape(spark, sf_dir):
    rows = queries()["search_collapse_inner_hits"](spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, hits in by_src.items():
        assert [h.rn for h in hits] == list(range(1, len(hits) + 1))
        assert len(hits) <= 2
        # inner hits ordered by score desc within the group
        scores = [h.score for h in hits]
        assert scores == sorted(scores, reverse=True)
        assert hits[0].score == hits[0].group_best


def test_significant_text_foreground_is_query_match_set(spark, sf_dir):
    """Every returned term must actually co-occur with 'merge' in ≥1 doc,
    and 'merge' itself should score at/near the top (perfect foreground
    correlation)."""
    rows = queries()["agg_significant_text"](spark, sf_dir).collect()
    assert len(rows) == 10
    terms = [r.term for r in rows]
    assert "merge" in terms
    jlh = {r.term: r.jlh for r in rows}
    assert jlh["merge"] == max(jlh.values())


# --- geo_bounds / geo_centroid (round 3) -------------------------------------


def test_geo_bounds_box_encloses_every_point(spark, sf_dir):
    from engine.geo import geo_bounds_agg, with_synthetic_coords
    from engine.io import read_fixture

    ev = read_fixture(spark, sf_dir, "events")
    boxes = {r.event_type: r for r in geo_bounds_agg(ev).collect()}
    pts = with_synthetic_coords(ev).select("event_type", "lat", "lon").collect()
    assert pts
    for p in pts:
        b = boxes[p.event_type]
        assert b.bottom_lat <= p.lat <= b.top_lat
        assert b.left_lon <= p.lon <= b.right_lon


def test_geo_centroid_matches_mean(spark, sf_dir):
    from engine.geo import geo_centroid_agg, with_synthetic_coords
    from engine.io import read_fixture

    ev = read_fixture(spark, sf_dir, "events")
    got = {r.event_type: r for r in geo_centroid_agg(ev).collect()}
    pdf = with_synthetic_coords(ev).select("event_type", "lat", "lon").toPandas()
    g = pdf.groupby("event_type")
    import pytest as _pt

    for et, grp in g:
        assert got[et].centroid_lat == _pt.approx(grp.lat.mean(), abs=2e-4)
        assert got[et].centroid_lon == _pt.approx(grp.lon.mean(), abs=2e-4)
        assert got[et].doc_count == len(grp)
