"""ES|QL subset compiler (engine.esql): grammar, expression semantics, and
pipe composition against hand-built frames. The three driver queries
(esql_stats / esql_lookup_join / esql_eval) get their value checks from the
DuckDB twins; these tests pin the parser itself."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from engine.esql import _lex, _split_pipes, esql


def _resolve_for(spark):
    ev = spark.createDataFrame(
        [
            (0, "click", 10.0, 1, dt.datetime(2024, 1, 1, 5)),
            (1, "view", 3.5, 1, dt.datetime(2024, 1, 1, 9)),
            (2, "click", 20.0, 2, dt.datetime(2024, 1, 2, 5)),
            (3, "purchase", 100.0, 2, dt.datetime(2024, 1, 2, 7)),
            (4, "click", None, 3, dt.datetime(2024, 1, 3, 1)),
        ],
        "event_id long, event_type string, value double, user_id long, ts timestamp",
    )
    dim = spark.createDataFrame(
        [("click", "cheap"), ("purchase", "dear")], "event_type string, tier string"
    )
    return {"events": ev, "tiers": dim}.__getitem__


def test_split_pipes_respects_strings():
    assert _split_pipes('FROM t | WHERE a == "x|y" | LIMIT 3') == [
        "FROM t", 'WHERE a == "x|y"', "LIMIT 3"
    ]


def test_lex_keywords_and_ops():
    kinds = [k for k, _ in _lex('from t where a >= 1.5 and b != "zz"')]
    assert kinds == ["kw", "ident", "kw", "ident", "op", "number", "kw",
                     "ident", "op", "string"]


def test_where_eval_keep_sort(spark):
    out = esql(
        'FROM events | WHERE value >= 10 AND event_type != "view" '
        "| EVAL v2 = ROUND(value * 2, 1), flag = value > 15 "
        "| KEEP event_id, v2, flag | SORT v2 DESC, event_id ASC | LIMIT 2",
        _resolve_for(spark),
    ).collect()
    assert [(r["event_id"], r["v2"], r["flag"]) for r in out] == [
        (3, 200.0, True), (2, 40.0, True)
    ]


def test_stats_by_and_count_star_vs_col(spark):
    out = esql(
        "FROM events | STATS n = COUNT(*), nv = COUNT(value), "
        "total = SUM(value), users = COUNT_DISTINCT(user_id) BY event_type "
        "| SORT event_type",
        _resolve_for(spark),
    ).collect()
    got = {r["event_type"]: (r["n"], r["nv"], r["total"], r["users"]) for r in out}
    # COUNT(*) counts rows, COUNT(col) skips the NULL value in event 4
    assert got["click"] == (3, 2, 30.0, 3)
    assert got["purchase"] == (1, 1, 100.0, 1)
    assert got["view"] == (1, 1, 3.5, 1)


def test_stats_global_no_by(spark):
    out = esql("FROM events | STATS n = COUNT(*)", _resolve_for(spark)).collect()
    assert out[0]["n"] == 5


def test_lookup_join_is_left_and_broadcast(spark):
    df = esql(
        "FROM events | LOOKUP JOIN tiers ON event_type "
        "| STATS n = COUNT(*) BY tier | SORT n DESC, tier ASC",
        _resolve_for(spark),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    rows = {r["tier"]: r["n"] for r in df.collect()}
    assert rows == {"cheap": 3, None: 1, "dear": 1}  # left join keeps 'view'


def test_like_in_is_null_rename_drop(spark):
    out = esql(
        'FROM events | WHERE event_type LIKE "c*" OR event_type IN ("purchase") '
        "| RENAME event_type AS kind | DROP ts "
        "| WHERE value IS NOT NULL | SORT event_id | KEEP event_id, kind",
        _resolve_for(spark),
    ).collect()
    assert [(r["event_id"], r["kind"]) for r in out] == [
        (0, "click"), (2, "click"), (3, "purchase")
    ]


def test_date_trunc_and_functions(spark):
    out = esql(
        'FROM events | EVAL day = DATE_TRUNC("day", ts), '
        'up = TO_UPPER(SUBSTRING(event_type, 1, 2)) '
        "| STATS n = COUNT(*) BY day | SORT day",
        _resolve_for(spark),
    ).collect()
    assert [r["n"] for r in out] == [2, 2, 1]


def test_dissect_and_grok(spark):
    out = esql(
        'FROM events | EVAL tag = CONCAT(event_type, "-", TO_STRING(user_id)) '
        '| DISSECT tag "%{kind}-%{uid}" '
        '| GROK tag "%{WORD:w}-%{INT:n}" '
        "| WHERE event_id == 3 | KEEP kind, uid, w, n",
        _resolve_for(spark),
    ).collect()
    assert [tuple(r) for r in out] == [("purchase", "2", "purchase", "2")]


def test_dissect_last_field_is_greedy(spark):
    out = esql(
        'FROM events | EVAL tag = CONCAT(event_type, "-", "a-b") '
        '| DISSECT tag "%{head}-%{rest}" | WHERE event_id == 0 | KEEP head, rest',
        _resolve_for(spark),
    ).collect()
    # first separator binds the non-greedy head; the LAST ref takes the rest
    assert [tuple(r) for r in out] == [("click", "a-b")]


def test_case_function_and_mv_expand(spark):
    out = esql(
        'FROM events | EVAL band = CASE(value >= 100, "big", value >= 10, "mid", "small") '
        "| STATS n = COUNT(*) BY band | SORT band",
        _resolve_for(spark),
    ).collect()
    # NULL value falls to the default branch ("small"), like SQL CASE ELSE
    assert {r["band"]: r["n"] for r in out} == {"big": 1, "mid": 2, "small": 2}

    vecs = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0])], "vid long, xs array<double>"
    )
    out = esql(
        "FROM vecs | MV_EXPAND xs | STATS n = COUNT(*), total = SUM(xs)",
        {"vecs": vecs}.__getitem__,
    ).collect()
    assert (out[0]["n"], out[0]["total"]) == (3, 6.0)


def test_errors_are_loud(spark):
    r = _resolve_for(spark)
    with pytest.raises(ValueError, match="must start with FROM"):
        esql("WHERE x == 1", r)
    with pytest.raises(ValueError, match="unknown function"):
        esql("FROM events | EVAL x = NO_SUCH_FN(value)", r)
    with pytest.raises(ValueError, match="unsupported command|unknown command"):
        esql("FROM events | INLINESTATS n = COUNT(*)", r)
    with pytest.raises(ValueError, match="ENRICH needs ON"):
        esql("FROM events | ENRICH policy", r)
    with pytest.raises(ValueError, match="unknown grok pattern"):
        esql('FROM events | GROK event_type "%{EMAILADDRESS:e}"', r)
    with pytest.raises(ValueError, match="unknown function"):
        esql("FROM events | STATS x = MODE(value)", r)


def test_string_math_and_mv_functions(spark):
    r = _resolve_for(spark)
    df = spark.createDataFrame(
        [(1, "a.b.c", [2.0, 4.0]), (2, "x.y", [6.0])],
        "rid long, dotted string, xs array<double>",
    )
    out = esql(
        'FROM t | EVAL parts = SPLIT(dotted, "."), np = MV_COUNT(parts), '
        "lo = MV_MIN(xs), avg_x = MV_AVG(xs), tot = MV_SUM(xs), "
        'l2 = LEFT(dotted, 1), r2 = RIGHT(dotted, 1), '
        "lg = ROUND(LOG(2, TO_DOUBLE(np * 2)), 4) "
        "| SORT rid | KEEP rid, np, lo, avg_x, tot, l2, r2, lg",
        {"t": df}.__getitem__,
    ).collect()
    # SPLIT's delimiter is literal — '.' must NOT behave as regex-any
    assert (out[0]["np"], out[1]["np"]) == (3, 2)
    assert (out[0]["lo"], out[0]["avg_x"], out[0]["tot"]) == (2.0, 3.0, 6.0)
    assert (out[0]["l2"], out[0]["r2"]) == ("a", "c")
    assert out[0]["lg"] == 2.5850  # log2(6)
    assert out[1]["lg"] == 2.0  # log2(4)


def test_trim_and_date_format(spark):
    import datetime as dt

    df = spark.createDataFrame(
        [("  pad  ", dt.datetime(2024, 3, 7, 15, 0))], "s string, ts timestamp"
    )
    out = esql(
        'FROM t | EVAL t1 = TRIM(s), t2 = LTRIM(s), t3 = RTRIM(s), '
        'd = DATE_FORMAT("yyyy-MM-dd", DATE_TRUNC("week", ts))',
        {"t": df}.__getitem__,
    ).collect()[0]
    assert (out["t1"], out["t2"], out["t3"]) == ("pad", "pad  ", "  pad")
    assert out["d"] == "2024-03-04"  # Monday of that week


def test_sort_nulls_first_last(spark):
    r = _resolve_for(spark)
    first = esql(
        "FROM events | SORT value ASC NULLS FIRST | KEEP event_id | LIMIT 1", r
    ).collect()
    assert first[0]["event_id"] == 4  # the NULL-value event leads
    last = esql(
        "FROM events | SORT value DESC NULLS LAST | KEEP event_id, value", r
    ).collect()
    assert last[-1]["value"] is None and last[0]["value"] == 100.0
    with pytest.raises(ValueError, match="FIRST/LAST after NULLS"):
        esql("FROM events | SORT value NULLS SOMETIMES", r)


def test_stats_std_dev_percentile_values(spark):
    r = _resolve_for(spark)
    out = esql(
        "FROM events | STATS sd = ROUND(STD_DEV(value), 4), "
        "p50 = PERCENTILE(value, 50), kinds = VALUES(event_type)",
        r,
    ).collect()[0]
    # population stddev over [10, 3.5, 20, 100] (NULL skipped)
    import statistics
    want = round(statistics.pstdev([10.0, 3.5, 20.0, 100.0]), 4)
    assert out["sd"] == want
    assert out["p50"] == 15.0  # exact interpolated median of the 4 values
    assert out["kinds"] == ["click", "purchase", "view"]  # pinned sorted


def test_stats_top_aggregate(spark):
    r = _resolve_for(spark)
    out = esql(
        'FROM events | STATS hi = TOP(value, 2, "desc"), lo = TOP(value, 2, "asc")',
        r,
    ).collect()[0]
    assert out["hi"] == [100.0, 20.0]
    assert out["lo"] == [3.5, 10.0]
    with pytest.raises(ValueError, match="asc/desc"):
        esql('FROM events | STATS x = TOP(value, 2, "sideways")', r)
