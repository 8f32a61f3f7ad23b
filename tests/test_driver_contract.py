"""Emulates the driver verify: every queries() entry vs its DuckDB oracle_sql
twin at sf0.01 — row count, column names, order-insensitive values
(__spark_entry__.py contract)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as se  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(val):
    if val is None:
        return None
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return round(val, 6)
    if isinstance(val, (list, tuple)):
        return tuple(_canon(v) for v in val)
    return val


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_canon(r[i]) for i in order) for r in rows
    )


def test_entry_smoke(spark):
    df = se.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score"]
    assert len(rows) > 0


@pytest.mark.parametrize("name", sorted(se.oracle_sql().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = se.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(se.oracle_sql()[name])
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: schema mismatch"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count mismatch"
    a = _rowset(spark_cols, spark_rows)
    b = _rowset(duck_cols, duck_rows)
    assert a == b, f"{name}: value mismatch\nspark[:3]={a[:3]}\nduck[:3]={b[:3]}"


def test_every_query_has_callable():
    qs = se.queries()
    for name in se.oracle_sql():
        assert name in qs


@pytest.mark.parametrize(
    "name", sorted(set(se.queries()) - set(se.oracle_sql()))
)
def test_rows_only_queries_run(spark, name):
    """Non-SQL-expressible ops (driver records a weaker rows-only check):
    must run and return a stable schema; rows asserted in dedicated tests."""
    df = se.queries()[name](spark, SF_DIR)
    rows = df.collect()
    assert df.columns
    assert isinstance(rows, list)
