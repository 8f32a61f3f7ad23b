"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``engine/`` (SURVEY.md §7); this module only
adapts it to the driver contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402

from engine import registry  # noqa: E402
from engine.packaging import ensure_workers_can_import  # noqa: E402


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    """Ship the engine package to this session's Python workers first —
    the driver's SparkSession may come from any cwd (see engine/packaging)."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_workers_can_import(spark)
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Exact BM25 top-10 for the AND-conjunction query `sort merge join`
    over the `documents` corpus (SURVEY.md §7 M1 flagship)."""
    ensure_workers_can_import(spark)
    return registry.flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(fn) for name, fn in registry.queries().items()}


def oracle_sql() -> dict[str, str]:
    """ANSI-SQL DuckDB twins for every SQL-expressible query."""
    return registry.oracle_sql()
