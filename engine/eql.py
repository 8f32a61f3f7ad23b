"""ES EQL (Event Query Language) sequence matching [public: ES EQL docs —
`sequence by <key> with maxspan=<t> [step1] [step2]`]: find ordered pairs of
events sharing a join key where step2 follows step1 within the span.

Scale shape: the two step predicates prune the scan first (filter-pushdown),
then ONE window partitioned by the join key carries the running "most recent
step-1 timestamp" — per-key state, never a self-join, never a global sort.
At 100 TB this is the textbook funnel/correlation plan: shuffle once on the
key, linear scan within each key's ordered partition. Determinism: the
window orders by (ts, event_id) so same-timestamp events tie-break stably
on both the Spark and oracle sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def eql_sequence(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    step1: Column,
    step2: Column,
    maxspan_seconds: int,
    id_col: str = "event_id",
) -> DataFrame:
    """Ordered 2-step sequence per key within maxspan. Returns one row per
    step-2 event that completes a sequence: (key, step2 id, step2 ts,
    gap_seconds to the MOST RECENT qualifying step-1 event). A step-1 event
    may head multiple sequences (EQL's default non-consuming semantics)."""
    relevant = events.filter(step1 | step2).select(
        key_col,
        id_col,
        ts_col,
        step1.alias("_is1"),
        step2.alias("_is2"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last1 = F.max(F.when(F.col("_is1"), F.col(ts_col))).over(w)
    # exact microsecond arithmetic (per-ts second-truncation would disagree
    # with a fractional-diff floor on sub-second gaps); session pins UTC
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    gap_us = us(F.col(ts_col)) - us(F.col("_last1"))
    return (
        relevant.withColumn("_last1", last1)
        .filter(
            F.col("_is2")
            & F.col("_last1").isNotNull()
            & (gap_us <= maxspan_seconds * 1_000_000)
            & (gap_us >= 0)
        )
        .select(
            key_col,
            id_col,
            ts_col,
            F.floor(gap_us / F.lit(1_000_000.0)).cast("long")
            .alias("gap_seconds"),
        )
    )


def eql_sequence3(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    step1: Column,
    step2: Column,
    step3: Column,
    maxspan_seconds: int,
    id_col: str = "event_id",
) -> DataFrame:
    """3-step EQL sequence per key: step2 within maxspan of a prior step1,
    then step3 within maxspan of that completed (step1→step2) pair. Two
    stacked windows over the SAME key-partitioned, (ts, id)-ordered stream
    — one shuffle total; each window adds one running-max column of
    per-key state (the EQL engine's sequence registers). Returns one row
    per completing step-3 event with the gap to its step-2 anchor."""
    relevant = events.filter(step1 | step2 | step3).select(
        key_col,
        id_col,
        ts_col,
        step1.alias("_is1"),
        step2.alias("_is2"),
        step3.alias("_is3"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    span_us = maxspan_seconds * 1_000_000
    last1 = F.max(F.when(F.col("_is1"), F.col(ts_col))).over(w)
    s2 = relevant.withColumn("_last1", last1).withColumn(
        "_done2",
        F.when(
            F.col("_is2")
            & F.col("_last1").isNotNull()
            & ((us(F.col(ts_col)) - us(F.col("_last1"))) <= span_us)
            & ((us(F.col(ts_col)) - us(F.col("_last1"))) >= 0),
            F.col(ts_col),
        ),
    )
    last2 = F.max(F.col("_done2")).over(w)
    gap_us = us(F.col(ts_col)) - us(F.col("_last2"))
    return (
        s2.withColumn("_last2", last2)
        .filter(
            F.col("_is3")
            & F.col("_last2").isNotNull()
            & (gap_us <= span_us)
            & (gap_us >= 0)
        )
        .select(
            key_col,
            id_col,
            ts_col,
            F.floor(gap_us / F.lit(1_000_000.0)).cast("long")
            .alias("gap_seconds"),
        )
    )
