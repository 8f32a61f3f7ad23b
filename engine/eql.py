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
    until: Column | None = None,
) -> DataFrame:
    """Ordered 2-step sequence per key within maxspan. Returns one row per
    step-2 event that completes a sequence: (key, step2 id, step2 ts,
    gap_seconds to the MOST RECENT qualifying step-1 event). A step-1 event
    may head multiple sequences (EQL's default non-consuming semantics).
    `until` is EQL's terminator clause: an until-event EXPIRES all pending
    step-1 state, so a step-2 only matches a step-1 with no until-event
    between them — one more running-max register in the same window, no
    extra shuffle."""
    preds = (step1 | step2) if until is None else (step1 | step2 | until)
    relevant = events.filter(preds).select(
        key_col,
        id_col,
        ts_col,
        step1.alias("_is1"),
        step2.alias("_is2"),
        (until if until is not None else F.lit(False)).alias("_isu"),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last1 = F.max(F.when(F.col("_is1"), F.col(ts_col))).over(w)
    lastu = F.max(F.when(F.col("_isu"), F.col(ts_col))).over(w)
    # exact microsecond arithmetic (per-ts second-truncation would disagree
    # with a fractional-diff floor on sub-second gaps); session pins UTC
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    gap_us = us(F.col(ts_col)) - us(F.col("_last1"))
    alive = F.col("_lastu").isNull() | (F.col("_lastu") < F.col("_last1"))
    return (
        relevant.withColumn("_last1", last1)
        .withColumn("_lastu", lastu)
        .filter(
            F.col("_is2")
            & F.col("_last1").isNotNull()
            & alive
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


def sessionize(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    id_col: str = "event_id",
) -> DataFrame:
    """Batch sessionization [public: standard gap-based session assignment;
    the batch analog of Spark's streaming session_window (J3)]: events of a
    key belong to the same session while consecutive gaps stay ≤
    `gap_seconds`; a larger gap starts a new session. The classic
    lag-then-cumulative-sum: one key-partitioned window computes the
    is-new-session flag, a second running sum over the SAME window ordering
    numbers the sessions — per-key state, one shuffle, no self-join.
    Returns the input plus `session_id` (0-based per key)."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    prev = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev.isNull()
        | ((us(F.col(ts_col)) - us(prev)) > gap_seconds * 1_000_000),
        1,
    ).otherwise(0)
    return events.withColumn(
        "session_id",
        (
            F.sum(new_session).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            )
            - 1
        ).cast("long"),
    )


def session_stats(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    gap_seconds: int,
    id_col: str = "event_id",
) -> DataFrame:
    """Per-key session summary over sessionize(): session count, mean events
    per session, mean session duration (seconds). Two hash aggregates over
    the already-shuffled sessionized frame — the window's partitioning is
    reused by the first groupBy (same key prefix, no second exchange)."""
    s = sessionize(events, key_col, ts_col, gap_seconds, id_col)
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    per_session = s.groupBy(key_col, "session_id").agg(
        F.count("*").alias("_n"),
        ((us(F.max(ts_col)) - us(F.min(ts_col))) / 1_000_000.0).alias("_dur"),
    )
    return (
        per_session.groupBy(key_col)
        .agg(
            F.count("*").alias("n_sessions"),
            F.round(F.avg("_n"), 4).alias("avg_events"),
            F.round(F.avg("_dur"), 4).alias("avg_duration_s"),
        )
        .orderBy(key_col)
    )


def funnel_conversion(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    steps: list[Column],
    maxspan_seconds: int,
    id_col: str = "event_id",
) -> DataFrame:
    """Ordered funnel conversion over 2 or 3 steps: distinct keys reaching
    each stage IN ORDER within the span, plus step-over-step conversion
    rates — the product-analytics view of the EQL sequence machinery (same
    windows, aggregated to one row). Distinct-key counting means a user
    converting twice counts once per stage."""
    k = len(steps)
    if k not in (2, 3):
        raise ValueError(f"funnel_conversion supports 2 or 3 steps, got {k}")
    stage1 = events.filter(steps[0]).select(key_col).distinct()
    stage2 = (
        eql_sequence(
            events, key_col, ts_col, steps[0], steps[1],
            maxspan_seconds, id_col,
        )
        .select(key_col)
        .distinct()
    )
    counts = [stage1.count(), stage2.count()]
    if k == 3:
        stage3 = (
            eql_sequence3(
                events, key_col, ts_col, steps[0], steps[1], steps[2],
                maxspan_seconds, id_col,
            )
            .select(key_col)
            .distinct()
        )
        counts.append(stage3.count())
    spark = events.sparkSession
    rows = []
    for i, n in enumerate(counts):
        conv = round(n / counts[i - 1], 4) if i > 0 and counts[i - 1] else None
        rows.append((i + 1, n, conv))
    return spark.createDataFrame(
        rows, "step int, n_keys bigint, conversion double"
    )


def cohort_retention(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    unit: str = "week",
) -> DataFrame:
    """Cohort retention [public: standard product-analytics cohort table]:
    keys grouped by first-activity period (the cohort), counted per
    periods-since-first-activity. Two map-side-combining hash aggregates:
    per-key first activity (one row per key), broadcast-join back is
    avoided by re-aggregating the (key, period) pairs AFTER attaching each
    key's cohort via an equi-join on the key — shuffle on the key once,
    then reduce to |cohorts|×|ages| rows. Returns (cohort, age, n_keys)."""
    bucket = lambda c: F.date_trunc(unit, c)  # noqa: E731
    firsts = events.groupBy(key_col).agg(
        bucket(F.min(ts_col)).alias("cohort")
    )
    active = (
        events.select(key_col, bucket(F.col(ts_col)).alias("period"))
        .distinct()
    )
    secs_per = {"day": 86400, "week": 604800}.get(unit)
    if secs_per is None:
        raise ValueError(f"cohort_retention supports day/week units: {unit}")
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    age = (
        (us(F.col("period")) - us(F.col("cohort")))
        / F.lit(1_000_000 * secs_per)
    ).cast("long")
    return (
        active.join(firsts, key_col)
        .groupBy("cohort", age.alias("age"))
        .agg(F.count("*").alias("n_keys"))
        .orderBy("cohort", "age")
    )
