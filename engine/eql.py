"""ES EQL (Event Query Language) sequence matching [public: ES EQL docs —
`sequence by <key> with maxspan=<t> [step1] [step2] (until [u])`] plus the
event-analytics family built on the same machinery (sessionization, funnel
conversion, cohort retention).

Scale shape shared by everything here: step predicates prune the scan first
(filter-pushdown), then ONE window partitioned by the join key carries the
running per-key state ("sequence registers") — per-key state, never a
self-join, never a global sort. At 100 TB this is the textbook
funnel/correlation plan: shuffle once on the key, linear scan within each
key's ordered partition. Determinism: windows order by (ts, event_id) so
same-timestamp events tie-break stably on both the Spark and oracle sides,
and the registers are (ts, id) STRUCTS so the tie-break survives into the
state comparisons, not just the row order.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _us(c: Column) -> Column:
    """Exact microsecond epoch (NTZ → timestamp → unix_micros; the session
    pins UTC). Per-timestamp second-truncation would disagree with a
    fractional-diff floor on sub-second gaps — always diff in micros."""
    return F.unix_micros(c.cast("timestamp"))


def _key_window(key_col: str, ts_col: str, id_col: str) -> Window:
    return (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )


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
    extra shuffle. The aliveness comparison is on (ts, id) structs, so an
    until-event sharing a timestamp with a LATER step-1 (by id order) does
    not expire it. With until=None no register is built — the plan is
    identical to the plain 2-step form."""
    preds = (step1 | step2) if until is None else (step1 | step2 | until)
    cols = [
        key_col,
        id_col,
        ts_col,
        step1.alias("_is1"),
        step2.alias("_is2"),
    ]
    if until is not None:
        cols.append(until.alias("_isu"))
    relevant = events.filter(preds).select(*cols)
    w = _key_window(key_col, ts_col, id_col)
    reg = F.struct(F.col(ts_col), F.col(id_col))
    out = relevant.withColumn(
        "_l1", F.max(F.when(F.col("_is1"), reg)).over(w)
    )
    alive = F.lit(True)
    if until is not None:
        out = out.withColumn(
            "_lu", F.max(F.when(F.col("_isu"), reg)).over(w)
        )
        alive = F.col("_lu").isNull() | (F.col("_lu") < F.col("_l1"))
    gap_us = _us(F.col(ts_col)) - _us(F.col("_l1").getField(ts_col))
    return (
        out.filter(
            F.col("_is2")
            & F.col("_l1").isNotNull()
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


def _sequence3_annotated(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    step1: Column,
    step2: Column,
    step3: Column,
    maxspan_seconds: int,
    id_col: str,
) -> DataFrame:
    """The 3-step sequence frame with its registers exposed: `_is1`,
    `_done2` (ts when this row completes step 1→2), `_l2` (running latest
    completed step-2 register), `_t0` (that pair's step-1 anchor ts), and
    `_match3` (this row completes the full chain). Shared by eql_sequence3
    and funnel_conversion so the funnel never recomputes the windows.

    `maxspan` bounds the WHOLE sequence first-to-last, exactly like ES EQL
    (not per hop): `_t0` rides along so step 3 checks its distance to the
    ORIGINAL step-1 anchor. Using the most recent completed pair is sound:
    the step-1 register is a running max, so later step-2 completions carry
    anchors ≥ earlier ones — the latest pair is always the most permissive
    for the whole-span check."""
    relevant = events.filter(step1 | step2 | step3).select(
        key_col,
        id_col,
        ts_col,
        step1.alias("_is1"),
        step2.alias("_is2"),
        step3.alias("_is3"),
    )
    w = _key_window(key_col, ts_col, id_col)
    reg = F.struct(F.col(ts_col), F.col(id_col))
    span_us = maxspan_seconds * 1_000_000
    s1 = relevant.withColumn(
        "_l1", F.max(F.when(F.col("_is1"), reg)).over(w)
    )
    gap1_us = _us(F.col(ts_col)) - _us(F.col("_l1").getField(ts_col))
    done2_cond = (
        F.col("_is2")
        & F.col("_l1").isNotNull()
        & (gap1_us <= span_us)
        & (gap1_us >= 0)
    )
    s2 = s1.withColumn(
        "_done2", F.when(done2_cond, F.col(ts_col))
    ).withColumn(
        "_done2_t0", F.when(done2_cond, F.col("_l1").getField(ts_col))
    )
    # _t0 is monotone nondecreasing over completed pairs (see docstring),
    # so two plain running maxes stay mutually consistent
    s3 = s2.withColumn(
        "_l2", F.max(F.when(F.col("_done2").isNotNull(), reg)).over(w)
    ).withColumn("_t0", F.max(F.col("_done2_t0")).over(w))
    gap0_us = _us(F.col(ts_col)) - _us(F.col("_t0"))
    gap2_us = _us(F.col(ts_col)) - _us(F.col("_l2").getField(ts_col))
    return s3.withColumn(
        "_gap2_us", gap2_us
    ).withColumn(
        "_match3",
        F.col("_is3")
        & F.col("_l2").isNotNull()
        & (gap0_us <= span_us)
        & (gap0_us >= 0)
        & (gap2_us >= 0),
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
    """3-step EQL sequence per key: the maxspan bounds the WHOLE chain
    first-to-last (ES EQL semantics). Two stacked windows over the SAME
    key-partitioned, (ts, id)-ordered stream — one shuffle total; each
    window adds one running register of per-key state. Returns one row per
    completing step-3 event with the gap to its step-2 anchor."""
    ann = _sequence3_annotated(
        events, key_col, ts_col, step1, step2, step3,
        maxspan_seconds, id_col,
    )
    return ann.filter(F.col("_match3")).select(
        key_col,
        id_col,
        ts_col,
        F.floor(F.col("_gap2_us") / F.lit(1_000_000.0)).cast("long")
        .alias("gap_seconds"),
    )


def _round_half_up(x: float, places: int = 4) -> float:
    """Half-AWAY-from-zero for non-negative x — matches Spark F.round and
    DuckDB round; Python's built-in round() is banker's (ties-to-even) and
    would hash-diverge on dyadic ratios like 1/32."""
    scale = 10**places
    return math.floor(x * scale + 0.5) / scale


def funnel_conversion(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    steps: list[Column],
    maxspan_seconds: int,
    id_col: str = "event_id",
) -> DataFrame:
    """Ordered funnel conversion over 2 or 3 steps: distinct keys reaching
    each stage IN ORDER within the (whole-sequence) span, plus
    step-over-step conversion rates — the product-analytics view of the EQL
    sequence machinery. ONE annotated frame feeds conditional
    count-distincts for every stage (a single Spark job), instead of one
    job per stage. Distinct-key counting means a key converting twice
    counts once per stage."""
    k = len(steps)
    if k not in (2, 3):
        raise ValueError(f"funnel_conversion supports 2 or 3 steps, got {k}")
    spark = events.sparkSession
    if k == 3:
        ann = _sequence3_annotated(
            events, key_col, ts_col, steps[0], steps[1], steps[2],
            maxspan_seconds, id_col,
        )
        row = ann.agg(
            F.countDistinct(F.when(F.col("_is1"), F.col(key_col))).alias("n1"),
            F.countDistinct(
                F.when(F.col("_done2").isNotNull(), F.col(key_col))
            ).alias("n2"),
            F.countDistinct(F.when(F.col("_match3"), F.col(key_col))).alias(
                "n3"
            ),
        ).collect()[0]
        counts = [row["n1"], row["n2"], row["n3"]]
    else:
        matched = eql_sequence(
            events, key_col, ts_col, steps[0], steps[1],
            maxspan_seconds, id_col,
        )
        n1 = events.filter(steps[0]).select(key_col).distinct().count()
        n2 = matched.select(key_col).distinct().count()
        counts = [n1, n2]
    rows = []
    for i, n in enumerate(counts):
        # step 1 converts at 1.0 by definition (100% of entrants) — a real
        # number, not NULL, so row comparisons/hashes never meet a None
        if i == 0:
            conv = 1.0
        elif counts[i - 1]:
            conv = _round_half_up(n / counts[i - 1])
        else:
            conv = 0.0
        rows.append((i + 1, n, conv))
    return spark.createDataFrame(
        rows, "step int, n_keys bigint, conversion double"
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
    prev = F.lag(F.col(ts_col)).over(w)
    new_session = F.when(
        prev.isNull()
        | ((_us(F.col(ts_col)) - _us(prev)) > gap_seconds * 1_000_000),
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
    per_session = s.groupBy(key_col, "session_id").agg(
        F.count("*").alias("_n"),
        ((_us(F.max(ts_col)) - _us(F.min(ts_col))) / 1_000_000.0).alias(
            "_dur"
        ),
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


def cohort_retention(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    unit: str = "week",
) -> DataFrame:
    """Cohort retention [public: standard product-analytics cohort table]:
    keys grouped by first-activity period (the cohort), counted per
    periods-since-first-activity. Two map-side-combining hash aggregates
    (per-key first activity; distinct (key, period) pairs) joined on the
    key — shuffle on the key once, then reduce to |cohorts|×|ages| rows.
    Returns (cohort, age, n_keys)."""
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
    age = (
        (_us(F.col("period")) - _us(F.col("cohort")))
        / F.lit(1_000_000 * secs_per)
    ).cast("long")
    return (
        active.join(firsts, key_col)
        .groupBy("cohort", age.alias("age"))
        .agg(F.count("*").alias("n_keys"))
        .orderBy("cohort", "age")
    )
