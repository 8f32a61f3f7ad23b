"""k-step EQL generalization (VERDICT r03 #3): eql_sequence_k vs a
brute-force existential-chain oracle on random event streams.

The oracle is implementation-independent: a step-k event matches iff there
EXIST events e1 < e2 < … < ek in strict (ts, id) order, ei satisfying step
i, whole-span ts_k − ts_1 ≤ maxspan, and (with until) no until-event
strictly between any consecutive pair — exactly ES EQL's documented
`sequence … until` semantics. Timestamps are drawn from a SMALL range so
same-second ties occur and the (ts, id) struct tie-break is exercised."""

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from engine.eql import eql_sequence, eql_sequence3, eql_sequence_k

BASE = datetime(2024, 1, 1)


def _gen(seed, n_keys=6, n_events=40, n_types=5, ts_range=60):
    rng = random.Random(seed)
    rows = []
    eid = 0
    for key in range(n_keys):
        for _ in range(n_events):
            rows.append(
                (
                    eid,
                    BASE + timedelta(seconds=rng.randrange(ts_range)),
                    key,
                    rng.randrange(2),  # region: composite-key second column
                    f"t{rng.randrange(n_types)}",
                )
            )
            eid += 1
    return rows


def _brute(rows, keys_of, step_types, span_s, until_type=None):
    """Existential-chain oracle. rows: (id, ts, user, region, type)."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for r in rows:
        by_key[keys_of(r)].append(r)
    out = []
    k = len(step_types)
    for key, evs in by_key.items():
        evs = sorted(evs, key=lambda r: (r[1], r[0]))

        def chain_exists(prefix_end, level, last_ts):
            """Any valid chain for steps[0:level+1] ending at index
            prefix_end, whose step-1 anchor satisfies the span vs last_ts?"""
            e = evs[prefix_end]
            if e[4] != step_types[level]:
                return False
            if level == 0:
                return (last_ts - e[1]).total_seconds() <= span_s
            for j in range(prefix_end):
                # until may not sit strictly between e_j and e (index order
                # == (ts, id) order)
                if until_type is not None and any(
                    evs[m][4] == until_type for m in range(j + 1, prefix_end)
                ):
                    continue
                if chain_exists(j, level - 1, last_ts):
                    return True
            return False

        for i, e in enumerate(evs):
            if e[4] != step_types[k - 1]:
                continue
            if k == 1:
                out.append((key, e[0]))
                continue
            ok = False
            for j in range(i):
                if until_type is not None and any(
                    evs[m][4] == until_type for m in range(j + 1, i)
                ):
                    continue
                if chain_exists(j, k - 2, e[1]):
                    ok = True
                    break
            if ok:
                out.append((key, e[0]))
    return sorted(out)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user long, region int, etype string"
    )


@pytest.mark.parametrize("seed", [1, 2, 3])
@pytest.mark.parametrize("k,until", [(2, None), (3, None), (4, None),
                                     (2, "t4"), (4, "t4")])
def test_k_step_matches_bruteforce(spark, seed, k, until):
    rows = _gen(seed)
    steps = [f"t{i}" for i in range(k)]
    got = sorted(
        (r["user"], r["event_id"])
        for r in eql_sequence_k(
            _df(spark, rows),
            "user",
            "ts",
            [F.col("etype") == t for t in steps],
            maxspan_seconds=30,
            until=None if until is None else F.col("etype") == until,
        ).collect()
    )
    want = _brute(rows, lambda r: r[2], steps, 30, until)
    assert got == want, f"seed={seed} k={k} until={until}"


@pytest.mark.parametrize("seed", [11, 12])
def test_composite_by_key(spark, seed):
    """`by user, region`: chains may not cross the composite key — a pair
    matching on user alone but spanning two regions must NOT match."""
    rows = _gen(seed, n_keys=4, n_events=30)
    steps = ["t0", "t1", "t2"]
    got = sorted(
        (r["user"], r["region"], r["event_id"])
        for r in eql_sequence_k(
            _df(spark, rows),
            ["user", "region"],
            "ts",
            [F.col("etype") == t for t in steps],
            maxspan_seconds=30,
        ).collect()
    )
    want = sorted(
        (u, reg, eid)
        for (u, reg), eid in [
            (key, eid)
            for key, eid in _brute(rows, lambda r: (r[2], r[3]), steps, 30)
        ]
    )
    assert got == want
    # sanity: composite partitioning is strictly finer than user-only
    user_only = _brute(rows, lambda r: r[2], steps, 30)
    assert len(got) <= len(user_only)


def test_wrappers_delegate(spark):
    rows = _gen(99)
    df = _df(spark, rows)
    p2 = [F.col("etype") == "t0", F.col("etype") == "t1"]
    a = sorted(map(tuple, eql_sequence(df, "user", "ts", *p2, 25).collect()))
    b = sorted(map(tuple, eql_sequence_k(df, "user", "ts", p2, 25).collect()))
    assert a == b
    p3 = p2 + [F.col("etype") == "t2"]
    c = sorted(map(tuple, eql_sequence3(df, "user", "ts", *p3, 25).collect()))
    d = sorted(map(tuple, eql_sequence_k(df, "user", "ts", p3, 25).collect()))
    assert c == d


def test_until_expires_at_inner_level(spark):
    """until between step2 and step3 of a 4-step chain kills the match even
    though steps 1-2 completed before the terminator."""
    rows = [
        (0, BASE, 1, 0, "s1"),
        (1, BASE + timedelta(seconds=1), 1, 0, "s2"),
        (2, BASE + timedelta(seconds=2), 1, 0, "u"),
        (3, BASE + timedelta(seconds=3), 1, 0, "s3"),
        (4, BASE + timedelta(seconds=4), 1, 0, "s4"),
    ]
    df = _df(spark, rows)
    steps = [F.col("etype") == t for t in ("s1", "s2", "s3", "s4")]
    blocked = eql_sequence_k(
        df, "user", "ts", steps, 100, until=F.col("etype") == "u"
    ).collect()
    assert blocked == []
    # without until the chain completes
    open_ = eql_sequence_k(df, "user", "ts", steps, 100).collect()
    assert [r["event_id"] for r in open_] == [4]
    # fresh events AFTER the terminator restart cleanly
    rows += [
        (5, BASE + timedelta(seconds=5), 1, 0, "s1"),
        (6, BASE + timedelta(seconds=6), 1, 0, "s2"),
        (7, BASE + timedelta(seconds=7), 1, 0, "s3"),
        (8, BASE + timedelta(seconds=8), 1, 0, "s4"),
    ]
    again = eql_sequence_k(
        _df(spark, rows), "user", "ts", steps, 100,
        until=F.col("etype") == "u",
    ).collect()
    assert [r["event_id"] for r in again] == [8]


def test_whole_span_bounds_first_to_last(spark):
    rows = [
        (0, BASE, 1, 0, "s1"),
        (1, BASE + timedelta(seconds=10), 1, 0, "s2"),
        (2, BASE + timedelta(seconds=20), 1, 0, "s3"),
    ]
    steps = [F.col("etype") == t for t in ("s1", "s2", "s3")]
    # per-hop gaps are 10s each; whole span is 20s — maxspan=15 must reject
    assert (
        eql_sequence_k(_df(spark, rows), "user", "ts", steps, 15).collect()
        == []
    )
    assert [
        r["event_id"]
        for r in eql_sequence_k(
            _df(spark, rows), "user", "ts", steps, 20
        ).collect()
    ] == [2]


def test_k_validation():
    with pytest.raises(ValueError, match=">= 2 steps"):
        eql_sequence_k(None, "user", "ts", [F.lit(True)], 10)


def test_eql_sample_and_join_semantics(spark):
    from engine.eql import eql_join, eql_sample

    rows = [
        # key 1: all three types, unordered (purchase before view) → sample
        (0, BASE + timedelta(seconds=5), 1, 0, "purchase"),
        (1, BASE + timedelta(seconds=6), 1, 0, "view"),
        (2, BASE + timedelta(seconds=7), 1, 0, "view"),
        # key 2: missing purchase → no sample
        (3, BASE + timedelta(seconds=1), 2, 0, "view"),
        # key 3: both, but error BEFORE purchase → join excludes purchase
        (4, BASE + timedelta(seconds=1), 3, 0, "view"),
        (5, BASE + timedelta(seconds=2), 3, 0, "error"),
        (6, BASE + timedelta(seconds=3), 3, 0, "purchase"),
    ]
    df = _df(spark, rows).withColumnRenamed("etype", "etype")
    steps = [F.col("etype") == "view", F.col("etype") == "purchase"]
    samples = {
        r["user"]: (r["id1"], r["id2"])
        for r in eql_sample(df, "user", "ts", steps).collect()
    }
    # latest view per key; unordered (purchase earlier than view still OK)
    assert samples == {1: (2, 0), 3: (4, 6)}
    joined = {
        r["user"]: (r["id1"], r["id2"])
        for r in eql_join(
            df, "user", "ts", steps, until=F.col("etype") == "error"
        ).collect()
    }
    # key 3's purchase is after its first error → dropped
    assert joined == {1: (2, 0)}
    import pytest

    with pytest.raises(ValueError, match=">= 2"):
        eql_sample(df, "user", "ts", [steps[0]])


# --- runs=N + missing-event steps (VERDICT r04 #8) ---------------------------


def _brute_spec(rows, keys_of, step_types, span_s, missing=None):
    """Existential-chain oracle with per-gap missing events: a step-k event
    matches iff there EXIST e1 < ... < ek in (ts, id) order, ei of type
    step_types[i-1], whole-span <= span_s, and for every level i with a
    missing type, NO event of that type strictly between the CHOSEN e_{i-1}
    and e_i (ES EQL missing-event semantics). `runs=N` is just N repeated
    entries in step_types."""
    from collections import defaultdict

    missing = missing or {}
    by_key = defaultdict(list)
    for r in rows:
        by_key[keys_of(r)].append(r)
    out = []
    k = len(step_types)
    for key, evs in by_key.items():
        evs = sorted(evs, key=lambda r: (r[1], r[0]))

        def gap_clean(j, i_idx, level):
            t = missing.get(level)
            return t is None or all(
                evs[m][4] != t for m in range(j + 1, i_idx)
            )

        def chain(end_idx, level, last_ts):
            e = evs[end_idx]
            if e[4] != step_types[level - 1]:
                return False
            if level == 1:
                return (last_ts - e[1]).total_seconds() <= span_s
            return any(
                gap_clean(j, end_idx, level) and chain(j, level - 1, last_ts)
                for j in range(end_idx)
            )

        for i, e in enumerate(evs):
            if e[4] != step_types[k - 1]:
                continue
            if any(gap_clean(j, i, k) and chain(j, k - 1, e[1])
                   for j in range(i)):
                out.append((key, e[0]))
    return sorted(out)


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_runs_and_missing_match_bruteforce(spark, seed):
    from engine.eql import eql_sequence_spec

    rows = _gen(seed)
    # [t0] with runs=2  ![t3]  [t1]  — two t0s, then a t1 whose gap back to
    # the second t0 holds no t3
    got = sorted(
        (r["user"], r["event_id"])
        for r in eql_sequence_spec(
            _df(spark, rows),
            "user",
            "ts",
            [
                ("event", F.col("etype") == "t0", 2),
                ("missing", F.col("etype") == "t3"),
                ("event", F.col("etype") == "t1"),
            ],
            maxspan_seconds=30,
        ).collect()
    )
    want = _brute_spec(
        rows, lambda r: r[2], ["t0", "t0", "t1"], 30, missing={3: "t3"}
    )
    assert got == want, f"seed={seed}"


@pytest.mark.parametrize("seed", [31, 32])
def test_missing_mid_gap_matches_bruteforce(spark, seed):
    from engine.eql import eql_sequence_spec

    rows = _gen(seed)
    # [t0] ![t4] [t1] [t2] — the missing slot sits in the FIRST gap
    got = sorted(
        (r["user"], r["event_id"])
        for r in eql_sequence_spec(
            _df(spark, rows),
            "user",
            "ts",
            [
                ("event", F.col("etype") == "t0"),
                ("missing", F.col("etype") == "t4"),
                ("event", F.col("etype") == "t1"),
                ("event", F.col("etype") == "t2"),
            ],
            maxspan_seconds=30,
        ).collect()
    )
    want = _brute_spec(
        rows, lambda r: r[2], ["t0", "t1", "t2"], 30, missing={2: "t4"}
    )
    assert got == want, f"seed={seed}"


def test_runs_needs_distinct_events_and_missing_blocks(spark):
    """Hand-pinned semantics: runs=2 needs two DISTINCT qualifying events
    (one event never satisfies two levels); a missing-pred event inside the
    guarded gap kills the match, outside it does not."""
    from engine.eql import eql_sequence_spec

    def run(rows):
        return sorted(
            r["event_id"]
            for r in eql_sequence_spec(
                _df(spark, rows),
                "user",
                "ts",
                [
                    ("event", F.col("etype") == "t0", 2),
                    ("missing", F.col("etype") == "t3"),
                    ("event", F.col("etype") == "t1"),
                ],
                maxspan_seconds=600,
            ).collect()
        )

    t = lambda s: BASE + timedelta(seconds=s)
    # one t0 only → no match
    assert run([(0, t(0), 1, 0, "t0"), (1, t(5), 1, 0, "t1")]) == []
    # two t0s → match
    assert run([(0, t(0), 1, 0, "t0"), (1, t(2), 1, 0, "t0"),
                (2, t(5), 1, 0, "t1")]) == [2]
    # t3 between the 2nd t0 and the t1 → blocked
    assert run([(0, t(0), 1, 0, "t0"), (1, t(2), 1, 0, "t0"),
                (2, t(3), 1, 0, "t3"), (3, t(5), 1, 0, "t1")]) == []
    # t3 BEFORE the 2nd t0 → the guarded gap is clean → match
    assert run([(0, t(0), 1, 0, "t0"), (1, t(1), 1, 0, "t3"),
                (2, t(2), 1, 0, "t0"), (3, t(5), 1, 0, "t1")]) == [3]


def test_spec_validation():
    from engine.eql import eql_sequence_spec

    with pytest.raises(ValueError, match="precede the first"):
        eql_sequence_spec(
            None, "u", "ts",
            [("missing", F.lit(True)), ("event", F.lit(True)),
             ("event", F.lit(True))], 10,
        )
    with pytest.raises(ValueError, match="end the sequence"):
        eql_sequence_spec(
            None, "u", "ts",
            [("event", F.lit(True)), ("missing", F.lit(True))], 10,
        )
    with pytest.raises(ValueError, match="runs"):
        eql_sequence_spec(
            None, "u", "ts",
            [("event", F.lit(True), 0), ("event", F.lit(True))], 10,
        )
