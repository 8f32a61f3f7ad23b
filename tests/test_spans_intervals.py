"""span_or / span_containing / span_within (VERDICT r03 #5) and intervals
any_of nesting (#4) — hand-built position fixtures with known answers."""

import pytest
from pyspark.sql import functions as F

from engine.corpus import tf_table, tokens, with_tokens
from engine.search import (
    intervals_all_of,
    intervals_query,
    span_containing_filter,
    span_or_filter,
    span_within_filter,
)

DOCS = [
    # doc 0: big window scan..fast (slop 2) containing slow at pos 1
    (0, "scan slow x fast y"),
    # doc 1: scan and fast adjacent, slow OUTSIDE the window
    (1, "scan fast x y slow"),
    # doc 2: no big pair (scan/fast too far apart at slop 2)
    (2, "scan a b c d e fast slow"),
    # doc 3: two little occurrences inside one big window
    (3, "scan slow slow fast"),
    # doc 4: only vector (span_or) and a row..fast ordered pair
    (4, "vector row z fast dup"),
]


@pytest.fixture(scope="module")
def tfp(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return tf_table(tokens(with_tokens(df)), with_positions=True).cache()


def test_span_or(tfp):
    got = {
        r["doc_id"]: (r["n_spans"], r["first_pos"])
        for r in span_or_filter(tfp, ["dup", "vector"]).collect()
    }
    assert got == {4: (2, 0)}
    with pytest.raises(ValueError, match="at least one"):
        span_or_filter(tfp, [])


def test_span_containing(tfp):
    got = {
        r["doc_id"]: r["n_spans"]
        for r in span_containing_filter(tfp, ("scan", "fast", 2), "slow").collect()
    }
    # doc 0: window [0,3] holds slow@1 → 1 span; doc 1: window [0,1], slow@4
    # outside; doc 2: no valid pair at slop 2; doc 3: window [0,3] holds two
    # littles but is ONE containing span
    assert got == {0: 1, 3: 1}
    with pytest.raises(ValueError, match="distinct"):
        span_containing_filter(tfp, ("scan", "fast", 2), "scan")


def test_span_within(tfp):
    got = {
        r["doc_id"]: r["n_spans"]
        for r in span_within_filter(tfp, "slow", ("scan", "fast", 2)).collect()
    }
    # mirror counts LITTLE occurrences: doc 3 has two enclosed slows
    assert got == {0: 1, 3: 2}


def test_span_containing_in_order(tfp):
    # ordered big: fast before scan does not form a window
    got = span_containing_filter(
        tfp, ("fast", "scan", 2), "slow", in_order=True
    ).collect()
    assert got == []


def test_intervals_any_of_matches_union(tfp):
    # all_of(any_of(scan), fast) == all_of(scan, fast) when any_of is unary
    a = sorted(
        map(tuple, intervals_query(tfp, [("any_of", ["scan"]), "fast"],
                                   max_gaps=3, ordered=True).collect())
    )
    b = sorted(
        map(tuple, intervals_query(tfp, ["scan", "fast"],
                                   max_gaps=3, ordered=True).collect())
    )
    assert a == b and a, "unary any_of must equal the flat form"
    # any_of widens: (scan|row) followed by fast also matches doc 4 via row
    c = sorted(
        r["doc_id"]
        for r in intervals_query(tfp, [("any_of", ["scan", "row"]), "fast"],
                                 max_gaps=3, ordered=True).collect()
    )
    assert 4 in c and set(b_doc for b_doc, _ in b) <= set(c)


def test_intervals_min_gaps_uses_best_member(tfp):
    # doc 4: row@1 .. fast@3 → 1 gap; scan absent — min_gaps comes from the
    # best any_of member
    rows = {
        r["doc_id"]: r["min_gaps"]
        for r in intervals_query(tfp, [("any_of", ["scan", "row"]), "fast"],
                                 max_gaps=5, ordered=True).collect()
    }
    assert rows[4] == 1
    # doc 0: scan@0 .. fast@3 → 2 gaps
    assert rows[0] == 2


def test_intervals_validation(tfp):
    with pytest.raises(ValueError, match="distinct"):
        intervals_query(tfp, [("any_of", ["scan", "fast"]), "fast"])
    with pytest.raises(ValueError, match=">= 2"):
        intervals_query(tfp, ["scan"])
    with pytest.raises(ValueError, match="any_of"):
        intervals_query(tfp, [("one_of", ["scan"]), "fast"])
    # wrapper still delegates
    assert sorted(
        map(tuple, intervals_all_of(tfp, ["scan", "fast"], max_gaps=9).collect())
    ) == sorted(
        map(tuple, intervals_query(tfp, ["scan", "fast"], max_gaps=9).collect())
    )


def _brute_min_gaps(poslists, ordered):
    import itertools

    best = None
    for combo in itertools.product(*poslists):
        if ordered and any(b <= a for a, b in zip(combo, combo[1:])):
            continue
        g = max(combo) - min(combo) + 1 - len(combo)
        if best is None or g < best:
            best = g
    return best


@pytest.mark.parametrize("ordered", [False, True])
def test_k4_sweep_matches_bruteforce(spark, ordered):
    """Arbitrary-k sweep path (k=4) vs exhaustive combo enumeration on
    randomized position fixtures."""
    import random

    from engine.search import intervals_query

    rng = random.Random(13)
    rows, truth = [], {}
    for doc in range(30):
        lists = [
            sorted(rng.sample(range(40), rng.randint(1, 5))) for _ in range(4)
        ]
        # distinct positions across terms (one token per position)
        used = set()
        clean = []
        for ps in lists:
            ps = [p for p in ps if p not in used]
            if not ps:
                ps = [max(used, default=0) + 1]
            used.update(ps)
            clean.append(sorted(ps))
        truth[doc] = _brute_min_gaps(clean, ordered)
        for t, ps in zip("abcd", clean):
            rows.append((doc, t, len(ps), ps))
    tfp = spark.createDataFrame(
        rows, "doc_id long, term string, tf long, positions array<int>"
    )
    got = {
        r["doc_id"]: r["min_gaps"]
        for r in intervals_query(
            tfp, ["a", "b", "c", "d"], max_gaps=100, ordered=ordered
        ).collect()
    }
    want = {d: g for d, g in truth.items() if g is not None and g <= 100}
    assert got == want


def test_span_near_multi_subsumes_pairs(tfp):
    from engine.search import span_near_multi

    a = sorted(
        map(tuple, span_near_multi(tfp, ["scan", "fast"], slop=2).collect())
    )
    b = sorted(
        map(tuple, intervals_query(tfp, ["scan", "fast"], max_gaps=2).collect())
    )
    assert a == b and a
