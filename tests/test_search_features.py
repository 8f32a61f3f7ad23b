"""Unit tests for the round-2 ES-surface features: sloppy phrase, term
suggester, field collapse, synonyms, function_score. The driver-contract
test (test_driver_contract.py) checks each against its DuckDB oracle; these
pin the semantics the 2-term oracles can't reach (n-term slop chains,
collapse tie-breaks, suggester ranking)."""

import pytest
from pyspark.sql import functions as F

from engine.search import collapse_topk, expand_synonyms, phrase_filter
from engine.suggest import term_suggest


def _tfp(spark, rows):
    """rows: (doc_id, term, positions)"""
    return spark.createDataFrame(
        rows, "doc_id long, term string, positions array<int>"
    )


class TestSloppyPhrase:
    def test_slop0_is_strict_adjacency(self, spark):
        tfp = _tfp(
            spark,
            [
                (1, "a", [0]), (1, "b", [1]),        # adjacent → match
                (2, "a", [0]), (2, "b", [2]),        # gap 2 → no match at slop 0
            ],
        )
        got = {r.doc_id for r in phrase_filter(tfp, ["a", "b"], slop=0).collect()}
        assert got == {1}

    def test_slop1_allows_one_gap(self, spark):
        tfp = _tfp(
            spark,
            [
                (1, "a", [0]), (1, "b", [1]),
                (2, "a", [0]), (2, "b", [2]),        # gap 2 → match at slop 1
                (3, "a", [0]), (3, "b", [3]),        # gap 3 → no match
                (4, "b", [0]), (4, "a", [1]),        # reversed order → never
            ],
        )
        got = {r.doc_id for r in phrase_filter(tfp, ["a", "b"], slop=1).collect()}
        assert got == {1, 2}

    def test_three_term_chain_tracks_running_ends(self, spark):
        # "a b c" slop 1: each consecutive gap ≤ 2. doc 1: 0,2,4 (ok).
        # doc 2: 0,2,5 (second gap 3 → fail). doc 3 only matches via the
        # SECOND occurrence of b (0, 1→dead-end? no: both b's valid: 1 and 2;
        # c at 4 reachable from b=2 but not from b=1... gap from 2 is 2 → ok).
        tfp = _tfp(
            spark,
            [
                (1, "a", [0]), (1, "b", [2]), (1, "c", [4]),
                (2, "a", [0]), (2, "b", [2]), (2, "c", [5]),
                (3, "a", [0]), (3, "b", [1, 2]), (3, "c", [4]),
            ],
        )
        got = {r.doc_id for r in phrase_filter(tfp, ["a", "b", "c"], slop=1).collect()}
        assert got == {1, 3}


class TestSuggest:
    def test_ranking_distance_then_freq(self, spark):
        ts = spark.createDataFrame(
            [("group", 100, 200), ("dup", 10, 20), ("grep", 50, 60), ("zzz", 999, 999)],
            "term string, df long, cf long",
        )
        rows = term_suggest(ts, "grup", max_dist=2, k=5).collect()
        # distances: group=1, grep=1, dup=2; freq breaks the tie group>grep
        assert [(r.suggestion, r.distance) for r in rows] == [
            ("group", 1), ("grep", 1), ("dup", 2),
        ]

    def test_k_cuts(self, spark):
        ts = spark.createDataFrame(
            [("aa", 5, 5), ("ab", 9, 9), ("ac", 1, 1)], "term string, df long, cf long"
        )
        rows = term_suggest(ts, "aa", max_dist=1, k=2).collect()
        assert [r.suggestion for r in rows] == ["aa", "ab"]


class TestCollapse:
    def test_one_hit_per_group_with_tiebreak(self, spark):
        scored = spark.createDataFrame(
            [(1, 5.0), (2, 5.0), (3, 7.0), (4, 1.0)], "doc_id long, score double"
        )
        docs = spark.createDataFrame(
            [(1, "g1"), (2, "g1"), (3, "g2"), (4, "g3")], "doc_id long, source string"
        )
        rows = collapse_topk(scored, docs, "source", k=10).collect()
        # g1 ties at 5.0 → lower doc_id (1) wins; order score desc
        assert [(r.source, r.doc_id, r.score) for r in rows] == [
            ("g2", 3, 7.0), ("g1", 1, 5.0), ("g3", 4, 1.0),
        ]

    def test_global_topk_cut(self, spark):
        scored = spark.createDataFrame(
            [(i, float(i)) for i in range(1, 7)], "doc_id long, score double"
        )
        docs = spark.createDataFrame(
            [(i, f"g{i}") for i in range(1, 7)], "doc_id long, source string"
        )
        rows = collapse_topk(scored, docs, "source", k=2).collect()
        assert [r.doc_id for r in rows] == [6, 5]


class TestSynonyms:
    def test_expansion_and_order(self):
        assert (
            expand_synonyms("quick merge", {"quick": ["fast"], "merge": ["join"]})
            == "quick fast merge join"
        )

    def test_must_not_never_expanded(self):
        assert expand_synonyms("-quick x", {"quick": ["fast"]}) == "-quick x"

    def test_no_duplicate_tokens(self):
        assert expand_synonyms("fast quick", {"quick": ["fast"]}) == "fast quick"


class TestPercolate:
    def test_and_semantics(self, spark):
        from engine.percolate import percolate

        dt = spark.createDataFrame(
            [(1, "a"), (1, "b"), (2, "a"), (3, "b"), (3, "c")],
            "doc_id long, term string",
        )
        got = percolate(dt, [("q1", "a b"), ("q2", "c")]).collect()
        assert [(r.query_id, r.doc_id) for r in got] == [("q1", 1), ("q2", 3)]

    def test_duplicate_terms_in_doc_ok(self, spark):
        from engine.percolate import percolate

        # tf-style input (duplicates) must not double-count a term
        dt = spark.createDataFrame(
            [(1, "a"), (1, "a")], "doc_id long, term string"
        )
        got = percolate(dt, [("q", "a b")]).collect()
        assert got == []


class TestConnectedComponents:
    def test_chain_collapses_to_min(self, spark):
        from engine.dedup import connected_components

        # chain 1-2-3-4 plus isolated pair 10-11
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
        )
        rows = connected_components(pairs).collect()
        assert {(r.doc_id, r.canonical_id) for r in rows} == {
            (1, 1), (2, 1), (3, 1), (4, 1), (10, 10), (11, 10),
        }

    def test_diameter_longer_than_one_round(self, spark):
        from engine.dedup import connected_components

        # path of length 6: needs several propagation rounds
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(6, 0, -1)], "id_a long, id_b long"
        )
        rows = connected_components(pairs).collect()
        assert all(r.canonical_id == 1 for r in rows) and len(rows) == 7


# --- round-3 batch 2: span_near / match_phrase_prefix / pinned / rescores ---

from engine.search import (  # noqa: E402
    match_phrase_prefix_filter,
    pinned_topk,
    span_near_filter,
)


class TestSpanNear:
    def test_unordered_matches_both_directions(self, spark):
        tfp = _tfp(
            spark,
            [
                (1, "a", [0]), (1, "b", [2]),   # gap 1, a before b
                (2, "b", [0]), (2, "a", [2]),   # gap 1, b before a
                (3, "a", [0]), (3, "b", [9]),   # gap 8 → out of slop
            ],
        )
        got = {r.doc_id: r.min_gap
               for r in span_near_filter(tfp, "a", "b", slop=2).collect()}
        assert got == {1: 1, 2: 1}

    def test_in_order_rejects_reversed(self, spark):
        tfp = _tfp(
            spark,
            [
                (1, "a", [0]), (1, "b", [2]),   # a before b → match
                (2, "b", [0]), (2, "a", [2]),   # reversed → no match in_order
            ],
        )
        got = {r.doc_id for r in
               span_near_filter(tfp, "a", "b", slop=2, in_order=True).collect()}
        assert got == {1}

    def test_min_gap_is_smallest_qualifying(self, spark):
        tfp = _tfp(spark, [(1, "a", [0, 10]), (1, "b", [3, 11])])
        rows = span_near_filter(tfp, "a", "b", slop=5).collect()
        assert rows[0].min_gap == 0  # 10→11 adjacency beats 0→3 (gap 2)


class TestMatchPhrasePrefix:
    def test_prefix_expansion_union(self, spark):
        tfp = _tfp(
            spark,
            [
                (1, "x", [0]), (1, "scan", [1]),     # x → sc* adjacent
                (2, "x", [0]), (2, "schema", [1]),   # different sc* term
                (3, "x", [0]), (3, "sort", [1]),     # not sc*
                (4, "scan", [0]), (4, "x", [1]),     # wrong order
            ],
        )
        got = {r.doc_id
               for r in match_phrase_prefix_filter(tfp, "x", "sc").collect()}
        assert got == {1, 2}


class TestPinned:
    def test_pinned_rank_first_in_given_order_then_organic(self, spark):
        scored = spark.createDataFrame(
            [(1, 5.0), (2, 4.0), (3, 3.0), (4, 2.0)],
            "doc_id long, score double",
        )
        rows = pinned_topk(scored, [3, 2], k=4).collect()
        assert [r.doc_id for r in rows] == [3, 2, 1, 4]
        # pinned ids removed from the organic tail (no duplicates)
        assert len({r.doc_id for r in rows}) == 4

    def test_pinned_id_outside_match_set_still_returned(self, spark):
        scored = spark.createDataFrame([(1, 5.0)], "doc_id long, score double")
        rows = pinned_topk(scored, [99], k=3).collect()
        assert [r.doc_id for r in rows] == [99, 1]


# --- intervals all_of (round 3) -----------------------------------------------


class TestIntervals:
    def _tfp(self, spark, rows):
        data = []
        for doc_id, text in rows:
            toks = text.split()
            seen = {}
            for i, t in enumerate(toks):
                seen.setdefault(t, []).append(i)
            for t, ps in seen.items():
                data.append((doc_id, t, len(ps), ps))
        return spark.createDataFrame(
            data, "doc_id long, term string, tf long, positions array<int>"
        )

    def test_unordered_minimal_window(self, spark):
        from engine.search import intervals_all_of

        tfp = self._tfp(
            spark,
            [
                (1, "a x b x x c"),   # window a..c width 6, gaps 3
                (2, "c b a"),         # any order, gaps 0
                (3, "a x x x x x b x x c"),  # gaps 7
                (4, "a b"),           # missing c -> no match
            ],
        )
        got = {
            r.doc_id: r.min_gaps
            for r in intervals_all_of(tfp, ["a", "b", "c"], max_gaps=3).collect()
        }
        assert got == {1: 3, 2: 0}

    def test_ordered_requires_list_order(self, spark):
        from engine.search import intervals_all_of

        tfp = self._tfp(spark, [(1, "c b a"), (2, "a b c")])
        got = {
            r.doc_id: r.min_gaps
            for r in intervals_all_of(
                tfp, ["a", "b", "c"], max_gaps=0, ordered=True
            ).collect()
        }
        assert got == {2: 0}

    def test_two_term_unordered_matches_span_near(self, spark, sf_dir):
        from engine.corpus import tf_table, tokens, with_tokens
        from engine.io import read_fixture
        from engine.search import intervals_all_of, span_near_filter

        d = read_fixture(spark, sf_dir, "documents")
        tfp = tf_table(tokens(with_tokens(d)), with_positions=True)
        a = {
            (r.doc_id, r.min_gaps)
            for r in intervals_all_of(tfp, ["table", "scan"], max_gaps=3).collect()
        }
        b = {
            (r.doc_id, int(r.min_gap))
            for r in span_near_filter(tfp, "table", "scan", slop=3).collect()
        }
        assert a == b and a

    def test_k4_supported_k1_raises(self, spark):
        # round 4 lifted the k<=3 bound: k=4 runs the merged-list sweep
        from engine.search import intervals_all_of

        tfp = self._tfp(spark, [(1, "a b c d")])
        got = {
            (r["doc_id"], r["min_gaps"])
            for r in intervals_all_of(tfp, ["a", "b", "c", "d"]).collect()
        }
        assert got == {(1, 0)}
        import pytest as _pt

        with _pt.raises(ValueError):
            intervals_all_of(tfp, ["a"])


# --- rrf hybrid + span_not (round 3) ------------------------------------------


class TestRrf:
    def test_rrf_scores_and_order(self, spark):
        from engine.search import rrf_fuse

        r1 = spark.createDataFrame(
            [(1, 3.0), (2, 2.0), (3, 1.0)], "doc_id long, score double"
        )
        r2 = spark.createDataFrame(
            [(3, 0.9), (1, 0.8)], "doc_id long, score double"
        )
        rows = rrf_fuse([r1, r2], k=10, rank_constant=60).collect()
        got = {r.doc_id: r.rrf_score for r in rows}
        assert got[1] == round(1 / 61 + 1 / 62, 4)
        assert got[2] == round(1 / 62, 4)
        assert got[3] == round(1 / 63 + 1 / 61, 4)
        # doc 1 (rank 1 + rank 2) beats doc 3 (rank 3 + rank 1)
        assert [r.doc_id for r in rows][0] == 1

    def test_rrf_single_ranking_is_rank_identity(self, spark):
        from engine.search import rrf_fuse

        r1 = spark.createDataFrame(
            [(5, 9.0), (6, 8.0), (7, 7.0)], "doc_id long, score double"
        )
        rows = rrf_fuse([r1], k=2).collect()
        assert [r.doc_id for r in rows] == [5, 6]


class TestSpanNot:
    def _tfp(self, spark, rows):
        data = []
        for doc_id, text in rows:
            toks = text.split()
            seen = {}
            for i, t in enumerate(toks):
                seen.setdefault(t, []).append(i)
            for t, ps in seen.items():
                data.append((doc_id, t, len(ps), ps))
        return spark.createDataFrame(
            data, "doc_id long, term string, tf long, positions array<int>"
        )

    def test_excluded_window_drops_occurrence(self, spark):
        from engine.search import span_not_filter

        tfp = self._tfp(
            spark,
            [
                (1, "a x x x b"),   # b at distance 4 > post=2 -> a survives
                (2, "a x b"),      # b at distance 2 -> a excluded
                (3, "a y a x b"),  # first a survives (b at 4), second a excluded
                (4, "a"),          # no b at all -> survives
            ],
        )
        got = {
            r.doc_id: r.n_spans
            for r in span_not_filter(tfp, "a", "b", pre=2, post=2).collect()
        }
        assert got == {1: 1, 3: 1, 4: 1}

    def test_pre_only_window(self, spark):
        from engine.search import span_not_filter

        tfp = self._tfp(spark, [(1, "b x a"), (2, "a x b")])
        got = {
            r.doc_id: r.n_spans
            for r in span_not_filter(tfp, "a", "b", pre=2, post=0).collect()
        }
        assert got == {2: 1}


class TestSparseVector:
    def test_dot_product_scoring(self, spark):
        from engine.search import sparse_vector_topk

        tf = spark.createDataFrame(
            [(1, "a", 3), (1, "b", 1), (2, "a", 1), (2, "c", 5), (3, "d", 9)],
            "doc_id long, term string, tf long",
        )
        rows = sparse_vector_topk(tf, {"a": 2.0, "b": 0.5}, k=10).collect()
        got = {r.doc_id: r.score for r in rows}
        # doc 1: 3*2 + 1*0.5 = 6.5; doc 2: 1*2 = 2; doc 3: no query term
        assert got == {1: 6.5, 2: 2.0}
        assert [r.doc_id for r in rows] == [1, 2]


class TestSearchTemplate:
    def test_renders_params(self):
        from engine.querystring import render_search_template

        assert (
            render_search_template("{{a}} x {{ b }}", {"a": "p", "b": "q"})
            == "p x q"
        )

    def test_missing_param_raises(self):
        import pytest as _pt

        from engine.querystring import render_search_template

        with _pt.raises(KeyError):
            render_search_template("{{nope}}", {})


def test_intervals_duplicate_terms_rejected(spark):
    from engine.search import intervals_all_of

    tfp = spark.createDataFrame(
        [(1, "a", 1, [0])], "doc_id long, term string, tf long, positions array<int>"
    )
    import pytest as _pt

    with _pt.raises(ValueError):
        intervals_all_of(tfp, ["a", "a"])
    with _pt.raises(ValueError):
        intervals_all_of(tfp, ["a", "a", "b"])


class TestIntervalsProperty:
    def test_matches_brute_force_reference(self, spark):
        """Randomized (seeded) docs vs an O(n^3) python reference."""
        import itertools
        import random

        from engine.search import intervals_all_of

        rng = random.Random(13)
        vocab = ["a", "b", "c", "x", "y"]
        docs = [
            (i, [rng.choice(vocab) for _ in range(rng.randint(3, 20))])
            for i in range(60)
        ]
        data = []
        for doc_id, toks in docs:
            seen = {}
            for p, t in enumerate(toks):
                seen.setdefault(t, []).append(p)
            for t, ps in seen.items():
                data.append((doc_id, t, len(ps), ps))
        tfp = spark.createDataFrame(
            data, "doc_id long, term string, tf long, positions array<int>"
        )
        terms, max_gaps = ["a", "b", "c"], 2
        got = {
            r.doc_id: r.min_gaps
            for r in intervals_all_of(tfp, terms, max_gaps=max_gaps).collect()
        }
        want = {}
        for doc_id, toks in docs:
            pos = {t: [p for p, x in enumerate(toks) if x == t] for t in terms}
            if any(not pos[t] for t in terms):
                continue
            best = min(
                max(c) - min(c) - 2
                for c in itertools.product(*[pos[t] for t in terms])
            )
            if best <= max_gaps:
                want[doc_id] = best
        assert got == want and want  # non-vacuous


class TestRrfProperties:
    def test_input_order_invariant(self, spark):
        from engine.search import rrf_fuse

        r1 = spark.createDataFrame(
            [(1, 3.0), (2, 2.0)], "doc_id long, score double"
        )
        r2 = spark.createDataFrame(
            [(2, 0.9), (3, 0.8)], "doc_id long, score double"
        )
        a = sorted(map(tuple, rrf_fuse([r1, r2], k=10).collect()))
        b = sorted(map(tuple, rrf_fuse([r2, r1], k=10).collect()))
        assert a == b


class TestEqlSequence:
    def test_two_step_within_span(self, spark):
        from engine.eql import eql_sequence

        ev = spark.createDataFrame(
            [
                (1, 10, "2024-01-01 10:00:00", "view"),
                (1, 11, "2024-01-01 10:30:00", "purchase"),  # 1800s ok
                (1, 12, "2024-01-01 14:00:00", "purchase"),  # >2h from view
                (2, 20, "2024-01-01 09:00:00", "purchase"),  # no prior view
                (3, 30, "2024-01-01 09:00:00", "view"),
                (3, 31, "2024-01-01 09:10:00", "view"),      # latest view wins
                (3, 32, "2024-01-01 09:20:00", "purchase"),
            ],
            "user_id long, event_id long, ts string, event_type string",
        ).withColumn("ts", F.to_timestamp("ts"))
        got = {
            (r.user_id, r.event_id): r.gap_seconds
            for r in eql_sequence(
                ev, "user_id", "ts",
                F.col("event_type") == "view",
                F.col("event_type") == "purchase",
                maxspan_seconds=7200,
            ).collect()
        }
        assert got == {(1, 11): 1800, (3, 32): 600}

    def test_non_consuming_one_view_heads_many(self, spark):
        from engine.eql import eql_sequence

        ev = spark.createDataFrame(
            [
                (1, 1, "2024-01-01 10:00:00", "view"),
                (1, 2, "2024-01-01 10:01:00", "purchase"),
                (1, 3, "2024-01-01 10:02:00", "purchase"),
            ],
            "user_id long, event_id long, ts string, event_type string",
        ).withColumn("ts", F.to_timestamp("ts"))
        rows = eql_sequence(
            ev, "user_id", "ts",
            F.col("event_type") == "view",
            F.col("event_type") == "purchase",
            maxspan_seconds=600,
        ).collect()
        assert len(rows) == 2  # EQL default: step-1 not consumed

    def test_three_step_requires_full_chain(self, spark):
        from engine.eql import eql_sequence3

        ev = spark.createDataFrame(
            [
                # user 1: view -> click -> purchase, all within span
                (1, 1, "2024-01-01 10:00:00", "view"),
                (1, 2, "2024-01-01 10:10:00", "click"),
                (1, 3, "2024-01-01 10:20:00", "purchase"),
                # user 2: click -> purchase but NO prior view
                (2, 4, "2024-01-01 10:00:00", "click"),
                (2, 5, "2024-01-01 10:05:00", "purchase"),
                # user 3: view -> purchase, click missing
                (3, 6, "2024-01-01 10:00:00", "view"),
                (3, 7, "2024-01-01 10:05:00", "purchase"),
                # user 4: chain complete but step-2 gap exceeds span
                (4, 8, "2024-01-01 08:00:00", "view"),
                (4, 9, "2024-01-01 10:30:00", "click"),
                (4, 10, "2024-01-01 10:40:00", "purchase"),
            ],
            "user_id long, event_id long, ts string, event_type string",
        ).withColumn("ts", F.to_timestamp("ts"))
        got = {
            (r.user_id, r.event_id): r.gap_seconds
            for r in eql_sequence3(
                ev, "user_id", "ts",
                F.col("event_type") == "view",
                F.col("event_type") == "click",
                F.col("event_type") == "purchase",
                maxspan_seconds=3600,
            ).collect()
        }
        assert got == {(1, 3): 600}

    def test_until_expires_pending_state(self, spark):
        from engine.eql import eql_sequence

        ev = spark.createDataFrame(
            [
                (1, 1, "2024-01-01 10:00:00", "view"),
                (1, 2, "2024-01-01 10:05:00", "logout"),   # expires the view
                (1, 3, "2024-01-01 10:10:00", "purchase"),  # must NOT match
                (2, 4, "2024-01-01 10:00:00", "view"),
                (2, 5, "2024-01-01 10:10:00", "purchase"),  # matches
                # user 3: until BEFORE the view -> view still alive
                (3, 6, "2024-01-01 09:00:00", "logout"),
                (3, 7, "2024-01-01 10:00:00", "view"),
                (3, 8, "2024-01-01 10:10:00", "purchase"),
            ],
            "user_id long, event_id long, ts string, event_type string",
        ).withColumn("ts", F.to_timestamp("ts"))
        got = {
            (r.user_id, r.event_id)
            for r in eql_sequence(
                ev, "user_id", "ts",
                F.col("event_type") == "view",
                F.col("event_type") == "purchase",
                maxspan_seconds=3600,
                until=F.col("event_type") == "logout",
            ).collect()
        }
        assert got == {(2, 5), (3, 8)}


class TestSessionize:
    def test_gap_splits_sessions(self, spark):
        from engine.eql import sessionize

        ev = spark.createDataFrame(
            [
                (1, 1, "2024-01-01 10:00:00"),
                (1, 2, "2024-01-01 10:10:00"),   # same session (gap 10m)
                (1, 3, "2024-01-01 11:30:00"),   # new session (gap 80m)
                (2, 4, "2024-01-01 09:00:00"),   # other key independent
            ],
            "user_id long, event_id long, ts string",
        ).withColumn("ts", F.to_timestamp("ts"))
        got = {
            r.event_id: r.session_id
            for r in sessionize(ev, "user_id", "ts", gap_seconds=1800).collect()
        }
        assert got == {1: 0, 2: 0, 3: 1, 4: 0}

    def test_session_stats(self, spark):
        from engine.eql import session_stats

        ev = spark.createDataFrame(
            [
                (1, 1, "2024-01-01 10:00:00"),
                (1, 2, "2024-01-01 10:10:00"),
                (1, 3, "2024-01-01 11:30:00"),
            ],
            "user_id long, event_id long, ts string",
        ).withColumn("ts", F.to_timestamp("ts"))
        row = session_stats(ev, "user_id", "ts", gap_seconds=1800).collect()[0]
        assert row.n_sessions == 2
        assert row.avg_events == 1.5
        assert row.avg_duration_s == 300.0  # (600 + 0) / 2


class TestFunnelCohort:
    def test_funnel_counts_distinct_keys_in_order(self, spark):
        from engine.eql import funnel_conversion

        ev = spark.createDataFrame(
            [
                (1, 1, "2024-01-01 10:00:00", "view"),
                (1, 2, "2024-01-01 10:10:00", "click"),
                (1, 3, "2024-01-01 10:20:00", "purchase"),
                (2, 4, "2024-01-01 10:00:00", "view"),
                (2, 5, "2024-01-01 10:10:00", "click"),
                (3, 6, "2024-01-01 10:00:00", "view"),
                (4, 7, "2024-01-01 10:00:00", "click"),  # no view: not stage2
            ],
            "user_id long, event_id long, ts string, event_type string",
        ).withColumn("ts", F.to_timestamp("ts"))
        rows = funnel_conversion(
            ev, "user_id", "ts",
            [F.col("event_type") == "view",
             F.col("event_type") == "click",
             F.col("event_type") == "purchase"],
            maxspan_seconds=3600,
        ).collect()
        got = {r.step: (r.n_keys, r.conversion) for r in rows}
        assert got == {1: (3, 1.0), 2: (2, 0.6667), 3: (1, 0.5)}

    def test_cohort_retention_ages(self, spark):
        from engine.eql import cohort_retention

        # user 1 first active week of Jan 1 (Mon), returns 2 weeks later;
        # user 2 first active week of Jan 8
        ev = spark.createDataFrame(
            [
                (1, 1, "2024-01-02 10:00:00"),
                (1, 2, "2024-01-16 10:00:00"),
                (2, 3, "2024-01-09 10:00:00"),
            ],
            "user_id long, event_id long, ts string",
        ).withColumn("ts", F.to_timestamp("ts"))
        rows = cohort_retention(ev, "user_id", "ts", unit="week").collect()
        got = {(r.cohort.day, r.age): r.n_keys for r in rows}
        assert got == {(1, 0): 1, (1, 2): 1, (8, 0): 1}

    def test_until_same_timestamp_as_later_step1_does_not_expire(self, spark):
        from engine.eql import eql_sequence

        # until and view share ts 10:00; id order puts until BEFORE the
        # view, so per (ts, id) ordering the view is still alive
        ev = spark.createDataFrame(
            [
                (1, 1, "2024-01-01 10:00:00", "logout"),
                (1, 2, "2024-01-01 10:00:00", "view"),
                (1, 3, "2024-01-01 10:05:00", "purchase"),
            ],
            "user_id long, event_id long, ts string, event_type string",
        ).withColumn("ts", F.to_timestamp("ts"))
        got = {
            r.event_id
            for r in eql_sequence(
                ev, "user_id", "ts",
                F.col("event_type") == "view",
                F.col("event_type") == "purchase",
                maxspan_seconds=3600,
                until=F.col("event_type") == "logout",
            ).collect()
        }
        assert got == {3}

    def test_three_step_maxspan_bounds_whole_sequence(self, spark):
        from engine.eql import eql_sequence3

        # each hop within 50 min but first-to-last spans 80 min > 1h
        ev = spark.createDataFrame(
            [
                (1, 1, "2024-01-01 10:00:00", "view"),
                (1, 2, "2024-01-01 10:40:00", "click"),
                (1, 3, "2024-01-01 11:20:00", "purchase"),
                # user 2: whole chain within the hour
                (2, 4, "2024-01-01 10:00:00", "view"),
                (2, 5, "2024-01-01 10:20:00", "click"),
                (2, 6, "2024-01-01 10:40:00", "purchase"),
            ],
            "user_id long, event_id long, ts string, event_type string",
        ).withColumn("ts", F.to_timestamp("ts"))
        got = {
            r.user_id
            for r in eql_sequence3(
                ev, "user_id", "ts",
                F.col("event_type") == "view",
                F.col("event_type") == "click",
                F.col("event_type") == "purchase",
                maxspan_seconds=3600,
            ).collect()
        }
        assert got == {2}
