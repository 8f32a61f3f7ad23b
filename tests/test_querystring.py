"""simple_query_string parser/compiler unit tests — grammar shapes the
one-config driver-contract queries can't reach (precedence, default_operator,
pure-negative rejection, analyzer interaction, end-to-end vs a hand-built
tree)."""

import pytest

from engine.boolquery import Bool, DocSet, Term, tree_search
from engine.querystring import (
    _Compiler,
    parse_simple_query_string,
    qs_search,
)


def _compile(q, default_operator="or", expand=lambda p: [p + "x", p + "y"]):
    ast = parse_simple_query_string(q, default_operator)
    comp = _Compiler(expand, default_operator)
    return comp.compile(ast), comp


class TestGrammar:
    def test_plus_binds_tighter_than_pipe(self):
        tree, _ = _compile("a + b | c")
        assert tree == Bool(
            should=(Bool(must=(Term("a"), Term("b"))), Term("c")),
            min_should=1,
        )

    def test_juxtaposition_is_default_or(self):
        tree, _ = _compile("a b")
        assert tree == Bool(should=(Term("a"), Term("b")), min_should=1)

    def test_juxtaposition_default_and(self):
        tree, _ = _compile("a b", default_operator="and")
        assert tree == Bool(must=(Term("a"), Term("b")), must_not=())

    def test_negation_attaches_to_group(self):
        tree, _ = _compile("a -b")
        assert tree == Bool(should=(Term("a"),), must_not=(Term("b"),),
                            min_should=1)

    def test_negation_inside_and_group(self):
        tree, _ = _compile("(a + -b) | c")
        assert tree == Bool(
            should=(Bool(must=(Term("a"),), must_not=(Term("b"),)), Term("c")),
            min_should=1,
        )

    def test_phrase_compiles_to_must_plus_docset(self):
        tree, comp = _compile('"a b"')
        assert isinstance(tree, Bool)
        assert tree.must == (Term("a"), Term("b"))
        assert isinstance(tree.filter[0], DocSet)
        assert comp.phrases[tree.filter[0].name] == ["a", "b"]

    def test_single_token_phrase_is_plain_term(self):
        tree, comp = _compile('"a"')
        assert tree == Term("a")
        assert comp.phrases == {}

    def test_prefix_expands_to_disjunction(self):
        tree, _ = _compile("pre*")
        assert tree == Bool(should=(Term("prex"), Term("prey")), min_should=1)

    def test_prefix_single_expansion_is_term(self):
        tree, _ = _compile("pre*", expand=lambda p: [p + "x"])
        assert tree == Term("prex")

    def test_pure_negative_rejected(self):
        with pytest.raises(ValueError):
            _compile("-a")

    def test_empty_rejected(self):
        with pytest.raises(ValueError):
            parse_simple_query_string("   ")

    def test_pure_negative_subgroup_keeps_every_exclusion(self):
        # '(-a -b) + c' must exclude docs matching a OR b — a regression
        # here silently dropped '-b'
        tree, _ = _compile("(-a -b) + c")
        assert tree == Bool(
            must=(Term("c"),),
            must_not=(Bool(should=(Term("a"), Term("b")), min_should=1),),
        )

    def test_pure_negative_single_subgroup_unwrapped(self):
        tree, _ = _compile("(-a) + c")
        assert tree == Bool(must=(Term("c"),), must_not=(Term("a"),))

    def test_double_negation_cancels(self):
        tree, _ = _compile("a --b")
        assert tree == Bool(should=(Term("a"), Term("b")), min_should=1)

    def test_lone_double_negation_is_positive(self):
        tree, _ = _compile("--b")
        assert tree == Term("b")

    def test_unbalanced_paren_rejected(self):
        with pytest.raises(ValueError):
            _compile("(a + b")

    def test_nested_groups(self):
        tree, _ = _compile("((a | b) + c)")
        assert tree == Bool(
            must=(Bool(should=(Term("a"), Term("b")), min_should=1), Term("c")),
            must_not=(),
        )


class TestEndToEnd:
    def _corpus(self, spark):
        docs = [
            (1, "fast table scan join"),
            (2, "sort merge join table"),
            (3, "sort merge only here"),
            (4, "table join dup dup"),
            (5, "merge sort reversed order"),
        ]
        tf_rows, pos_rows = [], []
        for doc_id, text in docs:
            toks = text.split()
            dl = len(toks)
            seen = {}
            for i, t in enumerate(toks):
                seen.setdefault(t, []).append(i)
            for t, ps in seen.items():
                tf_rows.append((t, doc_id, len(ps), dl))
                pos_rows.append((doc_id, t, len(ps), ps))
        tf = spark.createDataFrame(
            tf_rows, "term string, doc_id long, tf long, dl long"
        )
        tfp = spark.createDataFrame(
            pos_rows, "doc_id long, term string, tf long, positions array<int>"
        )
        ds = tf.select("doc_id", "dl").distinct()
        from engine.corpus import term_stats

        return tf, ds, term_stats(tf), len(docs), sum(
            len(t.split()) for _, t in docs
        ) / len(docs), tfp

    def test_matches_hand_built_tree(self, spark):
        tf, ds, ts, n, avgdl, tfp = self._corpus(spark)
        got = qs_search(
            tf, ds, ts, n, avgdl, "(table + join) -dup", k=10
        ).collect()
        want = tree_search(
            tf, ds, ts, n, avgdl,
            Bool(must=(Term("table"), Term("join")), must_not=(Term("dup"),)),
            k=10,
        ).collect()
        assert [(r.doc_id, r.score) for r in got] == [
            (r.doc_id, r.score) for r in want
        ]
        assert {r.doc_id for r in got} == {1, 2}  # 4 has dup

    def test_phrase_requires_adjacency_in_order(self, spark):
        tf, ds, ts, n, avgdl, tfp = self._corpus(spark)
        got = qs_search(
            tf, ds, ts, n, avgdl, '"sort merge"', tf_positions=tfp, k=10
        ).collect()
        # doc 5 has merge sort (reversed) — excluded; 2 and 3 adjacent
        assert {r.doc_id for r in got} == {2, 3}

    def test_phrase_without_positions_raises(self, spark):
        tf, ds, ts, n, avgdl, _ = self._corpus(spark)
        with pytest.raises(ValueError):
            qs_search(tf, ds, ts, n, avgdl, '"sort merge"', k=10)


# --- full query_string grammar (D44) ----------------------------------------

from engine.boolquery import Boost, eval_tree
from engine.querystring import _QSCompiler, full_qs_search, parse_query_string


def _compile_qs(q, default_operator="or", expand=lambda p: [p + "x", p + "y"]):
    ast = parse_query_string(q, default_operator)
    comp = _QSCompiler(expand, default_operator)
    return comp.compile(ast), comp


class TestQueryStringGrammar:
    def test_keywords_and_precedence(self):
        tree, _ = _compile_qs("a AND b OR c")
        assert tree == Bool(
            should=(Bool(must=(Term("a"), Term("b")), must_not=()), Term("c")),
            min_should=1,
        )

    def test_not_keyword_and_bang(self):
        for q in ("a NOT b", "a !b", "a -b"):
            tree, _ = _compile_qs(q)
            assert tree == Bool(
                should=(Term("a"),), must_not=(Term("b"),), min_should=1
            ), q

    def test_lowercase_and_is_a_term(self):
        tree, _ = _compile_qs("a and b")
        assert tree == Bool(
            should=(Term("a"), Term("and"), Term("b")), min_should=1
        )

    def test_field_term_becomes_docset(self):
        tree, comp = _compile_qs("lang:en AND b")
        assert isinstance(tree.must[0], DocSet)
        assert comp.fields[tree.must[0].name] == ("lang", "en")

    def test_text_field_prefix_is_plain_word(self):
        tree, comp = _compile_qs("text:merge")
        assert tree == Term("merge")
        assert comp.fields == {}

    def test_term_boost(self):
        tree, _ = _compile_qs("merge^2")
        assert tree == Boost(Term("merge"), 2.0)
        assert eval_tree(tree, {"merge": True}, {"merge": 1.5}) == (True, 3.0)

    def test_group_boost(self):
        tree, _ = _compile_qs("(a AND b)^2 OR c")
        assert tree == Bool(
            should=(Boost(Bool(must=(Term("a"), Term("b")), must_not=()), 2.0),
                    Term("c")),
            min_should=1,
        )

    def test_phrase_slop_and_boost(self):
        tree, comp = _compile_qs('"a b"~2^3')
        assert isinstance(tree, Boost) and tree.factor == 3.0
        name = tree.node.filter[0].name
        assert comp.phrases[name] == ["a", "b"] and comp.slop[name] == 2

    def test_plus_marks_must_in_or_group(self):
        tree, _ = _compile_qs("+table join -dup")
        assert tree == Bool(
            must=(Term("table"),),
            should=(Term("join"),),
            must_not=(Term("dup"),),
            min_should=0,
        )

    def test_hyphenated_word_is_one_token_stream(self):
        # leading '-' negates; an interior '-' stays in the word and the
        # analyzer decides (covid-19 -> ['covid', '19'] under UAX#29)
        tree, _ = _compile_qs("covid-19", default_operator="and")
        assert tree == Bool(must=(Term("covid"), Term("19")))

    def test_pure_negative_rejected(self):
        with pytest.raises(ValueError):
            _compile_qs("NOT a")

    def test_unbalanced_paren_rejected(self):
        with pytest.raises(ValueError):
            _compile_qs("(a AND b")


class TestQueryStringEndToEnd(TestEndToEnd):
    def _docs_meta(self, spark):
        return spark.createDataFrame(
            [(1, "en"), (2, "en"), (3, "de"), (4, "en"), (5, "en")],
            "doc_id long, lang string",
        )

    def test_field_filter_restricts_matches(self, spark):
        tf, ds, ts, n, avgdl, tfp = self._corpus(spark)
        got = full_qs_search(
            tf, ds, ts, n, avgdl, 'lang:en AND "sort merge"',
            docs=self._docs_meta(spark), tf_positions=tfp, k=10,
        ).collect()
        assert {r.doc_id for r in got} == {2}  # 3 matches the phrase but is de

    def test_boost_scales_score_only(self, spark):
        tf, ds, ts, n, avgdl, tfp = self._corpus(spark)
        plain = full_qs_search(tf, ds, ts, n, avgdl, "merge", k=10).collect()
        boosted = full_qs_search(tf, ds, ts, n, avgdl, "merge^2", k=10).collect()
        assert {r.doc_id for r in plain} == {r.doc_id for r in boosted}
        p = {r.doc_id: r.score for r in plain}
        for r in boosted:
            assert r.score == pytest.approx(2 * p[r.doc_id], abs=2e-4)

    def test_slop_phrase_matches_reversed_within_gap(self, spark):
        tf, ds, ts, n, avgdl, tfp = self._corpus(spark)
        strict = full_qs_search(
            tf, ds, ts, n, avgdl, '"merge join"', tf_positions=tfp, k=10
        ).collect()
        sloppy = full_qs_search(
            tf, ds, ts, n, avgdl, '"merge join"~1', tf_positions=tfp, k=10
        ).collect()
        # doc 2: 'sort merge join table' strict-adjacent; slop=1 also admits
        # one-gap ordered matches (none here beyond doc 2's)
        assert {r.doc_id for r in strict} == {2}
        assert {r.doc_id for r in sloppy} >= {2}

    def test_field_filter_without_docs_raises(self, spark):
        tf, ds, ts, n, avgdl, _ = self._corpus(spark)
        with pytest.raises(ValueError):
            full_qs_search(tf, ds, ts, n, avgdl, "lang:en AND merge", k=10)


class TestReviewFixes:
    """Round-3 review findings: filter-only queries, fielded phrases,
    unspaced operators, bare field:."""

    def _corpus2(self, spark):
        # reuse the shared corpus builder from TestEndToEnd
        t = TestQueryStringEndToEnd()
        return t._corpus(spark), t._docs_meta(spark)

    def test_filter_only_query_returns_matches(self, spark):
        (tf, ds, ts, n, avgdl, _), meta = self._corpus2(spark)
        got = full_qs_search(
            tf, ds, ts, n, avgdl, "lang:en", docs=meta, k=10
        ).collect()
        assert {r.doc_id for r in got} == {1, 2, 4, 5}
        assert all(r.score == 0.0 for r in got)  # filter context

    def test_filter_only_conjunction(self, spark):
        (tf, ds, ts, n, avgdl, _), meta = self._corpus2(spark)
        got = full_qs_search(
            tf, ds, ts, n, avgdl, "lang:en AND NOT lang:de", docs=meta, k=10
        ).collect()
        assert {r.doc_id for r in got} == {1, 2, 4, 5}

    def test_fielded_phrase_on_text_field(self, spark):
        (tf, ds, ts, n, avgdl, tfp), meta = self._corpus2(spark)
        fielded = full_qs_search(
            tf, ds, ts, n, avgdl, 'text:"sort merge"',
            docs=meta, tf_positions=tfp, k=10,
        ).collect()
        plain = full_qs_search(
            tf, ds, ts, n, avgdl, '"sort merge"', tf_positions=tfp, k=10
        ).collect()
        assert {(r.doc_id, r.score) for r in fielded} == {
            (r.doc_id, r.score) for r in plain
        }

    def test_fielded_phrase_on_metadata_field_raises(self, spark):
        (tf, ds, ts, n, avgdl, tfp), meta = self._corpus2(spark)
        with pytest.raises(ValueError):
            full_qs_search(
                tf, ds, ts, n, avgdl, 'lang:"en gb"',
                docs=meta, tf_positions=tfp, k=10,
            )

    def test_unspaced_operators_lex_as_operators(self):
        from engine.querystring import _lex_qs

        kinds = [k for k, _ in _lex_qs("x||y&&z")]
        assert kinds == ["word", "orop", "word", "andop", "word"]
        # a!b: ! binds as NOT on the following atom
        kinds2 = [k for k, _ in _lex_qs("a!b")]
        assert kinds2 == ["word", "notop", "word"]

    def test_bare_field_colon_raises(self):
        with pytest.raises(ValueError):
            parse_query_string("title:")


class TestReviewFixes2:
    def test_fielded_prefix_keeps_expansion(self, spark):
        t = TestQueryStringEndToEnd()
        tf, ds, ts, n, avgdl, tfp = t._corpus(spark)
        fielded = full_qs_search(tf, ds, ts, n, avgdl, "text:mer*", k=10).collect()
        bare = full_qs_search(tf, ds, ts, n, avgdl, "mer*", k=10).collect()
        assert {(r.doc_id, r.score) for r in fielded} == {
            (r.doc_id, r.score) for r in bare
        } and fielded

    def test_single_ampersand_and_pipe_stay_term_chars(self):
        from engine.querystring import _lex_qs

        assert [k for k, _ in _lex_qs("AT&T")] == ["word"]
        assert _lex_qs("AT&T")[0][1] == "AT&T"
        assert [k for k, _ in _lex_qs("a|b")] == ["word"]
        # doubled forms still operators
        assert [k for k, _ in _lex_qs("a&&b")] == ["word", "andop", "word"]

    def test_dangling_operator_clear_error(self):
        with pytest.raises(ValueError, match="dangling operator"):
            parse_query_string("wow AND")


class TestReviewFixes3:
    def test_leading_single_amp_or_pipe_is_term_char(self):
        from engine.querystring import _lex_qs

        assert [t for _, t in _lex_qs("&T x")] == ["&T", "x"]
        assert [t for _, t in _lex_qs("|x")] == ["|x"]
        assert [k for k, _ in _lex_qs("&&x")] == ["andop", "word"]

    def test_metadata_trailing_star_is_prefix_filter(self, spark):
        t = TestQueryStringEndToEnd()
        tf, ds, ts, n, avgdl, tfp = t._corpus(spark)
        meta = spark.createDataFrame(
            [(1, "web-a"), (2, "web-b"), (3, "mail"), (4, "web-a"), (5, "mail")],
            "doc_id long, source string",
        )
        got = full_qs_search(
            tf, ds, ts, n, avgdl, "source:web*", docs=meta, k=10
        ).collect()
        assert {r.doc_id for r in got} == {1, 2, 4}
