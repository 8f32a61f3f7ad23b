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
