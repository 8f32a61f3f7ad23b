"""Round-5 features: linear hybrid retriever (VERDICT r04 #9) and
index-time synonym contraction (VERDICT r04 #10)."""

import pytest
from pyspark.sql import functions as F

from engine.corpus import corpus_base, with_tokens
from engine.search import linear_fuse
from engine.tokenizer import SYNONYM_FOLD, analyze


# --- linear hybrid retriever --------------------------------------------------


def _ranking(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, score double")


def test_linear_fuse_minmax_weighted_sum(spark):
    a = _ranking(spark, [(1, 10.0), (2, 5.0), (3, 0.0)])
    b = _ranking(spark, [(2, 2.0), (4, 1.0)])
    got = {
        r["doc_id"]: r["linear_score"]
        for r in linear_fuse([a, b], [0.7, 0.3], k=10).collect()
    }
    # a: minmax over {10,5,0} → 1.0 / 0.5 / 0.0; b: over {2,1} → 1.0 / 0.0
    assert got == {
        1: 0.7,            # 0.7*1.0
        2: 0.65,           # 0.7*0.5 + 0.3*1.0
        4: 0.0,            # 0.3*0.0
        3: 0.0,            # 0.7*0.0
    }


def test_linear_fuse_single_score_window_normalizes_to_one(spark):
    a = _ranking(spark, [(1, 3.0), (2, 3.0)])
    got = {
        r["doc_id"]: r["linear_score"]
        for r in linear_fuse([a], [0.5], k=10).collect()
    }
    assert got == {1: 0.5, 2: 0.5}


def test_linear_fuse_none_normalizer_and_validation(spark):
    a = _ranking(spark, [(1, 2.0)])
    got = linear_fuse([a], [2.0], normalizer="none").collect()
    assert got[0]["linear_score"] == 4.0
    with pytest.raises(ValueError, match="one weight"):
        linear_fuse([a], [1.0, 2.0])
    with pytest.raises(ValueError, match="normalizer"):
        linear_fuse([a], [1.0], normalizer="l3")


def test_linear_fuse_ranks_differently_from_rrf(spark, sf_dir):
    """Non-vacuity: on the fixture hybrid query the linear fusion's scores
    are not a monotone transform of RRF's (different operator, not an
    alias)."""
    from engine.registry import _QUERIES

    lin = _QUERIES["search_linear_hybrid"](spark, sf_dir).collect()
    rrf = _QUERIES["search_rrf_hybrid"](spark, sf_dir).collect()
    assert len(lin) == len(rrf) == 10
    assert [r["doc_id"] for r in lin] != [r["doc_id"] for r in rrf] or [
        round(r["linear_score"], 4) for r in lin
    ] != [round(r["rrf_score"], 4) for r in rrf]


# --- index-time synonym contraction -------------------------------------------

SYN_DOCS = [
    (0, "the quick merge of tables"),
    (1, "a fast join across streams"),
    (2, "join join join"),
    (3, "nothing relevant here"),
]


def test_analyze_synonyms_folds():
    assert analyze("quick join fast merge", "synonyms") == [
        "fast", "merge", "fast", "merge"
    ]
    assert SYNONYM_FOLD == {"quick": "fast", "join": "merge"}


def test_column_and_udf_fold_match_python(spark):
    docs = spark.createDataFrame(SYN_DOCS, "doc_id long, text string")
    col_toks = {
        r["doc_id"]: r["toks"]
        for r in with_tokens(docs, analyzer="synonyms").collect()
    }
    for doc_id, text in SYN_DOCS:
        assert col_toks[doc_id] == analyze(text, "synonyms"), text
    from collections import Counter

    for r in corpus_base(docs, analyzer="synonyms").collect():
        want = Counter(analyze(dict(SYN_DOCS)[r["doc_id"]], "synonyms"))
        assert dict(zip(r["terms"], r["tfs"])) == dict(want)


def test_index_time_df_is_union_of_set_members(spark):
    """After folding, 'merge' has the COMBINED df of merge+join and 'join'
    disappears from the dictionary — the one-posting-list-per-set
    contraction semantics."""
    from engine.corpus import exploded_tf, term_stats

    docs = spark.createDataFrame(SYN_DOCS, "doc_id long, text string")
    ts = {
        r["term"]: (r["df"], r["cf"])
        for r in term_stats(
            exploded_tf(corpus_base(docs, analyzer="synonyms"))
        ).collect()
    }
    assert "join" not in ts and "quick" not in ts
    assert ts["merge"] == (3, 5)  # docs 0,1,2; cf 1+1+3
    assert ts["fast"] == (2, 2)   # docs 0 (quick) and 1 (fast)


def test_synonym_index_manifest_guard(spark, tmp_path):
    from engine.index import build_index
    from engine.searcher import LoadedIndex

    docs = spark.createDataFrame(SYN_DOCS * 6, "doc_id long, text string")
    docs = docs.withColumn(
        "doc_id", F.monotonically_increasing_id() % 24
    ).dropDuplicates(["doc_id"])
    root = str(tmp_path / "syn_idx")
    mf = build_index(spark, docs, root, n_buckets=2, docs_per_shard=16,
                     block_size=8, analyzer="synonyms")
    assert mf.analyzer == "synonyms"
    idx = LoadedIndex(spark, root)
    # 'quick' query matches docs that only contain 'fast' — folded at both ends
    hits = idx.search("quick", k=10, algo="exhaustive").collect()
    assert hits
    with pytest.raises(ValueError, match="analyzer"):
        idx.search("quick", k=5, analyzer="standard")


def test_index_time_ranking_differs_from_query_time(spark, sf_dir):
    """The pinned divergence the operator exists for: index-time contraction
    gives the set ONE df/idf; query-time expansion sums per-member scores.
    Same fixture, same raw query — different score lists."""
    from engine.registry import _QUERIES

    idx_time = [
        (r["doc_id"], r["score"])
        for r in _QUERIES["bm25_synonym_index"](spark, sf_dir).collect()
    ]
    q_time = [
        (r["doc_id"], r["score"])
        for r in _QUERIES["bm25_synonym"](spark, sf_dir).collect()
    ]
    assert idx_time and q_time
    assert idx_time != q_time


# --- substring-level (span) dedup ----------------------------------------------


def _sd(spark, rows, k):
    from engine.textops import span_dedup

    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: (r["text"], r["n_kept"], r["n_removed"])
        for r in span_dedup(df, k=k).collect()
    }


def test_span_dedup_first_occurrence_wins(spark):
    span = "a b c d e"  # k=5 span shared by docs 0 and 2
    rows = [
        (0, f"x y {span} z w"),
        (1, "p q r s t u v"),
        (2, f"m n {span} o"),
    ]
    got = _sd(spark, rows, k=5)
    assert got[0] == (rows[0][1], 9, 0)        # first occurrence kept intact
    assert got[1] == (rows[1][1], 7, 0)        # untouched
    assert got[2] == ("m n o", 3, 5)           # later occurrence cut


def test_span_dedup_exact_duplicate_doc_empties(spark):
    text = "one two three four five six"
    got = _sd(spark, [(0, text), (1, text)], k=6)
    assert got[0] == (text, 6, 0)
    assert got[1] == ("", 0, 6)


def test_span_dedup_overlapping_spans_merge(spark):
    # doc 1 repeats an 8-token run of doc 0: every k=5 window inside it is a
    # duplicate; the marks union into one 8-token cut
    run = "a b c d e f g h"
    got = _sd(spark, [(0, f"{run} tail0"), (1, f"head1 {run}")], k=5)
    assert got[1] == ("head1", 1, 8)


def test_span_dedup_within_doc_repeat(spark):
    # the same span twice INSIDE one doc: second occurrence cut
    got = _sd(spark, [(0, "a b c d a b c d")], k=4)
    assert got[0] == ("a b c d", 4, 4)


def test_span_dedup_short_docs_pass_through(spark):
    got = _sd(spark, [(0, "a b c"), (1, "a b c")], k=5)
    assert got[0] == ("a b c", 3, 0) and got[1] == ("a b c", 3, 0)


def test_span_dedup_idempotent_on_fixture(spark, sf_dir):
    """Second pass over the deduped corpus removes nothing (every surviving
    span occurrence is the globally-first of its class, and the fixture's
    splice points create no new repeated 10-grams)."""
    from engine.io import read_fixture
    from engine.textops import span_dedup

    docs = read_fixture(spark, sf_dir, "documents").select("doc_id", "text")
    once = span_dedup(docs, k=10).select("doc_id", "text")
    twice = span_dedup(once.filter(F.length("text") > 0), k=10)
    assert twice.filter(F.col("n_removed") > 0).count() == 0


def test_pipeline_optional_span_stage(spark, sf_dir, tmp_path):
    from engine.io import read_fixture
    from engine.pipeline import prepare_training_data

    docs = read_fixture(spark, sf_dir, "documents")
    out, cp = prepare_training_data(
        spark, docs, str(tmp_path / "p1"), "t-span", span_dedup_k=10,
        stop_after="span_dedup",
    )
    n_with = out.count()
    base, _ = prepare_training_data(
        spark, docs, str(tmp_path / "p2"), "t-span", stop_after="line_dedup",
    )
    assert 0 < n_with <= base.count()
    # disabled by default: stop_after validation catches the k=None combo
    with pytest.raises(ValueError, match="span_dedup_k"):
        prepare_training_data(
            spark, docs, str(tmp_path / "p3"), "t", stop_after="span_dedup"
        )
