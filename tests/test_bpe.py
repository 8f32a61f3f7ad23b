"""Pinned-merges BPE encoder (VERDICT r03 #6): the trained merges table is
pinned as a literal (any drift in the trainer or seed corpus fails loudly),
the encoder matches a from-first-principles re-derivation, and packing with
BPE counts is invariant to the bucketing/parallelism knobs."""

from pyspark.sql import functions as F

from engine.bpe import (
    MERGES,
    SEED_CORPUS,
    bpe_count_udf,
    bpe_encode,
    bpe_token_count,
    bpe_word_tokens,
    train_bpe,
)
from engine.io import read_fixture
from engine.pack import pack_documents

# the full trained table, pinned: engine output is a pure function of this
PINNED_MERGES = [
    ("t", "h"), ("e", "r"), ("i", "n"), ("th", "e"), ("a", "n"), ("an", "d"),
    ("a", "t"), ("t", "er"), ("in", "g"), ("o", "r"), ("e", "a"),
    ("th", "at"), ("l", "u"), ("s", "t"), ("i", "th"), ("l", "e"),
    ("w", "ith"), ("in", "d"), ("st", "r"), ("c", "h"), ("i", "s"),
    ("th", "is"), ("d", "er"), ("a", "b"), ("ab", "le"), ("i", "l"),
    ("t", "able"), ("ea", "m"), ("g", "e"), ("ind", "o"), ("indo", "w"),
    ("n", "ing"), ("str", "eam"), ("w", "indow"), ("a", "lu"), ("alu", "e"),
    ("c", "o"), ("f", "il"), ("fil", "ter"), ("v", "alue"), ("at", "ch"),
    ("b", "atch"), ("er", "y"), ("or", "der"), ("q", "u"), ("qu", "ery"),
    ("s", "h"), ("t", "i"),
]


def test_merges_table_is_pinned():
    assert MERGES == PINNED_MERGES
    assert train_bpe(SEED_CORPUS, 48) == PINNED_MERGES


def test_encoder_basics():
    assert bpe_encode("table") == ["table"]
    assert bpe_encode("tables") == ["table", "s"]
    assert bpe_encode("querying") == ["query", "ing"]
    assert bpe_encode("xyzzy") == ["x", "y", "z", "z", "y"]
    assert bpe_encode("a") == ["a"]
    assert bpe_encode("") == []
    # concatenation identity: symbols reassemble the word exactly
    for w in ("scanning", "partition", "the", "windowing", "zqzqzq"):
        assert "".join(bpe_encode(w)) == w
    assert bpe_token_count("the window stream") == 3
    assert bpe_token_count("") == 0


def test_lowest_rank_first():
    """'ther' → (t,h) rank 0 first: [th, e, r]; then (e,r) rank 1 beats
    (th,e) rank 3: [th, er] — NOT the left-greedy ['the', 'r']."""
    assert bpe_encode("ther") == ["th", "er"]


def test_merge_all_occurrences_leftmost_first():
    # (t,h) merges everywhere in one step: both 'th' in 'thth'
    assert bpe_encode("thth") == ["th", "th"]


def test_udf_matches_python(spark):
    texts = [
        (0, "the window stream scanning fast"),
        (1, "tables queries merging"),
        (2, ""),
        (3, "xyzzy plugh"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", bpe_count_udf("text").alias("n")).collect()
    }
    assert got == {i: bpe_token_count(t) for i, t in texts}


def test_pack_bpe_straddle_invariance(spark, sf_dir):
    """Packing output (and therefore the straddling-doc set) must be a pure
    function of the corpus + seq_len — identical under fixed-width buckets,
    range buckets, and a degenerate 1-row bucket width."""
    docs = read_fixture(spark, sf_dir, "documents")
    n = docs.count()
    base = sorted(
        map(tuple, pack_documents(docs, 64, token_counter="bpe").collect())
    )
    alt1 = sorted(
        map(
            tuple,
            pack_documents(docs, 64, token_counter="bpe", n_docs=n).collect(),
        )
    )
    alt2 = sorted(
        map(
            tuple,
            pack_documents(
                docs, 64, token_counter="bpe", bucket_width=7
            ).collect(),
        )
    )
    assert base == alt1 == alt2 and base
    straddlers = [r for r in base if r[3] != r[4]]
    assert straddlers, "BPE counts at seq_len=64 must produce straddles"
    # spans tile the token stream: next tok_start = tok_start + n_tokens
    for (d1, n1, s1, _, _), (d2, _, s2, _, _) in zip(base, base[1:]):
        assert d2 == d1 + 1 and s2 == s1 + n1


def test_pack_counter_validation(spark, sf_dir):
    import pytest

    docs = read_fixture(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="whitespace|bpe"):
        pack_documents(docs, 64, token_counter="gpt4")


def test_sql_replay_matches_encoder():
    """The DuckDB recursive-CTE replay (what pack_sequences_bpe's oracle
    uses) produces the same per-word token count as the Python encoder on a
    fuzzed vocabulary."""
    import random

    import duckdb

    from engine.bpe import SQL_SYM_DELIM, bpe_apply_case_sql

    rng = random.Random(7)
    # incl. the review counterexamples that exposed the boundary bug in the
    # terminator-only encoding: 'stir'/'sti' (pattern inside 'st'), runs of
    # one letter ('aaaa') where the shared boundary was consumed — and a
    # word containing the OLD ';' delimiter, which broke the symbol-count
    # formula before the control-char delimiter (ADVICE r04)
    words = {"table", "tables", "the", "querying", "scanning", "windowing",
             "stir", "sti", "aaaa", "aaa", "thth", "ther", "a;;b", "x;y"}
    alpha = "abcdefghijklmnopqrstuvwxyz"
    while len(words) < 60:
        words.add("".join(rng.choice(alpha) for _ in range(rng.randint(1, 12))))
    case = bpe_apply_case_sql("state")
    d = SQL_SYM_DELIM
    vals = ", ".join(f"('{w}')" for w in sorted(words))
    sql = f"""
WITH RECURSIVE init AS (
  SELECT w, regexp_replace(w, '(.)', '{d}\\1{d}', 'g') AS state
  FROM (VALUES {vals}) AS v(w)),
enc AS (
  SELECT w, state FROM init
  UNION ALL
  SELECT w, {case} FROM enc WHERE ({case}) <> state)
SELECT w, CAST(min(length(state) - length(replace(state, '{d}', ''))) / 2 AS BIGINT)
FROM enc GROUP BY w"""
    got = dict(duckdb.connect().execute(sql).fetchall())
    assert got == {w: bpe_word_tokens(w) for w in words}
