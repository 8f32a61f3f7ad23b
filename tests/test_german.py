"""German analyzer option (VERDICT r04 "What's missing" #2 follow-through):
pinned Snowball-subset stop set + minimal German stemmer in the mold of
Lucene's GermanMinimalStemFilter [public: Lucene analysis/de; Savoy,
"Morphologie et recherche d'information"] — umlaut fold + single plural
marker strip, deliberately the SQL-expressible minimal chain so the DuckDB
twin can replay it exactly.

Pins: (1) the pure-Python stemmer rule-for-rule against the pinned rule set,
(2) the Catalyst column chain (german_tokens_expr) and the fused Arrow
counting UDF against the Python reference, (3) the DuckDB stacked-CTE replay
the bm25_german oracle uses, over a fuzzed vocabulary."""

from pyspark.sql import functions as F  # noqa: F401

from engine.corpus import corpus_base, with_tokens
from engine.tokenizer import (
    GERMAN_STOPWORDS,
    analyze,
    german_minimal_stem,
)

DE_DOCS = [
    (0, "die frauen scannen und joinen alle tabellen"),
    (1, "der schnelle filter sortiert die spalten"),
    (2, "wir filtern spärk streams ohne fenster"),
    (3, "lehrerinnen lesen bücher über häuser"),
    (4, "kein umlaut hier nur klare worte"),
]


def test_german_minimal_stem_pinned_rules():
    # < 5 chars pass through untouched (no umlaut fold either)
    assert german_minimal_stem("haus") == "haus"
    assert german_minimal_stem("früh") == "früh"
    # umlaut fold at >= 5 chars
    assert german_minimal_stem("spärk") == "spark"
    # fold only — final -r is NOT in the pinned strip set
    assert german_minimal_stem("bücher") == "bucher"
    # -nen (len > 6) drops 3: lehrerinnen -> lehrerin
    assert german_minimal_stem("lehrerinnen") == "lehrerin"
    assert german_minimal_stem("scannen") == "scan"
    # -en (len > 6 not required, len > 5) drops 2
    assert german_minimal_stem("frauen") == "frau"
    assert german_minimal_stem("joinen") == "join"
    assert german_minimal_stem("tabellen") == "tabell"
    # final n / e / s (len > 5) drops 1
    assert german_minimal_stem("filtern") == "filter"
    assert german_minimal_stem("spalte") == "spalt"
    assert german_minimal_stem("tables") == "table"
    # len == 5 is eligible for the fold but too short for any strip
    assert german_minimal_stem("table") == "table"
    # no matching suffix -> unchanged
    assert german_minimal_stem("filter") == "filter"
    assert german_minimal_stem("window") == "window"


def test_analyze_german_drops_stopwords_and_stems():
    assert analyze("die scannen und joinen filtern spärk", "german") == [
        "scan", "join", "filter", "spark"
    ]
    assert analyze("über die häuser", "german") == ["hauser"]


def test_column_chain_matches_python(spark):
    docs = spark.createDataFrame(DE_DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["toks"]
        for r in with_tokens(docs, analyzer="german").collect()
    }
    for doc_id, text in DE_DOCS:
        assert got[doc_id] == analyze(text, "german"), text


def test_fused_counting_udf_matches_python(spark):
    from collections import Counter

    docs = spark.createDataFrame(DE_DOCS, "doc_id long, text string")
    rows = corpus_base(docs, analyzer="german").collect()
    for r in rows:
        text = dict(DE_DOCS)[r["doc_id"]]
        want = Counter(analyze(text, "german"))
        assert dict(zip(r["terms"], r["tfs"])) == dict(want)
        assert r["dl"] == sum(want.values())


def test_sql_stage_replay_matches_python():
    """The stacked-CTE stemmer the bm25_german oracle embeds produces the
    same term stream as the Python chain on a fuzzed vocabulary."""
    import random

    import duckdb

    from engine.registry import _german_oracle  # noqa: F401  (build check)

    rng = random.Random(7)
    words = {"scannen", "joinen", "filtern", "spärk", "frauen", "tabellen",
             "lehrerinnen", "bücher", "häuser", "spalte", "tables", "table",
             "haus", "früh", "window", "filter"}
    alpha = "abcdefghijklmnopqrstuvwxyzäöü"
    while len(words) < 90:
        words.add("".join(rng.choice(alpha) for _ in range(rng.randint(1, 12))))
    words = {w for w in words if w not in GERMAN_STOPWORDS and "'" not in w}
    vals = ", ".join(f"('{w}')" for w in sorted(words))
    sql = f"""
WITH tok0 AS (SELECT w AS orig, w AS t FROM (VALUES {vals}) v(w)),
s0 AS (SELECT orig,
         CASE WHEN length(t) >= 5
              THEN replace(replace(replace(t, 'ä', 'a'), 'ö', 'o'), 'ü', 'u')
              ELSE t END AS w,
         length(t) >= 5 AS elig
       FROM tok0)
SELECT orig,
       CASE WHEN NOT elig THEN w
            WHEN length(w) > 6 AND w LIKE '%nen' THEN substr(w, 1, length(w) - 3)
            WHEN length(w) > 5 AND w LIKE '%en' THEN substr(w, 1, length(w) - 2)
            WHEN length(w) > 5 AND (w LIKE '%n' OR w LIKE '%e' OR w LIKE '%s')
                 THEN substr(w, 1, length(w) - 1)
            ELSE w END AS term
FROM s0
"""
    got = dict(duckdb.connect().execute(sql).fetchall())
    for w in words:
        assert got[w] == german_minimal_stem(w), w
