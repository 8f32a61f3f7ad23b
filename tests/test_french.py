"""French analyzer option (VERDICT r04 #7): pinned Snowball-subset stop set
+ Lucene FrenchMinimalStemmer [public: Lucene FrenchMinimalStemFilter;
Savoy, "Report on CLEF-2001 Experiments"].

Pins: (1) the pure-Python stemmer rule-for-rule against the published
algorithm, (2) the Catalyst column chain (french_tokens_expr) and the fused
Arrow counting UDF against the Python reference, (3) indexed-path parity +
the analyzer-mismatch guard, (4) the DuckDB stacked-CTE replay the
bm25_french oracle uses."""

import pytest
from pyspark.sql import functions as F

from engine.corpus import corpus_base, with_tokens
from engine.index import build_index
from engine.searcher import LoadedIndex
from engine.tokenizer import (
    FRENCH_STOPWORDS,
    analyze,
    french_minimal_stem,
    tokenize,
)

FR_DOCS = [
    (0, "les chevaux et les chateaux des tables"),
    (1, "la table de la banque est grande"),
    (2, "des streams rapides passent par les index"),
    (3, "elle donne les pommes aux enfants"),
    (4, "aucune liaison ici juste des mots simples"),
]


def test_french_minimal_stem_published_rules():
    # < 6 chars pass through
    assert french_minimal_stem("table") == "table"
    assert french_minimal_stem("eaux") == "eaux"
    # -aux → -al (chevaux → cheval); other -x just dropped
    assert french_minimal_stem("chevaux") == "cheval"
    assert french_minimal_stem("chateaux") == "chateal"
    assert french_minimal_stem("voyeux") == "voyeu"
    # sequential strip chain: s, r, e, é, doubled letter
    assert french_minimal_stem("tables") == "tabl"
    assert french_minimal_stem("streams") == "stream"
    assert french_minimal_stem("donner") == "don"   # r, e, then double-n
    assert french_minimal_stem("grande") == "grand"
    assert french_minimal_stem("passes") == "pas"   # s, e, then double-s
    assert french_minimal_stem("donnée") == "don"   # e, é, then double-n
    assert french_minimal_stem("simples") == "simpl"


def test_analyze_french_drops_stopwords_and_stems():
    assert analyze("les tables et streams de la table", "french") == [
        "tabl", "stream", "table"
    ]
    # elision residue: tokenizer splits l'avion → [l, avion]; the orphan
    # clitic is in the stop set
    assert analyze("l'avion des enfants", "french") == ["avion", "enfant"]


def test_column_chain_matches_python(spark):
    docs = spark.createDataFrame(FR_DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: r["toks"]
        for r in with_tokens(docs, analyzer="french").collect()
    }
    for doc_id, text in FR_DOCS:
        assert got[doc_id] == analyze(text, "french"), text


def test_fused_counting_udf_matches_python(spark):
    from collections import Counter

    docs = spark.createDataFrame(FR_DOCS, "doc_id long, text string")
    rows = corpus_base(docs, analyzer="french").collect()
    for r in rows:
        text = dict(FR_DOCS)[r["doc_id"]]
        want = Counter(analyze(text, "french"))
        assert dict(zip(r["terms"], r["tfs"])) == dict(want)
        assert r["dl"] == sum(want.values())


def test_french_index_parity_and_mismatch_guard(spark, tmp_path):
    docs = spark.createDataFrame(FR_DOCS * 8, "doc_id long, text string")
    docs = docs.withColumn(
        "doc_id", F.monotonically_increasing_id() % 40
    ).dropDuplicates(["doc_id"])
    root = str(tmp_path / "fr_idx")
    mf = build_index(spark, docs, root, n_buckets=2, docs_per_shard=16,
                     block_size=8, analyzer="french")
    assert mf.analyzer == "french"
    idx = LoadedIndex(spark, root)
    # 'tables' and 'tabl' meet at the stemmed index term
    hits = idx.search("tables", k=5, algo="exhaustive").collect()
    assert hits, "stemmed query must match french-stemmed index"
    # stopword-only query → empty, never an error
    assert idx.search("les de la et", k=5).collect() == []
    with pytest.raises(ValueError, match="analyzer"):
        idx.search("tables", k=5, analyzer="standard")
    assert idx.search("tables", k=5, analyzer="french").collect()


def test_sql_stage_replay_matches_python():
    """The stacked-CTE stemmer the bm25_french oracle embeds produces the
    same (doc_id, term) stream as the Python chain on a fuzzed vocabulary."""
    import random

    import duckdb

    from engine.registry import _french_oracle  # noqa: F401  (build check)

    rng = random.Random(5)
    words = {"chevaux", "chateaux", "tables", "table", "passes", "donnée",
             "streams", "donner", "grande", "eaux", "voyeux", "simples"}
    alpha = "abcdefghijklmnopqrstuvwxyzé"
    while len(words) < 80:
        words.add("".join(rng.choice(alpha) for _ in range(rng.randint(1, 12))))
    words = {w for w in words if w not in FRENCH_STOPWORDS}
    vals = ", ".join(f"('{w}')" for w in sorted(words))
    sql = f"""
WITH s0 AS (SELECT w AS orig, w, length(w) >= 6 AS big FROM (VALUES {vals}) v(w)),
sx AS (SELECT orig,
         CASE WHEN big AND w LIKE '%x'
              THEN CASE WHEN w LIKE '%aux' THEN substr(w, 1, length(w) - 2) || 'l'
                        ELSE substr(w, 1, length(w) - 1) END
              ELSE w END AS w,
         big AND w NOT LIKE '%x' AS chain FROM s0),
s1 AS (SELECT orig, CASE WHEN chain AND w LIKE '%s' THEN substr(w, 1, length(w) - 1) ELSE w END AS w, chain FROM sx),
s2 AS (SELECT orig, CASE WHEN chain AND w LIKE '%r' THEN substr(w, 1, length(w) - 1) ELSE w END AS w, chain FROM s1),
s3 AS (SELECT orig, CASE WHEN chain AND w LIKE '%e' THEN substr(w, 1, length(w) - 1) ELSE w END AS w, chain FROM s2),
s4 AS (SELECT orig, CASE WHEN chain AND w LIKE '%é' THEN substr(w, 1, length(w) - 1) ELSE w END AS w, chain FROM s3)
SELECT orig, CASE WHEN chain AND length(w) >= 2
                       AND substr(w, length(w), 1) = substr(w, length(w) - 1, 1)
                  THEN substr(w, 1, length(w) - 1) ELSE w END AS term
FROM s4"""
    got = dict(duckdb.connect().execute(sql).fetchall())
    assert got == {w: french_minimal_stem(w) for w in words}


def test_stop_set_composition():
    # articles/pronouns/preps + the single-letter elision residue
    for w in ("le", "la", "les", "des", "et", "l", "d", "qu", "est"):
        assert w in FRENCH_STOPWORDS, w
    for w in ("table", "cheval", "stream"):
        assert w not in FRENCH_STOPWORDS, w
    # tokenize lowercases before the filter
    assert analyze("LES Tables", "french") == ["tabl"]
    assert tokenize("LES") == ["les"]
