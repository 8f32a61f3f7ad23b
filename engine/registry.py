"""Driver-contract registry: queries() + oracle_sql() pairs.

Every SQL-expressible operator from SURVEY.md §2 gets (a) a DataFrame
callable (spark, sf_dir) → DataFrame and (b) an ANSI-SQL twin DuckDB runs on
the same parquet fixtures (__spark_entry__.py contract). Column names are
aliased identically on both sides; float scores are rounded to 4 decimals on
both sides so the driver's order-insensitive value-hash is robust to
last-ulp differences between engines.

The BM25 oracle SQL recomputes tf/df/dl/avgdl from `documents.text` by
whitespace split — equivalent to the engine analyzer on this corpus
(tests/test_tokenizer.py::test_matches_whitespace_split_on_clean_corpus).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import BM25_B, BM25_K1
from .corpus import corpus_stats, term_stats, tf_table, tokens, with_tokens
from .io import read_fixture
from .search import exact_search

# ---------------------------------------------------------------------------
# shared builders


def _built_corpus(spark: SparkSession, sf_dir: str):
    docs = read_fixture(spark, sf_dir, "documents")
    dwt = with_tokens(docs)
    tok = tokens(dwt)
    tf = tf_table(tok)
    ds = dwt.select("doc_id", "dl")
    ts = term_stats(tf)
    n, avgdl = corpus_stats(ds)
    return tf, ds, ts, n, avgdl


def _bm25_query(query: str, k: int, mode: str) -> Callable:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        tf, ds, ts, n, avgdl = _built_corpus(spark, sf_dir)
        return exact_search(tf, ds, ts, n, avgdl, query, k=k, mode=mode)

    return run


def _bm25_oracle(terms: list[str], k: int, mode: str, must_not: list[str] | None = None) -> str:
    """DuckDB ANSI SQL twin of exact_search (Lucene-8 BM25, SURVEY.md D8)."""
    must_not = must_not or []
    terms_in = ", ".join(f"'{t}'" for t in terms)
    and_clause = (
        f"AND n_matched = {len(terms)}" if mode == "and" else ""
    )
    not_clause = ""
    if must_not:
        not_in = ", ".join(f"'{t}'" for t in must_not)
        not_clause = (
            f"AND doc_id NOT IN (SELECT DISTINCT doc_id FROM toks WHERE term IN ({not_in}))"
        )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
scores AS (
  SELECT tf.doc_id,
         sum( ln(1 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
              * tf.tf / (tf.tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl.dl / stats.avgdl)) ) AS score,
         count(*) AS n_matched
  FROM tf
  JOIN (SELECT term, count(*) AS df FROM tf GROUP BY 1) df USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
  WHERE tf.term IN ({terms_in})
  GROUP BY tf.doc_id
)
SELECT doc_id, round(score, 4) AS score
FROM scores
WHERE 1=1 {and_clause} {not_clause}
ORDER BY score DESC, doc_id ASC
LIMIT {k}
"""


# ---------------------------------------------------------------------------
# registry

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, fn: Callable, oracle: str | None = None) -> None:
    _QUERIES[name] = fn
    if oracle is not None:
        _ORACLES[name] = oracle


# --- D8 exact BM25 top-k (frozen query set, FIXTURES.md §3) ----------------
_BM25_SET = [
    ("bm25_hot_term", "table", 10, "or", ["table"], None),
    ("bm25_rare_term", "dup", 10, "or", ["dup"], None),
    ("bm25_and", "sort merge join", 10, "and", ["sort", "merge", "join"], None),
    ("bm25_or", "window stream", 10, "or", ["window", "stream"], None),
    ("bm25_must_not", "scan -filter", 10, "or", ["scan"], ["filter"]),
    ("bm25_and_k100", "customer order", 100, "and", ["customer", "order"], None),
    ("bm25_stopword", "the", 5, "or", ["the"], None),
]
for _name, _q, _k, _mode, _terms, _neg in _BM25_SET:
    register(_name, _bm25_query(_q, _k, _mode), _bm25_oracle(_terms, _k, _mode, _neg))


# --- C2/C3/C4 corpus statistics (tf / dl / df-cf) ---------------------------
def _q_term_stats(spark, sf_dir):
    tf, _, ts, _, _ = _built_corpus(spark, sf_dir)
    return ts.select("term", "df", "cf").orderBy("term")


register(
    "corpus_term_stats",
    _q_term_stats,
    """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2)
SELECT term, count(*) AS df, sum(tf) AS cf FROM tf GROUP BY term ORDER BY term
""",
)


def _q_doc_len(spark, sf_dir):
    _, ds, _, _, _ = _built_corpus(spark, sf_dir)
    return ds.select("doc_id", F.col("dl").cast("long").alias("dl"))


register(
    "corpus_doc_length",
    _q_doc_len,
    "SELECT doc_id, count(*)::BIGINT AS dl FROM (SELECT doc_id, unnest(string_split(text,' ')) t FROM documents) GROUP BY doc_id",
)


# --- D2-D7 index-backed search: compressed postings + block-max WAND --------
# Same result surface as exact BM25 → same DuckDB oracles. The index is built
# once per sf_dir (multi-shard, salted, merged) and cached for the process.

_INDEX_CACHE: dict[str, object] = {}


def _indexed(spark: SparkSession, sf_dir: str):
    from .index import build_index
    from .searcher import LoadedIndex

    if sf_dir not in _INDEX_CACHE:
        tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
        root = os.path.join("/root/repo/data/index_cache", tag)
        docs = read_fixture(spark, sf_dir, "documents").select("doc_id", "text")
        build_index(
            spark,
            docs,
            root,
            n_buckets=4,
            docs_per_shard=256,  # >1 shard even at sf0.001 — exercises per-shard WAND + merge
            n_segments=2,
            hot_df=100,  # most fixture terms are hot → salting on the graded path
            n_salts=4,
        )
        _INDEX_CACHE[sf_dir] = LoadedIndex(spark, root)
    return _INDEX_CACHE[sf_dir]


def _indexed_query(query: str, k: int, mode: str) -> Callable:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _indexed(spark, sf_dir).search(query, k=k, mode=mode, algo="wand")

    return run


for _name, _q, _k, _mode, _terms, _neg in _BM25_SET:
    register(
        _name.replace("bm25_", "bm25_wand_"),
        _indexed_query(_q, _k, _mode),
        _bm25_oracle(_terms, _k, _mode, _neg),
    )


# ---------------------------------------------------------------------------
# public contract


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """Flagship query: AND-conjunction BM25 top-10 over documents."""
    return _QUERIES["bm25_and"](spark, sf_dir)
