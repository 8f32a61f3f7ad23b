"""Query path (SURVEY.md §2.D): analysis, boolean semantics, BM25 top-k.

Two scorers, required to agree (property-tested):

* **exact_search** (D8) — pure Spark SQL expressions over
  tf ⋈ doc_stats ⋈ term_stats: whole-stage-codegen'd, DuckDB-oracle-checkable.
  Mirrors ES query-then-fetch with Lucene BM25 [public].
* **index_search** (D3+D7) — partition-pruned scan of the compressed posting
  shards + block-max WAND top-k inside a grouped Arrow UDF (engine/wand.py),
  global top-k via TakeOrderedAndProject.

Query syntax (ES `bool` parity): whitespace-separated terms; a `-term`
prefix = must_not (D6); mode='and' → bool.must conjunction (D4),
mode='or' → bool.should disjunction (D5). Tie-break score DESC, doc_id ASC
(BASELINE.json:14).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .bm25 import idf_expr, tf_norm_expr
from .tokenizer import tokenize


@dataclass
class ParsedQuery:
    terms: list[str]      # positive terms (deduped, analysis applied)
    must_not: list[str]   # excluded terms


def parse_query(query: str) -> ParsedQuery:
    """D1: analyze the query string with the SAME analyzer as indexing
    (rank-identity requires identical analysis [public: ES match query])."""
    pos: list[str] = []
    neg: list[str] = []
    for raw in query.split():
        target = neg if raw.startswith("-") else pos
        for tok in tokenize(raw.lstrip("-")):
            if tok not in target:
                target.append(tok)
    return ParsedQuery(pos, neg)


def score_terms(
    tf: DataFrame,
    doc_stats: DataFrame,
    term_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    terms: list[str],
) -> DataFrame:
    """Per-(doc, term) BM25 partial scores for the given terms.

    Plan shape: `term IN (...)` filters push to the tf scan; the per-term
    stats side is tiny → broadcast join. When the tf frame carries `dl`
    inline (engine/corpus.exploded_tf does), the doc-length join is skipped
    entirely — one fewer full shuffle per query; otherwise dl joins as an
    AQE-chosen hash/sort-merge. All arithmetic stays JVM-side (no UDF)."""
    tf_q = tf.filter(F.col("term").isin(terms))
    ts_q = term_stats.filter(F.col("term").isin(terms))
    joined = tf_q.join(F.broadcast(ts_q.select("term", "df")), "term")
    if "dl" not in tf.columns:
        joined = joined.join(doc_stats, "doc_id")
    return (
        joined
        .select(
            "doc_id",
            "term",
            (
                idf_expr(F.col("df"), F.lit(n_docs))
                * tf_norm_expr(F.col("tf"), F.col("dl"), F.lit(float(avgdl)))
            ).alias("partial"),
        )
    )


def exact_search(
    tf: DataFrame,
    doc_stats: DataFrame,
    term_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    query: str,
    k: int = 10,
    mode: str = "or",
    round_to: int | None = 4,
    min_should_match: int = 1,
) -> DataFrame:
    """D8 exact BM25 top-k → DataFrame(doc_id, score), deterministic order.

    round_to: decimal rounding applied to the final score so the driver's
    order-insensitive value-hash is robust to last-ulp float differences
    between engines (Spark vs DuckDB oracle); None = raw double.
    min_should_match: ES minimum_should_match — require ≥ m distinct query
    terms per doc (mode='and' is the m = len(terms) special case)."""
    q = parse_query(query)
    if not q.terms:
        return tf.sparkSession.createDataFrame([], "doc_id long, score double")
    scored = (
        score_terms(tf, doc_stats, term_stats, n_docs, avgdl, q.terms)
        .groupBy("doc_id")
        .agg(F.sum("partial").alias("score"), F.count("*").alias("n_matched"))
    )
    if mode == "and":
        scored = scored.filter(F.col("n_matched") == len(q.terms))
    elif min_should_match > 1:
        scored = scored.filter(F.col("n_matched") >= min_should_match)
    if q.must_not:
        excl = tf.filter(F.col("term").isin(q.must_not)).select("doc_id").distinct()
        scored = scored.join(excl, "doc_id", "left_anti")  # D6 bool.must_not
    score_col = F.round(F.col("score"), round_to) if round_to is not None else F.col("score")
    return (
        scored.select("doc_id", score_col.alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def fetch(topk: DataFrame, docs: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """D11 fetch phase: join top-k back to stored fields — broadcast the
    k-row side (ES query-then-fetch [public])."""
    right = docs if cols is None else docs.select("doc_id", *cols)
    return F.broadcast(topk).join(right, "doc_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )


def phrase_filter(
    tf_with_pos: DataFrame, terms: list[str]
) -> DataFrame:
    """D9 phrase match: docs where terms appear at consecutive positions.

    Pure SQL-expression adjacency check over the C2 position lists:
    for a phrase [t0..tn], doc matches if ∃p ∈ pos(t0) with p+i ∈ pos(ti) ∀i.
    Uses array ops (arrays here are per-doc position lists, bounded by dl).
    [public: ES match_phrase]."""
    if not terms:
        raise ValueError("empty phrase")
    base = (
        tf_with_pos.filter(F.col("term") == terms[0])
        .select("doc_id", F.col("positions").alias("p0"))
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = (
            tf_with_pos.filter(F.col("term") == t)
            .select("doc_id", F.col("positions").alias(f"p{i}"))
        )
        base = base.join(nxt, "doc_id")
        # keep only start positions whose (i)-shifted successor exists
        base = base.withColumn(
            "p0",
            F.filter(
                F.col("p0"),
                lambda p: F.exists(F.col(f"p{i}"), lambda x: x == p + F.lit(i)),
            ),
        ).drop(f"p{i}")
    return base.filter(F.size("p0") > 0).select("doc_id")


def range_filter(docs: DataFrame, col: str, lo, hi) -> DataFrame:
    """D10: `range` query parity — pushdown-friendly BETWEEN."""
    return docs.filter(F.col(col).between(lo, hi))


def multiterm_and_docids(tf: DataFrame, terms: list[str]) -> DataFrame:
    """D4 SQL-checkable variant of conjunction: doc_ids containing ALL terms
    (semi-join / group-count form; the WAND path is the scored variant)."""
    return (
        tf.filter(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.count_distinct("term").alias("nt"))
        .filter(F.col("nt") == len(terms))
        .select("doc_id")
    )
