"""Percolator (ES `percolate` query [public]): the inverse of search — a set
of REGISTERED queries, and for each incoming document, which queries match.
surfiki-refine-class pipelines use this for routing/alerting: tag every
crawled page with the standing queries it satisfies.

Spark-first shape: the registered query set is small (thousands) and the
document stream is huge — so the query-term table is a BROADCAST side, and
matching is ONE pass over the per-doc distinct-term table:

    tokens ⋈ broadcast(query_terms)  →  groupBy(query_id, doc_id)
      →  count(distinct term) == n_terms(query)   (bool.must semantics)

No per-document Python, no per-query scan; at 100 TB this is a single
map-side broadcast join plus one aggregation keyed by (query_id, doc_id),
with map-side partial aggregation doing most of the counting. ES evaluates
candidate queries per doc against an in-memory index of the query set —
the broadcast join is the distributed analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .search import parse_query


def percolate(
    doc_terms: DataFrame,
    queries: list[tuple[str, str]],
    id_col: str = "doc_id",
) -> DataFrame:
    """Match docs against registered AND-semantics queries.

    doc_terms: (doc_id, term) rows — distinct per doc (a tf table works,
    duplicates are handled by count(DISTINCT term)).
    queries: [(query_id, query_string)] analyzed with the indexing analyzer
    (D1 rank-identity rule applies to percolation too).
    Returns (query_id, doc_id) for every match."""
    spark = doc_terms.sparkSession
    rows = []
    for qid, q in queries:
        terms = parse_query(q).terms
        for t in terms:
            rows.append((qid, t, len(terms)))
    qt = spark.createDataFrame(rows, "query_id string, term string, n_terms int")
    matched = doc_terms.select(id_col, "term").join(F.broadcast(qt), "term")
    return (
        matched.groupBy("query_id", id_col)
        .agg(
            F.count_distinct("term").alias("nm"),
            F.first("n_terms").alias("n_terms"),
        )
        .filter(F.col("nm") == F.col("n_terms"))
        .select("query_id", id_col)
        .orderBy("query_id", id_col)
    )
