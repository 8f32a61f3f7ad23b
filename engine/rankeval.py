"""ES Ranking Evaluation API parity [public: ES rank_eval docs]: given per-
query ranked hits and a relevance-judgment set, compute precision@k,
MRR (reciprocal rank of the first relevant hit), and NDCG@k per query.

Shapes, not loops: one left join of the ranked frame against the judgments
(unjudged hits grade 0, exactly ES's `unrated_docs` handling with the
default unrated grade) and two hash aggregates. The ideal-DCG side ranks
each query's judged docs by grade via a per-qid window — the judgment set
is the small side by construction (human labels), so every stage is a
bucket-parallel aggregate; nothing driver-side.

Metric definitions pinned (matching ES):
  precision@k = |top-k hits with grade > 0| / k
  MRR         = 1 / rank of the first grade>0 hit (0 when none)
  DCG@k       = Σ_top-k (2^grade − 1) / log2(rank + 1)
  IDCG@k      = DCG of the query's judged docs sorted by grade desc
                (doc_id asc tie-break, top k); NDCG = DCG / IDCG (0 if no
                relevant docs are judged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _gain(grade_col) -> "F.Column":
    return (F.pow(F.lit(2.0), grade_col.cast("double")) - F.lit(1.0))


def rank_eval(
    ranked: DataFrame,
    judgments: DataFrame,
    k: int,
) -> DataFrame:
    """(qid, precision_k, mrr, ndcg) per query.

    ranked:    (qid, doc_id, rank) — rank 1..k within each qid (the engine's
               top-k output with a row_number attached).
    judgments: (qid, doc_id, grade) — graded relevance labels; hits absent
               from the judgment set count as grade 0."""
    # enforce @k even if the caller hands a deeper ranking (otherwise
    # precision_k can exceed 1 and DCG sums past the cutoff)
    hits = (
        ranked.filter(F.col("rank") <= k)
        .join(judgments, ["qid", "doc_id"], "left")
        .withColumn("grade", F.coalesce(F.col("grade"), F.lit(0)))
    )
    per_q = hits.groupBy("qid").agg(
        (F.sum((F.col("grade") > 0).cast("int")) / F.lit(float(k))).alias(
            "precision_k"
        ),
        F.coalesce(
            1.0 / F.min(F.when(F.col("grade") > 0, F.col("rank"))), F.lit(0.0)
        ).alias("mrr"),
        F.sum(_gain(F.col("grade")) / F.log2(F.col("rank") + 1)).alias("_dcg"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("grade").desc(), F.col("doc_id").asc()
    )
    ideal = (
        judgments.filter(F.col("grade") > 0)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy("qid")
        .agg(F.sum(_gain(F.col("grade")) / F.log2(F.col("_rn") + 1)).alias("_idcg"))
    )
    return (
        per_q.join(ideal, "qid", "left")
        .select(
            "qid",
            F.round("precision_k", 4).alias("precision_k"),
            F.round("mrr", 4).alias("mrr"),
            F.round(
                F.when(
                    F.col("_idcg").isNotNull() & (F.col("_idcg") > 0),
                    F.col("_dcg") / F.col("_idcg"),
                ).otherwise(0.0),
                4,
            ).alias("ndcg"),
        )
        .orderBy("qid")
    )


def with_ranks(topk: DataFrame, qid: str) -> DataFrame:
    """Attach (qid, rank) to a single query's top-k frame (doc_id, score) —
    rank = position under the engine's rounding-consistent order (rounded
    score desc, doc_id asc). The frame is ≤ k rows; the window is per-qid."""
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return topk.select(
        F.lit(qid).alias("qid"), "doc_id", F.row_number().over(w).alias("rank")
    )
