"""rank_eval metric tests against hand-computed values."""

import math

import pytest

from engine.rankeval import rank_eval, with_ranks


def test_metrics_hand_computed(spark):
    # q: ranked docs 1..4; judged: doc2 grade 2, doc4 grade 1, doc9 grade 3
    # (doc9 relevant but NOT retrieved — hurts NDCG via the ideal side)
    ranked = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3), ("q", 4, 4)],
        "qid string, doc_id long, rank int",
    )
    judg = spark.createDataFrame(
        [("q", 2, 2), ("q", 4, 1), ("q", 9, 3)],
        "qid string, doc_id long, grade int",
    )
    row = rank_eval(ranked, judg, k=4).collect()[0]
    assert row.precision_k == pytest.approx(2 / 4)
    assert row.mrr == pytest.approx(1 / 2)
    dcg = (2**2 - 1) / math.log2(3) + (2**1 - 1) / math.log2(5)
    idcg = (2**3 - 1) / math.log2(2) + (2**2 - 1) / math.log2(3) + (2**1 - 1) / math.log2(4)
    assert row.ndcg == pytest.approx(round(dcg / idcg, 4))


def test_no_relevant_hits_zero_metrics(spark):
    ranked = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2)], "qid string, doc_id long, rank int"
    )
    judg = spark.createDataFrame([], "qid string, doc_id long, grade int")
    row = rank_eval(ranked, judg, k=2).collect()[0]
    assert (row.precision_k, row.mrr, row.ndcg) == (0.0, 0.0, 0.0)


def test_unjudged_hits_grade_zero(spark):
    # an unjudged doc at rank 1 contributes nothing but doesn't crash
    ranked = spark.createDataFrame(
        [("q", 7, 1), ("q", 2, 2)], "qid string, doc_id long, rank int"
    )
    judg = spark.createDataFrame(
        [("q", 2, 1)], "qid string, doc_id long, grade int"
    )
    row = rank_eval(ranked, judg, k=2).collect()[0]
    assert row.precision_k == pytest.approx(0.5)
    assert row.mrr == pytest.approx(0.5)
    assert row.ndcg == pytest.approx(round((1 / math.log2(3)) / 1.0, 4))


def test_with_ranks_orders_by_rounded_score_then_id(spark):
    topk = spark.createDataFrame(
        [(5, 2.0), (3, 2.0), (1, 3.0)], "doc_id long, score double"
    )
    rows = with_ranks(topk, "qx").collect()
    assert [(r.doc_id, r.rank) for r in sorted(rows, key=lambda r: r.rank)] == [
        (1, 1), (3, 2), (5, 3)
    ]
    assert all(r.qid == "qx" for r in rows)


def test_rank_eval_enforces_k_on_deeper_rankings(spark):
    # a 4-deep ranking with k=2: hits at ranks 3,4 must not count
    ranked = spark.createDataFrame(
        [("q", 1, 1), ("q", 2, 2), ("q", 3, 3), ("q", 4, 4)],
        "qid string, doc_id long, rank int",
    )
    judg = spark.createDataFrame(
        [("q", 1, 1), ("q", 3, 1), ("q", 4, 1)],
        "qid string, doc_id long, grade int",
    )
    row = rank_eval(ranked, judg, k=2).collect()[0]
    assert row.precision_k == pytest.approx(0.5)  # only rank-1 hit counts
    assert row.precision_k <= 1.0
    assert row.mrr == pytest.approx(1.0)
