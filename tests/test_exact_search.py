"""Exact BM25 SQL path vs the independent NumPy oracle (SURVEY.md §5.2-5.3)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine.corpus import corpus_stats, term_stats, tf_table, tokens, with_tokens
from engine.io import read_fixture
from engine.search import exact_search, fetch, multiterm_and_docids, parse_query
from tests.oracle_bm25 import OracleIndex

QUERIES = [
    ("table", 10, "or"),
    ("dup", 10, "or"),
    ("sort merge join", 10, "and"),
    ("window stream", 10, "or"),
    ("scan -filter", 10, "or"),
    ("customer order", 100, "and"),
    ("the", 5, "or"),
    ("zzznonexistent", 10, "or"),
]


@pytest.fixture(scope="module")
def built(spark, sf_dir):
    docs = read_fixture(spark, sf_dir, "documents")
    dwt = with_tokens(docs).cache()
    tok = tokens(dwt)
    tf = tf_table(tok).cache()
    ds = dwt.select("doc_id", "dl").cache()
    ts = term_stats(tf).cache()
    n, avgdl = corpus_stats(ds)
    return tf, ds, ts, n, avgdl


@pytest.fixture(scope="module")
def oracle(sf_dir):
    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")
    return OracleIndex(dict(zip(pdf["doc_id"], pdf["text"])))


def test_corpus_stats_match_oracle(built, oracle):
    _, _, _, n, avgdl = built
    assert n == oracle.n_docs
    assert avgdl == pytest.approx(oracle.avgdl, rel=1e-12)


@pytest.mark.parametrize("query,k,mode", QUERIES)
def test_exact_search_rank_identical(built, oracle, query, k, mode):
    tf, ds, ts, n, avgdl = built
    got = exact_search(tf, ds, ts, n, avgdl, query, k=k, mode=mode, round_to=None).collect()
    q = parse_query(query)
    want = oracle.search(q.terms, k, mode=mode, must_not=q.must_not)
    assert [r["doc_id"] for r in got] == [d for d, _ in want]
    for r, (_, s) in zip(got, want):
        assert r["score"] == pytest.approx(s, rel=1e-9)


def test_and_docids_consistent(built, oracle):
    tf, *_ = built
    got = {r["doc_id"] for r in multiterm_and_docids(tf, ["sort", "merge", "join"]).collect()}
    want = {
        d
        for d, c in oracle.tfs.items()
        if all(c.get(t, 0) > 0 for t in ["sort", "merge", "join"])
    }
    assert got == want


def test_fetch_phase(built, spark, sf_dir):
    tf, ds, ts, n, avgdl = built
    topk = exact_search(tf, ds, ts, n, avgdl, "table scan", k=5)
    docs = read_fixture(spark, sf_dir, "documents")
    rows = fetch(topk, docs, cols=["text", "lang"]).collect()
    assert len(rows) == 5
    assert all("table" in r["text"] or "scan" in r["text"] for r in rows)
    # fetch is a broadcast join of the tiny top-k side
    plan = fetch(topk, docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
