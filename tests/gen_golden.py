"""Generate frozen golden top-k fixtures (SURVEY.md §5.3; FIXTURES.md §3).

Run once (`python tests/gen_golden.py`) and commit the JSON. The oracle is
the independent NumPy BM25 scorer — with no live Elasticsearch in the
sandbox, this pinned oracle DEFINES the reference semantics (documented in
BASELINE.md). The engine must match rank-identically (tests/test_golden.py).
"""

from __future__ import annotations

import json
import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine.pages import generate_pages  # noqa: E402
from engine.refine import extract_text_series  # noqa: E402
from engine.tokenizer import tokenize  # noqa: E402
from tests.oracle_bm25 import OracleIndex  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")

DOC_QUERIES = [
    ("q01", "table", 10, "or"),
    ("q02", "dup", 10, "or"),
    ("q03", "sort merge join", 10, "and"),
    ("q04", "window stream", 10, "or"),
    ("q05", "scan -filter", 10, "or"),
    ("q06", "customer order", 100, "and"),
    ("q07", "the", 5, "or"),
    ("q08", "zzznonexistent", 10, "or"),
]

PAGES_QUERIES = [
    ("p01", "spark batch value", 10, "or"),
    ("p02", "w042", 10, "or"),  # rare tail term
    ("p03", "merge sort", 10, "and"),
]


def split_query(q: str) -> tuple[list[str], list[str]]:
    pos, neg = [], []
    for raw in q.split():
        (neg if raw.startswith("-") else pos).extend(tokenize(raw.lstrip("-")))
    return pos, neg


def emit(corpus_name: str, docs: dict[int, str], queries) -> None:
    oracle = OracleIndex(docs)
    for qid, q, k, mode in queries:
        terms, must_not = split_query(q)
        hits = oracle.search(terms, k, mode=mode, must_not=must_not)
        out = {
            "corpus": corpus_name,
            "query": q,
            "k": k,
            "mode": mode,
            "hits": [{"doc_id": int(d), "score": s} for d, s in hits],
            "oracle": "numpy-bm25-lucene8",
            "params": {"k1": 1.2, "b": 0.75, "tie_break": "doc_id asc"},
        }
        path = os.path.join(GOLDEN_DIR, f"{corpus_name}_{qid}.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(path, len(hits))


def main() -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    pdf = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")
    emit("documents", dict(zip(pdf["doc_id"].tolist(), pdf["text"].tolist())), DOC_QUERIES)

    # pages corpus: doc_ids come from the engine refine (they are labels —
    # the NumPy oracle independently re-scores the texts); latest-crawl
    # dedup is verified against a pandas replica before trusting the ids
    from engine.pages import pages_df
    from engine.session import get_spark

    spark = get_spark("gen-golden", cpus=8, shuffle_partitions=8)
    from engine.refine import refine_pages

    rows = refine_pages(pages_df(spark, 2000, seed=42)).select("url", "doc_id", "text").collect()
    pg = generate_pages(2000, seed=42)
    expect = pg.sort_values(["url", "warc_ts"]).groupby("url").last().reset_index()
    expect_text = dict(zip(expect["url"], extract_text_series(expect["html"])))
    assert len(rows) == len(expect)
    for r in rows:
        assert expect_text[r["url"]] == r["text"], r["url"]
    emit("pages2k", {int(r["doc_id"]): r["text"] for r in rows}, PAGES_QUERIES)
    spark.stop()


if __name__ == "__main__":
    main()
