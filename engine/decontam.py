"""Benchmark decontamination (LLM-data-pipeline op): flag training documents
sharing word n-grams with a held-out evaluation set [public: GPT-3 appendix C
/ Brown et al. 2020 13-gram decontamination; The Pile; FineWeb]. A training
doc is contaminated when ≥ `min_overlap` of its DISTINCT n-grams appear in
the benchmark's n-gram set.

Scale design: the benchmark side is small by definition (eval suites are
thousands of docs, not billions), so its distinct n-gram set BROADCASTS —
the train side never shuffles its n-gram explosion anywhere; the only
exchange is the final per-doc count aggregate (combines map-side). N-grams
stay strings here for oracle parity; a 100 TB run hashes them to int64
(xxhash64) first, which shrinks the broadcast ~10× without changing shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ngrams(text_col: str, n: int):
    """Distinct word n-grams as an array expression — FULL n-grams only
    (docs shorter than n tokens contribute none; dedup.with_shingles keeps a
    short remainder shingle, which decontamination must not count)."""
    toks = F.split(F.col(text_col), " ")
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_overlap(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_shared) for every train doc sharing ≥ min_overlap distinct
    word n-grams with the benchmark corpus."""
    bench_grams = (
        benchmark.select(F.explode(_ngrams(text_col, n)).alias("ng")).distinct()
    )
    train_grams = train.select(
        F.col(id_col).alias("doc_id"), F.explode(_ngrams(text_col, n)).alias("ng")
    )
    hits = train_grams.join(F.broadcast(bench_grams), "ng")
    out = hits.groupBy("doc_id").agg(F.count("*").alias("n_shared"))
    if min_overlap > 1:
        out = out.filter(F.col("n_shared") >= min_overlap)
    return out


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop contaminated docs: anti-join against the flagged set (the train
    frame keeps its schema; nothing but doc ids crosses the shuffle)."""
    flagged = ngram_overlap(
        docs, benchmark, n=n, min_overlap=min_overlap,
        text_col=text_col, id_col=id_col,
    ).select(F.col("doc_id").alias(id_col))
    return docs.join(flagged, id_col, "left_anti")
