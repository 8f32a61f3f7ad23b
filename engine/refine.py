"""Refine stage: per-document map operators (SURVEY.md §2.B).

The reference's core capability is the Elasticsearch map-reduce "refine" loop
(scan docs → Python map fns → reduce → reindex) [public: upstream README];
here every map fn is a vectorized pandas UDF (BASELINE.json:15 — no per-row
Python) and the reduce is Catalyst's hash aggregate.

html text extraction (B1): no bs4/lxml offline, so a pinned vectorized
regex pipeline implementing the documented behavior of the ES `html_strip`
char filter *plus* head-removal (boilerplate): drop <head>…</head>,
<script>…</script>, <style>…</style>, comments, all tags; decode the basic
HTML entities; collapse whitespace. The synthetic pages generator
(engine/pages.py) emits html whose extraction equals the `text` column
byte-for-byte, making the BASELINE.json:15 invariant self-verifying.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_RE_HEAD = re.compile(r"(?is)<head\b.*?</head>")
_RE_SCRIPT = re.compile(r"(?is)<script\b.*?</script>")
_RE_STYLE = re.compile(r"(?is)<style\b.*?</style>")
_RE_COMMENT = re.compile(r"(?s)<!--.*?-->")
_RE_TAG = re.compile(r"<[^>]*>")

_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # last, so &amp;lt; → &lt; (single-pass semantics)
]


def extract_text_series(html: pd.Series) -> pd.Series:
    """Vectorized B1 over a pandas Series of utf-8 bytes."""
    s = html.map(lambda b: b.decode("utf-8", errors="replace") if b is not None else "")
    s = s.str.replace(_RE_HEAD, " ", regex=True)
    s = s.str.replace(_RE_SCRIPT, " ", regex=True)
    s = s.str.replace(_RE_STYLE, " ", regex=True)
    s = s.str.replace(_RE_COMMENT, " ", regex=True)
    s = s.str.replace(_RE_TAG, " ", regex=True)
    for ent, ch in _ENTITIES:
        s = s.str.replace(ent, ch, regex=False)
    # collapse all whitespace runs to single spaces, strip ends
    return s.str.split().str.join(" ")


@F.pandas_udf(T.StringType())
def html_strip_udf(html: pd.Series) -> pd.Series:
    return extract_text_series(html)


def dedup_latest(pages: DataFrame, key: str = "url", ts: str = "warc_ts") -> DataFrame:
    """B5: one row per url, newest warc_ts wins (ES reindex-by-_id upsert
    semantics for re-crawled pages [public])."""
    w = Window.partitionBy(key).orderBy(F.col(ts).desc(), F.col(key))
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def assign_doc_ids(docs: DataFrame, order_col: str = "url") -> DataFrame:
    """B6: deterministic dense doc_id, stable across runs and parallelism.

    row_number over a global order by url — exact at test scale; the cost is
    one single-partition window (documented; SURVEY.md §7 risk 3). At 10^12
    docs use the sparse variant `xxhash64(url)` (collision-checked) or a
    two-level (partition_offset + local rank) scheme; the dense form is kept
    here because rank-identity fixtures (BASELINE.json:14) require stable
    small ids.
    """
    w = Window.orderBy(F.col(order_col))
    return docs.withColumn("doc_id", (F.row_number().over(w) - F.lit(1)).cast("long"))


def refine_pages(pages: DataFrame, lang: str | None = None) -> DataFrame:
    """Full refine stage: dedup → (optional) lang filter → extract text →
    deterministic doc_id.  Output: docs(doc_id, url, warc_ts, lang, text).

    The extracted text REPLACES the stored `text` column (the invariant says
    they are byte-identical; tests assert it on the full table)."""
    df = dedup_latest(pages)
    if lang is not None:
        df = df.filter(F.col("lang") == lang)
    df = df.withColumn("text", html_strip_udf(F.col("html"))).drop("html")
    return assign_doc_ids(df).select("doc_id", "url", "warc_ts", "lang", "text")


def refine_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """B7: per-partition doc/byte counters for the checkpoint manifest."""
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length(F.col(text_col))).alias("n_bytes"),
        )
        .withColumnRenamed("_pid", "partition_id")
    )
