"""Text-analysis operator tests (language-ID, quality, tokens, fingerprints)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from engine.io import read_fixture
from engine.textops import (
    language_id,
    language_id_udf,
    quality_score,
    rolling_hash_udf,
    with_fingerprint,
    with_quality_metrics,
    with_token_counts,
)


def test_language_id_samples():
    assert language_id("the cat sat on the mat and it was good") == "en"
    assert language_id("le chat est dans la maison et il est content") == "fr"
    assert language_id("el gato es grande y la casa es bonita") == "es"
    assert language_id("der hund ist nicht klein und das haus ist gross") == "de"
    assert language_id("这是一个中文句子没有空格") == "zh"
    assert language_id("xyzzy qwerty plugh") == "und"
    assert language_id("") == "und"


def test_language_id_udf_spark(spark):
    df = spark.createDataFrame(
        [("the cat and the dog was here",), ("le chat est dans la maison",)],
        "text string",
    )
    out = [r[0] for r in df.select(language_id_udf("text")).collect()]
    assert out == ["en", "fr"]


def test_quality_metrics(spark, sf_dir):
    docs = read_fixture(spark, sf_dir, "documents")
    m = with_quality_metrics(docs).collect()
    for r in m[:50]:
        toks = r["text"].split(" ")
        assert r["n_tokens"] == len(toks)
        assert r["n_chars_q"] == len(r["text"])
        assert r["punct_ratio"] == 0.0  # fixture text is pure alnum+space
        assert 0.0 <= r["stopword_ratio"] <= 1.0
    q = quality_score(docs)
    vals = [r["quality_score"] for r in q.collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)
    assert any(v >= 0.75 for v in vals)  # clean fixture docs score high


def test_token_counts(spark, sf_dir):
    docs = read_fixture(spark, sf_dir, "documents")
    t = with_token_counts(docs).collect()
    for r in t[:50]:
        assert r["ws_tokens"] == len(r["text"].split())
        assert r["bpe_est_tokens"] >= r["ws_tokens"]  # subwords ≥ words


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, " HELLO\tWORLD ")],
        "doc_id long, text string",
    )
    fps = [r["fingerprint"] for r in with_fingerprint(df).collect()]
    assert fps[0] == fps[1] == fps[2]


def test_rolling_hash_deterministic_and_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "c b a")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["h"] for r in df.select("doc_id", rolling_hash_udf("text").alias("h")).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]
