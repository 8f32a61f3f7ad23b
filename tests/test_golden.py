"""Rank-identity against the frozen golden fixtures (BASELINE.json:14).

Covers BOTH engines (exact SQL scorer and index-backed block-max WAND) on
BOTH corpora (driver `documents` fixture; full pages pipeline: synthetic
pages → dedup → html_strip refine → doc_id → index → search)."""

import glob
import json
import os

import numpy as np
import pytest

from engine.corpus import corpus_stats, term_stats, tf_table, tokens, with_tokens
from engine.index import build_index
from engine.io import read_fixture
from engine.pages import pages_df
from engine.refine import refine_pages
from engine.search import exact_search
from engine.searcher import LoadedIndex

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def _load(corpus):
    out = []
    for p in sorted(glob.glob(os.path.join(GOLDEN_DIR, f"{corpus}_*.json"))):
        with open(p) as f:
            out.append(json.load(f))
    return out


def _build_exact(docs):
    dwt = with_tokens(docs)
    tf = tf_table(tokens(dwt)).cache()
    ds = dwt.select("doc_id", "dl").cache()
    ts = term_stats(tf).cache()
    n, avgdl = corpus_stats(ds)
    return tf, ds, ts, n, avgdl


@pytest.fixture(scope="module")
def documents_built(spark):
    docs = read_fixture(spark, "/root/testdata/sf0.001", "documents")
    return _build_exact(docs)


@pytest.fixture(scope="module")
def pages_docs(spark):
    # full refine pipeline — goldens were generated from the same spec
    return refine_pages(pages_df(spark, 2000, seed=42)).cache()


@pytest.fixture(scope="module")
def pages_built(pages_docs):
    return _build_exact(pages_docs)


@pytest.fixture(scope="module")
def pages_index(spark, pages_docs, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pages_idx") / "idx")
    build_index(spark, pages_docs.select("doc_id", "text"), root,
                n_buckets=8, docs_per_shard=512, n_segments=2, hot_df=500)
    return LoadedIndex(spark, root)


def _assert_hits(got_rows, g):
    assert [r["doc_id"] for r in got_rows] == [h["doc_id"] for h in g["hits"]], g["query"]
    np.testing.assert_allclose(
        [r["score"] for r in got_rows],
        [h["score"] for h in g["hits"]],
        rtol=1e-6,
    )


def test_documents_exact_matches_golden(documents_built):
    tf, ds, ts, n, avgdl = documents_built
    for g in _load("documents"):
        got = exact_search(tf, ds, ts, n, avgdl, g["query"], k=g["k"],
                           mode=g["mode"], round_to=None).collect()
        _assert_hits(got, g)


def test_pages_pipeline_exact_matches_golden(pages_built):
    tf, ds, ts, n, avgdl = pages_built
    for g in _load("pages2k"):
        got = exact_search(tf, ds, ts, n, avgdl, g["query"], k=g["k"],
                           mode=g["mode"], round_to=None).collect()
        _assert_hits(got, g)


def test_pages_pipeline_wand_matches_golden(pages_index):
    for g in _load("pages2k"):
        got = pages_index.search(g["query"], k=g["k"], mode=g["mode"],
                                 round_to=None).collect()
        _assert_hits(got, g)
