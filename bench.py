#!/usr/bin/env python
"""Headline benchmark — driver contract (TESTDATA.md; BASELINE.md).

Runs the engine's headline operations at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Phases (matching BASELINE.json's north rule):
  1. ``refine_pages``  — HTML-strip + tokenize over a deterministic synthetic
     Common-Crawl-style pages corpus (Arrow-vectorized UDF path, B1-B3).
  2. ``index_build``   — full inverted-index build (salted term shuffle →
     delta+varint postings with block-max metadata → segment merge) over the
     `documents` fixture.
  3. headline queries  — block-max WAND top-k BM25, exhaustive BM25,
     relational/agg/dedup/ANN representatives from `queries()`.

Extra top-level keys report docs/sec for the two build phases so the driver's
BENCH_r{N}.json carries the north-rule throughput numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_REFINE_PAGES = int(os.environ.get("BENCH_REFINE_PAGES", "8000"))

HEADLINE = [
    "bm25_and",
    "bm25_wand_hot_term",
    "bm25_wand_and",
    "bm25_wand_or",
    "bm25_wand_and_k100",
    "rel_pricing_summary",
    "rel_join_agg_topn",
    "agg_date_histogram",
    "agg_cardinality_grouped",
    "text_quality",
    "dedup_minhash_lsh",
    "ann_cosine_topk",
    # round-4 additions (VERDICT r03 #9) — additive; every prior name and
    # the reps policy stay fixed so r4-vs-r3 remains apples-to-apples
    "agg_funnel",
    "pack_sequences",
    "sample_shuffle",
    # round-5 additions (additive, same policy): substring-span dedup (the
    # new ExactSubstr pass — one shingle-hash exchange) and the french
    # analyzer chain (stopword + minimal-stem Catalyst exprs + exact BM25)
    "text_span_dedup",
    "bm25_french",
    # round-5d/e additions (additive, same policy): the ingest processor
    # chain (zero-shuffle codegen projection + broadcast enrich over the
    # documents table) — the new ingest surface's headline shape
    "ingest_pipeline",
]


def run_once(spark, sf_dir: str, cpus: int):
    """One full measurement pass. Caches are cleared first so every rep
    measures the same work (fresh corpus pass, fresh index build)."""
    from engine import registry
    from engine.pages import pages_df
    from engine.refine import refine_pages

    registry._CORPUS_CACHE.clear()
    registry._INDEX_CACHE.clear()
    registry._FR_CORPUS_CACHE.clear()  # bm25_french rebuilds its corpus too
    spark.catalog.clearCache()

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # -- 1. refine stage throughput over synthetic pages (north rule) -------
    pages = pages_df(spark, N_REFINE_PAGES, partitions=cpus * 2).cache()
    n_pages = pages.count()  # materialize input outside the timed window
    t0 = time.perf_counter()
    refined = refine_pages(pages)
    n_refined = refined.count()
    dt = time.perf_counter() - t0
    timings["refine_pages"] = round(dt, 3)
    # throughput denominator = INPUT pages processed (incl. the ~3% re-crawl
    # rows the dedup collapses); n_refined is reported separately
    extras["refine_pages_per_sec"] = round(n_pages / dt, 1)
    extras["n_input_pages"] = n_pages
    pages.unpersist()

    # -- 2. index build throughput (north rule), shared with WAND queries ---
    t0 = time.perf_counter()
    # fresh=True: discard the published on-disk cache so a REAL build is
    # timed (since round 5 _indexed reuses a complete cache by default)
    idx = registry._indexed(spark, sf_dir, fresh=True)
    dt = time.perf_counter() - t0
    timings["index_build"] = round(dt, 3)
    extras["index_docs_per_sec"] = round(idx.manifest.n_docs / dt, 1)

    # -- 3. headline queries -------------------------------------------------
    qs = registry.queries()
    for name in HEADLINE:
        t0 = time.perf_counter()
        rows = qs[name](spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        assert rows is not None

    # -- 4. batched query throughput (one scan answers the whole set) --------
    batch = {
        "b1": "table", "b2": "dup", "b3": "sort merge join",
        "b4": "window stream", "b5": "scan -filter", "b6": "customer order",
        "b7": "the", "b8": "index query value",
    }
    t0 = time.perf_counter()
    n_hits = idx.search_many(batch, k=10).count()
    dt = time.perf_counter() - t0
    timings["wand_batch_8"] = round(dt, 3)
    extras["batch_queries_per_sec"] = round(len(batch) / dt, 2)
    assert n_hits > 0

    return timings, extras, n_refined, idx.manifest.n_docs


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))
    reps = int(os.environ.get("BENCH_REPS", "2"))
    tag = os.path.basename(os.path.normpath(sf_dir))
    try:
        sf = float(tag.replace("sf", ""))
    except ValueError:
        sf = tag

    from engine.packaging import ensure_workers_can_import
    from engine.session import get_spark

    spark = get_spark("bench", cpus=cpus)
    ensure_workers_can_import(spark)

    # best-of-N: per-entry min over reps (throughputs: max). Single-shot
    # wall times at this scale carry 10-20% scheduler/JIT noise; the min is
    # the standard stable estimator for a warm single-node benchmark.
    timings = extras = None
    n_refined = n_docs = 0
    for _ in range(max(1, reps)):
        t, e, n_refined, n_docs = run_once(spark, sf_dir, cpus)
        if timings is None:
            timings, extras = t, e
        else:
            timings = {k: min(timings[k], t[k]) for k in t}
            extras = {k: max(extras[k], e[k]) for k in e}

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "reps": reps,
        "n_refined_docs": n_refined,
        "n_index_docs": n_docs,
        **extras,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
