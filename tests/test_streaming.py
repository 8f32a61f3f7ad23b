"""§2.J streaming parity: continuous ingest, watermarked windows, session
windows, and the incremental (NRT-style) index whose compacted form must
score identically to a from-scratch batch build over the same corpus."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from engine.pages import generate_pages
from engine.streaming import (
    IncrementalIndexer,
    refined_stream,
    sessionized,
    stream_pages,
    windowed_counts,
)


def _write_pages_files(pdf, path, n_files):
    """Split a pandas pages frame into n parquet files (one per micro-batch
    when maxFilesPerTrigger=1)."""
    os.makedirs(path, exist_ok=True)
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    step = -(-len(pdf) // n_files)
    for i in range(n_files):
        chunk = table.slice(i * step, step)
        pq.write_table(
            chunk,
            os.path.join(path, f"pages-{i:03d}.parquet"),
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )


@pytest.fixture(scope="module")
def pages_dir(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("stream_pages"))
    # distinct urls per file: these tests pin the re-crawl-free baseline;
    # cross-batch upsert-by-url has its own equivalence test below
    # (test_cross_batch_recrawl_upsert_matches_batch)
    pdf = generate_pages(120, seed=11)
    pdf = pdf.drop_duplicates(subset=["url"], keep="last").reset_index(drop=True)
    _write_pages_files(pdf, base, n_files=3)
    return base


def test_stream_refine_matches_batch(spark, pages_dir, tmp_path):
    """Per-row refine invariant holds on the streaming path."""
    out = str(tmp_path / "refined")
    q = (
        refined_stream(stream_pages(spark, pages_dir))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    batch = spark.read.parquet(pages_dir)
    assert got.count() == batch.count()
    # text extracted on the stream == stored text (byte-identical invariant)
    joined = got.alias("s").join(batch.alias("b"), ["url", "warc_ts"])
    assert joined.filter(F.col("s.text") != F.col("b.text")).count() == 0


def test_windowed_counts_with_watermark(spark, pages_dir, tmp_path):
    q = (
        windowed_counts(stream_pages(spark, pages_dir), window="30 minutes")
        .writeStream.format("memory")
        .queryName("wc")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from wc").collect()
    # append mode emits only watermark-closed windows; totals are bounded by
    # the corpus and each row is a (window, lang) bucket with n >= 1
    assert all(r["n_pages"] >= 1 for r in rows)
    batch_total = spark.read.parquet(pages_dir).count()
    assert sum(r["n_pages"] for r in rows) <= batch_total


def test_session_windows(spark, tmp_path):
    import pandas as pd

    ev = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 10:00:00",
                    "2024-01-01 10:10:00",  # same session (gap 30m)
                    "2024-01-01 11:30:00",  # new session
                    "2024-01-01 10:00:00",
                    "2024-01-01 10:05:00",
                ]
            ),
        }
    )
    # a much-later sentinel event in a SECOND micro-batch advances the
    # watermark past every real session so append mode flushes them
    sentinel = pd.DataFrame(
        {"user_id": [99], "ts": pd.to_datetime(["2024-01-02 00:00:00"])}
    )
    src = str(tmp_path / "events")
    os.makedirs(src)
    for name, frame in [("ev-000.parquet", ev), ("ev-001.parquet", sentinel)]:
        pq.write_table(
            pa.Table.from_pandas(frame, preserve_index=False),
            os.path.join(src, name),
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        sessionized(stream, gap="30 minutes")
        .writeStream.format("memory")
        .queryName("sess")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        (r["user_id"], r["n_events"])
        for r in spark.sql("select * from sess").collect()
    }
    assert rows == {(1, 2), (1, 1), (2, 2)}


def test_incremental_index_matches_batch_build(spark, pages_dir, tmp_path):
    """NRT path: 3 micro-batches → delta segments → compact == batch build.

    doc_ids differ between the two paths only if batch boundaries reorder
    urls; the incremental indexer assigns per-batch dense ids, so we compare
    by url-identified text rank: top-k (url, score) must match exactly."""
    from engine.index import build_index
    from engine.refine import refine_pages
    from engine.searcher import LoadedIndex

    root = str(tmp_path / "inc")
    idx = IncrementalIndexer(root, n_buckets=4, block_size=32)
    q = idx.writer(stream_pages(spark, pages_dir, max_files_per_trigger=1)).start()
    q.awaitTermination(240)
    st = idx._load_state()
    assert len(st["batches"]) == 3, st
    compacted = idx.compact(spark)
    inc = LoadedIndex(spark, compacted)

    batch_root = str(tmp_path / "batch")
    pages = spark.read.parquet(pages_dir)
    docs = refine_pages(pages).select("doc_id", "url", "text")
    build_index(spark, docs.select("doc_id", "text"), batch_root, n_buckets=4, block_size=32)
    bat = LoadedIndex(spark, batch_root)

    assert inc.manifest.n_docs == bat.manifest.n_docs
    assert abs(inc.manifest.avgdl - bat.manifest.avgdl) < 1e-9

    # map each path's doc_id → url for comparison
    inc_docs = spark.read.parquet(os.path.join(root, "doc_stats"))
    for query in ["table scan", "merge join order", "the"]:
        a = inc.search(query, k=10).collect()
        b = bat.search(query, k=10).collect()
        scores_a = [r["score"] for r in a]
        scores_b = [r["score"] for r in b]
        assert scores_a == scores_b, (query, scores_a, scores_b)


def test_incremental_batch_replay_is_idempotent(spark, pages_dir, tmp_path):
    root = str(tmp_path / "inc2")
    idx = IncrementalIndexer(root, n_buckets=4, block_size=32)
    q = idx.writer(stream_pages(spark, pages_dir)).start()
    q.awaitTermination(240)
    st1 = idx._load_state()
    # simulate a foreachBatch redelivery of the last batch
    batch = spark.read.parquet(pages_dir)
    idx.process_batch(batch, st1["batches"][-1])
    st2 = idx._load_state()
    assert st1 == st2


def test_streaming_percolator_matches_batch(spark, pages_dir, tmp_path):
    """J8: streamed percolation == batch percolation over the same corpus
    (same analyzer, same standing queries); exactly-once parquet appends."""
    from engine.percolate import percolate
    from engine.refine import html_strip_udf
    from engine.streaming import percolate_stream
    from engine.tokenizer import term_counts_udf

    queries = [("q_table", "table scan"), ("q_merge", "merge"), ("q_none", "zzznope")]
    out = str(tmp_path / "alerts")
    q = percolate_stream(
        stream_pages(spark, pages_dir), queries, out, str(tmp_path / "pckpt")
    ).start()
    q.awaitTermination(120)

    got = {
        (r["query_id"], r["url"])
        for r in spark.read.parquet(out).select("query_id", "url").collect()
    }
    batch_pages = spark.read.parquet(pages_dir)
    docs = batch_pages.withColumn("text", html_strip_udf(F.col("html")))
    toks = docs.select(
        "url", F.explode(term_counts_udf(F.col("text"))["terms"]).alias("term")
    ).distinct()
    want = {
        (r["query_id"], r["url"])
        for r in percolate(toks, queries, id_col="url").collect()
    }
    assert got == want and want  # non-vacuous
    assert not any(qid == "q_none" for qid, _ in got)


def test_incremental_indexer_accepts_refined_stream(spark, pages_dir, tmp_path):
    """The documented composition writer(refined_stream(...)) must work:
    refined batches have no 'html' column (text already extracted)."""
    from engine.streaming import IncrementalIndexer

    idxr = IncrementalIndexer(str(tmp_path / "nrt_refined"), n_buckets=2)
    q = idxr.writer(refined_stream(stream_pages(spark, pages_dir))).start()
    q.awaitTermination(120)
    st = idxr._load_state()
    assert st["n_docs"] == spark.read.parquet(pages_dir).count()


def test_cross_batch_recrawl_upsert_matches_batch(spark, tmp_path):
    """J5 latest-wins upsert (VERDICT r04 #4): a url re-crawled in a LATER
    micro-batch supersedes its earlier live doc — including a re-crawl
    arriving TWO batches late, a two-hop supersede chain, and a stale
    out-of-order arrival that must be dropped. compact() output is value-
    identical to a batch build over the latest crawl of every url."""
    import datetime as dt

    import pandas as pd

    from engine.index import build_index
    from engine.pages import _TEMPLATE, generate_pages
    from engine.refine import refine_pages
    from engine.searcher import LoadedIndex

    def page(url, ts, text):
        return {
            "url": url, "warc_ts": ts,
            "html": _TEMPLATE.format(page=0, text=text).encode(),
            "text": text, "lang": "en",
        }

    t0 = dt.datetime(2024, 3, 1)
    day = dt.timedelta(days=1)
    bg = generate_pages(45, seed=23).drop_duplicates(
        subset=["url"], keep="last"
    ).reset_index(drop=True)
    f0 = pd.concat([bg.iloc[:15], pd.DataFrame([
        page("https://up.test/a", t0, "alpha beta zzorig"),
        page("https://up.test/b", t0, "alpha gamma zzfirst"),
    ])], ignore_index=True)
    f1 = pd.concat([bg.iloc[15:30], pd.DataFrame([
        page("https://up.test/b", t0 + day, "alpha gamma zzsecond"),
        page("https://up.test/c", t0, "delta zzkeep"),
    ])], ignore_index=True)
    f2 = pd.concat([bg.iloc[30:], pd.DataFrame([
        # re-crawl of /a arriving 2 batches late — must supersede zzorig
        page("https://up.test/a", t0 + 3 * day, "alpha beta zzlate"),
        # second hop of the /b chain — supersedes zzsecond
        page("https://up.test/b", t0 + 2 * day, "alpha gamma zzthird"),
        # STALE out-of-order arrival for /c (older ts) — must be dropped
        page("https://up.test/c", t0 - 3 * day, "delta zzstale"),
    ])], ignore_index=True)

    pages_path = str(tmp_path / "up_pages")
    os.makedirs(pages_path)
    for i, f in enumerate((f0, f1, f2)):
        pq.write_table(
            pa.Table.from_pandas(f, preserve_index=False),
            os.path.join(pages_path, f"pages-{i:03d}.parquet"),
            coerce_timestamps="us", allow_truncated_timestamps=True,
        )

    root = str(tmp_path / "up_inc")
    idx = IncrementalIndexer(root, n_buckets=4, block_size=32)
    q = idx.writer(stream_pages(spark, pages_path, max_files_per_trigger=1)).start()
    q.awaitTermination(240)
    assert len(idx._load_state()["batches"]) == 3
    inc = LoadedIndex(spark, idx.compact(spark))

    # superseded / stale texts are gone; the latest crawls are live
    for tok, n in [("zzorig", 0), ("zzfirst", 0), ("zzsecond", 0),
                   ("zzstale", 0), ("zzlate", 1), ("zzthird", 1), ("zzkeep", 1)]:
        assert len(inc.search(tok, k=5).collect()) == n, tok

    # full value-identity with a batch build over the same corpus
    batch_root = str(tmp_path / "up_batch")
    allp = spark.createDataFrame(pd.concat([f0, f1, f2], ignore_index=True))
    docs = refine_pages(allp).select("doc_id", "text")
    build_index(spark, docs, batch_root, n_buckets=4, block_size=32)
    bat = LoadedIndex(spark, batch_root)
    assert inc.manifest.n_docs == bat.manifest.n_docs
    assert abs(inc.manifest.avgdl - bat.manifest.avgdl) < 1e-9
    for query in ["alpha beta", "delta", "the table"]:
        a = [r["score"] for r in inc.search(query, k=10).collect()]
        b = [r["score"] for r in bat.search(query, k=10).collect()]
        assert a == b, (query, a, b)
