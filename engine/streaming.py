"""Structured-Streaming parity (SURVEY.md §2.J — the reference's "real-time
refinement" loop, re-expressed as Spark streams).

* `stream_pages`        — continuous ingest of new page files (A-source).
* `refined_stream`      — the same vectorized refine stage (B1-B3) applied to
                          a stream; per-row semantics identical to batch
                          because the UDFs are shared.
* `windowed_counts`     — tumbling/sliding windowed aggregation with a
                          watermark for late pages (ES date_histogram-refresh
                          analogue).
* `sessionized`         — `session_window` aggregation (events parity).
* `IncrementalIndexer`  — `foreachBatch`: each micro-batch becomes one delta
                          segment (engine.index.encode_segment with
                          seg_id=batch_id) appended to the postings dir; a
                          `compact()` run merges delta segments into the
                          queryable index (Lucene NRT flush+merge analogue
                          [public: Lucene NRT]). Batch doc_ids continue from
                          a persisted offset so ids stay dense and stable.

Deterministic in tests via `trigger(availableNow=True)` + file sources.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def stream_pages(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """readStream over a directory of page parquet files (new files → new
    micro-batches; the continuous-ingest source of §2.J)."""
    reader = spark.readStream.schema(PAGES_SCHEMA).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def refined_stream(pages: DataFrame, lang: str | None = None) -> DataFrame:
    """Streaming refine: html_strip + lang filter. Dedup/doc_id assignment are
    per-batch concerns (stateless stream otherwise) — see IncrementalIndexer."""
    from .refine import html_strip_udf

    df = pages
    if lang is not None:
        df = df.filter(F.col("lang") == lang)
    return df.withColumn("text", html_strip_udf(F.col("html"))).drop("html")


def windowed_counts(
    pages: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str = "1 hour",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Watermarked tumbling/sliding counts per language — the streaming form
    of E6 date_histogram. Late pages inside the watermark update their
    window; later ones are dropped (ES refresh-interval analogue)."""
    w = (
        F.window(ts_col, window, slide)
        if slide is not None
        else F.window(ts_col, window)
    )
    return (
        pages.withWatermark(ts_col, watermark)
        .groupBy(w.alias("win"), "lang")
        .agg(F.count("*").alias("n_pages"))
        .select("win.start", "win.end", "lang", "n_pages")
    )


def sessionized(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """session_window aggregation: one row per (key, session) with event
    count and session bounds."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sess"), key_col)
        .agg(F.count("*").alias("n_events"))
        .select(key_col, "sess.start", "sess.end", "n_events")
    )


class IncrementalIndexer:
    """foreachBatch sink: micro-batch → refine → delta segment append.

    Layout under `root`:
      postings_delta/   one parquet append per micro-batch (seg_id = batch)
      doc_stats/        appended per batch
      state.json        {next_doc_id, n_docs, sum_dl, batches: [...]}

    `compact(spark)` merges all delta segments into a queryable index at
    `root/compacted` via the same segment-merge job the batch build uses
    (C7) — mirroring Lucene's NRT flush-then-merge lifecycle [public].

    avgdl drift: postings bake impact block maxima computed with the avgdl
    of their batch; compact() re-encodes with the global avgdl so scores are
    identical to a from-scratch batch build."""

    def __init__(
        self,
        root: str,
        n_buckets: int = 4,
        docs_per_shard: int = 1 << 20,
        block_size: int = 128,
        lang: str | None = None,
    ):
        self.root = root
        self.n_buckets = n_buckets
        self.docs_per_shard = docs_per_shard
        self.block_size = block_size
        self.lang = lang
        os.makedirs(root, exist_ok=True)

    # -- state ---------------------------------------------------------------
    @property
    def _state_path(self) -> str:
        return os.path.join(self.root, "state.json")

    def _load_state(self) -> dict:
        if os.path.exists(self._state_path):
            with open(self._state_path) as f:
                return json.load(f)
        return {"next_doc_id": 0, "n_docs": 0, "sum_dl": 0, "batches": []}

    def _save_state(self, st: dict) -> None:
        tmp = self._state_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(st, f)
        os.replace(tmp, self._state_path)

    # -- cross-batch latest-wins upsert (J5 — VERDICT r04 "What's wrong" #4) -
    def _fold_upsert(
        self, inc: DataFrame, batch_id: int, committed: list[int]
    ) -> DataFrame:
        """The streaming counterpart of the batch path's B5 invariant
        ("latest crawl wins", refine.dedup_latest): a URL re-crawled in a
        LATER micro-batch supersedes its earlier live doc instead of
        indexing as a second one.

        Per committed batch the indexer keeps `url_map/batch=<id>`
        (url, doc_id, warc_ts, _h). Incoming rows fight the latest prior
        entry for their url under the SAME ordering dedup_latest uses —
        (warc_ts desc, content-hash desc): a winning re-crawl tombstones the
        old doc_id (`tombstones/batch=<id>`, folded out at compact()); a
        stale out-of-order arrival is dropped. NOT implemented as
        `dropDuplicatesWithinWatermark(url)` upstream — that keeps the
        FIRST-seen row per url, the opposite of latest-wins.

        Scale shape: the url_map grows with the corpus, so the prior side is
        first semi-filtered by a BROADCAST of this batch's (tiny) url set —
        one map scan, no corpus-sized shuffle — and the surviving handful of
        rows broadcast back into the join against the batch.

        Replay safety: only maps of COMMITTED batches are read (an
        uncommitted crash-litter map for THIS batch must not make the replay
        lose to itself); both side outputs overwrite their batch-keyed dir.
        Tie ordering vs the batch path: the hash here is over the refined
        `text`; batch dedup_latest hashes raw html when it is present —
        equal-timestamp re-crawl ties may order differently (documented; the
        timestamp order, the actual ES upsert semantics, always agrees)."""
        spark = inc.sparkSession
        inc = inc.withColumn("_h", F.xxhash64("text"))
        paths = [
            os.path.join(self.root, "url_map", f"batch={b}") for b in committed
        ]
        paths = [p for p in paths if os.path.isdir(p)]
        if not paths:
            return inc
        from pyspark.sql import Window

        batch_urls = F.broadcast(inc.select("url").distinct())
        prev = (
            spark.read.parquet(*paths)
            .join(batch_urls, "url", "left_semi")
        )
        latest = (
            prev.withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("url").orderBy(
                        F.col("warc_ts").desc(), F.col("_h").desc(),
                        F.col("doc_id").desc(),
                    )
                ),
            )
            .filter(F.col("_rn") == 1)
            .select(
                "url",
                F.col("warc_ts").alias("_pts"),
                F.col("_h").alias("_ph"),
                F.col("doc_id").alias("_pid"),
            )
        )
        j = inc.join(F.broadcast(latest), "url", "left")
        wins = F.col("_pid").isNull() | (
            F.struct(F.col("warc_ts"), F.col("_h"))
            > F.struct(F.col("_pts"), F.col("_ph"))
        )
        j.filter(wins & F.col("_pid").isNotNull()).select(
            F.col("_pid").alias("doc_id")
        ).write.mode("overwrite").parquet(
            os.path.join(self.root, "tombstones", f"batch={int(batch_id)}")
        )
        return j.filter(wins).drop("_pts", "_ph", "_pid")

    # -- foreachBatch --------------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """One delta segment per micro-batch. Idempotent on batch_id replay
        (streaming restarts redeliver the last uncommitted batch)."""
        from .corpus import corpus_base, exploded_tf
        from .index import encode_segment
        from .refine import assign_doc_ids, dedup_latest, html_strip_udf

        st = self._load_state()
        if batch_id in st["batches"]:
            return  # replayed batch — already committed
        df = dedup_latest(batch_df)
        if self.lang is not None:
            df = df.filter(F.col("lang") == self.lang)
        # accept raw page batches (html present -> extract) AND already-
        # refined streams (refined_stream dropped html; text is final)
        if "html" in df.columns:
            df = df.withColumn("text", html_strip_udf(F.col("html"))).drop("html")
        df = self._fold_upsert(df, batch_id, st["batches"])
        docs = assign_doc_ids(df).withColumn(
            "doc_id", F.col("doc_id") + F.lit(int(st["next_doc_id"]))
        )
        # publish this batch's url → doc_id map (the upsert side input of
        # later batches); overwrite → idempotent on replay
        docs.select("url", "doc_id", "warc_ts", "_h").write.mode(
            "overwrite"
        ).parquet(os.path.join(self.root, "url_map", f"batch={int(batch_id)}"))
        base = corpus_base(docs.select("doc_id", "text")).cache()
        ds = base.select("doc_id", "dl")
        row = ds.agg(
            F.count("*").alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("s")
        ).collect()[0]
        n_batch, dl_batch = int(row["n"]), int(row["s"])
        # batch-local avgdl for block maxima; compact() re-encodes globally
        avgdl = (st["sum_dl"] + dl_batch) / max(1, st["n_docs"] + n_batch)
        seg = encode_segment(
            exploded_tf(base),
            avgdl,
            self.n_buckets,
            self.docs_per_shard,
            seg_id=int(batch_id),
            block_size=self.block_size,
        )
        # one subdir per batch, mode=overwrite → a replay after a crash
        # between the data write and the state commit rewrites (not
        # duplicates) the segment: idempotent exactly-once delta commits
        seg.write.mode("overwrite").parquet(
            os.path.join(self.root, "postings_delta", f"batch={int(batch_id)}")
        )
        ds.write.mode("overwrite").parquet(
            os.path.join(self.root, "doc_stats", f"batch={int(batch_id)}")
        )
        # per-batch term stats: postings carry only numeric tids, so the
        # string→tid dictionary is accumulated here and folded at compact()
        exploded_tf(base).groupBy("term").agg(
            F.count("*").alias("df"), F.sum("tf").alias("cf")
        ).write.mode("overwrite").parquet(
            os.path.join(self.root, "term_stats", f"batch={int(batch_id)}")
        )
        base.unpersist()
        st["next_doc_id"] += n_batch
        st["n_docs"] += n_batch
        st["sum_dl"] += dl_batch
        st["batches"].append(batch_id)
        self._save_state(st)

    def writer(self, refined: DataFrame):
        """Attach as: indexer.writer(stream).start()."""
        return (
            refined.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", os.path.join(self.root, "_stream_ckpt"))
            .trigger(availableNow=True)
        )

    # -- compaction ----------------------------------------------------------
    def compact(self, spark: SparkSession) -> str:
        """Merge all delta segments → queryable index at root/compacted
        (manifest + term_dict + doc_stats, same layout as build_index).

        Docs superseded by a cross-batch re-crawl (see _fold_upsert) are
        expunged here — the Lucene merge-drops-deleted-docs analogue
        [public: Lucene NRT]: global stats (n_docs, avgdl) come from the
        LIVE doc set, the dead postings are dropped distributed via the same
        (bucket, shard) cogroup delete_by_query's expunge uses, and df/cf
        are re-derived from the merged live postings — so the compacted
        index is value-identical to a batch build over the latest crawl of
        every url."""
        from .index import IndexManifest, build_term_dict
        from .merge import merge_postings

        st = self._load_state()
        out = os.path.join(self.root, "compacted")
        tomb_paths = [
            os.path.join(self.root, "tombstones", f"batch={b}")
            for b in st["batches"]
        ]
        tomb_paths = [p for p in tomb_paths if os.path.isdir(p)]
        tomb = spark.read.parquet(*tomb_paths).distinct() if tomb_paths else None

        ds = spark.read.parquet(os.path.join(self.root, "doc_stats")).select(
            "doc_id", "dl"  # drop the batch partition-discovery col
        )
        if tomb is not None:
            ds = ds.join(tomb, "doc_id", "left_anti")
        r = ds.agg(
            F.count("*").alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("s")
        ).collect()[0]
        n_docs = int(r["n"])
        avgdl = float(r["s"]) / max(1, n_docs)

        raw = spark.read.parquet(os.path.join(self.root, "postings_delta"))
        if tomb is not None:
            from .mutate import _POSTINGS_COLS, expunge_postings

            raw = expunge_postings(
                raw.select(*_POSTINGS_COLS), tomb, avgdl,
                self.block_size, self.n_buckets, self.docs_per_shard,
            )
        merged = merge_postings(raw, avgdl, block_size=self.block_size)
        from .io import write_postings_shards

        # the ONE postings sink (A3 layout contract) — keep batch build and
        # streaming compaction on the same code path
        write_postings_shards(merged, os.path.join(out, "postings"))
        # df/cf from the merged LIVE postings (a plain sum of the per-batch
        # stats would still count superseded docs); term strings come from
        # the accumulated per-batch term_stats dictionary
        from .index import term_id

        str_map = (
            spark.read.parquet(os.path.join(self.root, "term_stats"))
            .select("term")
            .distinct()
            .withColumn("tid", term_id(F.col("term")))
        )
        ts = (
            spark.read.parquet(os.path.join(out, "postings"))
            .groupBy("tid")
            .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
            .join(str_map, "tid")
            .select("term", "df", "cf")
        )
        build_term_dict(ts, self.n_buckets).write.mode("overwrite").parquet(
            os.path.join(out, "term_dict")
        )
        ds.write.mode("overwrite").parquet(os.path.join(out, "doc_stats"))
        manifest = IndexManifest(
            root=out,
            n_docs=n_docs,
            avgdl=avgdl,
            n_buckets=self.n_buckets,
            docs_per_shard=self.docs_per_shard,
            n_segments=len(st["batches"]),
            block_size=self.block_size,
        )
        with open(os.path.join(out, "manifest.json"), "w") as f:
            f.write(manifest.to_json())
        return out


def streaming_eql_sequence(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    step1,
    step2,
    maxspan_seconds: int,
    id_col: str = "event_id",
):
    """Streaming 2-step EQL sequence (the live analog of eql.eql_sequence)
    via `applyInPandasWithState` [public: Spark arbitrary stateful
    processing]: per-key state holds ONE running register — the latest
    step-1 (ts, id) — exactly the batch implementation's window register,
    carried across micro-batches instead of across window rows. Each batch
    is processed in (ts, id) order; a step-2 event emits when a live
    register exists within maxspan. Same non-consuming greedy semantics as
    the batch form; events arriving out of order ACROSS micro-batches
    follow live-stream semantics (a step-1 seen after its step-2 cannot
    match retroactively) — streamed == batch whenever the stream replays in
    event order, pinned by tests/test_streaming_eql.py.

    Scale shape: state is O(1) per key (one struct), the stream shuffles
    once on the key — the streaming twin of the batch plan's single
    key-partitioned window."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    flagged = events.withColumn("_is1", step1).withColumn("_is2", step2)
    flagged = flagged.filter(F.col("_is1") | F.col("_is2")).select(
        key_col, id_col, ts_col, "_is1", "_is2"
    )
    out_schema = (
        f"{key_col} long, {id_col} long, {ts_col} timestamp, "
        "gap_seconds long"
    )
    state_schema = "l1_us long, l1_id long"
    span_us = maxspan_seconds * 1_000_000

    def fn(key, pdf_iter, state: GroupState):
        if state.exists:
            l1_us, l1_id = state.get
            if l1_us == -1:  # the no-register sentinel round-trips as None
                l1_us, l1_id = None, None
        else:
            l1_us, l1_id = None, None
        out = []
        # Arrow may split one key's micro-batch rows across several chunks
        # in arbitrary order (ADVICE r04): a per-chunk sort would let a
        # step-1 in a later chunk miss its step-2 in an earlier one.
        # Concatenate the whole micro-batch for this key and sort ONCE —
        # safe because state is per-key and a single key's batch slice fits
        # in memory (the same bound the batch window already assumes).
        chunks = list(pdf_iter)
        pdf = (
            pd.concat(chunks, ignore_index=True) if chunks
            else pd.DataFrame(columns=[key_col, id_col, ts_col, "_is1", "_is2"])
        ).sort_values([ts_col, id_col])
        # normalize to epoch MICROS regardless of the pandas datetime
        # resolution Arrow hands over (ns in older pandas, us in 2.x)
        ts_us = pdf[ts_col].astype("datetime64[us]").astype("int64")
        for i in range(len(pdf)):
            t = int(ts_us.iloc[i])
            eid = int(pdf[id_col].iloc[i])
            if bool(pdf["_is2"].iloc[i]) and l1_us is not None:
                gap = t - l1_us
                if 0 <= gap <= span_us:
                    out.append(
                        (key[0], eid, pdf[ts_col].iloc[i],
                         gap // 1_000_000)
                    )
            # register update AFTER the match test: a row that is both
            # step-1 and step-2 matches against the PREVIOUS register
            # (the batch window is UNBOUNDED PRECEDING .. 1 PRECEDING)
            if bool(pdf["_is1"].iloc[i]):
                if l1_us is None or (t, eid) > (l1_us, l1_id):
                    l1_us, l1_id = t, eid
        state.update((l1_us if l1_us is not None else -1,
                      l1_id if l1_id is not None else -1))
        cols = [key_col, id_col, ts_col, "gap_seconds"]
        yield pd.DataFrame(out, columns=cols)

    return flagged.groupBy(key_col).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def percolate_stream(
    pages: DataFrame,
    queries: list[tuple[str, str]],
    out_path: str,
    checkpoint_path: str,
):
    """J8: streaming percolator — the ES alerting pattern (`percolate` on an
    ingest pipeline): every micro-batch of incoming pages is refined with the
    SAME analyzer as the index path and matched against the standing query
    set; (query_id, url) match rows append to a parquet alert sink.

    foreachBatch + the batch percolator keeps one code path for both modes
    (the broadcast query side and map-side-combined match aggregation are
    identical). Exactly-once: each batch OVERWRITES its own
    `batch_id=<n>` partition directory (idempotent replay — a batch
    re-run after a crash-before-checkpoint rewrites the same path instead
    of appending duplicates, the same discipline as IncrementalIndexer's
    idempotent segment names). At scale this is the canonical
    streaming-join-against-tiny-static shape — no state store needed
    because percolation is per-document."""
    import os

    from .percolate import percolate
    from .refine import html_strip_udf
    from .tokenizer import term_counts_udf

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df.withColumn("text", html_strip_udf(F.col("html")))
        toks = docs.select(
            F.col("url"),
            F.explode(term_counts_udf(F.col("text"))["terms"]).alias("term"),
        ).distinct()
        hits = percolate(toks, queries, id_col="url")
        hits.write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch_id={batch_id}")
        )

    return (
        pages.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
    )
