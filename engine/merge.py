"""Segment-merge job (SURVEY.md §2.C7; BASELINE.json:6 "a segment-merge job
combines sorted postings into queryable index shards").

Input: postings rows from 1+ segments and 1+ salt parts per (shard, term).
Output: one doc-ordered posting row per (shard, term) — or several `part`-
chained rows when a merged list exceeds `max_postings_per_row` (range-split
by doc_id so readers/WAND stream parts in order; bounds per-row memory for
stop-word-class terms at 10^12-doc scale).

Duplicate doc_ids across segments (a re-indexed document) resolve to the
highest seg_id — ES upsert semantics [public]. Grouped-map Arrow UDF with
NumPy-vectorized decode/merge/encode (mirrors Lucene segment merging
[public: Lucene merge policy]).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from . import BLOCK_SIZE
from .codec import decode_postings, encode_postings
from .index import POSTINGS_SCHEMA


_COLS = [f.name for f in POSTINGS_SCHEMA.fields]


def _merge_one_term(
    tid, bucket, shard, seg_col, skips_col, de_col, te_col, le_col,
    avgdl, block_size, max_postings_per_row, drop_ids=None,
):
    """Merge one (bucket, shard, tid)'s rows, given as column-array slices
    (zero-copy NumPy views — no per-group DataFrame materialization)."""
    ids_all, tfs_all, dls_all, segs_all = [], [], [], []
    for i in range(len(seg_col)):
        # decode_postings reads only the doc byte offsets out of skips and
        # accepts Arrow-struct dicts directly — no per-block tuple conversion
        ids, tfs, dls = decode_postings(de_col[i], te_col[i], le_col[i], skips_col[i])
        ids_all.append(ids)
        tfs_all.append(tfs)
        dls_all.append(dls)
        segs_all.append(np.full(len(ids), seg_col[i], dtype=np.int64))
    ids = np.concatenate(ids_all)
    tfs = np.concatenate(tfs_all)
    dls = np.concatenate(dls_all)
    segs = np.concatenate(segs_all)

    # sort by (doc_id, seg_id); keep the LAST occurrence per doc_id
    order = np.lexsort((segs, ids))
    ids, tfs, dls = ids[order], tfs[order], dls[order]
    keep = np.ones(len(ids), dtype=bool)
    keep[:-1] = ids[:-1] != ids[1:]
    ids, tfs, dls = ids[keep], tfs[keep], dls[keep]

    if drop_ids is not None and len(drop_ids) and len(ids):
        # expunge deletes during the merge (Lucene merges drop docs the
        # live-docs bitset marks dead [public]); drop_ids is sorted
        pos = np.searchsorted(drop_ids, ids)
        pos[pos >= len(drop_ids)] = len(drop_ids) - 1
        live = drop_ids[pos] != ids
        ids, tfs, dls = ids[live], tfs[live], dls[live]

    rows = []
    n = len(ids)
    if n == 0:
        return rows
    n_parts = max(1, -(-n // max_postings_per_row))
    for p in range(n_parts):
        s, e = p * max_postings_per_row, min((p + 1) * max_postings_per_row, n)
        enc = encode_postings(ids[s:e], tfs[s:e], dls[s:e], avgdl, block_size)
        rows.append(
            (
                tid, int(bucket), int(shard), 0, p,
                enc["df"], enc["cf"], enc["doc_ids_enc"], enc["tfs_enc"],
                enc["dls_enc"], enc["skips"], enc["block_max"],
            )
        )
    return rows


def _merge_stream_fn(
    avgdl: float, block_size: int, max_postings_per_row: int, drop_bc=None
):
    """Streaming merger for `mapInPandas` over partitions sorted by
    (bucket,shard,tid). All rows of a (bucket,shard,tid) land in the same
    partition (the shuffle key is a pure function of them), so each run is a
    complete merge group; runs spanning Arrow batches are carried over.
    No per-term Arrow dispatch (see index._encode_stream_fn).

    Works on per-column NumPy arrays: batch → arrays once, run slices are
    zero-copy views, and leftovers concatenate pointer arrays — pd.concat /
    .iloc row-frame copies of the big binary buffers are gone."""
    from .index import run_starts

    keys = ["bucket", "shard", "tid"]
    cols = ["bucket", "shard", "tid", "seg_id", "skips", "doc_ids_enc", "tfs_enc", "dls_enc"]

    def fn(batches):
        leftover: dict[str, np.ndarray] | None = None
        drop_ids = drop_bc.value if drop_bc is not None else None

        def merge_runs(arrs: dict[str, np.ndarray], starts: np.ndarray, end: int) -> pd.DataFrame:
            bounds = np.append(starts, end)
            tid_a, b_a, sh_a = arrs["tid"], arrs["bucket"], arrs["shard"]
            seg_a, sk_a = arrs["seg_id"], arrs["skips"]
            de_a, te_a, le_a = arrs["doc_ids_enc"], arrs["tfs_enc"], arrs["dls_enc"]
            rows: list[tuple] = []
            for i in range(len(bounds) - 1):
                s, e = int(bounds[i]), int(bounds[i + 1])
                rows.extend(
                    _merge_one_term(
                        int(tid_a[s]), int(b_a[s]), int(sh_a[s]),
                        seg_a[s:e], sk_a[s:e], de_a[s:e], te_a[s:e], le_a[s:e],
                        avgdl, block_size, max_postings_per_row, drop_ids,
                    )
                )
            return pd.DataFrame(rows, columns=_COLS)

        for pdf in batches:
            if not len(pdf):
                continue
            arrs = {c: pdf[c].to_numpy() for c in cols}
            if leftover is not None:
                arrs = {c: np.concatenate([leftover[c], arrs[c]]) for c in cols}
                leftover = None
            starts = run_starts([arrs[c] for c in keys])
            if len(starts) == 1:
                leftover = arrs
                continue
            last = int(starts[-1])
            # .copy() releases the batch's base arrays (a view would pin every
            # emitted row's buffers until the next batch); copies pointers only
            leftover = {c: arrs[c][last:].copy() for c in cols}
            yield merge_runs(arrs, starts[:-1], last)
        if leftover is not None and len(leftover["tid"]):
            yield merge_runs(leftover, np.array([0]), len(leftover["tid"]))

    return fn


def merge_postings(
    postings: DataFrame,
    avgdl: float,
    block_size: int = BLOCK_SIZE,
    max_postings_per_row: int = 1 << 20,
    drop_ids: np.ndarray | None = None,
) -> DataFrame:
    """One shuffle on (bucket, shard, tid) → merged, doc-ordered postings.

    repartition + sortWithinPartitions + mapInPandas: the term space of each
    shard spreads over all reducers (hash of the full key), Spark's external
    sort groups segment/salt rows of a term contiguously, and the streaming
    merger emits one output row per term (range-split into `part`s when a
    stop-word-class list exceeds max_postings_per_row).

    drop_ids: doc_ids to expunge during the merge (delete-by-query
    tombstones, engine.mutate). Shipped as a Spark broadcast of one sorted
    int64 array — the Lucene analog holds exactly this (a live-docs set per
    segment) in executor RAM; deletes are assumed << corpus size."""
    # explicit N: decode/merge/encode cost is Python CPU per row — AQE's
    # byte-based coalescing would undershoot parallelism (see encode_segment)
    spark = postings.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    drop_bc = None
    if drop_ids is not None and len(drop_ids):
        drop_bc = spark.sparkContext.broadcast(
            np.sort(np.asarray(drop_ids, dtype=np.int64))
        )
    return (
        postings.repartition(n_parts, "bucket", "shard", "tid")
        .sortWithinPartitions("bucket", "shard", "tid", "seg_id", "part")
        .mapInPandas(
            _merge_stream_fn(avgdl, block_size, max_postings_per_row, drop_bc),
            POSTINGS_SCHEMA,
        )
    )
