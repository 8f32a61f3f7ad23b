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


def _merge_one_term(tid, bucket, shard, group: pd.DataFrame, avgdl, block_size, max_postings_per_row):
    ids_all, tfs_all, dls_all, segs_all = [], [], [], []
    for r in group.itertuples(index=False):
        skips = [tuple(s.values()) if isinstance(s, dict) else tuple(s) for s in r.skips]
        ids, tfs, dls = decode_postings(r.doc_ids_enc, r.tfs_enc, r.dls_enc, skips)
        ids_all.append(ids)
        tfs_all.append(tfs)
        dls_all.append(dls)
        segs_all.append(np.full(len(ids), r.seg_id, dtype=np.int64))
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

    rows = []
    n = len(ids)
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


def _merge_stream_fn(avgdl: float, block_size: int, max_postings_per_row: int):
    """Streaming merger for `mapInPandas` over partitions sorted by
    (bucket,shard,tid). All rows of a (bucket,shard,tid) land in the same
    partition (the shuffle key is a pure function of them), so each run is a
    complete merge group; runs spanning Arrow batches are carried over.
    No per-term Arrow dispatch (see index._encode_stream_fn)."""
    from .index import sorted_run_starts

    keys = ["bucket", "shard", "tid"]

    def fn(batches):
        leftover: pd.DataFrame | None = None

        def merge_runs(pdf: pd.DataFrame, starts: np.ndarray, end: int) -> pd.DataFrame:
            bounds = np.append(starts, end)
            rows: list[tuple] = []
            for i in range(len(bounds) - 1):
                g = pdf.iloc[int(bounds[i]) : int(bounds[i + 1])]
                r0 = g.iloc[0]
                rows.extend(
                    _merge_one_term(
                        int(r0["tid"]), int(r0["bucket"]), int(r0["shard"]), g,
                        avgdl, block_size, max_postings_per_row,
                    )
                )
            return pd.DataFrame(rows, columns=_COLS)

        for pdf in batches:
            if leftover is not None:
                pdf = pd.concat([leftover, pdf], ignore_index=True)
                leftover = None
            if not len(pdf):
                continue
            starts = sorted_run_starts(pdf, keys)
            if len(starts) == 1:
                leftover = pdf
                continue
            last = int(starts[-1])
            leftover = pdf.iloc[last:].reset_index(drop=True)
            yield merge_runs(pdf, starts[:-1], last)
        if leftover is not None and len(leftover):
            yield merge_runs(leftover, np.array([0]), len(leftover))

    return fn


def merge_postings(
    postings: DataFrame,
    avgdl: float,
    block_size: int = BLOCK_SIZE,
    max_postings_per_row: int = 1 << 20,
) -> DataFrame:
    """One shuffle on (bucket, shard, tid) → merged, doc-ordered postings.

    repartition + sortWithinPartitions + mapInPandas: the term space of each
    shard spreads over all reducers (hash of the full key), Spark's external
    sort groups segment/salt rows of a term contiguously, and the streaming
    merger emits one output row per term (range-split into `part`s when a
    stop-word-class list exceeds max_postings_per_row)."""
    # explicit N: decode/merge/encode cost is Python CPU per row — AQE's
    # byte-based coalescing would undershoot parallelism (see encode_segment)
    n_parts = int(postings.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return (
        postings.repartition(n_parts, "bucket", "shard", "tid")
        .sortWithinPartitions("bucket", "shard", "tid", "seg_id", "part")
        .mapInPandas(_merge_stream_fn(avgdl, block_size, max_postings_per_row), POSTINGS_SCHEMA)
    )
