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


def _merge_fn(avgdl: float, block_size: int, max_postings_per_row: int):
    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        term, bucket, shard = key
        ids_all, tfs_all, dls_all, segs_all = [], [], [], []
        for r in pdf.itertuples(index=False):
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
                {
                    "term": term,
                    "bucket": int(bucket),
                    "shard": int(shard),
                    "seg_id": 0,
                    "part": p,
                    "df": enc["df"],
                    "cf": enc["cf"],
                    "doc_ids_enc": enc["doc_ids_enc"],
                    "tfs_enc": enc["tfs_enc"],
                    "dls_enc": enc["dls_enc"],
                    "skips": enc["skips"],
                    "block_max": enc["block_max"],
                }
            )
        return pd.DataFrame(rows)

    return fn


def merge_postings(
    postings: DataFrame,
    avgdl: float,
    block_size: int = BLOCK_SIZE,
    max_postings_per_row: int = 1 << 20,
) -> DataFrame:
    """One shuffle on (term, bucket, shard) → merged, doc-ordered postings."""
    return postings.groupBy("term", "bucket", "shard").applyInPandas(
        _merge_fn(avgdl, block_size, max_postings_per_row), POSTINGS_SCHEMA
    )
