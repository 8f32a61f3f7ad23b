"""Posting-list codec: delta-gap + varint compression with skip blocks.

Implements the structures BASELINE.json:6 mandates — "delta-gap +
varint-compressed posting lists with per-partition skip blocks and block-max
metadata" — following the published Lucene postings format family (ascending
docIDs, gap encoding, variable-byte integers, 128-doc blocks with skip/impact
metadata; [public: Lucene index format; Ding & Suel 2011, "Faster top-k
document retrieval using block-max indexes"]).

Everything here is pure NumPy (no Spark imports) so it is unit-testable and
runs vectorized inside Arrow-batched grouped UDFs. No per-element Python in
the hot paths: varint encode/decode loop over *byte positions* (≤10) not over
values.
"""

from __future__ import annotations

import numpy as np

from . import BLOCK_SIZE, BM25_B, BM25_K1

_U7 = np.uint64(7)
_U0x7F = np.uint64(0x7F)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-style variable-byte encode of a uint64 array (vectorized)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b""
    # bytes needed per value
    nb = np.ones(n, dtype=np.int64)
    tmp = v >> _U7
    while tmp.any():
        nb += tmp > 0
        tmp = tmp >> _U7
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nb, out=offs[1:])
    out = np.zeros(offs[-1], dtype=np.uint8)
    for j in range(int(nb.max())):
        mask = nb > j
        idx = offs[:-1][mask] + j
        byte = ((v[mask] >> np.uint64(7 * j)) & _U0x7F).astype(np.uint8)
        cont = (nb[mask] - 1 > j).astype(np.uint8) << 7
        out[idx] = byte | cont
    return out.tobytes()


def varint_decode(buf: bytes | bytearray | memoryview) -> np.ndarray:
    """Decode a varint byte stream back to a uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    ends = np.flatnonzero((b & 0x80) == 0)  # last byte of each value
    n = len(ends)
    starts = np.empty(n, dtype=np.int64)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    nb = ends - starts + 1
    vals = np.zeros(n, dtype=np.uint64)
    for j in range(int(nb.max())):
        mask = nb > j
        vals[mask] |= (b[starts[mask] + j].astype(np.uint64) & _U0x7F) << np.uint64(
            7 * j
        )
    return vals


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    """Ascending int array → first value + gaps (gap-1 for strictly asc ids)."""
    ids = np.ascontiguousarray(sorted_ids, dtype=np.int64)
    if len(ids) == 0:
        return ids.astype(np.uint64)
    gaps = np.empty(len(ids), dtype=np.uint64)
    gaps[0] = np.uint64(ids[0])
    if len(ids) > 1:
        d = np.diff(ids)
        if (d <= 0).any():
            raise ValueError("doc_ids must be strictly ascending")
        gaps[1:] = d.astype(np.uint64)
    return gaps


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    return np.cumsum(gaps.astype(np.int64))


def bm25_impact(
    tfs: np.ndarray, dls: np.ndarray, avgdl: float, k1: float = BM25_K1, b: float = BM25_B
) -> np.ndarray:
    """Per-posting BM25 impact (the idf-free factor):
    tf / (tf + k1*(1 - b + b*dl/avgdl)).  Monotone in tf, bounded by 1.
    [public: Lucene BM25Similarity, LUCENE-8563 (k1+1 factor dropped)]."""
    tf = tfs.astype(np.float64)
    dl = dls.astype(np.float64)
    return tf / (tf + k1 * (1.0 - b + b * dl / float(avgdl)))


def encode_postings(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    avgdl: float,
    block_size: int = BLOCK_SIZE,
) -> dict:
    """Encode one term's posting list.

    Returns dict with:
      doc_ids_enc: bytes   delta-gap + varint of ascending doc_ids
      tfs_enc:     bytes   varint of term frequencies (aligned with doc_ids)
      dls_enc:     bytes   varint of doc lengths (the norm stream — baked in
                           so shards are self-contained for scoring + merge,
                           the analog of Lucene's per-segment norms [public])
      skips:       list[(first_doc, doc_off, tf_off, dl_off, max_impact)]
      block_max:   float   max impact over the whole list
      df:          int, cf: int
    Block offsets are *byte* offsets so a reader can seek a block without
    decoding prior blocks (skip data per Lucene's skip lists [public]).
    """
    order = np.argsort(doc_ids, kind="stable")
    ids = np.asarray(doc_ids, dtype=np.int64)[order]
    tf = np.asarray(tfs, dtype=np.int64)[order]
    dl = np.asarray(dls, dtype=np.int64)[order]
    n = len(ids)
    impacts = bm25_impact(tf, dl, avgdl)

    doc_parts: list[bytes] = []
    tf_parts: list[bytes] = []
    dl_parts: list[bytes] = []
    skips: list[tuple[int, int, int, int, float]] = []
    doc_off = 0
    tf_off = 0
    dl_off = 0
    for s in range(0, n, block_size):
        e = min(s + block_size, n)
        blk_ids = ids[s:e]
        gaps = np.empty(e - s, dtype=np.uint64)
        gaps[0] = np.uint64(blk_ids[0])  # each block restarts from absolute id
        if e - s > 1:
            gaps[1:] = np.diff(blk_ids).astype(np.uint64)
        d = varint_encode(gaps)
        t = varint_encode(tf[s:e].astype(np.uint64))
        l = varint_encode(dl[s:e].astype(np.uint64))
        skips.append(
            (int(blk_ids[0]), doc_off, tf_off, dl_off, float(impacts[s:e].max()))
        )
        doc_parts.append(d)
        tf_parts.append(t)
        dl_parts.append(l)
        doc_off += len(d)
        tf_off += len(t)
        dl_off += len(l)
    return {
        "doc_ids_enc": b"".join(doc_parts),
        "tfs_enc": b"".join(tf_parts),
        "dls_enc": b"".join(dl_parts),
        "skips": skips,
        "block_max": float(impacts.max()) if n else 0.0,
        "df": int(n),
        "cf": int(tf.sum()) if n else 0,
    }


def decode_postings(
    doc_ids_enc: bytes, tfs_enc: bytes, dls_enc: bytes, skips
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a full posting list → (doc_ids asc, tfs, dls) int64 arrays.

    Blocks are delta-restarted, so doc_ids decode per block using byte
    offsets; tf/dl streams are plain varint concatenations."""
    if not skips:
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    ids_out: list[np.ndarray] = []
    n_blocks = len(skips)
    for i in range(n_blocks):
        d0 = skips[i][1]
        d1 = skips[i + 1][1] if i + 1 < n_blocks else len(doc_ids_enc)
        gaps = varint_decode(doc_ids_enc[d0:d1])
        ids_out.append(np.cumsum(gaps.astype(np.int64)))
    tfs = varint_decode(tfs_enc).astype(np.int64)
    dls = varint_decode(dls_enc).astype(np.int64)
    return np.concatenate(ids_out), tfs, dls


def decode_block(
    doc_ids_enc: bytes, tfs_enc: bytes, dls_enc: bytes, skips, i: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode only block i — the skip-pointer seek path used by WAND."""
    n_blocks = len(skips)
    d0 = skips[i][1]
    d1 = skips[i + 1][1] if i + 1 < n_blocks else len(doc_ids_enc)
    t0 = skips[i][2]
    t1 = skips[i + 1][2] if i + 1 < n_blocks else len(tfs_enc)
    l0 = skips[i][3]
    l1 = skips[i + 1][3] if i + 1 < n_blocks else len(dls_enc)
    ids = np.cumsum(varint_decode(doc_ids_enc[d0:d1]).astype(np.int64))
    tfs = varint_decode(tfs_enc[t0:t1]).astype(np.int64)
    dls = varint_decode(dls_enc[l0:l1]).astype(np.int64)
    return ids, tfs, dls
