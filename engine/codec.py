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


def _varint_encode_offsets(
    values: np.ndarray, boundaries: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """LEB128-style variable-byte encode of a uint64 array (vectorized),
    plus the byte offset of each requested value index.

    Because each value's encoding is independent, the whole-stream encode is
    byte-identical to concatenating per-block encodes — so one call replaces
    a per-block Python loop and `boundaries` yields the skip byte offsets."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b"", np.zeros(len(boundaries), dtype=np.int64)
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
    bo = offs[boundaries] if len(boundaries) else np.empty(0, dtype=np.int64)
    return out.tobytes(), bo


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-style variable-byte encode of a uint64 array (vectorized)."""
    return _varint_encode_offsets(values, np.empty(0, dtype=np.int64))[0]


def _varint_decode_starts(
    buf: bytes | bytearray | memoryview,
) -> tuple[np.ndarray, np.ndarray]:
    """Decode a varint byte stream → (uint64 values, start byte of each value)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
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
    return vals, starts


def varint_decode(buf: bytes | bytearray | memoryview) -> np.ndarray:
    """Decode a varint byte stream back to a uint64 array (vectorized)."""
    return _varint_decode_starts(buf)[0]


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


def _bit_length(v: np.ndarray) -> np.ndarray:
    """Exact vectorized integer bit length for non-negative int64 (0 → 0).
    float64 log2 is NOT exact near powers of two for v ≥ ~2^49 (2^k − 1 can
    round up to k.0 — ADVICE r04), so the log2 estimate is corrected with
    two integer shift checks, which are exact for the full int64 range."""
    nb = np.zeros(len(v), dtype=np.int64)
    pos = v > 0
    if pos.any():
        vv = v[pos].astype(np.uint64)  # uint64: 1 << 63 must not overflow
        est = np.floor(np.log2(vv.astype(np.float64))).astype(np.int64) + 1
        # log2 rounded down near 2^k → estimate one short
        est = np.where(vv >> np.minimum(est, 63).astype(np.uint64) > 0, est + 1, est)
        # log2 rounded up at 2^k − 1 → estimate one long
        low = np.uint64(1) << np.minimum(np.maximum(est - 1, 0), 63).astype(np.uint64)
        est = np.where(vv < low, est - 1, est)
        nb[pos] = est
    return nb


def int_to_byte4(values: np.ndarray) -> np.ndarray:
    """Lucene SmallFloat.intToByte4 [public: Lucene SmallFloat.java]: the
    1-byte norm encoding BM25Similarity stores per doc. Values 0..7 encode
    as themselves ("subnormal", exponent field 0); larger values keep the
    top 4 significant bits — 3 stored (the leading 1 is implicit) plus
    exponent shift+1: byte = ((v >>> shift) & 7) | ((shift + 1) << 3) with
    shift = bitlength(v) − 4. Monotone, so norm ORDER is preserved.
    Vectorized; exact for the full non-negative int64 range (integer
    bit-length, no float rounding)."""
    v = np.asarray(values, dtype=np.int64)
    if (v < 0).any():
        raise ValueError("norms must be non-negative")
    numbits = _bit_length(v)
    shift = np.maximum(numbits - 4, 0)
    enc_norm = ((v >> shift) & 0x07) | ((shift + 1) << 3)
    return np.where(numbits < 4, v, enc_norm).astype(np.uint8)


def byte4_to_int(b: np.ndarray) -> np.ndarray:
    """Lucene SmallFloat.byte4ToInt inverse [public]: byte → the quantized
    norm value (the value BM25 scoring actually uses)."""
    bb = np.asarray(b).astype(np.int64) & 0xFF
    bits = bb & 0x07
    shift = (bb >> 3) - 1
    return np.where(shift < 0, bits, (bits | 0x08) << np.maximum(shift, 0))


def quantize_norm(dls: np.ndarray) -> np.ndarray:
    """Lossy doc-length (norm) quantization — VALUE-IDENTICAL to Lucene's
    1-byte SmallFloat norm table: quantize_norm(v) ==
    byte4_to_int(int_to_byte4(v)) for every v (property-tested exhaustively
    in tests/test_norms.py), computed directly on int64 without the byte
    round-trip. Keeps the top 4 significant bits (identity below 16, which
    covers Lucene's subnormal 0..7 and the shift-0 band 8..15). Monotone
    (order of doc lengths is preserved), idempotent, relative error < 1/8.
    Default OFF so scores match the exact NumPy/DuckDB oracles unless a
    caller opts into ES-style emulation."""
    dl = np.asarray(dls, dtype=np.int64)
    out = dl.copy()
    mask = dl >= 16
    if mask.any():
        v = dl[mask]
        # number of bits − 4 = shift that keeps the top 4 significant bits
        shift = _bit_length(v) - 4
        out[mask] = (v >> shift) << shift
    return out


def bm25_impact(
    tfs: np.ndarray, dls: np.ndarray, avgdl: float, k1: float = BM25_K1, b: float = BM25_B
) -> np.ndarray:
    """Per-posting BM25 impact (the idf-free factor):
    tf / (tf + k1*(1 - b + b*dl/avgdl)).  Monotone in tf, bounded by 1.
    [public: Lucene BM25Similarity, LUCENE-8563 (k1+1 factor dropped)]."""
    tf = tfs.astype(np.float64)
    dl = dls.astype(np.float64)
    return tf / (tf + k1 * (1.0 - b + b * dl / float(avgdl)))


def _f32_ceil(x: np.ndarray) -> np.ndarray:
    """Smallest float32 array >= x (elementwise): the safe direction for
    impact UPPER bounds that will be stored as parquet FloatType."""
    f = x.astype(np.float32)
    low = f.astype(np.float64) < x
    if low.any():
        f[low] = np.nextafter(f[low], np.float32(np.inf))
    return f


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
    if n == 0:
        return {
            "doc_ids_enc": b"", "tfs_enc": b"", "dls_enc": b"",
            "skips": [], "block_max": 0.0, "df": 0, "cf": 0,
        }
    impacts = bm25_impact(tf, dl, avgdl)

    # One vectorized pass over the whole list: the gap stream with per-block
    # restarts (gaps[block start] = absolute id) encodes byte-identically to
    # concatenated per-block encodes, and the skip byte offsets fall out of
    # the encoder's cumulative byte counts — no per-block Python loop.
    starts = np.arange(0, n, block_size, dtype=np.int64)
    gaps = np.empty(n, dtype=np.uint64)
    gaps[0] = np.uint64(ids[0])
    if n > 1:
        gaps[1:] = np.diff(ids).astype(np.uint64)
    gaps[starts] = ids[starts].astype(np.uint64)  # each block restarts absolute
    doc_enc, doc_offs = _varint_encode_offsets(gaps, starts)
    tf_enc, tf_offs = _varint_encode_offsets(tf.astype(np.uint64), starts)
    dl_enc, dl_offs = _varint_encode_offsets(dl.astype(np.uint64), starts)
    # UPPER bounds must survive the float32 parquet round-trip (SKIP_STRUCT
    # stores FloatType): cast-to-nearest can round BELOW the true float64
    # impact, which would make WAND's block skip unsound (a doc whose exact
    # score beats θ could sit in a skipped block). Round up to the next
    # float32 wherever the cast decreased the value.
    block_maxes = _f32_ceil(np.maximum.reduceat(impacts, starts))
    skips = list(
        zip(
            ids[starts].tolist(),
            doc_offs.tolist(),
            tf_offs.tolist(),
            dl_offs.tolist(),
            block_maxes.tolist(),
        )
    )
    return {
        "doc_ids_enc": doc_enc,
        "tfs_enc": tf_enc,
        "dls_enc": dl_enc,
        "skips": skips,
        "block_max": float(_f32_ceil(np.asarray([impacts.max()]))[0]),
        "df": int(n),
        "cf": int(tf.sum()),
    }


def decode_postings(
    doc_ids_enc: bytes, tfs_enc: bytes, dls_enc: bytes, skips
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode a full posting list → (doc_ids asc, tfs, dls) int64 arrays.

    Blocks are delta-restarted; the whole gap stream decodes in one
    vectorized pass, then a per-block correction (the naive cumsum carries
    the previous blocks' sum into each restarted block) is subtracted with
    `np.repeat` — no per-block Python loop. Skip entries may be tuples,
    Spark Rows, or Arrow-struct dicts; only the doc byte offset is read."""
    if skips is None or len(skips) == 0:  # len(): skips may be a numpy array
        z = np.empty(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    gaps, vstarts = _varint_decode_starts(doc_ids_enc)
    ids = np.cumsum(gaps.astype(np.int64))
    n_blocks = len(skips)
    if n_blocks > 1:
        if isinstance(skips[0], dict):
            doc_offs = np.fromiter(
                (s["doc_off"] for s in skips), dtype=np.int64, count=n_blocks
            )
        else:
            doc_offs = np.fromiter(
                (s[1] for s in skips), dtype=np.int64, count=n_blocks
            )
        bstarts = np.searchsorted(vstarts, doc_offs)
        reps = np.diff(np.append(bstarts, len(gaps)))
        corr = np.zeros(n_blocks, dtype=np.int64)
        corr[1:] = ids[bstarts[1:] - 1]
        ids = ids - np.repeat(corr, reps)
    tfs = varint_decode(tfs_enc).astype(np.int64)
    dls = varint_decode(dls_enc).astype(np.int64)
    return ids, tfs, dls


def decode_doc_ids(doc_ids_enc: bytes, skips) -> np.ndarray:
    """Decode ONLY the doc_id stream (delta-restarted gaps → absolute ids).
    Match-only consumers (delete/update-by-query) need no tf/dl values, so
    skipping those two varint decodes roughly cuts the match-scan decode
    cost to a third."""
    if skips is None or len(skips) == 0:
        return np.empty(0, dtype=np.int64)
    gaps, vstarts = _varint_decode_starts(doc_ids_enc)
    ids = np.cumsum(gaps.astype(np.int64))
    n_blocks = len(skips)
    if n_blocks > 1:
        if isinstance(skips[0], dict):
            doc_offs = np.fromiter(
                (s["doc_off"] for s in skips), dtype=np.int64, count=n_blocks
            )
        else:
            doc_offs = np.fromiter(
                (s[1] for s in skips), dtype=np.int64, count=n_blocks
            )
        bstarts = np.searchsorted(vstarts, doc_offs)
        reps = np.diff(np.append(bstarts, len(gaps)))
        corr = np.zeros(n_blocks, dtype=np.int64)
        corr[1:] = ids[bstarts[1:] - 1]
        ids = ids - np.repeat(corr, reps)
    return ids


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
