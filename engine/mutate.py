"""Delete-by-query / update-by-query / expunge-deletes — the index mutation
surface (ES `_delete_by_query`, `_update_by_query`, `_forcemerge
?only_expunge_deletes` [public ES docs]; SURVEY.md §2.A5's mutation half).

The ES/Lucene model [public]: a delete only MARKS the doc dead in a
per-segment live-docs bitset; searches skip dead docs immediately; a later
segment merge drops them physically. An update is delete + reindex under a
fresh internal doc id. The Spark-first re-expression:

* tombstones are a parquet table of doc_ids under `<index>/tombstones` —
  appended by `delete_by_query`, routed per shard to the search UDF via a
  cogroup (engine/searcher.py — the delete set is never broadcast whole),
  folded away by `expunge_deletes`;
* `expunge_deletes` is a SHUFFLE-FREE `mapInPandas` over posting rows:
  decode → drop dead ids → re-encode. Block-max metadata is recomputed with
  the post-delete avgdl (a smaller avgdl RAISES per-posting impacts, so
  stale maxima would under-bound and break WAND's pruning soundness).
  term_dict df/cf and doc_stats/manifest stats are rebuilt distributed;
* `update_by_query` tombstones the matched docs and reindexes their
  transformed text as a NEW segment under fresh doc_ids in fresh shards,
  then runs the ordinary segment merge with the tombstones as drop_ids —
  the result is value-identical to a from-scratch build over the
  transformed corpus (tests/test_mutate.py pins this equivalence).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .codec import decode_doc_ids, decode_postings, encode_postings
from .index import POSTINGS_SCHEMA, IndexManifest, term_id
from .search import parse_query
from .searcher import LoadedIndex

_POSTINGS_COLS = [f.name for f in POSTINGS_SCHEMA.fields]


# ---------------------------------------------------------------------------
# matching (the "query" half of delete/update-by-query)


def _shard_match_fn(tids: list[int], neg_tids: list[int], mode: str):
    """Grouped-map body: one shard's posting rows → matching doc_ids.
    No scoring, no heap, no k — a pure posting-list union/intersection, so
    delete-by-query never pays top-k machinery for an unbounded match set."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        def ids_of(t: int) -> np.ndarray | None:
            rows = pdf[pdf["tid"] == t]
            if not len(rows):
                return None
            parts = [
                decode_doc_ids(r.doc_ids_enc, r.skips)
                for r in rows.itertuples(index=False)
            ]
            return np.concatenate(parts)

        per_term = [ids_of(t) for t in tids]
        present = [p for p in per_term if p is not None]
        empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64")})
        if mode == "and":
            if len(present) < len(tids) or not present:
                return empty
            ids = present[0]
            for p in present[1:]:
                ids = np.intersect1d(ids, p, assume_unique=True)
        else:
            if not present:
                return empty
            ids = np.unique(np.concatenate(present))
        for t in neg_tids:
            if not len(ids):
                break
            n_ids = ids_of(t)
            if n_ids is not None:
                ids = np.setdiff1d(ids, n_ids, assume_unique=True)
        return pd.DataFrame({"doc_id": ids})

    return fn


def match_doc_ids(index: LoadedIndex, query: str, mode: str = "or") -> DataFrame:
    """All doc_ids matching `query` → DataFrame(doc_id). The scan is the same
    pruned posting fetch the ranked path uses (bucket partition pruning + tid
    pushdown); per shard the UDF unions/intersects decoded id lists."""
    q = parse_query(query)
    found = index._lookup(q.terms + q.must_not)
    terms = [t for t in q.terms if t in found]
    if not terms or (mode == "and" and len(terms) < len(q.terms)):
        return index.spark.createDataFrame([], "doc_id long")
    neg = [t for t in q.must_not if t in found]
    tids = [found[t][2] for t in terms]
    neg_tids = [found[t][2] for t in neg]
    buckets = sorted({found[t][1] for t in terms + neg})
    rows = index.postings.filter(
        F.col("bucket").isin(buckets) & F.col("tid").isin(tids + neg_tids)
    )
    return rows.groupBy("shard").applyInPandas(
        _shard_match_fn(tids, neg_tids, mode), "doc_id long"
    )


# ---------------------------------------------------------------------------
# tombstones


def tombstone_path(root: str) -> str:
    return os.path.join(root, "tombstones")


def write_tombstones(root: str, doc_ids: DataFrame) -> None:
    """Append delete marks. Append-mode parquet: each delete_by_query is one
    additional file set; readers union and distinct."""
    doc_ids.select(F.col("doc_id").cast("long").alias("doc_id")).distinct().write.mode(
        "append"
    ).parquet(tombstone_path(root))


def load_tombstones(spark: SparkSession, root: str) -> DataFrame | None:
    p = tombstone_path(root)
    return spark.read.parquet(p).distinct() if os.path.isdir(p) else None


def delete_by_query(index: LoadedIndex, query: str, mode: str = "or") -> int:
    """ES _delete_by_query [public]: mark every match deleted; searches on
    this (re-loaded) index skip them immediately; expunge_deletes folds them
    into the postings. Returns the number of newly tombstoned docs."""
    matched = match_doc_ids(index, query, mode)
    before = load_tombstones(index.spark, index.root)
    if before is not None:
        matched = matched.join(before, "doc_id", "left_anti")
    matched = matched.cache()
    n = matched.count()
    if n:
        write_tombstones(index.root, matched)
        index.tombstones = load_tombstones(index.spark, index.root)
    matched.unpersist()
    return n


# ---------------------------------------------------------------------------
# expunge


def _expunge_rows_fn(drop_bc, avgdl: float, block_size: int):
    """Row-local rewrite: decode → drop dead ids → re-encode with the
    post-delete avgdl. No shuffle — posting rows stay where they are."""

    def fn(batches):
        drop = drop_bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            cols = {c: pdf[c].to_numpy() for c in _POSTINGS_COLS}
            out = []
            for i in range(len(pdf)):
                ids, tfs, dls = decode_postings(
                    cols["doc_ids_enc"][i], cols["tfs_enc"][i],
                    cols["dls_enc"][i], cols["skips"][i],
                )
                if len(drop) and len(ids):
                    pos = np.searchsorted(drop, ids)
                    pos[pos >= len(drop)] = len(drop) - 1
                    live = drop[pos] != ids
                    ids, tfs, dls = ids[live], tfs[live], dls[live]
                if not len(ids):
                    continue  # every posting was deleted — drop the row
                enc = encode_postings(ids, tfs, dls, avgdl, block_size)
                out.append(
                    (
                        int(cols["tid"][i]), int(cols["bucket"][i]),
                        int(cols["shard"][i]), int(cols["seg_id"][i]),
                        int(cols["part"][i]),
                        enc["df"], enc["cf"], enc["doc_ids_enc"], enc["tfs_enc"],
                        enc["dls_enc"], enc["skips"], enc["block_max"],
                    )
                )
            yield pd.DataFrame(out, columns=_POSTINGS_COLS)

    return fn


def _corpus_totals(ds: DataFrame) -> tuple[int, float]:
    r = ds.agg(
        F.count("*").alias("n"), F.coalesce(F.sum("dl"), F.lit(0)).alias("s")
    ).collect()[0]
    n = int(r["n"])
    return n, (float(r["s"]) / n if n else 0.0)


def _swap_in(root: str, name: str) -> None:
    """Atomically replace <root>/<name> with <root>/<name>.tmp."""
    final, tmp = os.path.join(root, name), os.path.join(root, name + ".tmp")
    old = os.path.join(root, name + ".old")
    if os.path.isdir(old):
        shutil.rmtree(old)
    if os.path.isdir(final):
        os.rename(final, old)
    os.rename(tmp, final)
    if os.path.isdir(old):
        shutil.rmtree(old)


def _rewrite_term_dict(
    spark: SparkSession, root: str, str_map: DataFrame, n_buckets: int
) -> None:
    """Rebuild term_dict df/cf by aggregating the (already written) new
    postings per tid, joined back to the term-string map; terms whose last
    posting died drop out via the inner join."""
    stats = (
        spark.read.parquet(os.path.join(root, "postings.tmp"))
        .groupBy("tid")
        .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
    )
    (
        stats.join(str_map, "tid")
        .select(
            "term", "tid", "df", "cf",
            F.pmod(F.col("tid"), F.lit(n_buckets)).cast("int").alias("bucket"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(root, "term_dict.tmp"))
    )


def _write_manifest(m: IndexManifest) -> None:
    with open(os.path.join(m.root, "manifest.json"), "w") as f:
        f.write(m.to_json())


def expunge_deletes(spark: SparkSession, root: str) -> IndexManifest:
    """Physically drop tombstoned docs from the postings and refresh every
    corpus statistic (ES _forcemerge?only_expunge_deletes [public]). After
    this, scores equal a from-scratch build over the surviving corpus."""
    manifest = IndexManifest.load(root)
    tomb = load_tombstones(spark, root)
    if tomb is None:
        return manifest
    drop = np.sort(
        np.fromiter(
            (r["doc_id"] for r in tomb.collect()), dtype=np.int64
        )
    )
    if not len(drop):
        shutil.rmtree(tombstone_path(root))
        return manifest
    drop_bc = spark.sparkContext.broadcast(drop)

    ds_new = spark.read.parquet(os.path.join(root, "doc_stats")).join(
        tomb, "doc_id", "left_anti"
    )
    ds_new.write.mode("overwrite").parquet(os.path.join(root, "doc_stats.tmp"))
    n_docs, avgdl = _corpus_totals(
        spark.read.parquet(os.path.join(root, "doc_stats.tmp"))
    )

    from .io import write_postings_shards

    old_postings = spark.read.parquet(os.path.join(root, "postings"))
    write_postings_shards(
        old_postings.mapInPandas(
            _expunge_rows_fn(drop_bc, avgdl, manifest.block_size), POSTINGS_SCHEMA
        ),
        os.path.join(root, "postings.tmp"),
    )
    str_map = spark.read.parquet(os.path.join(root, "term_dict")).select("term", "tid")
    _rewrite_term_dict(spark, root, str_map, manifest.n_buckets)

    for name in ("postings", "term_dict", "doc_stats"):
        _swap_in(root, name)
    shutil.rmtree(tombstone_path(root))
    manifest.n_docs = n_docs
    manifest.avgdl = avgdl
    _write_manifest(manifest)
    return manifest


# ---------------------------------------------------------------------------
# update-by-query


def update_by_query(
    spark: SparkSession,
    root: str,
    docs: DataFrame,
    predicate,
    transform,
    key_col: str = "doc_id",
) -> tuple[IndexManifest, DataFrame]:
    """ES _update_by_query [public]: delete + reindex each matched doc under
    a FRESH internal doc_id (matching ES, where an update writes a new
    internal doc id and the live-docs bitset kills the old one — a plain
    seg_id upsert would leave the old doc's stale terms searchable), while
    the external identity (`key_col`: the ES _id analog — a url, a user id,
    or the original doc_id) stays stable.

    docs: the indexed corpus (doc_id, <key_col>, text). predicate: Column
    filter selecting docs to update. transform: fn(DataFrame) -> DataFrame
    mapping the matched docs to their new `text` (key preserved).

    One segment-merge pass does reindex + expunge together (drop_ids), so
    the returned index needs no separate expunge and is value-identical to
    a from-scratch build over the transformed corpus. Returns (manifest,
    mapping DataFrame(doc_id, key)) — search hits join back to stable keys
    via it.
    """
    from .corpus import corpus_base, exploded_tf
    from .index import encode_segment
    from .io import write_postings_shards
    from .merge import merge_postings
    from .refine import assign_doc_ids

    manifest = IndexManifest.load(root)
    matched = docs.filter(predicate)
    # ES _update_by_query only processes LIVE docs: a doc already tombstoned
    # by delete_by_query must not be resurrected just because the predicate
    # matches it — exclude prior tombstones from the reindex set. The prior
    # ids are MATERIALIZED to the driver (this pass deletes the tombstone
    # dir at the end; a lazy anti-join would re-read deleted files through
    # the returned mapping's lineage), which costs the same O(tombstones)
    # collect the expunge merge below already pays for `drop`.
    prior = load_tombstones(spark, root)
    prior_ids = (
        np.sort(
            np.fromiter((r["doc_id"] for r in prior.collect()), dtype=np.int64)
        )
        if prior is not None
        else np.empty(0, dtype=np.int64)
    )
    if len(prior_ids):
        matched = matched.filter(~F.col("doc_id").isin([int(x) for x in prior_ids]))
    dead = matched.select("doc_id").cache()
    # fold any pre-existing delete_by_query tombstones into the same merge —
    # this pass clears the tombstone dir, so it must expunge them too
    live_dead = np.sort(
        np.fromiter((r["doc_id"] for r in dead.collect()), dtype=np.int64)
    )
    drop = np.union1d(live_dead, prior_ids)
    # rebuilt from the materialized ids: later joins against this frame must
    # not carry lineage into the tombstone parquet (deleted at the end)
    all_dead = spark.createDataFrame(
        [(int(x),) for x in drop], "doc_id long"
    )
    if not len(drop):
        dead.unpersist()
        # consistent (doc_id, key) mapping shape on the empty path too
        return manifest, docs.select(
            "doc_id", F.col(key_col).alias("key")
        ).limit(0)

    # fresh ids in fresh shards — the "new segment" of the ES model
    max_id = int(
        spark.read.parquet(os.path.join(root, "doc_stats"))
        .agg(F.max("doc_id"))
        .collect()[0][0]
    )
    offset = ((max_id // manifest.docs_per_shard) + 1) * manifest.docs_per_shard
    new_docs = assign_doc_ids(
        transform(matched).select(F.col(key_col).alias("key"), "text"),
        order_col="key",
    ).withColumn("doc_id", F.col("doc_id") + F.lit(offset))

    base = corpus_base(new_docs.select("doc_id", "text")).cache()
    ds_delta = base.select("doc_id", "dl")

    # post-update global stats: survivors + the reindexed docs
    ds_keep = spark.read.parquet(os.path.join(root, "doc_stats")).join(
        all_dead, "doc_id", "left_anti"
    )
    ds_keep.unionByName(ds_delta).write.mode("overwrite").parquet(
        os.path.join(root, "doc_stats.tmp")
    )
    n_docs, avgdl = _corpus_totals(
        spark.read.parquet(os.path.join(root, "doc_stats.tmp"))
    )

    tf_delta = exploded_tf(base)
    delta = encode_segment(
        tf_delta,
        avgdl,
        manifest.n_buckets,
        manifest.docs_per_shard,
        seg_id=manifest.n_segments,
        block_size=manifest.block_size,
    )
    old_postings = spark.read.parquet(os.path.join(root, "postings"))
    merged = merge_postings(
        old_postings.select(*_POSTINGS_COLS).unionByName(delta),
        avgdl,
        block_size=manifest.block_size,
        drop_ids=drop,
    )
    write_postings_shards(merged, os.path.join(root, "postings.tmp"))

    # term strings: old dictionary ∪ terms the transform introduced
    old_td = spark.read.parquet(os.path.join(root, "term_dict"))
    delta_strs = tf_delta.select(
        "term", term_id(F.col("term")).alias("tid")
    ).distinct()
    str_map = old_td.select("term", "tid").unionByName(delta_strs).distinct()
    _rewrite_term_dict(spark, root, str_map, manifest.n_buckets)

    for name in ("postings", "term_dict", "doc_stats"):
        _swap_in(root, name)
    if os.path.isdir(tombstone_path(root)):
        shutil.rmtree(tombstone_path(root))
    base.unpersist()
    dead.unpersist()
    manifest.n_docs = n_docs
    manifest.avgdl = avgdl
    manifest.n_segments = 1
    _write_manifest(manifest)

    updated = (
        docs.join(all_dead, "doc_id", "left_anti")
        .select("doc_id", F.col(key_col).alias("key"))
        .unionByName(new_docs.select("doc_id", "key"))
    )
    return manifest, updated
