"""Index-backed query execution (SURVEY.md §3.2 lifecycle).

Mirrors the ES query-then-fetch search lifecycle [public]:
  analyze query (same analyzer as indexing)
   → term-dict lookup (tiny driver collect: global df / bucket per term)
   → partition-pruned posting fetch (`bucket IN (...) AND term IN (...)`
     reaches the Parquet scan as partition pruning + predicate pushdown)
   → per-shard block-max WAND top-k inside a grouped Arrow UDF
   → coordinating merge: global TakeOrderedAndProject(k, score DESC, doc ASC)

idf uses GLOBAL corpus stats from the manifest/term_dict (like ES
dfs_query_then_fetch — pinned so scores are shard-count-invariant).
"""

from __future__ import annotations

import math
import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .index import IndexManifest
from .search import parse_query
from .wand import TermCursor, exhaustive_topk, intersect_topk, wand_topk

TOPK_SCHEMA = "doc_id long, score double"


def _pin_shard_parallelism(df):
    """Pin the width of the per-shard scoring exchange. AQE coalesces this
    shuffle by BYTES — a few hundred pruned posting rows collapse to ONE
    post-shuffle partition, serializing the Python WAND stage even though
    its cost is CPU per shard, not bytes (measured 2x on the 8-query batch
    at sf0.1). Explicit repartition(N, shard) opts this one exchange out of
    coalescing, exactly like encode_segment does for the encode stage."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    return df.repartition(n, "shard")


def _pack_rows(rows: pd.DataFrame) -> list[dict]:
    """One term's posting rows → the cursor wire format (part-sorted, skip
    entries as plain tuples). The per-skip conversion is the expensive part
    — batch search packs each tid ONCE and shares the result across every
    query's cursor (engine/wand.py TermCursor also shares decoded blocks)."""
    rs = rows.sort_values("part")
    return [
        {
            "doc_ids_enc": r.doc_ids_enc,
            "tfs_enc": r.tfs_enc,
            "dls_enc": r.dls_enc,
            "skips": [
                (
                    s["first_doc"] if isinstance(s, dict) else s[0],
                    s["doc_off"] if isinstance(s, dict) else s[1],
                    s["tf_off"] if isinstance(s, dict) else s[2],
                    s["dl_off"] if isinstance(s, dict) else s[3],
                    s["max_impact"] if isinstance(s, dict) else s[4],
                )
                for s in r.skips
            ],
        }
        for r in rs.itertuples(index=False)
    ]


def _rows_to_cursor(rows: pd.DataFrame, idf: float, avgdl: float) -> TermCursor:
    return TermCursor(_pack_rows(rows), idf, avgdl)


def _shard_topk_fn(
    terms: list[int],
    idfs: dict[int, float],
    must_not: list[int],
    avgdl: float,
    k: int,
    mode: str,
    algo: str,
    after: tuple[float, int] | None = None,
    min_match: int = 1,
    round_to: int | None = 4,
):
    """Grouped-map UDF body: one shard's posting rows → local top-k.
    `terms`/`must_not` are numeric tids (term_dict resolves strings).
    The returned fn is single-parameter (a 2-arg grouped-map fn would be
    treated as fn(key, pdf) by PySpark); the tombstone-aware core rides on
    `fn.core` for the cogrouped delete-by-query path."""

    def core(pdf: pd.DataFrame, not_ids=None) -> pd.DataFrame:
        # one pass over the shard frame (dict of sub-frames keyed by tid)
        # instead of a full boolean mask per term — O(R), not O(T*R)
        by_tid = {t: g for t, g in pdf.groupby("tid")}
        cursors = []
        for t in terms:
            rows = by_tid.get(t)
            if rows is not None and len(rows):
                cursors.append(_rows_to_cursor(rows, idfs[t], avgdl))
        neg = []
        for t in must_not:
            rows = by_tid.get(t)
            if rows is not None and len(rows):
                neg.append(_rows_to_cursor(rows, 0.0, avgdl))
        if not cursors or (mode == "and" and len(cursors) < len(terms)):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "score": pd.Series(dtype="float64")})
        if algo == "exhaustive":
            from .codec import decode_postings

            lists = []
            for c in cursors:
                import numpy as np

                ids_parts, tf_parts, dl_parts = [], [], []
                for r in c.rows:
                    i, t_, d_ = decode_postings(
                        r["doc_ids_enc"], r["tfs_enc"], r["dls_enc"], r["skips"]
                    )
                    ids_parts.append(i)
                    tf_parts.append(t_)
                    dl_parts.append(d_)
                lists.append(
                    (
                        np.concatenate(ids_parts),
                        np.concatenate(tf_parts),
                        np.concatenate(dl_parts),
                        c.idf,
                    )
                )
            mn_ids = None
            if neg:
                import numpy as np

                parts = []
                for c in neg:
                    for r in c.rows:
                        i, _, _ = decode_postings(
                            r["doc_ids_enc"], r["tfs_enc"], r["dls_enc"], r["skips"]
                        )
                        parts.append(i)
                mn_ids = np.concatenate(parts) if parts else None
            if not_ids is not None and len(not_ids):
                import numpy as np

                mn_ids = (
                    np.concatenate([mn_ids, not_ids]) if mn_ids is not None else not_ids
                )
            hits = exhaustive_topk(
                lists, k, avgdl, mode=mode, must_not_ids=mn_ids, after=after,
                min_match=min_match, round_to=round_to,
            )
        elif mode == "and":
            hits = intersect_topk(
                cursors, k, must_not=neg, after=after, not_ids=not_ids,
                round_to=round_to,
            )
        else:
            hits = wand_topk(
                cursors, k, must_not=neg, after=after, not_ids=not_ids,
                min_match=min_match, round_to=round_to,
            )
        return pd.DataFrame(
            {"doc_id": [h[0] for h in hits], "score": [h[1] for h in hits]}
        )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return core(pdf)

    fn.core = core
    return fn


def _shard_tree_fn(
    tree,
    pos_tids: dict[str, int],
    neg_tids: dict[str, int],
    idfs: dict[str, float],
    avgdl: float,
    k: int,
    after: tuple[float, int] | None = None,
    round_to: int | None = 4,
):
    """Grouped-map UDF body for NESTED bool trees (engine/boolquery.py): one
    shard's posting rows → local top-k under wand_tree_topk. Same shape as
    _shard_topk_fn; cursors are keyed by term string because tree
    evaluation is term-name-based."""
    from .wand import wand_tree_topk

    def core(pdf: pd.DataFrame, not_ids=None) -> pd.DataFrame:
        by_tid = {t: g for t, g in pdf.groupby("tid")}
        pos: dict[str, TermCursor] = {}
        for term, tid in pos_tids.items():
            rows = by_tid.get(tid)
            if rows is not None and len(rows):
                pos[term] = _rows_to_cursor(rows, idfs[term], avgdl)
        neg: dict[str, TermCursor] = {}
        for term, tid in neg_tids.items():
            rows = by_tid.get(tid)
            if rows is not None and len(rows):
                neg[term] = _rows_to_cursor(rows, 0.0, avgdl)
        if not pos:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype="int64"), "score": pd.Series(dtype="float64")}
            )
        hits = wand_tree_topk(
            tree, pos, k, neg_cursors=neg, after=after, not_ids=not_ids,
            round_to=round_to,
        )
        return pd.DataFrame(
            {"doc_id": [h[0] for h in hits], "score": [h[1] for h in hits]}
        )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return core(pdf)

    fn.core = core
    return fn


def _shard_topk_cogroup_fn(core):
    """Cogrouped-map wrapper: (shard's posting rows, shard's tombstone rows)
    → local top-k. Tombstones ride the same shard key as the postings —
    per-shard live-docs arrive WITH the shard's work, no broadcast of the
    global delete set (the distributed analog of Lucene's per-segment
    live-docs [public])."""
    import numpy as np

    def fn(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        not_ids = (
            np.sort(right["doc_id"].to_numpy(dtype="int64")) if len(right) else None
        )
        return core(left, not_ids)  # core returns its own empty-schema frame

    return fn


class LoadedIndex:
    """Queryable handle over an on-disk index built by engine.index.build_index."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.manifest = IndexManifest.load(root)
        self.postings = spark.read.parquet(os.path.join(root, "postings"))
        self.term_dict = spark.read.parquet(os.path.join(root, "term_dict"))
        self.doc_stats = spark.read.parquet(os.path.join(root, "doc_stats"))
        self._td_cache: dict[str, tuple[int, int]] = {}
        # delete-by-query marks (engine.mutate): applied to every search
        # until expunge_deletes folds them into the postings (ES semantics)
        tomb = os.path.join(root, "tombstones")
        self.tombstones = spark.read.parquet(tomb) if os.path.isdir(tomb) else None

    def _lookup(self, terms: list[str]) -> dict[str, tuple[int, int, int]]:
        """D2 term-dict seek → {term: (df, bucket, tid)} (tiny collect)."""
        missing = [t for t in terms if t not in self._td_cache]
        if missing:
            for r in self.term_dict.filter(F.col("term").isin(missing)).collect():
                self._td_cache[r["term"]] = (int(r["df"]), int(r["bucket"]), int(r["tid"]))
        return {t: self._td_cache[t] for t in terms if t in self._td_cache}

    def idf(self, df: int) -> float:
        n = self.manifest.n_docs
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def search(
        self,
        query: str,
        k: int = 10,
        mode: str = "or",
        algo: str = "wand",
        round_to: int | None = 4,
        after: tuple[float, int] | None = None,
        exclude: DataFrame | None = None,
        min_should_match: int = 1,
        analyzer: str | None = None,
    ) -> DataFrame:
        """Top-k → DataFrame(doc_id, score) ordered (score desc, doc_id asc).

        algo: 'wand' (block-max, default) | 'exhaustive' (oracle path).
        after: resumable ranked cursor [public: ES search_after] — the
        (score, doc_id) of the last hit of the previous page; only hits
        sorting strictly after it are returned (pushed into the per-shard
        top-k heap, so deep pagination never widens k per shard).
        exclude: DataFrame(doc_id) of docs to treat as deleted, ON TOP of any
        persisted tombstones — routed per shard via a cogroup so the delete
        set is never broadcast whole (engine.mutate.delete_by_query)."""
        idx_an = getattr(self.manifest, "analyzer", "standard")
        if analyzer is not None and analyzer != idx_an:
            # rank-identity invariant: query analysis MUST match the config
            # recorded in the index manifest (an english-stemmed index
            # queried with standard-analyzed terms silently misses) —
            # loud failure, never a silent wrong answer
            raise ValueError(
                f"query analyzer {analyzer!r} != index analyzer {idx_an!r} "
                "(the index manifest pins the analysis chain)"
            )
        q = parse_query(query, idx_an)
        found = self._lookup(q.terms + q.must_not)
        terms = [t for t in q.terms if t in found]
        empty = self.spark.createDataFrame([], TOPK_SCHEMA)
        if (
            not terms
            or (mode == "and" and len(terms) < len(q.terms))
            or len(terms) < min_should_match
        ):
            return empty
        neg = [t for t in q.must_not if t in found]
        tids = [found[t][2] for t in terms]
        neg_tids = [found[t][2] for t in neg]
        idfs = {found[t][2]: self.idf(found[t][0]) for t in terms}
        buckets = sorted({found[t][1] for t in terms + neg})
        # D3: bucket is the file-partition column → partition pruning; tid is
        # a numeric Parquet pushdown predicate over tid-sorted files
        rows = self.postings.filter(
            F.col("bucket").isin(buckets) & F.col("tid").isin(tids + neg_tids)
        )
        core = _shard_topk_fn(
            tids, idfs, neg_tids, self.manifest.avgdl, k, mode, algo, after,
            min_should_match, round_to,
        )
        dead = self.tombstones.select("doc_id") if self.tombstones is not None else None
        if exclude is not None:
            ex = exclude.select("doc_id")
            dead = ex if dead is None else dead.unionByName(ex).distinct()
        if dead is not None:
            tomb = dead.select(
                F.col("doc_id").cast("long").alias("doc_id"),
                (F.col("doc_id") / F.lit(self.manifest.docs_per_shard))
                .cast("int")
                .alias("shard"),
            )
            local = (
                _pin_shard_parallelism(rows).groupBy("shard")
                .cogroup(_pin_shard_parallelism(tomb).groupBy("shard"))
                .applyInPandas(_shard_topk_cogroup_fn(core.core), TOPK_SCHEMA)
            )
        else:
            local = (
                _pin_shard_parallelism(rows)
                .groupBy("shard").applyInPandas(core, TOPK_SCHEMA)
            )
        score_col = (
            F.round(F.col("score"), round_to) if round_to is not None else F.col("score")
        )
        return (
            local.select("doc_id", score_col.alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k)
        )

    def search_tree(
        self,
        tree,
        k: int = 10,
        round_to: int | None = 4,
        after: tuple[float, int] | None = None,
        exclude: DataFrame | None = None,
    ) -> DataFrame:
        """Top-k under a NESTED bool query tree (engine/boolquery.Bool/Term)
        on the block-max WAND path → DataFrame(doc_id, score), ordered
        (score desc, doc_id asc). Same lifecycle as search(): term-dict
        seek, bucket-pruned + tid-pushdown posting scan (one scan covers
        every leaf of the tree), per-shard wand_tree_topk, global top-k.
        Tombstones route per shard via cogroup exactly as in search()."""
        from .boolquery import collect_leaves, is_pure_bool

        if not is_pure_bool(tree):
            raise ValueError(
                "search_tree supports Bool/Term trees; dis_max/constant_score/"
                "boosting run on the exact path (engine.boolquery.tree_search)"
            )
        pos_t, neg_t = collect_leaves(tree)
        found = self._lookup(sorted(pos_t | neg_t))
        empty = self.spark.createDataFrame([], TOPK_SCHEMA)
        pos_tids = {t: found[t][2] for t in pos_t if t in found}
        if not pos_tids:
            return empty
        # a term in both contexts keeps its positive cursor (match flags are
        # per term, context-free in eval_tree)
        neg_tids = {
            t: found[t][2] for t in neg_t if t in found and t not in pos_tids
        }
        idfs = {t: self.idf(found[t][0]) for t in pos_tids}
        buckets = sorted({found[t][1] for t in found})
        all_tids = list(pos_tids.values()) + list(neg_tids.values())
        rows = self.postings.filter(
            F.col("bucket").isin(buckets) & F.col("tid").isin(all_tids)
        )
        core = _shard_tree_fn(
            tree, pos_tids, neg_tids, idfs, self.manifest.avgdl, k, after, round_to
        )
        dead = self.tombstones.select("doc_id") if self.tombstones is not None else None
        if exclude is not None:
            ex = exclude.select("doc_id")
            dead = ex if dead is None else dead.unionByName(ex).distinct()
        if dead is not None:
            tomb = dead.select(
                F.col("doc_id").cast("long").alias("doc_id"),
                (F.col("doc_id") / F.lit(self.manifest.docs_per_shard))
                .cast("int")
                .alias("shard"),
            )
            local = (
                _pin_shard_parallelism(rows).groupBy("shard")
                .cogroup(_pin_shard_parallelism(tomb).groupBy("shard"))
                .applyInPandas(_shard_topk_cogroup_fn(core.core), TOPK_SCHEMA)
            )
        else:
            local = (
                _pin_shard_parallelism(rows)
                .groupBy("shard").applyInPandas(core, TOPK_SCHEMA)
            )
        score_col = (
            F.round(F.col("score"), round_to) if round_to is not None else F.col("score")
        )
        return (
            local.select("doc_id", score_col.alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k)
        )

    def search_many(
        self,
        queries: dict[str, str] | list[tuple[str, str]],
        k: int = 10,
        mode: str = "or",
        round_to: int | None = 4,
    ) -> DataFrame:
        """Batched top-k for a whole query set → DataFrame(qid, doc_id, score).

        ONE pruned postings scan + ONE grouped Arrow pass answers every
        query (the reference query set runs as a batch job, not one Spark
        job per query): the bucket/tid predicates are the union over all
        queries, each shard computes every query's local top-k in-loop, and
        a single per-qid window finishes the coordinating merge. Per-query
        Spark overhead amortizes to ~zero."""
        from pyspark.sql import Window

        items = list(queries.items()) if isinstance(queries, dict) else list(queries)
        # analyze with the config the index manifest pins — same
        # rank-identity invariant search() enforces (an english-stemmed
        # index queried with standard-analyzed terms would silently miss)
        idx_an = getattr(self.manifest, "analyzer", "standard")
        all_terms: list[str] = []
        parsed = []
        for qid, qtext in items:
            q = parse_query(qtext, idx_an)
            parsed.append((qid, q))
            all_terms += q.terms + q.must_not
        found = self._lookup(all_terms)
        specs = []
        for qid, q in parsed:
            terms = [t for t in q.terms if t in found]
            if not terms or (mode == "and" and len(terms) < len(q.terms)):
                continue
            specs.append(
                {
                    "qid": qid,
                    "tids": [found[t][2] for t in terms],
                    "idfs": {found[t][2]: self.idf(found[t][0]) for t in terms},
                    "neg": [found[t][2] for t in q.must_not if t in found],
                    "k": k,
                    "mode": mode,
                }
            )
        empty = self.spark.createDataFrame([], BATCH_TOPK_SCHEMA)
        if not specs:
            return empty
        tids = sorted({t for s in specs for t in s["tids"] + s["neg"]})
        buckets = sorted({found[t][1] for t in found})
        rows = self.postings.filter(
            F.col("bucket").isin(buckets) & F.col("tid").isin(tids)
        )
        fn = _shard_multi_topk_fn(specs, self.manifest.avgdl, round_to=round_to)
        if self.tombstones is not None:
            # same per-shard live-docs routing as single-query search
            tomb = self.tombstones.select(
                F.col("doc_id").cast("long").alias("doc_id"),
                (F.col("doc_id") / F.lit(self.manifest.docs_per_shard))
                .cast("int")
                .alias("shard"),
            )
            local = (
                _pin_shard_parallelism(rows).groupBy("shard")
                .cogroup(_pin_shard_parallelism(tomb).groupBy("shard"))
                .applyInPandas(_shard_topk_cogroup_fn(fn.core), BATCH_TOPK_SCHEMA)
            )
        else:
            local = (
                _pin_shard_parallelism(rows)
                .groupBy("shard").applyInPandas(fn, BATCH_TOPK_SCHEMA)
            )
        score_col = (
            F.round(F.col("score"), round_to) if round_to is not None else F.col("score")
        )
        w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("doc_id").asc())
        return (
            local.select("qid", "doc_id", score_col.alias("score"))
            .withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= k)
            .drop("_r")
            .orderBy("qid", F.col("score").desc(), F.col("doc_id").asc())
        )

    def more_like_this(
        self,
        docs: DataFrame,
        doc_id: int,
        max_query_terms: int = 5,
        min_term_freq: int = 1,
        k: int = 10,
    ) -> DataFrame:
        """ES more_like_this [public]: analyze the source doc, keep its most
        "interesting" terms — ranked by tf·idf, ES's MLT term-selection
        heuristic — run them as an OR query and exclude the source doc
        (ES `include: false` default). Selection tie-break: (rounded tf·idf
        DESC, term ASC), rounded half-up at 6 decimals so the DuckDB oracle
        twin selects identically."""
        import math

        from .tokenizer import analyze

        row = docs.filter(F.col("doc_id") == int(doc_id)).select("text").collect()
        if not row:
            return self.spark.createDataFrame([], TOPK_SCHEMA)
        tf: dict[str, int] = {}
        for t in analyze(row[0]["text"],
                         getattr(self.manifest, "analyzer", "standard")):
            tf[t] = tf.get(t, 0) + 1
        cand = [t for t, c in tf.items() if c >= min_term_freq]
        found = self._lookup(cand)

        def sel_score(t: str) -> float:
            return math.floor(tf[t] * self.idf(found[t][0]) * 1e6 + 0.5) / 1e6

        cand = sorted((t for t in cand if t in found), key=lambda t: (-sel_score(t), t))
        terms = cand[:max_query_terms]
        if not terms:
            return self.spark.createDataFrame([], TOPK_SCHEMA)
        ex = self.spark.createDataFrame([(int(doc_id),)], "doc_id long")
        return self.search(" ".join(terms), k=k, mode="or", exclude=ex)

    def rescore(
        self,
        docs: DataFrame,
        query: str,
        phrase: str,
        window_size: int = 50,
        weight: float = 2.0,
        k: int = 10,
        mode: str = "or",
    ) -> DataFrame:
        """ES rescore [public]: cheap first phase (block-max WAND top
        `window_size`), then an expensive second phase ONLY over that window
        — here a phrase-adjacency boost (`score + weight·[phrase in doc]`).
        The window (≤ window_size rows) is broadcast against the doc table,
        so phase two never rescans the corpus."""
        base = self.search(query, k=window_size, mode=mode)
        # escape LIKE metacharacters so a literal % or _ in the phrase does
        # not act as a wildcard
        esc = phrase.replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
        has_phrase = F.when(
            F.concat(F.lit(" "), F.col("text"), F.lit(" ")).like(f"% {esc} %"),
            F.lit(1.0),
        ).otherwise(F.lit(0.0))
        return (
            docs.select("doc_id", "text")
            .join(F.broadcast(base), "doc_id")
            .select(
                "doc_id",
                F.round(F.col("score") + F.lit(weight) * has_phrase, 4).alias("score"),
            )
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k)
        )

    def fetch(self, topk: DataFrame, docs: DataFrame, cols=None) -> DataFrame:
        from .search import fetch

        return fetch(topk, docs, cols)


BATCH_TOPK_SCHEMA = "qid string, doc_id long, score double"


def _shard_multi_topk_fn(specs: list[dict], avgdl: float, round_to: int | None = 4):
    """Grouped-map body for search_many: one shard's postings → local top-k
    for EVERY query in `specs` (each {qid, tids, idfs, neg, k, mode}).
    One scan + one Arrow crossing amortized over the whole query batch.
    `fn.core` (pdf, not_ids) is the tombstone-aware form used by the
    cogrouped delete-by-query path. (Batch mode always runs the WAND/
    intersect kernels — the exhaustive oracle path is single-query only; a
    former unused `algo` parameter pretended otherwise.)"""

    def core(pdf: pd.DataFrame, not_ids=None) -> pd.DataFrame:
        out_q, out_d, out_s = [], [], []
        by_tid = {int(t): g for t, g in pdf.groupby("tid", sort=False)}
        # shared per-tid state across ALL queries in the batch: rows are
        # packed once (skip-tuple conversion is per-entry Python) and every
        # cursor over a tid shares one decoded-block memo — "the" appearing
        # in 7 of 8 queries decodes once per shard, not 7 times
        packed: dict[int, list] = {}
        caches: dict[int, dict] = {}

        def cursor_for(t: int, idf: float) -> TermCursor | None:
            rows = by_tid.get(t)
            if rows is None:
                return None
            pk = packed.get(t)
            if pk is None:
                pk = _pack_rows(rows)
                packed[t] = pk
                caches[t] = {}
            return TermCursor(pk, idf, avgdl, cache=caches[t])

        for spec in specs:
            cursors = []
            for t in spec["tids"]:
                c = cursor_for(int(t), spec["idfs"][t])
                if c is not None:
                    cursors.append(c)
            neg = [
                c for c in (cursor_for(int(t), 0.0) for t in spec["neg"])
                if c is not None
            ]
            if not cursors or (spec["mode"] == "and" and len(cursors) < len(spec["tids"])):
                continue
            if spec["mode"] == "and":
                hits = intersect_topk(
                    cursors, spec["k"], must_not=neg, not_ids=not_ids,
                    round_to=round_to,
                )
            else:
                hits = wand_topk(
                    cursors, spec["k"], must_not=neg, not_ids=not_ids,
                    round_to=round_to,
                )
            for d, s in hits:
                out_q.append(spec["qid"])
                out_d.append(d)
                out_s.append(s)
        return pd.DataFrame({"qid": out_q, "doc_id": out_d, "score": out_s})

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        return core(pdf)

    fn.core = core
    return fn
