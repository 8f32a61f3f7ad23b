"""End-to-end `prepare_training_data` job (VERDICT r03 #10): the LLM-data
analog of the refine→index lifecycle, chaining the pipeline operators

    quality → line_dedup → dedup → decontam → sample → pack → shuffle

under the SAME per-stage checkpoint manifest the index build uses
(engine.checkpoint.CheckpointManager, SURVEY.md §2.A4): every stage is
parquet-materialized with lineage + per-partition metrics, and a re-run
after a kill resumes completed stages from their manifests with ZERO
recomputation (pinned by tests/test_pipeline_e2e.py).

Scale shape: each stage is one of the already-audited distributed ops
(codegen filters, broadcast anti-joins, band-bucket LSH, bucketed prefix
sums) — the chain adds NO new shuffles beyond its stages; the checkpoint
writes double as the stage boundaries a real cluster job would persist
anyway (and make every stage independently restartable/inspectable, the
operational requirement for a multi-day 100 TB run).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .checkpoint import CheckpointManager

STAGES = [
    "quality", "line_dedup", "dedup", "decontam", "sample", "pack", "shuffle"
]


def _active_stages(span_dedup_k: int | None) -> list[str]:
    """The stage chain actually run: the optional ExactSubstr span-dedup
    pass (span_dedup_k set) slots between line_dedup and dedup."""
    if span_dedup_k is None:
        return list(STAGES)
    i = STAGES.index("dedup")
    return STAGES[:i] + ["span_dedup"] + STAGES[i:]


def prepare_training_data(
    spark: SparkSession,
    docs: DataFrame,
    out_root: str,
    fingerprint: str,
    min_quality: float = 0.5,
    line_tokens: int = 3,
    line_min_df: int = 5,
    span_dedup_k: int | None = None,
    dedup_method: str = "exact",
    minhash_threshold: float = 0.7,
    benchmark: DataFrame | None = None,
    bench_mod: int = 97,
    decontam_n: int = 3,
    strata_col: str = "source",
    alpha: float = 0.5,
    target_total: int = 250,
    seq_len: int = 64,
    token_counter: str = "whitespace",
    n_shards: int = 8,
    checkpoint: CheckpointManager | None = None,
    stop_after: str | None = None,
) -> tuple[DataFrame, CheckpointManager]:
    """Run (or resume) the full chain; returns (final shuffled+packed frame,
    the CheckpointManager with computed/resumed stage lists).

    dedup_method: "exact" (md5 fingerprint groupBy — fully SQL-expressible,
    the contract-query config) or "minhash" (LSH candidates ≥ threshold →
    hash-min connected components → keep cluster canonicals).
    benchmark: eval set to decontaminate against; default carves
    doc_id % bench_mod == 0 out of the input (those docs are REMOVED from
    the train side as well — they are the held-out set).
    stop_after: stop the job after the named stage (run-to-stage operator
    control; also how the resume test simulates a mid-job kill) — the
    partial run leaves valid stage manifests behind, so a later full run
    resumes them with zero recomputation."""
    if stop_after == "span_dedup" and span_dedup_k is None:
        raise ValueError("stop_after='span_dedup' needs span_dedup_k set")
    active = _active_stages(span_dedup_k)
    if stop_after is not None and stop_after not in active:
        raise ValueError(f"unknown stage {stop_after!r}; one of {active}")
    if dedup_method not in ("exact", "minhash"):
        raise ValueError(f"dedup_method must be exact|minhash: {dedup_method}")
    cp = checkpoint or CheckpointManager(spark, out_root, fingerprint)
    cp.fingerprint += (
        f";q={min_quality};lt={line_tokens};ldf={line_min_df}"
        f";sdk={span_dedup_k};dd={dedup_method}"
        f";mt={minhash_threshold};bm={bench_mod};dn={decontam_n}"
        f";sc={strata_col};a={alpha};tt={target_total};sl={seq_len}"
        f";tc={token_counter};ns={n_shards};xb={benchmark is not None}"
    )
    if benchmark is None:
        benchmark = docs.filter(F.col("doc_id") % bench_mod == 0)
        train_pred = F.col("doc_id") % bench_mod != 0
    else:
        train_pred = F.lit(True)
    bench = benchmark.select("doc_id", "text")
    keep_cols = [c for c in docs.columns if c != "text"]

    def stage_quality():
        from .textops import quality_score

        q = quality_score(docs)
        return q.filter(F.col("quality_score") >= min_quality).select(
            *keep_cols, "text", "quality_score"
        )

    s1 = cp.stage("quality", stage_quality)
    if stop_after == "quality":
        return s1, cp

    def stage_line_dedup():
        from .textops import remove_boilerplate_lines

        ld = remove_boilerplate_lines(
            s1, line_tokens=line_tokens, min_df=line_min_df
        )
        return (
            s1.drop("text")
            .join(ld.filter(F.col("n_kept") > 0), "doc_id")
            .select(*keep_cols, F.col("kept_text").alias("text"),
                    "quality_score")
        )

    s2 = cp.stage("line_dedup", stage_line_dedup)
    if stop_after == "line_dedup":
        return s2, cp

    if span_dedup_k is not None:
        # optional ExactSubstr pass (Lee et al. 2022): cut every non-first
        # occurrence of a k-token span corpus-wide, drop docs emptied by it
        def stage_span_dedup():
            from .textops import span_dedup

            sd = span_dedup(s2, k=span_dedup_k)
            return (
                s2.drop("text")
                .join(sd.filter(F.col("n_kept") > 0), "doc_id")
                .select(*keep_cols, "text", "quality_score")
            )

        s2 = cp.stage("span_dedup", stage_span_dedup)
        if stop_after == "span_dedup":
            return s2, cp

    def stage_dedup():
        if dedup_method == "exact":
            from .dedup import dedup_exact

            return dedup_exact(s2)
        from .dedup import connected_components, minhash_jaccard_estimate

        pairs = minhash_jaccard_estimate(s2).filter(
            F.col("est_jaccard") >= minhash_threshold
        )
        clusters = connected_components(pairs)
        drop = clusters.filter(
            F.col("doc_id") != F.col("canonical_id")
        ).select("doc_id")
        return s2.join(drop, "doc_id", "left_anti")

    s3 = cp.stage("dedup", stage_dedup)
    if stop_after == "dedup":
        return s3, cp

    def stage_decontam():
        from .decontam import decontaminate

        train = s3.filter(train_pred)
        return decontaminate(train, bench, n=decontam_n)

    s4 = cp.stage("decontam", stage_decontam)
    if stop_after == "decontam":
        return s4, cp

    def stage_sample():
        from .sample import portable_hash_expr, temperature_sample

        # the SQL-portable hash (not xxhash64) so the contract oracle can
        # replay the keep decision exactly
        sampled, _rates = temperature_sample(
            s4, strata_col, alpha=alpha, target_total=target_total,
            hash_expr=portable_hash_expr("doc_id"),
        )
        return sampled

    s5 = cp.stage("sample", stage_sample)
    if stop_after == "sample":
        return s5, cp

    def stage_pack():
        from .pack import pack_documents

        spans = pack_documents(s5, seq_len, token_counter=token_counter)
        return s5.join(spans, "doc_id")

    s6 = cp.stage("pack", stage_pack)
    if stop_after == "pack":
        return s6, cp

    def stage_shuffle():
        from .sample import training_shuffle

        return training_shuffle(s6, n_shards=n_shards)

    s7 = cp.stage("shuffle", stage_shuffle)

    # job-level summary manifest: one JSON tying the stage manifests together
    summary = {
        "job": "prepare_training_data",
        "fingerprint": cp.fingerprint,
        "stages": [
            {
                "ord": i + 1,
                "stage": name,
                "n_rows": cp.read_manifest(name)["n_rows"],
                "n_bytes": cp.read_manifest(name)["n_bytes"],
                "resumed": name in cp.resumed,
            }
            for i, name in enumerate(active)
        ],
    }
    with open(os.path.join(out_root, "pipeline.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return s7, cp


def pipeline_summary(spark: SparkSession, out_root: str) -> DataFrame:
    """The job manifest as a DataFrame (ord, stage, n_rows) — the
    deterministic slice of the lineage (walls/bytes vary run to run)."""
    with open(os.path.join(out_root, "pipeline.json")) as f:
        summary = json.load(f)
    rows = [(s["ord"], s["stage"], s["n_rows"]) for s in summary["stages"]]
    return spark.createDataFrame(rows, "ord int, stage string, n_rows long")
