"""Checkpoint/lineage + resume tests (SURVEY.md §5.6; BASELINE.json:6,14).

Simulates the interrupted build: stage-by-stage materialization, then a rerun
that must resume with 0 recomputed stages and byte-identical query results.
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from engine.checkpoint import CheckpointManager
from engine.index import build_index
from engine.io import read_fixture
from engine.searcher import LoadedIndex


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return read_fixture(spark, sf_dir, "documents").select("doc_id", "text")


def test_build_resume_zero_recompute(spark, docs, tmp_path_factory):
    base = tmp_path_factory.mktemp("ckpt")
    ckpt_root = str(base / "ckpt")
    idx_root = str(base / "idx")
    fp = "documents-sf0.001-v1"

    # first (interrupted-equivalent) run: all stages computed
    cm1 = CheckpointManager(spark, ckpt_root, fp)
    build_index(spark, docs, idx_root, n_buckets=4, docs_per_shard=128,
                n_segments=2, block_size=32, checkpoint=cm1)
    assert cm1.computed == ["base", "segments", "merged"]
    assert cm1.resumed == []
    r1 = LoadedIndex(spark, idx_root).search("table scan", k=10, round_to=None).collect()

    # rerun with same fingerprint: every stage resumes, nothing recomputed
    cm2 = CheckpointManager(spark, ckpt_root, fp)
    build_index(spark, docs, idx_root, n_buckets=4, docs_per_shard=128,
                n_segments=2, block_size=32, checkpoint=cm2)
    assert cm2.computed == []
    # "segments" is nested inside the merged stage's closure — when "merged"
    # resumes, segments is never even consulted (zero recompute, zero reread)
    assert cm2.resumed == ["base", "merged"]
    r2 = LoadedIndex(spark, idx_root).search("table scan", k=10, round_to=None).collect()
    assert [(r["doc_id"], r["score"]) for r in r1] == [
        (r["doc_id"], r["score"]) for r in r2
    ]

    # changed input fingerprint: stages recompute (no stale reuse)
    cm3 = CheckpointManager(spark, ckpt_root, "documents-sf0.001-v2")
    build_index(spark, docs, idx_root, n_buckets=4, docs_per_shard=128,
                n_segments=2, block_size=32, checkpoint=cm3)
    assert cm3.resumed == []
    assert cm3.computed == ["base", "segments", "merged"]


def test_partial_resume_after_interrupt(spark, docs, tmp_path_factory):
    """Kill after stage 2: only later stages recompute on rerun."""
    base = tmp_path_factory.mktemp("ckpt2")
    ckpt_root = str(base / "ckpt")
    fp = "fp-1"

    class Boom(Exception):
        pass

    # phase 1: a REAL build_index run (build params fold into the stage
    # fingerprint) that dies right after the first stage commits
    cm = CheckpointManager(spark, ckpt_root, fp)
    orig_stage = cm.stage

    def dying_stage(name, fn, schema=None):
        out = orig_stage(name, fn, schema=schema)
        if name == "base":
            raise Boom()
        return out

    cm.stage = dying_stage
    with pytest.raises(Boom):
        build_index(spark, docs, str(base / "idx0"), n_buckets=4,
                    docs_per_shard=128, block_size=32, checkpoint=cm)
    assert cm.computed == ["base"]

    # rerun the full build with the same checkpoint root + fingerprint
    cm2 = CheckpointManager(spark, ckpt_root, fp)
    idx_root = str(base / "idx")
    build_index(spark, docs, idx_root, n_buckets=4, docs_per_shard=128,
                block_size=32, checkpoint=cm2)
    assert cm2.resumed == ["base"]
    assert cm2.computed == ["segments", "merged"]


def test_manifest_records_partition_lineage(spark, docs, tmp_path_factory):
    base = tmp_path_factory.mktemp("ckpt3")
    cm = CheckpointManager(spark, str(base / "ckpt"), "fp")
    out = cm.stage("doc_stats", lambda: docs.selectExpr("doc_id", "length(text) as dl"))
    m = cm.read_manifest("doc_stats")
    assert m["status"] == "done"
    assert m["input_fingerprint"] == "fp"
    assert m["n_rows"] == out.count()
    assert m["n_bytes"] > 0
    assert sum(p["n_rows"] for p in m["partitions"]) == m["n_rows"]
    assert all("partition_id" in p for p in m["partitions"])


def test_changed_build_params_invalidate_resume(spark, docs, tmp_path_factory):
    """A re-run with different encode-affecting parameters must NOT resume
    stale stage output: bucket routing (pmod(tid, B)) is baked into the
    rows, so resuming buckets=4 output under buckets=8 would silently break
    term lookup. The build folds its params into the stage fingerprint."""
    base = tmp_path_factory.mktemp("ckpt3")
    ckpt_root = str(base / "ckpt")
    cm = CheckpointManager(spark, ckpt_root, "fp-2")
    build_index(spark, docs, str(base / "idx4"), n_buckets=4,
                docs_per_shard=128, block_size=32, checkpoint=cm)
    assert cm.computed  # fresh build computed stages

    cm2 = CheckpointManager(spark, ckpt_root, "fp-2")
    build_index(spark, docs, str(base / "idx8"), n_buckets=8,
                docs_per_shard=128, block_size=32, checkpoint=cm2)
    assert cm2.resumed == []  # nothing stale reused
    assert cm2.computed  # recomputed under the new params
