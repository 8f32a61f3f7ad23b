"""End-to-end prepare_training_data (VERDICT r03 #10): kill-after-stage-3
resume with ZERO recomputed stages, minhash-dedup config, and manifest
integrity across the chain."""

import json
import os

import pytest
from pyspark.sql import functions as F

from engine.io import read_fixture
from engine.pipeline import STAGES, pipeline_summary, prepare_training_data


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return read_fixture(spark, sf_dir, "documents")


def test_kill_after_stage3_resumes_zero_recompute(spark, docs, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pipe") / "run")
    kw = dict(
        fingerprint="e2e-v1", dedup_method="minhash", target_total=30,
        seq_len=32,
    )
    # "killed" run: stops after stage 3 (dedup), manifests left behind
    _, cp1 = prepare_training_data(
        spark, docs, root, stop_after="dedup", **kw
    )
    assert cp1.computed == ["quality", "line_dedup", "dedup"]
    assert cp1.resumed == []
    assert not os.path.exists(os.path.join(root, "pipeline.json"))

    # rerun to completion: the three finished stages resume (0 recompute),
    # only the remaining four compute
    final, cp2 = prepare_training_data(spark, docs, root, **kw)
    assert cp2.resumed == ["quality", "line_dedup", "dedup"]
    assert cp2.computed == ["decontam", "sample", "pack", "shuffle"]

    # result identical to an uninterrupted run in a fresh root
    root2 = str(tmp_path_factory.mktemp("pipe") / "fresh")
    final2, cp3 = prepare_training_data(spark, docs, root2, **kw)
    assert cp3.computed == STAGES and cp3.resumed == []
    assert sorted(map(tuple, final.collect())) == sorted(
        map(tuple, final2.collect())
    )

    # manifest summary agrees between the resumed and fresh runs
    assert [
        tuple(r) for r in pipeline_summary(spark, root).collect()
    ] == [tuple(r) for r in pipeline_summary(spark, root2).collect()]


def test_stage_counts_monotone_and_manifest_lineage(spark, docs, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pipe") / "mono")
    final, cp = prepare_training_data(
        spark, docs, root, fingerprint="mono-v1", target_total=25
    )
    rows = {r["stage"]: r["n_rows"]
            for r in pipeline_summary(spark, root).collect()}
    # filters only ever shrink; pack/shuffle are 1:1 with sample
    assert rows["quality"] >= rows["line_dedup"] >= rows["dedup"]
    assert rows["dedup"] >= rows["decontam"] >= rows["sample"] > 0
    assert rows["pack"] == rows["shuffle"] == rows["sample"]
    # per-stage manifests carry lineage + partition metrics
    for i, name in enumerate(STAGES):
        m = cp.read_manifest(name)
        assert m["status"] == "done" and m["n_rows"] == rows[name]
        assert m["upstream"] == STAGES[:i]
        assert m["partitions"] and m["n_bytes"] > 0
    # final frame carries the packing spans and the shuffle order columns
    for c in ("tok_start", "pack_first", "pack_last", "shuffle_key", "shard"):
        assert c in final.columns
    # benchmark docs are gone from the train output
    assert final.filter(F.col("doc_id") % 97 == 0).count() == 0


def test_changed_params_invalidate(spark, docs, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pipe") / "inval")
    prepare_training_data(spark, docs, root, fingerprint="v1",
                          target_total=25)
    # same fingerprint, different stage param → fold-in changes the
    # effective fingerprint → full recompute, no stale reuse
    _, cp = prepare_training_data(spark, docs, root, fingerprint="v1",
                                  target_total=26)
    assert cp.resumed == [] and cp.computed == STAGES


def test_validation(spark, docs, tmp_path):
    with pytest.raises(ValueError, match="unknown stage"):
        prepare_training_data(spark, docs, str(tmp_path), "f",
                              stop_after="tokenize")
    with pytest.raises(ValueError, match="exact|minhash"):
        prepare_training_data(spark, docs, str(tmp_path), "f",
                              dedup_method="fuzzy")
