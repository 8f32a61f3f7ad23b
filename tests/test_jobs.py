"""spark-submit entry-point plumbing (engine/jobs.py): build → search →
checkpointed resume, driven in-process through the same main()/argparse
surface a cluster submit uses (BASELINE.json:14)."""

from __future__ import annotations

import json
import os

import pytest

from engine import jobs
from engine.pages import pages_df


@pytest.fixture(scope="module")
def pages_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("jobs_pages") / "pages")
    pages_df(spark, 300, seed=7).write.mode("overwrite").parquet(p)
    return p


def test_build_then_search(spark, pages_path, tmp_path, capsys):
    out = str(tmp_path / "idx")
    jobs.main(
        ["build", "--pages", pages_path, "--out", out,
         "--buckets", "4", "--segments", "2", "--hot-df", "50", "--salts", "4"]
    )
    built = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["job"] == "build" and built["n_docs"] > 0
    assert os.path.exists(os.path.join(out, "manifest.json"))

    jobs.main(["search", "--index", out, "--query", "table scan", "-k", "5"])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["job"] == "search"
    assert 0 < len(res["hits"]) <= 5
    scores = [h[1] for h in res["hits"]]
    assert scores == sorted(scores, reverse=True)


def test_checkpointed_build_resumes(spark, pages_path, tmp_path, capsys):
    out = str(tmp_path / "idx_ck")
    argv = ["build", "--pages", pages_path, "--out", out, "--buckets", "4",
            "--segments", "2", "--checkpoint"]
    jobs.main(argv)
    first = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # rerun: every stage resumes from the checkpoint parquet → much less work,
    # identical manifest
    jobs.main(argv)
    second = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert second["n_docs"] == first["n_docs"]
    assert second["avgdl"] == first["avgdl"]
