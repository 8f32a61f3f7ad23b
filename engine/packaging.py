"""Cluster packaging: ship the engine to executors (BASELINE.json:14
"ships via spark-submit --py-files").

`make_pyfiles_zip()` produces the zip used both by
`spark-submit --py-files engine.zip ...` on a real cluster and by
`ensure_workers_can_import(spark)` (sc.addPyFile) when the engine is driven
from an externally-created SparkSession whose Python workers would otherwise
not have the repo on sys.path — e.g. the grading driver importing
__spark_entry__ from another working directory.
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_SENT_KEY = "_engine_pyfiles_sent"


def make_pyfiles_zip(out_path: str | None = None) -> str:
    """Zip the `engine` package (stable content → stable file).

    Atomic publish: write to a pid-suffixed temp path then os.replace — a
    concurrent session (grading driver + bench in parallel) must never
    addPyFile a half-written zip to its executors."""
    out_path = out_path or os.path.join(_REPO_ROOT, "data", "engine_pyfiles.zip")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    src = os.path.join(_REPO_ROOT, "engine")
    tmp_path = f"{out_path}.tmp.{os.getpid()}"
    with zipfile.ZipFile(tmp_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _, files in os.walk(src):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    rel = os.path.relpath(full, _REPO_ROOT)
                    zf.write(full, rel)
    os.replace(tmp_path, out_path)
    return out_path


def ensure_workers_can_import(spark: SparkSession) -> None:
    """Idempotently addPyFile the engine zip to this session's executors.

    No-op when an engine zip was already shipped at submit time (spark-submit
    --py-files, visible in spark.submit.pyFiles / spark.files): every executor
    already has that zip, and re-zipping here would race the working tree —
    if engine/*.py changed on disk since submit, addPyFile of a same-named,
    different-content zip makes Spark abort the whole app ("exists and does
    not match contents"). The zip shipped at submit IS the job's code; the
    working tree is not."""
    sc = spark.sparkContext
    shipped = " ".join(
        sc.getConf().get(k, "") or ""
        for k in ("spark.submit.pyFiles", "spark.files")
    )
    if "engine_pyfiles" in shipped:
        return
    if getattr(sc, _SENT_KEY, False):
        return
    sc.addPyFile(make_pyfiles_zip())
    setattr(sc, _SENT_KEY, True)
