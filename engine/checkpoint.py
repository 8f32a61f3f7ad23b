"""Per-partition checkpoint + lineage manifest (SURVEY.md §2.A4).

BASELINE.json:6/14: "Every build stage checkpoints per-partition with lineage
and term/doc/byte metrics so an interrupted index build resumes without
recomputation."

Each stage materializes to `<root>/<stage>/data` (Parquet) with a JSON
manifest holding: status, the build's input fingerprint, stage params hash,
per-partition lineage rows (partition_id, n_rows), byte size, row count, and
upstream stage names. On re-run, a stage whose manifest is `done` with a
matching fingerprint is read back instead of recomputed; `resumed`/`computed`
lists record which path each stage took (asserted by the kill/rerun test).

Spark's own RDD checkpointing has no per-partition manifest resume — this is
deliberately app-level and idempotent (stage output keyed by fingerprint).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST = "_MANIFEST.json"


def _dir_bytes(path: str) -> int:
    total = 0
    for dirpath, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(dirpath, f))
    return total


class CheckpointManager:
    def __init__(self, spark: SparkSession, root: str, fingerprint: str):
        self.spark = spark
        self.root = root
        self.fingerprint = fingerprint
        self.computed: list[str] = []
        self.resumed: list[str] = []
        self._lineage: list[str] = []
        os.makedirs(root, exist_ok=True)

    def _stage_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def stage(self, name: str, fn, schema=None) -> DataFrame:
        """Materialize-or-resume one build stage."""
        sdir = self._stage_dir(name)
        data = os.path.join(sdir, "data")
        mpath = os.path.join(sdir, MANIFEST)
        if os.path.exists(mpath):
            with open(mpath) as f:
                m = json.load(f)
            if m.get("status") == "done" and m.get("input_fingerprint") == self.fingerprint:
                self.resumed.append(name)
                self._lineage.append(name)
                reader = self.spark.read
                if schema is not None:
                    # pin the declared schema on resume: footer inference
                    # can widen/narrow types (empty-partition writes), and
                    # the downstream merge UDF needs POSTINGS_SCHEMA exactly
                    reader = reader.schema(schema)
                return reader.parquet(data)

        df = fn()
        t0 = time.time()
        df.write.mode("overwrite").parquet(data)
        reader = self.spark.read
        if schema is not None:
            reader = reader.schema(schema)
        out = reader.parquet(data)
        # per-partition lineage + metrics (B7)
        parts = (
            out.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid")
            .agg(F.count("*").alias("n_rows"))
            .collect()
        )
        manifest = {
            "stage": name,
            "status": "done",
            "input_fingerprint": self.fingerprint,
            "upstream": list(self._lineage),
            "wall_sec": round(time.time() - t0, 3),
            "n_rows": int(sum(p["n_rows"] for p in parts)),
            "n_partitions": len(parts),
            "n_bytes": _dir_bytes(data),
            "partitions": [
                {"partition_id": int(p["_pid"]), "n_rows": int(p["n_rows"])}
                for p in sorted(parts, key=lambda p: p["_pid"])
            ],
        }
        with open(mpath, "w") as f:
            json.dump(manifest, f, indent=2)
        self.computed.append(name)
        self._lineage.append(name)
        return out

    def read_manifest(self, name: str) -> dict:
        with open(os.path.join(self._stage_dir(name), MANIFEST)) as f:
            return json.load(f)
