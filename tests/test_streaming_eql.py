"""Streaming EQL sequence (J-section, applyInPandasWithState): the streamed
2-step sequence must equal the batch eql_sequence when the stream replays in
event order — state (one register per key) carries across micro-batches."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from engine.eql import eql_sequence
from engine.streaming import streaming_eql_sequence

BASE = datetime(2024, 1, 1)
SCHEMA = "event_id long, ts timestamp, user_id long, event_type string"


def _events(seed=5, n_keys=4, n=120):
    import random

    rng = random.Random(seed)
    rows = []
    for eid in range(n):
        rows.append(
            (
                eid,
                BASE + timedelta(seconds=eid * 3 + rng.randrange(2)),
                rng.randrange(n_keys),
                rng.choice(["view", "click", "purchase"]),
            )
        )
    return rows


def _write_ordered_chunks(rows, path, n_files):
    """Event-ordered rows split into n parquet files — with
    maxFilesPerTrigger=1 each file becomes one micro-batch, so the register
    must survive the batch boundary."""
    os.makedirs(path, exist_ok=True)
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "event_type"])
    step = -(-len(pdf) // n_files)
    for i in range(n_files):
        chunk = pa.Table.from_pandas(
            pdf.iloc[i * step : (i + 1) * step], preserve_index=False
        )
        pq.write_table(
            chunk,
            os.path.join(path, f"ev-{i:03d}.parquet"),
            coerce_timestamps="us",
            allow_truncated_timestamps=True,
        )


def test_streamed_equals_batch(spark, tmp_path):
    rows = _events()
    src = str(tmp_path / "ev")
    _write_ordered_chunks(rows, src, n_files=4)
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .format("parquet")
        .load(src)
    )
    step1 = F.col("event_type") == "view"
    step2 = F.col("event_type") == "purchase"
    out = streaming_eql_sequence(stream, "user_id", "ts", step1, step2, 60)
    q = (
        out.writeStream.format("memory")
        .queryName("eqlstream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM eqlstream").collect())
    )
    batch_df = spark.createDataFrame(rows, SCHEMA)
    want = sorted(
        map(tuple, eql_sequence(batch_df, "user_id", "ts", step1, step2, 60).collect())
    )
    assert got == want and got, f"{len(got)} streamed vs {len(want)} batch"


def test_register_survives_batch_boundary(spark, tmp_path):
    # step-1 in file 0, matching step-2 in file 1 — only state carry-over
    # can produce the match
    rows = [
        (0, BASE, 7, "view"),
        (1, BASE + timedelta(seconds=5), 7, "click"),
        (2, BASE + timedelta(seconds=10), 7, "purchase"),
        (3, BASE + timedelta(seconds=200), 7, "purchase"),  # out of span
    ]
    src = str(tmp_path / "ev2")
    _write_ordered_chunks(rows[:2], src, n_files=1)
    os.rename(
        os.path.join(src, "ev-000.parquet"), os.path.join(src, "a-000.parquet")
    )
    _write_ordered_chunks(rows[2:], src, n_files=1)
    os.rename(
        os.path.join(src, "ev-000.parquet"), os.path.join(src, "b-001.parquet")
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .format("parquet")
        .load(src)
    )
    out = streaming_eql_sequence(
        stream, "user_id", "ts",
        F.col("event_type") == "view", F.col("event_type") == "purchase", 60,
    )
    q = (
        out.writeStream.format("memory")
        .queryName("eqlstream2")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [
        (r["event_id"], r["gap_seconds"])
        for r in spark.sql(
            "SELECT * FROM eqlstream2 ORDER BY event_id"
        ).collect()
    ]
    assert got == [(2, 10)], got
