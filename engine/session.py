"""SparkSession factory with the engine's pinned configs.

Configs follow BASELINE.json:6 ("adaptive coalesce") and :15 (vectorized
Arrow UDFs): AQE on, Arrow on, shuffle partitions sized to local cores.
On a real cluster the same builder is used by spark-submit entry points;
only master/memory come from the environment then.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "surfiki-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or get) a local SparkSession.

    cpus: parallelism for local[N]; default $SPARK_GRAFT_CPUS or '*'.
    shuffle_partitions: default = cpus (local mode: no reason for 200).
    """
    if cpus is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{env}]" if env else "local[*]"
        try:
            n = int(env) if env else (os.cpu_count() or 8)
        except ValueError:  # e.g. SPARK_GRAFT_CPUS='*' — valid master, not an int
            n = os.cpu_count() or 8
    else:
        master = f"local[{cpus}]"
        n = cpus
    if shuffle_partitions is None:
        shuffle_partitions = max(n, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # NOTE on scan parallelism: the driver fixtures are single-ROW-GROUP
        # parquet, so byte-split knobs (files.minPartitionNum /
        # openCostInBytes) cannot raise real scan parallelism — they were
        # tried and only added empty-split task overhead (~45 no-op tasks
        # per scan). Scan-side parallelism for CPU-heavy tables comes from
        # io.read_fixture's size-gated rebalance instead.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
