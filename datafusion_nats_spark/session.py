"""SparkSession factory with scale-appropriate defaults.

Session timezone is pinned to UTC because the reference codec interprets
wire timestamps as UTC (reference: src/codec/csv.rs:162-164) and the
DuckDB correctness oracle compares timestamp values UTC-naive.

AQE is on so that at real cluster scale the engine re-plans joins
(broadcast conversion, skew-join splitting) and coalesces shuffle
partitions at runtime — the knobs below are chosen to survive a 100 TB
input, not just the local test scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "datafusion_nats_spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Protobuf-less environments: export the vendored google.protobuf
    # shim on PYTHONPATH BEFORE the JVM launches, so every python
    # process the JVM spawns later (executor workers, and the
    # transformWithStateInPandas *driver worker*, which initializes
    # before addPyFile-shipped files are visible) can import it. No-op
    # when a real protobuf wheel is installed.
    from datafusion_nats_spark.vendor import PBSHIM_DIR, protobuf_is_real

    if not protobuf_is_real():
        existing = os.environ.get("PYTHONPATH", "")
        if PBSHIM_DIR not in existing.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                PBSHIM_DIR + (os.pathsep + existing if existing else "")
            )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # Shuffle width ~= cores locally; AQE coalesces down when partitions
        # are small and splits skewed ones at cluster scale.
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for any pandas-interop path (vectorized UDF transfer).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Allow Python data sources (the NATS reader) to receive pushed filters.
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # Keep parquet scans wide enough to parallelize but bounded so a
        # single task's partition fits executor memory at large SF.
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
