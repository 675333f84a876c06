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
        # Parquet writes (persisted index artifacts: IVF/PQ cells,
        # LSH bands, BM25 postings) — zstd over the snappy default
        # (guide §6). Round-10 A/B, build+2-probe cycles, all index
        # kinds: artifacts 2.75→2.02 MB at sf0.1 (−27%) and
        # 32.1→21.6 MB at 30x replication (−33%), probe passes flat to
        # slightly faster (13.0 vs 15.2 s at 30x — smaller files to
        # read); oracle sweeps green. The test corpus READS are
        # unaffected (input parquet is the driver's fixture).
        .config(
            "spark.sql.parquet.compression.codec",
            os.environ.get("SPARK_GRAFT_PARQUET_CODEC", "zstd"),
        )
        # Shuffle codec (guide §2.3). Round-9 A/B at 30x replication:
        # zstd HALVES shuffle-write bytes on the heavy movers
        # (search_bm25_topk 181→86 MB, search_hybrid_rrf 284→122 MB,
        # dedup_minhash_lsh 48→25 MB) at up to +20% executor CPU on the
        # compress-heaviest query. On a cluster, shuffle bytes cross the
        # network — the §1.3 floor — so production should run zstd; the
        # LOCAL default stays lz4 (Spark's default) because there is no
        # network here and the bench would only pay the CPU side.
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_SHUFFLE_CODEC", "lz4"),
        )
        # AQE SMJ→SHJ conversion (guide §3.1). Round-9 A/B at 30x:
        # 128m cut join-stage CPU ~10-25% on the full-outer-join
        # retrieval queries (search_hybrid_rrf 218→162 cpu-s) by
        # skipping both sort passes. Round 10 tried defaulting it ON and
        # MEASURED the §3.1 failure mode instead of the win: the 30x
        # phrase-probe workload died with "not enough memory to build
        # hash map" (ShuffledHashJoinExec's build is non-spillable, and
        # the threshold compares COMPRESSED map bytes against per-task
        # memory that is heap×fraction/32 ≈ 150 MB here). Reverted to
        # default OFF; the one join where the win was measured and the
        # build side is provably bounded (the RRF fusion of two
        # top-ARM_K arms) gets an explicit SHUFFLE_HASH hint instead —
        # see retrieval.rrf_fuse. On clusters with more memory per task
        # slot, set SPARK_GRAFT_SHJ_THRESHOLD to taste.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_THRESHOLD", "0"),
        )
        # UI off by default (test-suite overhead); SPARK_GRAFT_UI=1 turns
        # it on for harnesses that read per-stage metrics (shuffle bytes)
        # from the status REST API (scale_bench.py)
        .config(
            "spark.ui.enabled",
            "true" if os.environ.get("SPARK_GRAFT_UI") == "1" else "false",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    # Protobuf-less environments: export the vendored google.protobuf
    # shim on PYTHONPATH only WHILE the JVM launches — the JVM snapshots
    # its environment at launch and passes it to every python process it
    # spawns later (executor workers, and the transformWithStateInPandas
    # *driver worker*, which initializes before addPyFile-shipped files
    # are visible), so the window covers exactly those. Restoring the
    # variable afterwards keeps the shim OUT of the environment of every
    # other subprocess this driver spawns (it is a Spark-worker
    # dependency, not a process-wide one). No-op when a real protobuf
    # wheel is installed; and on a heterogeneous cluster where executors
    # DO have a real wheel, the shim's own import defers to it
    # (pbshim/google/protobuf/__init__._defer_to_real_runtime).
    from datafusion_nats_spark.vendor import PBSHIM_DIR, protobuf_is_real

    prior = os.environ.get("PYTHONPATH")
    mutated = False
    if not protobuf_is_real() and PBSHIM_DIR not in (prior or "").split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            PBSHIM_DIR + (os.pathsep + prior if prior else "")
        )
        mutated = True
    try:
        spark = builder.getOrCreate()
    finally:
        if mutated:
            if prior is None:
                os.environ.pop("PYTHONPATH", None)
            else:
                os.environ["PYTHONPATH"] = prior
    spark.sparkContext.setLogLevel("WARN")
    return spark
