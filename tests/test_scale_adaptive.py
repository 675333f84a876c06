"""Pins for the round-10 scale-adaptive sizing helpers (guide §2):

- ``scan_parallelism`` derives the CPU-bound-map partition count from the
  table's on-disk bytes, clamped to defaultParallelism — tiny fixtures
  stop paying cores× task dispatch, the bench SF and clusters keep full
  parallelism;
- ``salt_factor`` caps the skew-join replication factor so the
  replicated side's bytes cannot scale with cluster size.
"""

from __future__ import annotations

import pytest

from datafusion_nats_spark.tables import SALT_CAP, salt_factor, scan_parallelism

SF_TINY = "/root/testdata/sf0.001"
SF_BENCH = "/root/testdata/sf0.1"


def test_scan_parallelism_small_input_uses_few_partitions(spark):
    p = scan_parallelism(spark, SF_TINY, "documents")
    dp = spark.sparkContext.defaultParallelism
    assert 1 <= p <= dp
    # the sf0.001 documents table is ~64 KiB of parquet — far below
    # one task per core at 16 KiB/task
    assert p <= 4


def test_scan_parallelism_clamps_to_default_parallelism(spark):
    p = scan_parallelism(spark, SF_BENCH, "documents")
    dp = spark.sparkContext.defaultParallelism
    # sf0.1 documents (~580 KiB) saturates the clamp at the test
    # session's core count — i.e. exactly the pre-round-10 behavior
    assert p == dp


def test_scan_parallelism_missing_path_falls_back(spark):
    p = scan_parallelism(spark, "/nonexistent", "documents")
    assert p == spark.sparkContext.defaultParallelism


def test_salt_factor_capped(spark):
    s = salt_factor(spark)
    dp = spark.sparkContext.defaultParallelism
    assert s == min(dp, SALT_CAP)
    assert 1 <= s <= SALT_CAP


def test_dedup_results_partition_invariant_under_adaptive_sizing(spark):
    """The adaptive partition count must not change results: minhash
    pairs at the tiny SF (few partitions) equal a forced wide-partition
    run of the same logical query."""
    from pyspark.sql import functions as F

    from datafusion_nats_spark.extensions.dedup import (
        _lsh_candidate_pairs,
        _shingled_shared,
        _shingles_spark,
        dedup_minhash_lsh,
    )
    from datafusion_nats_spark.tables import load

    got = sorted(map(tuple, dedup_minhash_lsh(spark, SF_TINY).collect()))

    wide = (
        load(spark, SF_TINY, "documents")
        .repartition(16, "doc_id")
        .select("doc_id", F.explode(_shingles_spark(F.col("text"))).alias("shingle"))
        .repartition(16, "doc_id")
    )
    _, pairs = _lsh_candidate_pairs(wide)
    want = sorted(map(tuple, pairs.collect()))
    assert got == want
