"""Test-data table loading + temp-view registration.

Tables are the driver-generated TPC-H-ish star schema plus the stream /
LLM-pipeline extension tables (TESTDATA.md / FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _pin_session_invariants(spark: SparkSession) -> None:
    """Correctness-critical session settings, enforced on every load so
    the oracle contract holds even under a driver-constructed session:
    UTC timestamps (codec semantics, reference csv.rs:162-164, and every
    epoch/date-function oracle assumes it)."""
    if spark.conf.get("spark.sql.session.timeZone", "") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Parquet scan → Catalyst gets pushdown + pruning.

    Timestamp normalization: driver-generated parquet stores timestamps
    as INT64 TIMESTAMP(isAdjustedToUTC=false) — Spark reads these as
    TIMESTAMP_NTZ, which breaks epoch functions (unix_micros) and
    streaming watermarks (both require TIMESTAMP_LTZ). With the session
    timezone pinned to UTC, an NTZ→LTZ cast is value-preserving against
    the DuckDB oracle (which reads the same parquet as naive TIMESTAMP).
    A legacy branch also tolerates INT64 TIMESTAMP(NANOS) files read as
    bigint (earlier driver data generations used nanos).
    """
    _pin_session_invariants(spark)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    from pyspark.sql import functions as F

    dtypes = dict(df.dtypes)
    if name == "events" and dtypes.get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        dtypes = dict(df.dtypes)
    for col, dt in dtypes.items():
        if dt == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL entry points."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
