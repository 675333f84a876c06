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

    ``events.ts`` is physically INT64 TIMESTAMP(NANOS), which Spark's
    parquet reader rejects outright; read it as a long (legacy conf) and
    rebuild the timestamp at microsecond precision with integer `div`
    (a double-typed division would lose sub-µs precision at ns-epoch
    magnitudes).
    """
    _pin_session_invariants(spark)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        from pyspark.sql import functions as F

        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL entry points."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
