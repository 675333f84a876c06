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


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Parquet scan → Catalyst gets pushdown + pruning."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL entry points."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
