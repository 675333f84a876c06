"""Relational query surface (SURVEY.md §2B) — importing this package
registers every query into datafusion_nats_spark.registry.REGISTRY.

The reference inherits this entire surface from the embedded DataFusion 48
engine (reference: Cargo.toml:7, examples/simple_query.rs:72-77); here it
is expressed Spark-first: declarative DataFrame/SQL plans, Catalyst picks
the physical strategy, explicit broadcast hints where a dimension table is
guaranteed small at any scale factor.
"""

from datafusion_nats_spark.queries import (  # noqa: F401
    advanced,
    aggregates,
    functions_scalar,
    joins,
    maintenance,
    projection_filter,
    scale_patterns,
    setops_subqueries,
    timeseries,
    tpch,
    windows,
)
