"""Structured Streaming pipelines — importing registers their queries."""

from datafusion_nats_spark.streaming import pipelines  # noqa: F401
