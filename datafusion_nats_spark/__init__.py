"""datafusion_nats_spark — a PySpark-native analytics engine with the
capability surface of the reference `yarenty/datafusion_nats` crate.

The reference embeds DataFusion 48 to get full SQL over a NATS subject
exposed as a streaming table (reference: src/lib.rs:3-4, src/data_source.rs).
Here Spark SQL / Catalyst plays DataFusion's role; the net-new pieces are:

- ``codec``           — the reference's CSV wire codec semantics
                        (reference: src/codec/csv.rs)
- ``sources``         — NATS batch + Structured Streaming sources via the
                        PySpark Python Data Source API
                        (reference: src/data_source.rs, src/executor.rs)
- ``queries``         — the full relational surface (SURVEY.md §2B),
                        expressed Spark-first with DuckDB oracle twins
- ``extensions``      — LLM-data-pipeline operators (dedup, similarity,
                        text analysis, multimodal) designed for 100 TB scale
- ``streaming``       — micro-batch / watermark / windowed-agg pipelines
                        (reference: src/batch_buffer.rs semantics, done right)
"""

from datafusion_nats_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
