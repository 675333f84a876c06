"""Reference-shaped user API: a ``SessionContext`` facade so a user of
the reference engine can port their program nearly line-for-line.

The reference's whole user-facing surface is (examples/simple_query.rs:
48-82, tests/integration_test.rs:31-56):

    let ctx = SessionContext::new();                  // embedded engine
    ctx.register_table("nats_table", nats_source)?;   // subject -> table
    let df = ctx.sql("SELECT * FROM nats_table LIMIT 3").await?;
    df.show().await?;                                 // or .collect()

This module reproduces that shape on Spark: ``SessionContext()`` wraps a
SparkSession (Catalyst plays DataFusion's role, SURVEY.md §0);
``register_nats_table`` registers a bounded NATS scan as a temp view
(the reference's LIMIT-terminated query pattern, §3.1);
``stream_nats_table`` is the unbounded flavor the reference actually
runs (§3.3); ``register_parquet/csv/json/avro`` mirror DataFusion's
``SessionContext::register_*`` / ``read_avro`` catalog helpers; and
``sql()`` returns a Spark DataFrame, whose ``.show()`` / ``.collect()``
match the reference's consumption idioms verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from datafusion_nats_spark.session import get_spark
from datafusion_nats_spark.sources.avro_source import register_avro
from datafusion_nats_spark.sources.nats_source import register as register_nats


class SessionContext:
    """Drop-in analogue of the reference's ``SessionContext`` surface."""

    def __init__(self, spark: SparkSession | None = None):
        self.spark = spark or get_spark("datafusion_nats")
        register_nats(self.spark)
        register_avro(self.spark)

    # -- catalog registration (reference: ctx.register_table, simple_query.rs:72)

    def register_nats_table(
        self,
        name: str,
        subject: str,
        schema: T.StructType | str | None = None,
        url: str = "memory://default",
        **options,
    ) -> None:
        """Register a NATS subject as a queryable table (bounded batch
        semantics — the reference's `SELECT ... LIMIT n` pattern, where the
        scan stops at the limit / maxMessages / available log)."""
        reader = self.spark.read.format("nats").option("url", url).option(
            "subject", subject
        )
        if schema is None:
            reader = reader.option("inferSchema", "true")
        else:
            reader = reader.schema(schema)
        for k, v in options.items():
            reader = reader.option(k, str(v))
        reader.load().createOrReplaceTempView(name)

    def stream_nats_table(
        self,
        subject: str,
        schema: T.StructType | str,
        url: str = "memory://default",
        **options,
    ) -> DataFrame:
        """The unbounded flavor (reference: NatsExec's continuous consumer
        loop, executor.rs:108-146) — returns a streaming DataFrame for
        ``writeStream``."""
        reader = (
            self.spark.readStream.format("nats")
            .schema(schema)
            .option("url", url)
            .option("subject", subject)
        )
        for k, v in options.items():
            reader = reader.option(k, str(v))
        return reader.load()

    def register_parquet(self, name: str, path: str) -> None:
        self.spark.read.parquet(path).createOrReplaceTempView(name)

    def register_csv(self, name: str, path: str, **options) -> None:
        self.spark.read.options(
            **{"header": "true", "inferSchema": "true", **options}
        ).csv(path).createOrReplaceTempView(name)

    def register_json(self, name: str, path: str) -> None:
        self.spark.read.json(path).createOrReplaceTempView(name)

    def register_avro(self, name: str, path: str) -> None:
        """DataFusion ships read_avro on SessionContext; here it is the
        pure-Python OCF source (sources/avro_source.py)."""
        self.spark.read.format("pyavro").load(path).createOrReplaceTempView(name)

    def deregister_table(self, name: str) -> None:
        self.spark.catalog.dropTempView(name)

    # -- query (reference: ctx.sql(...).await -> DataFrame, simple_query.rs:77)

    def sql(self, query: str) -> DataFrame:
        """Spark DataFrames already carry the reference's consumption
        surface: .show(), .collect(), .schema — no wrapper needed."""
        return self.spark.sql(query)

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    def tables(self) -> list[str]:
        """Reference enables information_schema (simple_query.rs:53); the
        Spark analogue is the catalog listing."""
        return [t.name for t in self.spark.catalog.listTables()]
