"""Sources — the net-new engineering vs. Spark's built-ins (SURVEY §7.3):
the reference's NATS subject→table bridge, rebuilt on the PySpark Python
Data Source API (batch + Structured Streaming)."""

from datafusion_nats_spark.sources.broker import LocalLogBroker, get_broker  # noqa: F401
from datafusion_nats_spark.sources.avro_source import AvroDataSource, register_avro  # noqa: F401
from datafusion_nats_spark.sources.nats_source import NatsDataSource, register  # noqa: F401
