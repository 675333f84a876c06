"""Live-broker e2e — the golden-path twin of the reference's
integration test (reference tests/integration_test.rs:14-77: publish
``1,apple / 2,banana / 3,orange``, then ``SELECT id, name FROM
nats_table limit 3``).

Two deliberate differences from the reference:

- SUBSCRIBE-then-publish: core NATS is at-most-once, so the reference's
  publish-before-register ordering loses every message and its scan
  hangs waiting for batch 1 (SURVEY §4.1); here a background thread
  delays publishing until the query's subscription is attached.
- ``maxMessages`` bounds the drain so the query terminates even though
  the subject stays open (reference A6 limit-bound fix).

The whole module is gated on a reachable broker at
``nats://localhost:4222`` (plus an importable nats-py) and skips
cleanly otherwise — the sandbox ships neither, but the test is the
executable spec for any environment that does.
"""

from __future__ import annotations

import threading
import time

import pytest

from datafusion_nats_spark.sources.broker import nats_server_reachable
from datafusion_nats_spark.sources.nats_source import register

NATS_URL = "nats://localhost:4222"

pytestmark = pytest.mark.skipif(
    not nats_server_reachable(NATS_URL),
    reason=f"no live NATS broker at {NATS_URL} (or nats-py not installed)",
)

GOLDEN = [b"1,apple", b"2,banana", b"3,orange"]


def _publish_rounds(url: str, subject: str, payloads: list[bytes], stop: threading.Event):
    """Background publisher: repeats the golden triple every 0.5 s until
    stopped, so the query's subscription catches a full burst no matter
    when it attaches (core NATS drops anything published earlier). Each
    burst is back-to-back; any 3 consecutive messages therefore form one
    complete triple (possibly rotated)."""
    import asyncio

    import nats as nats_py

    async def _pub():
        nc = await nats_py.connect(url)
        try:
            while not stop.is_set():
                for p in payloads:
                    await nc.publish(subject, p)
                await nc.flush()
                await asyncio.sleep(0.5)
        finally:
            await nc.close()

    asyncio.run(_pub())


def test_golden_projection_limit_live(spark):
    register(spark)
    subject = "test.data.live"
    stop = threading.Event()
    t = threading.Thread(
        target=_publish_rounds, args=(NATS_URL, subject, GOLDEN, stop), daemon=True
    )
    t.start()
    try:
        df = (
            spark.read.format("nats")
            .schema("id INT, name STRING")
            .option("url", NATS_URL)
            .option("subject", subject)
            .option("maxMessages", "3")
            .option("timeoutMs", "15000")
            .load()
        )
        df.createOrReplaceTempView("nats_table")
        rows = spark.sql("SELECT id, name FROM nats_table limit 3").collect()
    finally:
        stop.set()
        t.join(timeout=10)
    # a window of 3 consecutive messages from the repeated burst is the
    # full triple in some rotation — compare order-insensitively
    assert sorted((r.id, r.name) for r in rows) == [
        (1, "apple"),
        (2, "banana"),
        (3, "orange"),
    ]


def test_jetstream_offset_range_live(spark):
    """JetStream flavor of the golden path: publish the triple through a
    real JetStream stream, then range-read it with transport=jetstream +
    executor ingest — durable offsets, no subscribe/publish race. Skips
    (inside the module-level live gate) when the server has JetStream
    disabled."""
    from datafusion_nats_spark.sources.broker import JetStreamBroker

    b = JetStreamBroker(NATS_URL)
    subject = "test.js.golden"
    try:
        b.ensure_stream(subject)
    except Exception as e:  # JetStream not enabled on this server
        pytest.skip(f"JetStream unavailable: {e}")
    b.clear(subject)
    for p in GOLDEN:
        b.publish(subject, p)
    df = (
        spark.read.format("nats")
        .schema("id INT, name STRING")
        .option("url", NATS_URL)
        .option("subject", subject)
        .option("transport", "jetstream")
        .option("ingest", "executor")
        .option("numPartitions", "2")
        .load()
    )
    assert sorted((r.id, r.name) for r in df.collect()) == [
        (1, "apple"),
        (2, "banana"),
        (3, "orange"),
    ]
    # bounded historical re-read: offsets [1, 3) = banana, orange
    df2 = (
        spark.read.format("nats")
        .schema("id INT, name STRING")
        .option("url", NATS_URL)
        .option("subject", subject)
        .option("transport", "jetstream")
        .option("startingOffset", "1")
        .option("endingOffset", "3")
        .load()
    )
    assert sorted(r.name for r in df2.collect()) == ["banana", "orange"]


def test_jetstream_wildcard_expansion_live(spark):
    """Wildcard subjects over the JetStream backend: list_subjects
    recovers every sg_ stream's bound subject, so 'test.wc.*' expands at
    planning time to the matching literal subjects and the read unions
    their streams. Skips (inside the module-level live gate) when the
    server has JetStream disabled."""
    from datafusion_nats_spark.sources.broker import JetStreamBroker

    b = JetStreamBroker(NATS_URL)
    try:
        b.ensure_stream("test.wc.a")
    except Exception as e:  # JetStream not enabled on this server
        pytest.skip(f"JetStream unavailable: {e}")
    for subject, payload in [
        ("test.wc.a", b"1,apple"),
        ("test.wc.b", b"2,banana"),
        ("test.wc.deeper.c", b"3,orange"),
    ]:
        b.clear(subject)
        b.publish(subject, payload)
    subs = b.list_subjects()
    assert {"test.wc.a", "test.wc.b", "test.wc.deeper.c"} <= set(subs)
    # '*' matches exactly one token: a and b, never deeper.c
    df = (
        spark.read.format("nats")
        .schema("id INT, name STRING")
        .option("url", NATS_URL)
        .option("subject", "test.wc.*")
        .option("transport", "jetstream")
        .load()
    )
    assert sorted((r.id, r.name) for r in df.collect()) == [(1, "apple"), (2, "banana")]
    # '>' matches one-or-more trailing tokens: all three
    df2 = (
        spark.read.format("nats")
        .schema("id INT, name STRING")
        .option("url", NATS_URL)
        .option("subject", "test.wc.>")
        .option("transport", "jetstream")
        .load()
    )
    assert sorted(r.name for r in df2.collect()) == ["apple", "banana", "orange"]
