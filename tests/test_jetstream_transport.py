"""JetStream transport: routing + offset-contract tests.

``transport=jetstream`` shares the replayable offset contract with the
file-log transport; the backing store is chosen by URL scheme
(``memory://`` → LocalLogBroker, ``nats://`` → JetStreamBroker, which
uses nats-py when installed and the stdlib $JS.API wire client
otherwise). Every routing path is executable here with the file log as
the store; the contract-equivalence of the two stores is pinned
differentially against MiniNatsServer(jetstream=True), and the live e2e
flavor runs (hermetically if needed) in test_nats_live.py."""

from __future__ import annotations

import pytest

from datafusion_nats_spark.sources.broker import (
    JetStreamBroker,
    LocalLogBroker,
    get_broker,
    nats_available,
)
from datafusion_nats_spark.sources.nats_source import register

KV = "id INT, name STRING"


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


@pytest.fixture()
def broker():
    b = get_broker("memory://jstest")
    b.clear()
    yield b
    b.clear()


def test_get_broker_dispatches_on_scheme():
    assert isinstance(get_broker("memory://x"), LocalLogBroker)
    assert isinstance(get_broker("nats://localhost:4222"), JetStreamBroker)


# port 1 is never a NATS server: connection-refused deterministically,
# whether or not a real broker runs on the conventional 4222
_UNREACHABLE = "nats://127.0.0.1:1"


def test_jetstream_broker_fails_loudly_without_server():
    """Without nats-py (this sandbox), JetStreamBroker speaks the
    $JS.API wire protocol itself; against an unreachable server its
    methods must fail with a loud connection error at call time — never
    an ImportError or AttributeError — while construction stays cheap so
    planning code can hold handles without a broker running."""
    b = JetStreamBroker(_UNREACHABLE)
    assert b.stream_name("test.data.live").startswith("sg_test_data_live_")
    # sanitization alone would collapse distinct subjects — the md5
    # suffix keeps the subject->stream mapping injective
    assert b.stream_name("test.data.live") != b.stream_name("test_data_live")
    if not nats_available():
        with pytest.raises(OSError):
            b.size("test.data.live")


def test_wildcards_over_jetstream_surface_connection_errors(spark):
    """JetStream IS subject-enumerable (list_subjects recovers the bound
    subject from each sg_ stream's config), so wildcard expansion against
    a nats:// URL proceeds to the broker — and with no server reachable
    it must surface the connection failure, never an AttributeError from
    a missing list_subjects. The live expansion is exercised in
    test_nats_live.py (hermetically via MiniNatsServer(jetstream=True))."""
    df = (
        spark.read.format("nats")
        .schema(KV)
        .option("url", _UNREACHABLE)
        .option("subject", "orders.*")
        .option("transport", "jetstream")
        .load()
    )
    with pytest.raises(Exception) as ei:
        df.collect()
    msg = str(ei.value)
    assert "AttributeError" not in msg
    assert "refused" in msg.lower() or "nats" in msg.lower() or "Connection" in msg


def test_jetstream_transport_reads_replayable_log(spark, broker):
    """transport=jetstream exercises the same offset-range machinery;
    with a memory:// URL the store is the local log, so the full path —
    executor ingest, offset slicing, metadata columns — runs here."""
    for i, name in enumerate(["apple", "banana", "orange", "plum", "mango"]):
        broker.publish("js.fruits", f"{i + 1},{name}")
    df = (
        spark.read.format("nats")
        .schema(KV)
        .option("url", "memory://jstest")
        .option("subject", "js.fruits")
        .option("transport", "jetstream")
        .option("ingest", "executor")
        .option("numPartitions", "2")
        .option("startingOffset", "1")
        .option("endingOffset", "4")
        .load()
    )
    assert sorted((r.id, r.name) for r in df.collect()) == [
        (2, "banana"),
        (3, "orange"),
        (4, "plum"),
    ]


def test_jetstream_transport_metadata_columns(spark, broker):
    for i in range(3):
        broker.publish("js.meta", f"{i},row{i}")
    df = (
        spark.read.format("nats")
        .schema(KV + ", _subject STRING, _offset LONG")
        .option("url", "memory://jstest")
        .option("subject", "js.meta")
        .option("transport", "jetstream")
        .option("includeMetadata", "true")
        .load()
    )
    rows = sorted((r.id, r._subject, r._offset) for r in df.collect())
    assert rows == [(0, "js.meta", 0), (1, "js.meta", 1), (2, "js.meta", 2)]


def test_core_nats_transport_still_rejects_executor_ingest(spark):
    from datafusion_nats_spark.codec import CodecError

    df = (
        spark.read.format("nats")
        .schema(KV)
        .option("url", "nats://localhost:4222")
        .option("subject", "x")
        .option("transport", "nats")
        .option("ingest", "executor")
        .load()
    )
    with pytest.raises(Exception) as ei:
        df.collect()
    assert "replayable" in str(ei.value)


def test_unknown_transport_rejected(spark):
    df = (
        spark.read.format("nats")
        .schema(KV)
        .option("url", "memory://jstest")
        .option("subject", "x")
        .option("transport", "carrier-pigeon")
        .load()
    )
    with pytest.raises(Exception) as ei:
        df.collect()
    assert "unknown transport" in str(ei.value)


def test_broker_contract_differential_log_vs_jetstream_wire():
    """The replayable-transport contract, pinned differentially: a random
    sequence of publish/size/fetch/clear operations must produce
    IDENTICAL results on the file-backed LocalLogBroker and on the
    wire-backed JetStreamBroker against MiniNatsServer(jetstream=True) —
    the equivalence that lets every offset-range consumer (executor
    ingest, metadata columns, streaming checkpoints) run unchanged on
    either backend. Purge semantics (first_seq advance) are exercised
    mid-sequence."""
    import random

    from datafusion_nats_spark.sources.nats_wire import MiniNatsServer

    rng = random.Random(20260814)
    subjects = ["c.a", "c.b", "c.deep.x"]
    with MiniNatsServer(jetstream=True) as srv:
        log = get_broker("memory://contract_diff")
        js = JetStreamBroker(srv.url)
        log.clear()
        seq = 0
        for step in range(120):
            op = rng.choice(["publish", "publish", "publish", "size", "fetch", "clear_one"])
            s = rng.choice(subjects)
            if op == "publish":
                seq += 1
                payload = f"{seq},msg{seq}".encode()
                log.publish(s, payload)
                js.publish(s, payload)
            elif op == "size":
                assert log.size(s) == js.size(s), f"step {step} size({s})"
            elif op == "fetch":
                start = rng.randint(0, 6)
                end = rng.choice([None, start + rng.randint(0, 8)])
                assert log.fetch(s, start, end) == js.fetch(s, start, end), (
                    f"step {step} fetch({s}, {start}, {end})"
                )
            else:
                log.clear(s)
                js.clear(s)
        for s in subjects:  # final full-state agreement
            assert log.fetch(s, 0) == js.fetch(s, 0)
        # wildcard planning surface agrees on the live subjects
        assert set(log.list_subjects()) >= set(
            x for x in subjects if log.size(x) > 0
        )
        log.clear()
        js.clear()


def test_subjects_overlap_token_algebra():
    """Pattern-vs-pattern overlap (the STREAM.CREATE admission test):
    literals, '*' single-token, '>' tail wildcards."""
    from datafusion_nats_spark.sources.broker import subjects_overlap

    yes = [
        ("orders.eu", "orders.eu"),
        ("orders.*", "orders.eu"),
        ("orders.*", "*.eu"),
        ("orders.>", "orders.eu.west"),
        ("orders.>", "orders.*"),
        (">", "anything.at.all"),
        ("a.*.c", "a.b.>"),
    ]
    no = [
        ("orders.eu", "orders.us"),
        ("orders.*", "orders"),          # '*' needs exactly one token
        ("orders.*", "orders.eu.west"),  # length mismatch
        ("orders.>", "orders"),          # '>' needs at least one token
        ("a.*.c", "a.*.d"),
        ("a.b", "a.b.c"),
    ]
    for a, b in yes:
        assert subjects_overlap(a, b) and subjects_overlap(b, a), (a, b)
    for a, b in no:
        assert not subjects_overlap(a, b) and not subjects_overlap(b, a), (a, b)


def test_stream_create_rejects_overlapping_subjects():
    """Real JetStream refuses two streams binding overlapping subject
    spaces (err_code 10065); the mini server must too, or _js_capture
    could double-store a message while PubAck'ing only the first match."""
    from datafusion_nats_spark.sources.nats_wire import (
        JetStreamWireClient,
        MiniNatsServer,
        NatsWireError,
    )

    with MiniNatsServer(jetstream=True) as srv:
        js = JetStreamWireClient(srv.url)
        js.create_stream("A", ["orders.*"])
        with pytest.raises(NatsWireError, match="10065"):
            js.create_stream("B", ["orders.eu"])       # literal under A's '*'
        with pytest.raises(NatsWireError, match="10065"):
            js.create_stream("C", ["orders.>"])        # tail over A's space
        js.create_stream("D", ["orders"])               # fewer tokens: disjoint
        js.create_stream("E", ["shipments.*.eu"])       # different root
        # idempotent re-create of an existing stream still answers info
        js.create_stream("A", ["orders.*"])
        assert js.stream_info("A") is not None
        # …but re-create with a DIFFERENT config is err_code 10058
        # ('stream name already in use with a different configuration'),
        # not a silent keep-the-old-one (ADVICE round 5)
        with pytest.raises(NatsWireError, match="10058"):
            js.create_stream("A", ["orders.us"])
        # the rejected create must not have mutated the stored config
        js.create_stream("A", ["orders.*"])
        # exactly one stream ever owns a publish: the ack seq advances on
        # A alone and the message is stored once
        seq1 = js.publish("orders.eu", b"m1")
        seq2 = js.publish("orders.eu", b"m2")
        assert (seq1, seq2) == (1, 2)
        assert js.get_msg("A", 1) == b"m1"
