"""Streaming semantics through the NATS source: watermark late-data
dropping (two-phase publish), foreachBatch sinks, availableNow/trigger
behavior — the semantics the reference's dead batch-timeout machinery
never delivered (SURVEY §4.1)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_nats_spark.sources import get_broker, register

EVT_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("key", T.StringType(), False),
    ]
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


@pytest.fixture()
def broker():
    b = get_broker("memory://stream_sem")
    b.clear()
    yield b
    b.clear()


def _stream(spark, subject, **opts):
    reader = (
        spark.readStream.format("nats")
        .schema(EVT_SCHEMA)
        .option("url", "memory://stream_sem")
        .option("subject", subject)
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    return reader.load()


def test_watermark_drops_late_data(spark, broker):
    """Publish an on-time batch, let the watermark advance, then publish an
    event older than the watermark — update-mode aggregation must never
    count the late event."""
    on_time = [
        b"2024-01-01 10:00:00,a",
        b"2024-01-01 10:05:00,a",
        b"2024-01-01 11:00:00,b",  # advances watermark to 10:50
    ]
    for p in on_time:
        broker.publish("wm", p)

    agg = (
        _stream(spark, "wm")
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes"), "key")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window").start.alias("w"), "key", "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_out")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        # late: 10:00 window, far below the 10:50 watermark
        broker.publish("wm", b"2024-01-01 10:01:00,a")
        q.processAllAvailable()
        # a fresh on-time row proves the stream is still progressing
        broker.publish("wm", b"2024-01-01 11:30:00,b")
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM wm_out").collect()
        counts = {}
        for r in rows:  # update mode: later rows supersede earlier ones
            counts[(r.w.isoformat(), r.key)] = r.n
        # the 10:00/a window must still show 2 — the late event was dropped
        assert counts.get(("2024-01-01T10:00:00", "a")) == 2, f"sink state: {counts}"
        assert counts.get(("2024-01-01T11:30:00", "b")) == 1, f"sink state: {counts}"
    finally:
        q.stop()


def test_foreach_batch_sink(spark, broker, tmp_path):
    """foreachBatch: exactly the pattern for transactional/custom sinks —
    each micro-batch lands as one parquet write with its epoch id."""
    for i in range(6):
        broker.publish("fb", f"2024-01-01 10:0{i}:00,k{i % 2}".encode())

    out_dir = str(tmp_path / "fb_out")
    seen_epochs = []

    def sink(batch_df, epoch_id):
        seen_epochs.append(epoch_id)
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        _stream(spark, "fb", maxMessagesPerBatch="2")
        .writeStream.foreachBatch(sink)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    result = spark.read.parquet(out_dir)
    assert result.count() == 6
    assert len(seen_epochs) >= 3  # 6 messages / 2 per batch
    assert sorted(r.key for r in result.collect()) == ["k0", "k0", "k0", "k1", "k1", "k1"]


def test_stream_restart_resumes_from_checkpoint(spark, broker, tmp_path):
    """Offsets are replayable (file-backed log): a restarted query with the
    same checkpoint continues from the committed offset instead of
    re-reading — the exactly-once story core NATS can't give
    (SURVEY §1.5) made concrete."""
    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def run_once():
        q = (
            _stream(spark, "resume")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    for i in range(3):
        broker.publish("resume", f"2024-01-01 10:00:0{i},first".encode())
    run_once()
    for i in range(2):
        broker.publish("resume", f"2024-01-01 11:00:0{i},second".encode())
    run_once()

    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == 5  # no duplicates from the restart
    assert sorted(r.key for r in rows) == ["first"] * 3 + ["second"] * 2


def test_available_now_trigger_drains_and_terminates(spark, broker):
    """Trigger.AvailableNow: process everything present, then stop —
    the batch-like streaming mode (the reference's LIMIT-bounded
    consumption, expressed as a trigger)."""
    for i in range(7):
        broker.publish("avnow", f"2024-01-01 10:00:0{i},k".encode())
    # note: availableNow snapshots latestOffset() once, so the admission
    # cap (maxMessagesPerBatch) bounds what one availableNow run drains —
    # leave it at the default so a single run sees the whole log
    q = (
        _stream(spark, "avnow")
        .writeStream.format("memory")
        .queryName("avnow_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert not q.isActive  # drained and self-terminated
    assert spark.sql("SELECT count(*) n FROM avnow_out").collect()[0].n == 7


def test_multi_subject_streaming_composite_offsets(spark, broker):
    """One query over a comma-separated subject list (round 6): offsets
    are a per-subject counter map, rows arrive from every log."""
    for i in range(3):
        broker.publish("ms.a", f"2024-01-01 10:00:0{i},a{i}".encode())
    for i in range(2):
        broker.publish("ms.b", f"2024-01-01 11:00:0{i},b{i}".encode())
    q = (
        _stream(spark, "ms.a,ms.b")
        .writeStream.format("memory")
        .queryName("ms_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("SELECT key FROM ms_out").collect()
    assert sorted(r.key for r in rows) == ["a0", "a1", "a2", "b0", "b1"]


def test_wildcard_streaming_discovers_new_subjects(spark, broker):
    """'orders.*' streaming: wildcards re-resolve per trigger, so a
    subject that starts publishing MID-QUERY joins from offset 0 —
    nothing missed, because each subject log is replayable."""
    broker.publish("wc.eu", b"2024-01-01 10:00:00,eu0")
    broker.publish("wc.us", b"2024-01-01 10:00:01,us0")
    q = (
        _stream(spark, "wc.*")
        .writeStream.format("memory")
        .queryName("wc_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = sorted(
            r.key for r in spark.sql("SELECT key FROM wc_out").collect()
        )
        assert got1 == ["eu0", "us0"]
        # a brand-new subject appears while the query runs
        broker.publish("wc.apac", b"2024-01-01 10:00:02,ap0")
        broker.publish("wc.eu", b"2024-01-01 10:00:03,eu1")
        q.processAllAvailable()
        got2 = sorted(
            r.key for r in spark.sql("SELECT key FROM wc_out").collect()
        )
        assert got2 == ["ap0", "eu0", "eu1", "us0"]
    finally:
        q.stop()


def test_multi_subject_row_cap_is_fair():
    """The per-trigger row budget splits equal-share across hungry
    subject logs (deterministic; a hot subject cannot starve others)."""
    from datafusion_nats_spark.sources.nats_source import NatsStreamReader

    alloc = NatsStreamReader._fair_allocate({"a": 100, "b": 3, "c": 100}, 10)
    assert sum(alloc.values()) == 10
    assert alloc["b"] == 3  # got everything it had
    assert abs(alloc["a"] - alloc["c"]) <= 1  # equal share of the rest
    # budget larger than total available: everything admitted
    assert NatsStreamReader._fair_allocate({"a": 2, "b": 1}, 10) == {
        "a": 2,
        "b": 1,
    }
    # zero-available subjects get nothing
    assert NatsStreamReader._fair_allocate({"a": 0, "b": 5}, 3) == {
        "a": 0,
        "b": 3,
    }


def test_multi_subject_caps_split_epochs(spark, broker):
    """maxMessagesPerBatch applies across the subject set per trigger;
    the backlog drains over multiple epochs with no row lost."""
    for i in range(4):
        broker.publish("cap.a", f"2024-01-01 10:00:0{i},a{i}".encode())
        broker.publish("cap.b", f"2024-01-01 10:00:0{i},b{i}".encode())
    q = (
        _stream(spark, "cap.a,cap.b", maxMessagesPerBatch="3")
        .writeStream.format("memory")
        .queryName("cap_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT key FROM cap_out").collect()
        assert sorted(r.key for r in rows) == [
            "a0", "a1", "a2", "a3", "b0", "b1", "b2", "b3",
        ]
        # 8 rows at <=3 per trigger → at least 3 data epochs
        data_epochs = [p for p in q.recentProgress if p["numInputRows"] > 0]
        assert len(data_epochs) >= 3
        assert all(p["numInputRows"] <= 3 for p in data_epochs)
    finally:
        q.stop()


def test_multi_subject_byte_cap_never_starves_oversize_head(broker):
    """Round-6 self-review repro: with a shared byte budget, a subject
    whose HEAD message exceeds the budget must still make progress even
    while an earlier-sorted subject has steady small traffic — the walk
    order rotates per trigger and the front subject may admit its head
    over budget."""
    from datafusion_nats_spark.sources.nats_source import NatsStreamReader

    broker.publish("st.b", b"2024-01-01 10:00:00," + b"x" * 2000)  # oversize
    r = NatsStreamReader(
        EVT_SCHEMA,
        {
            "url": "memory://stream_sem",
            "subject": "st.a,st.b",
            "maxMessagesPerBatch": "0",
            "maxBytesPerBatch": "100",
        },
    )
    admitted_b = 0
    for i in range(4):  # 2 subjects → rotation puts st.b in front every 2nd
        broker.publish("st.a", f"2024-01-01 10:00:0{i},k".encode())
        off = r.latestOffset()["offsets"]
        admitted_b = max(admitted_b, off.get("st.b", 0))
    assert admitted_b == 1, "oversize head message starved behind st.a"


def test_multi_subject_restart_fast_forwards_counters(broker):
    """Round-6 self-review repro: after a checkpointed restart the
    pacing counters are fresh, but partitions() receives the committed
    offsets — the counters must fast-forward to them instead of
    crawling from 0 in cap-sized empty batches."""
    from datafusion_nats_spark.sources.nats_source import NatsStreamReader

    for i in range(8):
        broker.publish("rs.a", f"2024-01-01 10:00:0{i},k{i}".encode())
    r = NatsStreamReader(
        EVT_SCHEMA,
        {"url": "memory://stream_sem", "subject": "rs.a,rs.b",
         "maxMessagesPerBatch": "2"},
    )
    committed = {"offsets": {"rs.a": 6}}  # the checkpointed restart state
    r.partitions(committed, committed)  # Spark replans the last batch first
    off = r.latestOffset()["offsets"]
    assert off["rs.a"] == 8  # 6 (fast-forwarded) + cap 2 — NOT 0 + 2
    # single-subject path fast-forwards identically
    s = NatsStreamReader(
        EVT_SCHEMA,
        {"url": "memory://stream_sem", "subject": "rs.a",
         "maxMessagesPerBatch": "2"},
    )
    s.partitions({"offset": 6}, {"offset": 6})
    assert s.latestOffset()["offset"] == 8


def test_unbounded_admission_drains_in_one_epoch(spark, broker):
    """maxMessagesPerBatch=0 = unbounded admission: one trigger admits
    the whole backlog. This is the throughput mode — the per-epoch fixed
    cost (~0.5 s of offset/commit/task machinery,
    PERFORMANCE.md §streaming-epoch-budget) makes a small cap the
    bottleneck, e.g. the default 1000 tops out near 2k rows/s no matter
    how fast the decode is."""
    n = 2500  # > default 1000 cap so the distinction is observable
    for i in range(n):
        broker.publish("unb", f"2024-01-01 10:00:{i % 60:02d},k{i}".encode())
    q = (
        _stream(spark, "unb", maxMessagesPerBatch="0")
        .writeStream.format("memory")
        .queryName("unb_out")
        .outputMode("append")
        .trigger(availableNow=True)  # snapshots latestOffset() ONCE
        .start()
    )
    q.awaitTermination(60)
    assert not q.isActive
    # one unbounded admission window covered the entire backlog
    assert spark.sql("SELECT count(*) n FROM unb_out").collect()[0].n == n
    # negative cap rejected at reader construction (the query-side error
    # surfaces asynchronously, so pin the validation on the class itself)
    import pytest

    from datafusion_nats_spark.codec import CodecError
    from datafusion_nats_spark.sources.nats_source import NatsStreamReader

    with pytest.raises(CodecError, match="maxMessagesPerBatch"):
        NatsStreamReader(
            EVT_SCHEMA,
            {
                "url": "memory://stream_sem",
                "subject": "unb",
                "maxMessagesPerBatch": "-1",
            },
        )


def test_transform_with_state_user_stats(spark):
    """Spark 4.x stateful-v2 operator (StatefulProcessor + ValueState).
    Skipped where the protobuf package (required by the TWS state-server
    protocol) is absent; the applyInPandasWithState twin covers the
    capability in the oracle gate either way."""
    import pytest

    from datafusion_nats_spark.streaming.pipelines import (
        stream_tws_user_stats,
        tws_available,
    )

    if not tws_available():
        pytest.skip("protobuf not installed — transformWithStateInPandas unavailable")
    res = stream_tws_user_stats(spark, "/root/testdata/sf0.001")
    batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    assert res.count() == batch.select("user_id").distinct().count()


def test_foreach_batch_exactly_once_replay(spark, broker, tmp_path):
    """Exactly-once foreachBatch: idempotent per-epoch overwrite survives a
    batch replay. Crash-after-write-before-commit is simulated by deleting
    the last entry of the checkpoint's commits/ log, which forces Spark to
    re-run that epoch on restart; dynamic partition overwrite by batch_id
    makes the re-run a no-op instead of a duplicate."""
    import os

    ckpt = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")

    def sink(batch_df, epoch_id):
        (
            batch_df.withColumn("batch_id", F.lit(epoch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    def run_once():
        q = (
            _stream(spark, "eo")
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        q.awaitTermination(30)  # fully deregister before the restart

    for i in range(4):
        broker.publish("eo", f"2024-01-01 10:00:0{i},k{i}".encode())
    run_once()
    assert spark.read.parquet(out_dir).count() == 4

    # simulate crash between the sink write and the checkpoint commit:
    # drop the newest commit marker so the epoch replays on restart
    # (and its Hadoop-local-FS .crc sidecar, or the re-commit rename
    # sees a phantom existing file)
    commits = [f for f in os.listdir(os.path.join(ckpt, "commits")) if not f.startswith(".")]
    last = max(commits, key=int)
    os.remove(os.path.join(ckpt, "commits", last))
    crc = os.path.join(ckpt, "commits", f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    run_once()

    rows = spark.read.parquet(out_dir).collect()
    assert len(rows) == 4  # replayed epoch overwrote itself — no duplicates
    assert sorted(r.key for r in rows) == ["k0", "k1", "k2", "k3"]


def test_streaming_progress_metrics_reflect_admission(spark, broker):
    """Observability: recentProgress reports per-batch numInputRows, which
    must respect the maxMessagesPerBatch admission cap (the reference's
    batch_size analogue) — the metrics surface an operator SLO would
    monitor."""
    for i in range(10):
        broker.publish("obs", f"2024-01-01 10:00:0{i % 10},k".encode())
    q = (
        _stream(spark, "obs", maxMessagesPerBatch="3")
        .writeStream.format("memory")
        .queryName("obs_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        batches = [p["numInputRows"] for p in q.recentProgress if p["numInputRows"] > 0]
    finally:
        q.stop()
    assert sum(batches) == 10
    assert max(batches) <= 3  # admission control honored per trigger
    assert len(batches) >= 4  # 10 rows / cap 3 -> at least 4 non-empty batches


def test_stream_stream_left_outer_join(spark, broker):
    """LEFT OUTER stream-stream join: the unmatched left row may only
    emit (with NULL right side) once the watermark passes its join
    window — Structured Streaming's outer-join state management, driven
    two-phase through the replayable broker."""
    imps = (
        _stream(spark, "sj_imp")
        .selectExpr("ts AS i_ts", "key AS ad")
        .withWatermark("i_ts", "5 minutes")
    )
    clicks = (
        _stream(spark, "sj_click")
        .selectExpr("ts AS c_ts", "key AS c_ad")
        .withWatermark("c_ts", "5 minutes")
    )
    joined = imps.join(
        clicks,
        (F.col("ad") == F.col("c_ad"))
        & (F.col("c_ts") >= F.col("i_ts"))
        & (F.col("c_ts") <= F.col("i_ts") + F.expr("INTERVAL 10 MINUTES")),
        "left_outer",
    )
    q = (
        joined.select("ad", "i_ts", "c_ts")
        .writeStream.format("memory")
        .queryName("sj_out")
        .outputMode("append")
        .start()
    )
    try:
        # phase 1: ad_a impressed and clicked; ad_b impressed, never clicked
        broker.publish("sj_imp", b"2024-01-01 10:00:00,ad_a")
        broker.publish("sj_imp", b"2024-01-01 10:01:00,ad_b")
        broker.publish("sj_click", b"2024-01-01 10:02:00,ad_a")
        q.processAllAvailable()
        # phase 2: far-future rows on BOTH sides push the watermark past
        # ad_b's join window, forcing its NULL-click emission
        broker.publish("sj_imp", b"2024-01-01 12:00:00,ad_z")
        broker.publish("sj_click", b"2024-01-01 12:00:00,ad_z")
        q.processAllAvailable()
        broker.publish("sj_imp", b"2024-01-01 14:00:00,ad_y")
        broker.publish("sj_click", b"2024-01-01 14:00:00,ad_y")
        q.processAllAvailable()
        rows = {r.ad: r.c_ts for r in spark.sql("SELECT * FROM sj_out").collect()}
    finally:
        q.stop()
    assert rows["ad_a"] is not None  # matched inside the window
    assert "ad_b" in rows and rows["ad_b"] is None  # emitted with NULL on expiry


def test_stream_static_enrichment_join(spark, broker):
    """Stream-static join: each micro-batch joins against a static
    (broadcastable) dimension without any streaming state — the standard
    enrich-on-ingest pattern. Keys missing from the dimension survive via
    LEFT OUTER with a default."""
    for i in range(6):
        broker.publish("enrich", f"2024-01-01 10:00:0{i},k{i % 3}".encode())
    dim = spark.createDataFrame(
        [("k0", "gold"), ("k1", "silver")], ["key", "tier"]
    )
    enriched = _stream(spark, "enrich").join(F.broadcast(dim), "key", "left").select(
        "key", "ts", F.coalesce("tier", F.lit("unknown")).alias("tier")
    )
    q = (
        enriched.writeStream.format("memory")
        .queryName("enrich_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT key, tier, count(*) AS n FROM enrich_out GROUP BY key, tier ORDER BY key"
        ).collect()
        assert [(r.key, r.tier, r.n) for r in rows] == [
            ("k0", "gold", 2),
            ("k1", "silver", 2),
            ("k2", "unknown", 2),
        ]
    finally:
        q.stop()


def test_observe_metrics_single_pass(spark, sf_dir):
    """df.observe(): data-quality counters collected as accumulators during
    the SAME pass that produces the result — at 100 TB this replaces a
    second quality-scan of the corpus with zero extra I/O."""
    from pyspark.sql import Observation

    from datafusion_nats_spark.tables import load

    obs = Observation("quality")
    li = load(spark, sf_dir, "lineitem").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("l_quantity") > 25).alias("n_big"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
    )
    out = li.groupBy("l_returnflag").count().collect()
    assert len(out) >= 2
    got = obs.get
    exact = load(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("l_quantity") > 25).alias("n_big"),
        F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
    ).first()
    assert got["n_rows"] == exact["n_rows"]
    assert got["n_big"] == exact["n_big"]
    assert abs(got["revenue"] - exact["revenue"]) < 1e-6


CDC_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("key", T.StringType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("val", T.IntegerType(), False),
    ]
)


def test_foreach_batch_cdc_merge(spark, broker, tmp_path):
    """CDC apply: a stream of upsert/delete change records maintains a
    keyed snapshot table through foreachBatch — the streaming twin of the
    batch SCD-1 merge (maintenance_upsert_scd1). Each epoch merges into a
    new snapshot version (versioned directories = poor-man's atomic
    commit; Delta/Iceberg MERGE INTO at production scale), so a replayed
    epoch would rewrite the same version instead of double-applying."""
    from pyspark.sql import Window as W

    state = {"ver": 0}
    base = str(tmp_path / "state_v")
    spark.createDataFrame(
        [("k1", 1), ("k2", 2)], "key string, val int"
    ).write.parquet(base + "0")

    def apply_cdc(batch_df, epoch_id):
        if batch_df.isEmpty():
            return
        # last change per key within the epoch wins
        w = W.partitionBy("key").orderBy(F.desc("ts"))
        latest = (
            batch_df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("key", "op", "val")
        )
        current = spark.read.parquet(base + str(state["ver"]))
        merged = current.join(latest, "key", "left_anti").unionByName(
            latest.filter(F.col("op") == "upsert").select("key", "val")
        )
        merged.write.parquet(base + str(state["ver"] + 1))
        state["ver"] += 1

    changes = [
        b"2024-01-01 10:00:00,k1,upsert,10",
        b"2024-01-01 10:00:01,k3,upsert,30",
        b"2024-01-01 10:00:02,k2,delete,0",
        b"2024-01-01 10:00:03,k3,upsert,31",
        b"2024-01-01 10:00:04,k4,upsert,40",
        b"2024-01-01 10:00:05,k1,delete,0",
    ]
    for p in changes:
        broker.publish("cdc", p)

    q = (
        spark.readStream.format("nats")
        .schema(CDC_SCHEMA)
        .option("url", "memory://stream_sem")
        .option("subject", "cdc")
        .option("maxMessagesPerBatch", "3")
        .load()
        .writeStream.foreachBatch(apply_cdc)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    assert state["ver"] >= 2  # 6 changes / 3 per batch
    final = {
        r.key: r.val
        for r in spark.read.parquet(base + str(state["ver"])).collect()
    }
    assert final == {"k3": 31, "k4": 40}


def test_stream_stream_full_outer_join(spark, broker):
    """FULL OUTER stream-stream join: unmatched rows on EITHER side emit
    NULL-padded once the watermark passes their join window — both state
    stores evict, not just the left."""
    lhs = (
        _stream(spark, "fo_l")
        .selectExpr("ts AS l_ts", "key AS l_key")
        .withWatermark("l_ts", "5 minutes")
    )
    rhs = (
        _stream(spark, "fo_r")
        .selectExpr("ts AS r_ts", "key AS r_key")
        .withWatermark("r_ts", "5 minutes")
    )
    joined = lhs.join(
        rhs,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr("INTERVAL 10 MINUTES")),
        "full_outer",
    )
    q = (
        joined.select("l_key", "r_key", "l_ts", "r_ts")
        .writeStream.format("memory")
        .queryName("fo_out")
        .outputMode("append")
        .start()
    )
    try:
        # k_both matches; k_left only on the left; k_right only on the right
        broker.publish("fo_l", b"2024-01-01 10:00:00,k_both")
        broker.publish("fo_l", b"2024-01-01 10:01:00,k_left")
        broker.publish("fo_r", b"2024-01-01 10:02:00,k_both")
        broker.publish("fo_r", b"2024-01-01 10:03:00,k_right")
        q.processAllAvailable()
        # advance the watermark on BOTH sides past every join window
        broker.publish("fo_l", b"2024-01-01 12:00:00,k_z")
        broker.publish("fo_r", b"2024-01-01 12:00:00,k_z")
        q.processAllAvailable()
        broker.publish("fo_l", b"2024-01-01 14:00:00,k_y")
        broker.publish("fo_r", b"2024-01-01 14:00:00,k_y")
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM fo_out").collect()
    finally:
        q.stop()
    by_key = {}
    for r in rows:
        by_key.setdefault(r.l_key or r.r_key, []).append((r.l_key, r.r_key))
    assert ("k_both", "k_both") in by_key["k_both"]  # matched pair
    assert ("k_left", None) in by_key["k_left"]      # left expired NULL-padded
    assert (None, "k_right") in by_key["k_right"]    # right expired NULL-padded


def test_drop_duplicates_within_watermark(spark, broker):
    """dropDuplicatesWithinWatermark (Spark 3.5+): dedup keys are evicted
    once the watermark passes them, so a duplicate arriving LATER than the
    watermark delay re-emits — bounded state, unlike dropDuplicates whose
    key set grows forever. Both halves asserted: suppression inside the
    window, re-emission after eviction."""
    dedup = (
        _stream(spark, "ddww")
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["key"])
    )
    q = (
        dedup.writeStream.format("memory")
        .queryName("ddww_out")
        .outputMode("append")
        .start()
    )
    try:
        broker.publish("ddww", b"2024-01-01 10:00:00,k1")
        broker.publish("ddww", b"2024-01-01 10:01:00,k1")  # dup inside window
        q.processAllAvailable()
        # push the watermark far past k1's eviction horizon...
        broker.publish("ddww", b"2024-01-01 12:00:00,adv")
        q.processAllAvailable()
        broker.publish("ddww", b"2024-01-01 12:30:00,adv2")
        q.processAllAvailable()
        # ...then k1 appears again: state was evicted, so it re-emits
        broker.publish("ddww", b"2024-01-01 12:31:00,k1")
        q.processAllAvailable()
        rows = [r.key for r in spark.sql("SELECT key FROM ddww_out").collect()]
    finally:
        q.stop()
    assert rows.count("k1") == 2  # once per watermark window, not 3x
    assert rows.count("adv") == 1 and rows.count("adv2") == 1


def test_rocksdb_state_store_provider(spark, broker):
    """Stateful aggregation with the RocksDB state store provider — the
    scale path for streaming state: keys spill to local disk instead of
    living on the JVM heap, so watermarked state survives key cardinality
    far beyond executor memory. Same query semantics as the default
    HDFS-backed provider; only the provider conf changes."""
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        counts = _stream(spark, "rocks").groupBy("key").count()
        q = (
            counts.writeStream.format("memory")
            .queryName("rocks_out")
            .outputMode("complete")
            .start()
        )
        try:
            for p in [
                b"2024-01-01 10:00:00,k1",
                b"2024-01-01 10:01:00,k1",
                b"2024-01-01 10:02:00,k2",
            ]:
                broker.publish("rocks", p)
            q.processAllAvailable()
            got = {r.key: r["count"] for r in spark.sql("SELECT * FROM rocks_out").collect()}
        finally:
            q.stop()
        assert got == {"k1": 2, "k2": 1}
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_stream_union_two_subjects(spark, broker):
    """Two independent NATS subjects unioned into one streaming DataFrame:
    both sources appear in the same micro-batch plan and the downstream
    aggregate sees the merged stream."""
    merged = _stream(spark, "un_a").union(_stream(spark, "un_b"))
    q = (
        merged.groupBy("key").count()
        .writeStream.format("memory")
        .queryName("union_out")
        .outputMode("complete")
        .start()
    )
    try:
        broker.publish("un_a", b"2024-01-01 10:00:00,x")
        broker.publish("un_b", b"2024-01-01 10:00:01,x")
        broker.publish("un_b", b"2024-01-01 10:00:02,y")
        q.processAllAvailable()
        got = {r.key: r["count"] for r in spark.sql("SELECT * FROM union_out").collect()}
    finally:
        q.stop()
    assert got == {"x": 2, "y": 1}


def test_stateful_event_time_timeout_closes_sessions(spark, broker):
    """applyInPandasWithState with EventTimeTimeout: a per-key session
    accumulates counts and arms a timeout 10 minutes past its newest
    event; when the watermark (driven by OTHER keys' later events)
    crosses that mark, Spark invokes the function with hasTimedOut=True
    and the state must emit its final 'closed' row and be removed —
    explicit state eviction, the bounded-state guarantee for custom
    operators."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def session(key, pdfs, state):
        if state.hasTimedOut:
            (n,) = state.get
            state.remove()
            yield pd.DataFrame({"key": [key[0]], "n": [n], "closed": [True]})
            return
        n = state.get[0] if state.exists else 0
        max_ts = None
        for pdf in pdfs:
            n += len(pdf)
            m = pdf["ts"].max()
            max_ts = m if max_ts is None else max(max_ts, m)
        state.update((n,))
        state.setTimeoutTimestamp(int(max_ts.timestamp() * 1000) + 600_000)
        yield pd.DataFrame({"key": [key[0]], "n": [n], "closed": [False]})

    out = (
        _stream(spark, "ett")
        .withWatermark("ts", "1 minute")
        .groupBy("key")
        .applyInPandasWithState(
            session,
            outputStructType="key string, n long, closed boolean",
            stateStructType="n long",
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ett_out")
        .outputMode("update")
        .start()
    )
    try:
        broker.publish("ett", b"2024-01-01 10:00:00,s1")
        broker.publish("ett", b"2024-01-01 10:02:00,s1")
        q.processAllAvailable()
        # other-key traffic pushes the watermark past s1's 10:12 deadline
        broker.publish("ett", b"2024-01-01 10:30:00,mover")
        q.processAllAvailable()
        broker.publish("ett", b"2024-01-01 10:40:00,mover")
        q.processAllAvailable()
        rows = [
            (r.key, r.n, r.closed)
            for r in spark.sql("SELECT * FROM ett_out").collect()
        ]
    finally:
        q.stop()
    assert ("s1", 2, False) in rows   # live update while open
    assert ("s1", 2, True) in rows    # emitted once on timeout eviction
    assert sum(1 for k, _, c in rows if k == "s1" and c) == 1


DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.IntegerType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)


def test_streaming_incremental_dedup_accumulates_index(spark, broker, tmp_path):
    """NATS document stream screened per micro-batch against the versioned
    LSH signature index (streaming twin of dedup_incremental_new_batch):
    batch 1 must catch a dup of the PRE-EXISTING corpus; batch 2 must
    catch a dup of a BATCH-1 doc — proving the index accumulates."""
    from datafusion_nats_spark.extensions.dedup import (
        _banded_signatures,
        _shingles_spark,
    )
    from datafusion_nats_spark.streaming.pipelines import incremental_dedup_apply

    corpus_text = "alpha beta gamma delta epsilon zeta"
    other_text = "one two three four five six"
    fresh_text = "totally fresh words arriving right now"
    clean_text = "another clean document with unique content"

    # pre-existing corpus index (v0): signatures of docs 100/101
    index_base = str(tmp_path / "lsh_index_v")
    results = str(tmp_path / "verdicts")
    corpus = spark.createDataFrame(
        [(100, corpus_text), (101, other_text)], "doc_id int, text string"
    )
    _banded_signatures(
        corpus.select(
            "doc_id", F.explode(_shingles_spark(F.col("text"))).alias("shingle")
        )
    ).write.parquet(index_base + "0")

    batches = [
        # batch 1: doc 1 duplicates corpus doc 100; doc 2 is clean
        f"1,{corpus_text}".encode(),
        f"2,{fresh_text}".encode(),
        # batch 2: doc 3 duplicates BATCH-1 doc 2; doc 4 is clean
        f"3,{fresh_text}".encode(),
        f"4,{clean_text}".encode(),
    ]
    for p in batches:
        broker.publish("docs", p)

    q = (
        spark.readStream.format("nats")
        .schema(DOC_SCHEMA)
        .option("url", "memory://stream_sem")
        .option("subject", "docs")
        .option("maxMessagesPerBatch", "2")
        .load()
        .writeStream.foreachBatch(incremental_dedup_apply(index_base, results))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.doc_id: (r.is_dup, r.first_match)
        for r in spark.read.parquet(results).collect()
    }
    assert got[1] == (True, 100)   # caught against the pre-existing corpus
    assert got[2] == (False, None)
    assert got[3] == (True, 2)     # caught against batch 1 via the accumulated index
    assert got[4] == (False, None)


def test_incremental_dedup_epoch_versioning_restart(spark, tmp_path):
    """Index versions derive from epoch_id, not closure state: a same-epoch
    retry re-reads the same base version and REWRITES (not double-folds)
    its target, and a restarted query — a fresh foreachBatch closure —
    still probes the index accumulated before the restart."""
    from datafusion_nats_spark.extensions.dedup import (
        _banded_signatures,
        _shingles_spark,
    )
    from datafusion_nats_spark.streaming.pipelines import incremental_dedup_apply

    index_base = str(tmp_path / "idx_v")
    results = str(tmp_path / "verdicts")
    corpus = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], "doc_id int, text string"
    )
    _banded_signatures(
        corpus.select(
            "doc_id", F.explode(_shingles_spark(F.col("text"))).alias("shingle")
        )
    ).write.parquet(index_base + "0")

    fresh = "totally fresh words arriving right now"
    b1 = spark.createDataFrame([(1, fresh)], "doc_id int, text string")
    b2 = spark.createDataFrame([(2, fresh)], "doc_id int, text string")

    apply1 = incremental_dedup_apply(index_base, results)
    apply1(b1, 0)
    apply1(b1, 0)  # same-epoch retry: must rewrite v1 from v0, not fold twice
    v1 = spark.read.parquet(index_base + "1")
    assert v1.groupBy("doc_id", "band_id").count().filter("count > 1").count() == 0

    apply2 = incremental_dedup_apply(index_base, results)  # restart: new closure
    apply2(b2, 1)
    got = {
        r.doc_id: (r.is_dup, r.first_match)
        for r in spark.read.parquet(results).collect()
    }
    assert got[2] == (True, 1)  # caught against the PRE-restart batch 1


def test_streaming_ann_screen_accumulates_index(spark, tmp_path):
    """Round-7 ask #3 — the similarity-family twin of the streaming LSH
    loop: micro-batches of embeddings are screened against the persisted
    IVF index, and each batch's vectors are ingested so LATER batches
    match against them. Batch 1 is a clone of corpus vector 7 → its
    rank-1 hit is 7 at cosine 1.0 through the partition-pruned stored
    index; batch 2 is another clone → its top-2 hits are BOTH the corpus
    vector AND the batch-1 vector (ingested after batch 1), all at
    cosine 1.0. Replaying an epoch rewrites its outputs (idempotent)."""
    from datafusion_nats_spark.extensions.ann_index import ivf_index_build
    from datafusion_nats_spark.extensions.similarity import _emb_double
    from datafusion_nats_spark.streaming.pipelines import ivf_stream_screen_apply
    from datafusion_nats_spark.tables import load

    sf = "/root/testdata/sf0.001"
    index_dir = ivf_index_build(spark, sf, str(tmp_path / "ivf"))
    results = str(tmp_path / "hits")
    apply_fn = ivf_stream_screen_apply(index_dir, results)

    base = load(spark, sf, "embeddings").filter(F.col("vec_id") == 7).select(
        _emb_double().alias("emb")
    )
    b1 = base.select(F.lit(5001).cast("long").alias("vec_id"), "emb")
    b2 = base.select(F.lit(5002).cast("long").alias("vec_id"), "emb")

    apply_fn(b1, 0)
    h0 = spark.read.parquet(f"{results}/epoch=0").collect()
    assert h0 and all(r.query_id == 5001 for r in h0)
    assert all(r.neighbor_id != 5001 for r in h0)  # never matches itself
    assert max(r.cosine for r in h0) < 1.0  # nothing identical stored yet

    apply_fn(b2, 1)
    h1 = {int(r.rn): r for r in spark.read.parquet(f"{results}/epoch=1").collect()}
    # batch-2 query hits the batch-1 INGESTED vector: identical embedding,
    # ingested into the probe's own top cell → rank 1, cosine exactly 1.0
    assert h1[1].neighbor_id == 5001 and h1[1].cosine == 1.0

    # epoch replay: rewrites, never double-ingests (5001 appears once in
    # the epoch-0 delta, and the verdicts are unchanged)
    apply_fn(b2, 1)
    from datafusion_nats_spark.extensions.ann_index import current_index_dir

    droot = f"{current_index_dir(index_dir)}/stream_deltas"
    deltas = spark.read.option("basePath", droot).parquet(droot)
    assert deltas.filter(F.col("vec_id") == 5001).count() == 1
    h1b = spark.read.parquet(f"{results}/epoch=1").collect()
    assert sorted((r.query_id, int(r.rn), r.neighbor_id) for r in h1b) == sorted(
        (r.query_id, int(r.rn), r.neighbor_id) for r in h1.values()
    )


def test_streaming_ann_screen_via_foreachbatch_stream(spark, broker, tmp_path):
    """The same screen wired through a REAL streaming query (NATS memory
    broker → foreachBatch): messages carry (new vec_id, source corpus
    vec_id); the batch resolves embeddings by join and delegates to the
    screen. Message 2 (a clone of the same corpus vector) must hit the
    message-1 vector through the accumulated delta at rank 1 / cosine
    1.0 — across separate micro-batches (maxMessagesPerBatch=1)."""
    from pyspark.sql import types as T

    from datafusion_nats_spark.extensions.ann_index import ivf_index_build
    from datafusion_nats_spark.extensions.similarity import _emb_double
    from datafusion_nats_spark.streaming.pipelines import ivf_stream_screen_apply
    from datafusion_nats_spark.tables import load

    sf = "/root/testdata/sf0.001"
    index_dir = ivf_index_build(spark, sf, str(tmp_path / "ivf_s"))
    results = str(tmp_path / "hits_s")
    inner = ivf_stream_screen_apply(index_dir, results)
    corpus = (
        load(spark, sf, "embeddings")
        .select(F.col("vec_id").alias("src"), _emb_double().alias("emb"))
        .persist()
    )

    def apply(batch_df, epoch_id):
        b = (
            batch_df.join(corpus, batch_df.src_vec_id == corpus.src)
            .select(F.col("vec_id").cast("long").alias("vec_id"), "emb")
        )
        inner(b, epoch_id)

    broker.publish("emb", b"6001,9")
    broker.publish("emb", b"6002,9")
    schema = T.StructType(
        [
            T.StructField("vec_id", T.IntegerType(), False),
            T.StructField("src_vec_id", T.IntegerType(), False),
        ]
    )
    q = (
        spark.readStream.format("nats")
        .schema(schema)
        .option("url", "memory://stream_sem")
        .option("subject", "emb")
        .option("maxMessagesPerBatch", "1")
        .load()
        .writeStream.foreachBatch(apply)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    corpus.unpersist()

    import os

    epochs = sorted(
        int(n.split("=")[1]) for n in os.listdir(results) if n.startswith("epoch=")
    )
    assert len(epochs) >= 2
    last = spark.read.parquet(f"{results}/epoch={epochs[-1]}").collect()
    by_query = {r.query_id for r in last}
    assert by_query == {6002}
    top = next(r for r in last if int(r.rn) == 1)
    # the streamed-in 6001 is now index content: identical embedding,
    # guaranteed in the probe's top cell → rank 1 at cosine exactly 1.0
    assert top.neighbor_id == 6001 and top.cosine == 1.0


def test_streaming_lsh_screen_against_persisted_index(spark, tmp_path):
    """The persisted-LSH streaming screen (round 7): micro-batches are
    screened against the stored banned list + bands PLUS earlier-epoch
    deltas, and fold their own signatures as this epoch's delta. Batch 1
    catches a dup of the PRE-EXISTING corpus; batch 2 catches a dup of a
    BATCH-1 doc through the delta; epoch replay is idempotent. Unlike
    incremental_dedup_apply, the corpus artifact is never rewritten —
    per-batch cost is O(|batch|)."""
    from datafusion_nats_spark.extensions.ann_index import lsh_index_build
    from datafusion_nats_spark.streaming.pipelines import lsh_stream_screen_apply
    from datafusion_nats_spark.tables import load

    sf = "/root/testdata/sf0.001"
    index_dir = lsh_index_build(spark, sf, str(tmp_path / "lshs"))
    results = str(tmp_path / "verdicts")
    apply_fn = lsh_stream_screen_apply(index_dir, results)

    corpus_text = (
        load(spark, sf, "documents").filter(F.col("doc_id") == 3).first().text
    )
    fresh_text = " ".join(f"qv{i} streaming words here" for i in range(30))
    b1 = spark.createDataFrame(
        [(3000001, corpus_text), (3000002, fresh_text)],
        "doc_id long, text string",
    )
    apply_fn(b1, 0)
    v0 = {r.doc_id: (r.is_dup, r.first_match) for r in spark.read.parquet(
        f"{results}/epoch=0"
    ).collect()}
    assert v0[3000001] == (True, 3)       # caught against the stored corpus
    assert v0[3000002] == (False, None)

    b2 = spark.createDataFrame(
        [(3000003, fresh_text)], "doc_id long, text string"
    )
    apply_fn(b2, 1)
    v1 = {r.doc_id: (r.is_dup, r.first_match) for r in spark.read.parquet(
        f"{results}/epoch=1"
    ).collect()}
    assert v1[3000003] == (True, 3000002)  # caught through the epoch-0 delta

    # replay: identical verdicts, delta not duplicated
    apply_fn(b2, 1)
    v1b = {r.doc_id: (r.is_dup, r.first_match) for r in spark.read.parquet(
        f"{results}/epoch=1"
    ).collect()}
    assert v1b == v1
    from datafusion_nats_spark.extensions.ann_index import current_index_dir

    droot = f"{current_index_dir(index_dir)}/stream_deltas"
    deltas = spark.read.option("basePath", droot).parquet(droot)
    per_doc_band = deltas.groupBy("doc_id", "band_id").count()
    assert per_doc_band.filter("count > 1").count() == 0


def test_stream_screen_restart_guard_and_compaction_scoping(spark, tmp_path):
    """Round-7 review pins: (1) an epoch arriving while LATER epochs'
    deltas exist means the stream restarted without its checkpoint —
    both screens refuse instead of silently overwriting epoch 0;
    (2) deltas are scoped INSIDE the index version, so the documented
    rebuild compaction starts a clean slate (no double-counting of
    compacted rows and no banned-list generation mixing)."""
    from datafusion_nats_spark.extensions.ann_index import (
        current_index_dir,
        lsh_index_build,
    )
    from datafusion_nats_spark.streaming.pipelines import lsh_stream_screen_apply

    sf = "/root/testdata/sf0.001"
    index_dir = lsh_index_build(spark, sf, str(tmp_path / "lshg"))
    results = str(tmp_path / "v")
    apply_fn = lsh_stream_screen_apply(index_dir, results)
    text_a = " ".join(f"ga{i} guard words now" for i in range(30))
    text_b = " ".join(f"gb{i} guard words now" for i in range(30))
    apply_fn(spark.createDataFrame([(1, text_a)], "doc_id long, text string"), 0)
    apply_fn(spark.createDataFrame([(2, text_b)], "doc_id long, text string"), 1)
    v1 = current_index_dir(index_dir)
    assert os.path.isdir(f"{v1}/stream_deltas/epoch=1")
    # (1) restart without checkpoint → epoch 0 again → loud refusal
    with pytest.raises(ValueError, match="without its checkpoint"):
        apply_fn(
            spark.createDataFrame([(3, text_a)], "doc_id long, text string"), 0
        )
    # …a genuine same-epoch retry (latest epoch) is still fine
    apply_fn(spark.createDataFrame([(2, text_b)], "doc_id long, text string"), 1)
    # (2) rebuild publishes a fresh version whose delta root is empty —
    # the old version keeps its deltas (a live probe can finish), the
    # new one starts clean and epoch 0 is accepted again
    lsh_index_build(spark, sf, index_dir, rebuild=True)
    v2 = current_index_dir(index_dir)
    assert v2 != v1
    assert not os.path.isdir(f"{v2}/stream_deltas")
    assert os.path.isdir(f"{v1}/stream_deltas/epoch=1")
    apply_fn(spark.createDataFrame([(4, text_a)], "doc_id long, text string"), 0)
    assert os.path.isdir(f"{v2}/stream_deltas/epoch=0")


def test_lsh_stream_screen_unique_ingest_policy(spark, tmp_path):
    """ingest='unique' follows the batch family's accepted-only
    contract: a doc flagged dup is NOT folded into the delta, so a later
    copy matches the ORIGINAL (still-ingested) doc, never the rejected
    one — verdicts agree with what a post-compaction rebuild would say."""
    from datafusion_nats_spark.extensions.ann_index import lsh_index_build
    from datafusion_nats_spark.streaming.pipelines import lsh_stream_screen_apply

    sf = "/root/testdata/sf0.001"
    index_dir = lsh_index_build(spark, sf, str(tmp_path / "lshu"))
    results = str(tmp_path / "v")
    apply_fn = lsh_stream_screen_apply(index_dir, results, ingest="unique")
    fresh = " ".join(f"uq{i} policy words here" for i in range(30))
    apply_fn(spark.createDataFrame([(10, fresh)], "doc_id long, text string"), 0)
    # epoch 1: a dup of doc 10 — flagged, and NOT ingested
    apply_fn(spark.createDataFrame([(11, fresh)], "doc_id long, text string"), 1)
    v1 = {r.doc_id: (r.is_dup, r.first_match) for r in spark.read.parquet(
        f"{results}/epoch=1"
    ).collect()}
    assert v1[11] == (True, 10)
    # epoch 2: another dup — its first_match must still be 10 (the
    # accepted doc), proving 11 never entered the delta
    apply_fn(spark.createDataFrame([(12, fresh)], "doc_id long, text string"), 2)
    v2 = {r.doc_id: (r.is_dup, r.first_match) for r in spark.read.parquet(
        f"{results}/epoch=2"
    ).collect()}
    assert v2[12] == (True, 10)
    with pytest.raises(ValueError, match="ingest policy"):
        lsh_stream_screen_apply(index_dir, results, ingest="bogus")


def test_streaming_bm25_router_via_foreachbatch_stream(spark, broker, tmp_path):
    """The BM25 relevance router wired through a REAL streaming query
    (NATS memory broker → foreachBatch): incoming documents arrive as
    CSV messages, each micro-batch is routed against the stored topic
    workload using the persisted index's background corpus statistics,
    and the per-epoch routes must equal the batch helper's scores for
    the same texts — the streaming execution adds nothing and loses
    nothing (stateless screen)."""
    from pyspark.sql import types as T

    from datafusion_nats_spark.extensions.retrieval import BM25_QUERIES
    from datafusion_nats_spark.extensions.text_index import (
        bm25_index_build,
        bm25_route_score,
    )
    from datafusion_nats_spark.streaming.pipelines import (
        bm25_stream_route_apply,
    )

    sf = "/root/testdata/sf0.001"
    index_dir = bm25_index_build(spark, sf, str(tmp_path / "bm25_s"))
    results = str(tmp_path / "routes_s")
    apply_fn = bm25_stream_route_apply(index_dir, results)

    texts = {
        7001: "hash join hash probe",
        7002: "window sort window",
    }
    for did, text in sorted(texts.items()):
        broker.publish("docs", f"{did},{text}".encode())
    schema = T.StructType(
        [
            T.StructField("doc_id", T.IntegerType(), False),
            T.StructField("text", T.StringType(), False),
        ]
    )
    q = (
        spark.readStream.format("nats")
        .schema(schema)
        .option("url", "memory://stream_sem")
        .option("subject", "docs")
        .option("maxMessagesPerBatch", "1")
        .load()
        .writeStream.foreachBatch(apply_fn)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    import os

    epochs = [n for n in os.listdir(results) if n.startswith("epoch=")]
    assert len(epochs) >= 2  # one pinned message per micro-batch
    streamed = {
        (r.doc_id, r.query_id): r.score
        for r in spark.read.option("basePath", results)
        .parquet(results)
        .collect()
    }
    batch_docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    terms = spark.createDataFrame(BM25_QUERIES, "query_id int, term string")
    want = {
        (r.doc_id, r.query_id): r.score
        for r in bm25_route_score(spark, index_dir, batch_docs, terms).collect()
    }
    assert streamed == want
    # the hash-join doc routes to topic 0 (hash/join), not topic 1
    assert (7001, 0) in streamed and (7001, 1) not in streamed


def test_phash_stream_screen_delta_catches_cross_epoch(spark, sf_dir, tmp_path):
    """The streaming phash screen's delta write-back: a batch-0 doc with
    NOVEL content passes, and a batch-1 byte-identical copy must collide
    with batch 0's folded delta (the cross-epoch path, dormant in the
    small-SF fixtures where no stream docs are mutual near-dups)."""
    from pyspark.sql import Row

    from datafusion_nats_spark.extensions.multimodal import phash_index_build
    from datafusion_nats_spark.streaming.pipelines import (
        phash_stream_screen_apply,
    )

    index_dir = phash_index_build(
        spark, sf_dir, index_dir=str(tmp_path / "phash_sidx")
    )
    results = str(tmp_path / "phash_sres")
    apply_fn = phash_stream_screen_apply(index_dir, results)
    novel = "zq " + "xkvjwpbfyg hmtrlcdnsz " * 3  # ≥32 bytes, not in corpus
    apply_fn(spark.createDataFrame([Row(doc_id=5_000_000, text=novel)]), 0)
    v0 = spark.read.parquet(f"{results}/epoch=0").collect()[0]
    assert not v0.is_dup
    apply_fn(spark.createDataFrame([Row(doc_id=5_000_001, text=novel)]), 1)
    v1 = spark.read.parquet(f"{results}/epoch=1").collect()[0]
    assert v1.is_dup and v1.first_match == 5_000_000
