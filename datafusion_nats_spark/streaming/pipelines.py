"""Structured Streaming pipelines over the events stream table.

The reference's only streaming machinery is size/timeout micro-batching
(reference: src/batch_buffer.rs:73-86) — no event time, no watermarks, no
windows (SURVEY §2C). These operators are the capabilities a streaming SQL
table *should* have, built on Structured Streaming's incremental model:
tumbling/sliding windows, session windows, watermarked late-data handling,
and streaming deduplication.

Each query here runs the pipeline as a real streaming job (parquet
``readStream`` → ``processAllAvailable`` → memory sink) and returns the
final result table, so the driver's oracle can check the *streaming*
computation against batch SQL — the strongest available evidence that the
incremental execution converges to the batch answer.

Scale notes: windowed aggregations shuffle on (window, key) — bounded
state via watermarks; streaming dedup state is bounded by
``dropDuplicatesWithinWatermark``. `maxFilesPerTrigger` bounds per-batch
admission like the reference's batch_size.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_nats_spark.registry import query


def _stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as an unbounded source: parquet readStream with bounded
    per-trigger admission (micro-batch ≈ reference BatchBuffer flush).

    The stream must be declared with the *physical* schema (ts is INT64
    nanos, unreadable as TimestampType — see tables.load) and rebuild the
    timestamp after the scan.
    """
    import os
    import re
    import tempfile

    path = f"{sf_dir}/events.parquet"
    # The streaming file source requires a *directory*; expose the single
    # parquet file through a symlink dir (read-only testdata can't move).
    src_dir = os.path.join(
        tempfile.gettempdir(), "dnats_stream_src", re.sub(r"[^A-Za-z0-9_.-]", "_", sf_dir)
    )
    os.makedirs(src_dir, exist_ok=True)
    link = os.path.join(src_dir, "part-000.parquet")
    if not os.path.exists(link):
        os.symlink(path, link)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(path).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    ts_dtype = dict(stream.dtypes).get("ts")
    if ts_dtype == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_dtype == "timestamp_ntz":
        # Watermarks require TIMESTAMP_LTZ; UTC session makes the cast
        # value-preserving (see tables.load).
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _run_to_completion(stream_df: DataFrame, output_mode: str) -> DataFrame:
    """Drive a streaming query until the source is exhausted; return the
    materialized result (memory sink)."""
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    spark = stream_df.sparkSession
    return spark.table(name)


@query(
    "stream_tumbling_window",
    oracle="""
    SELECT
      time_bucket(INTERVAL '1 hour', ts) AS window_start,
      event_type,
      count(*)             AS n,
      round(sum(value), 2) AS total_value
    FROM events
    GROUP BY window_start, event_type
    """,
    doc="Streaming tumbling-window aggregation (1h windows, complete "
    "mode) — the incremental result must equal the batch time_bucket "
    "rollup.",
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _stream_events(spark, sf_dir)
    agg = ev.groupBy(F.window("ts", "1 hour"), "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value")
    )
    out = _run_to_completion(
        agg.select(
            F.col("window").start.alias("window_start"), "event_type", "n", "total_value"
        ),
        "complete",
    )
    return out


@query(
    "stream_sliding_window",
    oracle="""
    WITH slides AS (
      SELECT e.*,
             time_bucket(INTERVAL '30 minutes', ts) AS b
      FROM events e
    ), expanded AS (
      -- a 1h window sliding every 30min covers each event twice
      SELECT b AS window_start, value FROM slides
      UNION ALL
      SELECT b - INTERVAL '30 minutes' AS window_start, value FROM slides
    )
    SELECT window_start, count(*) AS n, round(sum(value), 2) AS total_value
    FROM expanded
    GROUP BY window_start
    """,
    doc="Streaming sliding-window aggregation (1h window, 30min slide) — "
    "checked against the batch expansion of the slide assignment.",
)
def stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _stream_events(spark, sf_dir)
    agg = ev.groupBy(F.window("ts", "1 hour", "30 minutes")).agg(
        # sum not avg: window sizes are powers of two here, so averages are
        # binary-exact values whose decimal expansions land exactly on
        # rounding boundaries — where Spark (decimal HALF_UP) and DuckDB
        # (binary round) disagree
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value")
    )
    return _run_to_completion(
        agg.select(F.col("window").start.alias("window_start"), "n", "total_value"),
        "complete",
    )


@query(
    "stream_watermark_late_data",
    # Deterministic regime: the source is ONE parquet file -> one micro-
    # batch, so nothing is ever late; the final watermark is
    # max(ts) - 10min and append mode flushes exactly the windows whose
    # END <= that watermark. That closed-form is the oracle. (Late-DROP
    # behavior needs multi-batch replay and is asserted in
    # test_streaming_semantics.py instead.)
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL '10 minutes' AS w FROM events),
    agg AS (
      SELECT time_bucket(INTERVAL '15 minutes', ts) AS window_start,
             event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT window_start, event_type, n FROM agg, wm
    WHERE window_start + INTERVAL '15 minutes' <= wm.w
    """,
    doc="Watermarked windowed aggregation (10-minute lateness bound) in "
    "append mode — bounded state at scale; emits only watermark-closed "
    "windows (exact closed-form oracle in the single-batch regime); "
    "late-data drop behavior is additionally asserted in tests with a "
    "rate-controlled replay.",
)
def stream_watermark_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _stream_events(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "15 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return _run_to_completion(
        agg.select(F.col("window").start.alias("window_start"), "event_type", "n"),
        "append",
    )


@query(
    "stream_session_window",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL '30 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), sessioned AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM ordered
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           count(*) AS n_events,
           min(ts) AS session_start
    FROM sessioned
    GROUP BY user_id, session_id
    """,
    doc="Session windows (30-minute gap) per user — streaming "
    "session_window vs the batch lag/cumsum sessionization.",
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _stream_events(spark, sf_dir)
    agg = ev.groupBy(F.session_window("ts", "30 minutes"), "user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
    )
    sessions = _run_to_completion(
        agg.select("user_id", "n_events", "session_start"), "complete"
    )
    # assign per-user ordinal session ids so output is engine-comparable
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("session_start")
    return sessions.select(
        "user_id",
        F.row_number().over(w).cast("bigint").alias("session_id"),
        "n_events",
        "session_start",
    )


@query(
    "stream_dedup",
    oracle="""
    SELECT user_id, event_type, count(*) AS n_first_seen
    FROM (
      SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn
      FROM events
    )
    WHERE rn = 1
    GROUP BY user_id, event_type
    """,
    doc="Streaming deduplication on (user_id, event_type): dropDuplicates "
    "keeps the first arrival per key — equals the batch first-row-per-key.",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _stream_events(spark, sf_dir)
    deduped = ev.dropDuplicates(["user_id", "event_type"])
    out = _run_to_completion(
        deduped.select("user_id", "event_type"), "append"
    )
    return out.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n_first_seen"))


@query(
    "stream_stream_join",
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS gap_s
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts BETWEEN c.ts AND c.ts + INTERVAL 30 MINUTE
    """,
    doc="Stream-stream inner join with a time-range condition and "
    "watermarks on both sides (the SymmetricHashJoinExec capability the "
    "reference's unbounded source would need, SURVEY §2B 'Joins — "
    "stream-capable') — state bounded by the 30-minute join window; "
    "converges to the batch interval join.",
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _stream_events(spark, sf_dir)
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        _stream_events(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
        "inner",
    )
    out = _run_to_completion(
        joined.select(
            "click_id",
            "purchase_id",
            "user_id",
            (F.unix_timestamp("p_ts") - F.unix_timestamp("c_ts")).alias("gap_s"),
        ),
        "append",
    )
    return out


@query(
    "stream_stateful_running_totals",
    oracle="""
    SELECT user_id, count(*) AS n_events, round(sum(value), 2) AS total_value
    FROM events
    GROUP BY user_id
    """,
    doc="Custom stateful streaming operator via applyInPandasWithState: "
    "per-user running (count, sum) state updated each micro-batch, "
    "emitted in update mode — the arbitrary-stateful-processing "
    "capability (reference has none, SURVEY §2C 'Stateful ops'). "
    "Converges to the batch group totals once the source drains.",
)
def stream_stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = _stream_events(spark, sf_dir)

    def update(key, pdfs, state):
        import pandas as pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
            }
        )

    out = ev.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_completion(out, "update")


def tws_available() -> bool:
    """True when ``transformWithStateInPandas`` can actually run: the Spark
    4.x stateful-v2 API needs a ``google.protobuf`` runtime for its
    driver↔worker state-server protocol. A real protobuf wheel
    satisfies this; where none exists, the vendored pure-stdlib shim
    (``datafusion_nats_spark.vendor.pbshim`` — varint/length-delimited
    wire format, proto3 presence, oneofs; scope documented in its
    __init__) is installed instead, so this returns True in the sandbox
    too. The JVM side parsing our request bytes and us parsing its
    responses is the authoritative wire-format check
    (tests/test_streaming_semantics.py::test_transform_with_state_user_stats)."""
    try:
        from datafusion_nats_spark.vendor import install_protobuf_shim

        install_protobuf_shim()
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def stream_tws_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running (count, sum, max) via ``transformWithStateInPandas``
    — the Spark 4.x arbitrary-stateful-processing API (StatefulProcessor +
    ValueState handle; successor of applyInPandasWithState). Same
    capability class as ``stream_stateful_running_totals`` (reference has
    none — SURVEY §2C 'Stateful ops'); kept out of the driver registry
    because the API requires the protobuf package at runtime
    (``tws_available()``), with the applyInPandasWithState twin as the
    oracle-checked entry.

    Scale: state is per-key in the executor-local RocksDB state store;
    shuffle is on user_id only — the same bounded-state contract as the
    v1 operator.
    """
    from datafusion_nats_spark.vendor import install_protobuf_shim

    # no-op where a real protobuf wheel exists; otherwise installs the
    # vendored shim AND ships it to executor python workers via
    # addPyFile (they import StateMessage_pb2 in their own processes)
    install_protobuf_shim(spark)

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            schema = StructType(
                [
                    StructField("n", LongType()),
                    StructField("total", DoubleType()),
                    StructField("vmax", DoubleType()),
                ]
            )
            self._state = handle.getValueState("stats", schema)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, total, vmax = (
                self._state.get() if self._state.exists() else (0, 0.0, float("-inf"))
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                vmax = max(vmax, float(pdf["value"].max()))
            self._state.update((n, total, vmax))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                    "max_value": [round(vmax, 2)],
                }
            )

        def close(self) -> None:
            pass

    ev = _stream_events(spark, sf_dir)
    out = ev.select("user_id", "value").groupBy("user_id").transformWithStateInPandas(
        UserStats(),
        outputStructType="user_id long, n_events long, total_value double, max_value double",
        outputMode="Update",
        timeMode="None",
    )
    return _run_to_completion(out, "update")


def incremental_dedup_apply(index_base: str, results_dir: str):
    """Build the ``foreachBatch`` function for STREAMING incremental dedup:
    each micro-batch of documents (doc_id, text) is screened against the
    accumulated LSH signature index, verdicts land in a per-epoch results
    directory, and the batch's own signatures are folded into a new index
    version — so later batches dedup against everything already ingested.

    The streaming twin of ``dedup_incremental_new_batch``: per-batch cost
    is O(|batch|) regardless of how much history the index holds, because
    the probe is an equi-join on (band_id, band_key) and the index grows
    by ~n_bands rows per doc (tiny next to the corpus). Versioned index
    dirs + per-epoch result dirs make epoch replay idempotent (a replayed
    epoch rewrites its own outputs instead of double-applying) — the
    poor-man's atomic commit; Delta/Iceberg MERGE at production scale.

    The index version is DERIVED FROM ``epoch_id`` (epoch ``e`` reads the
    highest existing version ``<= e`` and writes version ``e + 1``), not
    from in-memory state: a same-run epoch retry re-reads the same base
    and rewrites the same target (no double-fold), and a streaming-query
    restart resumes from the accumulated index instead of silently
    probing version 0 again.

    Reference parity note: the reference streams rows from NATS into a SQL
    engine (executor.rs:80-132) but has no stateful operators at all; this
    is the mandated-extension surface composed with the A1 source.
    """
    from datafusion_nats_spark.extensions.dedup import (
        _banded_signatures,
        _cap_buckets,
        _shingles_spark,
    )

    def _base_version(at_most: int) -> int:
        """Highest on-disk index version <= at_most (0 = the seed index,
        written before the stream starts). Listing is one directory stat
        of the index root — at production scale this is the storage-layer
        twin of reading a Delta log's latest committed version."""
        root = os.path.dirname(index_base) or "."
        prefix = os.path.basename(index_base)
        versions = [0]
        for name in os.listdir(root):
            if name.startswith(prefix) and name[len(prefix):].isdigit():
                v = int(name[len(prefix):])
                if v <= at_most:
                    versions.append(v)
        return max(versions)

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        shingled = batch_df.select(
            "doc_id", F.explode(_shingles_spark(F.col("text"))).alias("shingle")
        )
        # micro-batches are far below the df-cap scale; in production the
        # index ships its banned-shingle list and it anti-joins here. The
        # bucket cap still applies: a burst of near-identical messages in
        # one micro-batch must not explode the index probe join.
        banded = _cap_buckets(_banded_signatures(shingled)).persist()
        index = sp.read.parquet(index_base + str(_base_version(epoch_id)))
        coll = (
            banded.alias("n")
            .join(
                index.alias("o"),
                (F.col("n.band_id") == F.col("o.band_id"))
                & (F.col("n.band_key") == F.col("o.band_key")),
            )
            .groupBy(F.col("n.doc_id").alias("probe_doc"))
            .agg(
                F.countDistinct("o.doc_id").alias("n_matches"),
                F.min("o.doc_id").alias("first_match"),
            )
        )
        verdicts = (
            batch_df.select("doc_id")
            .distinct()
            .join(coll, F.col("doc_id") == F.col("probe_doc"), "left")
            .select(
                "doc_id",
                (F.coalesce("n_matches", F.lit(0)) > 0).alias("is_dup"),
                F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
                "first_match",
            )
        )
        # per-epoch dir: replay overwrites, never double-applies
        verdicts.write.mode("overwrite").parquet(f"{results_dir}/epoch={epoch_id}")
        index.unionByName(banded).write.mode("overwrite").parquet(
            index_base + str(epoch_id + 1)
        )
        banded.unpersist()

    return apply


def ivf_stream_screen_apply(index_dir: str, results_dir: str):
    """Build the ``foreachBatch`` function for STREAMING ANN screening
    against the persisted IVF index — the similarity-family twin of
    ``incremental_dedup_apply`` (round-6 verdict ask #3): each
    micro-batch of embeddings (vec_id, emb array<double>) is probed as a
    query batch against the stored codebook + cell-partitioned vectors
    PLUS every earlier epoch's ingested delta; per-query top-k verdicts
    land in a per-epoch results directory; and the batch itself is
    assigned to its nearest cells and written as THIS epoch's delta — so
    later batches match against everything already ingested.

    Per-batch cost: the probe inlines the batch's probed cells as
    literals, so the base-vectors scan partition-prunes exactly like
    ``ivf_index_probe`` and every delta scan prunes on (epoch, cell)
    partition directories; ingest is O(|batch|) (one broadcast-codebook
    assignment + a partitioned append-shaped write). Epoch replay is
    idempotent: a retried epoch OVERWRITES its own ``epoch=N`` delta and
    verdict directories and only ever probes deltas with epoch <
    epoch_id — the same derive-from-epoch_id discipline as the LSH twin.

    Deltas live INSIDE the resolved index version directory
    (``v{N}/stream_deltas``), so the documented compaction is
    self-cleaning: ``ivf_index_build(rebuild=True)`` publishes a fresh
    version with an empty delta root (the ingested vectors live in the
    corpus table by then) and ``gc_index_versions`` reclaims the old
    version together with its stale deltas — a post-rebuild probe can
    never double-count a compacted delta row (round-7 review). A guard
    refuses an epoch that arrives while LATER epochs' deltas exist,
    which only happens when a stream restarts without its checkpoint —
    silently overwriting epoch 0 would drop earlier ingests from the
    screen.
    """
    from datafusion_nats_spark.extensions.ann_index import (
        _assign_to_codebook,
        _pruned_probe,
        current_index_dir,
    )

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        vdir = current_index_dir(index_dir)  # consistent version per batch
        deltas_root = os.path.join(vdir, "stream_deltas")
        _guard_epoch_monotonic(deltas_root, epoch_id)
        codebook = sp.read.parquet(os.path.join(vdir, "codebook"))
        q = batch_df.select(
            F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
        )

        def earlier_deltas(cells):
            # earlier epochs only: the current epoch's (possibly partial,
            # pre-retry) delta must never feed its own probe
            if not os.path.isdir(deltas_root):
                return None
            return (
                sp.read.option("basePath", deltas_root)
                .parquet(deltas_root)
                .filter(
                    (F.col("epoch") < F.lit(int(epoch_id)))
                    & F.col("cell").isin(cells)
                )
                .select("vec_id", F.col("cell").alias("label"), "emb")
            )

        # the ONE shared probe pipeline (ann_index._pruned_probe) — batch
        # and streaming paths cannot drift
        hits = _pruned_probe(sp, vdir, q, extra_vectors=earlier_deltas)
        # per-epoch dir: replay overwrites, never double-applies
        hits.write.mode("overwrite").parquet(f"{results_dir}/epoch={epoch_id}")
        (
            _assign_to_codebook(codebook, batch_df.select("vec_id", "emb"))
            .repartition("cell")
            .write.mode("overwrite")
            .partitionBy("cell")
            .parquet(f"{deltas_root}/epoch={epoch_id}")
        )

    return apply


def _guard_epoch_monotonic(deltas_root: str, epoch_id: int) -> None:
    """Refuse an epoch write while LATER epochs' deltas exist: a genuine
    same-epoch retry never sees later epochs on disk (Spark replays only
    the last uncommitted epoch), so this state means the stream was
    restarted WITHOUT its checkpoint — overwriting epoch 0 would
    silently drop every earlier ingest from the screening index. Resume
    with the original checkpointLocation, or rebuild the index (which
    starts a fresh version with an empty delta root)."""
    if not os.path.isdir(deltas_root):
        return
    later = [
        n
        for n in os.listdir(deltas_root)
        if n.startswith("epoch=") and int(n.split("=", 1)[1]) > int(epoch_id)
    ]
    if later:
        raise ValueError(
            f"epoch {epoch_id} arrived while later deltas exist "
            f"({sorted(later)[:3]}…) under {deltas_root} — the stream was "
            f"restarted without its checkpoint; resume with the original "
            f"checkpointLocation or rebuild the index"
        )


@query(
    "stream_ewma_stateful",
    oracle="""
    WITH seq AS (
      SELECT user_id, value,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             count(*)   OVER (PARTITION BY user_id)    AS n
      FROM events
    )
    SELECT user_id,
           CAST(max(n) AS BIGINT) AS n_events,
           round(sum(value * CASE WHEN rn = 1 THEN pow(0.5, n - 1)
                                  ELSE pow(0.5, n - rn + 1) END), 6)
             AS ewma_final
    FROM seq
    GROUP BY user_id
    """,
    doc="TRUE infinite-impulse EWMA as a custom stateful streaming "
    "operator (applyInPandasWithState): per-user state carries "
    "(count, ewma) across micro-batches and folds e_k = a*x_k + "
    "(1-a)*e_{k-1} with a=0.5 (all weights dyadic). The oracle is the "
    "closed form — w_1 = 0.5^(n-1), w_k = 0.5^(n-k+1) — over the full "
    "event-time order, which the operator reproduces because it sorts "
    "each group's rows by (ts, event_id) before folding (single-batch "
    "regime here; at scale, in-order delivery per key comes from the "
    "log's per-partition ordering, the standard Kafka/NATS contract). "
    "Complements timeseries_ewma_smooth (finite-impulse, batch): this "
    "one never truncates the history and its state is O(1) per key.",
)
def stream_ewma_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.streaming.state import GroupStateTimeout

    ev = _stream_events(spark, sf_dir)

    def update(key, pdfs, state):
        import pandas as pd

        n, ewma = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for v in pdf["value"]:
                v = float(v)
                ewma = v if n == 0 else 0.5 * v + 0.5 * ewma
                n += 1
        state.update((n, ewma))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "ewma_final": [round(ewma, 6)],
            }
        )

    out = (
        ev.select("user_id", "ts", "event_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType="user_id long, n_events long, ewma_final double",
            stateStructType="n long, ewma double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return _run_to_completion(out, "update")


def lsh_stream_screen_apply(index_dir: str, results_dir: str, ingest: str = "all"):
    """Build the ``foreachBatch`` function for streaming dedup screening
    against the PERSISTED LSH index (extensions/ann_index.py) — the
    versioned-artifact counterpart of ``incremental_dedup_apply``, which
    rewrites its whole raw-band index every epoch (fine for the small
    epochs it documents, O(index) per batch). This one never rewrites
    the corpus artifact: each micro-batch of documents (doc_id, text) is
    signed ONCE (the persisted pass is shared between the probe and the
    delta write), screened through ``_lsh_screen`` against the stored
    banned list + bands PLUS every earlier epoch's delta, and its
    signatures become THIS epoch's delta — per-batch cost O(|batch|)
    with the corpus-sized pass amortized into the one-time build.

    ``ingest`` picks the write-back policy:

    - ``"all"`` (default, matching ``incremental_dedup_apply``): every
      screened doc's signatures enter the delta, so transitive chains
      are caught (A≈B≈C where C collides only with B) — at the cost
      that ``first_match`` may name a doc that was itself flagged a dup
      and later dropped from the corpus;
    - ``"unique"`` (the batch family's ``lsh_index_update`` contract:
      probe → keep the non-dups → update): only docs the screen just
      cleared are folded, so the delta matches what compaction will
      find in the corpus table — rebuilds reproduce the same verdicts.

    Deltas live INSIDE the resolved index version directory
    (``v{N}/stream_deltas``), so the documented compaction is
    self-cleaning: ``lsh_index_build(rebuild=True)`` publishes a fresh
    version with an empty delta root and ``gc_index_versions`` reclaims
    the old version together with its stale deltas — a post-rebuild
    probe can never double-count a compacted delta row or mix
    banned-list generations (round-7 review). Epoch replay is
    idempotent (per-epoch overwrite; the probe only reads deltas with
    epoch < epoch_id), and the epoch-monotonic guard refuses a stream
    restarted without its checkpoint. The per-epoch delta read does list
    every earlier epoch's files before the key semi-join prunes rows —
    periodic compaction is what bounds stream age, same as any
    write-optimized index."""
    if ingest not in ("all", "unique"):
        raise ValueError(f"unknown ingest policy {ingest!r}")
    from datafusion_nats_spark.extensions.ann_index import (
        _lsh_screen,
        current_index_dir,
    )
    from datafusion_nats_spark.extensions.dedup import (
        _banded_signatures,
        _shingles_spark,
    )

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        vdir = current_index_dir(index_dir)  # consistent version per batch
        deltas_root = os.path.join(vdir, "stream_deltas")
        _guard_epoch_monotonic(deltas_root, epoch_id)
        docs = batch_df.select("doc_id", "text")
        banned = sp.read.parquet(os.path.join(vdir, "banned"))
        shingled = docs.select(
            "doc_id", F.explode(_shingles_spark(F.col("text"))).alias("shingle")
        )
        # ONE signing pass, persisted: the probe and the delta write
        # share it instead of re-shingling the batch
        new_bands = (
            _banded_signatures(
                shingled.join(F.broadcast(banned), "shingle", "left_anti")
            )
            .select("doc_id", "band_id", "band_key")
            .persist()
        )

        def earlier_deltas(_new_keys):
            # earlier epochs only — the current epoch's (possibly
            # partial, pre-retry) delta must never feed its own probe;
            # key pruning happens inside _lsh_screen
            if not os.path.isdir(deltas_root):
                return None
            return (
                sp.read.option("basePath", deltas_root)
                .parquet(deltas_root)
                .filter(F.col("epoch") < F.lit(int(epoch_id)))
                .select("doc_id", "band_id", "band_key")
            )

        # unpersist in finally: a failed screen/write retries the whole
        # epoch, and without this each retry would persist a fresh copy
        # while the orphaned one stayed cached for the session's lifetime
        try:
            verdicts = _lsh_screen(
                sp, vdir, docs, extra_old=earlier_deltas, new_bands=new_bands
            )
            # per-epoch dirs: replay overwrites, never double-applies
            verdicts.write.mode("overwrite").parquet(
                f"{results_dir}/epoch={epoch_id}"
            )
            fold = new_bands
            if ingest == "unique":
                accepted = (
                    sp.read.parquet(f"{results_dir}/epoch={epoch_id}")
                    .filter(~F.col("is_dup"))
                    .select("doc_id")
                )
                fold = new_bands.join(
                    F.broadcast(accepted), "doc_id", "left_semi"
                )
            (
                fold
                # cluster by the probe join key, matching lsh_index_update
                .repartition("band_id", "band_key")
                .write.mode("overwrite")
                .parquet(f"{deltas_root}/epoch={epoch_id}")
            )
        finally:
            new_bands.unpersist()

    return apply


# --------------------------------------------------------------------------
# streaming ANN screen — registered, oracle-checked
# --------------------------------------------------------------------------

_SCREEN_SHIFT = 1_000_000  # streamed clone ids: corpus vec_id + SHIFT


def _screen_stream_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the deterministic two-batch embedding 'stream' as two
    single-file parquet batches: clones of every vec_id % 5 == 0 corpus
    vector under shifted ids, split by (vec_id div 5) % 2. File mtimes
    are pinned so the file streaming source admits batch 0 strictly
    before batch 1 (oldest-first) — the stream content, order, and batch
    boundaries are all deterministic, which is what lets a streaming
    pipeline carry a full DuckDB oracle."""
    import hashlib
    import shutil as sh

    from datafusion_nats_spark.cache import user_cache_dir
    from datafusion_nats_spark.extensions.similarity import _emb_double
    from datafusion_nats_spark.tables import load

    src = os.path.join(sf_dir, "embeddings.parquet")
    try:
        st = os.stat(src)
        fp = f"{st.st_size}:{int(st.st_mtime)}"
    except OSError:
        fp = "nosrc"
    tag = hashlib.md5(f"{os.path.abspath(sf_dir)}:{fp}:v1".encode()).hexdigest()[:10]
    out = os.path.join(user_cache_dir(), f"screen_stream_{tag}")
    done = os.path.join(out, "_READY")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    # id-space guard (round-7 review): the rerank excludes
    # vec_id == query_id but the oracle has no such exclusion, so a
    # corpus id reaching the shifted clone range would silently diverge
    # the two — refuse instead of diverging
    max_id = (
        load(spark, sf_dir, "embeddings").agg(F.max("vec_id").alias("m")).first().m
    )
    if max_id is not None and max_id >= _SCREEN_SHIFT:
        raise ValueError(
            f"embeddings vec_id reaches {max_id} >= the streamed-clone id "
            f"shift {_SCREEN_SHIFT}; sim_stream_screen's clone ids would "
            f"collide with corpus ids and its oracle would diverge — "
            f"raise _SCREEN_SHIFT above the corpus id space"
        )
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 5 == 0)
    for k in (0, 1):
        batch = e.filter((F.col("vec_id") / 5).cast("long") % 2 == k).select(
            (F.col("vec_id") + _SCREEN_SHIFT).cast("long").alias("vec_id"),
            _emb_double().alias("emb"),
        )
        tmp = os.path.join(out, f"_tmp{k}")
        batch.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        sh.move(os.path.join(tmp, part), os.path.join(out, f"batch{k}.parquet"))
        sh.rmtree(tmp)
        # oldest-first admission: batch 0 gets the earlier mtime
        os.utime(os.path.join(out, f"batch{k}.parquet"), (1000 + k * 100,) * 2)
    with open(done, "w") as f:
        f.write("ok")
    return out


def _screen_oracle() -> str:
    from datafusion_nats_spark.extensions.similarity import (
        _DOT_DUCK,
        _NORM_DUCK,
        NPROBE,
        TOP_K,
    )

    cos = (
        f"round({_DOT_DUCK.format(a='{q}', b='{v}')}"
        f" / ({_NORM_DUCK.format(a='{q}')} * {_NORM_DUCK.format(a='{v}')}), 6)"
    )
    return f"""
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), cent AS (
      SELECT label AS cell, list(m ORDER BY pos) AS centroid
      FROM (
        SELECT label, i AS pos, avg(emb[i]) AS m
        FROM e, range(1, 65) t(i)
        GROUP BY label, i
      )
      GROUP BY label
    ), stream AS (
      SELECT CAST(vec_id + {_SCREEN_SHIFT} AS BIGINT) AS sid,
             CAST((vec_id // 5) % 2 AS INT) AS batch, emb
      FROM e WHERE vec_id % 5 = 0
    ), assigned AS (
      -- ingest rule: nearest stored centroid by rounded cosine, ties on cell
      SELECT sid, batch, emb, cell FROM (
        SELECT s.sid, s.batch, s.emb, c.cell,
               row_number() OVER (
                 PARTITION BY s.sid
                 ORDER BY {cos.format(q='s.emb', v='c.centroid')} DESC, c.cell
               ) AS r
        FROM stream s, cent c
      ) WHERE r = 1
    ), probes AS (
      SELECT sid, batch, qe, cell FROM (
        SELECT s.sid, s.batch, s.emb AS qe, c.cell,
               row_number() OVER (
                 PARTITION BY s.sid
                 ORDER BY {cos.format(q='s.emb', v='c.centroid')} DESC, c.cell
               ) AS cell_rank
        FROM stream s, cent c
      ) WHERE cell_rank <= {NPROBE}
    ), cands AS (
      -- the stored corpus, partition-pruned to the probed cells…
      SELECT p.sid AS query_id, p.batch, e.vec_id AS neighbor_id,
             {cos.format(q='p.qe', v='e.emb')} AS cosine
      FROM probes p JOIN e ON e.label = p.cell
      UNION ALL
      -- …plus every EARLIER batch's ingested vectors in those cells
      SELECT p.sid, p.batch, a.sid AS neighbor_id,
             {cos.format(q='p.qe', v='a.emb')} AS cosine
      FROM probes p JOIN assigned a ON a.cell = p.cell AND a.batch < p.batch
    )
    SELECT query_id, CAST(batch AS INT) AS epoch, neighbor_id, cosine,
           CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM cands
    ) WHERE rn <= {TOP_K}
    """


@query(
    "sim_stream_screen",
    oracle=_screen_oracle(),
    doc="STREAMING ANN screen with a full oracle: a deterministic "
    "two-batch embedding stream (file source, pinned admission order) "
    "runs through ivf_stream_screen_apply via a real foreachBatch "
    "query against the persisted IVF index — batch-0 queries rerank "
    "over the stored cell-partitioned corpus only; batch-1 queries also "
    "hit batch 0's nearest-centroid-ingested delta. The incremental "
    "execution must equal the batch SQL (probe cells, progressive "
    "corpus, rounded-cosine top-k) — the streaming twin of "
    "sim_index_probe, completing the similarity family's ingest loop.",
)
def sim_stream_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil as sh

    from datafusion_nats_spark.extensions.ann_index import (
        current_index_dir,
        ivf_index_build,
    )

    index_dir = ivf_index_build(spark, sf_dir)
    results = os.path.join(index_dir, "stream_screen_results")
    # each run replays the SAME deterministic two-epoch stream from a
    # fresh checkpoint, so clear the previous run's deltas + verdicts —
    # otherwise the epoch-monotonic restart guard (correctly) refuses
    # epoch 0 while a previous run's epoch-1 delta exists
    sh.rmtree(os.path.join(current_index_dir(index_dir), "stream_deltas"),
              ignore_errors=True)
    sh.rmtree(results, ignore_errors=True)
    apply_fn = ivf_stream_screen_apply(index_dir, results)
    stream = (
        spark.readStream.schema("vec_id long, emb array<double>")
        .option("maxFilesPerTrigger", "1")  # one pinned batch per trigger
        .parquet(_screen_stream_dir(spark, sf_dir))
    )
    q = stream.writeStream.foreachBatch(apply_fn).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.read.option("basePath", results).parquet(results)
    return out.select(
        "query_id",
        F.col("epoch").cast("int").alias("epoch"),
        "neighbor_id",
        "cosine",
        "rn",
    )


# --------------------------------------------------------------------------
# streaming quality screen against the persisted classifier model
# --------------------------------------------------------------------------

_QSCREEN_SHIFT = 2_000_000  # streamed doc clone ids: corpus doc_id + SHIFT


def quality_stream_screen_apply(index_dir: str, results_dir: str):
    """Build the ``foreachBatch`` function for STREAMING quality
    filtering against the persisted classifier model — the
    curation-family twin of the LSH/IVF stream screens, and the
    STATELESS member of the trio: the model does not grow with the
    stream, so each micro-batch of documents (doc_id, text) is scored
    by one narrow map (features → broadcast 1-row weights → sigmoid)
    and its verdicts land in a per-epoch results directory. Epoch
    replay is idempotent (a retried epoch overwrites its own
    ``epoch=N`` verdicts); the model version is resolved per batch, so
    a concurrent retrain publish flips batches atomically, never
    mid-batch."""
    from datafusion_nats_spark.extensions.logreg import quality_model_score

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        scored = quality_model_score(
            sp, index_dir, batch_df.select("doc_id", "text")
        )
        scored.write.mode("overwrite").parquet(f"{results_dir}/epoch={epoch_id}")

    return apply


def _qscreen_stream_dir(spark: SparkSession, sf_dir: str) -> str:
    """The deterministic two-batch DOCUMENT 'stream': clones of every
    doc_id % 5 == 0 corpus document under shifted ids, split by
    (doc_id div 5) % 2, with pinned file mtimes so the file source
    admits batch 0 strictly first — deterministic content, order, and
    boundaries, which is what lets the streaming screen carry a full
    DuckDB oracle."""
    import hashlib
    import shutil as sh

    from datafusion_nats_spark.cache import user_cache_dir
    from datafusion_nats_spark.tables import load

    src = os.path.join(sf_dir, "documents.parquet")
    try:
        st = os.stat(src)
        fp = f"{st.st_size}:{int(st.st_mtime)}"
    except OSError:
        fp = "nosrc"
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:{fp}:q1".encode()
    ).hexdigest()[:10]
    out = os.path.join(user_cache_dir(), f"qscreen_stream_{tag}")
    done = os.path.join(out, "_READY")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 5 == 0)
    for k in (0, 1):
        batch = d.filter((F.col("doc_id") / 5).cast("long") % 2 == k).select(
            (F.col("doc_id") + _QSCREEN_SHIFT).cast("long").alias("doc_id"),
            "text",
        )
        tmp = os.path.join(out, f"_tmp{k}")
        batch.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        sh.move(os.path.join(tmp, part), os.path.join(out, f"batch{k}.parquet"))
        sh.rmtree(tmp)
        os.utime(os.path.join(out, f"batch{k}.parquet"), (1000 + k * 100,) * 2)
    with open(done, "w") as f:
        f.write("ok")
    return out


def _qscreen_oracle() -> str:
    from datafusion_nats_spark.extensions.logreg import (
        ITERS,
        _training_blocks,
    )

    blocks = _training_blocks()
    return (
        "WITH "
        + ",".join(blocks)
        + f""", stream AS (
      SELECT CAST(doc_id + {_QSCREEN_SHIFT} AS BIGINT) AS sid,
             CAST((doc_id // 5) % 2 AS INT) AS epoch,
             doc_id AS src_id
      FROM documents WHERE doc_id % 5 = 0
    )
    SELECT s.sid AS doc_id, s.epoch,
           round(1.0 / (1.0 + exp(-(w.w0 + w.w1 * f.x1 + w.w2 * f.x2
                                    + w.w3 * f.x3))), 6) AS score,
           (w.w0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3) >= 0 AS keep
    FROM stream s
    JOIN feats f ON f.doc_id = s.src_id
    CROSS JOIN it{ITERS} w
    """
    )


@query(
    "stream_quality_screen",
    oracle=_qscreen_oracle(),
    doc="STREAMING quality filter with a full oracle: a deterministic "
    "two-batch document stream (file source, pinned admission order) "
    "runs through quality_stream_screen_apply via a real foreachBatch "
    "query — every micro-batch is scored against the persisted "
    "classifier model (trained once, atomic versioned publish) by one "
    "narrow map and lands per-epoch verdicts. The streaming execution "
    "must equal the batch scoring SQL (shared unrolled training CTEs + "
    "identical sigmoid scoring) — the curation-family twin of the "
    "LSH/IVF stream screens, completing the screen trio.",
)
def stream_quality_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil as sh

    from datafusion_nats_spark.extensions.logreg import quality_model_build

    index_dir = quality_model_build(spark, sf_dir)
    results = os.path.join(index_dir, "stream_screen_results")
    sh.rmtree(results, ignore_errors=True)
    apply_fn = quality_stream_screen_apply(index_dir, results)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")  # one pinned batch per trigger
        .parquet(_qscreen_stream_dir(spark, sf_dir))
    )
    q = stream.writeStream.foreachBatch(apply_fn).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.read.option("basePath", results).parquet(results)
    return out.select(
        "doc_id",
        F.col("epoch").cast("int").alias("epoch"),
        "score",
        "keep",
    )


# --------------------------------------------------------------------------
# streaming BM25 relevance routing against the persisted postings index
# --------------------------------------------------------------------------


def bm25_stream_route_apply(index_dir: str, results_dir: str):
    """Build the ``foreachBatch`` function for STREAMING BM25 relevance
    routing — the retrieval-family member of the stream-screen quartet
    (LSH dedup screen, IVF ANN screen, quality screen, this): each
    micro-batch of incoming documents (doc_id, text) is scored against
    the stored routing workload using the persisted index's BACKGROUND
    corpus statistics (df/avgdl/n_docs from the artifact; tf/dl from the
    incoming doc itself — the doc is scored as if against the indexed
    corpus without being in it), and its (doc_id, query_id, score)
    routes land in a per-epoch results directory.

    Stateless like the quality screen: the routing workload and corpus
    stats do not grow with the stream, so per-batch cost is one narrow
    map over the batch plus a bucket-pruned read of the workload terms'
    df rows. Epoch replay is idempotent (a retried epoch overwrites its
    own ``epoch=N`` directory); the index version is resolved per batch,
    so a concurrent rebuild publish flips between batches atomically,
    never mid-batch."""
    from datafusion_nats_spark.extensions.retrieval import BM25_QUERIES
    from datafusion_nats_spark.extensions.text_index import bm25_route_score

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        terms = sp.createDataFrame(BM25_QUERIES, "query_id int, term string")
        # inline=True, decided here: the workload is the fixed tiny
        # BM25_QUERIES list, so the auto-detect's limit().count() would
        # burn one Spark job per micro-batch rediscovering that
        routed = bm25_route_score(
            sp, index_dir, batch_df.select("doc_id", "text"), terms,
            inline=True,
        )
        routed.write.mode("overwrite").parquet(f"{results_dir}/epoch={epoch_id}")

    return apply


def _route_oracle() -> str:
    from datafusion_nats_spark.extensions.retrieval import B, K1, _bm25_terms_values

    return f"""
    WITH stream AS (
      SELECT CAST(doc_id + {_QSCREEN_SHIFT} AS BIGINT) AS sid,
             CAST((doc_id // 5) % 2 AS INT) AS epoch,
             regexp_split_to_array(trim(text), '\\s+') AS arr
      FROM documents WHERE doc_id % 5 = 0
    ), cwords AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
      FROM documents
    ), ctf AS (
      SELECT doc_id, word, count(*) AS tf FROM cwords GROUP BY doc_id, word
    ), dfreq AS (
      SELECT word, count(*) AS df FROM ctf GROUP BY word
    ), cdl AS (
      SELECT doc_id, sum(tf) AS dl FROM ctf GROUP BY doc_id
    ), corpus AS (
      SELECT count(*) AS n_docs,
             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
      FROM cdl
    ), q AS ({_bm25_terms_values()}
    ), stf AS (
      SELECT s.sid, s.epoch, len(s.arr) AS dl, w.word, count(*) AS tf
      FROM stream s, unnest(s.arr) w(word)
      GROUP BY s.sid, s.epoch, len(s.arr), w.word
    ), contrib AS (
      SELECT q.query_id, stf.sid, stf.epoch, q.term,
             round(
               ln(1 + (corpus.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * (stf.tf * ({K1} + 1))
               / (stf.tf + {K1} * (1 - {B}
                                  + {B} * CAST(stf.dl AS DOUBLE) / corpus.avgdl)),
               6) AS c
      FROM stf
      JOIN q ON q.term = stf.word
      JOIN dfreq USING (word)
      CROSS JOIN corpus
    )
    SELECT sid AS doc_id, CAST(epoch AS INT) AS epoch, query_id,
           round(list_sum(list(c ORDER BY term)), 6) AS score
    FROM contrib GROUP BY sid, epoch, query_id
    """


@query(
    "search_stream_route_bm25",
    oracle=_route_oracle(),
    doc="STREAMING BM25 relevance routing with a full oracle: the same "
    "deterministic two-batch document stream as the quality screen runs "
    "through bm25_stream_route_apply via a real foreachBatch query — "
    "each incoming doc is scored against the stored routing workload "
    "using the persisted index's BACKGROUND corpus statistics (tf/dl "
    "from the doc, df/avgdl from the artifact: the routing direction of "
    "BM25 — which topic slice does this new doc belong to). Stateless "
    "per batch, bucket-pruned stats read; completes the stream-screen "
    "quartet (LSH dedup / IVF ANN / quality / retrieval).",
)
def search_stream_route_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil as sh

    from datafusion_nats_spark.extensions.text_index import bm25_index_build

    index_dir = bm25_index_build(spark, sf_dir)
    results = os.path.join(index_dir, "stream_route_results")
    sh.rmtree(results, ignore_errors=True)
    apply_fn = bm25_stream_route_apply(index_dir, results)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")  # one pinned batch per trigger
        .parquet(_qscreen_stream_dir(spark, sf_dir))
    )
    q = stream.writeStream.foreachBatch(apply_fn).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.read.option("basePath", results).parquet(results)
    return out.select(
        "doc_id",
        F.col("epoch").cast("int").alias("epoch"),
        "query_id",
        "score",
    )


# --------------------------------------------------------------------------
# streaming perceptual-hash screen — registered, oracle-checked
# --------------------------------------------------------------------------


def phash_stream_screen_apply(
    index_dir: str, results_dir: str, ingest: str = "all"
):
    """Build the ``foreachBatch`` function for STREAMING perceptual-hash
    dedup against the persisted phash index
    (extensions/multimodal.phash_index_build) — the multimodal member
    of the stream-screen family (LSH text dedup, IVF ANN, quality
    model, BM25 router): each micro-batch of documents (doc_id, text)
    is fingerprinted ONCE (the pass is shared between the probe and the
    delta write), screened through ``_phash_screen`` against the stored
    bands PLUS every earlier epoch's delta, and its band rows become
    THIS epoch's delta — per-batch cost O(|batch|), the corpus
    fingerprint pass amortized into the one-time build.

    ``ingest`` policies and delta/compaction/replay semantics are
    exactly ``lsh_stream_screen_apply``'s: deltas live inside the
    resolved version dir (self-cleaning on rebuild+gc), epoch replay
    overwrites its own delta (idempotent), the probe reads only deltas
    with epoch < epoch_id, and the epoch-monotonic guard refuses a
    stream restarted without its checkpoint."""
    if ingest not in ("all", "unique"):
        raise ValueError(f"unknown ingest policy {ingest!r}")
    from datafusion_nats_spark.extensions.ann_index import current_index_dir
    from datafusion_nats_spark.extensions.multimodal import (
        _phash_bands,
        _phash_screen,
    )

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        sp = batch_df.sparkSession
        vdir = current_index_dir(index_dir)  # consistent version per batch
        deltas_root = os.path.join(vdir, "stream_deltas")
        _guard_epoch_monotonic(deltas_root, epoch_id)
        docs = batch_df.select("doc_id", "text")
        # ONE fingerprint pass, persisted: probe + delta write share it
        new_bands = _phash_bands(
            docs.select(
                "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
            )
        ).persist()

        def earlier_deltas(_new_keys):
            if not os.path.isdir(deltas_root):
                return None
            return (
                sp.read.option("basePath", deltas_root)
                .parquet(deltas_root)
                .filter(F.col("epoch") < F.lit(int(epoch_id)))
                .select("doc_id", "phash", "k", "bv")
            )

        # unpersist in finally: a failed screen/write retries the whole
        # epoch, and each retry would otherwise persist a fresh copy
        # while the orphaned one stayed cached for the session's lifetime
        try:
            verdicts = _phash_screen(
                sp, vdir, docs, extra_old=earlier_deltas, new_bands=new_bands
            )
            verdicts.write.mode("overwrite").parquet(
                f"{results_dir}/epoch={epoch_id}"
            )
            fold = new_bands
            if ingest == "unique":
                accepted = (
                    sp.read.parquet(f"{results_dir}/epoch={epoch_id}")
                    .filter(~F.col("is_dup"))
                    .select("doc_id")
                )
                fold = new_bands.join(
                    F.broadcast(accepted), "doc_id", "left_semi"
                )
            (
                fold.repartition("k", "bv")
                .write.mode("overwrite")
                .parquet(f"{deltas_root}/epoch={epoch_id}")
            )
        finally:
            new_bands.unpersist()

    return apply


def _phash_stream_oracle() -> str:
    from datafusion_nats_spark.extensions.multimodal import (
        PHASH_BANDS,
        PHASH_BUCKET_CAP,
        PHASH_HAM_MAX,
        _phash_hashes_sql,
    )

    epoch_blocks, epoch_selects = [], []
    for e in (0, 1):
        epoch_blocks.append(f"""u{e} AS (
      SELECT id, phash, k, bv, is_new FROM (
        SELECT doc_id AS id, phash, k, bv, 0 AS is_new FROM stored
        UNION ALL
        SELECT sid, phash, k, bv, 0 FROM sbands WHERE batch < {e}
        UNION ALL
        SELECT sid, phash, k, bv, 1 FROM sbands WHERE batch = {e}
      )
    ), c{e} AS (
      SELECT id, phash, k, bv, is_new FROM (
        SELECT *, row_number() OVER (PARTITION BY k, bv
                                     ORDER BY id, is_new) AS brn
        FROM u{e}
      ) WHERE brn <= {PHASH_BUCKET_CAP}
    ), p{e} AS (
      SELECT DISTINCT n.id AS nd, o.id AS od, n.phash AS pn, o.phash AS po
      FROM c{e} n JOIN c{e} o
        ON n.k = o.k AND n.bv = o.bv AND n.is_new = 1 AND o.is_new = 0
    ), a{e} AS (
      SELECT nd, count(*) AS nm, min(od) AS first_match
      FROM p{e} WHERE bit_count(xor(pn, po)) <= {PHASH_HAM_MAX}
      GROUP BY nd
    ), o{e} AS (
      SELECT s.sid AS doc_id, {e} AS epoch,
             coalesce(nm, 0) > 0             AS is_dup,
             CAST(coalesce(nm, 0) AS BIGINT) AS n_matches,
             first_match
      FROM (SELECT sid FROM stream WHERE batch = {e}) s
      LEFT JOIN a{e} ON a{e}.nd = s.sid
    )""")
        epoch_selects.append(
            f"SELECT doc_id, CAST(epoch AS INT) AS epoch, is_dup, "
            f"n_matches, first_match FROM o{e}"
        )
    return f"""
    WITH {_phash_hashes_sql()}, banded_all AS (
      SELECT doc_id, phash, k, (phash >> (8 * k)) & 255 AS bv
      FROM hashes, range(0, {PHASH_BANDS}) t(k)
    ), stored AS (
      SELECT doc_id, phash, k, bv FROM banded_all WHERE doc_id % 5 != 0
    ), stream AS (
      SELECT doc_id + {_QSCREEN_SHIFT} AS sid,
             CAST((doc_id // 5) % 2 AS INT) AS batch, doc_id AS src
      FROM documents WHERE doc_id % 5 = 0
    ), sbands AS (
      -- streamed clones carry the original's text, hence fingerprint
      SELECT s.sid, s.batch, b.phash, b.k, b.bv
      FROM stream s JOIN banded_all b ON b.doc_id = s.src
    ), {", ".join(epoch_blocks)}
    {" UNION ALL ".join(epoch_selects)}
    """


@query(
    "mm_phash_stream_screen",
    oracle=_phash_stream_oracle(),
    doc="STREAMING perceptual-hash dedup screen with a full oracle: the "
    "deterministic two-batch document stream (file source, pinned "
    "admission order — shared with stream_quality_screen) runs through "
    "phash_stream_screen_apply via a real foreachBatch query against "
    "the persisted phash index — batch-0 docs screen against the stored "
    "corpus bands only; batch-1 docs also collide with batch 0's folded "
    "delta (ingest=all). The incremental execution must equal the batch "
    "SQL (joint stored-first cap, popcount verify, progressive delta) — "
    "the multimodal member of the stream-screen family, completing its "
    "ingest loop.",
)
def mm_phash_stream_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil as sh

    from datafusion_nats_spark.extensions.ann_index import current_index_dir
    from datafusion_nats_spark.extensions.multimodal import phash_index_build

    index_dir = phash_index_build(spark, sf_dir)
    results = os.path.join(index_dir, "stream_screen_results")
    # fresh replay of the same deterministic two-epoch stream: clear the
    # previous run's deltas + verdicts (epoch-monotonic guard contract)
    sh.rmtree(
        os.path.join(current_index_dir(index_dir), "stream_deltas"),
        ignore_errors=True,
    )
    sh.rmtree(results, ignore_errors=True)
    apply_fn = phash_stream_screen_apply(index_dir, results)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")  # one pinned batch per trigger
        .parquet(_qscreen_stream_dir(spark, sf_dir))
    )
    q = stream.writeStream.foreachBatch(apply_fn).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.read.option("basePath", results).parquet(results)
    return out.select(
        "doc_id",
        F.col("epoch").cast("int").alias("epoch"),
        "is_dup",
        "n_matches",
        "first_match",
    )
