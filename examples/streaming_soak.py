"""Sustained-load streaming soak: a producer thread publishes
continuously to three subjects while a micro-batch stream drains them
with byte-bounded admission (``maxBytesPerBatch``) — the artifact
behind PERFORMANCE.md's steady rows/s claim (round-6 verdict ask #6).

Multi-subject shape: ONE query subscribed to the ``orders.*`` wildcard
— streaming offsets are a composite per-subject counter map since
round 6 (``NatsStreamReader._latest_offset_multi``), with wildcard
re-resolution per trigger, fair row-budget allocation across logs, and
a shared byte budget spent in subject order.

What it measures, from ``StreamingQuery.recentProgress``:

- steady-state rows/s (admitted input rows / wall time, excluding the
  first warm-up epoch);
- per-epoch ``durationMs`` percentiles (p50/p90/max) for
  ``triggerExecution`` and ``addBatch`` — the fixed-cost budget
  documented in PERFORMANCE.md §streaming-epoch-budget;
- epochs observed + that byte-bounded admission actually bit (more than
  one epoch carried rows).

Run:  python examples/streaming_soak.py [duration_s]   (default 30)
Importable: ``run_soak(spark, duration_s, ...)`` returns the result
dict (the short-soak pytest in tests/test_streaming_soak.py uses it).
Prints one JSON line with the metrics.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T

EVT_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("key", T.StringType(), False),
    ]
)

SUBJECTS = ["orders.eu", "orders.us", "orders.apac"]


def _pctl(xs: list[float], q: float) -> float:
    if not xs:
        return 0.0
    s = sorted(xs)
    return s[min(len(s) - 1, int(q * (len(s) - 1) + 0.5))]


def run_soak(
    spark,
    duration_s: float = 30.0,
    url: str = "memory://soak",
    max_bytes_per_batch: int = 1 << 20,
    producer_batch: int = 2000,
    producer_sleep_s: float = 0.0,
    drain_timeout_s: float = 120.0,
    ingest: str = "executor",
    num_partitions: int = 16,
) -> dict:
    from datafusion_nats_spark.sources import get_broker, register

    register(spark)
    broker = get_broker(url)
    broker.clear()

    stop = threading.Event()
    published = [0]

    def produce() -> None:
        i = 0
        while not stop.is_set():
            subj = SUBJECTS[i % len(SUBJECTS)]
            for _ in range(producer_batch):
                broker.publish(
                    subj, f"2024-01-01 10:{(i // 60) % 60:02d}:{i % 60:02d},k{i}".encode()
                )
                i += 1
            published[0] = i
            if producer_sleep_s:
                time.sleep(producer_sleep_s)

    t = threading.Thread(target=produce, daemon=True)

    reader = (
        spark.readStream.format("nats")
        .schema(EVT_SCHEMA)
        .option("url", url)
        .option("subject", "orders.*")  # one wildcard query, all subjects
        .option("maxMessagesPerBatch", "0")  # unbounded rows
        # executor ingest: per-subject offset-range partitions read by
        # tasks directly — payload bytes never transit the driver, which
        # is what makes the single wildcard query outrun the 3-stream
        # union (169k vs 153k rows/s, PERFORMANCE.md)
        .option("ingest", ingest)
        .option("numPartitions", str(num_partitions))
    )
    if max_bytes_per_batch is not None:
        # byte-bounded admission walks payload sizes at latestOffset();
        # pass None to skip that pass entirely (pure-capacity mode)
        reader = reader.option("maxBytesPerBatch", str(max_bytes_per_batch))
    stream = reader.load()
    q = (
        stream.writeStream.format("noop")
        .outputMode("append")
        .start()
    )
    t.start()
    t0 = time.perf_counter()
    time.sleep(duration_s)
    stop.set()
    t.join(timeout=30)
    # drain what's left so published == admitted at the end. Primary
    # signal: the row count; fallback: the query's own isDataAvailable
    # (recentProgress keeps only the last ~100 entries, so a run with
    # very many epochs could under-count through the window alone)
    deadline = time.time() + drain_timeout_s
    while time.time() < deadline:
        admitted = sum(p["numInputRows"] for p in q.recentProgress)
        if admitted >= published[0]:
            break
        if len(q.recentProgress) >= 100 and not q.status.get(
            "isDataAvailable", True
        ):
            break
        time.sleep(0.5)
    elapsed = time.perf_counter() - t0
    progress = list(q.recentProgress)
    q.stop()
    broker.clear()

    data_epochs = [p for p in progress if p["numInputRows"] > 0]
    rows = sum(p["numInputRows"] for p in data_epochs)
    trig = [float(p["durationMs"].get("triggerExecution", 0)) for p in data_epochs]
    addb = [float(p["durationMs"].get("addBatch", 0)) for p in data_epochs]
    # steady state: drop the first data epoch (JVM/python-worker warm-up)
    steady = data_epochs[1:] or data_epochs
    steady_rows = sum(p["numInputRows"] for p in steady)
    steady_ms = sum(float(p["durationMs"].get("triggerExecution", 0)) for p in steady)
    return {
        "metric": "streaming_soak",
        "duration_s": round(elapsed, 1),
        "published": published[0],
        "admitted_rows": rows,
        "epochs": len(progress),
        "data_epochs": len(data_epochs),
        "rows_per_s_wall": round(rows / elapsed) if elapsed else 0,
        "rows_per_s_steady": round(steady_rows / (steady_ms / 1000.0))
        if steady_ms
        else 0,
        "trigger_ms": {
            "p50": _pctl(trig, 0.5),
            "p90": _pctl(trig, 0.9),
            "max": max(trig, default=0.0),
        },
        "add_batch_ms": {
            "p50": _pctl(addb, 0.5),
            "p90": _pctl(addb, 0.9),
            "max": max(addb, default=0.0),
        },
        "max_bytes_per_batch": max_bytes_per_batch,
    }


def main() -> None:
    duration = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
    from datafusion_nats_spark.session import get_spark

    spark = get_spark("streaming-soak")
    result = run_soak(spark, duration_s=duration)
    print(json.dumps(result))
    print(
        f"soak ok: {result['admitted_rows']} rows over "
        f"{result['duration_s']}s across {result['data_epochs']} data epochs"
    )


if __name__ == "__main__":
    main()
