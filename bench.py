"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:  {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ..., "multifile8": {...}}

The primary pass runs the shipped single-file layout (byte-comparable
with BENCH_baseline.json); a second pass re-times the same queries over
an 8-file-per-table copy and is recorded under "multifile8" — the
single-file tables have ONE parquet row group each, so scan-bound
queries decode on one task regardless of maxPartitionBytes (a fixture
artifact, PERFORMANCE.md), and the multifile pass is the number that
tracks the parallelizable layout a cluster would actually read. Setting
SPARK_GRAFT_MULTIFILE=<n> explicitly instead runs ONLY that layout
(the pre-round-4 opt-in behavior).

Execution is driven through the noop sink so we measure plan execution,
not driver-side row materialization.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "agg_function_battery",
    "agg_rollup",
    "window_ranking",
    "window_frames_rows",
    "join_inner_equi",
    "fn_date_bin_bucketing",
    "fn_string_battery",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "sim_bruteforce_topk",
    "text_token_stats",
    "text_fingerprint",
]


def _multifile_copy(spark, sf_dir: str, n_files: int) -> str:
    """OPT-IN (SPARK_GRAFT_MULTIFILE=<n>): rewrite each table into n
    parquet files under /tmp so local scans parallelize the way a cluster's
    many-file tables do. The default single-file sf0.1 tables have ONE row
    group each, so scan-bound queries decode on one task regardless of
    maxPartitionBytes — an artifact of the local fixture, not the plans
    (PERFORMANCE.md). Results are identical; only scan parallelism changes."""
    import hashlib

    from datafusion_nats_spark.tables import TABLES

    tag = hashlib.md5(f"{sf_dir}:{n_files}".encode()).hexdigest()[:10]
    out_root = os.path.join("/tmp", f"spark_graft_multifile_{tag}")
    done = os.path.join(out_root, "_DONE")
    if not os.path.exists(done):
        for t in TABLES:
            (
                spark.read.parquet(f"{sf_dir}/{t}.parquet")
                .repartition(n_files)
                .write.mode("overwrite")
                .parquet(os.path.join(out_root, f"{t}.parquet"))
            )
        with open(done, "w") as f:
            f.write("ok")
    return out_root


def _run_pass(spark, queries, sf_dir: str) -> dict[str, float]:
    # Warm the JVM + parquet footers with the cheapest query so the first
    # timed run doesn't pay one-time session costs.
    queries["q6_forecast_revenue"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name not in queries:
            continue
        df = queries[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 4)
    return timings


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from datafusion_nats_spark.registry import all_queries
    from datafusion_nats_spark.session import get_spark

    spark = get_spark("bench")
    queries = all_queries()

    out: dict = {"metric": "headline_queries_total", "unit": "sec", "sf": sf}
    multifile = int(os.environ.get("SPARK_GRAFT_MULTIFILE", "0"))
    if multifile > 1:
        # explicit opt-in: time ONLY the requested layout
        timings = _run_pass(spark, queries, _multifile_copy(spark, sf_dir, multifile))
        out.update(
            value=round(sum(timings.values()), 4),
            queries=timings,
            multifile=multifile,
        )
    else:
        timings = _run_pass(spark, queries, sf_dir)
        out.update(value=round(sum(timings.values()), 4), queries=timings)
        mf_timings = _run_pass(spark, queries, _multifile_copy(spark, sf_dir, 8))
        out["multifile8"] = {
            "value": round(sum(mf_timings.values()), 4),
            "queries": mf_timings,
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
