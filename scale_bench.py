"""Extension-surface scale-up measurement (round-6 evidence, verdict
ask #5): replicate the corpus tables 10x key-shifted, run the
LLM-pipeline headliners at 1x and 10x, and report per-query wall times
plus the scaling exponent log10(t10/t1) — 1.0 means linear, < 1.0
sublinear, > 1.0 superlinear (a scale red flag).

Replication: doc_id/vec_id shifted by k*10,000,000 per replica
(divisible by NEW_BATCH_MOD=5, so the incremental-dedup new/old split
is preserved); text and embeddings are copied verbatim, which makes
EVERY document a 10-way duplicate cluster — deliberately the worst case
for the dedup family (mega-cluster stress of the BUCKET_CAP / df-cap
paths), and a fixed query set against a 10x corpus for the ANN family.
Dimension-free: only the tables these queries read (documents,
embeddings) are replicated; the rest are symlinked unchanged.

Usage:  python scale_bench.py          # sf0.1 base, 10 replicas
Env:    SPARK_GRAFT_SF_DIR, SPARK_GRAFT_SCALE_REPLICAS, SPARK_GRAFT_CPUS

Prints one JSON line:
{"metric": "extension_scaleup", "replicas": N, "sf": ...,
 "queries": {name: {"t1": s, "tN": s, "ratio": r, "exponent": e}}}

(Replicated-key data, so this run is NOT oracle-checked — correctness
runs at sf0.001/0.01/0.1; this is purely a scaling measurement.
See PERFORMANCE.md "Measured 10x scale-up".)
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    # dedup family — worst-case 10-way clusters by construction
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_connected_components",
    "dedup_incremental_new_batch",
    "dedup_index_probe",
    # similarity family — fixed 5-query batch vs 10x corpus
    "sim_ivf_ann",
    "sim_index_probe",
    "sim_bruteforce_topk",
    # text / curation
    "text_span_dedup",
    "text_token_stats",
    "curation_sequence_packing",
]

REPLICATED = {"documents": ["doc_id"], "embeddings": ["vec_id"]}
SHIFT = 10_000_000  # divisible by NEW_BATCH_MOD → id-class-preserving


def _replicate(spark, sf_dir: str, replicas: int) -> str:
    from pyspark.sql import functions as F

    from datafusion_nats_spark.tables import TABLES

    tag = hashlib.md5(f"{sf_dir}:{replicas}".encode()).hexdigest()[:10]
    out_root = os.path.join("/tmp", f"spark_graft_scale_{tag}")
    done = os.path.join(out_root, "_DONE")
    if os.path.exists(done):
        return out_root
    os.makedirs(out_root, exist_ok=True)
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        dst = os.path.join(out_root, f"{t}.parquet")
        if t in REPLICATED:
            base = spark.read.parquet(src)
            key = REPLICATED[t][0]
            parts = [
                base.withColumn(key, F.col(key) + F.lit(k * SHIFT))
                for k in range(replicas)
            ]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            out.repartition(16).write.mode("overwrite").parquet(dst)
        elif not os.path.exists(dst):
            os.symlink(os.path.abspath(src), dst)
    with open(done, "w") as f:
        f.write("ok")
    return out_root


def _time_queries(spark, queries, sf_dir: str) -> dict[str, float]:
    out = {}
    for name in QUERIES:
        df = queries[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replicas = int(os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10"))

    from datafusion_nats_spark.registry import all_queries
    from datafusion_nats_spark.session import get_spark

    spark = get_spark("scale-bench")
    queries = all_queries()
    big_dir = _replicate(spark, sf_dir, replicas)

    # warm the session once so t1 doesn't pay JVM/footer costs tN skips
    queries["text_token_stats"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    t1 = _time_queries(spark, queries, sf_dir)
    tn = _time_queries(spark, queries, big_dir)
    rows = {}
    for name in QUERIES:
        ratio = tn[name] / t1[name] if t1[name] else float("nan")
        rows[name] = {
            "t1": t1[name],
            f"t{replicas}": tn[name],
            "ratio": round(ratio, 2),
            "exponent": round(math.log(ratio) / math.log(replicas), 2)
            if ratio > 0
            else None,
        }
    print(
        json.dumps(
            {
                "metric": "extension_scaleup",
                "replicas": replicas,
                "sf_dir": sf_dir,
                "queries": rows,
                "total_t1": round(sum(t1.values()), 2),
                f"total_t{replicas}": round(sum(tn.values()), 2),
            }
        )
    )


if __name__ == "__main__":
    main()
