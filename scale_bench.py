"""Extension-surface scale-up measurement (round-6 evidence, verdict
ask #5; extended in round 7 with a second scale point and per-query
shuffle-byte metrics): replicate the corpus tables key-shifted at each
requested factor, run the LLM-pipeline headliners at 1x and Nx, and
report per-query wall times, the scaling exponent log_N(tN/t1) — 1.0
means linear, < 1.0 sublinear, > 1.0 superlinear (a scale red flag) —
and the shuffle read/write bytes each query moved (from the Spark
status REST API), so the sublinear claim rests on how much data
actually crossed the shuffle, not wall time alone.

Replication: doc_id/vec_id shifted by k*10,000,000 per replica
(divisible by NEW_BATCH_MOD=5, so the incremental-dedup new/old split
is preserved); text and embeddings are copied verbatim, which makes
EVERY document an N-way duplicate cluster — deliberately the worst case
for the dedup family (mega-cluster stress of the BUCKET_CAP / df-cap
paths), and a fixed query set against an Nx corpus for the ANN family.
Dimension-free: only the tables these queries read (documents,
embeddings) are replicated; the rest are symlinked unchanged.

Usage:  python scale_bench.py          # sf0.1 base, 10x and 30x points
Env:    SPARK_GRAFT_SF_DIR, SPARK_GRAFT_SCALE_REPLICAS (comma list,
        default "10,30"), SPARK_GRAFT_CPUS

Prints one JSON line:
{"metric": "extension_scaleup", "replicas": [10, 30], "sf_dir": ...,
 "queries": {name: {"t1": s, "shuffle_mb1": mb,
                    "t10": s, "exp10": e, "shuffle_mb10": mb,
                    "t30": s, "exp30": e, "shuffle_mb30": mb}}}

(Replicated-key data, so this run is NOT oracle-checked — correctness
runs at sf0.001/0.01/0.1; this is purely a scaling measurement.
See PERFORMANCE.md "Measured scale-up".)
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    # dedup family — worst-case N-way clusters by construction
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_connected_components",
    "dedup_incremental_new_batch",
    "dedup_index_probe",
    # similarity family — fixed 5-query batch vs Nx corpus
    "sim_ivf_ann",
    "sim_index_probe",
    "sim_index_probe_bigbatch",
    "sim_bruteforce_topk",
    # PCA: the corpus pass must dominate; Gram partials bound the shuffle
    "sim_pca_power_iteration",
    # text / curation
    "text_span_dedup",
    "text_span_collapse",
    "text_token_stats",
    "curation_sequence_packing",
    # multimodal — replicated payloads = N-way identical fingerprints,
    # the worst case for the band buckets (PHASH_BUCKET_CAP path)
    "mm_phash_near_dup",
    "mm_phash_index_probe",
    # retrieval family — fixed query workload vs Nx corpus
    "search_bm25_topk",
    "search_hybrid_rrf",
    "search_index_probe_bm25",
    "search_index_probe_phrase",
    "search_hybrid_rrf_indexed",
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


# Zipf-skew grid: a doc's multiplicity is ~ H / (1 + doc_id % B) — the
# classic 1/rank head-heavy law over a B-key grid. H is solved so the
# EXPECTED multiplicity is the requested factor (sum_{u<B} 1/(1+u) ≈
# ln(B+1)), so a skewed point moves ~the same total rows as the uniform
# point while concentrating them: at factor 10 the hottest key carries
# ~1477 copies (a 1477-way duplicate mega-cluster / hot LSH bucket / hot
# IVF cell) while the median key carries ~3.
SKEW_B = 1024


def _replicate_skewed(spark, sf_dir: str, factor: int) -> str:
    from pyspark.sql import functions as F

    from datafusion_nats_spark.tables import TABLES

    tag = hashlib.md5(f"{sf_dir}:zipf:{factor}".encode()).hexdigest()[:10]
    out_root = os.path.join("/tmp", f"spark_graft_skew_{tag}")
    done = os.path.join(out_root, "_DONE")
    if os.path.exists(done):
        return out_root
    os.makedirs(out_root, exist_ok=True)
    h = int(round(factor * SKEW_B / math.log(SKEW_B + 1)))
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        dst = os.path.join(out_root, f"{t}.parquet")
        if t in REPLICATED:
            key = REPLICATED[t][0]
            base = spark.read.parquet(src)
            mult = F.greatest(
                F.lit(1),
                F.round(
                    F.lit(h) / (F.lit(1) + F.pmod(F.col(key), F.lit(SKEW_B))), 0
                ).cast("int"),
            )
            out = (
                base.withColumn(
                    "_k", F.explode(F.sequence(F.lit(0), mult - 1))
                )
                # k*SHIFT keeps doc_id % NEW_BATCH_MOD (SHIFT % 5 == 0),
                # so the incremental-dedup new/old split is preserved
                # exactly like the uniform replication
                .withColumn(key, F.col(key) + F.col("_k").cast("long") * SHIFT)
                .drop("_k")
            )
            out.repartition(16).write.mode("overwrite").parquet(dst)
        elif not os.path.exists(dst):
            os.symlink(os.path.abspath(src), dst)
    with open(done, "w") as f:
        f.write("ok")
    return out_root


class _ShuffleMeter:
    """Per-query shuffle read+write bytes AND max single-task runtime
    via the status REST API (SPARK_GRAFT_UI=1 turns the UI on). Stages
    are attributed to a query by diffing completed stage IDs around it.
    Max task time is the straggler metric the skewed fixture exists for
    (round-7 verdict ask #5): skew shows up in the slowest task, not in
    the shuffle-byte total. Degrades to None when the UI is unreachable
    — the timing columns never depend on it."""

    def __init__(self, spark):
        self._base = None
        try:
            ui = spark.sparkContext.uiWebUrl
            app = spark.sparkContext.applicationId
            if ui:
                self._base = f"{ui}/api/v1/applications/{app}/stages"
        except Exception:
            pass

    def _stages(self):
        if not self._base:
            return None
        try:
            with urllib.request.urlopen(self._base, timeout=10) as r:
                return {
                    (s["stageId"], s["attemptId"]): (
                        s.get("shuffleReadBytes", 0),
                        s.get("shuffleWriteBytes", 0),
                    )
                    for s in json.load(r)
                    if s.get("status") in ("COMPLETE", "FAILED")
                }
        except Exception:
            return None

    def _max_task_ms(self, stage_keys):
        """Max executorRunTime over the given stages' tasks (the
        straggler), or None when the summary endpoint is unavailable."""
        worst = None
        for sid, att in stage_keys:
            try:
                url = f"{self._base}/{sid}/{att}/taskSummary?quantiles=1.0"
                with urllib.request.urlopen(url, timeout=10) as r:
                    t = json.load(r).get("executorRunTime", [None])[0]
                if t is not None:
                    worst = t if worst is None else max(worst, t)
            except Exception:
                continue
        return round(worst, 1) if worst is not None else None

    def measure(self, fn):
        """Run fn(); return (wall_sec, shuffle_mb or None,
        max_task_ms or None)."""
        before = self._stages()
        t0 = time.perf_counter()
        fn()
        wall = time.perf_counter() - t0
        after = self._stages()
        if before is None or after is None:
            return wall, None, None
        new = {k: v for k, v in after.items() if k not in before}
        mb = sum(r + w for r, w in new.values()) / (1024 * 1024)
        return wall, round(mb, 1), self._max_task_ms(new.keys())


def _time_queries(spark, queries, sf_dir: str, meter):
    times, shuffles, stragglers = {}, {}, {}
    for name in QUERIES:
        df = queries[name](spark, sf_dir)
        wall, mb, max_task = meter.measure(
            lambda: df.write.format("noop").mode("overwrite").save()
        )
        times[name] = round(wall, 3)
        shuffles[name] = mb
        stragglers[name] = max_task
    return times, shuffles, stragglers


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replica_points = [
        int(x)
        for x in os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10,30").split(",")
        if x.strip()
    ]

    os.environ.setdefault("SPARK_GRAFT_UI", "1")  # shuffle metrics need the UI

    from datafusion_nats_spark.registry import all_queries
    from datafusion_nats_spark.session import get_spark

    spark = get_spark("scale-bench")
    queries = all_queries()
    meter = _ShuffleMeter(spark)

    # warm the session once so t1 doesn't pay JVM/footer costs tN skips
    queries["text_token_stats"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    t1, sh1, mt1 = _time_queries(spark, queries, sf_dir, meter)
    rows = {
        name: {
            "t1": t1[name],
            "shuffle_mb1": sh1[name],
            "max_task_ms1": mt1[name],
        }
        for name in QUERIES
    }
    totals = {"total_t1": round(sum(t1.values()), 2)}
    for n in replica_points:
        big_dir = _replicate(spark, sf_dir, n)
        tn, shn, mtn = _time_queries(spark, queries, big_dir, meter)
        for name in QUERIES:
            ratio = tn[name] / t1[name] if t1[name] else float("nan")
            rows[name][f"t{n}"] = tn[name]
            rows[name][f"exp{n}"] = (
                round(math.log(ratio) / math.log(n), 2) if ratio > 0 else None
            )
            rows[name][f"shuffle_mb{n}"] = shn[name]
            rows[name][f"max_task_ms{n}"] = mtn[name]
        totals[f"total_t{n}"] = round(sum(tn.values()), 2)
    out = {
        "metric": "extension_scaleup",
        "replicas": replica_points,
        "sf_dir": sf_dir,
        "queries": rows,
        **totals,
    }
    skew = int(os.environ.get("SPARK_GRAFT_SCALE_SKEW", "0"))
    if skew > 1:
        # Zipf-skewed point (round-7 verdict ask #5): same expected row
        # factor, head-heavy key distribution — exponents computed
        # against the ACTUAL realized factor so the skewed point is
        # comparable to the uniform ones.
        skew_dir = _replicate_skewed(spark, sf_dir, skew)
        base_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        skew_docs = spark.read.parquet(f"{skew_dir}/documents.parquet").count()
        factor = skew_docs / base_docs
        ts, shs, mts = _time_queries(spark, queries, skew_dir, meter)
        srows = {}
        for name in QUERIES:
            ratio = ts[name] / t1[name] if t1[name] else float("nan")
            srows[name] = {
                "t": ts[name],
                "exp": (
                    round(math.log(ratio) / math.log(factor), 2)
                    if ratio > 0
                    else None
                ),
                "shuffle_mb": shs[name],
                "max_task_ms": mts[name],
            }
        out["skew"] = {
            "requested_factor": skew,
            "realized_factor": round(factor, 2),
            "zipf_grid": SKEW_B,
            "queries": srows,
            "total_t": round(sum(ts.values()), 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
