"""Per-query empirical profile of the bench headliners (guide §1):
for each HEADLINE query, run the noop sink twice (cold then warm,
per-session) and attribute the time to stages via the status REST API —
per-stage task count, summed executorRunTime, shuffle read/write and
input bytes. This is the "where does the time actually go" companion to
explain_audit.py (which captures the plan shapes).

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python profile_queries.py \
        [--plans plans/r09 --suffix before] [query ...]

With --plans, also writes each query's ``.explain("formatted")`` to
``<dir>/<name>_<suffix>.txt`` (the round's judge-readable plan record).
Prints one JSON line per query, then a total line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("SPARK_GRAFT_UI", "1")  # stage metrics need the UI

from bench import HEADLINE  # noqa: E402


def _stages(base):
    try:
        with urllib.request.urlopen(base, timeout=10) as r:
            return {
                (s["stageId"], s["attemptId"]): s
                for s in json.load(r)
                if s.get("status") in ("COMPLETE", "FAILED")
            }
    except Exception:
        return {}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--plans", default=None, help="dir for explain dumps")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("queries", nargs="*", help="subset (default HEADLINE)")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from datafusion_nats_spark.registry import all_queries, release_caches
    from datafusion_nats_spark.session import get_spark

    spark = get_spark("profile")
    queries = all_queries()
    base = (
        f"{spark.sparkContext.uiWebUrl}/api/v1/applications/"
        f"{spark.sparkContext.applicationId}/stages"
    )
    names = args.queries or HEADLINE
    if args.plans:
        os.makedirs(args.plans, exist_ok=True)

    totals = []
    for name in names:
        df = queries[name](spark, sf_dir)
        if args.plans:
            with open(
                os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                ))
        spark.sparkContext.setJobDescription(f"profile: {name}")
        rec = {"query": name, "runs": []}
        for _ in range(max(1, args.runs)):
            before = _stages(base)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            after = _stages(base)
            new = [s for k, s in after.items() if k not in before]
            new.sort(key=lambda s: -s.get("executorRunTime", 0))
            rec["runs"].append(
                {
                    "wall": round(wall, 3),
                    "stages": [
                        {
                            "id": s["stageId"],
                            "tasks": s.get("numCompleteTasks"),
                            "execMs": s.get("executorRunTime"),
                            "cpuMs": round(
                                s.get("executorCpuTime", 0) / 1e6
                            ),
                            "inMB": round(s.get("inputBytes", 0) / 2**20, 1),
                            "shRdMB": round(
                                s.get("shuffleReadBytes", 0) / 2**20, 2
                            ),
                            "shWrMB": round(
                                s.get("shuffleWriteBytes", 0) / 2**20, 2
                            ),
                            "name": (s.get("name") or "")[:60],
                        }
                        for s in new[:8]
                    ],
                }
            )
            release_caches(spark)
        spark.sparkContext.setJobDescription(None)
        totals.append((name, rec["runs"][-1]["wall"]))
        print(json.dumps(rec), flush=True)
    print(
        json.dumps(
            {
                "total_last_run": round(sum(t for _, t in totals), 3),
                "queries": dict(totals),
            }
        )
    )


if __name__ == "__main__":
    main()
