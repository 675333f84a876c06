"""Persisted-ANN-index walkthrough: build the IVF index ONCE (centroid
codebook + cell-partitioned vectors parquet), then serve query batches
by probing the stored artifact — the build-once / probe-many shape a
100 TB corpus requires (extensions/ann_index.py).

The probe consults the codebook, inlines each query's NPROBE nearest
cells as literals, and the exact-rerank scan partition-prunes to those
cells' directories — the run prints the scan's files-read metric
against the total so the pruning is visible, plus the top-k parity
with the in-plan sim_ivf_ann twin.

Run:  python examples/ann_index_probe.py [SF_DIR]
SF_DIR defaults to /root/testdata/sf0.001.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    from datafusion_nats_spark.extensions.ann_index import (
        current_index_dir,
        ivf_index_build,
        ivf_index_probe,
    )
    from datafusion_nats_spark.extensions.similarity import (
        _emb_double,
        sim_ivf_ann,
    )
    from datafusion_nats_spark.session import get_spark
    from datafusion_nats_spark.tables import load

    spark = get_spark("ann_index_example")

    index_dir = ivf_index_build(spark, SF_DIR)
    vdir = current_index_dir(index_dir)  # resolved CURRENT version
    n_cells = (
        spark.read.parquet(f"{vdir}/vectors").select("cell").distinct().count()
    )
    print(f"index at {vdir}: {n_cells} cells (build is idempotent; "
          "rebuilds publish new versions atomically)")

    # a 2-vector query batch against the stored index
    q = (
        load(spark, SF_DIR, "embeddings")
        .filter(F.col("vec_id").isin([0, 3]))
        .select(F.col("vec_id").alias("query_id"), _emb_double().alias("qe"))
    )
    probe = ivf_index_probe(spark, index_dir, q)
    rows = probe.collect()

    # read the executed scan's files-read metric (AQE final plan)
    plan = probe._jdf.queryExecution().executedPlan()
    if "Adaptive" in plan.getClass().getName():
        plan = plan.executedPlan()

    def scans(node, out):
        if "FileSourceScanExec" in node.getClass().getName():
            out.append(node)
        if "QueryStageExec" in node.getClass().getName():
            scans(node.plan(), out)
        ch = node.children()
        for i in range(ch.length()):
            scans(ch.apply(i), out)
        return out

    vec_scan = next(s for s in scans(plan, []) if "cell#" in s.toString())
    n_read = vec_scan.metrics().apply("numFiles").value()
    total = sum(
        1
        for dp, _, fs in os.walk(f"{vdir}/vectors")
        for f in fs
        if f.endswith(".parquet")
    )
    print(f"probe scanned {n_read} of {total} vector files (partition pruning)")

    for r in sorted(rows, key=lambda r: (r.query_id, r.rn))[:6]:
        print(
            f"  query {r.query_id} -> neighbor {r.neighbor_id} "
            f"cosine={r.cosine:.6f} rank={int(r.rn)}"
        )

    # parity with the in-plan twin on the same two queries
    twin = {
        (r.query_id, r.rn): r.neighbor_id
        for r in sim_ivf_ann(spark, SF_DIR)
        .filter(F.col("query_id").isin([0, 3]))
        .collect()
    }
    ours = {(r.query_id, r.rn): r.neighbor_id for r in rows}
    assert ours == twin, "probe diverged from the in-plan twin"
    print(f"parity with sim_ivf_ann: {len(ours)} top-k rows identical")


if __name__ == "__main__":
    main()
