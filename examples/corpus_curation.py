"""The LLM-data-pipeline side of the engine: near-duplicate detection,
collapse-to-canonical, quality scoring, and a train/val/test split over
the ``documents`` table — each step a registered operator from
``datafusion_nats_spark/extensions`` with a DuckDB oracle behind it.

Run:  python examples/corpus_curation.py [SF_DIR]
SF_DIR defaults to /root/testdata/sf0.001.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_nats_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark("corpus-curation-example")
    # Demo-scale session tuning (sf0.001 ≈ 500 docs): persisted frames
    # keep their build-time partition count (AQE does not re-partition
    # cached plans), so the iterative components loop would otherwise
    # run cores× no-op tasks per round. Results are partitioning-
    # independent; this only trims task-dispatch overhead for the demo.
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    from pyspark.sql import functions as F

    from datafusion_nats_spark.extensions.curation import (
        curation_split_train_val_test,
    )
    from datafusion_nats_spark.extensions.dedup import (
        dedup_connected_components,
    )
    from datafusion_nats_spark.extensions.text import text_quality_score
    from datafusion_nats_spark.tables import load

    # ONE shingle->LSH->verify->components pass feeds BOTH reports below.
    # The registered one-shot operators (dedup_cluster_size_histogram,
    # dedup_collapse_keep_canonical) each rebuild the full pipeline —
    # right for a standalone query, wasteful when a script needs several
    # views of the same components (and the reason this example once
    # brushed its CI time budget). The derivations are the operators'
    # own output stages, applied to the shared labels frame.
    labels = dedup_connected_components(spark, SF_DIR)

    print("== near-dup cluster sizes (MinHash LSH -> verify -> components) ==")
    sizes = labels.groupBy("component").agg(F.count(F.lit(1)).alias("csize"))
    sizes.groupBy("csize").agg(
        F.count(F.lit(1)).alias("n_components"),
        (F.col("csize") * F.count(F.lit(1))).alias("n_docs"),
    ).show()

    print("== surviving corpus after collapse-to-canonical ==")
    drops = labels.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    survivors = (
        load(spark, SF_DIR, "documents")
        .join(F.broadcast(drops), "doc_id", "left_anti")
        .select("doc_id", "lang", "n_chars")
    )
    print(f"survivors: {survivors.count()} docs")

    print("== quality score sample ==")
    text_quality_score(spark, SF_DIR).show(5, truncate=False)

    print("== deterministic 80/10/10 split (hash-bucketed, no RNG) ==")
    curation_split_train_val_test(spark, SF_DIR).show()


if __name__ == "__main__":
    main()
