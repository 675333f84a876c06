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

    from datafusion_nats_spark.extensions.curation import (
        curation_split_train_val_test,
    )
    from datafusion_nats_spark.extensions.dedup import (
        dedup_cluster_size_histogram,
        dedup_collapse_keep_canonical,
    )
    from datafusion_nats_spark.extensions.text import text_quality_score

    print("== near-dup cluster sizes (MinHash LSH -> verify -> components) ==")
    dedup_cluster_size_histogram(spark, SF_DIR).show()

    print("== surviving corpus after collapse-to-canonical ==")
    survivors = dedup_collapse_keep_canonical(spark, SF_DIR)
    print(f"survivors: {survivors.count()} docs")

    print("== quality score sample ==")
    text_quality_score(spark, SF_DIR).show(5, truncate=False)

    print("== deterministic 80/10/10 split (hash-bucketed, no RNG) ==")
    curation_split_train_val_test(spark, SF_DIR).show()


if __name__ == "__main__":
    main()
