"""Persisted text-index lifecycle walkthrough (round 8): the
build-once/probe-many keyword stack end-to-end —

1. build the versioned BM25 postings index (term-bucket-partitioned,
   positions included, atomic CURRENT-pointer publish);
2. probe it with a keyword workload (reads ONLY the workload's bucket
   partitions — the plan's PartitionFilters are printed so you can see
   the literal pruning);
3. probe the SAME artifact with a positional phrase workload;
4. run the index-backed hybrid: BM25-index keyword arm + persisted-IVF
   vector arm, fused by RRF — both arms partition-pruned in one plan;
5. route an "incoming" document batch against the stored workload with
   background corpus statistics (the streaming screen's per-batch step);
6. rebuild → a NEW version is published atomically while the old one
   stays readable (probe-resolved readers are never torn).

Run:  python examples/text_index_lifecycle.py [SF_DIR]
SF_DIR defaults to /root/testdata/sf0.001.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    from pyspark.sql import functions as F

    from datafusion_nats_spark.extensions.ann_index import current_index_dir
    from datafusion_nats_spark.extensions.retrieval import (
        BM25_QUERIES,
        PHRASE_QUERIES,
    )
    from datafusion_nats_spark.extensions.text_index import (
        bm25_index_build,
        bm25_index_probe,
        bm25_route_score,
        phrase_index_probe,
        search_hybrid_rrf_indexed,
    )
    from datafusion_nats_spark.session import get_spark
    from datafusion_nats_spark.tables import load

    spark = get_spark("text-index-lifecycle")
    index_dir = bm25_index_build(
        spark, SF_DIR, os.path.join(tempfile.mkdtemp(), "bm25")
    )
    v1 = current_index_dir(index_dir)
    print(f"== built + published: {v1}")

    terms = spark.createDataFrame(BM25_QUERIES, "query_id int, term string")
    scored = bm25_index_probe(spark, index_dir, terms)
    print("== BM25 probe (top rows); note PartitionFilters below")
    scored.orderBy(F.desc("score")).show(5, truncate=False)
    scored.explain()  # PartitionFilters: [bucket#.. IN (...)]

    phrases = spark.createDataFrame(
        PHRASE_QUERIES, "query_id int, term_a string, term_b string"
    )
    print("== positional phrase probe over the SAME artifact")
    phrase_index_probe(spark, index_dir, phrases).show(5, truncate=False)

    print("== index-backed hybrid RRF (both arms partition-pruned)")
    search_hybrid_rrf_indexed(spark, SF_DIR).show(5, truncate=False)

    print("== routing an incoming batch with background corpus stats")
    incoming = (
        load(spark, SF_DIR, "documents")
        .filter(F.col("doc_id") % 97 == 0)
        .select((F.col("doc_id") + 9_000_000).alias("doc_id"), "text")
    )
    bm25_route_score(spark, index_dir, incoming, terms).show(
        5, truncate=False
    )

    bm25_index_build(spark, SF_DIR, index_dir, rebuild=True)
    v2 = current_index_dir(index_dir)
    print(f"== rebuilt: CURRENT now {v2}; v1 still on disk: {os.path.isdir(v1)}")


if __name__ == "__main__":
    main()
