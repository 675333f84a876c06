"""Retrieval-stack walkthrough: the full curation search loop in one
run — BM25 keyword search, the hybrid BM25+vector RRF fusion, the
per-arm A/B quality report that justifies the fusion, and the persisted
quality-classifier model (trained once by in-plan gradient descent,
published with the same atomic versioned machinery as the ANN indexes)
scoring an ingest batch.

Everything here is declarative DataFrame algebra — broadcast query
workloads against one shared corpus postings aggregate, rank-relation
fusion, a 1-row broadcast model — the shapes that stay cheap when the
corpus is 100 TB (extensions/retrieval.py, extensions/logreg.py).

Run:  python examples/retrieval_stack.py [SF_DIR]
SF_DIR defaults to /root/testdata/sf0.001.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    from datafusion_nats_spark.extensions.logreg import (
        quality_model_build,
        quality_model_score,
    )
    from datafusion_nats_spark.extensions.retrieval import (
        search_bm25_topk,
        search_eval_arms_report,
        search_hybrid_rrf,
    )
    from datafusion_nats_spark.session import get_spark
    from datafusion_nats_spark.tables import load

    spark = get_spark("retrieval_stack_example")

    print("== BM25 keyword search (top 3 per query) ==")
    bm25 = search_bm25_topk(spark, SF_DIR)
    bm25.filter(F.col("rn") <= 3).orderBy("query_id", "rn").show(12)

    print("== hybrid BM25 + vector search, RRF-fused (top 3 per query) ==")
    hybrid = search_hybrid_rrf(spark, SF_DIR)
    hybrid.filter(F.col("rn") <= 3).orderBy("query_id", "rn").show(12)

    print("== per-arm A/B report (kw vs vec vs rrf, label relevance) ==")
    search_eval_arms_report(spark, SF_DIR).orderBy("arm", "query_id").show(12)

    print("== persisted quality model: train once, score an ingest batch ==")
    index_dir = quality_model_build(spark, SF_DIR)
    batch = (
        load(spark, SF_DIR, "documents")
        .select("doc_id", "text")
        .limit(8)
    )
    scored = quality_model_score(spark, index_dir, batch)
    scored.orderBy("doc_id").show(8)
    kept = scored.filter(F.col("keep")).count()
    total = scored.count()
    print(
        f"quality screen kept {kept}/{total} of the batch "
        "(model published once, scored by a broadcast 1-row map)"
    )


if __name__ == "__main__":
    main()
