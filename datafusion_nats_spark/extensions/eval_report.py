"""ANN quality evaluation as a relational query.

Lives in its own module imported AFTER the ANN operator modules
(extensions/__init__.py import order): the report's oracle composes the
already-registered per-method oracles at decoration time, so those
registrations must exist first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_nats_spark.registry import REGISTRY, query


def _ann_recall_oracle() -> str:
    """Composes the existing per-method oracles as CTE bodies (a CTE body
    may itself be a WITH-query) and computes recall@K against the exact
    brute-force top-k — evaluation-as-a-query, same determinism as the
    underlying operators."""
    bf = REGISTRY["sim_bruteforce_topk"].oracle
    methods = {
        "ivf": REGISTRY["sim_ivf_ann"].oracle,
        "kmeans": REGISTRY["sim_kmeans_ann"].oracle,
        "pq": REGISTRY["sim_pq_ann"].oracle,
    }
    ctes = [f"exact AS ({bf})"]
    selects = []
    for name, sql in sorted(methods.items()):
        ctes.append(f"m_{name} AS ({sql})")
        selects.append(
            f"""
            SELECT '{name}' AS method,
                   round(CAST((SELECT count(*) FROM m_{name} a
                               JOIN exact e ON e.query_id = a.query_id
                                           AND e.neighbor_id = a.neighbor_id) AS DOUBLE)
                         / (SELECT count(*) FROM exact), 6) AS recall_at_k
            """
        )
    return "WITH " + ",\n".join(ctes) + "\nUNION ALL\n".join(selects)


@query(
    "sim_ann_recall_report",
    oracle=_ann_recall_oracle(),
    doc="ANN quality evaluation as a relational query: recall@10 of each "
    "approximate method (IVF, Lloyd-kmeans IVF, PQ) against the exact "
    "brute-force top-k, computed by joining the methods' own result "
    "relations — the oracle composes the underlying oracles as CTEs, so "
    "the report is exactly as deterministic as the operators it grades.",
)
def sim_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datafusion_nats_spark.extensions.ml_variants import sim_kmeans_ann
    from datafusion_nats_spark.extensions.pq import sim_pq_ann
    from datafusion_nats_spark.extensions.similarity import (
        sim_bruteforce_topk,
        sim_ivf_ann,
    )

    exact = sim_bruteforce_topk(spark, sf_dir).select("query_id", "neighbor_id").persist()
    methods = {
        "ivf": sim_ivf_ann,
        "kmeans": sim_kmeans_ann,
        "pq": sim_pq_ann,
    }
    out = None
    for name in sorted(methods):
        approx = methods[name](spark, sf_dir).select("query_id", "neighbor_id")
        hits = approx.join(exact, ["query_id", "neighbor_id"]).agg(
            F.count(F.lit(1)).alias("hits")
        )
        total = exact.agg(F.count(F.lit(1)).alias("total"))
        row = hits.crossJoin(F.broadcast(total)).select(
            F.lit(name).alias("method"),
            F.round(F.col("hits").cast("double") / F.col("total"), 6).alias("recall_at_k"),
        )
        out = row if out is None else out.unionByName(row)
    return out
