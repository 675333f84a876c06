"""Static partition-pruning contract (complements the *dynamic* pruning
test in test_plan_properties.py and the bucketed-join test in
test_catalog.py).

At 100 TB a date-partitioned layout lets Catalyst prune whole
directories at planning time — the filter must appear under
PartitionFilters (metadata-only), never as a row-level PushedFilter."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_nats_spark.tables import load


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    o = load(spark, sf_dir, "orders").withColumn("o_year", F.year("o_orderdate"))
    dest = str(tmp_path / "orders_by_year")
    o.write.partitionBy("o_year").mode("overwrite").parquet(dest)
    df = spark.read.parquet(dest).filter(F.col("o_year") == 1997)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "(o_year" in plan.split("PartitionFilters")[1][:200]
    # data filters must NOT contain the partition column (metadata-only)
    pushed = plan.split("PushedFilters")[1][:120] if "PushedFilters" in plan else ""
    assert "o_year" not in pushed
    n_1997 = df.count()
    assert n_1997 == o.filter(F.col("o_year") == 1997).count() and n_1997 > 0
