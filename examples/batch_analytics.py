"""Batch analytics over parquet through the reference-shaped API: the
DataFusion-style register-then-SQL flow (SessionContext) running TPC-H
Q1 and a windowed top-k — Catalyst plays DataFusion's role, so filters
push into the scan and small dimensions broadcast without any manual
planning.

Run:  python examples/batch_analytics.py [SF_DIR]
SF_DIR defaults to /root/testdata/sf0.001 (driver-generated tables).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_nats_spark.context import SessionContext

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    ctx = SessionContext()
    for table in ["lineitem", "orders", "customer"]:
        ctx.register_parquet(table, f"{SF_DIR}/{table}.parquet")

    print("== TPC-H Q1: pricing summary ==")
    ctx.sql(
        """
        SELECT l_returnflag, l_linestatus,
               round(sum(l_quantity), 2)                       AS sum_qty,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               round(avg(l_quantity), 6)                       AS avg_qty,
               count(*)                                        AS count_order
        FROM lineitem
        WHERE l_shipdate <= date '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    ).show()

    print("== Top 3 orders per market segment (window top-k) ==")
    ctx.sql(
        """
        SELECT * FROM (
          SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
                 row_number() OVER (PARTITION BY c.c_mktsegment
                                    ORDER BY o.o_totalprice DESC) AS rk
          FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ) WHERE rk <= 3
        ORDER BY c_mktsegment, rk
        """
    ).show(15, truncate=False)


if __name__ == "__main__":
    main()
