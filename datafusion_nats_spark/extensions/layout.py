"""Data-layout operators: multi-dimensional (Z-order) clustering keys.

At 100 TB the cheapest scan is the one that never reads the data: parquet
row-group/file pruning needs the written files' min/max ranges to be
narrow for the columns queries filter on. A linear sort narrows ONE
column; interleaving the bits of two (or more) key columns — a Z-order /
Morton curve — narrows ALL of them at once, at the cost of each being
~sqrt as narrow. ``zorder_key`` builds the interleaved key as pure JVM
bitwise expressions (whole-stage-codegen'd, no UDF); writers then
``repartitionByRange(zkey).sortWithinPartitions(zkey)`` exactly like the
single-column sorted-write path (tests/test_catalog.py).

The same construction (bit-interleave of hash-derived ints) is how Delta
Lake / Iceberg implement OPTIMIZE ZORDER; here it is expressed as plain
Spark SQL expressions, so it composes with any write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load

ZBITS = 6  # interleave the low 6 bits of each dimension -> 12-bit key


def zorder_key(x: Column, y: Column, bits: int = ZBITS) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative ints:
    result bit 2i is x's bit i, bit 2i+1 is y's bit i. Literal shift
    amounts only — Spark's shiftleft/shiftright require them."""
    parts = []
    for i in range(bits):
        parts.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        parts.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def _zorder_sql(x: str, y: str, bits: int = ZBITS) -> str:
    """The identical interleave as DuckDB SQL (same bit semantics)."""
    parts = []
    for i in range(bits):
        parts.append(f"((({x} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(parts)


@query(
    "layout_zorder_key",
    oracle=f"""
    SELECT o_orderkey,
           o_custkey % 64                                   AS cx,
           o_orderkey % 64                                  AS oy,
           {_zorder_sql('(o_custkey % 64)', '(o_orderkey % 64)')} AS zkey
    FROM orders
    WHERE o_orderkey <= 3000
    """,
    doc="Z-order (Morton) clustering key: bit-interleave of two columns "
    "as pure bitwise JVM expressions — the multi-column generalization of "
    "sorted-write file pruning (Delta/Iceberg OPTIMIZE ZORDER, "
    "expressed Spark-first).",
)
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 3000)
    cx = (F.col("o_custkey") % 64).alias("cx")
    oy = (F.col("o_orderkey") % 64).alias("oy")
    return o.select(
        "o_orderkey",
        cx,
        oy,
        zorder_key(F.col("o_custkey") % 64, F.col("o_orderkey") % 64).alias("zkey"),
    )


def write_zordered(
    df: DataFrame, path: str, x: str, y: str, n_files: int, bits: int = ZBITS
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve of (x, y): scale
    each column to a 2^bits-bucket index over its observed [min, max]
    (z-order must interleave the *high*-order structure of the values —
    interleaving raw low bits would scramble the layout), range-partition
    on the interleaved key, sort within partitions, drop the key. Every
    output file then covers a narrow range of BOTH columns. The min/max
    pre-pass is one tiny aggregate over the two key columns."""
    lo_x, hi_x, lo_y, hi_y = df.agg(
        F.min(x), F.max(x), F.min(y), F.max(y)
    ).first()
    n = 1 << bits

    def bucket(col: str, lo, hi) -> Column:
        return ((F.col(col) - F.lit(lo)) * n / F.lit(hi - lo + 1)).cast("int")

    zk = zorder_key(bucket(x, lo_x, hi_x), bucket(y, lo_y, hi_y), bits)
    # Directory-partition on the curve's top bits (exact, no boundary
    # sampling: every output file sits fully inside one Z-curve quadrant),
    # then range+sort on the full key inside each quadrant — the same
    # partition-prefix + file-sort layout Delta/Iceberg produce for
    # OPTIMIZE ZORDER. repartitionByRange keeps files-per-quadrant small.
    prefix_bits = max(1, (n_files - 1).bit_length())
    (
        df.withColumn("__zkey", zk)
        .withColumn("__zq", F.shiftright(F.col("__zkey"), 2 * bits - prefix_bits))
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.partitionBy("__zq")
        .parquet(path)
    )
