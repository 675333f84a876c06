"""Property test pinning `segmented_ntile` — the segmented-rank rewrite
that replaced the two round-2 single-partition global windows — directly
against Spark's native global `ntile(n) OVER (ORDER BY ...)` on random
data. The registry oracles exercise the helper only through two fixed
call sites (RFM segments, sweepline carry); this test drives the helper
itself across random tie-heavy distributions, bucket granularities
(many buckets / few buckets / one degenerate bucket), and n_tiles
including 1 and n_tiles > n_rows.

The helper's contract requires a TOTAL order (ntile on a tied order is
nondeterministic in any engine), so every generated row carries a unique
id as the final sort key, and `bucket_expr` is a monotone coarsening of
the leading sort column by construction (floor-division)."""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window as W
from pyspark.sql import functions as F

_SETTINGS = settings(
    max_examples=int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "50")) // 2 or 1,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_SETTINGS
@given(
    vals=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=120),
    n_tiles=st.integers(min_value=1, max_value=10),
    divisor=st.sampled_from([1, 7, 1000]),  # many / few / one bucket
)
def test_segmented_ntile_equals_global_ntile(spark, vals, n_tiles, divisor):
    from datafusion_nats_spark.queries.scale_patterns import segmented_ntile

    rows = [(v, i) for i, v in enumerate(vals)]  # unique id => total order
    df = spark.createDataFrame(rows, "v int, id int")

    seg = {
        r.id: r.tile
        for r in segmented_ntile(
            df,
            F.expr(f"v div {divisor}"),
            [F.col("v"), F.col("id")],
            "tile",
            n_tiles=n_tiles,
        ).collect()
    }
    ref = {
        r.id: r.tile
        for r in df.select(
            "id", F.ntile(n_tiles).over(W.orderBy("v", "id")).alias("tile")
        ).collect()
    }
    assert seg == ref, (n_tiles, divisor, vals)
