"""First-principles property tests for the two documented window
REWRITES (SQL:2011 GROUPS frames and running COUNT(DISTINCT) — native in
neither Spark nor DuckDB 1.0, SURVEY §2B).

The registry queries `window_frames_groups_rewrite` and
`window_count_distinct_rewrite` are oracle-checked, but their DuckDB
oracles apply the SAME rewrite — a shared misreading of the SQL:2011
semantics would pass both engines. Here the expected value comes from a
direct Python model of the standard's definition (peer groups by the
ORDER BY key; distinct-set walk in frame order), evaluated on random
tie-heavy data against the rewrite pattern executed by Spark."""

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
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=8),  # key (ties = peer groups)
            st.integers(min_value=-50, max_value=50),  # val (exact ints)
        ),
        min_size=1,
        max_size=80,
    ),
    g_pre=st.integers(min_value=0, max_value=3),
)
def test_groups_frame_rewrite_matches_sql2011_model(spark, rows, g_pre):
    """sum(val) OVER (ORDER BY key GROUPS BETWEEN g_pre PRECEDING AND
    CURRENT ROW): per SQL:2011, the frame of a row is every row whose
    ORDER BY key falls in the g_pre peer groups before the current row's
    group plus the current group itself — tied rows share one frame."""
    keys = sorted({k for k, _ in rows})
    pos = {k: i for i, k in enumerate(keys)}
    by_key: dict = {}
    for k, v in rows:
        by_key[k] = by_key.get(k, 0) + v
    expected = {
        k: sum(by_key[kk] for kk in keys[max(0, pos[k] - g_pre) : pos[k] + 1])
        for k in keys
    }

    df = spark.createDataFrame([(k, v, i) for i, (k, v) in enumerate(rows)], "k int, v int, id int")
    per_group = df.groupBy("k").agg(F.sum("v").alias("g_sum"))
    w = W.orderBy("k").rowsBetween(-g_pre, 0)
    group_frame = per_group.select("k", F.sum("g_sum").over(w).alias("grp_sum"))
    got = {
        r.id: r.grp_sum
        for r in df.join(F.broadcast(group_frame), "k").select("id", "grp_sum").collect()
    }
    for i, (k, _) in enumerate(rows):
        assert got[i] == expected[k], (i, k, got[i], expected[k], rows, g_pre)


@_SETTINGS
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),  # user
            st.integers(min_value=0, max_value=4),  # type
            st.integers(min_value=0, max_value=20),  # ts (ties common)
        ),
        min_size=1,
        max_size=80,
    )
)
def test_running_count_distinct_rewrite_matches_set_walk(spark, rows):
    """Running COUNT(DISTINCT type) per user in (ts, id) order: the
    expected value is a literal set walk; the rewrite is the
    first-occurrence-flag + running-sum pattern from
    window_count_distinct_rewrite."""
    data = [(u, t, ts, i) for i, (u, t, ts) in enumerate(rows)]
    expected = {}
    by_user: dict = {}
    for u, t, ts, i in sorted(data, key=lambda r: (r[0], r[2], r[3])):
        seen = by_user.setdefault(u, set())
        seen.add(t)
        expected[i] = len(seen)

    df = spark.createDataFrame(data, "u int, t int, ts int, id int")
    w_first = W.partitionBy("u", "t").orderBy("ts", "id")
    w_run = W.partitionBy("u").orderBy("ts", "id").rowsBetween(W.unboundedPreceding, 0)
    flagged = df.withColumn(
        "first_of_type", F.when(F.row_number().over(w_first) == 1, 1).otherwise(0)
    )
    got = {
        r.id: r.n
        for r in flagged.select("id", F.sum("first_of_type").over(w_run).alias("n")).collect()
    }
    assert got == expected, (got, expected, rows)
