"""Random-graph differential test for `min_label_propagation`
(`extensions/dedup.py`) against a union-find reference: the fixpoint
labels must be exactly (node → min node id of its connected component)
for arbitrary undirected graphs, not just the near-dup clusters the
registry oracles exercise.

Also pins the convergence CONTRACT: min-label spreads ONE hop per
round, so `max_iter` must be at least the component diameter — the
worst-case path graph converges at exactly diameter rounds and is
wrong at diameter-1. Callers like dedup_connected_components rely on
near-dup components having tiny diameter; this test is the documented
proof of what the bound means."""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = settings(
    max_examples=int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "50")) // 5 or 1,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _union_find_components(edges: list) -> dict:
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min: dict = {}
    for n in parent:
        root = find(n)
        comp_min.setdefault(root, []).append(n)
    return {n: min(members) for root, members in comp_min.items() for n in members}


def _symmetric_adj(spark, edges: list):
    df = spark.createDataFrame(edges, "doc_a int, doc_b int")
    return df.union(df.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")))


@_SETTINGS
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=11),
            st.integers(min_value=0, max_value=11),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=20,
    )
)
def test_min_label_propagation_matches_union_find(spark, edges):
    from datafusion_nats_spark.extensions.dedup import min_label_propagation

    expected = _union_find_components(edges)
    labels = {
        r.id: r.comp
        for r in min_label_propagation(
            _symmetric_adj(spark, edges), max_iter=12
        ).collect()
    }
    assert labels == expected, (labels, expected, edges)


def test_min_label_propagation_path_graph_needs_diameter_rounds(spark):
    """The one-hop spreading bound, pinned both ways on a 9-node path
    (diameter 8): converged and exact at max_iter=8, NOT yet converged
    at max_iter=7 (the far end still carries a stale label)."""
    from datafusion_nats_spark.extensions.dedup import min_label_propagation

    path = [(i, i + 1) for i in range(8)]
    exact = {
        r.id: r.comp
        for r in min_label_propagation(_symmetric_adj(spark, path), max_iter=8).collect()
    }
    assert exact == {i: 0 for i in range(9)}

    early = {
        r.id: r.comp
        for r in min_label_propagation(_symmetric_adj(spark, path), max_iter=7).collect()
    }
    assert early[8] != 0, early  # the far end has not seen the min yet
