"""Every registered query with an oracle must match DuckDB exactly —
the local twin of the driver's CORRECTNESS gate (run at sf0.001 for
speed; the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from datafusion_nats_spark.registry import REGISTRY, all_queries

all_queries()  # populate REGISTRY

WITH_ORACLE = [name for name, spec in sorted(REGISTRY.items()) if spec.oracle]
ROWS_ONLY = [name for name, spec in sorted(REGISTRY.items()) if spec.oracle is None]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    from tests.parity import compare

    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    compare(df, duck, spec.oracle)


def test_every_query_has_an_oracle():
    """ROWS_ONLY is empty by construction — the weaker rows-only check
    exists for genuinely non-SQL-expressible operators, and the registry
    has none (every entry carries a DuckDB oracle). Asserted positively
    so the suite reports 0 skips instead of an empty-parameter-set
    placeholder."""
    assert ROWS_ONLY == []


if ROWS_ONLY:  # pragma: no cover — defined only if an oracle-less op ever lands

    @pytest.mark.parametrize("name", ROWS_ONLY)
    def test_rows_only_query_runs(name, spark, sf_dir):
        spec = REGISTRY[name]
        df = spec.fn(spark, sf_dir)
        assert df.count() >= 0
        assert len(df.schema.fields) > 0


def test_all_query_outputs_are_scalar_typed(spark, sf_dir):
    """The driver's hash harness canonicalizes results via pandas sort,
    which cannot hash list/map/struct cells (round-1 driver crash on
    map_struct_functions). Guard: every registered query's output schema
    must be scalar-only — project arrays through array_join/size/digests
    instead of returning them raw."""
    bad = []
    for name, fn in sorted(REGISTRY.items()):
        df = fn.fn(spark, sf_dir)
        for f in df.schema.fields:
            t = f.dataType.simpleString()
            if t.startswith(("array", "map", "struct", "binary")):
                bad.append((name, f.name, t))
    assert not bad, f"complex-typed output columns: {bad}"


def test_compare_harness_rejects_wrong_results(spark, duck):
    """Negative control for the correctness gate itself: compare() must
    FAIL on value drift, row-count drift, and column-name drift, and
    pass on a genuinely equal pair — so a refactor can never make the
    oracle comparison vacuous."""
    from tests.parity import compare

    good = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    compare(good, duck, "SELECT * FROM (VALUES (1, 'a'), (2, 'b')) t(k, v)")

    with pytest.raises(AssertionError):  # value drift
        compare(good, duck, "SELECT * FROM (VALUES (1, 'a'), (2, 'X')) t(k, v)")
    with pytest.raises(AssertionError):  # row-count drift
        compare(good, duck, "SELECT * FROM (VALUES (1, 'a')) t(k, v)")
    with pytest.raises(AssertionError):  # column-name drift
        compare(good, duck, "SELECT * FROM (VALUES (1, 'a'), (2, 'b')) t(k, w)")
    with pytest.raises(AssertionError):  # duplicate-row multiplicity drift
        compare(
            good.union(good),
            duck,
            "SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (1, 'a')) t(k, v)",
        )
