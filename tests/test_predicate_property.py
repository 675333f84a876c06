"""Property-based relational agreement (SURVEY §5.4 item 5, second half):
randomly generated predicates must select the same rows in Spark and
DuckDB — a fuzz over the filter/expression surface beyond the
hand-written oracle queries."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

NUMERIC_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
INT_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
STR_COLS = ["l_returnflag", "l_linestatus"]

comparison = st.sampled_from(["<", "<=", ">", ">=", "=", "<>"])


@st.composite
def predicate(draw) -> str:
    kind = draw(st.sampled_from(["num", "int", "str", "between", "in", "null"]))
    if kind == "num":
        col = draw(st.sampled_from(NUMERIC_COLS))
        op = draw(comparison)
        val = round(draw(st.floats(min_value=0, max_value=100)), 3)
        return f"{col} {op} {val}"
    if kind == "int":
        col = draw(st.sampled_from(INT_COLS))
        op = draw(comparison)
        val = draw(st.integers(min_value=0, max_value=6000))
        return f"{col} {op} {val}"
    if kind == "str":
        col = draw(st.sampled_from(STR_COLS))
        val = draw(st.sampled_from(["A", "N", "R", "O", "F", "Z"]))
        op = draw(st.sampled_from(["=", "<>"]))
        return f"{col} {op} '{val}'"
    if kind == "between":
        col = draw(st.sampled_from(INT_COLS))
        lo = draw(st.integers(min_value=0, max_value=3000))
        hi = lo + draw(st.integers(min_value=0, max_value=3000))
        return f"{col} BETWEEN {lo} AND {hi}"
    if kind == "in":
        col = draw(st.sampled_from(STR_COLS))
        vals = draw(st.lists(st.sampled_from(["A", "N", "R", "O", "F"]), min_size=1, max_size=3))
        quoted = ", ".join(f"'{v}'" for v in vals)
        return f"{col} IN ({quoted})"
    return f"{draw(st.sampled_from(INT_COLS))} IS NOT NULL"


@st.composite
def where_clause(draw) -> str:
    n = draw(st.integers(min_value=1, max_value=3))
    parts = [draw(predicate()) for _ in range(n)]
    ops = [draw(st.sampled_from(["AND", "OR"])) for _ in range(n - 1)]
    out = parts[0]
    for op, part in zip(ops, parts[1:]):
        out = f"({out}) {op} ({part})"
    return out


@pytest.fixture(scope="module")
def li_view(spark, sf_dir):
    from datafusion_nats_spark.tables import load

    load(spark, sf_dir, "lineitem").createOrReplaceTempView("li_prop")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW li_prop AS SELECT * FROM '{sf_dir}/lineitem.parquet'")
    return con


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(clause=where_clause())
def test_random_predicates_agree(spark, li_view, clause):
    sql = f"SELECT count(*) AS n, count(DISTINCT l_orderkey) AS k FROM li_prop WHERE {clause}"
    s = spark.sql(sql).collect()[0]
    d = li_view.execute(sql).fetchone()
    assert (s.n, s.k) == (d[0], d[1]), f"clause: {clause}"
