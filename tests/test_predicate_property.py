"""Differential SQL fuzzing vs DuckDB (SURVEY §5.4 item 5, second half):
twelve hypothesis suites generate random SQL — WHERE predicates, join
conditions across every join type (equi + non-equi), aggregate
expressions (incl. DISTINCT and FILTER), window functions, IN/NOT IN
subqueries, scalar expressions (integer/string/date grammars),
set-operation trees, grouping sets, three-relation join topologies
(stacked outer joins), ORDER BY / LIMIT / OFFSET, correlated
subqueries, and projected three-valued boolean logic trees — and run
the IDENTICAL SQL text through Spark and DuckDB. Any semantics drift the 253 hand-written oracle queries can't
reach (operator interactions, null handling in outer joins,
distinct-in-aggregate edge cases) must surface here.

Determinism rules: every compared aggregate is engine-exact — counts,
BIGINT-cast integer sums, DECIMAL-cast money sums, min/max — never a
bare double sum/avg whose floating-point summation order differs
between engines."""

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
def fuzz_env(spark, sf_dir):
    """Same three tables registered under the same names in both engines
    (isolated from the shared conftest views)."""
    con = duckdb.connect()
    for t in ["lineitem", "orders", "customer"]:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(f"fz_{t}")
        con.execute(f"CREATE VIEW fz_{t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


import os

_SETTINGS = settings(
    # 50 in the normal suite; crank via SPARK_GRAFT_FUZZ_EXAMPLES for
    # one-off deep-fuzz sessions (e.g. 300 per suite pre-round-close)
    max_examples=int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "50")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _agree(spark, con, sql: str) -> None:
    s = [tuple(r) for r in spark.sql(sql).collect()]
    d = con.execute(sql).fetchall()
    # single-row aggregate outputs: positional compare is exact
    assert s == d, f"sql: {sql}\nspark: {s}\nduckdb: {d}"


# ---------------------------------------------------------------------------
# Suite 1: WHERE-clause fuzz (filter/expression surface)
# ---------------------------------------------------------------------------


@_SETTINGS
@given(clause=where_clause())
def test_random_predicates_agree(spark, fuzz_env, clause):
    sql = (
        "SELECT count(*) AS n, count(DISTINCT l_orderkey) AS k, "
        "CAST(coalesce(sum(l_linenumber), 0) AS BIGINT) AS s "
        f"FROM fz_lineitem WHERE {clause}"
    )
    _agree(spark, fuzz_env, sql)


# ---------------------------------------------------------------------------
# Suite 2: join fuzz — every join type, equi anchors + random non-equi
# residuals, plus pure non-equi inner joins
# ---------------------------------------------------------------------------

JOIN_TYPES = ["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN", "SEMI JOIN", "ANTI JOIN"]


@st.composite
def join_condition(draw) -> str:
    """Equi anchor on the key + 0-2 random residual predicates (possibly
    non-equi, cross-table)."""
    parts = ["o.o_custkey = c.c_custkey"]
    for _ in range(draw(st.integers(min_value=0, max_value=2))):
        kind = draw(st.sampled_from(["cross_num", "left_pred", "right_pred"]))
        if kind == "cross_num":
            op = draw(comparison)
            parts.append(f"o.o_totalprice {op} c.c_acctbal * {draw(st.integers(min_value=1, max_value=40))}")
        elif kind == "left_pred":
            op = draw(comparison)
            parts.append(f"o.o_orderkey {op} {draw(st.integers(min_value=0, max_value=6000))}")
        else:
            val = draw(st.sampled_from(["BUILDING", "MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "FURNITURE"]))
            op = draw(st.sampled_from(["=", "<>"]))
            parts.append(f"c.c_mktsegment {op} '{val}'")
    return " AND ".join(parts)


@_SETTINGS
@given(jt=st.sampled_from(JOIN_TYPES), cond=join_condition())
def test_random_join_conditions_agree(spark, fuzz_env, jt, cond):
    if jt in ("SEMI JOIN", "ANTI JOIN"):
        # semi/anti project the left side only
        sql = (
            "SELECT count(*) AS n, count(DISTINCT o.o_custkey) AS k, "
            "CAST(coalesce(sum(o.o_orderkey), 0) AS BIGINT) AS s "
            f"FROM fz_orders o {jt} fz_customer c ON {cond}"
        )
    else:
        sql = (
            "SELECT count(*) AS n, count(o.o_orderkey) AS no, "
            "count(c.c_custkey) AS nc, "  # null counts pin outer semantics
            "CAST(coalesce(sum(o.o_orderkey), 0) AS BIGINT) AS so, "
            "CAST(coalesce(sum(c.c_nationkey), 0) AS BIGINT) AS sc "
            f"FROM fz_orders o {jt} fz_customer c ON {cond}"
        )
    _agree(spark, fuzz_env, sql)


@_SETTINGS
@given(
    op=comparison,
    mult=st.integers(min_value=20, max_value=60),
    extra=st.booleans(),
)
def test_pure_nonequi_inner_join_agrees(spark, fuzz_env, op, mult, extra):
    """No equi anchor at all: the theta-join path (banded so the pair
    space stays bounded at this SF)."""
    cond = f"o.o_totalprice {op} c.c_acctbal * {mult}"
    if extra:
        cond += " AND o.o_orderstatus = 'F'"
    sql = (
        "SELECT count(*) AS n, count(DISTINCT o.o_orderkey) AS k "
        f"FROM fz_orders o JOIN fz_customer c ON {cond}"
    )
    _agree(spark, fuzz_env, sql)


# ---------------------------------------------------------------------------
# Suite 3: aggregate fuzz — random aggregate expressions incl. DISTINCT
# and FILTER, random group keys, optional HAVING
# ---------------------------------------------------------------------------


@st.composite
def aggregate_exprs(draw) -> list[str]:
    """1-4 aggregate select items, each engine-exact by construction."""
    out = []
    n = draw(st.integers(min_value=1, max_value=4))
    for i in range(n):
        kind = draw(
            st.sampled_from(
                ["count", "count_distinct", "sum_int", "sum_distinct",
                 "sum_money", "minmax", "count_filter", "sum_filter"]
            )
        )
        if kind == "count":
            out.append(f"count(*) AS a{i}")
        elif kind == "count_distinct":
            col = draw(st.sampled_from(INT_COLS + STR_COLS))
            out.append(f"count(DISTINCT {col}) AS a{i}")
        elif kind == "sum_int":
            col = draw(st.sampled_from(INT_COLS))
            out.append(f"CAST(coalesce(sum({col}), 0) AS BIGINT) AS a{i}")
        elif kind == "sum_distinct":
            col = draw(st.sampled_from(INT_COLS))
            out.append(f"CAST(coalesce(sum(DISTINCT {col}), 0) AS BIGINT) AS a{i}")
        elif kind == "sum_money":
            col = draw(st.sampled_from(NUMERIC_COLS))
            out.append(
                f"CAST(round(coalesce(sum(CAST({col} AS DECIMAL(18,2))), 0), 2) AS DECIMAL(28,2)) AS a{i}"
            )
        elif kind == "minmax":
            fn = draw(st.sampled_from(["min", "max"]))
            col = draw(st.sampled_from(INT_COLS + STR_COLS + NUMERIC_COLS))
            out.append(f"{fn}({col}) AS a{i}")
        elif kind == "count_filter":
            pred = draw(predicate())
            out.append(f"count(*) FILTER (WHERE {pred}) AS a{i}")
        else:
            col = draw(st.sampled_from(INT_COLS))
            pred = draw(predicate())
            out.append(
                f"CAST(coalesce(sum({col}) FILTER (WHERE {pred}), 0) AS BIGINT) AS a{i}"
            )
    return out


@_SETTINGS
@given(
    aggs=aggregate_exprs(),
    group=st.sampled_from([None, "l_returnflag", "l_linestatus", "l_linenumber"]),
    where=st.one_of(st.none(), where_clause()),
    having=st.one_of(st.none(), st.integers(min_value=0, max_value=2000)),
)
def test_random_aggregates_agree(spark, fuzz_env, aggs, group, where, having):
    select = list(aggs)
    if group:
        select.insert(0, f"{group} AS g")
    sql = f"SELECT {', '.join(select)} FROM fz_lineitem"
    if where:
        sql += f" WHERE {where}"
    if group:
        sql += f" GROUP BY {group}"
        if having is not None:
            sql += f" HAVING count(*) > {having}"
    s = sorted(tuple(r) for r in spark.sql(sql).collect())
    d = sorted(fuzz_env.execute(sql).fetchall())
    assert s == d, f"sql: {sql}\nspark: {s}\nduckdb: {d}"


# ---------------------------------------------------------------------------
# Suite 4: window-function fuzz — ranking/analytic/frames over random
# partitions, reduced to exact integer aggregates for comparison
# ---------------------------------------------------------------------------

# (l_orderkey, l_linenumber) is a unique key, so this ORDER BY totally
# orders every partition — the determinism every sequence-sensitive
# window function (row_number/ntile/lag/first_value) needs
_TOTAL_ORDER = "l_orderkey, l_linenumber"


@st.composite
def window_expr(draw) -> str:
    part = draw(st.sampled_from(["", "PARTITION BY l_returnflag", "PARTITION BY l_linestatus", "PARTITION BY l_suppkey"]))
    kind = draw(
        st.sampled_from(
            ["row_number", "rank", "dense_rank", "ntile", "lag", "lead",
             "sum_rows", "count_rows", "minmax_rows", "first_value", "sum_range"]
        )
    )
    if kind in ("row_number", "rank", "dense_rank"):
        order = _TOTAL_ORDER if kind == "row_number" else draw(
            st.sampled_from([_TOTAL_ORDER, "l_suppkey", "l_linenumber"])
        )
        return f"{kind}() OVER ({part} ORDER BY {order})"
    if kind == "ntile":
        n = draw(st.integers(min_value=2, max_value=7))
        return f"ntile({n}) OVER ({part} ORDER BY {_TOTAL_ORDER})"
    if kind in ("lag", "lead"):
        off = draw(st.integers(min_value=1, max_value=3))
        return f"{kind}(l_linenumber, {off}, 0) OVER ({part} ORDER BY {_TOTAL_ORDER})"
    a = draw(st.integers(min_value=0, max_value=5))
    b = draw(st.integers(min_value=0, max_value=5))
    rows = f"ROWS BETWEEN {a} PRECEDING AND {b} FOLLOWING"
    if kind == "sum_rows":
        return f"sum(l_linenumber) OVER ({part} ORDER BY {_TOTAL_ORDER} {rows})"
    if kind == "count_rows":
        return f"count(*) OVER ({part} ORDER BY {_TOTAL_ORDER} {rows})"
    if kind == "minmax_rows":
        fn = draw(st.sampled_from(["min", "max"]))
        return f"{fn}(l_orderkey) OVER ({part} ORDER BY {_TOTAL_ORDER} {rows})"
    if kind == "first_value":
        return f"first_value(l_orderkey) OVER ({part} ORDER BY {_TOTAL_ORDER} {rows})"
    # sum_range: RANGE frames include whole peer groups, deterministic
    # under ties by definition
    k = draw(st.integers(min_value=0, max_value=500))
    return (
        f"sum(l_linenumber) OVER ({part} ORDER BY l_orderkey "
        f"RANGE BETWEEN {k} PRECEDING AND CURRENT ROW)"
    )


@_SETTINGS
@given(
    wins=st.lists(window_expr(), min_size=1, max_size=3),
    where=st.one_of(st.none(), where_clause()),
)
def test_random_window_functions_agree(spark, fuzz_env, wins, where):
    """Every generated window expression is integer-valued and
    deterministic (total-order ORDER BY for sequence-sensitive
    functions, ROWS/RANGE frames); the windowed relation reduces to
    exact aggregates so the compare is order-free."""
    inner_items = [f"{w} AS w{i}" for i, w in enumerate(wins)]
    inner = f"SELECT {', '.join(inner_items)} FROM fz_lineitem"
    if where:
        inner += f" WHERE {where}"
    outer_items = []
    for i in range(len(wins)):
        outer_items += [
            f"CAST(coalesce(sum(w{i}), 0) AS BIGINT) AS s{i}",
            f"min(w{i}) AS mn{i}",
            f"max(w{i}) AS mx{i}",
            f"count(DISTINCT w{i}) AS k{i}",
        ]
    sql = f"SELECT {', '.join(outer_items)} FROM ({inner})"
    _agree(spark, fuzz_env, sql)


# ---------------------------------------------------------------------------
# Suite 5: subquery fuzz — IN / NOT IN (incl. NULL-poisoned, the classic
# three-valued-logic trap) / EXISTS / correlated scalar aggregates
# ---------------------------------------------------------------------------


@st.composite
def subquery_predicate(draw) -> str:
    kind = draw(
        st.sampled_from(
            ["in", "not_in", "not_in_nullable", "exists", "not_exists", "scalar_cmp"]
        )
    )
    sub_where = draw(where_clause())
    if kind == "in":
        return f"o.o_orderkey IN (SELECT l_orderkey FROM fz_lineitem WHERE {sub_where})"
    if kind == "not_in":
        return f"o.o_orderkey NOT IN (SELECT l_orderkey FROM fz_lineitem WHERE {sub_where})"
    if kind == "not_in_nullable":
        # any NULL in the NOT IN list makes the whole predicate UNKNOWN —
        # both engines must agree on the three-valued-logic wipeout
        return (
            "o.o_orderkey NOT IN (SELECT CASE WHEN l_linenumber = 3 THEN NULL "
            f"ELSE l_orderkey END FROM fz_lineitem WHERE {sub_where})"
        )
    if kind == "exists":
        return (
            "EXISTS (SELECT 1 FROM fz_lineitem l "
            f"WHERE l.l_orderkey = o.o_orderkey AND ({sub_where}))"
        )
    if kind == "not_exists":
        return (
            "NOT EXISTS (SELECT 1 FROM fz_lineitem l "
            f"WHERE l.l_orderkey = o.o_orderkey AND ({sub_where}))"
        )
    op = draw(comparison)
    n = draw(st.integers(min_value=0, max_value=5))
    return (
        "(SELECT count(*) FROM fz_lineitem l "
        f"WHERE l.l_orderkey = o.o_orderkey AND ({sub_where})) {op} {n}"
    )


@_SETTINGS
@given(pred=subquery_predicate())
def test_random_subqueries_agree(spark, fuzz_env, pred):
    sql = (
        "SELECT count(*) AS n, "
        "CAST(coalesce(sum(o.o_orderkey), 0) AS BIGINT) AS s "
        f"FROM fz_orders o WHERE {pred}"
    )
    _agree(spark, fuzz_env, sql)


# ---------------------------------------------------------------------------
# Suite 6: scalar-expression fuzz — random nested integer / string / date
# expressions evaluated per-row in both engines and reduced to exact
# aggregates. Surfaces function-semantics drift (mod sign, substr
# indexing, concat null handling, interval arithmetic) that fixed
# queries can't reach.
#
# Determinism rules: integer grammar is closed over BIGINT with bounded
# operands (no division — `/` is float in both engines and FP sum order
# differs); string grammar stays ASCII so binary collation agrees;
# dates reduce through extract() to BIGINT (date_trunc is excluded: it
# returns DATE in DuckDB but TIMESTAMP in Spark).
# ---------------------------------------------------------------------------


@st.composite
def int_expr(draw, depth: int = 0) -> str:
    atoms = [
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "CAST(l_linenumber AS BIGINT)",
        str(draw(st.integers(min_value=0, max_value=100))),
    ]
    if depth >= 2:
        return draw(st.sampled_from(atoms))
    kind = draw(
        st.sampled_from(
            ["atom", "add", "sub", "mul", "mod", "abs", "greatest", "least", "case"]
        )
    )
    if kind == "atom":
        return draw(st.sampled_from(atoms))
    if kind in ("add", "sub"):
        a = draw(int_expr(depth=depth + 1))
        b = draw(int_expr(depth=depth + 1))
        op = "+" if kind == "add" else "-"
        return f"({a} {op} {b})"
    if kind == "mul":
        a = draw(int_expr(depth=depth + 1))
        k = draw(st.integers(min_value=2, max_value=7))
        return f"({a} * {k})"
    if kind == "mod":
        # both engines use C-style mod (sign follows the dividend) —
        # verified: -7 % 3 == -1 in Spark and DuckDB
        a = draw(int_expr(depth=depth + 1))
        k = draw(st.integers(min_value=2, max_value=97))
        return f"({a} % {k})"
    if kind == "abs":
        return f"abs({draw(int_expr(depth=depth + 1))})"
    if kind in ("greatest", "least"):
        a = draw(int_expr(depth=depth + 1))
        b = draw(int_expr(depth=depth + 1))
        return f"{kind}({a}, {b})"
    pred = draw(predicate())
    a = draw(int_expr(depth=depth + 1))
    b = draw(int_expr(depth=depth + 1))
    return f"(CASE WHEN {pred} THEN {a} ELSE {b} END)"


@_SETTINGS
@given(exprs=st.lists(int_expr(), min_size=1, max_size=3), where=st.one_of(st.none(), where_clause()))
def test_random_int_expressions_agree(spark, fuzz_env, exprs, where):
    items = []
    for i, e in enumerate(exprs):
        items += [
            f"CAST(coalesce(sum({e}), 0) AS BIGINT) AS s{i}",
            f"min({e}) AS mn{i}",
            f"max({e}) AS mx{i}",
            f"count(DISTINCT {e}) AS k{i}",
        ]
    sql = f"SELECT {', '.join(items)} FROM fz_lineitem"
    if where:
        sql += f" WHERE {where}"
    _agree(spark, fuzz_env, sql)


@st.composite
def str_expr(draw, depth: int = 0) -> str:
    atoms = ["c_name", "c_mktsegment", "'xy#z'"]
    if depth >= 2:
        return draw(st.sampled_from(atoms))
    kind = draw(
        st.sampled_from(["atom", "upper", "lower", "substr", "reverse", "concat", "replace"])
    )
    if kind == "atom":
        return draw(st.sampled_from(atoms))
    inner = draw(str_expr(depth=depth + 1))
    if kind in ("upper", "lower", "reverse"):
        return f"{kind}({inner})"
    if kind == "substr":
        # start >= 1 only: substr from 0 is engine-divergent
        # (Spark treats 0 as 1; DuckDB/Postgres shift the window)
        start = draw(st.integers(min_value=1, max_value=5))
        n = draw(st.integers(min_value=0, max_value=9))
        return f"substr({inner}, {start}, {n})"
    if kind == "concat":
        other = draw(str_expr(depth=depth + 1))
        return f"({inner} || {other})"
    a = draw(st.sampled_from(["0", "e", "r", "C", "#"]))
    b = draw(st.sampled_from(["", "Q", "zz"]))
    return f"replace({inner}, '{a}', '{b}')"


@_SETTINGS
@given(exprs=st.lists(str_expr(), min_size=1, max_size=3))
def test_random_string_expressions_agree(spark, fuzz_env, exprs):
    items = []
    for i, e in enumerate(exprs):
        items += [
            f"count(DISTINCT {e}) AS k{i}",
            f"min({e}) AS mn{i}",
            f"max({e}) AS mx{i}",
            f"CAST(coalesce(sum(length({e})), 0) AS BIGINT) AS s{i}",
        ]
    sql = f"SELECT {', '.join(items)} FROM fz_customer"
    _agree(spark, fuzz_env, sql)


@st.composite
def date_expr(draw) -> str:
    base = "o_orderdate"
    kind = draw(st.sampled_from(["plain", "plus", "minus"]))
    if kind == "plain":
        return base
    k = draw(st.integers(min_value=1, max_value=400))
    op = "+" if kind == "plus" else "-"
    return f"({base} {op} INTERVAL {k} DAY)"


@_SETTINGS
@given(
    exprs=st.lists(date_expr(), min_size=1, max_size=3),
    field=st.sampled_from(["YEAR", "MONTH", "DAY"]),
)
def test_random_date_expressions_agree(spark, fuzz_env, exprs, field):
    items = []
    for i, e in enumerate(exprs):
        ext = f"CAST(extract({field} FROM {e}) AS BIGINT)"
        items += [
            f"CAST(coalesce(sum({ext}), 0) AS BIGINT) AS s{i}",
            f"min({ext}) AS mn{i}",
            f"max({ext}) AS mx{i}",
            f"count(DISTINCT {ext}) AS k{i}",
        ]
    sql = f"SELECT {', '.join(items)} FROM fz_orders"
    _agree(spark, fuzz_env, sql)


# ---------------------------------------------------------------------------
# Suite 7: set-operation fuzz — random trees of UNION / INTERSECT /
# EXCEPT ([ALL] and DISTINCT) over type-aligned projections of two
# different tables, reduced to exact aggregates. Exercises the
# bag-vs-set semantics corner (EXCEPT ALL multiplicity arithmetic,
# INTERSECT ALL min-multiplicity) where engines historically diverge.
# ---------------------------------------------------------------------------

SETOPS = ["UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL", "EXCEPT", "EXCEPT ALL"]


@st.composite
def setop_branch(draw) -> str:
    src = draw(st.sampled_from(["lineitem", "orders"]))
    if src == "lineitem":
        where = draw(where_clause())
        return (
            "SELECT l_returnflag AS a, CAST(l_linenumber AS BIGINT) AS c "
            f"FROM fz_lineitem WHERE {where}"
        )
    status = draw(st.sampled_from(["O", "F", "P"]))
    k = draw(st.integers(min_value=2, max_value=9))
    return (
        f"SELECT o_orderstatus AS a, (o_orderkey % {k}) AS c "
        f"FROM fz_orders WHERE o_orderstatus <> '{status}'"
    )


@_SETTINGS
@given(
    b1=setop_branch(),
    b2=setop_branch(),
    b3=st.one_of(st.none(), setop_branch()),
    op1=st.sampled_from(SETOPS),
    op2=st.sampled_from(SETOPS),
)
def test_random_set_operations_agree(spark, fuzz_env, b1, b2, b3, op1, op2):
    tree = f"({b1}) {op1} ({b2})"
    if b3 is not None:
        tree = f"({tree}) {op2} ({b3})"
    sql = (
        "SELECT count(*) AS n, count(DISTINCT a) AS ka, "
        "count(DISTINCT c) AS kc, "
        "CAST(coalesce(sum(c), 0) AS BIGINT) AS s, "
        "min(a) AS mn, max(c) AS mx "
        f"FROM ({tree}) t"
    )
    _agree(spark, fuzz_env, sql)


# ---------------------------------------------------------------------------
# Suite 8: grouping-sets fuzz — ROLLUP / CUBE / GROUPING SETS over random
# key subsets with GROUPING() ids. The multiset compare is NULL-safe
# (grouping keys ARE NULL in super-aggregate rows — the exact corner the
# sorted-tuple compare of suite 3 cannot reach).
#
# Documented divergence (found by this suite, excluded via assume): over
# an EMPTY input, DuckDB/Postgres emit the grand-total super-aggregate
# row for ROLLUP/CUBE/GROUPING SETS(()) (count=0, keys NULL, per the
# standard's treatment of the empty grouping set as a global aggregate),
# while Spark returns zero rows. The generator therefore requires a
# non-empty filtered input, probed cheaply on the DuckDB side.
# ---------------------------------------------------------------------------

GROUP_KEYS = ["l_returnflag", "l_linestatus", "l_linenumber"]


def _agree_multiset(spark, con, sql: str) -> None:
    from collections import Counter

    s = Counter(tuple(r) for r in spark.sql(sql).collect())
    d = Counter(tuple(r) for r in con.execute(sql).fetchall())
    assert s == d, f"sql: {sql}\nspark-only: {s - d}\nduckdb-only: {d - s}"


@st.composite
def grouping_spec(draw) -> tuple[list[str], str]:
    keys = draw(
        st.lists(st.sampled_from(GROUP_KEYS), min_size=1, max_size=3, unique=True)
    )
    kind = draw(st.sampled_from(["ROLLUP", "CUBE", "SETS"]))
    if kind in ("ROLLUP", "CUBE"):
        return keys, f"{kind}({', '.join(keys)})"
    # GROUPING SETS: random subsets (possibly the empty set), but always
    # include the full key tuple so every selected key is grouped in at
    # least one set (a Spark analyzer requirement)
    sets = [f"({', '.join(keys)})"]
    for _ in range(draw(st.integers(min_value=0, max_value=2))):
        sub = draw(st.lists(st.sampled_from(keys), max_size=len(keys), unique=True))
        sets.append(f"({', '.join(sub)})")
    return keys, f"GROUPING SETS ({', '.join(sets)})"


@_SETTINGS
@given(spec=grouping_spec(), where=st.one_of(st.none(), where_clause()))
def test_random_grouping_sets_agree(spark, fuzz_env, spec, where):
    from hypothesis import assume

    keys, clause = spec
    if where:
        n_in = fuzz_env.execute(
            f"SELECT count(*) FROM fz_lineitem WHERE {where}"
        ).fetchone()[0]
        assume(n_in > 0)  # empty-input super-aggregate rows diverge (see above)
    items = [*keys]
    items += [f"CAST(grouping({k}) AS INT) AS g_{k}" for k in keys]
    items += [
        "count(*) AS n",
        "CAST(coalesce(sum(l_orderkey), 0) AS BIGINT) AS s",
        "count(DISTINCT l_suppkey) AS k",
    ]
    sql = f"SELECT {', '.join(items)} FROM fz_lineitem"
    if where:
        sql += f" WHERE {where}"
    sql += f" GROUP BY {clause}"
    _agree_multiset(spark, fuzz_env, sql)


# ---------------------------------------------------------------------------
# Suite 9: multi-table join-topology fuzz — three-relation chains and
# stars with a random outer/inner join type at EACH step. Two stacked
# outer joins is where engines historically disagree (null-extended rows
# from step 1 feeding step 2's join condition); the null-count
# aggregates pin exactly which side got extended.
# ---------------------------------------------------------------------------

MULTI_JOIN_TYPES = ["JOIN", "LEFT JOIN", "RIGHT JOIN", "FULL JOIN"]


@_SETTINGS
@given(
    jt1=st.sampled_from(MULTI_JOIN_TYPES),
    jt2=st.sampled_from(MULTI_JOIN_TYPES),
    topology=st.sampled_from(["chain", "star"]),
    where=st.one_of(st.none(), where_clause()),
    cust_pred=st.one_of(
        st.none(),
        st.sampled_from(["BUILDING", "MACHINERY", "AUTOMOBILE"]),
    ),
)
def test_random_multi_join_topologies_agree(spark, fuzz_env, jt1, jt2, topology, where, cust_pred):
    if topology == "chain":
        # lineitem -> orders -> customer
        frm = (
            f"fz_lineitem l {jt1} fz_orders o ON l.l_orderkey = o.o_orderkey "
            f"{jt2} fz_customer c ON o.o_custkey = c.c_custkey"
        )
    else:
        # star around orders: customer first, then lineitem
        frm = (
            f"fz_orders o {jt1} fz_customer c ON o.o_custkey = c.c_custkey "
            f"{jt2} fz_lineitem l ON l.l_orderkey = o.o_orderkey"
        )
    conds = []
    if where:
        # predicate over lineitem columns — NULL for l-extended rows,
        # three-valued logic must agree
        conds.append(f"({where})")
    if cust_pred:
        conds.append(f"c.c_mktsegment = '{cust_pred}'")
    sql = (
        "SELECT count(*) AS n, "
        "count(l.l_orderkey) AS nl, count(o.o_orderkey) AS no, "
        "count(c.c_custkey) AS nc, "
        "CAST(coalesce(sum(l.l_linenumber), 0) AS BIGINT) AS sl, "
        "CAST(coalesce(sum(o.o_custkey), 0) AS BIGINT) AS so, "
        "CAST(coalesce(sum(c.c_nationkey), 0) AS BIGINT) AS sc "
        f"FROM {frm}"
    )
    if conds:
        sql += " WHERE " + " AND ".join(conds)
    _agree(spark, fuzz_env, sql)


# ---------------------------------------------------------------------------
# Suite 10: ORDER BY / LIMIT / OFFSET fuzz — random sort keys and
# directions with a total-order tiebreak, random LIMIT and OFFSET,
# compared POSITIONALLY (the only suite where row order is the result).
# ---------------------------------------------------------------------------


@st.composite
def order_spec(draw) -> str:
    keys = draw(
        st.lists(
            st.tuples(
                st.sampled_from(
                    ["l_suppkey", "l_linenumber", "l_returnflag", "l_quantity"]
                ),
                st.sampled_from(["ASC", "DESC"]),
            ),
            max_size=2,
            unique_by=lambda t: t[0],
        )
    )
    # (l_orderkey, l_linenumber) is NOT unique in this synthetic data
    # (fuzz-discovered); the tiebreak therefore spans ALL selected
    # columns — rows still tied after it have identical output tuples,
    # so the positional compare stays exact
    tie = draw(st.sampled_from(["ASC", "DESC"]))
    parts = [f"{k} {d}" for k, d in keys]
    parts += [
        f"l_orderkey {tie}",
        f"l_linenumber {tie}",
        f"l_returnflag {tie}",
    ]
    return ", ".join(parts)


@_SETTINGS
@given(
    order=order_spec(),
    limit=st.integers(min_value=0, max_value=40),
    offset=st.one_of(st.none(), st.integers(min_value=0, max_value=30)),
    where=st.one_of(st.none(), where_clause()),
)
def test_random_order_limit_offset_agree(spark, fuzz_env, order, limit, offset, where):
    sql = "SELECT l_orderkey, l_linenumber, l_returnflag FROM fz_lineitem"
    if where:
        sql += f" WHERE {where}"
    sql += f" ORDER BY {order} LIMIT {limit}"
    if offset is not None:
        sql += f" OFFSET {offset}"
    s = [tuple(r) for r in spark.sql(sql).collect()]
    d = fuzz_env.execute(sql).fetchall()
    assert s == d, f"sql: {sql}\nspark: {s}\nduckdb: {d}"  # ordered compare


# ---------------------------------------------------------------------------
# Suite 11: correlated-subquery fuzz — scalar aggregates in the SELECT
# list and (NOT) EXISTS in WHERE, with a random uncorrelated inner
# predicate. The classic divergence pits are COUNT-over-empty-group
# (must be 0, not NULL) vs SUM-over-empty-group (must be NULL —
# coalesced to a sentinel here so the compare is explicit), and
# NOT EXISTS against a null-extended inner predicate.
# ---------------------------------------------------------------------------


@_SETTINGS
@given(
    shape=st.sampled_from(["scalar_agg", "exists", "not_exists"]),
    inner=st.one_of(st.none(), where_clause()),
    cutoff=st.integers(min_value=50, max_value=2000),
)
def test_random_correlated_subqueries_agree(spark, fuzz_env, shape, inner, cutoff):
    inner_pred = f"l.l_orderkey = o.o_orderkey" + (f" AND ({inner})" if inner else "")
    if shape == "scalar_agg":
        sql = (
            "SELECT o.o_orderkey, "
            f"(SELECT CAST(count(*) AS BIGINT) FROM fz_lineitem l WHERE {inner_pred}) AS cnt, "
            "CAST(coalesce((SELECT CAST(sum(l.l_linenumber) AS BIGINT) "
            f"FROM fz_lineitem l WHERE {inner_pred}), -1) AS BIGINT) AS s, "
            f"(SELECT max(l.l_returnflag) FROM fz_lineitem l WHERE {inner_pred}) AS mx "
            f"FROM fz_orders o WHERE o.o_orderkey <= {cutoff}"
        )
    else:
        neg = "NOT " if shape == "not_exists" else ""
        sql = (
            "SELECT CAST(count(*) AS BIGINT) AS n, "
            "CAST(coalesce(sum(o.o_custkey), 0) AS BIGINT) AS sc "
            f"FROM fz_orders o WHERE o.o_orderkey <= {cutoff} "
            f"AND {neg}EXISTS (SELECT 1 FROM fz_lineitem l WHERE {inner_pred})"
        )
    _agree_multiset(spark, fuzz_env, sql)


# ---------------------------------------------------------------------------
# Suite 12: three-valued-logic projection fuzz — random boolean
# expression trees (AND/OR/NOT over comparisons, IS [NOT] NULL, nullable
# NULLIF-injected operands) PROJECTED as values, not filtered on. A
# WHERE clause only observes TRUE vs not-TRUE; projecting the boolean
# (grouped into TRUE/FALSE/NULL counts) distinguishes FALSE from NULL —
# the half of Kleene logic the filter suites cannot see.
# ---------------------------------------------------------------------------


@st.composite
def bool_tree(draw, depth: int = 0) -> str:
    if depth >= 3 or draw(st.booleans()):
        kind = draw(st.sampled_from(["cmp", "null_cmp", "is_null"]))
        if kind == "cmp":
            col = draw(st.sampled_from(INT_COLS))
            op = draw(comparison)
            val = draw(st.integers(min_value=0, max_value=4000))
            return f"{col} {op} {val}"
        if kind == "null_cmp":
            # NULLIF injects NULLs so comparisons yield UNKNOWN, not
            # just TRUE/FALSE
            col = draw(st.sampled_from(["l_linenumber", "l_suppkey"]))
            sentinel = draw(st.integers(min_value=0, max_value=7))
            op = draw(comparison)
            val = draw(st.integers(min_value=0, max_value=10))
            return f"nullif({col} % 8, {sentinel}) {op} {val}"
        col = draw(st.sampled_from(["l_returnflag", "l_quantity"]))
        neg = draw(st.sampled_from(["", "NOT "]))
        return f"{col} IS {neg}NULL"
    op = draw(st.sampled_from(["AND", "OR"]))
    neg = draw(st.sampled_from(["", "NOT "]))
    left = draw(bool_tree(depth + 1))
    right = draw(bool_tree(depth + 1))
    return f"{neg}(({left}) {op} ({right}))"


@_SETTINGS
@given(tree=bool_tree(), where=st.one_of(st.none(), where_clause()))
def test_random_boolean_projection_agrees(spark, fuzz_env, tree, where):
    sql = (
        "SELECT CASE WHEN (" + tree + ") THEN 'T' "
        "WHEN NOT (" + tree + ") THEN 'F' ELSE 'U' END AS verdict, "
        "CAST(count(*) AS BIGINT) AS n FROM fz_lineitem"
    )
    if where:
        sql += f" WHERE {where}"
    sql += " GROUP BY verdict"
    _agree_multiset(spark, fuzz_env, sql)
