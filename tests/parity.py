"""Local stand-in for the driver's DuckDB correctness oracle.

Runs a registered Spark query and its DuckDB oracle SQL on the same
parquet tables and compares: row count, sorted column names, and an
order-insensitive multiset of normalized values (columns sorted by name,
rows sorted) — the strictest interpretation of the driver's
"row-count + schema + value-hash" gate.
"""

from __future__ import annotations

import datetime
import math
from typing import Any

import duckdb

from datafusion_nats_spark.tables import TABLES

_F64_SENTINEL = 12  # round-trip doubles to 12 significant digits for compare


def _norm(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(f"{v:.{_F64_SENTINEL}g}")
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def run_oracle(con: duckdb.DuckDBPyConnection, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def compare(spark_df, con: duckdb.DuckDBPyConnection, oracle_sql: str) -> None:
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = run_oracle(con, oracle_sql)

    assert sorted(s_cols) == sorted(d_cols), f"columns differ: {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"row count differs: {len(s_rows)} vs {len(d_rows)}"

    s_order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    d_order = sorted(range(len(d_cols)), key=lambda i: d_cols[i])

    from collections import Counter

    s_set = Counter(tuple(_norm(row[i]) for i in s_order) for row in s_rows)
    d_set = Counter(tuple(_norm(row[i]) for i in d_order) for row in d_rows)
    if s_set != d_set:
        only_s = list((s_set - d_set).keys())[:5]
        only_d = list((d_set - s_set).keys())[:5]
        raise AssertionError(
            f"value multisets differ\n  only in spark: {only_s}\n  only in duck : {only_d}"
        )
