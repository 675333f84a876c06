"""Codec tests — ported from the reference's csv_test.rs spec
(FIXTURES.md §A2/A3; the reference's own unit tests are dead code,
SURVEY §5.2, so these assert the *specification intent* with correct
date semantics, SURVEY §8.1)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import types as T

from datafusion_nats_spark.codec import (
    CsvCodec,
    ParseError,
    SchemaValidationError,
    decode_lines,
    validate_schema,
)


def s(*fields) -> T.StructType:
    return T.StructType([T.StructField(n, t, False) for n, t in fields])


ALL_TYPES = s(
    ("id", T.IntegerType()),
    ("name", T.StringType()),
    ("active", T.BooleanType()),
    ("amount", T.DoubleType()),
    ("created_at", T.TimestampType()),
    ("date", T.DateType()),
)


# --- schema validation (csv_test.rs:27-75 spec) -------------------------

def test_empty_schema_rejected():
    with pytest.raises(SchemaValidationError):
        validate_schema(T.StructType([]))


def test_duplicate_field_name_rejected():
    with pytest.raises(SchemaValidationError):
        validate_schema(s(("id", T.IntegerType()), ("id", T.StringType())))


def test_empty_field_name_rejected():
    with pytest.raises(SchemaValidationError):
        validate_schema(s(("", T.IntegerType())))


def test_unsupported_type_rejected():
    with pytest.raises(SchemaValidationError):
        validate_schema(s(("blob", T.BinaryType())))
    with pytest.raises(SchemaValidationError):
        validate_schema(s(("v", T.ArrayType(T.IntegerType()))))
    with pytest.raises(SchemaValidationError):
        validate_schema(s(("v", T.LongType())))


# --- happy paths per type (csv_test.rs:11-162 spec) ---------------------

def test_int32_parse():
    assert CsvCodec(s(("id", T.IntegerType()))).parse_line("42") == (42,)


def test_float64_parse():
    assert CsvCodec(s(("x", T.DoubleType()))).parse_line("3.14159") == (3.14159,)


@pytest.mark.parametrize(
    "wire,expected",
    [("true", True), ("TRUE", True), ("1", True), ("false", False), ("0", False)],
)
def test_boolean_parse(wire, expected):
    assert CsvCodec(s(("b", T.BooleanType()))).parse_line(wire) == (expected,)


def test_utf8_parse():
    assert CsvCodec(s(("n", T.StringType()))).parse_line("John Doe") == ("John Doe",)


def test_all_six_types_row():
    # golden payload: csv_test.rs:134
    row = CsvCodec(ALL_TYPES).parse_line("42,John Doe,true,3.14159,2025-07-25 15:42:35,2025-07-25")
    assert row == (
        42,
        "John Doe",
        True,
        3.14159,
        datetime.datetime(2025, 7, 25, 15, 42, 35),
        datetime.date(2025, 7, 25),  # CORRECT epoch — reference bug §8.1 not replicated
    )


# --- rejection spec (csv_test.rs:165-249 / FIXTURES A3) -----------------

@pytest.mark.parametrize(
    "schema,line",
    [
        (s(("id", T.IntegerType())), ""),  # empty payload → error, not NULL
        (s(("ts", T.TimestampType())), "invalid_timestamp"),
        (s(("d", T.DateType())), "invalid_date"),
        (s(("id", T.IntegerType())), "1,extra_field"),  # arity 2 != 1
        (s(("id", T.IntegerType()), ("n", T.StringType())), "1"),  # arity 1 != 2
        (s(("id", T.IntegerType())), "not_a_number"),
        (s(("id", T.IntegerType())), "1.5"),  # int parse must not accept floats
        (s(("b", T.BooleanType())), "yes"),
        (s(("x", T.DoubleType())), "abc"),
    ],
)
def test_rejections(schema, line):
    with pytest.raises(ParseError):
        CsvCodec(schema).parse_line(line)


def test_no_quoting_bare_split():
    # No quoting/escaping: csv.rs:94 — a quoted comma still splits.
    with pytest.raises(ParseError):
        CsvCodec(s(("n", T.StringType()))).parse_line('"a,b"')


# --- vectorized decode parity with the row path -------------------------

GOOD = [
    "1,apple,true,1.5,2025-07-25 15:42:35,2025-07-25",
    "2,banana,0,2.5,2024-01-01 00:00:00,2024-01-01",
    # reference contract (csv.rs f64::from_str / chrono): float special
    # forms and non-zero-padded temporal fields are valid on the wire
    "8,grape,false,inf,2024-1-2 3:4:5,2024-1-2",
    "9,plum,true,-Infinity,2024-01-02 03:04:05,2024-01-02",
]
BAD = [
    "",  # empty
    "3,pear,true,3.0,2025-07-25 15:42:35",  # arity
    "x,pear,true,3.0,2025-07-25 15:42:35,2025-07-25",  # bad int
    "4,,true,3.0,2025-07-25 15:42:35,2025-07-25",  # empty field
    "5,kiwi,maybe,3.0,2025-07-25 15:42:35,2025-07-25",  # bad bool
    "6,fig,true,3.0,bad ts,2025-07-25",  # bad timestamp
    "7.5,fig,true,3.0,2025-07-25 15:42:35,2025-07-25",  # float-as-int
]


def test_decode_lines_matches_row_codec(spark):
    df = spark.createDataFrame([(line,) for line in GOOD + BAD], "value string")
    out = decode_lines(df, ALL_TYPES).collect()
    codec = CsvCodec(ALL_TYPES)
    expected = [codec.parse_line(line) for line in GOOD]
    assert sorted(tuple(r) for r in out) == sorted(expected)


def test_decode_lines_marked_mode(spark):
    df = spark.createDataFrame([(line,) for line in GOOD + BAD], "value string")
    out = decode_lines(df, ALL_TYPES, mode="marked")
    n_corrupt = out.filter("_corrupt").count()
    assert n_corrupt == len(BAD)
    assert out.count() == len(GOOD) + len(BAD)


def test_decode_lines_nan_parity_with_row_path(spark):
    """NaN can't ride the GOOD-list equality check (NaN != NaN), so the
    JVM path's Rust-special-form parity for it is pinned here: the
    rlike-gated cast must yield a real NaN double, exactly like the row
    codec's float('nan')."""
    import math

    from pyspark.sql import types as T

    from datafusion_nats_spark.codec import CsvCodec, decode_lines

    schema = T.StructType([T.StructField("x", T.DoubleType(), False)])
    df = spark.createDataFrame([("nan",), ("-NaN",), ("+nan",)], "value string")
    got = [r.x for r in decode_lines(df, schema).collect()]
    assert len(got) == 3 and all(math.isnan(v) for v in got)
    assert math.isnan(CsvCodec(schema).parse_line("nan")[0])


def test_decode_lines_rejects_year_zero_and_loose_shapes(spark):
    """Self-review regression: Spark's to_date/try_to_timestamp accept
    proleptic year 0 ('0000-01-01') that the row and arrow paths reject —
    and collecting such a Date32 row crashes PySpark's deserializer
    ('ordinal must be >= 1'). The JVM decode must drop those rows exactly
    like the other two paths. Non-zero-padded temporals are VALID (the
    reference parses with chrono, whose numeric fields accept 1-2
    digits) — reference-parity since round 5."""
    from pyspark.sql import types as T

    from datafusion_nats_spark.codec import decode_lines

    schema = T.StructType(
        [
            T.StructField("t", T.TimestampType(), False),
            T.StructField("d", T.DateType(), False),
        ]
    )
    lines = [
        "2024-01-02 03:04:05,2024-01-02",  # valid
        # year 1 = the shared minimum (mid-year: PySpark's deserializer
        # converts via local-time fromtimestamp, which underflows to year
        # 0 for instants at the exact minimum in western timezones)
        "0001-07-01 00:00:00,0001-07-01",
        "0000-01-01 00:00:00,2024-01-02",  # year-0 timestamp
        "2024-01-02 03:04:05,0000-01-01",  # year-0 date
        "2024-1-2 3:4:5,2024-1-2",         # non-padded: VALID (chrono parity)
        "2024-01-02T03:04:05,2024/01/02",  # wrong separators: still rejected
        # day-overflow / leap-second: try_to_timestamp already NULLs these
        # (the arrow path needed the explicit round-trip check, ADVICE r5)
        "2024-02-30 00:00:00,2024-01-02",
        "2024-01-02 03:04:05,2024-2-30",
        "2024-01-02 03:04:60,2024-01-02",
        "2024-01-02 03:04:05,2023-02-29",
    ]
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    rows = decode_lines(df, schema).collect()  # must not crash on collect
    import datetime

    got = sorted((r.t, r.d) for r in rows)
    assert got == [
        (datetime.datetime(1, 7, 1, 0, 0), datetime.date(1, 7, 1)),
        (datetime.datetime(2024, 1, 2, 3, 4, 5), datetime.date(2024, 1, 2)),
        (datetime.datetime(2024, 1, 2, 3, 4, 5), datetime.date(2024, 1, 2)),
    ]
