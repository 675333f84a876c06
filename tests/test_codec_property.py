"""Property-based codec tests (hypothesis): random rows within the
six-type wire format must round-trip encode→parse exactly
(SURVEY §5.4 item 5)."""

from __future__ import annotations

import datetime
import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from datafusion_nats_spark.codec import CsvCodec, ParseError
from datafusion_nats_spark.sources.nats_source import _encode_value

SAFE_TEXT = st.text(
    alphabet=st.characters(
        codec="utf-8", exclude_characters=",\n\r", categories=("L", "N", "P", "S")
    ),
    min_size=1,
    max_size=40,
)

COLS = [
    ("i", T.IntegerType(), st.integers(min_value=-(2**31), max_value=2**31 - 1)),
    (
        "f",
        T.DoubleType(),
        st.floats(allow_nan=False, allow_infinity=False, width=64).filter(
            lambda x: x == x and abs(x) < 1e15
        ),
    ),
    ("b", T.BooleanType(), st.booleans()),
    ("s", T.StringType(), SAFE_TEXT),
    (
        "t",
        T.TimestampType(),
        st.datetimes(
            min_value=datetime.datetime(1900, 1, 1),
            max_value=datetime.datetime(2100, 1, 1),
        ).map(lambda d: d.replace(microsecond=0)),
    ),
    (
        "d",
        T.DateType(),
        st.dates(min_value=datetime.date(1900, 1, 1), max_value=datetime.date(2100, 1, 1)),
    ),
]

SCHEMA = T.StructType([T.StructField(n, t, False) for n, t, _ in COLS])
ROW = st.tuples(*[s for _, _, s in COLS])


@settings(max_examples=200, deadline=None)
@given(ROW)
def test_roundtrip(row):
    codec = CsvCodec(SCHEMA)
    line = ",".join(_encode_value(v) for v in row)
    parsed = codec.parse_line(line)
    for orig, back, (name, dtype, _) in zip(row, parsed, COLS):
        if isinstance(dtype, T.DoubleType):
            # wire format is decimal text; repr(float) round-trips exactly
            assert back == float(repr(orig)) and (
                back == orig or math.isclose(back, orig, rel_tol=0, abs_tol=0)
            )
        else:
            assert back == orig, f"{name}: {orig!r} -> {back!r}"


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abc,01.x-", max_size=30))
def test_parse_never_crashes_uncontrolled(line):
    """Arbitrary junk either parses to a full typed row or raises ParseError
    — never any other exception, never a partial row."""
    codec = CsvCodec(SCHEMA)
    try:
        parsed = codec.parse_line(line)
    except ParseError:
        return
    assert len(parsed) == len(SCHEMA.fields)


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=-(2**31), max_value=2**31 - 1))
def test_int_wire_exact(i):
    codec = CsvCodec(T.StructType([T.StructField("x", T.IntegerType(), False)]))
    assert codec.parse_line(str(i)) == (i,)


_TYPED_VALUES = {
    "int": st.integers(min_value=-(2**31), max_value=2**31 - 1).map(str),
    "double": st.floats(
        allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
    ).map(lambda f: f"{f:.4f}"),
    "boolean": st.sampled_from(["true", "false"]),
    "timestamp": st.integers(min_value=0, max_value=2**31 - 1).map(
        lambda s: __import__("datetime")
        .datetime.utcfromtimestamp(s)
        .strftime("%Y-%m-%d %H:%M:%S")
    ),
    "date": st.integers(min_value=0, max_value=3000).map(
        lambda d: (
            __import__("datetime").date(2000, 1, 1)
            + __import__("datetime").timedelta(days=d)
        ).isoformat()
    ),
}


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.sampled_from(sorted(_TYPED_VALUES)), min_size=1, max_size=6),
    st.data(),
)
def test_infer_schema_recovers_types(col_types, data):
    """Rows generated from a known type signature infer back to exactly
    that signature (double may absorb int-looking values, so int columns
    assert int-or-double)."""
    from datafusion_nats_spark.codec import infer_schema

    n_rows = data.draw(st.integers(min_value=1, max_value=5))
    payloads = []
    for _ in range(n_rows):
        payloads.append(
            ",".join(data.draw(_TYPED_VALUES[t]) for t in col_types).encode()
        )
    inferred = [f.dataType.simpleString() for f in infer_schema(payloads).fields]
    for want, got in zip(col_types, inferred):
        if want == "double":
            # an all-integral sample legitimately infers int
            assert got in ("double", "int")
        else:
            assert got == want


# ---------------------------------------------------------------------------
# Avro OCF round-trip (pure-Python reader/writer, sources/avro_source.py)
# ---------------------------------------------------------------------------

_AVRO_SCHEMA = {
    "type": "record",
    "name": "prop",
    "fields": [
        {"name": "a_long", "type": "long"},
        {"name": "a_int", "type": "int"},
        {"name": "a_double", "type": "double"},
        {"name": "a_bool", "type": "boolean"},
        {"name": "a_str", "type": "string"},
        {"name": "a_bytes", "type": "bytes"},
        {"name": "a_opt", "type": ["null", "long"]},
    ],
}

_avro_rows = st.lists(
    st.tuples(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        st.integers(min_value=-(2**31), max_value=2**31 - 1),
        st.floats(allow_nan=False, width=64),
        st.booleans(),
        st.text(max_size=60),
        st.binary(max_size=40),
        st.one_of(st.none(), st.integers(min_value=-(2**62), max_value=2**62)),
    ),
    max_size=40,
)


@settings(max_examples=60, deadline=None)
@given(rows=_avro_rows, codec=st.sampled_from(["null", "deflate"]))
def test_avro_ocf_roundtrip_property(tmp_path_factory, rows, codec):
    """Arbitrary rows over the full supported type surface (incl. extreme
    varint magnitudes, empty strings/bytes, null union branch, both
    codecs) must round-trip the OCF writer -> reader bit-exactly."""
    from datafusion_nats_spark.sources.avro_source import (
        read_avro_file,
        write_avro_file,
    )

    p = str(tmp_path_factory.mktemp("avro_prop") / "t.avro")
    write_avro_file(p, _AVRO_SCHEMA, rows, codec=codec)
    assert list(read_avro_file(p)) == [tuple(r) for r in rows]


# ---------------------------------------------------------------------------
# decode=arrow differential (vectorized pyarrow.csv path vs row codec)
# ---------------------------------------------------------------------------


@settings(max_examples=100, deadline=None)
@given(st.lists(ROW, min_size=0, max_size=20))
def test_arrow_decode_matches_row_codec(rows):
    """The vectorized Arrow decode must produce value-identical typed rows
    to CsvCodec.parse_line over the full six-type wire surface."""
    from datafusion_nats_spark.codec import decode_payloads_arrow

    codec = CsvCodec(SCHEMA)
    payloads = [",".join(_encode_value(v) for v in row).encode() for row in rows]
    batches = decode_payloads_arrow(payloads, SCHEMA)
    got = [
        tuple(rec[f.name] for f in SCHEMA.fields)
        for b in batches
        for rec in b.to_pylist()
    ]
    want = [codec.parse_line(p.decode()) for p in payloads]
    assert got == want


def test_arrow_decode_error_parity():
    """Malformed wire lines must raise ParseError from the Arrow path in
    every case the row codec raises: empty value (incl. string columns),
    arity mismatch, bad boolean, bad timestamp — plus the arrow-specific
    embedded-newline guard."""
    import pytest

    from datafusion_nats_spark.codec import decode_payloads_arrow

    two = T.StructType(
        [T.StructField("a", T.IntegerType(), False), T.StructField("s", T.StringType(), False)]
    )
    ok = decode_payloads_arrow([b"1,x", b"2,y"], two)
    assert [r for b in ok for r in b.to_pylist()] == [
        {"a": 1, "s": "x"},
        {"a": 2, "s": "y"},
    ]
    for bad in [b"1", b"1,x,z", b",x", b"1,", b"zz,x"]:
        with pytest.raises(ParseError):
            decode_payloads_arrow([b"1,x", bad], two)
    with pytest.raises(ParseError):  # embedded newline: 1 payload, 2 CSV rows
        decode_payloads_arrow([b"1,x\n2,y"], two)
    boo = T.StructType([T.StructField("b", T.BooleanType(), False)])
    assert [r["b"] for b in decode_payloads_arrow([b"TRUE", b"0"], boo) for r in b.to_pylist()] == [True, False]
    with pytest.raises(ParseError):
        decode_payloads_arrow([b"maybe"], boo)
    ts = T.StructType([T.StructField("t", T.TimestampType(), False)])
    with pytest.raises(ParseError):
        decode_payloads_arrow([b"2024-13-99 99:00:00"], ts)
    assert decode_payloads_arrow([], two) == []


def test_arrow_decode_preserves_whitespace_in_strings():
    """No silent trimming: the wire has no quoting, so spaces are data."""
    from datafusion_nats_spark.codec import decode_payloads_arrow

    s = T.StructType([T.StructField("s", T.StringType(), False)])
    got = [r["s"] for b in decode_payloads_arrow([b" a b "], s) for r in b.to_pylist()]
    assert got == [" a b "]
    assert CsvCodec(s).parse_line(" a b ") == (" a b ",)


def test_arrow_decode_rejects_line_endings_up_front():
    """A trailing \\n on the LAST payload and a lone \\r must be loud
    ParseErrors, never silently stripped by arrow's CSV line handling
    (the post-hoc row-count check misses both)."""
    import pytest

    from datafusion_nats_spark.codec import decode_payloads_arrow

    two = T.StructType(
        [T.StructField("a", T.IntegerType(), False), T.StructField("s", T.StringType(), False)]
    )
    for bad in [b"1,x\n", b"1,x\r", b"1,x\r\n", b"1,x\ry", b"\n", b"1,x\n2,y"]:
        with pytest.raises(ParseError, match="line ending|forbids"):
            decode_payloads_arrow([bad], two)
        with pytest.raises(ParseError):
            decode_payloads_arrow([b"2,ok", bad], two)


def test_strict_wire_grammar_parity_all_paths():
    """Exotic encodings Python's int()/float()/strptime would accept but
    the wire grammar forbids must be rejected by BOTH decode paths:
    underscores in numbers, whitespace padding, malformed temporal
    shapes, out-of-Int32-range integers. Reference-parity forms the
    grammar ACCEPTS (csv.rs parses with f64::from_str and chrono):
    inf/infinity/nan any case with optional sign, and non-zero-padded
    month/day/hour/minute/second — pinned value-identical across paths
    below."""
    import pytest

    from datafusion_nats_spark.codec import decode_payloads_arrow

    cases = [
        (T.IntegerType(), ["1_0", " 5", "5 ", "+ 1", "0x10", "2147483648", "-2147483649", "99999999999999999999"]),
        (T.DoubleType(), ["1_0.5", " 1.5", "1,5", "1.5d", "infi", "na", "+-inf", "nan2"]),
        # day-of-month overflow and leap-second ':60' are the values
        # pc.strptime silently NORMALIZES ('2024-02-30' → 2024-03-01,
        # ':60' → next minute) — the arrow path must reject them like the
        # row path does (ADVICE round 5: calendar round-trip check)
        (T.TimestampType(), ["2024-01-02T03:04:05", "2024-011-02 03:04:05", "24-01-02 03:04:05", "2024-1-2  3:4:5",
                             "2024-02-30 00:00:00", "2024-2-30 00:00:00", "2024-01-02 03:04:60", "2023-02-29 00:00:00", "2024-04-31 12:00:00"]),
        (T.DateType(), ["2024/01/02", "20240102", "24-1-2", "2024-001-2",
                        "2024-02-30", "2024-2-30", "2023-02-29", "2024-04-31"]),
    ]
    for dtype, values in cases:
        schema = T.StructType([T.StructField("x", dtype, False)])
        codec = CsvCodec(schema)
        for v in values:
            with pytest.raises(ParseError):
                codec.parse_line(v)
            with pytest.raises(ParseError):
                decode_payloads_arrow([v.encode()], schema)
    # Int32 boundary values themselves are valid on both paths, and so
    # are arbitrarily zero-padded in-range values (Rust i32::from_str
    # accepts leading zeros — the reference wire semantics)
    edge = T.StructType([T.StructField("x", T.IntegerType(), False)])
    valid = [b"2147483647", b"-2147483648", b"000000000000042", b"-000000000000042", b"+0000000000000", b"0"]
    want = [2147483647, -2147483648, 42, -42, 0, 0]
    assert [CsvCodec(edge).parse_line(v.decode())[0] for v in valid] == want
    got = [r["x"] for b in decode_payloads_arrow(valid, edge) for r in b.to_pylist()]
    assert got == want
    # zero-padded OUT-of-range still rejected by both
    for v in ["0002147483648", "-09999999999"]:
        with pytest.raises(ParseError):
            CsvCodec(edge).parse_line(v)
        with pytest.raises(ParseError):
            decode_payloads_arrow([v.encode()], edge)
    # reference-contract special floats: accepted AND value-identical on
    # the row and arrow paths (Rust f64::from_str semantics)
    import datetime
    import math

    dbl = T.StructType([T.StructField("x", T.DoubleType(), False)])
    specials = ["inf", "-INF", "+Infinity", "INFINITY", "nan", "-NaN", "+nan"]
    row_vals = [CsvCodec(dbl).parse_line(v)[0] for v in specials]
    arrow_vals = [
        r["x"]
        for b in decode_payloads_arrow([v.encode() for v in specials], dbl)
        for r in b.to_pylist()
    ]
    for v, rv, av in zip(specials, row_vals, arrow_vals):
        if "nan" in v.lower():
            assert math.isnan(rv) and math.isnan(av), v
        else:
            assert rv == av == float(v), v
    # chrono-parity non-padded temporals: accepted, identical values
    ts = T.StructType([T.StructField("t", T.TimestampType(), False)])
    want_ts = datetime.datetime(2024, 1, 2, 3, 4, 5)
    assert CsvCodec(ts).parse_line("2024-1-2 3:4:5")[0] == want_ts
    got_ts = [
        r["t"]
        for b in decode_payloads_arrow([b"2024-1-2 3:4:5"], ts)
        for r in b.to_pylist()
    ]
    assert got_ts == [want_ts]
    dt = T.StructType([T.StructField("d", T.DateType(), False)])
    assert CsvCodec(dt).parse_line("2024-1-2")[0] == datetime.date(2024, 1, 2)
    got_d = [
        r["d"]
        for b in decode_payloads_arrow([b"2024-1-2"], dt)
        for r in b.to_pylist()
    ]
    assert got_d == [datetime.date(2024, 1, 2)]
    # real leap-day stays VALID on both paths (the calendar round-trip
    # check must not over-reject), padded and chrono-non-padded alike
    leap = datetime.date(2024, 2, 29)
    for wire in (b"2024-02-29", b"2024-2-29"):
        assert CsvCodec(dt).parse_line(wire.decode())[0] == leap
        assert [
            r["d"] for b in decode_payloads_arrow([wire], dt) for r in b.to_pylist()
        ] == [leap]
    leap_ts = datetime.datetime(2024, 2, 29, 3, 4, 5)
    assert CsvCodec(ts).parse_line("2024-2-29 3:4:5")[0] == leap_ts
    assert [
        r["t"]
        for b in decode_payloads_arrow([b"2024-2-29 3:4:5"], ts)
        for r in b.to_pylist()
    ] == [leap_ts]


def test_arrow_decode_indexed_permissive_and_dlq():
    """The indexed variant returns exactly the surviving payload indices;
    dlq mode hands every malformed payload (structural, arity, value) to
    the on_invalid hook."""
    from datafusion_nats_spark.codec import decode_payloads_arrow_indexed

    two = T.StructType(
        [T.StructField("a", T.IntegerType(), False), T.StructField("s", T.StringType(), False)]
    )
    payloads = [b"1,x", b"bad", b"2,y", b"z,zz", b"3,w\n", b"4,ok", b"5,"]
    table, idx = decode_payloads_arrow_indexed(payloads, two, mode="permissive-skip")
    assert idx == [0, 2, 5]
    assert table.to_pylist() == [
        {"a": 1, "s": "x"},
        {"a": 2, "s": "y"},
        {"a": 4, "s": "ok"},
    ]
    dead: list[bytes] = []
    table, idx = decode_payloads_arrow_indexed(payloads, two, mode="dlq", on_invalid=dead.append)
    assert idx == [0, 2, 5]
    assert sorted(dead) == sorted([b"bad", b"z,zz", b"3,w\n", b"5,"])
    # all-invalid and empty inputs return a typed empty table
    table, idx = decode_payloads_arrow_indexed([b"bad"], two, mode="permissive-skip")
    assert table.num_rows == 0 and idx == []
    table, idx = decode_payloads_arrow_indexed([], two, mode="permissive-skip")
    assert table.num_rows == 0 and idx == []


@settings(max_examples=60, deadline=None)
@given(st.lists(st.one_of(ROW, st.sampled_from(["ARITY", "BADINT", "NEWLINE"])), max_size=15))
def test_arrow_permissive_matches_row_permissive(rows):
    """Differential: for a mixed stream of valid rows and malformed
    payloads, decode=arrow permissive-skip must keep EXACTLY the rows the
    row codec keeps, in order."""
    from datafusion_nats_spark.codec import decode_payloads_arrow

    payloads = []
    for r in rows:
        if r == "ARITY":
            payloads.append(b"only-one-field")
        elif r == "BADINT":
            payloads.append(b"x_y,1.0,true,s,2024-01-01 00:00:00,2024-01-01")
        elif r == "NEWLINE":
            payloads.append(b"1,1.0,true,s\nt,2024-01-01 00:00:00,2024-01-01")
        else:
            payloads.append(",".join(_encode_value(v) for v in r).encode())
    codec = CsvCodec(SCHEMA)
    want = []
    for p in payloads:
        try:
            want.append(codec.parse_line(p.decode()))
        except ParseError:
            continue
    batches = decode_payloads_arrow(payloads, SCHEMA, mode="permissive-skip")
    got = [
        tuple(rec[f.name] for f in SCHEMA.fields)
        for b in batches
        for rec in b.to_pylist()
    ]
    assert got == want


def test_arrow_trailing_empty_payload_not_lost():
    """Self-review regression: an EMPTY payload in the LAST position used
    to silently vanish from the arrow decode (the joined buffer's trailing
    newline reads as a terminator, not an empty row), desyncing the
    kept-index bookkeeping. It must behave exactly like the row codec:
    arity error on multi-column schemas, empty-value error on
    single-column ones — loudly in failfast, routed in permissive/dlq."""
    import pytest

    from datafusion_nats_spark.codec import decode_payloads_arrow_indexed

    two = T.StructType(
        [T.StructField("a", T.IntegerType(), False), T.StructField("s", T.StringType(), False)]
    )
    with pytest.raises(ParseError):
        decode_payloads_arrow_indexed([b"1,x", b""], two, mode="failfast")
    table, idx = decode_payloads_arrow_indexed([b"1,x", b""], two, mode="permissive-skip")
    assert idx == [0] and table.to_pylist() == [{"a": 1, "s": "x"}]
    dead: list[bytes] = []
    table, idx = decode_payloads_arrow_indexed(
        [b"1,x", b""], two, mode="dlq", on_invalid=dead.append
    )
    assert idx == [0] and dead == [b""]
    # metadata zip stays aligned: the indexed contract is the invariant
    # _read_arrow_with_metadata builds its _subject/_offset columns on
    one = T.StructType([T.StructField("s", T.StringType(), False)])
    with pytest.raises(ParseError, match="empty value"):
        decode_payloads_arrow_indexed([b"a", b""], one, mode="failfast")
    table, idx = decode_payloads_arrow_indexed([b"a", b""], one, mode="permissive-skip")
    assert idx == [0] and table.to_pylist() == [{"s": "a"}]
    # all-empty input, multi- and single-column
    table, idx = decode_payloads_arrow_indexed([b"", b""], two, mode="permissive-skip")
    assert table.num_rows == 0 and idx == []


def test_arrow_invalid_utf8_lossy_keep_parity():
    """Self-review regression: one invalid-UTF-8 payload used to abort the
    ENTIRE arrow batch in every mode. The row codec lossily decodes with
    errors='replace' and KEEPS the row (executor.rs:109 parity) — the
    arrow path must do the same, in all three modes, without affecting
    neighboring payloads."""
    from datafusion_nats_spark.codec import CsvCodec, decode_payloads_arrow_indexed

    two = T.StructType(
        [T.StructField("a", T.IntegerType(), False), T.StructField("s", T.StringType(), False)]
    )
    payloads = [b"1,ok", b"2,\xff\xfe", b"3,fine"]
    want = [CsvCodec(two).parse_line(p.decode("utf-8", errors="replace")) for p in payloads]
    for mode in ("failfast", "permissive-skip", "dlq"):
        dead: list[bytes] = []
        table, idx = decode_payloads_arrow_indexed(
            payloads, two, mode=mode, on_invalid=dead.append
        )
        assert idx == [0, 1, 2] and dead == []
        got = [(r["a"], r["s"]) for r in table.to_pylist()]
        assert got == want, mode
    assert want[1] == (2, "��")
    # corrupt bytes in a TYPED field: replacement chars fail the strict
    # grammar, so the row is malformed on both paths (not a crash)
    bad_int = [b"1,ok", b"\xff,x"]
    table, idx = decode_payloads_arrow_indexed(bad_int, two, mode="permissive-skip")
    assert idx == [0]


def test_unicode_digit_rejection_parity():
    """Self-review regression: Python's \\d matches Unicode digits, so the
    row path accepted numbers ('٤٢' == 42) the arrow (RE2) and JVM rlike
    paths reject. re.ASCII pins all paths to ASCII digits."""
    import pytest

    from datafusion_nats_spark.codec import CsvCodec, decode_payloads_arrow

    cases = [
        (T.IntegerType(), "٤٢"),          # Arabic-Indic 42
        (T.IntegerType(), "４２"),          # fullwidth 42
        (T.DoubleType(), "١.٥"),          # Arabic-Indic 1.5
        (T.TimestampType(), "٢٠٢٤-01-02 03:04:05"),
        (T.DateType(), "٢٠٢٤-01-02"),
    ]
    for dtype, v in cases:
        schema = T.StructType([T.StructField("x", dtype, False)])
        with pytest.raises(ParseError):
            CsvCodec(schema).parse_line(v)
        with pytest.raises(ParseError):
            decode_payloads_arrow([v.encode()], schema)


def test_year_zero_temporal_rejection_parity():
    """Self-review regression: arrow strptime accepts proleptic year 0
    ('0000-01-01'), which Python's datetime (MINYEAR == 1) rejects — the
    arrow path must reject it too, on both temporal types."""
    import pytest

    from datafusion_nats_spark.codec import CsvCodec, decode_payloads_arrow

    for dtype, v in [
        (T.TimestampType(), "0000-01-01 00:00:00"),
        (T.DateType(), "0000-01-01"),
    ]:
        schema = T.StructType([T.StructField("x", dtype, False)])
        with pytest.raises(ParseError):
            CsvCodec(schema).parse_line(v)
        with pytest.raises(ParseError):
            decode_payloads_arrow([v.encode()], schema)
        # year 1 is the shared minimum and valid on both paths
        ok = v.replace("0000", "0001")
        assert CsvCodec(schema).parse_line(ok)[0] is not None
        assert decode_payloads_arrow([ok.encode()], schema)
