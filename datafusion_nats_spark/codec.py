"""CSV wire codec — reference-exact semantics.

Reproduces the reference's `CsvCodec` (reference: src/codec/csv.rs):

- schema validation at construction: non-empty schema (csv.rs:53-55),
  non-empty field names (csv.rs:65-67), no duplicate names (csv.rs:70-72),
  supported types only (csv.rs:75-85);
- per-message validation: bare ``split(',')`` with **no quoting/escaping**
  (csv.rs:94), field count must equal schema arity (csv.rs:102-108),
  empty value = hard error, NOT null (csv.rs:116-121);
- exactly six supported types (csv.rs:75-85): Int32, Float64, Boolean,
  Utf8, Timestamp, Date32 → IntegerType, DoubleType, BooleanType,
  StringType, TimestampType, DateType;
- booleans accept case-insensitive ``true|1|false|0`` (csv.rs:145-147);
- timestamps parse ``%Y-%m-%d %H:%M:%S`` interpreted as UTC (csv.rs:162-164);
- dates parse ``%Y-%m-%d`` (csv.rs:175). Documented divergence (SURVEY
  §8.1): the reference stores days-since-0001-01-01 into an Arrow Date32
  (epoch 1970-01-01), shifting every date by +719,163 days; we implement
  the *correct* date semantics.

Three decode paths:

- :func:`parse_line` — row-at-a-time Python parse, used by the NATS source
  reader (the analogue of csv.rs:93-198 without the per-value 1-row-array
  allocation anti-pattern, SURVEY §8.9);
- :func:`decode_lines` — vectorized, JVM-side expression decode of a raw
  line column (split + strict casts), the 100 TB path: whole-stage codegen,
  no Python in the loop;
- :func:`decode_payloads_arrow` — vectorized TYPED decode at the source:
  pyarrow.csv parses the whole partition's payloads in C++ and the reader
  yields Arrow RecordBatches directly (``decode=arrow``), so neither
  per-row Python tuples nor a downstream JVM decode projection exist.
  Supports all three error modes: per-row verdicts come from vectorized
  validity masks (failfast raises on the first malformed message;
  permissive-skip drops it; dlq routes it via the ``on_invalid`` hook).
"""

from __future__ import annotations

import datetime
import re
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SUPPORTED_TYPES = (
    T.IntegerType,
    T.DoubleType,
    T.BooleanType,
    T.StringType,
    T.TimestampType,
    T.DateType,
)

_TRUE = {"true", "1"}
_FALSE = {"false", "0"}


class CodecError(ValueError):
    """Base class for codec failures (schema or parse)."""


class SchemaValidationError(CodecError):
    """Schema rejected at codec construction (reference: csv.rs:48-91)."""


class ParseError(CodecError):
    """A wire line failed to decode (reference: csv.rs:93-198)."""


def validate_schema(schema: T.StructType) -> None:
    """Reject schemas the reference codec rejects (csv.rs:48-91)."""
    if not isinstance(schema, T.StructType) or len(schema.fields) == 0:
        raise SchemaValidationError("schema must contain at least one field")
    seen: set[str] = set()
    for field in schema.fields:
        if not field.name:
            raise SchemaValidationError("field names must not be empty")
        if field.name in seen:
            raise SchemaValidationError(f"duplicate field name: {field.name!r}")
        seen.add(field.name)
        if not isinstance(field.dataType, SUPPORTED_TYPES):
            raise SchemaValidationError(
                f"unsupported type for field {field.name!r}: {field.dataType.simpleString()}"
            )


# Strict wire grammars — the same patterns gate all three decode paths
# (row, JVM rlike, arrow RE2), so they agree on exotic inputs: Python's
# int()/float() accept underscores ('1_0' -> 10), which is not valid on
# this wire. re.ASCII because Python \d otherwise matches Unicode digits
# (int('٤٢') == 42) that the RE2 (arrow) and JVM rlike paths reject.
#
# Reference-contract parity (codec/csv.rs:135 parses with
# f64::from_str, timestamps with chrono parse_from_str):
# - floats accept the Rust special forms inf/infinity/nan, any case,
#   optional sign — probed identical in Python float(), Spark's
#   string->double cast, and arrow's fast_float cast;
# - timestamp/date fields accept non-zero-padded month/day/hour/min/sec
#   ('2024-1-2 3:4:5'), like chrono's numeric specifiers — Python
#   strptime, Spark try_to_timestamp (default flexible parser), and
#   arrow strptime all accept them. Year stays exactly 4 digits (the
#   year-0 guard and PySpark's MINYEAR pin rely on a fixed prefix).
# (?i:...) scoped flags parse identically in Python re, Java regex, and
# RE2, so one pattern string serves all three engines.
_INT_RE = re.compile(r"^[+-]?\d+$", re.ASCII)
_FLOAT_RE = re.compile(
    r"^[+-]?((\d+\.?\d*|\.\d+)([eE][+-]?\d+)?|(?i:inf(?:inity)?|nan))$", re.ASCII
)
_TS_RE = re.compile(
    r"^\d{4}-\d{1,2}-\d{1,2} \d{1,2}:\d{1,2}:\d{1,2}$", re.ASCII
)
_DATE_RE = re.compile(r"^\d{4}-\d{1,2}-\d{1,2}$", re.ASCII)


def _parse_value(value: str, dtype: T.DataType, name: str) -> Any:
    if isinstance(dtype, T.IntegerType):
        if not _INT_RE.match(value):
            raise ParseError(f"invalid integer for field {name!r}: {value!r}")
        n = int(value)
        if not -(2**31) <= n < 2**31:  # Int32 wire type (csv.rs:75-85)
            raise ParseError(f"integer out of Int32 range for field {name!r}: {value!r}")
        return n
    if isinstance(dtype, T.DoubleType):
        if not _FLOAT_RE.match(value):
            raise ParseError(f"invalid float for field {name!r}: {value!r}")
        return float(value)
    if isinstance(dtype, T.BooleanType):
        low = value.lower()
        if low in _TRUE:
            return True
        if low in _FALSE:
            return False
        raise ParseError(f"invalid boolean for field {name!r}: {value!r}")
    if isinstance(dtype, T.TimestampType):
        if not _TS_RE.match(value):
            raise ParseError(f"invalid timestamp for field {name!r}: {value!r}")
        try:
            return datetime.datetime.strptime(value, "%Y-%m-%d %H:%M:%S")
        except ValueError as e:
            raise ParseError(f"invalid timestamp for field {name!r}: {value!r}") from e
    if isinstance(dtype, T.DateType):
        if not _DATE_RE.match(value):
            raise ParseError(f"invalid date for field {name!r}: {value!r}")
        try:
            return datetime.datetime.strptime(value, "%Y-%m-%d").date()
        except ValueError as e:
            raise ParseError(f"invalid date for field {name!r}: {value!r}") from e
    # StringType: any non-empty string (emptiness already rejected).
    return value


class CsvCodec:
    """Validated schema + line→row decoder (reference: csv.rs CsvCodec)."""

    def __init__(self, schema: T.StructType) -> None:
        validate_schema(schema)
        self.schema = schema

    def parse_line(self, line: str) -> tuple:
        """One wire line → one typed row tuple.

        Bare comma split, exact arity, empty value = error (not NULL) —
        reference: csv.rs:94, :102-108, :116-121. Embedded line endings
        are out of contract for the line-based wire (one message = one
        line), rejected identically by every decode path.
        """
        if "\n" in line or "\r" in line:
            raise ParseError(
                "payload embeds a line ending (\\n/\\r), which the line-based wire forbids"
            )
        values = line.split(",")
        if len(values) != len(self.schema.fields):
            raise ParseError(
                f"field count {len(values)} does not match schema arity "
                f"{len(self.schema.fields)}"
            )
        out = []
        for value, field in zip(values, self.schema.fields):
            if value == "":
                raise ParseError(f"empty value for field {field.name!r}")
            out.append(_parse_value(value, field.dataType, field.name))
        return tuple(out)


def _decode_expr(raw: Column, dtype: T.DataType) -> Column:
    """Strict decode of one CSV field as a JVM-side expression.

    Returns NULL on malformed input; callers choose strict (fail/quarantine)
    or permissive-skip handling. Mirrors _parse_value semantics exactly.
    """
    if isinstance(dtype, T.IntegerType):
        # reject floats: int parse must consume the whole token
        return F.when(raw.rlike(r"^[+-]?\d+$"), raw.cast("int")).otherwise(F.lit(None))
    if isinstance(dtype, T.DoubleType):
        # numeric shapes go through the cast; the Rust special forms map
        # to explicit literals because Spark's cast accepts "NaN"/"-NaN"
        # but REJECTS "+nan" (probed) — the other two paths (Python
        # float(), arrow fast_float) accept all signed forms
        low = F.lower(raw)
        return (
            F.when(
                raw.rlike(r"^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$"),
                raw.cast("double"),
            )
            .when(low.isin("nan", "+nan", "-nan"), F.lit(float("nan")))
            .when(
                low.isin("inf", "+inf", "infinity", "+infinity"),
                F.lit(float("inf")),
            )
            .when(low.isin("-inf", "-infinity"), F.lit(float("-inf")))
            .otherwise(F.lit(None))
        )
    if isinstance(dtype, T.BooleanType):
        low = F.lower(raw)
        return (
            F.when(low.isin("true", "1"), F.lit(True))
            .when(low.isin("false", "0"), F.lit(False))
            .otherwise(F.lit(None))
        )
    if isinstance(dtype, T.TimestampType):
        # shape-pin like the other paths, and reject proleptic year 0:
        # Spark's try_to_timestamp accepts '0000-…' but Python's datetime
        # (MINYEAR == 1) does not — and collecting such a row crashes
        # PySpark's deserializer ('ordinal must be >= 1')
        # formatless try_to_timestamp = Spark's flexible stringToTimestamp,
        # which (like chrono on the reference side) accepts non-padded
        # segments; _TS_RE still pins the overall shape
        return F.when(
            raw.rlike(_TS_RE.pattern) & ~raw.startswith("0000-"),
            F.try_to_timestamp(raw),
        ).otherwise(F.lit(None).cast("timestamp"))
    if isinstance(dtype, T.DateType):
        # try_to_date, NOT to_date: under ANSI mode (Spark 4 default)
        # to_date THROWS on shaped-but-non-calendar values ('2024-2-30',
        # day-of-month overflow) instead of nulling the row out like the
        # row/arrow paths do (ADVICE round 5 parity class)
        return F.when(
            raw.rlike(_DATE_RE.pattern) & ~raw.startswith("0000-"),
            F.try_to_date(raw),
        ).otherwise(F.lit(None))
    return raw  # StringType


def decode_lines(
    df: DataFrame,
    schema: T.StructType,
    line_col: str = "value",
    mode: str = "permissive-skip",
) -> DataFrame:
    """Vectorized decode of a raw CSV-line column into typed columns.

    The scale path (SURVEY §7.4-5): pure built-in expressions — split,
    regex-validated casts, try_to_timestamp — so decode stays inside
    whole-stage codegen; no Python per row.

    mode="permissive-skip": rows violating reference semantics (wrong
    arity, empty field, bad parse) are dropped (reference analogue: parse
    errors are surfaced but the stream continues, executor.rs:140-145).
    mode="marked": adds a boolean ``_corrupt`` column instead of dropping —
    feed a DLQ sink from it.
    """
    validate_schema(schema)
    if mode not in ("permissive-skip", "marked"):
        raise ValueError(f"unknown mode: {mode}")

    n = len(schema.fields)
    parts = F.split(F.col(line_col), ",", -1)
    arity_ok = F.size(parts) == F.lit(n)
    no_empty = F.lit(True)
    for i in range(n):
        no_empty = no_empty & (F.element_at(parts, i + 1) != F.lit(""))

    decoded = [
        _decode_expr(F.element_at(parts, i + 1), field.dataType).alias(field.name)
        for i, field in enumerate(schema.fields)
    ]
    # OR-reduce, not F.greatest(*flags): greatest demands >= 2 columns,
    # so a single-field schema used to crash here
    any_null = F.lit(False)
    for f in schema.fields:
        any_null = any_null | F.col(f.name).isNull()
    out = df.select(F.col(line_col), *decoded).withColumn(
        "_corrupt",
        ~(
            F.coalesce(arity_ok, F.lit(False))
            & F.coalesce(no_empty, F.lit(False))
            & F.lit(True)
        )
        | any_null,
    )
    if mode == "permissive-skip":
        return out.filter(~F.col("_corrupt")).select(*[f.name for f in schema.fields])
    return out.select(*[f.name for f in schema.fields], "_corrupt")


def _arrow_type(dtype: T.DataType):
    import pyarrow as pa

    if isinstance(dtype, T.IntegerType):
        return pa.int32()
    if isinstance(dtype, T.DoubleType):
        return pa.float64()
    if isinstance(dtype, T.BooleanType):
        return pa.bool_()
    if isinstance(dtype, T.TimestampType):
        return pa.timestamp("us")
    if isinstance(dtype, T.DateType):
        return pa.date32()
    return pa.string()


def _calendar_fields_match(clean, out, with_time: bool):
    """True where the parsed temporal ``out`` reproduces exactly the digits
    written in the wire string ``clean`` (nulls → False).

    pc.strptime follows mktime-style normalization for two classes the
    shape regexes can't catch: day-of-month overflow ('2024-02-30' →
    2024-03-01, also non-padded '2024-2-30') and leap-second ':60' (→ the
    next minute). The row path (Python strptime) raises ValueError and the
    JVM path (try_to_timestamp) yields NULL for both, so the arrow path
    must compare every written field against the parsed value instead of
    trusting strptime's validity (ADVICE round 5). Non-padded digits are
    handled by extracting the fields numerically rather than
    round-tripping through strftime's zero-padded text.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    if with_time:
        pat = (
            r"^(?P<y>\d{4})-(?P<mo>\d{1,2})-(?P<d>\d{1,2})"
            r" (?P<h>\d{1,2}):(?P<mi>\d{1,2}):(?P<s>\d{1,2})$"
        )
        fields = [
            ("y", pc.year),
            ("mo", pc.month),
            ("d", pc.day),
            ("h", pc.hour),
            ("mi", pc.minute),
            ("s", pc.second),
        ]
    else:
        pat = r"^(?P<y>\d{4})-(?P<mo>\d{1,2})-(?P<d>\d{1,2})$"
        fields = [("y", pc.year), ("mo", pc.month), ("d", pc.day)]
    groups = pc.extract_regex(clean, pattern=pat)
    ok = None
    for name, extractor in fields:
        written = pc.struct_field(groups, name).cast(pa.int64())
        parsed = extractor(out).cast(pa.int64())
        eq = pc.equal(written, parsed)
        ok = eq if ok is None else pc.and_(ok, eq)
    return pc.fill_null(ok, False)


def decode_payloads_arrow_indexed(
    payloads: list[bytes],
    schema: T.StructType,
    mode: str = "failfast",
    on_invalid=None,
):
    """Vectorized typed decode with per-payload verdicts: payload lines →
    (pyarrow.Table of the VALID rows, list of valid payload indices).

    Semantics mirror :meth:`CsvCodec.parse_line` exactly (bare comma
    split, no quoting, exact arity, empty value = error-not-NULL, strict
    numeric/temporal grammars — the same regexes as ``_parse_value`` /
    ``decode_lines``, ``true|1|false|0`` booleans) but the hot loop is
    pyarrow's C++ CSV reader plus pyarrow.compute kernels — no Python per
    row. A payload containing ``\\n`` or ``\\r`` is rejected up front:
    the line-based wire forbids embedded line endings, and arrow's CSV
    reader would otherwise silently split/strip them (a trailing ``\\n``
    must be a loud error, not a silent trim).

    Error modes (the same three as the row path, reference A10):

    - ``failfast`` — raise :class:`ParseError` on the first malformed
      message;
    - ``permissive-skip`` — malformed payloads are dropped (their indices
      are simply absent from the returned index list);
    - ``dlq`` — like permissive-skip, but ``on_invalid(payload)`` is
      called for every malformed payload so the caller can re-publish it
      to a dead-letter subject.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.csv as pacsv

    validate_schema(schema)
    if mode not in ("failfast", "permissive-skip", "dlq"):
        raise CodecError(f"unknown mode: {mode}")
    names = [f.name for f in schema.fields]
    empty = pa.table(
        {f.name: pa.array([], type=_arrow_type(f.dataType)) for f in schema.fields}
    )
    if not payloads:
        return empty, []

    def _invalid(i: int, msg: str):
        if mode == "failfast":
            raise ParseError(msg)
        if on_invalid is not None:
            on_invalid(payloads[i])

    # 1. line-structure gate: one message = one line, so \n/\r inside a
    # payload is out of contract (not merely "decodes to extra rows")
    kept: list[int] = []
    for i, p in enumerate(payloads):
        if b"\n" in p or b"\r" in p:
            _invalid(i, "payload embeds a line ending (\\n/\\r), which the line-based wire forbids")
        else:
            kept.append(i)
    if not kept:
        return empty, []

    # 2. arity gate: parse everything as strings; rows with the wrong
    # field count are diverted to the invalid-row handler
    n_skipped = 0

    def _skip_row(row):
        nonlocal n_skipped
        n_skipped += 1
        return "skip"

    def _read(chunks: list[bytes]):
        # terminal b"" sentinel: a trailing newline is a no-op terminator
        # after a non-empty last line, but WITHOUT it an empty last
        # payload would vanish (the reader treats the final "\n" as the
        # previous line's terminator, not an empty row)
        return pacsv.read_csv(
            pa.BufferReader(b"\n".join([*chunks, b""])),
            read_options=pacsv.ReadOptions(column_names=names),
            parse_options=pacsv.ParseOptions(
                delimiter=",",
                quote_char=False,
                escape_char=False,
                ignore_empty_lines=False,
                invalid_row_handler=_skip_row,
            ),
            convert_options=pacsv.ConvertOptions(
                column_types={n: pa.string() for n in names},
                null_values=[],  # "" is never NULL on this wire
                strings_can_be_null=False,
            ),
        ).combine_chunks()

    try:
        table = _read([payloads[i] for i in kept])
    except pa.ArrowInvalid as e:
        if "UTF8" not in str(e):
            raise ParseError(f"arrow decode failed: {e}") from e
        # invalid UTF-8: the row path lossily decodes and KEEPS the row
        # (executor.rs:109 parity — errors="replace"); mirror that here
        # by repairing the offending payloads and retrying once. Paid
        # only on the rare corrupt-bytes path; the clean path stays a
        # single zero-copy read.
        n_skipped = 0
        repaired = [
            payloads[i].decode("utf-8", errors="replace").encode("utf-8")
            for i in kept
        ]
        try:
            table = _read(repaired)
        except pa.ArrowInvalid as e2:  # pragma: no cover - repair is total
            raise ParseError(f"arrow decode failed: {e2}") from e2
    if not n_skipped and table.num_rows != len(kept):  # pragma: no cover
        raise ParseError(
            f"{len(kept)} payloads decoded to {table.num_rows} rows"
        )
    if n_skipped:
        # map surviving rows back to payload indices: with no quoting the
        # comma count alone determines arity (C-level bytes.count — only
        # paid on the rare wrong-arity path)
        want = len(names) - 1
        good, bad = [], []
        for i in kept:
            (good if payloads[i].count(b",") == want else bad).append(i)
        for i in bad:
            _invalid(
                i,
                f"field count {payloads[i].count(b',') + 1} does not match "
                f"schema arity {len(names)}",
            )
        kept = good
        if table.num_rows != len(kept):  # pragma: no cover - paranoia guard
            raise ParseError(
                f"{len(kept)} arity-valid payloads decoded to {table.num_rows} rows"
            )
    if not kept:
        return empty, []

    # 3. per-field typed conversion with validity masks (all compute
    # kernels; the strict grammars are the row codec's regexes)
    row_ok = None
    cols = []
    for f in schema.fields:
        col = table.column(f.name)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        nonempty = pc.not_equal(col, "")
        if mode == "failfast" and not pc.all(nonempty).as_py():
            raise ParseError(f"empty value for field {f.name!r}")
        valid = nonempty
        if isinstance(f.dataType, T.IntegerType):
            shaped = pc.match_substring_regex(col, _INT_RE.pattern)
            # bound SIGNIFICANT digits (sign and leading zeros stripped —
            # '000000000042' is valid Int32 wire, as in Rust's
            # i32::from_str) so the int64 cast below can't overflow-abort
            signif = pc.utf8_length(pc.utf8_ltrim(col, "+-0"))
            shaped = pc.and_(shaped, pc.less_equal(signif, 10))
            # arrow's string->int cast rejects a leading '+' (valid on the
            # wire, i32::from_str accepts it) — strip it before casting
            no_plus = pc.replace_substring_regex(col, r"^\+", "")
            as64 = pc.if_else(shaped, no_plus, pa.scalar(None, pa.string())).cast(pa.int64())
            in_range = pc.and_(
                pc.greater_equal(as64, pa.scalar(-(2**31), pa.int64())),
                pc.less(as64, pa.scalar(2**31, pa.int64())),
            )
            shaped = pc.and_(shaped, pc.fill_null(in_range, False))
            if mode == "failfast" and not pc.all(shaped).as_py():
                raise ParseError(f"invalid integer for field {f.name!r}")
            valid = pc.and_(valid, shaped)
            out = pc.if_else(pc.fill_null(in_range, False), as64, pa.scalar(None, pa.int64())).cast(pa.int32())
        elif isinstance(f.dataType, T.DoubleType):
            shaped = pc.match_substring_regex(col, _FLOAT_RE.pattern)
            if mode == "failfast" and not pc.all(shaped).as_py():
                raise ParseError(f"invalid float for field {f.name!r}")
            valid = pc.and_(valid, shaped)
            out = pc.if_else(shaped, col, pa.scalar(None, pa.string())).cast(pa.float64())
        elif isinstance(f.dataType, T.BooleanType):
            low = pc.utf8_lower(col)
            is_true = pc.is_in(low, value_set=pa.array(["true", "1"]))
            is_false = pc.is_in(low, value_set=pa.array(["false", "0"]))
            shaped = pc.or_(is_true, is_false)
            if mode == "failfast" and not pc.all(shaped).as_py():
                raise ParseError(f"invalid boolean for field {f.name!r}")
            valid = pc.and_(valid, shaped)
            out = is_true
        elif isinstance(f.dataType, T.TimestampType):
            shaped = pc.match_substring_regex(col, _TS_RE.pattern)
            # arrow strptime accepts proleptic year 0; Python's datetime
            # (row path) starts at MINYEAR == 1 — reject '0000-…' so both
            # paths agree (the regex already pins the year to 4 digits)
            shaped = pc.and_(
                shaped, pc.invert(pc.starts_with(col, "0000-"))
            )
            clean = pc.if_else(shaped, col, pa.scalar(None, pa.string()))
            out = pc.strptime(clean, format="%Y-%m-%d %H:%M:%S", unit="us", error_is_null=True)
            # regex-shaped but non-calendar values null out here (month 13,
            # hour 24) — EXCEPT day-of-month overflow ('2024-02-30' →
            # 2024-03-01) and leap-second ':60' (→ next minute), which
            # pc.strptime silently *normalizes*. The row path (Python
            # strptime raises) and the JVM path (try_to_timestamp → NULL)
            # both mark those rows corrupt, so reject any parse whose
            # calendar fields differ from the written digits.
            shaped = pc.and_(shaped, out.is_valid())
            shaped = pc.and_(
                shaped, _calendar_fields_match(clean, out, with_time=True)
            )
            if mode == "failfast" and not pc.all(shaped).as_py():
                raise ParseError(f"invalid timestamp for field {f.name!r}")
            valid = pc.and_(valid, shaped)
        elif isinstance(f.dataType, T.DateType):
            shaped = pc.match_substring_regex(col, _DATE_RE.pattern)
            shaped = pc.and_(
                shaped, pc.invert(pc.starts_with(col, "0000-"))
            )  # year-0 parity with the row path, as above
            clean = pc.if_else(shaped, col, pa.scalar(None, pa.string()))
            out = pc.strptime(clean, format="%Y-%m-%d", unit="s", error_is_null=True)
            shaped = pc.and_(shaped, out.is_valid())
            # day-overflow parity with the row/JVM paths, as above
            shaped = pc.and_(
                shaped, _calendar_fields_match(clean, out, with_time=False)
            )
            if mode == "failfast" and not pc.all(shaped).as_py():
                raise ParseError(f"invalid date for field {f.name!r}")
            valid = pc.and_(valid, shaped)
            out = out.cast(pa.date32())
        else:  # StringType
            out = col
        cols.append(out)
        row_ok = valid if row_ok is None else pc.and_(row_ok, valid)

    typed = pa.table(cols, names=names)
    if pc.all(row_ok).as_py():
        return typed, kept
    # permissive-skip / dlq: keep valid rows, route the rest
    mask = row_ok.to_pylist()
    for j, ok in enumerate(mask):
        if not ok:
            _invalid(kept[j], "malformed message")
    return typed.filter(row_ok), [i for j, i in enumerate(kept) if mask[j]]


def decode_payloads_arrow(
    payloads: list[bytes],
    schema: T.StructType,
    mode: str = "failfast",
    on_invalid=None,
):
    """Vectorized typed decode: payload lines → Arrow RecordBatches (the
    batch-iterator facade over :func:`decode_payloads_arrow_indexed`;
    empty list for no payloads / no valid rows). Pinned against the row
    codec by a hypothesis differential test."""
    table, _ = decode_payloads_arrow_indexed(payloads, schema, mode, on_invalid)
    if table.num_rows == 0:
        return []
    return table.to_batches()


def _infer_value_type(value: str) -> T.DataType:
    """Narrowest wire type of one CSV field value.

    Ordering note: ``0``/``1`` are valid wire booleans (csv.rs:145-147)
    but infer as Int32 — integers are the more general reading; explicit
    ``true``/``false`` infer as Boolean.
    """
    if value == "":
        return T.StringType()
    if value.lower() in ("true", "false"):
        return T.BooleanType()
    try:
        n = int(value)
        if -(2**31) <= n < 2**31:
            return T.IntegerType()
        return T.DoubleType()
    except ValueError:
        pass
    try:
        float(value)
        return T.DoubleType()
    except ValueError:
        pass
    try:
        datetime.datetime.strptime(value, "%Y-%m-%d %H:%M:%S")
        return T.TimestampType()
    except ValueError:
        pass
    try:
        datetime.datetime.strptime(value, "%Y-%m-%d")
        return T.DateType()
    except ValueError:
        pass
    return T.StringType()


def _merge_types(a: T.DataType, b: T.DataType) -> T.DataType:
    if a == b:
        return a
    pair = {type(a), type(b)}
    if pair == {T.IntegerType, T.DoubleType}:
        return T.DoubleType()
    if pair == {T.TimestampType, T.DateType}:
        return T.TimestampType()
    return T.StringType()


def infer_schema(payloads: list[bytes], names: list[str] | None = None) -> T.StructType:
    """Infer a wire schema from sample messages — completes the reference's
    unimplemented roadmap item (reference README.md:17, unchecked
    "Schema Inference/Configuration"; SURVEY §1.4).

    Every message must have the same arity (the wire format has no ragged
    rows); column types are the per-column merge of the narrowest wire
    type of each sampled value, falling back to Utf8 on conflict. Column
    names default to ``c0..cN-1`` (the wire format has no header line).
    """
    if not payloads:
        raise SchemaValidationError("cannot infer schema from an empty subject")
    rows = [p.decode("utf-8", errors="replace").split(",") for p in payloads]
    arity = len(rows[0])
    for i, r in enumerate(rows):
        if len(r) != arity:
            raise SchemaValidationError(
                f"inconsistent arity in sample: message 0 has {arity} fields, "
                f"message {i} has {len(r)}"
            )
    if names is not None and len(names) != arity:
        raise SchemaValidationError(
            f"{len(names)} column names supplied for {arity} columns"
        )
    types: list[T.DataType] = [T.StringType()] * arity
    for j in range(arity):
        col_types = [_infer_value_type(r[j]) for r in rows]
        merged = col_types[0]
        for t in col_types[1:]:
            merged = _merge_types(merged, t)
        types[j] = merged
    field_names = names if names is not None else [f"c{j}" for j in range(arity)]
    schema = T.StructType(
        [T.StructField(n, t, nullable=False) for n, t in zip(field_names, types)]
    )
    validate_schema(schema)
    return schema
