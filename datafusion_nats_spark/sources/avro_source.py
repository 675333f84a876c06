"""Avro read path: a pure-Python Avro Object Container File (OCF) source
on the PySpark Python Data Source API.

Closes the SURVEY §2B "Scans/sources" Avro gap: the reference inherits
``read_avro`` from its embedded engine (DataFusion 48 ships an Avro
reader on ``SessionContext``), while this environment has no spark-avro
module jar — so the reader is implemented from the public Avro 1.11 spec
(https://avro.apache.org/docs/1.11.1/specification/): OCF magic
``Obj\\x01``, metadata map (``avro.schema`` JSON + ``avro.codec``),
16-byte sync markers, and blocks of binary-encoded records (zigzag
varint ints/longs, little-endian IEEE floats, length-prefixed
bytes/strings, union-index-prefixed nullables). Codecs: ``null`` and
``deflate`` (raw zlib).

Supported schema shape: a top-level record of primitive fields
(null/boolean/int/long/float/double/bytes/string) and 2-branch
``[null, T]`` unions — the flat-row shape every other source here
speaks. Unsupported types fail loudly at schema-map time.

Scale design: one InputPartition per file (an Avro "split" cannot cross
a sync-marker boundary without scanning; per-file is the safe
parallelism unit, and at 100 TB Avro data arrives as many files).
Decoding happens executor-side inside ``read(partition)`` — the driver
touches only the file listing and the first file's embedded schema.
"""

from __future__ import annotations

import glob as _glob
import io
import json
import os
import struct
import zlib

from pyspark.sql import types as T
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

_MAGIC = b"Obj\x01"

_PRIMITIVE_TO_SPARK = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
}


# ---------------------------------------------------------------------------
# binary primitives (Avro spec §"Binary encoding")
# ---------------------------------------------------------------------------


def _read_varint(buf: io.BytesIO) -> int:
    """Unsigned base-128 varint -> zigzag-decoded signed long."""
    shift, acc = 0, 0
    while True:
        b = buf.read(1)
        if not b:
            raise EOFError("truncated varint")
        acc |= (b[0] & 0x7F) << shift
        if not b[0] & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_varint(out: io.BytesIO, v: int) -> None:
    n = (v << 1) ^ (v >> 63) if v < 0 else v << 1
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _read_value(buf: io.BytesIO, ftype) -> object:
    if isinstance(ftype, list):  # union — index-prefixed
        branch = ftype[_read_varint(buf)]
        return _read_value(buf, branch)
    if ftype == "null":
        return None
    if ftype == "boolean":
        b = buf.read(1)
        if not b:
            raise EOFError("truncated boolean")
        return b == b"\x01"
    if ftype in ("int", "long"):
        return _read_varint(buf)
    if ftype == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if ftype == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if ftype in ("bytes", "string"):
        n = _read_varint(buf)
        raw = buf.read(n)
        return raw.decode("utf-8") if ftype == "string" else raw
    raise ValueError(f"unsupported avro type: {ftype!r}")


def _write_value(out: io.BytesIO, ftype, v) -> None:
    if isinstance(ftype, list):
        ix = ftype.index("null") if v is None else 1 - ftype.index("null")
        _write_varint(out, ix)
        return _write_value(out, ftype[ix], v)
    if ftype == "null":
        return None
    if ftype == "boolean":
        out.write(b"\x01" if v else b"\x00")
    elif ftype in ("int", "long"):
        _write_varint(out, int(v))
    elif ftype == "float":
        out.write(struct.pack("<f", v))
    elif ftype == "double":
        out.write(struct.pack("<d", v))
    elif ftype in ("bytes", "string"):
        raw = v.encode("utf-8") if ftype == "string" else bytes(v)
        _write_varint(out, len(raw))
        out.write(raw)
    else:
        raise ValueError(f"unsupported avro type: {ftype!r}")


# ---------------------------------------------------------------------------
# OCF container
# ---------------------------------------------------------------------------


def _read_header(buf: io.BytesIO) -> tuple[dict, bytes, dict]:
    """-> (avro schema dict, sync marker, metadata)."""
    if buf.read(4) != _MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta: dict[str, bytes] = {}
    while True:
        count = _read_varint(buf)
        if count == 0:
            break
        if count < 0:  # negative count → block byte size follows
            _read_varint(buf)
            count = -count
        for _ in range(count):
            klen = _read_varint(buf)
            key = buf.read(klen).decode("utf-8")
            vlen = _read_varint(buf)
            meta[key] = buf.read(vlen)
    sync = buf.read(16)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    return schema, sync, meta


def read_avro_file(
    path: str,
    expect_fields: list[str] | None = None,
    expect_schema: T.StructType | None = None,
):
    """Yield one tuple per record, in record-field order (executor-side).

    Streams block-by-block from the open file handle — the OCF format is
    block-structured precisely so a reader never needs the whole file in
    memory (only one decompressed block at a time). ``expect_fields`` /
    ``expect_schema`` guard multi-file scans: each file's embedded field
    names (and, with ``expect_schema``, their mapped Spark types) must
    match the scan schema's order exactly, otherwise positionally-decoded
    values would land in the wrong columns — or the right column with a
    silently wrong type (long decoded where the scan schema says double)
    — without any loud failure.
    """
    with open(path, "rb") as f:
        schema, sync, meta = _read_header(f)
        names = [fld["name"] for fld in schema["fields"]]
        if expect_fields is not None and names != list(expect_fields):
            raise ValueError(
                f"avro schema drift in {path}: file fields {names} != "
                f"scan schema fields {list(expect_fields)}"
            )
        if expect_schema is not None:
            got = [(f.name, f.dataType) for f in avro_to_spark_schema(schema).fields]
            want = [(f.name, f.dataType) for f in expect_schema.fields]
            if got != want:
                raise ValueError(
                    f"avro schema drift in {path}: file schema {got} != "
                    f"scan schema {want}"
                )
        codec = meta.get("avro.codec", b"null").decode("utf-8")
        ftypes = [fld["type"] for fld in schema["fields"]]
        while True:
            head = f.read(1)
            if not head:
                break
            f.seek(-1, io.SEEK_CUR)
            n_records = _read_varint(f)
            n_bytes = _read_varint(f)
            block = f.read(n_bytes)
            if codec == "deflate":
                block = zlib.decompress(block, -15)  # raw deflate per spec
            elif codec != "null":
                raise ValueError(f"unsupported avro codec: {codec}")
            if f.read(16) != sync:
                raise ValueError("sync marker mismatch (corrupt block)")
            bbuf = io.BytesIO(block)
            for _ in range(n_records):
                yield tuple(_read_value(bbuf, t) for t in ftypes)


def write_avro_file(
    path: str, schema: dict, rows: list[tuple], codec: str = "null"
) -> None:
    """Test/fixture writer: one block, spec-compliant OCF."""
    body = io.BytesIO()
    ftypes = [fld["type"] for fld in schema["fields"]]
    for row in rows:
        for t, v in zip(ftypes, row):
            _write_value(body, t, v)
    data = body.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(wbits=-15)
        data = comp.compress(data) + comp.flush()
    sync = bytes(range(16))  # deterministic marker
    out = io.BytesIO()
    out.write(_MAGIC)
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    _write_varint(out, len(meta))
    for k, v in meta.items():
        kb = k.encode()
        _write_varint(out, len(kb))
        out.write(kb)
        _write_varint(out, len(v))
        out.write(v)
    _write_varint(out, 0)
    out.write(sync)
    _write_varint(out, len(rows))
    _write_varint(out, len(data))
    out.write(data)
    out.write(sync)
    with open(path, "wb") as f:
        f.write(out.getvalue())


def avro_to_spark_schema(schema: dict) -> T.StructType:
    fields = []
    for fld in schema["fields"]:
        ftype = fld["type"]
        nullable = False
        if isinstance(ftype, list):  # [null, T] union
            branches = [b for b in ftype if b != "null"]
            if len(branches) != 1 or len(ftype) > 2:
                raise ValueError(f"unsupported union: {ftype!r}")
            ftype, nullable = branches[0], True
        if ftype not in _PRIMITIVE_TO_SPARK:
            raise ValueError(f"unsupported avro type: {ftype!r}")
        fields.append(T.StructField(fld["name"], _PRIMITIVE_TO_SPARK[ftype], nullable))
    return T.StructType(fields)


# ---------------------------------------------------------------------------
# Python Data Source
# ---------------------------------------------------------------------------


class _AvroFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _list_files(path: str) -> list[str]:
    if "://" in path:
        raise ValueError(
            "the pyavro source reads local filesystem paths only "
            f"(got {path!r}); copy remote objects down or mount them — "
            "the decoder itself is location-agnostic"
        )
    if os.path.isdir(path):
        files = sorted(_glob.glob(os.path.join(path, "*.avro")))
    elif any(c in path for c in "*?["):
        files = sorted(_glob.glob(path))
    else:
        files = [path]
    if not files:
        raise ValueError(f"no avro files at {path}")
    return files


class AvroReader(DataSourceReader):
    def __init__(self, schema: T.StructType, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("pyavro source requires a path: .load('/data/x.avro')")
        self.files = _list_files(path)
        self.schema = schema
        self.field_names = [f.name for f in schema.fields]

    def partitions(self):
        # one partition per file: an OCF split cannot cross a sync marker
        # without a scan, and at scale avro arrives as many files anyway
        return [_AvroFilePartition(p) for p in self.files]

    def read(self, partition: _AvroFilePartition):
        yield from read_avro_file(
            partition.path,
            expect_fields=self.field_names,
            expect_schema=self.schema,
        )


class AvroDataSource(DataSource):
    """``format("pyavro")`` — Avro OCF scan (reference: DataFusion's
    SessionContext::read_avro surface, re-expressed without the absent
    spark-avro jar)."""

    @classmethod
    def name(cls) -> str:
        return "pyavro"

    def schema(self):
        path = self.options.get("path")
        if not path:
            raise ValueError("pyavro source requires a path")
        first = _list_files(path)[0]
        with open(first, "rb") as f:
            # _read_header consumes only the header bytes; handing it the
            # open handle avoids both slurping the file and truncating
            # oversized schema metadata
            schema, _, _ = _read_header(f)
        return avro_to_spark_schema(schema)

    def reader(self, schema: T.StructType) -> AvroReader:
        return AvroReader(schema, dict(self.options))


def register_avro(spark) -> None:
    spark.dataSource.register(AvroDataSource)
