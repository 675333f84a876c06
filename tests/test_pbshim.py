"""Pure-stdlib protobuf shim (datafusion_nats_spark/vendor/pbshim) —
the runtime that unblocks transformWithStateInPandas where no protobuf
wheel exists.

Layers of evidence:
- golden wire vectors hand-derived from the PUBLIC encoding spec
  (protobuf.dev/programming-guides/encoding): tag = (field<<3)|wt,
  base-128 varints, 2's-complement negatives, length-delimited;
- round-trips through the REAL protoc-generated StateMessage_pb2
  shipped inside pyspark (the shim imports it unmodified — descriptor
  bootstrap, builder hooks, enum constants);
- proto3 presence rules (default-valued plain scalars omitted; oneof
  members and message fields emitted when set);
- hypothesis fuzz of serialize→parse identity;
- the END-TO-END check lives in test_streaming_semantics.py::
  test_transform_with_state_user_stats: the JVM state server parses the
  shim's request bytes and the shim parses the JVM's responses — the
  authoritative interop proof.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_nats_spark.vendor import install_protobuf_shim, protobuf_is_real

install_protobuf_shim()  # no-op when a real wheel exists

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402

SHIM_ACTIVE = not protobuf_is_real()


def test_generated_module_imports_and_exposes_surface():
    # messages, enum constants, and the _UPPERCASE descriptor
    # placeholders the generated module annotates
    assert callable(sm.StateRequest)
    assert sm.PRE_INIT == 0 and sm.INITIALIZED == 2 and sm.CLOSED == 5
    assert hasattr(sm, "_STATEREQUEST")


def test_golden_wire_vectors():
    """Hand-derived canonical encodings (spec §'Message Structure')."""
    # field 1 int32=7 → tag 0x08, varint 7
    assert sm.StateResponse(statusCode=7).SerializeToString() == b"\x08\x07"
    # proto3: default int32 0 is omitted entirely
    assert sm.StateResponse(statusCode=0).SerializeToString() == b""
    # field 3 bytes 'ab' → tag (3<<3)|2 = 0x1a, len 2
    assert (
        sm.StateResponse(value=b"ab").SerializeToString() == b"\x1a\x02ab"
    )
    # field 2 string with 2-byte UTF-8
    assert (
        sm.StateResponse(errorMessage="é").SerializeToString()
        == b"\x12\x02\xc3\xa9"
    )
    # nested oneof: StateRequest.statefulProcessorCall(field 2) wrapping
    # SetHandleState(field 1) wrapping enum state=2
    m = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
        )
    )
    assert m.SerializeToString() == bytes.fromhex("12040a020802")
    # negative int64 → 10-byte two's-complement varint
    enc = sm.TimerInfo(timestampMs=-1).SerializeToString()
    assert enc == b"\x10" + b"\xff" * 9 + b"\x01"
    # multi-byte varint: 300 = 0xac 0x02
    assert (
        sm.StateResponseWithLongTypeVal(value=300).SerializeToString()
        == b"\x18\xac\x02"
    )
    # bool true; empty message member of a oneof still emitted (len 0)
    assert (
        sm.StateResponseWithListGet(requireNextFetch=True).SerializeToString()
        == b"\x20\x01"
    )
    assert (
        sm.ValueStateCall(get=sm.Get()).SerializeToString() == b"\x1a\x00"
    )


def test_parse_matches_real_protobuf_layout():
    """Round-trip + field semantics through the real generated module."""
    msg = sm.StateResponseWithMapIterator(
        statusCode=1,
        kvPair=[
            sm.KeyAndValuePair(key=b"k1", value=b"v1"),
            sm.KeyAndValuePair(key=b"k2"),
        ],
        requireNextFetch=True,
    )
    out = sm.StateResponseWithMapIterator()
    out.ParseFromString(msg.SerializeToString())
    assert out.statusCode == 1
    assert [(p.key, p.value) for p in out.kvPair] == [
        (b"k1", b"v1"),
        (b"k2", b""),
    ]
    assert out.requireNextFetch is True


def test_oneof_semantics():
    call = sm.ValueStateCall(stateName="s")
    assert call.WhichOneof("method") is None
    call.get = sm.Get()
    assert call.WhichOneof("method") == "get"
    # setting a sibling clears the previous member
    call.valueStateUpdate = sm.ValueStateUpdate(value=b"x")
    assert call.WhichOneof("method") == "valueStateUpdate"
    rt = sm.ValueStateCall()
    rt.ParseFromString(call.SerializeToString())
    assert rt.WhichOneof("method") == "valueStateUpdate"
    assert rt.valueStateUpdate.value == b"x"


@pytest.mark.skipif(
    not SHIM_ACTIVE, reason="real protobuf installed — shim-only checks"
)
def test_shim_specific_wire_tolerance():
    """Unknown fields skip cleanly; packed AND unpacked repeated varints
    both parse (spec: parsers must accept either)."""
    m = sm.StateResponse()
    # unknown field 15 (varint), then known field 1
    m.ParseFromString(b"\x78\x2a\x08\x05")
    assert m.statusCode == 5
    # unknown length-delimited field skipped
    m.ParseFromString(b"\x7a\x03abc\x08\x09")
    assert m.statusCode == 9
    # truncated varint is a loud error
    with pytest.raises(ValueError):
        m.ParseFromString(b"\x08\x80")


def test_real_protobuf_always_wins():
    """install_protobuf_shim never shadows a real wheel (returns False
    and leaves sys.path alone when protobuf_is_real())."""
    if protobuf_is_real():
        assert install_protobuf_shim() is False
    else:
        assert install_protobuf_shim() is True


@settings(max_examples=60, deadline=None)
@given(
    status=st.integers(min_value=-(2**31), max_value=2**31 - 1),
    err=st.text(max_size=40),
    value=st.binary(max_size=60),
)
def test_fuzz_roundtrip_scalar_message(status, err, value):
    m = sm.StateResponse(statusCode=status, errorMessage=err, value=value)
    out = sm.StateResponse()
    out.ParseFromString(m.SerializeToString())
    assert (out.statusCode, out.errorMessage, out.value) == (
        status,
        err,
        value,
    )


@settings(max_examples=40, deadline=None)
@given(
    vals=st.lists(st.binary(max_size=30), max_size=8),
    fetch=st.booleans(),
    timers=st.lists(
        st.tuples(
            st.binary(max_size=10),
            st.integers(min_value=-(2**63), max_value=2**63 - 1),
        ),
        max_size=5,
    ),
)
def test_fuzz_roundtrip_repeated(vals, fetch, timers):
    lg = sm.StateResponseWithListGet(value=vals, requireNextFetch=fetch)
    lg2 = sm.StateResponseWithListGet()
    lg2.ParseFromString(lg.SerializeToString())
    assert list(lg2.value) == vals and lg2.requireNextFetch == fetch

    t = sm.StateResponseWithTimer(
        timer=[sm.TimerInfo(key=k, timestampMs=ts) for k, ts in timers]
    )
    t2 = sm.StateResponseWithTimer()
    t2.ParseFromString(t.SerializeToString())
    assert [(x.key, x.timestampMs) for x in t2.timer] == timers


@pytest.mark.skipif(
    not SHIM_ACTIVE, reason="real protobuf installed — shim-only checks"
)
def test_detached_default_mutation_raises_loudly():
    """Reading an unset singular message field returns a DETACHED default
    (chained default reads work, matching real protobuf), but mutating
    it raises instead of silently dropping the write — real protobuf
    would auto-attach (`msg.sub.f = x` marks `sub` present), and a shim
    whose contract is loud-NotImplemented must not diverge quietly
    (round-6 advisory)."""
    req = sm.StateRequest()
    spc = req.statefulProcessorCall  # unset → detached default
    # chained default READS are fine (proto3 default-instance semantics)
    assert spc.setHandleState.state == 0
    assert not req.HasField("statefulProcessorCall")
    for mutate in (
        lambda: setattr(spc, "setHandleState", sm.SetHandleState(state=2)),
        lambda: spc.ClearField("setHandleState"),
        lambda: spc.CopyFrom(sm.StatefulProcessorCall()),
        lambda: spc.ParseFromString(b""),
    ):
        with pytest.raises(AttributeError, match="detached"):
            mutate()
    # the write was refused, not dropped: parent still unset
    assert not req.HasField("statefulProcessorCall")
    # the supported construction path (what PySpark's client does)
    req.statefulProcessorCall = sm.StatefulProcessorCall(
        setHandleState=sm.SetHandleState(state=2)
    )
    assert req.statefulProcessorCall.setHandleState.state == 2
    # and an ATTACHED submessage read back from _values mutates freely
    req.statefulProcessorCall.setHandleState = sm.SetHandleState(state=3)
    assert req.statefulProcessorCall.setHandleState.state == 3


def test_shim_defers_to_real_protobuf_on_path(tmp_path):
    """Heterogeneous-deployment guard: when the shim dir rides PYTHONPATH
    but a real protobuf package exists later on sys.path (marker:
    descriptor_pb2.py), importing google.protobuf must serve the REAL
    package, not the shim (round-6 advisory: PYTHONPATH precedes
    site-packages, so without the probe the shim would shadow a real
    wheel on executor nodes that have one)."""
    import os
    import subprocess
    import sys

    from datafusion_nats_spark.vendor import PBSHIM_DIR

    fake = tmp_path / "site"
    (fake / "google" / "protobuf").mkdir(parents=True)
    (fake / "google" / "__init__.py").write_text(
        "from pkgutil import extend_path\n"
        "__path__ = extend_path(__path__, __name__)\n"
    )
    (fake / "google" / "protobuf" / "__init__.py").write_text(
        "__version__ = '9.9.9-fakereal'\n"
    )
    (fake / "google" / "protobuf" / "descriptor_pb2.py").write_text("")
    env = dict(os.environ, PYTHONPATH=f"{PBSHIM_DIR}{os.pathsep}{fake}")
    out = subprocess.run(
        [sys.executable, "-c",
         "import google.protobuf as gp; print(gp.__version__)"],
        env=env, capture_output=True, text=True, timeout=60,
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "9.9.9-fakereal"
    # and with no real package on the path, the shim serves itself
    env2 = dict(os.environ, PYTHONPATH=PBSHIM_DIR)
    out2 = subprocess.run(
        [sys.executable, "-c",
         "import google.protobuf as gp; print(gp.__version__)"],
        env=env2, capture_output=True, text=True, timeout=60,
    )
    assert out2.returncode == 0, out2.stderr
    assert out2.stdout.strip() == "0.0.0-pbshim"


def test_shim_zip_rewritten_when_tampered(tmp_path, monkeypatch):
    """The executor-shipped shim zip lives in the per-user 0700 cache dir
    AND its contents are re-verified against the source digest before
    every addPyFile — a pre-planted or bit-flipped zip at the expected
    path is rewritten, never shipped (round-6 advisory, medium)."""
    import hashlib
    import os
    import zipfile as zf_mod

    from datafusion_nats_spark.vendor import (
        PBSHIM_DIR,
        _zip_content_matches,
    )

    sources = sorted(
        os.path.join(dp, fn)
        for dp, _dn, fns in os.walk(PBSHIM_DIR)
        for fn in fns
        if fn.endswith(".py")
    )
    rels = [os.path.relpath(p, PBSHIM_DIR) for p in sources]
    digest = hashlib.md5()
    contents = [open(p, "rb").read() for p in sources]
    for rel, data in zip(rels, contents):
        digest.update(f"{rel}\x00{len(data)}\x00".encode())
        digest.update(data)
    want = digest.hexdigest()

    good = tmp_path / "good.zip"
    with zf_mod.ZipFile(good, "w") as z:
        for full, rel in zip(sources, rels):
            z.write(full, rel)
    assert _zip_content_matches(str(good), rels, want) is True

    # tampered content under the same names → rejected
    evil = tmp_path / "evil.zip"
    with zf_mod.ZipFile(evil, "w") as z:
        for rel in rels:
            z.writestr(rel, "import os  # planted\n")
    assert _zip_content_matches(str(evil), rels, want) is False
    # extra entry → rejected; missing file → rejected; garbage → rejected
    extra = tmp_path / "extra.zip"
    with zf_mod.ZipFile(extra, "w") as z:
        for full, rel in zip(sources, rels):
            z.write(full, rel)
        z.writestr("planted.py", "x = 1\n")
    assert _zip_content_matches(str(extra), rels, want) is False
    assert _zip_content_matches(str(tmp_path / "absent.zip"), rels, want) is False
    bad = tmp_path / "garbage.zip"
    bad.write_bytes(b"not a zip")
    assert _zip_content_matches(str(bad), rels, want) is False
    # byte redistribution across adjacent entries (same names, same
    # total byte stream) must be caught by the per-entry framing
    shifted = tmp_path / "shifted.zip"
    with zf_mod.ZipFile(shifted, "w") as z:
        for i, rel in enumerate(rels):
            data = contents[i]
            if i == 0:
                data = data[:-3]  # move 3 tail bytes…
            elif i == 1:
                data = contents[0][-3:] + data  # …to the next entry's head
            z.writestr(rel, data)
    assert _zip_content_matches(str(shifted), rels, want) is False


def test_user_cache_dir_is_private_and_owned():
    import os
    import stat

    from datafusion_nats_spark.cache import user_cache_dir

    root = user_cache_dir()
    st_ = os.stat(root)
    assert stat.S_IMODE(st_.st_mode) == 0o700
    if hasattr(os, "getuid"):
        assert st_.st_uid == os.getuid()
    # idempotent and stable
    assert user_cache_dir() == root


@pytest.mark.skipif(
    not SHIM_ACTIVE, reason="real protobuf installed — shim-only checks"
)
def test_detached_default_repeated_field_mutation_raises():
    """Appending to a REPEATED field of a detached default instance must
    raise too (round-7 review): real protobuf would auto-attach the
    parent; silently dropping the append is the same quiet divergence as
    scalar assignment."""
    call = sm.ListStateCall()
    put = call.listStatePut  # unset → detached default
    assert len(put.value) == 0 and list(put.value) == []  # reads fine
    with pytest.raises(AttributeError, match="detached"):
        put.value.append(b"x")
    with pytest.raises(AttributeError, match="detached"):
        put.value.extend([b"x"])
    assert not call.HasField("listStatePut")
    assert call.SerializeToString() == b""
    # attached instances keep the live-list behavior
    call.listStatePut = sm.ListStatePut()
    call.listStatePut.value.append(b"x")
    assert list(call.listStatePut.value) == [b"x"]
