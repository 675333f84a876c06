"""Message transports for the NATS source.

The reference talks to a live broker through thin connect/subscribe
wrappers (reference: src/nats_connection.rs:4-12). Here the transport is
pluggable:

- ``LocalLogBroker`` — a file-backed, per-subject append-only message log
  keyed by URL (``memory://name`` → a directory under the system temp
  dir). Used by tests and local demos. It must be file-backed because
  PySpark executes a Python data source's ``partitions()``/``read()`` in
  separate Python worker processes — an in-process dict would be empty
  there. Unlike core NATS (at-most-once, no replay — the property that
  breaks the reference's own integration test, SURVEY §5.3), the log is
  retained and offset-indexed, which gives the streaming reader
  replayable offsets; it models a JetStream-like durable subject.
- ``nats-py`` (optional) — a real core-NATS client, import-gated because
  the package may be absent; delivers the reference's exact at-most-once
  contract, plus the JetStream durable flavor.
- ``nats_wire.MiniNatsClient`` — a pure-stdlib core-NATS wire client
  (INFO/CONNECT/PING/PONG/PUB/SUB/MSG framing over a raw socket). The
  automatic fallback for core-NATS drains when nats-py is absent, so the
  reference's actual I/O path (src/nats_connection.rs:4-12) is
  exercisable — and tested, against ``nats_wire.MiniNatsServer`` — in a
  dependency-free environment.

Messages are stored base64-line-encoded so arbitrary payload bytes are
safe; O_APPEND single-line writes keep concurrent publishers atomic on
POSIX.
"""

from __future__ import annotations

import base64
import os
import re
import tempfile
import threading


def _safe(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.-]", "_", name)


class LocalLogBroker:
    """File-backed append-only per-subject message log."""

    def __init__(self, url: str) -> None:
        root = os.environ.get(
            "SPARK_NATS_BROKER_DIR",
            os.path.join(tempfile.gettempdir(), "datafusion_nats_broker"),
        )
        self._dir = os.path.join(root, _safe(url))
        os.makedirs(self._dir, exist_ok=True)
        self._lock = threading.Lock()

    def _path(self, subject: str) -> str:
        return os.path.join(self._dir, _safe(subject) + ".log")

    def publish(self, subject: str, payload: bytes | str) -> None:
        if isinstance(payload, str):
            payload = payload.encode("utf-8")
        line = base64.b64encode(payload) + b"\n"
        with self._lock:
            fd = os.open(self._path(subject), os.O_WRONLY | os.O_CREAT | os.O_APPEND, 0o644)
            try:
                os.write(fd, line)
            finally:
                os.close(fd)

    def size(self, subject: str) -> int:
        # chunked newline count: size() runs once per streaming trigger
        # (latestOffset), so it must not split the whole log into a list
        n = 0
        try:
            with open(self._path(subject), "rb") as f:
                while chunk := f.read(1 << 20):
                    n += chunk.count(b"\n")
        except FileNotFoundError:
            return 0
        return n

    def list_subjects(self) -> list[str]:
        """All subjects with at least one published message (sorted — the
        deterministic expansion order for wildcard subscriptions)."""
        return sorted(
            n[: -len(".log")] for n in os.listdir(self._dir) if n.endswith(".log")
        )

    def fetch(self, subject: str, start: int, end: int | None = None) -> list[bytes]:
        """Messages [start, end) of the subject log. Streams the file and
        stops at ``end`` instead of materializing every line: an
        executor-ingest offset-range task fetching [0, N/16) must not
        read and split the whole log (a real JetStream get_range is a
        server-side range read; the file twin should cost O(end), not
        O(log))."""
        out: list[bytes] = []
        try:
            with open(self._path(subject), "rb") as f:
                for i, line in enumerate(f):
                    if end is not None and i >= end:
                        break
                    if i >= start:
                        out.append(base64.b64decode(line.rstrip(b"\n")))
        except FileNotFoundError:
            return []
        return out

    def clear(self, subject: str | None = None) -> None:
        if subject is not None:
            try:
                os.remove(self._path(subject))
            except FileNotFoundError:
                pass
            return
        for name in os.listdir(self._dir):
            if name.endswith(".log"):
                os.remove(os.path.join(self._dir, name))


# Back-compat alias (earlier in-process design).
InMemoryBroker = LocalLogBroker


class JetStreamBroker:
    """Live-JetStream flavor of the replayable log (SURVEY §7.4 hard part
    #1's production answer): the same ``publish/size/fetch/clear``
    interface as ``LocalLogBroker``, backed by a real NATS JetStream
    stream, so every offset-range consumer — executor-side ingest,
    metadata columns, bounded historical reads, streaming checkpoints —
    works unchanged against a durable broker.

    Offset mapping: the source's 0-based per-subject offsets map 1:1 to
    JetStream's 1-based stream sequences (one stream per subject, no
    deletes/purge — append-only, like the file log). ``fetch`` uses
    sequence-direct gets, which is exact and simple; a pull-consumer
    batch drain is the high-throughput upgrade and changes nothing about
    the offset contract.

    Two interchangeable backends behind the same methods: nats-py when
    installed, else the pure-stdlib ``JetStreamWireClient`` speaking the
    ``$JS.API.*`` JSON protocol directly — so the durable transport works
    against a real ``nats-server -js`` OR the in-repo
    ``MiniNatsServer(jetstream=True)`` with zero dependencies. Every
    method opens a short-lived connection because executor tasks run in
    fresh Python workers with no shared event loop.
    """

    def __init__(self, url: str) -> None:
        self.url = url
        self._ensured: set[str] = set()  # streams known to exist (per handle)

    def _wire(self):
        """The stdlib backend, used whenever nats-py is absent."""
        from datafusion_nats_spark.sources.nats_wire import JetStreamWireClient

        return JetStreamWireClient(self.url)

    _STREAM_PREFIX = "sg_"

    @classmethod
    def stream_name(cls, subject: str) -> str:
        """One stream per subject. JetStream stream names forbid dots, so
        the subject is sanitized — and because sanitizing collapses
        distinct subjects ('a.b' vs 'a_b'), an md5 suffix keeps the
        mapping injective."""
        import hashlib

        sanitized = re.sub(r"[^A-Za-z0-9_-]", "_", subject)
        digest = hashlib.md5(subject.encode("utf-8")).hexdigest()[:8]
        return f"{cls._STREAM_PREFIX}{sanitized}_{digest}"

    def _run(self, fn):
        import asyncio

        import nats  # import-gated — absent package surfaces ImportError

        async def _with_js():
            nc = await nats.connect(self.url)
            try:
                return await fn(nc.jetstream())
            finally:
                await nc.close()

        return asyncio.run(_with_js())

    def ensure_stream(self, subject: str):
        name = self.stream_name(subject)
        if name in self._ensured:
            return
        if not nats_available():
            w = self._wire()
            if w.stream_info(name) is None:
                w.create_stream(name, [subject])
            self._ensured.add(name)
            return
        from nats.js.api import StreamConfig
        from nats.js.errors import NotFoundError

        async def _ensure(js):
            try:
                await js.stream_info(name)
            except NotFoundError:  # only "missing" — auth/conn errors surface
                await js.add_stream(StreamConfig(name=name, subjects=[subject]))

        self._run(_ensure)
        self._ensured.add(name)

    def publish(self, subject: str, payload: bytes | str) -> None:
        if isinstance(payload, str):
            payload = payload.encode("utf-8")
        self.ensure_stream(subject)
        if not nats_available():
            self._wire().publish(subject, payload)
            return

        async def _pub(js):
            await js.publish(subject, payload)

        self._run(_pub)

    def size(self, subject: str) -> int:
        if not nats_available():
            info = self._wire().stream_info(self.stream_name(subject))
            return 0 if info is None else info["state"]["messages"]
        from nats.js.errors import NotFoundError

        async def _size(js):
            try:
                info = await js.stream_info(self.stream_name(subject))
            except NotFoundError:
                return 0
            return info.state.messages

        return self._run(_size)

    def list_subjects(self) -> list[str]:
        """All subjects this broker convention owns, recovered from each
        ``sg_``-prefixed stream's bound subject list (stream names are
        md5-sanitized and not reversible; the config carries the real
        subject). Sorted — the same deterministic wildcard-expansion
        order as ``LocalLogBroker.list_subjects``. This is what lets
        ``resolved_subjects()`` expand ``*``/``>`` patterns against a
        JetStream backend at planning time; a server-side pattern
        consumer (one filtered consumer over a multi-subject stream)
        would push the match into the broker and is the throughput
        upgrade, not a semantics change."""
        if not nats_available():
            subs: list[str] = []
            for info in self._wire().stream_list():
                cfg = info.get("config") or {}
                if cfg.get("name", "").startswith(self._STREAM_PREFIX):
                    subs.extend(cfg.get("subjects") or [])
            return sorted(set(subs))

        async def _list(js):
            subs: list[str] = []
            for info in await js.streams_info():
                if info.config.name.startswith(self._STREAM_PREFIX) and info.config.subjects:
                    subs.extend(info.config.subjects)
            return sorted(set(subs))

        return self._run(_list)

    def fetch(self, subject: str, start: int, end: int | None = None) -> list[bytes]:
        """Messages [start, end) as 0-based positions over the stream's
        CURRENT contents: position i ↦ sequence first_seq + i. Anchoring
        at first_seq (not 1) keeps the contract correct after purges or
        retention-limit trims, which advance first_seq."""
        if not nats_available():
            name = self.stream_name(subject)
            w = self._wire()
            info = w.stream_info(name)
            if info is None:
                return []
            n = info["state"]["messages"]
            first = info["state"]["first_seq"]
            stop = n if end is None else min(end, n)
            if stop <= start:
                return []
            return w.get_range(name, first + start, stop - start)
        from nats.js.errors import NotFoundError

        async def _fetch(js):
            name = self.stream_name(subject)
            try:
                info = await js.stream_info(name)
            except NotFoundError:
                return []
            n = info.state.messages
            first = info.state.first_seq
            stop = n if end is None else min(end, n)
            out: list[bytes] = []
            for pos in range(start, stop):
                msg = await js.get_msg(name, first + pos)
                out.append(msg.data)
            return out

        return self._run(_fetch)

    def clear(self, subject: str | None = None) -> None:
        """Purge one subject's stream, or (subject=None) every stream this
        broker convention owns — mirroring LocalLogBroker.clear()."""
        if not nats_available():
            w = self._wire()
            if subject is not None:
                w.purge_stream(self.stream_name(subject))
            else:
                for info in w.stream_list():
                    name = (info.get("config") or {}).get("name", "")
                    if name.startswith(self._STREAM_PREFIX):
                        w.purge_stream(name)
            self._ensured.clear()
            return
        from nats.js.errors import NotFoundError

        async def _clear(js):
            if subject is not None:
                try:
                    await js.purge_stream(self.stream_name(subject))
                except NotFoundError:
                    pass
                return
            for info in await js.streams_info():
                if info.config.name.startswith(self._STREAM_PREFIX):
                    await js.purge_stream(info.config.name)

        self._run(_clear)
        self._ensured.clear()


def get_broker(url: str = "memory://default"):
    """Broker handle for a URL — cheap to construct in any process.
    Dispatches on scheme: ``memory://`` → the file-backed local log,
    ``nats://`` → the JetStream-backed replayable broker (import-gated;
    methods raise ImportError when nats-py is absent)."""
    if url.startswith("nats://"):
        return JetStreamBroker(url)
    return LocalLogBroker(url)


def nats_available() -> bool:
    try:
        import nats  # noqa: F401

        return True
    except ImportError:
        return False


def nats_server_reachable(
    url: str = "nats://localhost:4222", timeout_s: float = 0.25
) -> bool:
    """True when a broker accepts TCP connects at ``url`` — the gate for
    the live-broker e2e test (the twin of the reference's integration
    test, which requires a running server: reference
    tests/integration_test.rs:14). nats-py is no longer required: the
    stdlib wire client (nats_wire.py) drains core-NATS subjects on its
    own."""
    import socket
    from urllib.parse import urlparse

    p = urlparse(url)
    try:
        with socket.create_connection(
            (p.hostname or "localhost", p.port or 4222), timeout=timeout_s
        ):
            return True
    except OSError:
        return False


def fetch_from_nats(url: str, subject: str, max_messages: int, timeout_ms: int) -> list[bytes]:
    """Bounded drain of a live core-NATS subject (at-most-once: messages
    published before this subscribe are lost, reference: executor.rs:94).

    Uses nats-py when installed; otherwise falls back to the pure-stdlib
    wire client — same subscribe-then-drain contract either way.
    """
    import asyncio

    try:
        import nats
    except ImportError:
        from datafusion_nats_spark.sources.nats_wire import fetch_from_nats_stdlib

        return fetch_from_nats_stdlib(url, subject, max_messages, timeout_ms)

    async def _drain() -> list[bytes]:
        client = await nats.connect(url)
        try:
            sub = await client.subscribe(subject)
            out: list[bytes] = []
            deadline = asyncio.get_event_loop().time() + timeout_ms / 1000.0
            while len(out) < max_messages:
                remaining = deadline - asyncio.get_event_loop().time()
                if remaining <= 0:
                    break
                try:
                    msg = await asyncio.wait_for(sub.next_msg(), timeout=remaining)
                except asyncio.TimeoutError:
                    break
                out.append(msg.data)
            return out
        finally:
            await client.close()

    return asyncio.run(_drain())


def subject_matches(pattern: str, subject: str) -> bool:
    """NATS subject-pattern semantics: subjects are '.'-separated tokens;
    '*' matches exactly one token, '>' (only meaningful as the last
    token) matches one or more remaining tokens. 'orders.*' matches
    'orders.us' but not 'orders' or 'orders.us.west'; 'orders.>' matches
    both 'orders.us' and 'orders.us.west'."""
    pt = pattern.split(".")
    st = subject.split(".")
    for i, tok in enumerate(pt):
        if tok == ">":
            return len(st) >= i + 1 and i == len(pt) - 1
        if i >= len(st) or (tok != "*" and tok != st[i]):
            return False
    return len(st) == len(pt)


def subjects_overlap(a: str, b: str) -> bool:
    """True iff SOME concrete subject matches both patterns — the test a
    real nats-server runs at STREAM.CREATE time to refuse two streams
    binding overlapping subject spaces (err_code 10065). Token walk:
    '>' in either pattern swallows the (non-empty) rest, '*' matches any
    single token, literals must agree; both must exhaust together."""
    ta, tb = a.split("."), b.split(".")
    i = 0
    while True:
        a_end, b_end = i == len(ta), i == len(tb)
        if not a_end and ta[i] == ">":
            return not b_end  # '>' needs at least one more token
        if not b_end and tb[i] == ">":
            return not a_end
        if a_end or b_end:
            return a_end and b_end
        if ta[i] != "*" and tb[i] != "*" and ta[i] != tb[i]:
            return False
        i += 1
