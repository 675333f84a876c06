"""The reference's golden flow (examples/simple_query.rs:14-88), ported
line-for-line to the PySpark engine: connect to NATS, publish three CSV
rows on a background task, register the subject as a table, and run
``SELECT * FROM nats_table LIMIT 3``.

Run:  python examples/simple_query.py
Needs no external services — when no nats-server listens on
localhost:4222 the script starts the in-process loopback
``MiniNatsServer`` and the stdlib wire client talks to it over real TCP,
exactly like the hermetic e2e tests (tests/test_nats_live.py).
"""

from __future__ import annotations

import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_nats_spark.context import SessionContext
from datafusion_nats_spark.sources.broker import nats_server_reachable
from datafusion_nats_spark.sources.nats_wire import MiniNatsClient, MiniNatsServer

EXTERNAL_URL = "nats://localhost:4222"
DATA = [b"1,apple", b"2,banana", b"3,orange"]


def publisher(url: str, subject: str, stop: threading.Event) -> None:
    # core NATS is at-most-once: repeat the burst until the subscriber
    # has read it (the reference sleeps 2 s and hopes; see SURVEY §4.1)
    with MiniNatsClient(url) as nc:
        while not stop.is_set():
            for payload in DATA:
                nc.publish(subject, payload)
            nc.flush()
            time.sleep(0.5)


def main() -> None:
    server = None
    if nats_server_reachable(EXTERNAL_URL):
        url = EXTERNAL_URL
    else:
        server = MiniNatsServer().start()
        url = server.url
        print(f"no local nats-server; started loopback {url}")

    stop = threading.Event()
    t = threading.Thread(target=publisher, args=(url, "test.data", stop), daemon=True)
    t.start()
    try:
        ctx = SessionContext()
        ctx.register_nats_table(
            "nats_table",
            "test.data",
            schema="id INT, name STRING",
            url=url,
            maxMessages=3,
            timeoutMs=15000,
        )
        ctx.sql("SELECT * FROM nats_table LIMIT 3").show()
    finally:
        stop.set()
        t.join(timeout=10)
        if server is not None:
            server.stop()


if __name__ == "__main__":
    main()
