"""NATS 2.2 message headers end-to-end: publish CSV rows with tracing
headers (HPUB), observe them on a live core subscriber (HMSG), persist
them in a JetStream stream, and read them back from durable storage —
all against a real wire protocol over loopback TCP.

Run:  python examples/headers_tracing.py
Needs no external services — starts the in-process
``MiniNatsServer(jetstream=True)`` and talks to it with the stdlib wire
clients, the same path the hermetic e2e tests use
(tests/test_nats_wire.py). Against a real ``nats-server -js`` on
localhost:4222 the script works unchanged.

Headers are transport-layer surface: the tabular CSV wire contract the
reference defines (csv.rs) carries no header semantics, so the Spark
source decodes payloads only — headers serve tracing, routing, and
dead-letter provenance on the broker side, which is exactly what this
walkthrough shows.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_nats_spark.sources.broker import nats_server_reachable
from datafusion_nats_spark.sources.nats_wire import (
    JetStreamWireClient,
    MiniNatsClient,
    MiniNatsServer,
)

EXTERNAL_URL = "nats://localhost:4222"
ROWS = [b"1,apple", b"2,banana", b"3,orange"]


def main() -> None:
    server = None
    if nats_server_reachable(EXTERNAL_URL):
        url = EXTERNAL_URL
    else:
        server = MiniNatsServer(jetstream=True).start()
        url = server.url
        print(f"no local nats-server; started loopback {url}")

    try:
        js = JetStreamWireClient(url)
        js.create_stream("TRACED", ["orders.traced"])

        # live subscriber sees HMSG frames with parsed headers
        with MiniNatsClient(url) as sub:
            sid = sub.subscribe("orders.traced")
            sub.flush()
            for i, row in enumerate(ROWS):
                seq = js.publish(
                    "orders.traced",
                    row,
                    headers={"Trace-Id": f"req-{i}", "Content-Type": "text/csv"},
                )
                print(f"published seq={seq} trace=req-{i}")
            for _ in ROWS:
                got = sub.next_msg_full(sid, 5.0)
                assert got is not None
                subject, payload, headers = got
                print(f"live: {payload.decode()!r} headers={headers}")

        # durable replay returns the stored header block
        for seq in range(1, len(ROWS) + 1):
            payload, headers = js.get_msg_with_headers("TRACED", seq)
            print(f"replay seq={seq}: {payload.decode()!r} trace={headers['Trace-Id']}")
    finally:
        if server is not None:
            server.stop()


if __name__ == "__main__":
    main()
