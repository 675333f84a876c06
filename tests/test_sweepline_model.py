"""Independent reference model for `timeseries_concurrency_sweepline`.

The registry query and its DuckDB oracle share the sessionize → ±1
delta → prefix-sum SPEC (the oracle differs only in using a global
window where Spark runs the segmented per-day form), so a shared
misreading of the sweep-line semantics would pass both engines. This
test re-derives the expected curve from the raw events with a literal
Python model — 30-minute-gap sessionization by a plain loop, then for
every change point a direct count of sessions whose [start, end]
interval covers it — and checks the query's output exactly.

The count-covering-intervals form is semantically different from the
delta/prefix-sum form (it never builds deltas at all), which is what
makes it independent. Writing it surfaced the query's interval
convention, now pinned here: the prefix over (+1 at start, -1 at end)
counts HALF-OPEN [start, end) coverage — at a change point t the value
is #sessions with start <= t < end, so a session contributes nothing at
its own end point and a zero-duration session (one lone event) shows 0
at its only change point. That is the standard sweep-line convention
("departures at t have already left at t"), identical in the Spark form
and the DuckDB oracle; a closed-interval model diverges at exactly
those points."""

from __future__ import annotations

import datetime


def test_concurrency_sweepline_matches_interval_count_model(spark, sf_dir):
    from datafusion_nats_spark.queries.timeseries import (
        timeseries_concurrency_sweepline,
    )
    from datafusion_nats_spark.tables import load

    events = sorted(
        (
            (r.user_id, r.ts, r.event_id)
            for r in load(spark, sf_dir, "events").select("user_id", "ts", "event_id").collect()
        ),
        key=lambda x: (x[0], x[1], x[2]),
    )

    # literal 30-min-gap sessionization per user
    gap = datetime.timedelta(minutes=30)
    sessions = []  # (t_start, t_end)
    cur_user, cur_start, cur_end = None, None, None
    for user, ts, _eid in events:
        if user != cur_user or ts > cur_end + gap:
            if cur_user is not None:
                sessions.append((cur_start, cur_end))
            cur_user, cur_start, cur_end = user, ts, ts
        else:
            cur_end = ts
    sessions.append((cur_start, cur_end))

    # expected curve: at each change point, count sessions whose
    # HALF-OPEN [start, end) interval covers it (see module docstring)
    points = sorted({t for s in sessions for t in s})
    expected = {
        t: sum(1 for a, b in sessions if a <= t < b) for t in points
    }

    got = {
        r.t: r.concurrent_sessions
        for r in timeseries_concurrency_sweepline(spark, sf_dir).collect()
    }
    assert got == expected, {
        "missing": sorted(set(expected) - set(got))[:5],
        "extra": sorted(set(got) - set(expected))[:5],
        "diffs": [(t, got[t], expected[t]) for t in list(expected)[:50] if got.get(t) != expected[t]][:5],
    }
