"""Independent structural model for `timeseries_gap_fill` (LOCF).

The query and its oracle share the grid + IGNORE-NULLS-last spec, so a
shared misreading (grid off by one day at either end, fill reading the
NEXT observation, a duplicated grid row from the join) would pass both
engines. This model re-derives the STRUCTURE from the raw events with
plain Python — the observed-day set per user, the dense [first, last]
grid, and each grid day's LOCF source day (the latest observed day at
or before it) — and checks the query's rows against it. Fill VALUES are
checked by self-reference (the value on a gap day must equal the
query's own value on its source day), which pins the carry-forward
wiring without re-deriving Spark's float rounding in Python."""

from __future__ import annotations

import datetime


def test_gap_fill_grid_and_locf_sources(spark, sf_dir):
    from datafusion_nats_spark.queries.timeseries import timeseries_gap_fill
    from datafusion_nats_spark.tables import load

    raw = load(spark, sf_dir, "events").select("user_id", "ts").collect()
    observed: dict = {}
    for r in raw:
        observed.setdefault(r.user_id, set()).add(r.ts.date())

    out = timeseries_gap_fill(spark, sf_dir).collect()
    rows = {(r.user_id, r.day): r for r in out}
    assert len(rows) == len(out), "duplicate (user, day) grid rows"

    one = datetime.timedelta(days=1)
    n_expected = 0
    for user, days in observed.items():
        d0, d1 = min(days), max(days)
        d = d0
        while d <= d1:
            n_expected += 1
            r = rows.get((user, d))
            assert r is not None, f"grid hole: {user} {d}"
            assert r.is_observed == (d in days), (user, d)
            # LOCF source: latest observed day at or before d
            src = max(x for x in days if x <= d)
            src_row = rows[(user, src)]
            assert src_row.is_observed
            assert r.filled_val == src_row.filled_val, (user, d, src)
            assert r.filled_val is not None  # d0 is observed => no leading null
            d += one
    assert n_expected == len(out), (n_expected, len(out))  # nothing outside grids
