"""Independent reference model for `timeseries_cohort_retention`.

The query and its DuckDB oracle share the cohorting spec (Monday-start
week truncation, day-difference // 7 offsets), so a shared off-by-one —
cohorting on the first event's week vs its date, an offset computed
from raw timestamps instead of truncated weeks, a Sunday-start week —
would pass both engines. The model rebuilds the full retention triangle
from raw events with datetime arithmetic only and compares every cell
(retention rate within half an ulp of the 6-decimal rounding, counts
exactly)."""

from __future__ import annotations

import datetime


def _week(d: datetime.date) -> datetime.date:
    return d - datetime.timedelta(days=d.weekday())  # Monday start


def test_cohort_retention_matches_datetime_model(spark, sf_dir):
    from datafusion_nats_spark.queries.timeseries import timeseries_cohort_retention
    from datafusion_nats_spark.tables import load

    raw = load(spark, sf_dir, "events").select("user_id", "ts").collect()
    first: dict = {}
    for r in raw:
        d = r.ts.date()
        if r.user_id not in first or d < first[r.user_id]:
            first[r.user_id] = d
    cohort = {u: _week(d) for u, d in first.items()}
    sizes: dict = {}
    for w in cohort.values():
        sizes[w] = sizes.get(w, 0) + 1

    cells: dict = {}
    for r in raw:
        cw = cohort[r.user_id]
        week_n = (_week(r.ts.date()) - cw).days // 7
        cells.setdefault((cw, week_n), set()).add(r.user_id)

    got = {
        (r.cohort_week, r.week_n): (r.active_users, r.cohort_size, r.retention)
        for r in timeseries_cohort_retention(spark, sf_dir).collect()
    }
    assert set(got) == set(cells), {
        "missing": sorted(set(cells) - set(got))[:5],
        "extra": sorted(set(got) - set(cells))[:5],
    }
    for key, users in cells.items():
        active, size, retention = got[key]
        assert active == len(users), (key, active, len(users))
        assert size == sizes[key[0]], (key, size)
        assert abs(retention - len(users) / sizes[key[0]]) <= 5e-7, (key, retention)
        assert key[1] >= 0  # no activity before a user's own cohort
