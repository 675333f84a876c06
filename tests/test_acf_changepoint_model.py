"""Independent reference models for `timeseries_autocorrelation` and
`timeseries_changepoint_meanshift`.

Both operate on the per-(event_type, day) count rollup; a plain-Python
dict walk re-derives them. Pinned here: ACF pairs day t with day t+k by
CALENDAR arithmetic (a missing day pairs with nothing — it is NOT a
row-lag), mean and variance come from the FULL series while the lag-k
numerator only sums over existing pairs; the changepoint scan uses
row-based 7-observation frames (trailing excludes, leading includes the
current day) and only emits days with BOTH frames full.
"""

from __future__ import annotations

import datetime
from collections import Counter


def _daily(spark, sf_dir):
    from datafusion_nats_spark.tables import load

    raw = load(spark, sf_dir, "events").select("event_type", "ts").collect()
    daily: Counter = Counter()
    for r in raw:
        daily[(r.event_type, r.ts.date())] += 1
    by_type: dict = {}
    for (t, d), n in daily.items():
        by_type.setdefault(t, {})[d] = n
    return by_type


def test_autocorrelation_matches_calendar_walk(spark, sf_dir):
    from datafusion_nats_spark.queries.timeseries import (
        ACF_MAX_LAG,
        timeseries_autocorrelation,
    )

    by_type = _daily(spark, sf_dir)
    expected = {}
    for t, series in by_type.items():
        mu = sum(series.values()) / len(series)
        den = sum((x - mu) ** 2 for x in series.values())
        if den <= 0:
            continue
        for lag in range(1, ACF_MAX_LAG + 1):
            step = datetime.timedelta(days=lag)
            pairs = [
                (series[d], series[d + step]) for d in series if d + step in series
            ]
            if not pairs:
                continue
            num = sum((a - mu) * (b - mu) for a, b in pairs)
            expected[(t, lag)] = (num / den, len(pairs))

    got = {
        (r.event_type, r.lag): (r.acf, r.n_pairs)
        for r in timeseries_autocorrelation(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for k, (acf, n_pairs) in expected.items():
        g_acf, g_n = got[k]
        assert g_n == n_pairs, k
        assert abs(g_acf - acf) <= 5.1e-7, (k, g_acf, acf)


def test_changepoint_matches_frame_walk(spark, sf_dir):
    from datafusion_nats_spark.queries.timeseries import (
        timeseries_changepoint_meanshift,
    )

    by_type = _daily(spark, sf_dir)
    rows = []
    for t, series in by_type.items():
        seq = sorted(series.items())  # row-based frames over OBSERVED days
        for i in range(len(seq)):
            if i < 7 or i + 6 >= len(seq):
                continue
            left = sum(n for _, n in seq[i - 7 : i]) / 7
            right = sum(n for _, n in seq[i : i + 7]) / 7
            rows.append((abs(right - left), t, seq[i][0], left, right))
    rows.sort(key=lambda r: (-r[0], r[1], r[2]))
    expected = [
        (t, d, round(l, 6), round(r, 6), round(r - l, 6))
        for _, t, d, l, r in rows[:20]
    ]

    got = [
        (r.event_type, r.day, r.left_mean, r.right_mean, r.shift)
        for r in timeseries_changepoint_meanshift(spark, sf_dir).collect()
    ]
    assert sorted(got) == sorted(expected)
