"""Independent reference models for `timeseries_cross_correlation` and
`events_burstiness_fano`.

Both reduce the per-(type, day) rollup through closed-form moment sums;
a plain-Python dict walk re-derives them. Pinned for cross-correlation:
pairs are canonicalized type_a < type_b, day t of the FIRST series
pairs with day t + lag of the SECOND (so lag -k is b leading a),
Pearson uses the overlap-sample moments (not the full-series means),
lag 0 equals the plain correlation of the common days, and r(a, b,
+lag) is NOT assumed equal to r(a, b, -lag) (it pairs different days).
For burstiness: variance is the population form, Fano = var/mean, and
the Goh-Barabasi index lands in [-1, 1).
"""

from __future__ import annotations

import datetime
import math
from collections import Counter
from itertools import combinations


def _daily(spark, sf_dir):
    from datafusion_nats_spark.tables import load

    raw = load(spark, sf_dir, "events").select("event_type", "ts").collect()
    daily: Counter = Counter()
    for r in raw:
        daily[(r.event_type, r.ts.date())] += 1
    by_type: dict = {}
    for (t, d), n in daily.items():
        by_type.setdefault(t, {})[d] = float(n)
    return by_type


def _pearson(pairs):
    n = float(len(pairs))
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    syy = sum(y * y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    if dx <= 0 or dy <= 0:
        return None
    return (n * sxy - sx * sy) / math.sqrt(dx * dy)


def test_cross_correlation_matches_overlap_walk(spark, sf_dir):
    from datafusion_nats_spark.queries.timeseries import (
        XCORR_MAX_LAG,
        timeseries_cross_correlation,
    )

    by_type = _daily(spark, sf_dir)
    expected = {}
    for ta, tb in combinations(sorted(by_type), 2):
        sa, sb = by_type[ta], by_type[tb]
        for lag in range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1):
            step = datetime.timedelta(days=lag)
            pairs = [(sa[d], sb[d + step]) for d in sa if d + step in sb]
            if not pairs:
                continue
            r = _pearson(pairs)
            if r is not None:
                expected[(ta, tb, lag)] = (r, len(pairs))

    got = {
        (r.type_a, r.type_b, r.lag): (r.xcorr, r.n_pairs)
        for r in timeseries_cross_correlation(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for k, (r, n_pairs) in expected.items():
        g_r, g_n = got[k]
        assert g_n == n_pairs, k
        assert abs(g_r - r) <= 5.1e-7, (k, g_r, r)
        assert -1 - 1e-9 <= g_r <= 1 + 1e-9
    # lag 0 must exist for every pair sharing at least 2 non-constant days
    assert any(lag == 0 for (_, _, lag) in got)


def test_burstiness_matches_moment_walk(spark, sf_dir):
    from datafusion_nats_spark.queries.timeseries import events_burstiness_fano

    by_type = _daily(spark, sf_dir)
    got = {
        r.event_type: (r.n_days, r.mean_daily, r.fano_factor, r.burstiness)
        for r in events_burstiness_fano(spark, sf_dir).collect()
    }
    assert set(got) == set(by_type)
    for t, series in by_type.items():
        vals = list(series.values())
        n = float(len(vals))
        mean = sum(vals) / n
        var = sum(v * v for v in vals) / n - mean * mean
        sigma = math.sqrt(var)
        g_n, g_mean, g_fano, g_b = got[t]
        assert g_n == len(vals)
        assert abs(g_mean - mean) <= 5.1e-7
        assert abs(g_fano - var / mean) <= 5.1e-6
        assert abs(g_b - (sigma - mean) / (sigma + mean)) <= 5.1e-7
        assert -1 <= g_b < 1  # Goh-Barabasi range
