"""Independent reference model for `timeseries_time_weighted_avg`.

The query and its oracle share the lead()-segment spec. The semantics
worth pinning from first principles: LOCF hold-until-next weighting
(each reading weighs the microsecond gap to its successor — NOT
trapezoidal interpolation), the last reading of a series carrying zero
weight, and a user with a single event producing NO row at all (no
segments). The model is a literal sorted walk with integer microsecond
arithmetic; averages compare to just over the 6-decimal rounding
half-step plus float-summation-order noise."""

from __future__ import annotations


def test_time_weighted_avg_matches_segment_walk(spark, sf_dir):
    from datafusion_nats_spark.queries.timeseries import timeseries_time_weighted_avg
    from datafusion_nats_spark.tables import load

    raw = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "value").collect()
    by_user: dict = {}
    for r in raw:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.value))

    expected = {}
    for user, evs in by_user.items():
        evs.sort(key=lambda x: (x[0], x[1]))
        if len(evs) < 2:
            continue  # no segments -> no output row
        dts, num, vals = [], 0.0, []
        for (t0, _, v0), (t1, _, _) in zip(evs, evs[1:]):
            dt = round((t1 - t0).total_seconds() * 1_000_000)
            dts.append(dt)
            num += v0 * dt
            vals.append(v0)
        expected[user] = (len(dts), sum(dts), num / sum(dts), sum(vals) / len(vals))

    got = {
        r.user_id: (r.n_segments, r.total_dt_us, r.twa, r.plain_avg)
        for r in timeseries_time_weighted_avg(spark, sf_dir).collect()
    }
    assert set(got) == set(expected), {
        "single_event_users_leaked": sorted(set(got) - set(expected))[:5],
        "missing": sorted(set(expected) - set(got))[:5],
    }
    for user, (n, total, twa, avg) in expected.items():
        gn, gt, gtwa, gavg = got[user]
        assert gn == n and gt == total, (user, (gn, gt), (n, total))
        assert abs(gtwa - twa) <= 1e-6, (user, gtwa, twa)
        assert abs(gavg - avg) <= 1e-6, (user, gavg, avg)
