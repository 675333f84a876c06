"""Independent reference model for `timeseries_ohlc_resample`.

The Spark form (min_by/max_by over a (ts, event_id) struct) and the
oracle (ASC/DESC row_number windows) are two spellings the builders
ASSERTED are equivalent; this model is the third derivation — a literal
sorted walk per (event_type, day) bucket — pinning that open is the
value of the lexicographically first (ts, event_id) event, close of the
last, with high/low/total independent of order. Values compare exactly
(open/high/low/close are raw doubles), total to the rounding half-step."""

from __future__ import annotations


def test_ohlc_matches_sorted_walk(spark, sf_dir):
    from datafusion_nats_spark.queries.timeseries import timeseries_ohlc_resample
    from datafusion_nats_spark.tables import load

    raw = load(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    ).collect()
    buckets: dict = {}
    for r in raw:
        buckets.setdefault((r.event_type, r.ts.date()), []).append(
            (r.ts, r.event_id, r.value)
        )

    got = {
        (r.event_type, r.day): (r.n, r.open, r.high, r.low, r.close, r.total)
        for r in timeseries_ohlc_resample(spark, sf_dir).collect()
    }
    assert set(got) == set(buckets)
    for key, evs in buckets.items():
        evs.sort(key=lambda x: (x[0], x[1]))
        vals = [v for _, _, v in evs]
        n, open_, high, low, close, total = got[key]
        assert n == len(evs)
        assert open_ == evs[0][2], key  # first by (ts, event_id)
        assert close == evs[-1][2], key  # last by (ts, event_id)
        assert high == max(vals) and low == min(vals), key
        assert abs(total - sum(vals)) <= 5.1e-3 + 1e-9 * len(vals), key
