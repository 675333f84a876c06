"""Independent reference model for `funnel_click_attribution`.

The query and oracle share the interval-join spec; the boundary
semantics worth pinning from first principles: a click attributes to a
purchase iff pts - 30 days < cts <= pts — half-open on the OLD side
(a click exactly 30 days before does NOT count) and closed on the
purchase instant (a click at the purchase timestamp DOES count), and
one click may attribute to several purchases. A literal double loop
over each user's clicks and purchases re-derives every count."""

from __future__ import annotations

import datetime


def test_click_attribution_matches_double_loop(spark, sf_dir):
    from datafusion_nats_spark.queries.timeseries import funnel_click_attribution
    from datafusion_nats_spark.tables import load

    raw = load(spark, sf_dir, "events").select("user_id", "event_type", "ts").collect()
    clicks: dict = {}
    purchases: dict = {}
    for r in raw:
        if r.event_type == "click":
            clicks.setdefault(r.user_id, []).append(r.ts)
        elif r.event_type == "purchase":
            purchases.setdefault(r.user_id, []).append(r.ts)

    window = datetime.timedelta(days=30)
    expected = {}
    for user, pts_list in purchases.items():
        cts_list = clicks.get(user, [])
        n_attr, total = 0, 0
        for pts in pts_list:
            n = sum(1 for cts in cts_list if pts - window < cts <= pts)
            n_attr += 1 if n > 0 else 0
            total += n
        expected[user] = (len(pts_list), n_attr, total)

    got = {
        r.user_id: (r.n_purchases, r.n_attributed, r.total_clicks)
        for r in funnel_click_attribution(spark, sf_dir).collect()
    }
    assert got == expected, {
        u: (got.get(u), expected.get(u))
        for u in set(got) | set(expected)
        if got.get(u) != expected.get(u)
    }
