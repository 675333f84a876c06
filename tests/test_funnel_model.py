"""Independent reference model for `funnel_ordered_stages`.

The query and its DuckDB oracle share the GREEDY min-chain spec
(earliest view, earliest click strictly after it, earliest purchase
strictly after that). The semantic claim behind that spec — greedy
anchoring reaches the maximum funnel depth achievable by ANY strictly
increasing (view, click, purchase) chain — is a small theorem, not a
tautology, and a shared misreading (e.g. anchoring on the latest view,
or non-strict ordering) would pass both engines. This model computes
the depth by brute force over all per-user event combinations and the
anchors by a literal sorted scan, then checks the query exactly."""

from __future__ import annotations

import bisect


def test_funnel_stage_matches_bruteforce_chain_search(spark, sf_dir):
    from datafusion_nats_spark.queries.timeseries import funnel_ordered_stages
    from datafusion_nats_spark.tables import load

    rows = load(spark, sf_dir, "events").select("user_id", "event_type", "ts").collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_type))

    expected = {}
    for user, evs in by_user.items():
        views = sorted(t for t, k in evs if k == "view")
        clicks = sorted(t for t, k in evs if k == "click")
        buys = sorted(t for t, k in evs if k == "purchase")

        # brute-force depth: does ANY strictly increasing chain exist?
        depth = 1 if views else 0
        if any(c > v for v in views for c in clicks):
            depth = 2
        if any(
            p > c for v in views for c in clicks if c > v for p in buys
        ):
            depth = 3

        # greedy anchors via a literal sorted scan
        t1 = views[0] if views else None
        t2 = None
        if t1 is not None:
            i = bisect.bisect_right(clicks, t1)
            t2 = clicks[i] if i < len(clicks) else None
        t3 = None
        if t2 is not None:
            i = bisect.bisect_right(buys, t2)
            t3 = buys[i] if i < len(buys) else None
        expected[user] = (depth, t1, t2, t3)

    got = {
        r.user_id: (r.stage, r.t1, r.t2, r.t3)
        for r in funnel_ordered_stages(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    mismatches = {u: (got[u], expected[u]) for u in expected if got[u] != expected[u]}
    assert not mismatches, dict(list(mismatches.items())[:5])
    # the theorem itself: greedy depth == brute-force max depth
    for u, (depth, t1, t2, t3) in expected.items():
        greedy_depth = 3 if t3 else 2 if t2 else 1 if t1 else 0
        assert greedy_depth == depth, (u, greedy_depth, depth)
