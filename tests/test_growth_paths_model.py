"""Independent reference models for `events_growth_accounting` and
`events_session_path_trigrams`.

Both queries and their oracles share a window-function spec (lag/lead
over per-user order), so a plain-Python set/sequence walk re-derives the
expected values from first principles. Pinned here: growth statuses are
decided per user against that user's OWN previous active week (never
another user's), churn lands in week+1 and is clipped at the corpus's
last observed week, a user churning and resurrecting repeatedly yields
one row per episode; trigrams follow the total (ts, event_id) order
within a user and never span users.
"""

from __future__ import annotations

import datetime
from collections import Counter


def _week(ts: datetime.datetime) -> datetime.date:
    d = ts.date()
    return d - datetime.timedelta(days=d.weekday())  # Monday, like date_trunc


def test_growth_accounting_matches_set_walk(spark, sf_dir):
    from datafusion_nats_spark.queries.timeseries import events_growth_accounting
    from datafusion_nats_spark.tables import load

    raw = load(spark, sf_dir, "events").select("user_id", "ts").collect()
    weeks_by_user: dict = {}
    for r in raw:
        weeks_by_user.setdefault(r.user_id, set()).add(_week(r.ts))
    max_week = max(w for ws in weeks_by_user.values() for w in ws)

    ledger: Counter = Counter()
    one = datetime.timedelta(days=7)
    for ws in weeks_by_user.values():
        seq = sorted(ws)
        for i, w in enumerate(seq):
            if i == 0:
                ledger[(w, "new")] += 1
            elif seq[i - 1] == w - one:
                ledger[(w, "retained")] += 1
            else:
                ledger[(w, "resurrected")] += 1
            nxt = seq[i + 1] if i + 1 < len(seq) else None
            if (nxt is None or nxt > w + one) and w + one <= max_week:
                ledger[(w + one, "churned")] += 1

    got = {
        r.week: (r.n_new, r.n_retained, r.n_resurrected, r.n_churned)
        for r in events_growth_accounting(spark, sf_dir).collect()
    }
    exp_weeks = {w for (w, _) in ledger}
    assert set(got) == exp_weeks
    for w in exp_weeks:
        assert got[w] == (
            ledger[(w, "new")],
            ledger[(w, "retained")],
            ledger[(w, "resurrected")],
            ledger[(w, "churned")],
        ), w
    # conservation: every (user, week) activity is classified exactly once
    n_acts = sum(len(ws) for ws in weeks_by_user.values())
    assert sum(n for (_, s), n in ledger.items() if s != "churned") == n_acts


def test_path_trigrams_match_sorted_walk(spark, sf_dir):
    from datafusion_nats_spark.queries.timeseries import (
        PATH_TOP,
        events_session_path_trigrams,
    )
    from datafusion_nats_spark.tables import load

    raw = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_user: dict = {}
    for r in raw:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    counts: Counter = Counter()
    for evs in by_user.values():
        evs.sort(key=lambda x: (x[0], x[1]))
        types = [t for _, _, t in evs]
        for a, b, c in zip(types, types[1:], types[2:]):
            counts[(a, b, c)] += 1

    expected = sorted(
        ((n, k) for k, n in counts.items()),
        key=lambda p: (-p[0], p[1]),
    )[:PATH_TOP]
    got = [
        ((r.step1, r.step2, r.step3), r.n_paths)
        for r in events_session_path_trigrams(spark, sf_dir).collect()
    ]
    assert sorted(got, key=lambda p: (-p[1], p[0])) == [
        (k, n) for n, k in expected
    ]
    # total trigram mass = sum over users of max(0, len - 2)
    assert sum(counts.values()) == sum(
        max(0, len(evs) - 2) for evs in by_user.values()
    )
