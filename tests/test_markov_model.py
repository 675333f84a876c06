"""Independent reference model for `events_markov_transitions`.

The query and its oracle share the lead()-bigram spec. The first
principles worth pinning: transitions are counted within a user only
(the last event of one user never chains into the next user), bigrams
follow the total (ts, event_id) order, probabilities are normalized per
SOURCE state and sum to 1 over each source row-group, and every
adjacent pair — including self-transitions — counts. A literal sorted
walk with a Counter re-derives the full matrix."""

from __future__ import annotations

from collections import Counter


def test_markov_matrix_matches_bigram_walk(spark, sf_dir):
    from datafusion_nats_spark.queries.advanced import events_markov_transitions
    from datafusion_nats_spark.tables import load

    raw = load(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type").collect()
    by_user: dict = {}
    for r in raw:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))

    counts: Counter = Counter()
    for evs in by_user.values():
        evs.sort(key=lambda x: (x[0], x[1]))
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            counts[(a, b)] += 1
    totals: Counter = Counter()
    for (a, _), n in counts.items():
        totals[a] += n

    got = {
        (r.cur_type, r.next_type): (r.n, r.p)
        for r in events_markov_transitions(spark, sf_dir).collect()
    }
    assert set(got) == set(counts)
    for (a, b), n in counts.items():
        gn, gp = got[(a, b)]
        assert gn == n, ((a, b), gn, n)
        assert abs(gp - n / totals[a]) <= 5.1e-7, ((a, b), gp)
    # per-source probabilities sum to 1 (to rounding accumulation)
    by_src: dict = {}
    for (a, _), (_, p) in got.items():
        by_src[a] = by_src.get(a, 0.0) + p
    for a, s in by_src.items():
        assert abs(s - 1.0) <= 1e-5, (a, s)
