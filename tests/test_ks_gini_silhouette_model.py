"""Independent reference models for `events_ks_drift`,
`curation_gini_source_balance`, and `sim_silhouette_by_label`.

All three reduce to closed forms a plain-Python pass re-derives. Pinned
for KS: the early/late split is integer floor((t0 + t1)/2) microsecond
arithmetic, ECDFs step on the DISTINCT sorted value grid, D is the max
absolute gap with a smallest-value tie-break, and 0 <= D <= 1. For
Gini: ranks sort ascending by (count, source), the closed form
2*sum(rk*c)/(n*tot) - (n+1)/n matches the mean-absolute-difference
definition, and an evenly balanced corpus yields exactly 0. For the
simplified silhouette: centroids are per-label coordinate means,
distances round to 1e-6 BEFORE the nearest-other min, and s = (b - a)/
max(a, b) stays in [-1, 1].
"""

from __future__ import annotations

import math
from collections import Counter


def test_ks_drift_matches_ecdf_walk(spark, sf_dir):
    from datafusion_nats_spark.queries.timeseries import events_ks_drift
    from datafusion_nats_spark.tables import load

    raw = load(spark, sf_dir, "events").select("ts", "value").collect()
    import calendar

    # constant timezone offsets cancel in the (micros < mid) comparison,
    # so treating the naive timestamps as UTC is split-invariant
    def micros(ts):
        return calendar.timegm(ts.timetuple()) * 1_000_000 + ts.microsecond

    t0 = min(micros(r.ts) for r in raw)
    t1 = max(micros(r.ts) for r in raw)
    mid = (t0 + t1) // 2
    early = Counter()
    late = Counter()
    for r in raw:
        (early if micros(r.ts) < mid else late)[r.value] += 1
    te, tl = sum(early.values()), sum(late.values())
    grid = sorted(set(early) | set(late))
    ce = cl = 0.0
    best = (-1.0, None)
    for v in grid:
        ce += early[v] / te
        cl += late[v] / tl
        d = abs(ce - cl)
        if d > best[0] + 1e-15:
            best = (d, v)
    got = events_ks_drift(spark, sf_dir).collect()
    assert len(got) == 1
    g = got[0]
    assert (g.n_early, g.n_late) == (te, tl)
    assert abs(g.ks_d - best[0]) <= 5.1e-7, (g.ks_d, best[0])
    assert g.ks_at_value == best[1]
    assert 0 <= g.ks_d <= 1


def test_gini_matches_mean_absolute_difference(spark, sf_dir):
    from datafusion_nats_spark.extensions.curation import (
        curation_gini_source_balance,
    )
    from datafusion_nats_spark.tables import load

    raw = load(spark, sf_dir, "documents").select("source").collect()
    counts = Counter(r.source for r in raw)
    xs = sorted(counts.values())
    n = len(xs)
    tot = sum(xs)
    # definitional Gini: mean absolute difference / (2 * mean)
    mad = sum(abs(a - b) for a in xs for b in xs) / (n * n)
    gini_def = mad / (2 * (tot / n))
    got = curation_gini_source_balance(spark, sf_dir).collect()
    assert len(got) == 1
    g = got[0]
    assert (g.n_sources, g.n_docs) == (n, tot)
    assert abs(g.gini - gini_def) <= 5.1e-6, (g.gini, gini_def)
    assert 0 <= g.gini < 1
    if len(set(xs)) == 1:
        assert g.gini == 0.0  # balanced corpus pins the zero exactly


def test_silhouette_matches_centroid_walk(spark, sf_dir):
    from datafusion_nats_spark.extensions.similarity import (
        sim_silhouette_by_label,
    )
    from datafusion_nats_spark.tables import load

    raw = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    ).collect()
    by_label: dict = {}
    for r in raw:
        by_label.setdefault(r.label, []).append([float(x) for x in r.embedding])
    cent = {
        lab: [sum(col) / len(vecs) for col in zip(*vecs)]
        for lab, vecs in by_label.items()
    }

    def dist(v, c):
        return round(math.sqrt(sum((a - b) * (a - b) for a, b in zip(v, c))), 6)

    agg: dict = {}
    for lab, vecs in by_label.items():
        ss = []
        aa = []
        bb = []
        for v in vecs:
            a = dist(v, cent[lab])
            b = min(dist(v, c) for l2, c in cent.items() if l2 != lab)
            ss.append((b - a) / max(a, b))
            aa.append(a)
            bb.append(b)
        agg[lab] = (
            len(vecs),
            sum(ss) / len(ss),
            sum(aa) / len(aa),
            sum(bb) / len(bb),
        )

    got = {
        r.label: (r.n_vecs, r.silhouette, r.mean_intra, r.mean_nearest_other)
        for r in sim_silhouette_by_label(spark, sf_dir).collect()
    }
    assert set(got) == set(agg)
    for lab, (n, s, a, b) in agg.items():
        gn, gs, ga, gb = got[lab]
        assert gn == n, lab
        assert abs(gs - s) <= 5.1e-6, (lab, gs, s)
        assert abs(ga - a) <= 5.1e-6 and abs(gb - b) <= 5.1e-6
        assert -1 <= gs <= 1
