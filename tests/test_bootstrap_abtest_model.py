"""Independent reference models for `agg_bootstrap_ci_mean` and
`events_ab_test_ztest`.

Both are closed-form statistics a plain-Python pass re-derives from the
raw rows. Pinned for the bootstrap: the per-(order, replicate) weight
is EXACTLY the 24-bit md5 uniform pushed through the literal Poisson(1)
CDF thresholds (so the model recomputes identical weights, not merely
similar ones), replicate means use weighted sums, the CI bounds are the
2nd-smallest/2nd-largest order statistics, and the full mean lies
inside the interval. For the z-test: cohorts split on user_id parity,
conversion is max-purchase-value > 250 with no-purchase users counted
as non-converted, and the pooled-variance closed form matches —
including the sign convention (cohort 0 minus cohort 1).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

_POIS1_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
    0.9999167588507119,
)


def _pois_weight(key: str) -> int:
    u = int(hashlib.md5(key.encode()).hexdigest()[:6], 16) / 16777216.0
    for k, t in enumerate(_POIS1_CDF):
        if u < t:
            return k
    return len(_POIS1_CDF)


def test_bootstrap_ci_matches_weight_walk(spark, sf_dir):
    from datafusion_nats_spark.queries.scale_patterns import (
        BOOTSTRAP_B,
        agg_bootstrap_ci_mean,
    )
    from datafusion_nats_spark.tables import load

    raw = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice").collect()
    means = []
    for b in range(BOOTSTRAP_B):
        swx = sw = 0.0
        for r in raw:
            w = _pois_weight(f"{r.o_orderkey}:{b}")
            swx += w * r.o_totalprice
            sw += w
        if sw > 0:
            means.append(swx / sw)
    means.sort()
    ci_lo, ci_hi = means[1], means[-2]
    full = sum(r.o_totalprice for r in raw) / len(raw)

    got = agg_bootstrap_ci_mean(spark, sf_dir).collect()
    assert len(got) == 1
    g = got[0]
    assert g.b_replicates == BOOTSTRAP_B
    assert abs(g.mean_full - full) <= 1e-4  # absolute ~2.5e5 scale
    assert abs(g.ci_lo - ci_lo) <= 1e-4, (g.ci_lo, ci_lo)
    assert abs(g.ci_hi - ci_hi) <= 1e-4
    assert g.ci_lo < g.mean_full < g.ci_hi
    assert g.ci_lo < g.ci_hi


def test_ab_ztest_matches_counting_walk(spark, sf_dir):
    from datafusion_nats_spark.queries.timeseries import events_ab_test_ztest
    from datafusion_nats_spark.tables import load

    raw = load(spark, sf_dir, "events").select(
        "user_id", "event_type", "value"
    ).collect()
    best: dict = {}
    for r in raw:
        best.setdefault(r.user_id, 0.0)
        if r.event_type == "purchase":
            best[r.user_id] = max(best[r.user_id], r.value)
    n = Counter()
    k = Counter()
    for uid, v in best.items():
        c = uid % 2
        n[c] += 1
        if v > 250:
            k[c] += 1
    p = (k[0] + k[1]) / (n[0] + n[1])
    if p <= 0 or p >= 1:
        z = 0.0
    else:
        z = (k[0] / n[0] - k[1] / n[1]) / math.sqrt(
            p * (1 - p) * (1 / n[0] + 1 / n[1])
        )

    got = events_ab_test_ztest(spark, sf_dir).collect()
    assert len(got) == 1
    g = got[0]
    assert (g.n_a, g.conv_a, g.n_b, g.conv_b) == (n[0], k[0], n[1], k[1])
    assert abs(g.rate_a - k[0] / n[0]) <= 5.1e-7
    assert abs(g.rate_b - k[1] / n[1]) <= 5.1e-7
    assert abs(g.z_score - z) <= 5.1e-6, (g.z_score, z)
