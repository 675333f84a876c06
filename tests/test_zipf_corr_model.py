"""Independent reference models for `text_zipf_law_fit` and
`curation_feature_correlation`.

Both queries and their oracles share the closed-form OLS / Pearson
spec, so a plain-Python pass over the collected corpus re-derives them.
Pinned for Zipf: ranks follow (count DESC, token) over the NON-empty
lowercased vocabulary, the regression runs on natural logs of BOTH
axes, and slope/intercept/R² come from the textbook closed forms. For
the correlation matrix: the three unordered feature pairs appear
exactly once each in canonical order, n counts every document, and
Pearson r is symmetric in the pair (checked by recomputing with the
axes swapped).
"""

from __future__ import annotations

import math
import re
from collections import Counter

_WS = re.compile(r"\s+", re.ASCII)


def test_zipf_fit_matches_closed_form_walk(spark, sf_dir):
    from datafusion_nats_spark.extensions.text import text_zipf_law_fit
    from datafusion_nats_spark.tables import load

    raw = load(spark, sf_dir, "documents").select("text").collect()
    counts: Counter = Counter()
    for r in raw:
        for t in _WS.split(r.text.lower().strip(" ")):
            if t:
                counts[t] += 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    pts = [
        (math.log(rk + 1), math.log(cnt)) for rk, (_, cnt) in enumerate(ranked)
    ]
    n = float(len(pts))
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    syy = sum(y * y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = sy / n - slope * (sx / n)
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))

    got = text_zipf_law_fit(spark, sf_dir).collect()
    assert len(got) == 1
    g = got[0]
    assert g.n_terms == len(ranked)
    assert abs(g.zipf_slope - slope) <= 5.1e-7, (g.zipf_slope, slope)
    assert abs(g.intercept - intercept) <= 5.1e-7
    assert abs(g.r_squared - r2) <= 5.1e-7
    assert -1 <= g.r_squared <= 1 or g.r_squared >= 0  # R² in [0, 1]
    assert 0 <= g.r_squared <= 1


def test_feature_correlation_matches_sums_walk(spark, sf_dir):
    from datafusion_nats_spark.extensions.curation import (
        curation_feature_correlation,
    )
    from datafusion_nats_spark.tables import load

    raw = load(spark, sf_dir, "documents").select("text").collect()
    feats = []
    for r in raw:
        toks = _WS.split(r.text.strip(" "))
        uniq = set(_WS.split(r.text.lower().strip(" ")))
        feats.append(
            {
                "n_chars": float(len(r.text)),
                "n_tokens": float(len(toks)),
                "n_uniq_tokens": float(len(uniq)),
            }
        )

    def pearson(ka, kb):
        xs = [f[ka] for f in feats]
        ys = [f[kb] for f in feats]
        n = float(len(xs))
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        return (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy)
        )

    got = {
        (r.feat_a, r.feat_b): (r.n_docs, r.pearson_r)
        for r in curation_feature_correlation(spark, sf_dir).collect()
    }
    expected_pairs = {
        ("n_chars", "n_tokens"),
        ("n_chars", "n_uniq_tokens"),
        ("n_tokens", "n_uniq_tokens"),
    }
    assert set(got) == expected_pairs
    for (a, b), (n_docs, r_val) in got.items():
        assert n_docs == len(feats)
        assert abs(r_val - pearson(a, b)) <= 5.1e-7, ((a, b), r_val)
        assert abs(r_val - pearson(b, a)) <= 5.1e-7  # symmetry
        assert -1 <= r_val <= 1
