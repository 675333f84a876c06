"""Independent reference models for `timeseries_periodogram`,
`text_readability_flesch`, and `timeseries_holt_linear`.

Pinned for the periodogram: t is the CALENDAR index from each type's
first observed day (missing days shift nothing), power is the squared
DFT magnitude normalized by the squared mass (so 0 <= power <= 1, with
equality-1 exactly when the series is concentrated in phase), and
every candidate period is emitted for every type. For Flesch: the
vowel-group syllable heuristic, terminal-punctuation sentence runs,
both clamped to >= 1. For Holt: the literal textbook recursion
s_t = a*x_t + (1-a)*(s+b), b_t = beta*(s_t - s) + (1-beta)*b over the 8
newest daily counts in CHRONOLOGICAL order with s1 = x1, b1 = x2 - x1
— re-run step by step in Python, plus the ramp theorem: on a perfectly
linear series Holt's forecast is exact (the property EWMA lacks).
"""

from __future__ import annotations

import math
import re
from collections import Counter

_WS = re.compile(r"\s+", re.ASCII)
_SENT = re.compile(r"[.!?]+")
_SYL = re.compile(r"[aeiouy]+", re.ASCII)


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


def test_periodogram_matches_dft_walk(spark, sf_dir):
    from datafusion_nats_spark.queries.timeseries import (
        PERIODOGRAM_PERIODS,
        timeseries_periodogram,
    )

    by_type = _daily(spark, sf_dir)
    expected = {}
    for typ, series in by_type.items():
        d0 = min(series)
        pts = [((d - d0).days, n) for d, n in series.items()]
        tot = sum(n for _, n in pts)
        for period in PERIODOGRAM_PERIODS:
            sc = sum(n * math.cos(6.283185307179586 * t / period) for t, n in pts)
            ss = sum(n * math.sin(6.283185307179586 * t / period) for t, n in pts)
            expected[(typ, period)] = ((sc * sc + ss * ss) / (tot * tot), len(pts))

    got = {
        (r.event_type, r.period): (r.norm_power, r.n_days)
        for r in timeseries_periodogram(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for k, (p, n_days) in expected.items():
        gp, gn = got[k]
        assert gn == n_days, k
        assert abs(gp - p) <= 5.1e-6, (k, gp, p)
        assert 0 <= gp <= 1 + 1e-9


def test_flesch_matches_regex_walk(spark, sf_dir):
    from datafusion_nats_spark.extensions.text import text_readability_flesch
    from datafusion_nats_spark.tables import load

    raw = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    got = {
        r.doc_id: (r.n_words, r.n_sentences, r.n_syllables, r.flesch_score)
        for r in text_readability_flesch(spark, sf_dir).collect()
    }
    assert set(got) == {r.doc_id for r in raw}
    for r in raw:
        words = len(_WS.split(r.text.strip(" ")))
        sentences = max(len(_SENT.findall(r.text)), 1)
        syllables = max(len(_SYL.findall(r.text.lower())), 1)
        score = 206.835 - 1.015 * (words / sentences) - 84.6 * (syllables / words)
        g = got[r.doc_id]
        assert g[:3] == (words, sentences, syllables), r.doc_id
        assert abs(g[3] - score) <= 5.1e-6, (r.doc_id, g[3], score)


def _holt(xs, a=0.5, b=0.5):
    s, t = xs[0], xs[1] - xs[0]
    for x in xs[1:]:
        s_new = a * x + (1 - a) * (s + t)
        t = b * (s_new - s) + (1 - b) * t
        s = s_new
    return s, t


def test_holt_matches_recursion_and_ramp_theorem(spark, sf_dir):
    from datafusion_nats_spark.queries.timeseries import (
        HOLT_WINDOW,
        timeseries_holt_linear,
    )

    by_type = _daily(spark, sf_dir)
    expected = {}
    for typ, series in by_type.items():
        seq = [n for _, n in sorted(series.items())][-HOLT_WINDOW:]
        if len(seq) == HOLT_WINDOW:
            s, t = _holt(seq)
            expected[typ] = (s, t, s + t)

    got = {
        r.event_type: (r.level, r.trend, r.forecast_next)
        for r in timeseries_holt_linear(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for typ, (s, t, f) in expected.items():
        gs, gt, gf = got[typ]
        assert abs(gs - s) <= 5.1e-6 and abs(gt - t) <= 5.1e-6
        assert abs(gf - f) <= 5.1e-6, (typ, gf, f)
    # ramp theorem: a perfectly linear series is tracked exactly
    ramp = [10.0 + 3.0 * i for i in range(HOLT_WINDOW)]
    s, t = _holt(ramp)
    assert abs(s - ramp[-1]) < 1e-9 and abs(t - 3.0) < 1e-9
    assert abs((s + t) - (ramp[-1] + 3.0)) < 1e-9
