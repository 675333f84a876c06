"""Independent reference models for `text_lexical_diversity` and
`text_burrows_delta`.

Both queries and their oracles share the counting spec, so a
plain-Python Counter pass re-derives them. Pinned for lexical
diversity: types/hapaxes come from the LOWERCASED token multiset, every
document appears exactly once, and 0 < TTR <= 1 with hapax counted
against types (not tokens). For Burrows' Delta: the top-token list is
global (count DESC, token tie-break), a source missing a top token
contributes frequency 0 (not a dropped row), z-scores use the
population sigma across sources, Delta is symmetric and zero on the
diagonal by construction, and every returned pair covers the same
non-constant term set.
"""

from __future__ import annotations

import math
import re
from collections import Counter
from itertools import combinations

_WS = re.compile(r"\s+", re.ASCII)


def _toks(text: str) -> list[str]:
    return [t for t in _WS.split(text.lower().strip(" ")) if t]


def test_lexical_diversity_matches_counter_walk(spark, sf_dir):
    from datafusion_nats_spark.extensions.text import text_lexical_diversity
    from datafusion_nats_spark.tables import load

    raw = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    got = {
        r.doc_id: (r.n_tokens, r.n_types, r.ttr, r.n_hapax, r.hapax_share)
        for r in text_lexical_diversity(spark, sf_dir).collect()
    }
    assert set(got) == {r.doc_id for r in raw}
    for r in raw:
        c = Counter(_toks(r.text))
        n_tokens = sum(c.values())
        n_types = len(c)
        n_hapax = sum(1 for v in c.values() if v == 1)
        g = got[r.doc_id]
        assert g[0] == n_tokens and g[1] == n_types and g[3] == n_hapax, r.doc_id
        assert abs(g[2] - n_types / n_tokens) <= 5.1e-7
        assert abs(g[4] - n_hapax / n_types) <= 5.1e-7
        assert 0 < g[2] <= 1


def test_burrows_delta_matches_zscore_walk(spark, sf_dir):
    from datafusion_nats_spark.extensions.text import (
        BURROWS_TOP,
        text_burrows_delta,
    )
    from datafusion_nats_spark.tables import load

    raw = load(spark, sf_dir, "documents").select("source", "text").collect()
    per_source: dict = {}
    for r in raw:
        per_source.setdefault(r.source, Counter()).update(_toks(r.text))
    corpus: Counter = Counter()
    for c in per_source.values():
        corpus.update(c)
    top = [
        tok
        for tok, _ in sorted(corpus.items(), key=lambda kv: (-kv[1], kv[0]))[
            :BURROWS_TOP
        ]
    ]

    sources = sorted(per_source)
    freq = {
        (s, t): per_source[s][t] / sum(per_source[s].values())
        for s in sources
        for t in top
    }
    z = {}
    kept_terms = []
    for t in top:
        fs = [freq[(s, t)] for s in sources]
        n = float(len(fs))
        mean = sum(fs) / n
        var = sum(f * f for f in fs) / n - mean * mean
        if var <= 0:
            continue
        kept_terms.append(t)
        sd = math.sqrt(var)
        for s in sources:
            z[(s, t)] = (freq[(s, t)] - mean) / sd

    expected = {}
    for a, b in combinations(sources, 2):
        ds = [abs(z[(a, t)] - z[(b, t)]) for t in kept_terms]
        expected[(a, b)] = (len(ds), sum(ds) / len(ds))

    got = {
        (r.source_a, r.source_b): (r.n_terms, r.delta)
        for r in text_burrows_delta(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for k, (n_terms, delta) in expected.items():
        g_n, g_d = got[k]
        assert g_n == n_terms, k
        assert abs(g_d - delta) <= 5.1e-6, (k, g_d, delta)
        assert g_d >= 0
