"""Differential property tests for the retrieval operators against
independent first-principles Python references.

The registry oracles mirror the SAME BM25 / phrase spec in DuckDB SQL,
so a shared misreading (idf formulation, length-normalization algebra,
rounding placement, adjacency off-by-one) would pass both engines. The
references here are literal reimplementations from the formulas —
``math.log`` BM25 with explicit sorted-term summation, and a plain
Python adjacency scan — over hypothesis-generated corpora where short
documents, repeated tokens, all-stopword-like degenerate vocabularies,
and absent query terms are common."""

from __future__ import annotations

import math
import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_nats_spark.extensions.retrieval import B, K1, bm25_scores, phrase_match

_SETTINGS = settings(
    max_examples=int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "50")) // 2 or 1,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

VOCAB = ["a", "b", "c", "d", "e"]

corpus_st = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=10),
    min_size=1,
    max_size=8,
)
terms_st = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=3, unique=True)


def _ref_bm25(docs: list[list[str]], terms: list[str]) -> dict[int, float]:
    """Literal BM25 from the formula: Lucene idf, k1/b normalization,
    per-term contributions rounded to 6 decimals, summed in sorted term
    order, total rounded to 6 — the operator's documented contract."""
    n = len(docs)
    df = {t: sum(1 for d in docs if t in d) for t in set(t for d in docs for t in d)}
    avgdl = sum(len(d) for d in docs) / n
    out = {}
    for i, d in enumerate(docs):
        total = 0.0
        matched = False
        for t in sorted(set(terms)):
            tf = d.count(t)
            if tf == 0:
                continue
            matched = True
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            c = idf * (tf * (K1 + 1)) / (tf + K1 * (1 - B + B * len(d) / avgdl))
            total += round(c, 6)
        if matched:
            out[i] = round(total, 6)
    return out


@given(docs=corpus_st, terms=terms_st)
@_SETTINGS
def test_bm25_matches_first_principles_reference(spark, docs, terms):
    ddf = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    tdf = spark.createDataFrame([(0, t) for t in terms], "query_id int, term string")
    got = {
        r.doc_id: r.score for r in bm25_scores(ddf, tdf).collect()
    }
    want = _ref_bm25(docs, terms)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 2e-6, (k, got[k], want[k], docs, terms)


phrase_corpus_st = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=8),
    min_size=1,
    max_size=6,
)


def _ref_phrase(docs: list[list[str]], a: str, b: str):
    out = {}
    for i, d in enumerate(docs):
        pos = [j + 1 for j in range(len(d) - 1) if d[j] == a and d[j + 1] == b]
        if pos:
            out[i] = (len(pos), pos[0])
    return out


@given(
    docs=phrase_corpus_st,
    a=st.sampled_from(VOCAB),
    b=st.sampled_from(VOCAB),
)
@_SETTINGS
def test_phrase_match_matches_adjacency_scan(spark, docs, a, b):
    ddf = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)], "doc_id long, text string"
    )
    pdf = spark.createDataFrame(
        [(0, a, b)], "query_id int, term_a string, term_b string"
    )
    got = {
        r.doc_id: (r.n_occurrences, r.first_pos)
        for r in phrase_match(ddf, pdf).collect()
    }
    assert got == _ref_phrase(docs, a, b), (docs, a, b)
