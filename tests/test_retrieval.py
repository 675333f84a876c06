"""Ranked retrieval (extensions/retrieval.py): BM25 scoring properties
on planted corpora, RRF fusion arithmetic on hand-built arms, and the
retrieval-quality eval cross-checked against an independent Python
recomputation from the (oracle-checked) brute-force retriever. The
exact value-level correctness of all three registry entries is carried
by their full DuckDB oracles in the sweep; these tests pin the
BEHAVIORAL contracts a hash compare can't localize."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_nats_spark.extensions.retrieval import (
    RRF_K,
    TOP_K,
    bm25_scores,
    rrf_fuse,
    search_eval_mrr,
    search_hybrid_rrf,
)
from datafusion_nats_spark.extensions.similarity import (
    N_QUERIES,
    sim_bruteforce_topk,
)
from datafusion_nats_spark.tables import load

SF = "/root/testdata/sf0.001"


def _score_map(df):
    return {(r.query_id, r.doc_id): r.score for r in df.collect()}


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _mk_terms(spark, rows):
    return spark.createDataFrame(rows, "query_id int, term string")


def test_bm25_tf_monotone_and_saturating(spark):
    """More occurrences of the query term score higher — but with the
    k1 saturation: the tf 1→2 gain exceeds the tf 2→3 gain (BM25's
    whole point vs raw TF weighting). Docs share a length so length
    normalization cancels."""
    docs = _mk_docs(spark, [
        (1, "rare pad0 pad1 pad2"),
        (2, "rare rare pad1 pad2"),
        (3, "rare rare rare pad2"),
        (4, "pad0 pad1 pad2 pad3"),
    ])
    s = _score_map(bm25_scores(docs, _mk_terms(spark, [(0, "rare")])))
    assert (0, 4) not in s  # no hit → no row, postings semi-join
    assert s[(0, 1)] < s[(0, 2)] < s[(0, 3)]
    assert (s[(0, 2)] - s[(0, 1)]) > (s[(0, 3)] - s[(0, 2)])


def test_bm25_idf_favors_rare_terms(spark):
    """Equal tf and length: a doc matching the corpus-rare term must
    outscore a doc matching the everywhere-term (idf ordering)."""
    docs = _mk_docs(spark, [
        (1, "common rare pad"),
        (2, "common pad pad"),
        (3, "common pad pad"),
        (4, "common pad pad"),
    ])
    s = _score_map(bm25_scores(docs, _mk_terms(
        spark, [(0, "rare"), (1, "common")]
    )))
    assert s[(0, 1)] > s[(1, 1)]


def test_bm25_length_normalization(spark):
    """Same tf of the query term: the shorter document scores higher
    (b > 0 penalizes long documents for the same evidence)."""
    docs = _mk_docs(spark, [
        (1, "rare pad pad"),
        (2, "rare pad pad pad pad pad pad pad pad pad"),
    ])
    s = _score_map(bm25_scores(docs, _mk_terms(spark, [(0, "rare")])))
    assert s[(0, 1)] > s[(0, 2)]


def test_bm25_multi_term_is_sum_of_single_terms(spark):
    """A two-term query's score equals the sum of the single-term
    scores (pinned to the 6-decimal rounding grid) — additivity is what
    lets the postings semi-join scale per-term."""
    docs = _mk_docs(spark, [
        (1, "alpha beta pad pad"),
        (2, "alpha pad pad pad"),
        (3, "beta pad pad pad"),
    ])
    both = _score_map(bm25_scores(docs, _mk_terms(
        spark, [(0, "alpha"), (0, "beta")]
    )))
    single = _score_map(bm25_scores(docs, _mk_terms(
        spark, [(1, "alpha"), (2, "beta")]
    )))
    assert both[(0, 1)] == pytest.approx(
        single[(1, 1)] + single[(2, 1)], abs=2e-6
    )


def test_rrf_fuse_arithmetic_and_missing_arm(spark):
    """Fused score is exactly 1/(K+r1) + 1/(K+r2); a doc present in one
    arm only keeps that arm's contribution (missing arm = 0, rank
    column NULL)."""
    arm0 = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2)], "query_id int, doc_id long, rank int"
    )
    arm1 = spark.createDataFrame(
        [(0, 10, 2), (0, 12, 1)], "query_id int, doc_id long, rank int"
    )
    rows = {r.doc_id: r for r in rrf_fuse([arm0, arm1]).collect()}
    assert rows[10].rrf_score == pytest.approx(
        1 / (RRF_K + 1) + 1 / (RRF_K + 2), abs=1e-6
    )
    assert rows[11].rrf_score == pytest.approx(1 / (RRF_K + 2), abs=1e-6)
    assert rows[11].rank_1 is None
    assert rows[12].rrf_score == pytest.approx(1 / (RRF_K + 1), abs=1e-6)
    assert rows[12].rank_0 is None


def test_hybrid_includes_vector_only_and_keyword_only_hits(spark):
    """Fusion must surface docs that only one arm found: the result
    carries rows with a NULL kw_rank and rows with a NULL vec_rank
    (both arms genuinely contribute on the fixture), and every row has
    at least one arm rank."""
    rows = search_hybrid_rrf(spark, SF).collect()
    assert rows, "hybrid returned nothing"
    assert all(r.kw_rank is not None or r.vec_rank is not None for r in rows)
    assert any(r.kw_rank is None for r in rows), "no vector-only hits fused"
    assert any(r.vec_rank is None for r in rows), "no keyword-only hits fused"
    # fused ranking is per query and dense 1..n
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(int(r.rn))
    for q, rns in by_q.items():
        assert sorted(rns) == list(range(1, len(rns) + 1))


def test_eval_mrr_matches_python_model(spark):
    """search_eval_mrr re-derived from first principles: take the
    oracle-checked brute-force retriever's top-k, join labels, and
    compute MRR / recall@k / precision@k in plain Python — the eval
    operator must agree exactly (on the 6-decimal grid)."""
    labels = {
        r.vec_id: r.label
        for r in load(spark, SF, "embeddings").select("vec_id", "label").collect()
    }
    topk = sim_bruteforce_topk(spark, SF).collect()
    per_q = {}
    for r in topk:
        per_q.setdefault(r.query_id, []).append((int(r.rn), r.neighbor_id))
    got = {r.query_id: r for r in search_eval_mrr(spark, SF).collect()}
    assert set(got) == set(per_q) and len(got) == N_QUERIES
    for q, hits in per_q.items():
        qlabel = labels[q]
        rel_ranks = sorted(rn for rn, nid in hits if labels[nid] == qlabel)
        n_rel_corpus = sum(
            1 for v, l in labels.items() if l == qlabel and v != q
        )
        r = got[q]
        if rel_ranks:
            assert r.first_rel_rank == rel_ranks[0]
            assert r.mrr == pytest.approx(1.0 / rel_ranks[0], abs=1e-6)
        else:
            assert r.first_rel_rank is None and r.mrr == 0.0
        assert r.recall_at_k == pytest.approx(
            len(rel_ranks) / n_rel_corpus, abs=1e-6
        )
        assert r.precision_at_k == pytest.approx(
            len(rel_ranks) / TOP_K, abs=1e-6
        )

def test_phrase_match_adjacency_and_positions(spark):
    """Phrase semantics on a planted corpus: adjacency is strict (a gap
    breaks the phrase), overlapping repeats each count, 1-based first
    position, end-of-document phrases match, non-matching docs are
    absent."""
    from datafusion_nats_spark.extensions.retrieval import phrase_match

    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta gamma"),
            (2, "alpha gamma beta"),
            (3, "x y alpha beta"),
            (4, "alpha alpha alpha"),
        ],
        "doc_id long, text string",
    )
    phrases = spark.createDataFrame(
        [(0, "alpha", "beta"), (1, "alpha", "alpha")],
        "query_id int, term_a string, term_b string",
    )
    got = {
        (r.query_id, r.doc_id): (r.n_occurrences, r.first_pos)
        for r in phrase_match(docs, phrases).collect()
    }
    assert got == {
        (0, 1): (2, 1),   # two occurrences, first at token 1
        (0, 3): (1, 3),   # phrase at end of document
        (1, 4): (2, 1),   # overlapping self-phrase counts both starts
    }


def test_arms_report_covers_all_arms_and_queries(spark):
    """The A/B report grades every arm for every hybrid query, MRR is
    exactly 1/first_rel_rank on the 6-decimal grid (0 when no relevant
    doc reached the arm's pool), and hits within top-k never exceed
    the pool."""
    from datafusion_nats_spark.extensions.retrieval import (
        ARM_K,
        N_Q_HYBRID,
        search_eval_arms_report,
    )

    rows = search_eval_arms_report(spark, SF).collect()
    assert {(r.arm, r.query_id) for r in rows} == {
        (a, q) for a in ("kw", "vec", "rrf") for q in range(N_Q_HYBRID)
    }
    for r in rows:
        if r.first_rel_rank is None:
            assert r.mrr == 0.0
        else:
            assert 1 <= r.first_rel_rank <= ARM_K
            assert abs(r.mrr - 1.0 / r.first_rel_rank) < 2e-6
        assert 0 <= r.n_rel_topk <= TOP_K
