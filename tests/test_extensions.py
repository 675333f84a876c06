"""Behavioral tests for extension operators whose quality can't be
expressed as a DuckDB oracle: ANN recall, MinHash candidate quality,
SimHash locality, multimodal decode plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_ivf_ann_recall_vs_bruteforce(spark, sf_dir):
    from datafusion_nats_spark.extensions.similarity import (
        sim_bruteforce_topk,
        sim_ivf_ann,
    )

    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim_bruteforce_topk(spark, sf_dir).collect()
    }
    approx = {(r.query_id, r.neighbor_id) for r in sim_ivf_ann(spark, sf_dir).collect()}
    recall = len(exact & approx) / len(exact)
    # nprobe=2 of ~10 cells: random-embedding corpora put true neighbors in
    # many cells; this asserts the machinery works, not SOTA recall.
    assert recall >= 0.2, f"IVF recall collapsed: {recall}"
    # every approx hit must be a real vector pair with valid rank
    for r in sim_ivf_ann(spark, sf_dir).collect():
        assert 1 <= r.rn <= 10


@pytest.fixture(scope="module")
def planted_dir(spark, sf_dir, tmp_path_factory):
    """documents table with planted duplicates: docs 0-9 copied under
    doc_id+100000 (exact) — the synthetic corpus has no natural dups."""
    out = str(tmp_path_factory.mktemp("planted"))
    from datafusion_nats_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    copies = docs.filter(F.col("doc_id") < 10).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    docs.unionByName(copies).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_dedup_exact_finds_planted(spark, planted_dir):
    from datafusion_nats_spark.extensions.dedup import dedup_exact

    groups = [r for r in dedup_exact(spark, planted_dir).collect() if r.n_copies > 1]
    canon = {r.canonical_doc for r in groups}
    assert canon == set(range(10))
    assert all(r.n_copies == 2 for r in groups)


def test_minhash_finds_exact_duplicates(spark, planted_dir):
    """Exact duplicates (jaccard=1.0) must collide in ALL LSH bands."""
    from datafusion_nats_spark.extensions.dedup import N_BANDS, dedup_minhash_lsh

    candidates = {
        (r.doc_a, r.doc_b): r.n_shared_bands
        for r in dedup_minhash_lsh(spark, planted_dir).collect()
    }
    for i in range(10):
        assert candidates.get((i, i + 100000)) == N_BANDS, f"exact dup {i} missed by LSH"


def test_simhash_locality(spark, planted_dir):
    """Exact duplicate docs get identical simhash values."""
    from datafusion_nats_spark.extensions.dedup import dedup_simhash

    sims = {r.doc_id: r.simhash32 for r in dedup_simhash(spark, planted_dir).collect()}
    for i in range(10):
        assert sims[i] == sims[i + 100000], f"doc {i} copy got different simhash"


def test_ngram_jaccard_planted(spark, planted_dir):
    """The LSH-candidate verify stage scores planted exact dups at 1.0."""
    from datafusion_nats_spark.extensions.dedup import dedup_ngram_jaccard

    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_ngram_jaccard(spark, planted_dir).collect()
    }
    for (a, b), j in pairs.items():
        assert a < b and 0.0 <= j <= 1.0
    for i in range(10):
        assert pairs.get((i, i + 100000)) == 1.0, f"planted dup {i} not verified"


def test_multimodal_decode_stub_raises():
    from datafusion_nats_spark.extensions.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_multimodal_feature_extract_deterministic(spark, sf_dir):
    from datafusion_nats_spark.extensions.multimodal import (
        fake_decode_features,
        mm_feature_extract,
    )
    from datafusion_nats_spark.tables import load

    feats = {r.doc_id: (r.width, r.height, r.mean_px) for r in mm_feature_extract(spark, sf_dir).collect()}
    docs = {r.doc_id: r.text for r in load(spark, sf_dir, "documents").collect()}
    assert set(feats) == set(docs)
    # spot-check 10 docs against the pure-python function
    for doc_id in list(docs)[:10]:
        assert feats[doc_id] == fake_decode_features(docs[doc_id].encode("utf-8"))


def test_multimodal_frame_sample_shape(spark, sf_dir):
    from datafusion_nats_spark.extensions.multimodal import mm_frame_sample

    rows = mm_frame_sample(spark, sf_dir).collect()
    assert rows, "no frames sampled"
    for r in rows[:50]:
        assert r.frame_idx % 4 == 0  # stride
        assert 1 <= r.frame_len <= 32


def test_text_langid_covers_all_docs(spark, sf_dir):
    from datafusion_nats_spark.extensions.text import text_langid
    from datafusion_nats_spark.tables import load

    n_docs = load(spark, sf_dir, "documents").count()
    out = text_langid(spark, sf_dir)
    assert out.count() == n_docs
    assert set(r.lang_pred for r in out.select("lang_pred").distinct().collect()) <= {
        "en",
        "es",
        "de",
        "fr",
        "zh",
    }


def test_minhash_ml_agrees_with_expression_minhash(spark, planted_dir):
    """The MLlib MinHashLSH candidate path must find (and exactly verify)
    the planted exact duplicates."""
    from datafusion_nats_spark.extensions.ml_variants import dedup_minhash_ml

    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup_minhash_ml(spark, planted_dir).collect()
    }
    for i in range(10):
        assert (i, i + 100000) in pairs, f"planted dup {i} missed by ML LSH"
        assert pairs[(i, i + 100000)] == 1.0


@pytest.mark.parametrize("impl", ["lloyd", "mllib"])
def test_kmeans_ann_recall(spark, sf_dir, impl):
    """Both IVF codebooks — the deterministic Lloyd one (driver-checked)
    and the MLlib KMeans cross-check — must keep useful recall@10 vs the
    exact brute-force baseline."""
    from datafusion_nats_spark.extensions.ml_variants import (
        sim_kmeans_ann,
        sim_kmeans_ann_mllib,
    )
    from datafusion_nats_spark.extensions.similarity import sim_bruteforce_topk

    fn = sim_kmeans_ann if impl == "lloyd" else sim_kmeans_ann_mllib
    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim_bruteforce_topk(spark, sf_dir).collect()
    }
    approx = {(r.query_id, r.neighbor_id) for r in fn(spark, sf_dir).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"KMeans-IVF ({impl}) recall collapsed: {recall}"


def test_pq_ann_recall(spark, sf_dir):
    """ADC-over-codes candidate generation + exact rerank must keep
    useful recall@10 vs brute force, and emit exactly TOP_K valid ranks
    per query."""
    from datafusion_nats_spark.extensions.pq import sim_pq_ann
    from datafusion_nats_spark.extensions.similarity import sim_bruteforce_topk

    exact = {
        (r.query_id, r.neighbor_id)
        for r in sim_bruteforce_topk(spark, sf_dir).collect()
    }
    rows = sim_pq_ann(spark, sf_dir).collect()
    approx = {(r.query_id, r.neighbor_id) for r in rows}
    recall = len(exact & approx) / len(exact)
    # 16-entry sampled codebooks on random 64-d data: this asserts the
    # ADC machinery ranks usefully, not SOTA recall.
    assert recall >= 0.2, f"PQ recall collapsed: {recall}"
    per_q = {}
    for r in rows:
        assert 1 <= r.rn <= 10
        per_q.setdefault(r.query_id, set()).add(r.rn)
    assert all(ranks == set(range(1, 11)) for ranks in per_q.values())


def test_semdedup_drops_planted_exact_duplicate(spark, sf_dir, tmp_path_factory):
    """An exact copy of vec 0 (cosine 1.0, necessarily the same Lloyd
    cell) must be dropped with max_dup_cosine == 1.0; its lower-id twin
    must survive; every vector appears exactly once in the output."""
    out = str(tmp_path_factory.mktemp("semdup"))
    from datafusion_nats_spark.extensions.semdedup import dedup_semantic_semdedup
    from datafusion_nats_spark.tables import load

    emb = load(spark, sf_dir, "embeddings")
    twin = emb.filter(F.col("vec_id") == 0).withColumn("vec_id", F.lit(900000).cast("long"))
    emb.unionByName(twin).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    rows = dedup_semantic_semdedup(spark, out).collect()
    by_id = {r.vec_id: r for r in rows}
    assert len(rows) == len(by_id) == emb.count() + 1
    assert by_id[900000].kept is False
    assert by_id[900000].max_dup_cosine == 1.0
    assert by_id[0].kept is True or by_id[0].max_dup_cosine < 1.0  # twin never drops the original
    assert by_id[900000].cell == by_id[0].cell


def test_connected_components_groups_planted_triangle(spark, sf_dir, tmp_path_factory):
    """Three exact copies of one doc + two of another → two components,
    each labeled by its minimum doc_id."""
    out = str(tmp_path_factory.mktemp("cc"))
    from datafusion_nats_spark.extensions.dedup import dedup_connected_components
    from datafusion_nats_spark.tables import load

    docs = load(spark, sf_dir, "documents")
    tri = docs.filter(F.col("doc_id") == 0)
    duo = docs.filter(F.col("doc_id") == 1)
    planted = docs
    for new_id, base in [(100001, tri), (100002, tri), (200001, duo)]:
        planted = planted.unionByName(base.withColumn("doc_id", F.lit(new_id).cast("long")))
    planted.write.mode("overwrite").parquet(f"{out}/documents.parquet")

    comp = {r.doc_id: r.component for r in dedup_connected_components(spark, out).collect()}
    assert comp[0] == comp[100001] == comp[100002] == 0
    assert comp[1] == comp[200001] == 1


def test_hll_partial_merge_accuracy(spark, sf_dir):
    # The merged two-level sketch estimate must track the exact distinct
    # count within HLL's expected error (lgConfigK=12 -> ~1.6% sigma; 5%
    # is a >3-sigma bound).
    from datafusion_nats_spark.queries.aggregates import agg_hll_partial_merge
    from datafusion_nats_spark.tables import load

    approx = {
        r.event_type: r.approx_users
        for r in agg_hll_partial_merge(spark, sf_dir).collect()
    }
    exact = {
        r.event_type: r.n
        for r in load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(2, 0.05 * n), (et, approx[et], n)


def test_approx_percentile_accuracy(spark, sf_dir):
    # GK guarantees RANK error (<= n/accuracy), not value error — in a
    # sparse tail the value gap can be large while the rank is spot-on.
    # Assert each estimate's true cumulative rank is within 0.5% of the
    # requested quantile (the guarantee at accuracy=10000 is 0.01%).
    from datafusion_nats_spark.queries.aggregates import agg_approx_percentile
    from datafusion_nats_spark.tables import load

    approx = {
        r.event_type: (r.p50_approx, r.p99_approx)
        for r in agg_approx_percentile(spark, sf_dir).collect()
    }
    ev = load(spark, sf_dir, "events")
    for et, (p50, p99) in approx.items():
        grp = ev.filter(F.col("event_type") == et)
        n = grp.count()
        for target, est in ((0.5, p50), (0.99, p99)):
            rank = grp.filter(F.col("value") <= est).count() / n
            assert abs(rank - target) <= 0.005, (et, target, est, rank)


def test_kll_quantile_sketch_accuracy(spark, sf_dir):
    # The reduce-merged KLL sketch must put its p50/p90 estimates within
    # KLL's rank-error bound of the exact order statistics: k=200 gives
    # ~1.65% normalized rank error at 99% confidence; 4% is generous.
    from datafusion_nats_spark.queries.aggregates import agg_kll_quantile_sketch
    from datafusion_nats_spark.tables import load

    est = {
        r.event_type: (r.n_values, r.p50_est, r.p90_est)
        for r in agg_kll_quantile_sketch(spark, sf_dir).collect()
    }
    ev = load(spark, sf_dir, "events")
    exact_n = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(est) == set(exact_n)
    for et, (n, p50, p90) in est.items():
        assert n == exact_n[et]  # merge must not lose values
        # measure the *rank* of each estimate in the exact distribution
        vals = ev.filter(F.col("event_type") == et)
        total = exact_n[et]
        for target, estimate in ((0.5, p50), (0.9, p90)):
            rank = vals.filter(F.col("value") <= estimate).count() / total
            assert abs(rank - target) < 0.04, (et, target, estimate, rank)


def test_dsir_selects_from_raw_pool_only(spark, sf_dir):
    """DSIR must emit exactly K non-target documents, weight-sorted with
    the doc_id tie-break."""
    from datafusion_nats_spark.extensions.dsir import K, TARGET, curation_dsir_importance

    rows = curation_dsir_importance(spark, sf_dir).collect()
    assert len(rows) == K
    assert all(r.source != TARGET for r in rows)
    ws = [(r.dsir_logw, -r.doc_id) for r in rows]
    assert ws == sorted(ws, reverse=True)


def test_containment_on_planted_exact_dups(spark, planted_dir):
    """Exact duplicates have identical capped shingle sets, so both
    directional containments must be 1.0; every score stays in [0, 1]
    and dominates the symmetric Jaccard (smaller denominator)."""
    from datafusion_nats_spark.extensions.dedup import dedup_shingle_containment

    pairs = {
        (r.doc_a, r.doc_b): (r.contain_a_in_b, r.contain_b_in_a)
        for r in dedup_shingle_containment(spark, planted_dir).collect()
    }
    for (a, b), (cab, cba) in pairs.items():
        assert a < b and 0.0 <= cab <= 1.0 and 0.0 <= cba <= 1.0
    for i in range(10):
        assert pairs.get((i, i + 100000)) == (1.0, 1.0), f"planted dup {i} not contained"


def test_bpe_learns_expected_merges_on_worked_example(spark, tmp_path_factory):
    """The canonical BPE worked example: corpus {low x5, lower x2,
    newest x6, widest x3}. Hand-computed rounds: (e,s) at 9 beats (s,t)
    at 9 lexicographically; then (es,t) at 9; then (l,o) at 7 beats
    (o,w) lexicographically."""
    from datafusion_nats_spark.extensions.bpe import text_bpe_merges

    out = str(tmp_path_factory.mktemp("bpe"))
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    spark.createDataFrame(
        [(0, text, "en", "src0", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    rows = sorted(
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
        for r in text_bpe_merges(spark, out).collect()
    )
    assert rows == [(1, "e", "s", 9), (2, "es", "t", 9), (3, "l", "o", 7)]

    from datafusion_nats_spark.extensions.bpe import text_bpe_segment

    seg = {r.segmented: (r.n_symbols, r.wc) for r in text_bpe_segment(spark, out).collect()}
    assert seg == {
        "lo w": (2, 5),
        "lo w e r": (4, 2),
        "n e w est": (4, 6),
        "w i d est": (4, 3),
    }


def test_coreset_radii_nonincreasing(spark, sf_dir):
    """The k-center greedy invariant: each added center's coverage
    radius (min distance to the prior selection) can only shrink as the
    selection grows; ranks are 1..K over distinct vectors."""
    from datafusion_nats_spark.extensions.coreset import K_CENTERS, curation_coreset_kcenter

    rows = sorted(curation_coreset_kcenter(spark, sf_dir).collect(), key=lambda r: r.sel_rank)
    assert [r.sel_rank for r in rows] == list(range(1, K_CENTERS + 1))
    assert len({r.vec_id for r in rows}) == K_CENTERS
    assert rows[0].coverage_radius is None
    radii = [r.coverage_radius for r in rows[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:])), radii


def test_mmr_greedy_invariants(spark, sf_dir):
    """Rank 1 is the pure-relevance argmax (score == relevance, no
    penalty); from rank 2 on the greedy MMR objective is non-increasing
    and each score equals lambda*rel - (1-lambda)*max_sim."""
    from datafusion_nats_spark.extensions.mmr import K_SELECT, LAM, sim_mmr_rerank

    rows = sorted(sim_mmr_rerank(spark, sf_dir).collect(), key=lambda r: r.mmr_rank)
    assert [r.mmr_rank for r in rows] == list(range(1, K_SELECT + 1))
    assert len({r.vec_id for r in rows}) == K_SELECT
    assert rows[0].max_sim is None and rows[0].mmr_score == rows[0].relevance
    for r in rows[1:]:
        # 1.1e-6 tolerance: python round() is half-even, the engines are
        # half-up — exact equality can differ by one ulp-of-rounding
        assert abs(r.mmr_score - (LAM * r.relevance - (1 - LAM) * r.max_sim)) < 1.1e-6
    scores = [r.mmr_score for r in rows[1:]]
    assert all(a >= b for a, b in zip(scores, scores[1:])), scores


def test_triangle_count_matches_naive_enumeration(spark, sf_dir):
    """The degree-oriented count must equal an INDEPENDENT naive
    id-ordered triple join over the same kNN graph (DuckDB), and each
    triangle contributes exactly 3 vertex participations."""
    import duckdb

    from datafusion_nats_spark.extensions.graph import KNN_K, graph_knn_triangles

    rows = graph_knn_triangles(spark, sf_dir).collect()
    total_participation = sum(r.n_triangles for r in rows)
    assert total_participation > 0 and total_participation % 3 == 0
    naive = duckdb.sql(f"""
        WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) emb
                   FROM '{sf_dir}/embeddings.parquet'),
        pairs AS (
          SELECT a.vec_id u, b.vec_id v,
            round(list_sum(list_transform(list_zip(a.emb,b.emb), p->p[1]*p[2]))
            / (sqrt(list_sum(list_transform(a.emb, x->x*x)))
               * sqrt(list_sum(list_transform(b.emb, x->x*x)))),6) AS c
          FROM e a JOIN e b ON a.label=b.label AND a.vec_id != b.vec_id
        ),
        knn AS (SELECT u, v FROM (SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY c DESC, v) rn
                                  FROM pairs) WHERE rn <= {KNN_K}),
        und AS (SELECT DISTINCT least(u,v) x, greatest(u,v) y FROM knn)
        SELECT count(*) FROM und a JOIN und b ON a.x = b.x AND a.y < b.y
        JOIN und c ON c.x = a.y AND c.y = b.y
    """).fetchone()[0]
    assert total_participation == 3 * naive


def test_hard_negative_mining_invariants(spark, sf_dir):
    """Per anchor: the positive must share the anchor's label, the hard
    negative must differ in label but share the anchor's k-means cell,
    and neither may be the anchor itself."""
    from datafusion_nats_spark.extensions.contrastive import sim_hard_negative_mining
    from datafusion_nats_spark.extensions.ml_variants import lloyd_assignments
    from datafusion_nats_spark.tables import load

    rows = sim_hard_negative_mining(spark, sf_dir).collect()
    assert rows
    labels = {
        r.vec_id: r.label
        for r in load(spark, sf_dir, "embeddings").select("vec_id", "label").collect()
    }
    assigned, _ = lloyd_assignments(spark, sf_dir)
    cells = {r.vec_id: r.cell for r in assigned.select("vec_id", "cell").collect()}
    for r in rows:
        assert r.pos_id != r.anchor_id
        assert labels[r.pos_id] == r.label
        if r.neg_id is not None:
            assert labels[r.neg_id] != r.label
            assert cells[r.neg_id] == cells[r.anchor_id]


def test_domain_caps_never_exceed_cap(spark, sf_dir):
    from datafusion_nats_spark.extensions.curation import (
        DOMAIN_CAP,
        curation_domain_caps,
    )

    for r in curation_domain_caps(spark, sf_dir).collect():
        assert r.n_kept <= DOMAIN_CAP
        assert r.n_kept + r.n_dropped == r.n_docs
        assert r.n_kept == min(r.n_docs, DOMAIN_CAP)


def test_ewma_stays_within_window_envelope(spark, sf_dir):
    """EWMA is a convex combination of the window's samples, so it must
    lie within [min, max] of the last 8 values per user (checked on a
    sample of users)."""
    from datafusion_nats_spark.queries.timeseries import timeseries_ewma_smooth
    from datafusion_nats_spark.tables import load

    out = {
        (r.user_id, r.event_id): r.ewma
        for r in timeseries_ewma_smooth(spark, sf_dir).collect()
    }
    ev = sorted(
        load(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    by_user: dict = {}
    checked = 0
    for r in ev:
        hist = by_user.setdefault(r.user_id, [])
        hist.append(r)
        window = [x.value for x in hist[-8:]]
        ewma = out[(r.user_id, r.event_id)]
        assert min(window) - 1e-6 <= ewma <= max(window) + 1e-6
        checked += 1
    assert checked == len(ev)


def test_incremental_dedup_catches_planted_near_dup(spark, sf_dir, tmp_path):
    """Plant a new-batch doc that is a verbatim copy of an old-corpus doc
    through the batch operator's own machinery: every exact copy MUST
    collide on all bands with its source."""
    from datafusion_nats_spark.extensions.dedup import dedup_incremental_new_batch
    from datafusion_nats_spark.tables import load

    # the operator splits corpus docs by doc_id % 5; exact duplicates in
    # the corpus (dedup_exact groups) that straddle the split boundary are
    # natural planted pairs — verify any new doc whose text equals an old
    # doc's text is flagged
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    text_by_id = {r.doc_id: " ".join(r.text.lower().split()) for r in docs}
    old_texts = {
        t for i, t in text_by_id.items() if i % 5 != 0 and len(t.split()) >= 3
    }
    expected_dups = {
        i
        for i, t in text_by_id.items()
        if i % 5 == 0 and t in old_texts and len(t.split()) >= 3
    }
    got = {
        r.doc_id: r.is_dup for r in dedup_incremental_new_batch(spark, sf_dir).collect()
    }
    for i in expected_dups:
        assert got[i], f"exact copy {i} not flagged against the corpus index"


def test_approx_count_distinct_error_regime(spark, sf_dir):
    """The high-cardinality HLL++ regime that agg_approx_distinct's
    calendar-bounded keys deliberately avoid: on an unbounded key the
    estimate lands within a few relative standard deviations of truth
    but need not be exact — the scale/accuracy trade the operator
    exists for, pinned here where an exact oracle is the wrong
    contract."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    truth = li.select("l_orderkey").distinct().count()
    est = li.agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("e")
    ).collect()[0]["e"]
    assert est != 0
    assert abs(est - truth) <= max(0.06 * truth, 1), (est, truth)


def test_lsh_bucket_cap_bounds_mega_cluster(spark, tmp_path_factory):
    """Plant a 500-doc near-dup mega-cluster in the NEW batch against 40
    old-corpus copies of the same text: the batch-internal cluster evades
    the df>MAX_DF ban (the banned list is computed from the OLD corpus
    only, where df=40), so without the bucket cap one (band_id, band_key)
    bucket holds all 540 docs and the probe join goes quadratic. The cap
    must bound every bucket to BUCKET_CAP and the capped semantics must
    still hash-match the DuckDB oracle (the one regime the shipped
    testdata never reaches)."""
    from pyspark.sql import functions as F

    from datafusion_nats_spark.extensions.dedup import (
        BUCKET_CAP,
        _banded_signatures,
        _cap_buckets,
        _shingles_spark,
        dedup_incremental_new_batch,
    )
    from datafusion_nats_spark.registry import REGISTRY
    from tests.parity import compare

    cluster_text = (
        "the quick brown fox jumps over the lazy dog near the riverbank today"
    )
    rows = []
    old_ids = [i for i in range(1, 200) if i % 5 != 0][:40]
    new_ids = [5 * k for k in range(1, 501)]  # 500 new docs, doc_id % 5 == 0
    for i in old_ids + new_ids:
        rows.append((i, cluster_text, "en", "planted", len(cluster_text)))
    # filler: unique texts so the corpus isn't degenerate
    for j, i in enumerate([i for i in range(200, 320) if i % 5 != 0][:20]):
        t = f"completely unrelated filler document number {j} with its own distinct words {j * 7} and {j * 13}"
        rows.append((i, t, "en", "planted", len(t)))
    out = str(tmp_path_factory.mktemp("megacluster"))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).repartition(4).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    docs = spark.read.parquet(f"{out}/documents.parquet")
    shingled = docs.select(
        "doc_id", F.explode(_shingles_spark(F.col("text"))).alias("shingle")
    )
    uncapped = _banded_signatures(shingled)
    max_uncapped = (
        uncapped.groupBy("band_id", "band_key")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    # negative control: the planted cluster really does create the bad shape
    assert max_uncapped == 540 > BUCKET_CAP
    max_capped = (
        _cap_buckets(uncapped)
        .groupBy("band_id", "band_key")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.max("n"))
        .collect()[0][0]
    )
    assert max_capped <= BUCKET_CAP

    # the operator stays bounded: no new doc can report more matches than
    # one bucket can hold
    result = dedup_incremental_new_batch(spark, out)
    assert result.agg(F.max("n_matches")).collect()[0][0] <= BUCKET_CAP
    # and the capped semantics still hash-match the oracle IN the binding
    # regime (testdata buckets never exceed ~12, so only this planted
    # corpus exercises the cap's oracle twin)
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{out}/documents.parquet/*.parquet'"  # Spark wrote a directory
    )
    compare(result, con, REGISTRY["dedup_incremental_new_batch"].oracle)


def test_label_propagation_invariants(spark, sf_dir):
    """Per-round community sizes must each sum to the (constant) node
    count; every community label must be a real node id of the graph;
    and the trajectory must end no finer than it starts (bounded by the
    round-1 community count — sync-LPA on this dense bipartite graph
    coarsens toward its fixed point)."""
    from datafusion_nats_spark.extensions.graph import (
        _LPA_ROUNDS,
        graph_label_propagation,
    )
    from datafusion_nats_spark.tables import load
    from pyspark.sql import functions as F

    rows = graph_label_propagation(spark, sf_dir).collect()
    rounds = sorted({r.round for r in rows})
    assert rounds == list(range(1, _LPA_ROUNDS + 1))

    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    n_nodes = (
        pairs.select(F.concat(F.lit("c"), F.col("o_custkey")).alias("n"))
        .unionByName(pairs.select(F.concat(F.lit("s"), F.col("l_suppkey")).alias("n")))
        .distinct()
        .count()
    )
    node_ids = {
        r.n
        for r in pairs.select(F.concat(F.lit("c"), F.col("o_custkey")).alias("n"))
        .unionByName(pairs.select(F.concat(F.lit("s"), F.col("l_suppkey")).alias("n")))
        .distinct()
        .collect()
    }
    per_round = {}
    for r in rows:
        per_round.setdefault(r.round, []).append(r)
        assert r.community in node_ids, r.community
        assert r.size >= 1
    for rnd, rs in per_round.items():
        assert sum(r.size for r in rs) == n_nodes, (rnd, n_nodes)
    assert len(per_round[rounds[-1]]) <= len(per_round[rounds[0]])


def test_collapse_leaves_no_verified_near_dup_pair(spark, sf_dir):
    """End-to-end safety property of the dedup OUTPUT stage that the
    oracles cannot express: after collapse-to-canonical, NO verified
    near-duplicate pair (exact Jaccard >= 0.8 on capped shingle sets)
    has both endpoints surviving, and the min-label components are a
    true fixed point (every verified edge connects same-label docs,
    every label is the min doc_id of its component)."""
    from datafusion_nats_spark.extensions.dedup import (
        dedup_collapse_keep_canonical,
        dedup_connected_components,
        dedup_ngram_jaccard,
    )

    edges = [
        (r.doc_a, r.doc_b)
        for r in dedup_ngram_jaccard(spark, sf_dir).collect()
        if r.jaccard >= 0.8
    ]
    label = {
        r.doc_id: r.component
        for r in dedup_connected_components(spark, sf_dir).collect()
    }
    survivors = {r.doc_id for r in dedup_collapse_keep_canonical(spark, sf_dir).collect()}

    assert edges, "planted near-dups must produce verified edges at this SF"
    for a, b in edges:
        assert label[a] == label[b], (a, b, label[a], label[b])  # fixed point
        assert not (a in survivors and b in survivors), (a, b)  # no pair survives
    # each component's label is its min member; exactly that member survives
    comp_members: dict = {}
    for doc, comp in label.items():
        comp_members.setdefault(comp, []).append(doc)
    for comp, members in comp_members.items():
        assert comp == min(members), (comp, members)
        assert [d for d in members if d in survivors] == [comp]
    # conservation: survivors = all docs minus non-canonical members
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    dropped = {d for d, c in label.items() if d != c}
    assert len(survivors) == n_docs - len(dropped)


def test_sequence_packing_is_contiguous_and_conserving(spark, sf_dir):
    """Packing invariants the aggregate oracle can't see: per language
    the concat stream starts at offset 0, every document's start_off is
    exactly the previous document's start_off + n_tok (no gaps, no
    overlaps, no doc packed twice), and bin arithmetic is consistent
    with the stream offsets."""
    from datafusion_nats_spark.extensions.curation import (
        PACK_BIN,
        curation_sequence_packing,
    )

    rows = curation_sequence_packing(spark, sf_dir).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    assert len({r.doc_id for r in rows}) == len(rows)  # each doc packed once
    for lang, rs in by_lang.items():
        rs.sort(key=lambda r: r.start_off)
        assert rs[0].start_off == 0, lang
        for prev, cur in zip(rs, rs[1:]):
            assert cur.start_off == prev.start_off + prev.n_tok, (lang, prev, cur)
        for r in rs:
            assert r.n_tok >= 1
            assert r.first_bin == r.start_off // PACK_BIN
            last_bin = (r.start_off + r.n_tok - 1) // PACK_BIN
            assert r.bins_spanned == last_bin - r.first_bin + 1


def test_split_is_exhaustive_and_balanced(spark, sf_dir):
    """The 80/10/10 split covers every document exactly once (doc and
    char totals are conserved) and the hash-bucket fractions land near
    their targets — a skewed-md5 or off-by-one bucket bug shifts the
    band."""
    from datafusion_nats_spark.extensions.curation import curation_split_train_val_test

    rows = {r.split: r for r in curation_split_train_val_test(spark, sf_dir).collect()}
    assert set(rows) == {"train", "val", "test"}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n, chars = docs.count(), docs.agg(F.sum("n_chars")).first()[0]
    assert sum(r.n_docs for r in rows.values()) == n
    assert sum(r.total_chars for r in rows.values()) == chars
    frac_train = rows["train"].n_docs / n
    assert 0.70 <= frac_train <= 0.90, frac_train
    assert rows["val"].n_docs > 0 and rows["test"].n_docs > 0


# --------------------------------------------------------------------------
# perceptual-hash near-dup (mm_phash_near_dup)
# --------------------------------------------------------------------------


def test_perceptual_hash_kernel():
    from datafusion_nats_spark.extensions.multimodal import perceptual_hash

    # constant payload: no slice mean strictly exceeds the global mean
    assert perceptual_hash(bytes([7] * 64)) == 0
    # monotone ramp over 64 bytes -> 2-byte buckets with increasing means;
    # exactly the top 16 buckets exceed the global mean of 31.5
    assert perceptual_hash(bytes(range(64))) == 0xFFFF0000


def test_phash_planted_exact_dup(spark, planted_dir):
    """Byte-identical payloads fingerprint identically, collide in every
    band, and survive the verify at hamming 0."""
    from datafusion_nats_spark.extensions.multimodal import (
        PHASH_BUCKETS,
        mm_phash_near_dup,
    )
    from datafusion_nats_spark.tables import load

    eligible = {
        r.doc_id
        for r in load(spark, planted_dir, "documents")
        .filter(
            (F.col("doc_id") < 10)
            & (F.octet_length(F.encode(F.col("text"), "utf-8")) >= PHASH_BUCKETS)
        )
        .collect()
    }
    assert eligible, "fixture regression: no planted doc is >= 32 bytes"
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in mm_phash_near_dup(spark, planted_dir).collect()
    }
    for d in eligible:
        assert pairs.get((d, d + 100000)) == 0, f"planted copy of {d} missed"


def test_phash_pairs_are_verified(spark, sf_dir):
    """Every emitted pair is ordered and within the Hamming budget —
    band collisions alone never leak through the verify."""
    from datafusion_nats_spark.extensions.multimodal import (
        PHASH_HAM_MAX,
        mm_phash_near_dup,
    )

    rows = mm_phash_near_dup(spark, sf_dir).collect()
    assert rows, "corpus should contain at least one near-dup pair"
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0 <= r.hamming <= PHASH_HAM_MAX


# --------------------------------------------------------------------------
# exact-substring collapse (text_span_collapse)
# --------------------------------------------------------------------------


def test_span_collapse_keeps_each_span_once(spark, sf_dir):
    """Global conservation: across the whole corpus each distinct span
    hash survives exactly once, and kept counts roll up."""
    from datafusion_nats_spark.extensions.text import text_span_collapse

    rows = text_span_collapse(spark, sf_dir).collect()
    # per-doc sanity
    for r in rows:
        assert 0 <= r.n_kept <= r.n_spans
        assert (r.cleaned_text is None) == (r.n_kept == 0)
    # corpus-level: total kept == number of distinct spans (each exactly once)
    import duckdb

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    n_spans, n_distinct = con.execute(
        """
        WITH t AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
          FROM documents
        ), chunks AS (
          SELECT doc_id, md5(array_to_string(toks[s+1:s+20], ' ')) AS h
          FROM (SELECT doc_id, toks, unnest(range(0, len(toks), 20)) AS s FROM t)
        )
        SELECT count(*), count(DISTINCT h) FROM chunks
        """
    ).fetchone()
    assert sum(r.n_spans for r in rows) == n_spans
    assert sum(r.n_kept for r in rows) == n_distinct


def test_span_collapse_planted_copy_collapses_to_null(spark, planted_dir):
    """A byte-identical later copy contributes no first occurrences: every
    span already exists in the lower-doc_id original, so the copy keeps 0
    spans and its cleaned text is NULL while the original keeps all."""
    from datafusion_nats_spark.extensions.text import text_span_collapse

    rows = {r.doc_id: r for r in text_span_collapse(spark, planted_dir).collect()}
    for d in range(10):
        orig, copy = rows[d], rows[d + 100000]
        assert copy.n_kept == 0 and copy.cleaned_text is None
        assert orig.n_kept >= 1
        assert orig.n_spans == copy.n_spans


def test_span_collapse_within_doc_repeats(spark, tmp_path):
    """The round-9 skew rewrite pre-aggregates per (h, doc_id) before
    picking the global first owner; within-document repeats are the
    delicate path — a span repeated k times in one doc must count k
    times in n_spans yet keep at most its FIRST copy, and a later doc
    carrying the same span keeps none."""
    from datafusion_nats_spark.extensions.text import (
        SPAN_TOKENS,
        text_span_collapse,
    )

    span_a = " ".join(f"a{i}" for i in range(SPAN_TOKENS))
    span_b = " ".join(f"b{i}" for i in range(SPAN_TOKENS))
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    spark.createDataFrame(
        [
            # doc 1: span_a three times then span_b → 4 spans, keeps 2
            (1, " ".join([span_a, span_a, span_a, span_b])),
            # doc 2: span_a twice → 2 spans, keeps 0 (doc 1 owns it)
            (2, " ".join([span_a, span_a])),
        ],
        "doc_id long, text string",
    ).write.parquet(str(corpus / "documents.parquet"))
    rows = {r.doc_id: r for r in text_span_collapse(spark, str(corpus)).collect()}
    assert rows[1].n_spans == 4 and rows[1].n_kept == 2
    assert rows[1].cleaned_text == f"{span_a} {span_b}"
    assert rows[2].n_spans == 2 and rows[2].n_kept == 0
    assert rows[2].cleaned_text is None


# --------------------------------------------------------------------------
# PCA via integer-exact covariance + normalized squaring
# --------------------------------------------------------------------------


def test_pca_matches_numpy_eigh(spark, sf_dir):
    """The registered query's oracle pins engine parity; this pins that
    both engines converge to the TRUE top component: covariance built
    exactly as the operator does (micro-unit integers), eigendecomposed
    by LAPACK, compared to the operator's output."""
    import duckdb
    import numpy as np

    from datafusion_nats_spark.extensions.pca import sim_pca_power_iteration

    rows = sorted(
        sim_pca_power_iteration(spark, sf_dir).collect(), key=lambda r: r.dim
    )
    assert [r.dim for r in rows] == list(range(1, 65))
    con = duckdb.connect()
    emb = con.execute(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet'"
    ).fetchall()
    x = np.array([np.round(np.array(e[0], dtype=np.float64) * 1e6) for e in emb])
    n = len(x)
    cov = (x.T @ x * n - np.outer(x.sum(0), x.sum(0))) / (n * n) / 1e12
    w, vmat = np.linalg.eigh(cov)
    v1 = vmat[:, -1]
    v1 = v1 * np.sign(v1[np.argmax(np.abs(v1))])
    assert abs(rows[0].eigenvalue - w[-1]) < 1e-4
    assert np.max(np.abs(v1 - np.array([r.loading for r in rows]))) < 1e-3
    assert abs(rows[0].explained_frac - w[-1] / np.trace(cov)) < 1e-4


def test_pca_output_invariants(spark, sf_dir):
    from datafusion_nats_spark.extensions.pca import sim_pca_power_iteration

    rows = sim_pca_power_iteration(spark, sf_dir).collect()
    norm_sq = sum(r.loading**2 for r in rows)
    assert abs(norm_sq - 1.0) < 1e-4, norm_sq
    assert all(r.eigenvalue > 0 for r in rows)
    assert all(0.0 < r.explained_frac < 1.0 for r in rows)
    # deterministic sign: the largest-|loading| component is positive
    top = max(rows, key=lambda r: abs(r.loading))
    assert top.loading > 0


def test_phash_index_probe_ingest_loop(spark, sf_dir, tmp_path):
    """The image-ingest loop: duplicates of stored docs screen as dups,
    novel and too-short payloads pass, and an accepted doc folded back
    via phash_index_update is caught by the next probe."""
    from pyspark.sql import Row

    from datafusion_nats_spark.extensions.dedup import NEW_BATCH_MOD
    from datafusion_nats_spark.extensions.multimodal import (
        PHASH_BUCKETS,
        phash_index_build,
        phash_index_probe,
        phash_index_update,
    )
    from datafusion_nats_spark.tables import load

    index_dir = phash_index_build(
        spark, sf_dir, index_dir=str(tmp_path / "phash_idx")
    )
    stored_copies = (
        load(spark, sf_dir, "documents")
        .filter(
            (F.col("doc_id") % NEW_BATCH_MOD != 0)
            & (F.octet_length(F.encode(F.col("text"), "utf-8")) >= PHASH_BUCKETS)
        )
        .orderBy("doc_id")
        .limit(3)
        .select((F.col("doc_id") + 900000).alias("doc_id"), "text")
    )
    verdicts = {
        r.doc_id: r for r in phash_index_probe(spark, index_dir, stored_copies).collect()
    }
    assert len(verdicts) == 3
    for r in verdicts.values():
        assert r.is_dup and r.n_matches >= 1 and r.first_match is not None

    novel_text = "zq" + "xkvjwpbfyg hmtrlcdnsz " * 4  # ≥32 bytes, not in corpus
    batch2 = spark.createDataFrame(
        [
            Row(doc_id=900100, text=novel_text),
            Row(doc_id=900101, text="short"),  # < 32 bytes: unscreenable
        ]
    )
    v2 = {r.doc_id: r for r in phash_index_probe(spark, index_dir, batch2).collect()}
    assert not v2[900100].is_dup
    assert not v2[900101].is_dup and v2[900101].n_matches == 0

    # accept the novel doc, fold it in, and re-probe an identical copy
    phash_index_update(
        spark, index_dir, batch2.filter(F.col("doc_id") == 900100)
    )
    recheck = spark.createDataFrame([Row(doc_id=900200, text=novel_text)])
    v3 = phash_index_probe(spark, index_dir, recheck).collect()[0]
    assert v3.is_dup and v3.first_match == 900100


def test_pca_projection_is_component_dot(spark, sf_dir):
    """The apply side: the top-|projection| rows are exactly the corpus
    embeddings' dot products with the learned component, and the plan
    bounds the global top-k (TakeOrderedAndProject, no full sort)."""
    import numpy as np

    from datafusion_nats_spark.extensions.pca import (
        PCA_PROJECT_TOPK,
        sim_pca_power_iteration,
        sim_pca_project_topk,
    )
    from datafusion_nats_spark.tables import load

    df = sim_pca_project_topk(spark, sf_dir)
    assert "TakeOrderedAndProject" in df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "simple"
    )
    rows = df.collect()
    assert len(rows) == PCA_PROJECT_TOPK
    mags = [abs(r.projection) for r in rows]
    assert mags == sorted(mags, reverse=True)
    v = np.array(
        [r.loading for r in sorted(
            sim_pca_power_iteration(spark, sf_dir).collect(),
            key=lambda r: r.dim,
        )]
    )
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id").isin([r.vec_id for r in rows]))
        .collect()
    }
    for r in rows:
        # loadings are round-6 so allow matching slack on the dot product
        assert abs(float(emb[r.vec_id] @ v) - r.projection) < 1e-4


def test_shingle_zipwith_matches_python_reference(spark):
    """Round-9 optimization pin: _shingles_spark was restructured from
    transform(sequence(...), i -> slice(toks, i, W)) — whose lambda
    captured the tokenize subtree and re-evaluated it PER ELEMENT under
    interpreted HOF eval (measured ~15x slower) — to a zip_with chain
    whose arguments are evaluated once per row. Differential-test the
    new form against a first-principles Python shingler on adversarial
    whitespace/short-doc edge cases so the formulation can never drift
    from the w-gram contract."""
    import re

    from datafusion_nats_spark.extensions.dedup import SHINGLE_W, _shingles_spark

    texts = [
        "",  # empty -> no tokens
        "   ",  # whitespace-only
        "one",  # below w
        "one two",  # below w
        "one two three",  # exactly w
        "a b c d e f g h",  # plain
        "a  b\tc\nd\r\ne   f",  # mixed whitespace runs
        "  leading and trailing  ",  # trimmed
        "\tleading tab stays empty token b c",  # trim only strips spaces
        "UPPER Case MiXeD lower case normalization check here",
        "dup dup dup dup dup",  # distinct collapses repeats
        "x y z x y z x y z",  # repeated shingles
    ]

    def ref_shingles(t: str) -> set[str]:
        toks = re.split(r"\s+", t.strip(" ").lower())
        if len(toks) < SHINGLE_W:
            return set()
        return {
            " ".join(toks[i : i + SHINGLE_W])
            for i in range(len(toks) - SHINGLE_W + 1)
        }

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {
        r.doc_id: set(r.sh)
        for r in df.select(
            "doc_id", _shingles_spark(F.col("text")).alias("sh")
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == ref_shingles(t), f"doc {i}: {t!r}"


def test_bigram_zipwith_matches_python_reference(spark, tmp_path_factory):
    """Same round-9 pin for the adjacent-bigram zip_with rewrite shared
    by text_bigram_lm_score / text_boilerplate_ngrams /
    text_repetition_gopher: per-doc distinct-bigram sets must match a
    first-principles Python reference (incl. multi-whitespace runs and
    2-token minimum docs)."""
    import re

    from datafusion_nats_spark.extensions.text import text_boilerplate_ngrams

    texts = [
        "one",  # below 2 tokens -> zero bigrams
        "one two",
        "a b c d",
        "a  b\tc",
        "dup dup dup",
    ]
    out = str(tmp_path_factory.mktemp("bigrams"))
    spark.createDataFrame(
        [(i, t, "en", "t", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    def ref_bigrams(t: str) -> set[str]:
        toks = re.split(r"\s+", t.strip(" "))
        return {
            " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
        } if len(toks) >= 2 else set()

    # n_bigrams column counts the doc's DISTINCT bigrams (explode of the
    # array_distinct'ed array)
    got = {
        r.doc_id: r.n_bigrams
        for r in text_boilerplate_ngrams(spark, out).collect()
    }
    for i, t in enumerate(texts):
        if len(ref_bigrams(t)) == 0:
            assert i not in got  # zero-bigram docs produce no row
        else:
            assert got[i] == len(ref_bigrams(t)), f"doc {i}: {t!r}"


def test_adjacent_bigrams_helper_matches_python_reference(spark):
    """Round-10 ADVICE pin: the three bigram queries now share ONE
    _adjacent_bigrams helper — pin the helper itself (ordered,
    non-distinct output) against a first-principles reference on the
    whitespace/short-doc edge cases, so a drift in the shared
    definition fails here before any oracle run."""
    import re

    from pyspark.sql import functions as F

    from datafusion_nats_spark.extensions.text import _adjacent_bigrams, tokens

    texts = ["one", "one two", "a b c d", "a  b\tc", "dup dup dup", "x"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.bg
        for r in df.select(
            "doc_id",
            _adjacent_bigrams(tokens(F.col("text"))).alias("bg"),
        ).collect()
    }

    def ref(t: str) -> list[str]:
        toks = re.split(r"\s+", t.strip(" "))
        return (
            [" ".join(toks[i : i + 2]) for i in range(len(toks) - 1)]
            if len(toks) >= 2
            else []
        )

    for i, t in enumerate(texts):
        assert got[i] == ref(t), f"doc {i}: {t!r}"
