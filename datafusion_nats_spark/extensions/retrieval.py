"""Ranked retrieval for LLM-data pipelines: BM25 keyword search,
positional phrase search, hybrid keyword+vector fusion (reciprocal-rank
fusion), and retrieval-quality evaluation (MRR / recall@k /
precision@k per retriever, plus the per-arm A/B report).

A training-data pipeline at 100 TB is also a retrieval system: corpus
slices are pulled by keyword queries (exact-term recall the embedding
space can miss), by vector queries (paraphrase recall keywords miss),
and in production by BOTH, fused — RRF (Cormack et al. 2009,
"Reciprocal Rank Fusion outperforms Condorcet and individual Rank
Learning Methods") is the standard score-free fusion because it needs no
cross-arm score calibration. The eval operator closes the loop: every
retrieval change should move MRR/recall on a labeled slice before it
ships.

Scale design (100 TB):
- the query workload is tiny and broadcasts; postings (doc_id, word)
  shuffle ONCE into term frequencies, and only postings matching a query
  term survive the broadcast semi-join — corpus cost is the tokenize +
  one hash aggregation, independent of query count;
- document-frequency and corpus-length stats are |vocabulary|- and
  1-sized aggregates (broadcast); nothing all-pairs anywhere;
- the vector arm here is the brute-force broadcast scorer (the recall
  baseline — exact, O(|queries| x corpus)); swap in the persisted IVF
  probe (`extensions/ann_index.ivf_index_probe`) for the
  partition-pruned scale path — the fusion is arm-agnostic by
  construction (it consumes (query_id, doc_id, rank) from each arm);
- every score is rounded to 6 decimals BEFORE ranking and per-term sums
  fold in explicit term order (the house FP-determinism rules), so
  results are bit-stable across partitionings and engines.

Reference parity note: the reference engine (yarenty/datafusion_nats)
has no retrieval surface; this extends the mandated text-analysis /
similarity-search families (SURVEY.md §2C) with the ranked-retrieval
primitives a curation pipeline runs on top of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datafusion_nats_spark.extensions.pq import _ordered_sum
from datafusion_nats_spark.extensions.similarity import (
    N_QUERIES,
    TOP_K,
    _dot,
    _emb_double,
    _norm,
)
from datafusion_nats_spark.extensions.text import tokens
from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load

K1 = 1.2  # BM25 term-frequency saturation
B = 0.75  # BM25 length normalization
RRF_K = 60  # RRF rank damping (the constant from the original paper)
ARM_K = 20  # candidates each arm feeds into the fusion
N_Q_HYBRID = 4  # doc_id/vec_id < 4 are the hybrid query documents

# the keyword search workload: small, known at plan time, broadcast —
# production queries arrive the same way (a parameter table, never a
# corpus-sized relation)
BM25_QUERIES: list[tuple[int, str]] = [
    (0, "hash"),
    (0, "join"),
    (1, "window"),
    (1, "sort"),
    (2, "stream"),
    (2, "batch"),
    (2, "filter"),
    (3, "customer"),
    (3, "data"),
]


def _postings(docs: DataFrame) -> DataFrame:
    """(doc_id, word, tf) term frequencies — the one corpus-sized
    aggregation every keyword query amortizes."""
    words = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("word"))
    return words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))


def bm25_scores(docs: DataFrame, terms: DataFrame) -> DataFrame:
    """BM25 (k1={K1}, b={B}) of every document against every query in
    ``terms`` (query_id, term) → (query_id, doc_id, score), scored docs
    only. ``docs`` is (doc_id, text).

    idf uses the always-positive Lucene formulation
    ln(1 + (N - df + .5)/(df + .5)). Corpus stats (df per term, doc
    length, N, avgdl) are exact integer aggregates; avgdl divides an
    exact LONG sum so it is partition-invariant; each per-term
    contribution is rounded to 6 decimals and the per-doc sum folds in
    explicit term order, pinning FP addition order across partitionings
    and engines."""
    tf = _postings(docs)
    # df, dl and the corpus stats all derive from the ONE postings
    # aggregate (dl = sum of a doc's term frequencies), so the raw-text
    # tokenize+shuffle subtree is shared across all consumers
    # (ReusedExchange) instead of re-scanning documents per statistic
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    ).select(
        "n_docs",
        (F.col("sum_dl").cast("double") / F.col("n_docs")).alias("avgdl"),
    )
    # scope df to the query terms BEFORE broadcasting: the full df
    # relation is |vocabulary|-sized (not broadcastable at 100 TB), but
    # the broadcast-of-terms join reduces it to |query terms| rows, and
    # that tiny (query_id, term, df) relation is what the postings join
    # fans out against
    qterms = terms.join(df, terms.term == df.word).select(
        "query_id", "term", "df"
    )
    hits = (
        tf.join(F.broadcast(qterms), tf.word == F.col("term"))
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = F.round(
        idf
        * (F.col("tf") * (K1 + 1))
        / (
            F.col("tf")
            + K1 * (1 - B + B * F.col("dl").cast("double") / F.col("avgdl"))
        ),
        6,
    )
    return (
        hits.select("query_id", "doc_id", "term", contrib.alias("c"))
        .groupBy("query_id", "doc_id")
        .agg(F.round(_ordered_sum("c", "term"), 6).alias("score"))
    )


def _bm25_sql(terms_values: str, doc_filter: str = "TRUE") -> str:
    """The DuckDB twin of ``bm25_scores`` as a CTE block: expects a
    ``q(query_id, term)`` relation defined by ``terms_values`` and
    yields ``bm25(query_id, doc_id, score)``. ``doc_filter`` optionally
    restricts which (query, doc) pairs are scored (the hybrid arm's
    self-exclusion)."""
    return f"""
    words AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
      FROM documents
    ), tf AS (
      SELECT doc_id, word, count(*) AS tf FROM words GROUP BY doc_id, word
    ), dfreq AS (
      SELECT word, count(*) AS df FROM tf GROUP BY word
    ), dl AS (
      SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id
    ), corpus AS (
      SELECT count(*) AS n_docs,
             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
      FROM dl
    ), q AS ({terms_values}
    ), contrib AS (
      SELECT q.query_id, tf.doc_id, q.term,
             round(
               ln(1 + (corpus.n_docs - dfreq.df + 0.5) / (dfreq.df + 0.5))
               * (tf.tf * ({K1} + 1))
               / (tf.tf + {K1} * (1 - {B}
                                  + {B} * CAST(dl.dl AS DOUBLE) / corpus.avgdl)),
               6) AS c
      FROM tf
      JOIN q ON q.term = tf.word
      JOIN dfreq USING (word)
      JOIN dl USING (doc_id)
      CROSS JOIN corpus
      WHERE {doc_filter}
    ), bm25 AS (
      SELECT query_id, doc_id,
             round(list_sum(list(c ORDER BY term)), 6) AS score
      FROM contrib GROUP BY query_id, doc_id
    )"""


def _bm25_terms_values() -> str:
    rows = ", ".join(f"({q}, '{t}')" for q, t in BM25_QUERIES)
    return f"SELECT * FROM (VALUES {rows}) v(query_id, term)"


@query(
    "search_bm25_topk",
    oracle=f"""
    WITH {_bm25_sql(_bm25_terms_values())}
    SELECT query_id, doc_id, score, CAST(rn AS INT) AS rn
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id) AS rn
      FROM bm25
    ) WHERE rn <= {TOP_K}
    """,
    doc=f"BM25 ranked retrieval (k1={K1}, b={B}, Lucene idf): a "
    "broadcast query-term workload semi-joins the corpus postings, so "
    "corpus cost is one tokenize + one (doc,word) aggregation; per-term "
    "contributions are 6-decimal-rounded and fold in explicit term "
    f"order; top-{TOP_K} per query by (score desc, doc_id). The keyword "
    "arm of every curation retrieval stack.",
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    terms = spark.createDataFrame(BM25_QUERIES, "query_id int, term string")
    scored = bm25_scores(docs, terms)
    w = W.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "doc_id", "score", "rn")
    )


def rrf_fuse(arms: list[DataFrame], k: int = RRF_K) -> DataFrame:
    """Reciprocal-rank fusion of ranked arms, each (query_id, doc_id,
    rank): score(d) = sum over arms of 1/(k + rank_arm(d)), with a
    missing arm contributing 0. Returns (query_id, doc_id, rrf_score)
    with the per-arm ranks preserved as rank_0..rank_{{n-1}}. Score-free
    by design — no cross-arm calibration, which is why RRF is the
    production default for hybrid search."""
    fused = None
    for i, arm in enumerate(arms):
        a = arm.select("query_id", "doc_id", F.col("rank").alias(f"rank_{i}"))
        # SHUFFLE_HASH hint: each arm is a top-ARM_K rank relation, so a
        # build-side partition is bounded by |queries|·ARM_K/partitions
        # rows of three integers — the provably-safe case for the
        # non-spillable SHJ build. Skipping the two SMJ sort passes
        # measured −26% join-stage CPU at 30x (round 9); the GLOBAL AQE
        # threshold (maxShuffledHashJoinLocalMapThreshold) stays off
        # because round 10 measured it OOMing an unbounded build side
        # on the 30x phrase-probe workload (see session.py).
        fused = (
            a
            if fused is None
            else fused.join(a.hint("shuffle_hash"), ["query_id", "doc_id"], "full_outer")
        )
    score = None
    for i in range(len(arms)):
        c = F.coalesce(
            F.lit(1.0) / (F.lit(k) + F.col(f"rank_{i}")), F.lit(0.0)
        )
        score = c if score is None else score + c
    return fused.withColumn("rrf_score", F.round(score, 6))


_HYBRID_TERMS_SQL = (
    "SELECT d.doc_id AS query_id, w.word AS term FROM documents d, "
    "unnest(list_distinct(regexp_split_to_array(trim(d.text), '\\s+'))) w(word) "
    f"WHERE d.doc_id < {N_Q_HYBRID}"
)
_HYBRID_BM25_BLOCK = _bm25_sql(_HYBRID_TERMS_SQL, doc_filter="tf.doc_id != q.query_id")


@query(
    "search_hybrid_rrf",
    oracle=f"""
    WITH {_HYBRID_BM25_BLOCK}, kw AS (
      SELECT query_id, doc_id, rank FROM (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, doc_id) AS rank
        FROM bm25
      ) WHERE rank <= {ARM_K}
    ), e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), vec AS (
      SELECT query_id, doc_id, rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(
                   list_sum(list_transform(list_zip(q.emb, c.emb), p -> p[1] * p[2]))
                   / (sqrt(list_sum(list_transform(q.emb, x -> x * x)))
                      * sqrt(list_sum(list_transform(c.emb, x -> x * x)))), 6) DESC,
                 c.vec_id) AS rank
        FROM e q JOIN e c ON c.vec_id != q.vec_id
        WHERE q.vec_id < {N_Q_HYBRID}
      ) WHERE rank <= {ARM_K}
    ), fused AS (
      SELECT coalesce(kw.query_id, vec.query_id) AS query_id,
             coalesce(kw.doc_id, vec.doc_id) AS doc_id,
             kw.rank AS kw_rank, vec.rank AS vec_rank,
             round(coalesce(1.0 / ({RRF_K} + kw.rank), 0.0)
                   + coalesce(1.0 / ({RRF_K} + vec.rank), 0.0), 6) AS rrf_score
      FROM kw FULL OUTER JOIN vec USING (query_id, doc_id)
    )
    SELECT query_id, doc_id, rrf_score,
           CAST(kw_rank AS INT) AS kw_rank, CAST(vec_rank AS INT) AS vec_rank,
           CAST(rn AS INT) AS rn
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_score DESC, doc_id) AS rn
      FROM fused
    ) WHERE rn <= {TOP_K}
    """,
    doc=f"Hybrid retrieval: BM25 keyword arm (query = the query doc's "
    f"distinct tokens, self excluded) + cosine vector arm, top-{ARM_K} "
    f"each, fused by reciprocal-rank fusion 1/({RRF_K}+rank) — the "
    "score-free fusion production hybrid search runs (no cross-arm "
    "calibration). Arms are rank-relations, so the vector arm swaps "
    "for the persisted partition-pruned IVF probe at scale without "
    f"touching the fusion. Top-{TOP_K} fused per query.",
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    # keyword arm: the query doc's distinct tokens form its term bag
    qdocs = docs.filter(F.col("doc_id") < N_Q_HYBRID)
    terms = qdocs.select(
        F.col("doc_id").alias("query_id"),
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("term"),
    )
    kw_scores = bm25_scores(docs, terms).filter(
        F.col("doc_id") != F.col("query_id")
    )
    w_kw = W.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    kw = (
        kw_scores.withColumn("rank", F.row_number().over(w_kw))
        .filter(F.col("rank") <= ARM_K)
        .select("query_id", "doc_id", "rank")
    )
    # vector arm: exact cosine (recall baseline; IVF probe at scale)
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", _emb_double().alias("emb")
    )
    q = e.filter(F.col("vec_id") < N_Q_HYBRID).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
    )
    cos = F.round(
        _dot(F.col("qe"), F.col("emb")) / (_norm(F.col("qe")) * _norm(F.col("emb"))), 6
    )
    w_vec = W.partitionBy("query_id").orderBy(F.desc("cosine"), "doc_id")
    vec = (
        F.broadcast(q)
        .join(e, e.vec_id != q.query_id)
        .select("query_id", F.col("vec_id").alias("doc_id"), cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w_vec))
        .filter(F.col("rank") <= ARM_K)
        .select("query_id", "doc_id", "rank")
    )
    fused = rrf_fuse([kw, vec])
    w = W.partitionBy("query_id").orderBy(F.desc("rrf_score"), "doc_id")
    return (
        fused.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= TOP_K)
        .select(
            "query_id",
            "doc_id",
            "rrf_score",
            F.col("rank_0").cast("int").alias("kw_rank"),
            F.col("rank_1").cast("int").alias("vec_rank"),
            "rn",
        )
    )


@query(
    "search_eval_mrr",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), ranked AS (
      SELECT q.vec_id AS query_id, q.label AS qlabel,
             c.vec_id AS neighbor_id, c.label AS nlabel,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY round(
                 list_sum(list_transform(list_zip(q.emb, c.emb), p -> p[1] * p[2]))
                 / (sqrt(list_sum(list_transform(q.emb, x -> x * x)))
                    * sqrt(list_sum(list_transform(c.emb, x -> x * x)))), 6) DESC,
               c.vec_id) AS rn
      FROM e q JOIN e c ON c.vec_id != q.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ), topk AS (
      SELECT * FROM ranked WHERE rn <= {TOP_K}
    ), rel AS (
      SELECT q.vec_id AS query_id, count(*) AS n_relevant
      FROM e q JOIN e c ON c.vec_id != q.vec_id AND c.label = q.label
      WHERE q.vec_id < {N_QUERIES}
      GROUP BY 1
    ), hits AS (
      SELECT query_id,
             min(CASE WHEN nlabel = qlabel THEN rn END) AS first_rel_rank,
             count(CASE WHEN nlabel = qlabel THEN 1 END) AS n_hits
      FROM topk GROUP BY query_id
    )
    SELECT h.query_id,
           CAST(h.first_rel_rank AS INT) AS first_rel_rank,
           round(coalesce(1.0 / h.first_rel_rank, 0.0), 6) AS mrr,
           round(CAST(h.n_hits AS DOUBLE) / r.n_relevant, 6) AS recall_at_k,
           round(CAST(h.n_hits AS DOUBLE) / {TOP_K}, 6) AS precision_at_k
    FROM hits h JOIN rel r USING (query_id)
    """,
    doc=f"Retrieval-quality evaluation over the labeled slice: run the "
    f"exact vector retriever for the {N_QUERIES} query vectors, grade "
    "each against its label cohort (same-label vectors are the "
    "relevance set), and emit per-query MRR, recall@k and precision@k "
    f"(k={TOP_K}) — the metric loop every retrieval/dedup change is "
    "judged by before it ships. Relevance-set sizes and hit counts are "
    "exact integer aggregates; only the final ratios are doubles.",
)
def search_eval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _emb_double().alias("emb")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("emb").alias("qe"),
    )
    cos = F.round(
        _dot(F.col("qe"), F.col("emb")) / (_norm(F.col("qe")) * _norm(F.col("emb"))), 6
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    topk = (
        F.broadcast(q)
        .join(e, e.vec_id != q.query_id)
        .select(
            "query_id",
            "qlabel",
            F.col("vec_id").alias("neighbor_id"),
            F.col("label").alias("nlabel"),
            cos.alias("cosine"),
        )
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
    )
    rel = (
        F.broadcast(q.select("query_id", "qlabel"))
        .join(e, (e.vec_id != q.query_id) & (e.label == q.qlabel))
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_relevant"))
    )
    hits = topk.groupBy("query_id").agg(
        F.min(F.when(F.col("nlabel") == F.col("qlabel"), F.col("rn"))).alias(
            "first_rel_rank"
        ),
        F.count(F.when(F.col("nlabel") == F.col("qlabel"), F.lit(1))).alias(
            "n_hits"
        ),
    )
    return hits.join(rel, "query_id").select(
        "query_id",
        F.col("first_rel_rank").cast("int").alias("first_rel_rank"),
        F.round(
            F.coalesce(F.lit(1.0) / F.col("first_rel_rank"), F.lit(0.0)), 6
        ).alias("mrr"),
        F.round(F.col("n_hits").cast("double") / F.col("n_relevant"), 6).alias(
            "recall_at_k"
        ),
        F.round(F.col("n_hits").cast("double") / TOP_K, 6).alias(
            "precision_at_k"
        ),
    )


# --------------------------------------------------------------------------
# phrase (positional) search + per-arm quality report
# --------------------------------------------------------------------------

# the phrase workload: adjacent-token sequences, broadcast like BM25's
PHRASE_QUERIES: list[tuple[int, str, str]] = [
    (0, "hash", "join"),
    (1, "window", "sort"),
    (2, "stream", "batch"),
    (3, "table", "scan"),
]


# shared with the persisted-index twin (extensions/text_index.py::
# search_index_probe_phrase), whose results are identical by construction
PHRASE_ORACLE = f"""
    WITH p AS (
      SELECT * FROM (VALUES
        {", ".join(f"({q}, '{a}', '{b}')" for q, a, b in PHRASE_QUERIES)}
      ) v(query_id, term_a, term_b)
    ), toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr
      FROM documents
    ), hits AS (
      SELECT p.query_id, t.doc_id,
             list_filter(range(1, len(t.arr)),
                         i -> t.arr[i] = p.term_a AND t.arr[i+1] = p.term_b)
               AS pos
      FROM toks t CROSS JOIN p
    )
    SELECT query_id, doc_id,
           CAST(len(pos) AS INT) AS n_occurrences,
           CAST(pos[1] AS INT) AS first_pos
    FROM hits WHERE len(pos) > 0
    """


@query(
    "search_phrase_match",
    oracle=PHRASE_ORACLE,
    doc="Positional phrase search: each (term_a, term_b) phrase query "
    "finds documents where the terms are ADJACENT tokens, with "
    "occurrence count and first position — entirely as a zero-shuffle "
    "map over the corpus (higher-order filter over token positions, "
    "broadcast phrase workload); the sequential-scan complement of "
    "text_inverted_index's indexed lookups. At 100 TB this is the "
    "shape of a regex/phrase sweep: embarrassingly parallel, "
    "no shuffle at all before the (tiny) result.",
)
def search_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    phrases = spark.createDataFrame(
        PHRASE_QUERIES, "query_id int, term_a string, term_b string"
    )
    return phrase_match(docs, phrases)


def phrase_match(docs: DataFrame, phrases: DataFrame) -> DataFrame:
    """Adjacent-token phrase matches of every (query_id, term_a, term_b)
    phrase against (doc_id, text) → (query_id, doc_id, n_occurrences,
    first_pos), matching docs only. Zero shuffle: a higher-order filter
    over 1-based token positions per (doc, phrase) row, phrases
    broadcast."""
    # materialize the token array in its own projection BELOW the
    # crossJoin: tokenization then runs once per document, and the filter
    # lambda captures an attribute (a row-slot read per element). The
    # previous form captured the tokenize SUBTREE, which interpreted HOF
    # eval re-evaluates per element — i.e. re-tokenized the document for
    # every position of every (doc, phrase) pair (see _shingles_spark in
    # dedup.py for the measured ~15x A/B on the same pattern).
    tdocs = docs.select("doc_id", tokens(F.col("text")).alias("_toks"))
    toks = F.col("_toks")
    # positions i (1-based) with arr[i] = term_a and arr[i+1] = term_b;
    # sequence is ascending, so the filtered list stays ordered and its
    # head is the first occurrence. The single-token guard matters:
    # sequence(1, 0) would generate DESCENDING [1, 0] (Spark's step is
    # inferred) and element_at(toks, 0) errors — while the oracle's
    # end-exclusive range(1, 1) is just empty. CASE branches evaluate
    # lazily per row, so the guarded sequence never runs on short docs.
    pos = F.when(
        F.size(toks) >= 2,
        F.filter(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: (F.element_at(toks, i) == F.col("term_a"))
            & (F.element_at(toks, i + 1) == F.col("term_b")),
        ),
    ).otherwise(F.array().cast("array<int>"))
    return (
        tdocs.crossJoin(F.broadcast(phrases))
        .select("query_id", "doc_id", pos.alias("pos"))
        .filter(F.size("pos") > 0)
        .select(
            "query_id",
            "doc_id",
            F.size("pos").cast("int").alias("n_occurrences"),
            F.element_at("pos", 1).cast("int").alias("first_pos"),
        )
    )


@query(
    "search_eval_arms_report",
    oracle=f"""
    WITH {_HYBRID_BM25_BLOCK}, kw AS (
      SELECT query_id, doc_id, rank FROM (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, doc_id) AS rank
        FROM bm25
      ) WHERE rank <= {ARM_K}
    ), e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), vec AS (
      SELECT query_id, doc_id, rank FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY round(
                   list_sum(list_transform(list_zip(q.emb, c.emb), p -> p[1] * p[2]))
                   / (sqrt(list_sum(list_transform(q.emb, x -> x * x)))
                      * sqrt(list_sum(list_transform(c.emb, x -> x * x)))), 6) DESC,
                 c.vec_id) AS rank
        FROM e q JOIN e c ON c.vec_id != q.vec_id
        WHERE q.vec_id < {N_Q_HYBRID}
      ) WHERE rank <= {ARM_K}
    ), fused AS (
      SELECT coalesce(kw.query_id, vec.query_id) AS query_id,
             coalesce(kw.doc_id, vec.doc_id) AS doc_id,
             round(coalesce(1.0 / ({RRF_K} + kw.rank), 0.0)
                   + coalesce(1.0 / ({RRF_K} + vec.rank), 0.0), 6) AS rrf_score
      FROM kw FULL OUTER JOIN vec USING (query_id, doc_id)
    ), fused_rank AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY rrf_score DESC, doc_id) AS rank
      FROM fused
    ), arms AS (
      SELECT 'kw' AS arm, query_id, doc_id, rank FROM kw
      UNION ALL
      SELECT 'vec' AS arm, query_id, doc_id, rank FROM vec
      UNION ALL
      SELECT 'rrf' AS arm, query_id, doc_id, rank
      FROM fused_rank WHERE rank <= {ARM_K}
    ), labeled AS (
      SELECT a.arm, a.query_id, a.rank,
             (n.label = q.label) AS is_rel
      FROM arms a
      JOIN e q ON q.vec_id = a.query_id
      JOIN e n ON n.vec_id = a.doc_id
    )
    SELECT arm, query_id,
           CAST(min(CASE WHEN is_rel THEN rank END) AS INT) AS first_rel_rank,
           round(coalesce(1.0 / min(CASE WHEN is_rel THEN rank END), 0.0), 6)
             AS mrr,
           CAST(count(CASE WHEN is_rel AND rank <= {TOP_K} THEN 1 END) AS INT)
             AS n_rel_topk
    FROM labeled
    GROUP BY arm, query_id
    """,
    doc=f"Per-arm retrieval-quality report for the hybrid stack: the "
    "BM25 keyword arm, the vector arm, and their RRF fusion are each "
    "graded per query against the label-cohort relevance set "
    f"(first-relevant rank, MRR, relevant-in-top-{TOP_K}) — the A/B "
    "table that justifies (or vetoes) fusion before it ships, as one "
    "relational query over the same rank-relations the hybrid search "
    "consumes.",
)
def search_eval_arms_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    qdocs = docs.filter(F.col("doc_id") < N_Q_HYBRID)
    terms = qdocs.select(
        F.col("doc_id").alias("query_id"),
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("term"),
    )
    kw_scores = bm25_scores(docs, terms).filter(
        F.col("doc_id") != F.col("query_id")
    )
    w_kw = W.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    kw = (
        kw_scores.withColumn("rank", F.row_number().over(w_kw))
        .filter(F.col("rank") <= ARM_K)
        .select("query_id", "doc_id", "rank")
    )
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _emb_double().alias("emb")
    )
    q = e.filter(F.col("vec_id") < N_Q_HYBRID).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
    )
    cos = F.round(
        _dot(F.col("qe"), F.col("emb")) / (_norm(F.col("qe")) * _norm(F.col("emb"))), 6
    )
    w_vec = W.partitionBy("query_id").orderBy(F.desc("cosine"), "doc_id")
    vec = (
        F.broadcast(q)
        .join(e, e.vec_id != q.query_id)
        .select("query_id", F.col("vec_id").alias("doc_id"), cos.alias("cosine"))
        .withColumn("rank", F.row_number().over(w_vec))
        .filter(F.col("rank") <= ARM_K)
        .select("query_id", "doc_id", "rank")
    )
    w_f = W.partitionBy("query_id").orderBy(F.desc("rrf_score"), "doc_id")
    fused = (
        rrf_fuse([kw, vec])
        .withColumn("rank", F.row_number().over(w_f))
        .filter(F.col("rank") <= ARM_K)
        .select("query_id", "doc_id", "rank")
    )
    arms = (
        kw.select(F.lit("kw").alias("arm"), "query_id", "doc_id", "rank")
        .unionByName(
            vec.select(F.lit("vec").alias("arm"), "query_id", "doc_id", "rank")
        )
        .unionByName(
            fused.select(F.lit("rrf").alias("arm"), "query_id", "doc_id", "rank")
        )
    )
    qlab = e.select(F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel"))
    nlab = e.select(F.col("vec_id").alias("doc_id"), F.col("label").alias("nlabel"))
    labeled = arms.join(F.broadcast(qlab), "query_id").join(nlab, "doc_id")
    rel_rank = F.min(
        F.when(F.col("nlabel") == F.col("qlabel"), F.col("rank"))
    )
    return labeled.groupBy("arm", "query_id").agg(
        rel_rank.cast("int").alias("first_rel_rank"),
        F.round(F.coalesce(F.lit(1.0) / rel_rank, F.lit(0.0)), 6).alias("mrr"),
        F.count(
            F.when(
                (F.col("nlabel") == F.col("qlabel")) & (F.col("rank") <= TOP_K),
                F.lit(1),
            )
        )
        .cast("int")
        .alias("n_rel_topk"),
    )
