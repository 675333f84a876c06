"""Persisted BM25 text index — build once, probe many (round-7 verdict
ask #1).

Every other retrieval-adjacent family got a build-once artifact in
round 7 (IVF/PQ vectors, LSH bands, the quality model); the keyword arm
still recomputed its corpus postings per query workload
(``retrieval._postings`` runs the tokenize + (doc, word) aggregation on
every call). At 100 TB that aggregation is the dominant cost and it is
query-independent — exactly what an index amortizes.

Layout (one versioned artifact, same atomic CURRENT-pointer machinery
as the ANN/LSH families in ``extensions/ann_index``):

- ``postings/`` — (word, doc_id, tf, dl, df, positions) rows
  **partitioned by ``bucket`` = crc32(word) % N_TERM_BUCKETS**.
  Denormalizing the doc length (dl) and the term's document frequency
  (df) into the posting row is the classic inverted-file trick: a probe
  then needs NO join against corpus-sized side tables — everything BM25
  needs per posting is in the posting; ``positions`` (the term's sorted
  1-based token positions) additionally serves the positional phrase
  probe from the SAME artifact, while the BM25 probe never reads the
  column (parquet column pruning). The bucket partitioning is what buys
  the pruning: a query's terms hash to a handful of buckets, those
  bucket values are inlined as literals into the scan filter, and
  parquet partition pruning skips every other bucket directory entirely
  (the LSH/IVF pattern; files-read pinned in pytest).
- ``stats/`` — the 1-row (n_docs, avgdl) corpus aggregate, broadcast
  into every probe.

A probe therefore costs O(|matched postings|): read the query terms'
bucket partitions (pushed word-IN filter inside them), broadcast-join
the tiny (query_id, term) workload, and fold the same 6-decimal-rounded
per-term contributions in explicit term order as the in-plan twin
(``retrieval.bm25_scores``) — results identical by construction, so the
registered probe shares ``search_bm25_topk``'s DuckDB oracle verbatim.

df/avgdl/the banned... — like the other write-optimized artifacts, the
stored corpus statistics describe the corpus AT BUILD TIME; a periodic
``bm25_index_build(rebuild=True)`` (compaction) refreshes them. There is
deliberately no per-batch update op: BM25 statistics are global ratios,
so unlike LSH bands or IVF cells an append would silently skew EVERY
stored df/avgdl-dependent score — the honest increment is a rebuild.

Reference parity note: the reference engine (yarenty/datafusion_nats)
has no retrieval surface; this extends the text-analysis family
(SURVEY.md §2C) with the persisted-index economics its 100 TB pipelines
assume.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datafusion_nats_spark.extensions.ann_index import (
    _current_version,
    _index_root,
    _publish_version,
    _read_flavor,
    _version_dir,
    _write_flavor,
    current_index_dir,
)
from datafusion_nats_spark.extensions.pq import _ordered_sum
from datafusion_nats_spark.extensions.retrieval import (
    ARM_K,
    B,
    BM25_QUERIES,
    K1,
    N_Q_HYBRID,
    PHRASE_ORACLE,
    PHRASE_QUERIES,
    RRF_K,
    _HYBRID_BM25_BLOCK,
    _bm25_terms_values,
    _bm25_sql,
    rrf_fuse,
)
from datafusion_nats_spark.extensions.similarity import (
    NPROBE,
    TOP_K,
    _DOT_DUCK,
    _NORM_DUCK,
    _emb_double,
)
from datafusion_nats_spark.extensions.text import tokens
from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load, salt_factor, salt_partitions

# Partition-directory fanout of the postings file. 64 buckets keeps the
# sandbox artifact small; at 100 TB you would raise it so a bucket
# partition is a few GB (the probe cost scales with |matched buckets| /
# N_TERM_BUCKETS of the postings, so more buckets = finer pruning).
N_TERM_BUCKETS = 64

# Files per bucket directory: hash-clustering by bucket alone would put
# each bucket in ONE file (a probe scan then can't parallelize within
# its matched buckets, and at 100 TB a bucket would be one giant file);
# a doc_id salt spreads every bucket over up to this many files.
BM25_FILES_PER_BUCKET = 4


def _bucket_expr(word_col):
    """The ONE bucket function, used by the build's partitioned write
    and by the probe's bucket resolution (both run it in Spark, so the
    two can never disagree the way a Python-side reimplementation
    could)."""
    return F.pmod(F.crc32(word_col.cast("string")), F.lit(N_TERM_BUCKETS)).cast(
        "int"
    )



def _workload_buckets(spark: SparkSession, words: list) -> list:
    """The workload's DISTINCT bucket values, resolved through the
    build's own Spark bucket expression (bounded by N_TERM_BUCKETS, so
    the collect is always tiny) — the ONE bucket-resolution path shared
    by the BM25 probe, the phrase probe, and the routing scorer so the
    three can never drift from the build's partitioning."""
    return sorted(
        r["bucket"]
        for r in spark.createDataFrame([(w,) for w in words], "word string")
        .select(_bucket_expr(F.col("word")).alias("bucket"))
        .distinct()
        .collect()
    )


def bm25_index_build(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str | None = None,
    rebuild: bool = False,
) -> str:
    """Build the persisted BM25 index from the documents table: ONE
    corpus pass (tokenize → (doc, word) term frequencies → df/dl/corpus
    stats, all derived from the same postings aggregate exactly like the
    in-plan twin) written as ``postings/`` partitioned by term bucket
    plus the 1-row ``stats/``, into a fresh version directory that is
    then atomically published via the CURRENT pointer. Idempotent once
    published; ``rebuild=True`` recomputes and publishes a NEW version
    (refreshing df/avgdl after corpus growth) while live probes keep
    reading their resolved version. Returns the index directory."""
    index_dir = index_dir or _index_root("bm25", sf_dir)
    cur = _current_version(index_dir)
    if cur is not None and not rebuild:
        stored = _read_flavor(_version_dir(index_dir, cur))
        if stored != "bm25":
            raise ValueError(
                f"index at {index_dir} is published with flavor {stored!r}, "
                f"not 'bm25' — pass rebuild=True or use a different index_dir"
            )
        return index_dir
    version = (cur or 0) + 1
    vdir = _version_dir(index_dir, version)
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    # positional postings: same tokenization as the in-plan twin
    # (retrieval._postings / text.tokens), plus each term's sorted
    # 1-based positions — tf is exactly their count. Positions ride in
    # the same rows so ONE artifact serves both the BM25 probe (which
    # never selects the column — parquet column pruning keeps its scan
    # narrow) and the positional phrase probe.
    tf = (
        docs.select(
            "doc_id", F.posexplode(tokens(F.col("text"))).alias("p", "word")
        )
        .groupBy("doc_id", "word")
        .agg(
            F.sort_array(F.collect_list(F.col("p") + 1)).alias("positions"),
        )
        .withColumn("tf", F.size("positions").cast("long"))
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    df = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    corpus = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("sum_dl")
    ).select(
        "n_docs",
        (F.col("sum_dl").cast("double") / F.col("n_docs")).alias("avgdl"),
    )
    corpus.write.mode("overwrite").parquet(os.path.join(vdir, "stats"))
    (
        tf.join(dl, "doc_id")
        .join(df, "word")
        .withColumn("bucket", _bucket_expr(F.col("word")))
        .select("bucket", "word", "doc_id", "tf", "dl", "df", "positions")
        # cluster rows by (bucket, salt) before the partitioned write so
        # each bucket directory holds a few large files (not one per
        # task, and not ONE per bucket — see BM25_FILES_PER_BUCKET)
        .repartition(
            F.col("bucket"),
            F.pmod(F.col("doc_id"), F.lit(BM25_FILES_PER_BUCKET)),
        )
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(os.path.join(vdir, "postings"))
    )
    _write_flavor(vdir, "bm25")
    _publish_version(index_dir, version)  # the atomic commit
    return index_dir


# Above this many workload terms the probe stops collecting the term
# list to the driver and keeps the workload distributed (the contract
# mirror of ann_index.PROBE_INLINE_MAX_QUERIES): a benchmark-
# contamination sweep can carry 1e5+ n-grams. The bucket pruning
# survives either way — distinct buckets are bounded by N_TERM_BUCKETS,
# so THAT collect is always tiny.
TERMS_INLINE_MAX = 5_000


def bm25_index_probe(
    spark: SparkSession, index_dir: str, terms: DataFrame,
    inline: bool | None = None,
) -> DataFrame:
    """Probe the persisted BM25 index with a query workload ``terms``
    (query_id, term) → (query_id, doc_id, score), scored docs only —
    identical to ``retrieval.bm25_scores`` by construction (same K1/B,
    same Lucene idf, same 6-decimal per-term rounding, same explicit
    term-order fold).

    ``inline`` picks the workload strategy (auto by default, bounded
    count up to TERMS_INLINE_MAX):

    - True — the common parameter-table workload is collected once: the
      term list becomes a pushed ``word IN`` filter inside the matched
      buckets and the terms broadcast into the postings join;
    - False — a HUGE workload (contamination n-gram sweeps) stays
      distributed: the postings join shuffles on the word key instead
      of broadcasting the terms.

    Both paths inline the workload's DISTINCT bucket values — resolved
    through the build's own Spark bucket expression, and bounded by
    N_TERM_BUCKETS so the collect is always tiny — as LITERAL partition
    filters, which is what lets parquet prune every unmatched bucket
    directory (``PartitionFilters: [bucket IN …]``, files-read pinned
    in pytest). Resolve-once semantics: the plan binds to the CURRENT
    version's paths, so a concurrent rebuild publishing a newer version
    cannot tear this probe. Identical rows either way (pinned in
    pytest)."""
    vdir = current_index_dir(index_dir)
    if inline is None:
        inline = terms.limit(TERMS_INLINE_MAX + 1).count() <= TERMS_INLINE_MAX
    if inline:
        rows = [
            (r["query_id"], r["term"])
            for r in terms.select("query_id", "term").collect()
        ]
        words = sorted({t for _, t in rows})
        buckets = _workload_buckets(spark, words)
        terms_df = F.broadcast(
            spark.createDataFrame(rows, "query_id int, term string")
        )
        word_filter = F.col("word").isin(words)
    else:
        terms_df = terms.select("query_id", "term")
        buckets = sorted(
            r["bucket"]
            for r in terms_df.select(
                _bucket_expr(F.col("term")).alias("bucket")
            )
            .distinct()
            .collect()
        )
        word_filter = F.lit(True)  # the word join replaces the IN filter
    postings = (
        spark.read.parquet(os.path.join(vdir, "postings"))
        # literal IN on the partition column → directory-level pruning;
        # the word-IN filter is pushed into the surviving buckets' scans
        # on the inline path (the distributed path filters via the join)
        .filter(F.col("bucket").isin(buckets))
        .filter(word_filter)
    )
    stats = spark.read.parquet(os.path.join(vdir, "stats"))
    if inline:
        cond = postings.word == terms_df.term
    else:
        # the distributed join's key (word) can be low-cardinality or
        # Zipf-hot (a routing sweep concentrates on few terms), which
        # serializes an unsalted shuffle join onto ≤|distinct words|
        # tasks — measured as a 49 s max task at the 10k-term design
        # point. Salt: the (tiny) workload replicates S ways, each
        # posting keys to one salt by doc_id hash — S-way parallel per
        # word, identical rows (every pair matches exactly once).
        nsalts = salt_factor(spark)
        terms_df = terms_df.withColumn(
            "_tsalt",
            F.explode(F.sequence(F.lit(0), F.lit(int(nsalts) - 1))),
        )
        postings = postings.withColumn(
            "_tsalt",
            F.pmod(
                F.crc32(F.col("doc_id").cast("string")), F.lit(int(nsalts))
            ).cast("int"),
        )
        # explicit fixed-n repartition: the join inputs are small in
        # bytes (AQE would coalesce the salted partitions back into few
        # tasks) while the join output is |workload|·df(term) scored
        # rows computed map-side — a user-specified numPartitions pins
        # the fan-out work at nsalts-way parallel
        nparts = salt_partitions(spark, nsalts)
        postings = postings.repartition(nparts, "word", "_tsalt")
        terms_df = terms_df.repartition(nparts, "term", "_tsalt")
        cond = (postings.word == terms_df.term) & (
            postings._tsalt == terms_df._tsalt
        )
    hits = postings.join(terms_df, cond).crossJoin(F.broadcast(stats))
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


@query(
    "search_index_probe_bm25",
    oracle=f"""
    WITH {_bm25_sql(_bm25_terms_values())}
    SELECT query_id, doc_id, score, CAST(rn AS INT) AS rn
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY score DESC, doc_id) AS rn
      FROM bm25
    ) WHERE rn <= {TOP_K}
    """,
    doc="Persisted-index BM25 retrieval: the corpus postings (with "
    "denormalized doc length and document frequency) are built ONCE and "
    "stored partitioned by term bucket (atomic versioned publish); each "
    "query workload probes only its terms' bucket partitions — literal "
    "partition filters, files-read pruning pinned in pytest — and "
    "re-derives the same 6-decimal BM25 contributions as the in-plan "
    "twin. Same oracle as search_bm25_topk — results identical by "
    "construction; per-probe cost O(|matched postings|), the corpus "
    "tokenize+aggregate amortized into the build.",
)
def search_index_probe_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    index_dir = bm25_index_build(spark, sf_dir)
    terms = spark.createDataFrame(BM25_QUERIES, "query_id int, term string")
    scored = bm25_index_probe(spark, index_dir, terms)
    w = W.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "doc_id", "score", "rn")
    )


# --------------------------------------------------------------------------
# index-backed hybrid retrieval: both arms partition-pruned
# --------------------------------------------------------------------------

# The IVF vector arm as DuckDB SQL (label codebook, self excluded, ranked
# to ARM_K) — the same emulation IVF_ANN_ORACLE pins for sim_ivf_ann,
# re-scoped to the hybrid query set. CTE names avoid the BM25 block's
# (which already defines q/tf/dl/corpus).
_IVF_ARM_SQL = f"""e AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), cent AS (
      SELECT label AS cell, list(m ORDER BY pos) AS centroid
      FROM (
        SELECT label, i AS pos, avg(emb[i]) AS m
        FROM e, range(1, 65) t(i)
        GROUP BY label, i
      )
      GROUP BY label
    ), vq AS (
      SELECT vec_id AS query_id, emb AS qe FROM e WHERE vec_id < {N_Q_HYBRID}
    ), vprobes AS (
      SELECT query_id, qe, cell FROM (
        SELECT vq.query_id, vq.qe, c.cell,
               row_number() OVER (
                 PARTITION BY vq.query_id
                 ORDER BY round({_DOT_DUCK.format(a='vq.qe', b='c.centroid')}
                          / ({_NORM_DUCK.format(a='vq.qe')}
                             * {_NORM_DUCK.format(a='c.centroid')}), 6) DESC,
                          c.cell
               ) AS cell_rank
        FROM vq, cent c
      ) WHERE cell_rank <= {NPROBE}
    ), vec AS (
      SELECT query_id, doc_id, rank FROM (
        SELECT p.query_id, e.vec_id AS doc_id,
               row_number() OVER (
                 PARTITION BY p.query_id
                 ORDER BY round({_DOT_DUCK.format(a='p.qe', b='e.emb')}
                          / ({_NORM_DUCK.format(a='p.qe')}
                             * {_NORM_DUCK.format(a='e.emb')}), 6) DESC,
                          e.vec_id
               ) AS rank
        FROM vprobes p JOIN e ON e.label = p.cell AND e.vec_id != p.query_id
      ) WHERE rank <= {ARM_K}
    )"""


@query(
    "search_hybrid_rrf_indexed",
    oracle=f"""
    WITH {_HYBRID_BM25_BLOCK}, kw AS (
      SELECT query_id, doc_id, rank FROM (
        SELECT query_id, doc_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY score DESC, doc_id) AS rank
        FROM bm25
      ) WHERE rank <= {ARM_K}
    ), {_IVF_ARM_SQL}, fused AS (
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
    doc=f"Index-backed hybrid retrieval — the 100 TB shape of "
    "search_hybrid_rrf, proving the fusion's arm-agnostic contract: the "
    "keyword arm probes the persisted BM25 postings index and the "
    f"vector arm probes the persisted IVF index (top-{ARM_K} each), so "
    "BOTH arms read only partition-pruned slivers (term buckets / "
    "probed cells — files-read pinned in pytest) instead of re-scanning "
    "the corpus; the reciprocal-rank fusion and its oracle consume the "
    "two rank-relations exactly as the in-plan twin does. The keyword "
    "arm is exact (same scores), the vector arm is the IVF "
    f"approximation (nprobe={NPROBE}) — the oracle pins both.",
)
def search_hybrid_rrf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datafusion_nats_spark.extensions.ann_index import (
        ivf_index_build,
        ivf_index_probe,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    # keyword arm via the persisted postings index: the query doc's
    # distinct tokens form its term bag, exactly like the in-plan twin
    bm25_dir = bm25_index_build(spark, sf_dir)
    qdocs = docs.filter(F.col("doc_id") < N_Q_HYBRID)
    terms = qdocs.select(
        F.col("doc_id").alias("query_id"),
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("term"),
    )
    kw_scores = bm25_index_probe(spark, bm25_dir, terms).filter(
        F.col("doc_id") != F.col("query_id")
    )
    w_kw = W.partitionBy("query_id").orderBy(F.desc("score"), "doc_id")
    kw = (
        kw_scores.withColumn("rank", F.row_number().over(w_kw))
        .filter(F.col("rank") <= ARM_K)
        .select("query_id", "doc_id", "rank")
    )
    # vector arm via the persisted IVF index (label codebook), asked for
    # ARM_K candidates instead of the registry TOP_K
    ivf_dir = ivf_index_build(spark, sf_dir)
    q = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < N_Q_HYBRID)
        .select(F.col("vec_id").alias("query_id"), _emb_double().alias("qe"))
    )
    vec = ivf_index_probe(spark, ivf_dir, q, k=ARM_K).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), F.col("rn").alias("rank")
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


# --------------------------------------------------------------------------
# positional phrase probe over the same artifact
# --------------------------------------------------------------------------


def phrase_index_probe(
    spark: SparkSession, index_dir: str, phrases: DataFrame,
    inline: bool | None = None,
) -> DataFrame:
    """Probe the persisted postings index with a phrase workload
    (query_id, term_a, term_b) → (query_id, doc_id, n_occurrences,
    first_pos), matching docs only — identical to
    ``retrieval.phrase_match`` by construction (same tokenization, same
    1-based adjacency semantics).

    Where the in-plan twin sweeps every document's token array (the
    zero-shuffle sequential scan), this probe reads ONLY the two terms'
    bucket partitions and intersects their stored position lists:
    occurrences are positions i of term_a with i+1 among term_b's
    positions. At 100 TB that is the inverted-index phrase lookup —
    O(|matched postings|) instead of O(corpus tokens) per workload.

    ``inline`` is the same workload switch as ``bm25_index_probe``
    (auto by default, bounded count up to TERMS_INLINE_MAX phrases):
    the common parameter-table workload is collected once into a pushed
    word-IN filter + broadcast join, while a HUGE workload (a
    benchmark-contamination n-gram sweep) stays distributed — the
    postings join shuffles on the word key and never lands on the
    driver. Bucket resolution is bounded by N_TERM_BUCKETS either way,
    so THAT collect is always tiny; identical rows either way (pinned
    in pytest).

    Execution shape (round-10 rewrite, guide §2.3/§8). The previous
    shape joined postings to the FULL workload per side and then paired
    the two sides with a join keyed (query_id, term_a, term_b, doc_id)
    whose both inputs carried position ARRAYS — at the 30x/Zipf design
    point that SMJ sorted 2×29.7M array-carrying rows (256 phrases
    reusing 30 words, one word in 78% of docs) and spilled the sandbox
    disk to death. Now:

    1. postings join only the DISTINCT (term_a, term_b) pairs — a hot
       workload repeats phrases across query_ids (that is what makes it
       hot), so per-pair adjacency is computed ONCE per phrase, not
       once per query (the 256-query Zipf capture reuses each pair
       ~8.5×);
    2. the two sides pair on exploded per-position rows — narrow
       integer keys through the exchange, no array payloads sorted
       (decide with small rows, §8); n_occurrences/first_pos fall out
       of a count/min aggregate, identical to the old
       array_intersect by construction (per-(word,doc) position lists
       are distinct-valued);
    3. query_ids fan back in at the very end via a join on the phrase
       identity — broadcast when inline, salted when distributed."""
    vdir = current_index_dir(index_dir)
    if inline is None:
        inline = (
            phrases.limit(TERMS_INLINE_MAX + 1).count() <= TERMS_INLINE_MAX
        )
    if inline:
        rows = [
            (r["query_id"], r["term_a"], r["term_b"])
            for r in phrases.select("query_id", "term_a", "term_b").collect()
        ]
        words = sorted({t for _, a, b in rows for t in (a, b)})
        buckets = _workload_buckets(spark, words)
        word_filter = F.col("word").isin(words)
        wl = spark.createDataFrame(
            rows, "query_id int, term_a string, term_b string"
        )
        pair_rows = sorted({(a, b) for _, a, b in rows})
        pairs = spark.createDataFrame(
            pair_rows, "term_a string, term_b string"
        )
        pairs_join = F.broadcast(pairs)
    else:
        wl = phrases.select("query_id", "term_a", "term_b")
        buckets = sorted(
            r["bucket"]
            for r in wl.select(
                F.explode(F.array("term_a", "term_b")).alias("w")
            )
            .select(_bucket_expr(F.col("w")).alias("bucket"))
            .distinct()
            .collect()
        )
        word_filter = F.lit(True)  # the word joins replace the IN filter
        pairs = wl.select("term_a", "term_b").distinct()
        pairs_join = pairs
    postings = (
        spark.read.parquet(os.path.join(vdir, "postings"))
        .filter(F.col("bucket").isin(buckets))
        .filter(word_filter)
        .select("word", "doc_id", "positions")
    )
    if inline:
        cond_a = postings.word == pairs_join.term_a
        cond_b = postings.word == pairs_join.term_b
    else:
        # same salt as bm25_index_probe's distributed join: an unsalted
        # shuffle join on the word key serializes onto ≤|distinct
        # words| tasks when the workload concentrates on few terms
        # (measured: a 233 s max task at the 10k-phrase design point).
        # The pair table replicates S ways, postings key to one salt by
        # doc_id hash — identical rows, S-way parallel per word.
        nsalts = salt_factor(spark)
        pairs_join = pairs_join.withColumn(
            "_tsalt",
            F.explode(F.sequence(F.lit(0), F.lit(int(nsalts) - 1))),
        )
        postings = postings.withColumn(
            "_tsalt",
            F.pmod(
                F.crc32(F.col("doc_id").cast("string")), F.lit(int(nsalts))
            ).cast("int"),
        )
        # explicit fixed-n repartition (see bm25_index_probe): pins the
        # position-list fan-out at nsalts-way parallel where AQE's
        # byte-based coalescing would re-serialize the salted join
        postings = postings.repartition(
            salt_partitions(spark, nsalts), "word", "_tsalt"
        )
        cond_a = (postings.word == pairs_join.term_a) & (
            postings._tsalt == pairs_join._tsalt
        )
        cond_b = (postings.word == pairs_join.term_b) & (
            postings._tsalt == pairs_join._tsalt
        )
    # both sides carry the FULL phrase identity (term_a, term_b):
    # pairing on doc_id alone would cross-pair the position lists of
    # two different phrases. Positions explode BEFORE the pairing join,
    # so the exchange moves (phrase, doc_id, pos) integers, never
    # arrays; term_a positions shift by +1 so adjacency is equality.
    a = postings.join(pairs_join, cond_a).select(
        "term_a",
        "term_b",
        "doc_id",
        F.explode(F.transform("positions", lambda x: x + 1)).alias("p"),
    )
    b_side = postings.join(pairs_join, cond_b).select(
        "term_a",
        "term_b",
        "doc_id",
        F.explode("positions").alias("p"),
    )
    # each match row is one occurrence (position values are distinct
    # within a (word, doc) posting), so count/min reproduce the old
    # size(intersect)/array_min exactly
    per_pair = (
        a.join(b_side, ["term_a", "term_b", "doc_id", "p"])
        .groupBy("term_a", "term_b", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_occurrences"),
            (F.min("p") - 1).cast("int").alias("first_pos"),
        )
    )
    if inline:
        fan = per_pair.join(F.broadcast(wl), ["term_a", "term_b"])
    else:
        # the phrase identity is exactly as Zipf-hot as the workload:
        # salt the fan-out join the same way (workload replicated S
        # ways, per-pair rows keyed by doc_id hash)
        nsalts = salt_factor(spark)
        wl_s = wl.withColumn(
            "_fsalt",
            F.explode(F.sequence(F.lit(0), F.lit(int(nsalts) - 1))),
        )
        per_pair = per_pair.withColumn(
            "_fsalt",
            F.pmod(
                F.crc32(F.col("doc_id").cast("string")), F.lit(int(nsalts))
            ).cast("int"),
        ).repartition(
            salt_partitions(spark, nsalts), "term_a", "term_b", "_fsalt"
        )
        fan = per_pair.join(wl_s, ["term_a", "term_b", "_fsalt"])
    return fan.select("query_id", "doc_id", "n_occurrences", "first_pos")


@query(
    "search_index_probe_phrase",
    oracle=PHRASE_ORACLE,
    doc="Persisted-index positional phrase search: the SAME postings "
    "artifact as search_index_probe_bm25 carries each term's sorted "
    "1-based positions, so a phrase workload reads only its two terms' "
    "bucket partitions and intersects stored position lists (term_a's "
    "successors against term_b's positions) — the inverted-index "
    "phrase lookup, O(|matched postings|) per workload vs the in-plan "
    "twin's full corpus token sweep. Same oracle as "
    "search_phrase_match — identical results by construction; the BM25 "
    "probe never reads the positions column (parquet column pruning, "
    "pinned in pytest), so the shared artifact costs it nothing.",
)
def search_index_probe_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    index_dir = bm25_index_build(spark, sf_dir)
    phrases = spark.createDataFrame(
        PHRASE_QUERIES, "query_id int, term_a string, term_b string"
    )
    return phrase_index_probe(spark, index_dir, phrases)


# --------------------------------------------------------------------------
# routing scores for INCOMING documents (background corpus statistics)
# --------------------------------------------------------------------------


def bm25_route_score(
    spark: SparkSession, index_dir: str, docs: DataFrame, terms: DataFrame,
    inline: bool | None = None,
) -> DataFrame:
    """BM25 routing scores of INCOMING documents (doc_id, text) against
    a query/topic workload (query_id, term), using the persisted
    index's BACKGROUND corpus statistics → (doc_id, query_id, score),
    matched docs only.

    This is the classification/routing direction of BM25 (which topic
    does this new doc belong to?), the dual of the search probe: tf and
    dl come from the incoming doc ITSELF, while df/n_docs/avgdl come
    from the stored corpus artifact — the doc is scored as if against
    the indexed corpus without being in it. Per-batch cost is one
    narrow map over the batch plus a pruned read of the workload
    terms' (word, df) rows; same K1/B/idf/rounding/term-order fold as
    every BM25 twin in the registry. Terms absent from the indexed
    corpus have no df and contribute nothing (inner join), exactly like
    ``bm25_scores``' term-df join.

    ``inline`` is the same workload switch as ``bm25_index_probe``
    (auto by default, bounded count up to TERMS_INLINE_MAX): a routing
    taxonomy of 1e5+ topic terms stays distributed — the batch tokens
    are narrowed map-side by the term-bucket expression and then
    semi-joined against the workload instead of an inlined word-IN
    literal, and the term/df joins shuffle on the word key instead of
    broadcasting. Identical rows either way (pinned in pytest)."""
    vdir = current_index_dir(index_dir)
    if inline is None:
        inline = terms.limit(TERMS_INLINE_MAX + 1).count() <= TERMS_INLINE_MAX
    stats = spark.read.parquet(os.path.join(vdir, "stats"))
    toked = docs.select(
        "doc_id", tokens(F.col("text")).alias("toks")
    ).withColumn("dl", F.size("toks").cast("long"))
    raw_tf = toked.select("doc_id", "dl", F.explode("toks").alias("word"))
    postings = spark.read.parquet(os.path.join(vdir, "postings"))
    if inline:
        rows = [
            (r["query_id"], r["term"])
            for r in terms.select("query_id", "term").collect()
        ]
        words = sorted({t for _, t in rows})
        buckets = _workload_buckets(spark, words)
        terms_df = F.broadcast(
            spark.createDataFrame(rows, "query_id int, term string")
        )
        dfrel = F.broadcast(
            postings.filter(F.col("bucket").isin(buckets))
            .filter(F.col("word").isin(words))
            .select("word", "df")
            .distinct()
        )
        # selective BEFORE the shuffle: the inlined literal prunes the
        # exploded batch tokens map-side
        stf_src = raw_tf.filter(F.col("word").isin(words))
    else:
        terms_df = terms.select("query_id", "term")
        buckets = sorted(
            r["bucket"]
            for r in terms_df.select(
                _bucket_expr(F.col("term")).alias("bucket")
            )
            .distinct()
            .collect()
        )
        dfrel = (
            postings.filter(F.col("bucket").isin(buckets))
            .select("word", "df")
            .distinct()
        )
        # the bucket expression is the map-side pre-filter the literal
        # IN played on the inline path (bounded ≤N_TERM_BUCKETS values);
        # exactness comes from the word-key joins below
        stf_src = raw_tf.filter(
            _bucket_expr(F.col("word")).isin(buckets)
        )
    stf = (
        stf_src
        .groupBy("doc_id", "dl", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    if inline:
        cond = stf.word == terms_df.term
    else:
        # same salt as bm25_index_probe's distributed join: the word key
        # is low-cardinality/Zipf-hot in a routing taxonomy, so the
        # batch-tf x workload join salts — workload replicated S ways,
        # each batch doc keyed to one salt by doc_id hash
        nsalts = salt_factor(spark)
        terms_df = terms_df.withColumn(
            "_tsalt",
            F.explode(F.sequence(F.lit(0), F.lit(int(nsalts) - 1))),
        )
        stf = stf.withColumn(
            "_tsalt",
            F.pmod(
                F.crc32(F.col("doc_id").cast("string")), F.lit(int(nsalts))
            ).cast("int"),
        )
        # explicit fixed-n repartition (see bm25_index_probe): pins the
        # routing fan-out at nsalts-way parallel under AQE coalescing
        stf = stf.repartition(
            salt_partitions(spark, nsalts), "word", "_tsalt"
        )
        cond = (stf.word == terms_df.term) & (stf._tsalt == terms_df._tsalt)
    # dfrel is (word, df) distinct — bounded by the matched buckets'
    # vocabulary, tiny rows — broadcast it rather than shuffling the
    # scored pairs a second time on the same hot word key
    hits = (
        stf.join(terms_df, cond)
        .join(F.broadcast(dfrel), "word")
        .crossJoin(F.broadcast(stats))
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
        hits.select("doc_id", "query_id", "term", contrib.alias("c"))
        .groupBy("doc_id", "query_id")
        .agg(F.round(_ordered_sum("c", "term"), 6).alias("score"))
    )


# --------------------------------------------------------------------------
# TF-IDF from the same artifact (fourth consumer)
# --------------------------------------------------------------------------


def _tfidf_twin_oracle() -> str:
    # share the in-plan twin's oracle VERBATIM from the registry so the
    # two entries can never drift
    from datafusion_nats_spark.registry import REGISTRY

    return REGISTRY["text_tfidf_top_terms"].oracle


@query(
    "text_tfidf_indexed",
    oracle=_tfidf_twin_oracle(),
    doc="TF-IDF top terms served from the persisted postings index — the "
    "fourth consumer of the ONE artifact (BM25 probe, phrase probe, "
    "routing scores, now keyword extraction): tf and df are stored in "
    "the posting row and N in the 1-row stats, so scoring a document "
    "slice is ONE pushed-filter scan of the postings plus a per-doc "
    "rank — no corpus tokenize, no tf/df shuffles. Same oracle as "
    "text_tfidf_top_terms (shared verbatim from the registry) — "
    "identical results by construction.",
)
def text_tfidf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    index_dir = bm25_index_build(spark, sf_dir)
    vdir = current_index_dir(index_dir)
    postings = (
        spark.read.parquet(os.path.join(vdir, "postings"))
        # the twin's document slice; pushed to the parquet scan (row-group
        # min/max skipping inside every bucket — the slice cuts ROWS, the
        # bucket layout cuts nothing here because every bucket can hold
        # low doc_ids; the saving is the corpus tokenize + both shuffles)
        .filter(F.col("doc_id") < 10)
        .select("doc_id", "word", "tf", "df")
    )
    stats = spark.read.parquet(os.path.join(vdir, "stats")).select("n_docs")
    scored = postings.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        "word",
        F.round(
            F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
            6,
        ).alias("tfidf"),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), "word")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "word", "tfidf", "rn")
        .orderBy("doc_id", "rn")
    )
