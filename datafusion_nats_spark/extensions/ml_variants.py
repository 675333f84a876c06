"""ML-flavored variants of the dedup / similarity operators
(SURVEY §7.3: "ML-lib MinHash-LSH"), re-grounded for driver-checkable
determinism (VERDICT r1 #4):

- ``dedup_minhash_ml`` — MLlib ``MinHashLSH.approxSimilarityJoin`` for
  CANDIDATE GENERATION only; every candidate is then verified with the
  exact shingle-set Jaccard computed in-query, and only pairs at
  ``jaccard >= JACCARD_T`` are emitted. The output is therefore the
  deterministic verified-pair set with an exact DuckDB oracle (the
  all-pairs shared-shingle join — fine for an oracle, never for the
  engine). Recall of the seeded 8-table LSH at j >= 0.8 is
  1 - (1-j)^8 > 0.999997, and the planted-duplicate pytest pins it.
- ``sim_kmeans_ann`` — IVF ANN over a DETERMINISTIC Lloyd k-means
  codebook: md5-order seeding, ``LLOYD_ITERS`` unrolled iterations as
  DataFrame ops (assign = broadcast codebook cross-join + argmin;
  recompute = posexplode + per-dimension mean), then
  probe-nearest-cells + exact cosine rerank exactly like
  ``sim_ivf_ann``. Distances are rounded to 6 decimals before every
  argmin/rank so the cell choice is engine-stable; the DuckDB oracle
  unrolls the same iterations as chained CTEs (same pattern as
  ``graph_pagerank_suppliers``).
- ``sim_kmeans_ann_mllib`` — the original MLlib ``KMeans`` flavor, kept
  UNREGISTERED as a pytest-only quality cross-check (its cluster
  assignment is engine-specific, so it can never carry a cross-engine
  oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datafusion_nats_spark.extensions.dedup import _SHINGLES_DUCK, _shingles_spark
from datafusion_nats_spark.extensions.similarity import N_QUERIES, NPROBE, TOP_K
from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load, scan_parallelism

SEED = 42
JACCARD_T = 0.8  # exact-verify threshold for dedup_minhash_ml
K_CELLS = 8  # k-means codebook size
LLOYD_ITERS = 2  # unrolled Lloyd rounds (assign -> recompute)
DIM = 64  # embedding dimensionality


@query(
    "dedup_minhash_ml",
    oracle=f"""
    WITH shingled AS (
      SELECT doc_id, unnest({_SHINGLES_DUCK}) AS shingle
      FROM documents
    ), sizes AS (
      SELECT doc_id, count(DISTINCT shingle) AS n FROM shingled GROUP BY doc_id
    ), inter AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, count(*) AS i
      FROM shingled x
      JOIN shingled y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= {JACCARD_T}
    """,
    doc="MinHash-LSH near-dup pairs via Spark ML candidate generation "
    "(HashingTF shingle vectors → seeded 8-table MinHashLSH "
    "approxSimilarityJoin) followed by EXACT shingle-set Jaccard "
    f"verification in-query at >= {JACCARD_T} — the emitted pair set is "
    "deterministic (LSH only prunes; the verify join decides), so it "
    "carries a full DuckDB oracle. The oracle's all-pairs shared-shingle "
    "join is the semantic twin only — the engine never goes all-pairs.",
)
def dedup_minhash_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import HashingTF, MinHashLSH

    d = load(spark, sf_dir, "documents").repartition(
        scan_parallelism(spark, sf_dir, "documents"), "doc_id"
    )
    shingled_arr = d.select(
        "doc_id", _shingles_spark(F.col("text")).alias("shingles")
    ).filter(F.size("shingles") > 0)
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18)
    vectors = tf.transform(shingled_arr)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=SEED)
    model = lsh.fit(vectors)
    # generous candidate threshold (hashed-Jaccard distance <= 0.5):
    # the exact verify below is the decision boundary, not this
    cand = (
        model.approxSimilarityJoin(vectors, vectors, 0.5, distCol="jaccard_dist")
        .filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    # exact verify on candidates only: intersection via shared-shingle
    # equi-join, sizes from the distinct shingle sets
    shingled = shingled_arr.select(
        "doc_id", F.explode("shingles").alias("shingle")
    ).persist()
    sizes = shingled.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    x = shingled.select(F.col("doc_id").alias("doc_a"), "shingle")
    y = shingled.select(F.col("doc_id").alias("yb"), F.col("shingle").alias("shingle_b"))
    inter = (
        cand.join(x, "doc_a")
        .join(y, (F.col("doc_b") == F.col("yb")) & (F.col("shingle") == F.col("shingle_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= JACCARD_T)
        .select("doc_a", "doc_b", F.round(jac, 6).alias("jaccard"))
    )


# shared fold helpers (similarity.py) — one implementation for every
# cosine operator keeps the oracle-parity arithmetic in one place
from datafusion_nats_spark.extensions.similarity import _dot, _norm  # noqa: E402


def _sqdist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda s, v: s + v
    )


_SQDIST_DUCK = (
    "list_sum(list_transform(list_zip({a}, {b}), p -> (p[1] - p[2]) * (p[1] - p[2])))"
)
_DOT_DUCK = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)
_NORM_DUCK = "sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))"


def lloyd_cte_prefix(k: int = K_CELLS, iters: int = LLOYD_ITERS) -> str:
    """WITH-chain for the deterministic Lloyd codebook, shared by the
    kmeans-IVF and SemDeDup oracles: defines ``e`` (vec_id, emb as
    doubles), ``cent0`` (md5-order seeds) .. ``cent{iters}``, and
    ``assign1`` .. ``assign{iters + 1}`` — the last being the final
    (vec_id, emb, cell) assignment under the converged codebook."""
    parts = [
        f"""
        WITH e AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
          FROM embeddings
        ), cent0 AS (
          SELECT CAST(row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS INT) AS cell,
                 emb AS centroid
          FROM (SELECT vec_id, emb FROM e
                ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k})
        )
        """
    ]
    for i in range(1, iters + 2):  # final round = assignment only
        parts.append(
            f"""
            , assign{i} AS (
              SELECT vec_id, emb, cell FROM (
                SELECT e.vec_id, e.emb, c.cell,
                       row_number() OVER (
                         PARTITION BY e.vec_id
                         ORDER BY round({_SQDIST_DUCK.format(a='e.emb', b='c.centroid')}, 6),
                                  c.cell
                       ) AS r
                FROM e, cent{i - 1} c
              ) WHERE r = 1
            )
            """
        )
        if i <= iters:
            parts.append(
                f"""
                , cent{i} AS (
                  SELECT cell, list(m ORDER BY pos) AS centroid
                  FROM (
                    SELECT cell, i AS pos, avg(emb[i]) AS m
                    FROM assign{i}, range(1, {DIM + 1}) t(i)
                    GROUP BY cell, i
                  )
                  GROUP BY cell
                )
                """
            )
    return "".join(parts)


def _kmeans_ann_oracle() -> str:
    """DuckDB twin of the deterministic Lloyd IVF: the shared Lloyd
    codebook prefix, then the same probe + exact-rerank tail as
    sim_ivf_ann's oracle."""
    final = LLOYD_ITERS + 1
    return lloyd_cte_prefix() + (
        f"""
        , q AS (
          SELECT vec_id AS query_id, emb AS qe FROM e WHERE vec_id < {N_QUERIES}
        ), probes AS (
          SELECT query_id, qe, cell FROM (
            SELECT q.query_id, q.qe, c.cell,
                   row_number() OVER (
                     PARTITION BY q.query_id
                     ORDER BY round({_DOT_DUCK.format(a='q.qe', b='c.centroid')}
                              / ({_NORM_DUCK.format(a='q.qe')}
                                 * {_NORM_DUCK.format(a='c.centroid')}), 6) DESC,
                              c.cell
                   ) AS cell_rank
            FROM q, cent{LLOYD_ITERS} c
          ) WHERE cell_rank <= {NPROBE}
        ), scored AS (
          SELECT p.query_id, a.vec_id AS neighbor_id,
                 round({_DOT_DUCK.format(a='p.qe', b='a.emb')}
                       / ({_NORM_DUCK.format(a='p.qe')}
                          * {_NORM_DUCK.format(a='a.emb')}), 6) AS cosine
          FROM probes p JOIN assign{final} a
            ON a.cell = p.cell AND a.vec_id != p.query_id
        )
        SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rn
        FROM (
          SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY cosine DESC, neighbor_id) AS rn
          FROM scored
        ) WHERE rn <= {TOP_K}
        """
    )


def _mean_centroids(assigned: DataFrame) -> DataFrame:
    """Per-cell elementwise mean: posexplode -> (cell, pos) avg ->
    re-assemble ordered array. Two narrow shuffles of K*DIM rows."""
    return (
        assigned.select("cell", F.posexplode("emb").alias("pos", "v"))
        .groupBy("cell", "pos")
        .agg(F.avg("v").alias("m"))
        .groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("centroid")
        )
    )


def _assign_cells(e: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast the K-row codebook, argmin
    squared distance (rounded to 6 decimals, ties -> lowest cell)."""
    w = W.partitionBy("vec_id").orderBy("d", "cell")
    return (
        e.crossJoin(F.broadcast(cent))
        .withColumn("d", F.round(_sqdist(F.col("emb"), F.col("centroid")), 6))
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("vec_id", "emb", "cell")
    )


_LLOYD_CACHE: dict = {}


def lloyd_assignments(
    spark: SparkSession, sf_dir: str, k: int = K_CELLS, iters: int = LLOYD_ITERS
) -> tuple[DataFrame, DataFrame]:
    """Spark twin of ``lloyd_cte_prefix``: md5-order seeding, ``iters``
    assign/recompute rounds, then the final assignment under the
    converged codebook. Returns ``(assigned, cent)`` where ``assigned``
    is the persisted (vec_id, emb, cell) frame and ``cent`` the K-row
    codebook (localCheckpointed — K rows, lineage truncated).

    Memoized per (session, sf_dir, k, iters): the shared codebook feeds
    kmeans-IVF, SemDeDup, the embedding pipeline, and hard-negative
    mining — without the cache each caller would persist its own copy of
    the assignment frame (storage-memory growth over a suite run) and
    redo the seeding/iteration compute. Keyed on applicationId (unique
    per SparkContext, unlike ``id(spark)`` which CPython can reuse after
    GC); entries from any other application are evicted on miss so a
    session restart never resurrects DataFrames bound to a stopped
    context."""
    app_id = spark.sparkContext.applicationId
    key = (app_id, sf_dir, k, iters)
    if key in _LLOYD_CACHE:
        return _LLOYD_CACHE[key]
    for stale in [k2 for k2 in _LLOYD_CACHE if k2[0] != app_id]:
        del _LLOYD_CACHE[stale]
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
    )
    # md5-order seeding: top-K by hash is a TakeOrderedAndProject (scale-
    # safe); the row_number window then runs over K rows only.
    seeds = (
        e.select(F.md5(F.col("vec_id").cast("string")).alias("h"), "vec_id", "emb")
        .orderBy("h", "vec_id")
        .limit(k)
    )
    cent = seeds.withColumn(
        "cell", (F.row_number().over(W.orderBy("h", "vec_id")) - 1)
    ).select("cell", F.col("emb").alias("centroid"))
    for _ in range(iters):
        assigned = _assign_cells(e, cent)
        cent = _mean_centroids(assigned).localCheckpoint()  # K rows; truncates lineage
    assigned = _assign_cells(e, cent).persist()  # final cells feed downstream joins
    _LLOYD_CACHE[key] = (assigned, cent)
    return assigned, cent


@query(
    "sim_kmeans_ann",
    oracle=_kmeans_ann_oracle(),
    doc=f"IVF ANN with a deterministic Lloyd k-means codebook (k={K_CELLS}, "
    f"{LLOYD_ITERS} iterations, md5-order seeding): assign = broadcast "
    "codebook cross-join + rounded argmin, recompute = per-dimension "
    f"mean; then probe the {NPROBE} nearest cells per query and exact "
    f"cosine rerank within probed cells (top {TOP_K}). Fully "
    "deterministic arithmetic end-to-end -> full DuckDB oracle with the "
    "iterations unrolled as chained CTEs; recall vs brute force asserted "
    "in pytest. The MLlib KMeans flavor survives as the pytest-only "
    "sim_kmeans_ann_mllib cross-check.",
)
def sim_kmeans_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    assigned, cent = lloyd_assignments(spark, sf_dir)

    q = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
    )
    probe_w = W.partitionBy("query_id").orderBy(F.desc("cell_sim"), "cell")
    probes = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cent))
        .withColumn(
            "cell_sim",
            F.round(
                _dot(F.col("qe"), F.col("centroid"))
                / (_norm(F.col("qe")) * _norm(F.col("centroid"))),
                6,
            ),
        )
        .withColumn("cell_rank", F.row_number().over(probe_w))
        .filter(F.col("cell_rank") <= NPROBE)
        .select("query_id", "qe", "cell")
    )
    scored = probes.join(
        assigned, (assigned.cell == probes.cell) & (assigned.vec_id != probes.query_id)
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            _dot(F.col("qe"), F.col("emb")) / (_norm(F.col("qe")) * _norm(F.col("emb"))), 6
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return scored.withColumn("rn", F.row_number().over(w).cast("bigint")).filter(
        F.col("rn") <= TOP_K
    )


def sim_kmeans_ann_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNREGISTERED pytest-only cross-check: the MLlib KMeans flavor of
    the IVF codebook (engine-specific clustering — no cross-engine
    oracle possible). Quality is asserted in pytest as recall@10 against
    sim_bruteforce_topk."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
    )
    vecs = e.withColumn("features", array_to_vector("emb"))
    km = KMeans(k=K_CELLS, seed=SEED, featuresCol="features", predictionCol="cell")
    model = km.fit(vecs)
    assigned = model.transform(vecs).select("vec_id", "emb", "cell")
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, centroid array<double>",
    )
    q = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
    )
    probe_w = W.partitionBy("query_id").orderBy(F.desc("cell_sim"), "cell")
    probes = (
        F.broadcast(q)
        .crossJoin(F.broadcast(centroids))
        .withColumn(
            "cell_sim",
            _dot(F.col("qe"), F.col("centroid"))
            / (_norm(F.col("qe")) * _norm(F.col("centroid"))),
        )
        .withColumn("r", F.row_number().over(probe_w))
        .filter(F.col("r") <= NPROBE)
        .select("query_id", "qe", "cell")
    )
    scored = probes.join(
        assigned, (assigned.cell == probes.cell) & (assigned.vec_id != probes.query_id)
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            _dot(F.col("qe"), F.col("emb")) / (_norm(F.col("qe")) * _norm(F.col("emb"))), 6
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return scored.withColumn("rn", F.row_number().over(w).cast("bigint")).filter(
        F.col("rn") <= TOP_K
    )
