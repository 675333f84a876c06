"""Spark-ML-backed variants of the dedup / similarity operators
(SURVEY §7.3: "ML-lib MinHash-LSH"): the JVM-native scale path, offered
alongside the md5-derived expression implementations (which exist for
exact cross-engine oracles).

- ``dedup_minhash_ml`` — pyspark.ml.feature.MinHashLSH over a
  HashingTF shingle vector; approxSimilarityJoin does the banded
  candidate join natively.
- ``sim_kmeans_ann`` — pyspark.ml.clustering.KMeans codebook (the real
  IVF coarse quantizer; the label-cell version approximates it),
  probe-nearest-cells + exact rerank.

Both are deterministic under a fixed seed but engine-specific →
rows-only driver checks; quality is asserted in pytest against the
exact baselines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datafusion_nats_spark.extensions.dedup import _shingles_spark
from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load

SEED = 42


@query(
    "dedup_minhash_ml",
    oracle=None,  # MLlib hash family is engine-specific; quality in pytest
    doc="MinHash-LSH near-dup candidates via Spark ML (HashingTF shingle "
    "vectors → MinHashLSH approxSimilarityJoin at Jaccard distance ≤ 0.5) "
    "— the JVM-native banded join; pairs verified in pytest against the "
    "expression-level MinHash implementation.",
)
def dedup_minhash_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import HashingTF, MinHashLSH

    d = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    shingled = d.select("doc_id", _shingles_spark(F.col("text")).alias("shingles")).filter(
        F.size("shingles") > 0
    )
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=1 << 18)
    vectors = tf.transform(shingled)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=SEED)
    model = lsh.fit(vectors)
    pairs = model.approxSimilarityJoin(vectors, vectors, 0.5, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(1 - F.col("jaccard_dist"), 6).alias("jaccard_sim"),
        )
    )


@query(
    "sim_kmeans_ann",
    oracle=None,  # clustering is engine-specific; recall asserted in pytest
    doc="IVF ANN with a real KMeans codebook (k=8, fixed seed): assign "
    "every vector to its cell, probe the 2 nearest cells per query, exact "
    "cosine rerank within probed cells — the production shape of "
    "sim_ivf_ann's label-cell approximation.",
)
def sim_kmeans_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("emb"),
    )
    vecs = e.withColumn("features", array_to_vector("emb"))
    km = KMeans(k=8, seed=SEED, featuresCol="features", predictionCol="cell")
    model = km.fit(vecs)
    assigned = model.transform(vecs).select("vec_id", "emb", "cell")
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, centroid array<double>",
    )

    def dot(a, b):
        return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)

    def norm(a):
        return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))

    q = assigned.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
    )
    probe_w = W.partitionBy("query_id").orderBy(F.desc("cell_sim"), "cell")
    probes = (
        F.broadcast(q)
        .crossJoin(F.broadcast(centroids))
        .withColumn(
            "cell_sim",
            dot(F.col("qe"), F.col("centroid")) / (norm(F.col("qe")) * norm(F.col("centroid"))),
        )
        .withColumn("r", F.row_number().over(probe_w))
        .filter(F.col("r") <= 2)
        .select("query_id", "qe", "cell")
    )
    scored = probes.join(
        assigned, (assigned.cell == probes.cell) & (assigned.vec_id != probes.query_id)
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(
            dot(F.col("qe"), F.col("emb")) / (norm(F.col("qe")) * norm(F.col("emb"))), 6
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return scored.withColumn("rn", F.row_number().over(w).cast("bigint")).filter(
        F.col("rn") <= 10
    )
