"""Similarity search over the embeddings table (driver mandate):
brute-force cosine top-k as the correctness baseline, and an IVF-style
(inverted-file) approximate variant as the scale path.

Scale design (100 TB):
- brute-force is a broadcast of the (small) query set against the full
  corpus — one map-side pass + a per-query top-k (window over the query
  partition); correct but O(corpus × queries);
- IVF: coarse centroids (here: per-label means, standing in for a k-means
  codebook) are a tiny broadcastable table; each query probes its
  ``nprobe`` nearest centroids and exact-scores only vectors in those
  cells — the pair space shrinks by ~n_cells/nprobe, and the expensive
  join is an equi-join on the cell id.

Dot products run in double precision via zip_with/aggregate (JVM
higher-order functions, no UDFs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load, salt_partitions

TOP_K = 10
N_QUERIES = 5  # vec_id < 5 are the query vectors
NPROBE = 2


def _emb_double(col="embedding"):
    return F.transform(F.col(col), lambda x: x.cast("double"))


# NOTE (round-9 measurement): unrolling these folds into element_at
# expression trees was tried and is ~4x SLOWER than the higher-order
# fold (the deep Add tree defeats JIT compilation), so the fold IS the
# fast JVM-exact form. The real pair-cost lever is hoisting the norms
# out of pair projections (see ivf_rerank_topk) — ~40% per-pair cut.
def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


@query(
    "sim_bruteforce_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}
    ), scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             round(
               list_sum(list_transform(list_zip(q.qe, e.embedding),
                        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))),
               6) AS cosine
      FROM q JOIN embeddings e ON e.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= {TOP_K}
    """,
    doc="Brute-force cosine top-k: broadcast query set × corpus scan, "
    "per-query top-k via window (ties broken on rounded cosine then id "
    "so the result is engine-stable).",
)
def sim_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", _emb_double().alias("emb")
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
    )
    scored = (
        F.broadcast(q)
        .join(e, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_dot(F.col("qe"), F.col("emb")) / (_norm(F.col("qe")) * _norm(F.col("emb"))), 6).alias(
                "cosine"
            ),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= TOP_K)
    )


_DOT_DUCK = (
    "list_sum(list_transform(list_zip({a}, {b}), "
    "p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
)
_NORM_DUCK = "sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))"


# The whole IVF pipeline (per-label mean centroids -> nprobe probe ->
# exact rerank) is deterministic arithmetic, so it gets a full oracle:
# cell similarity is rounded to 6 decimals on BOTH sides before the
# probe ranking (ties then break on the cell id), same convention as
# every other cross-engine float ordering here. Shared with the
# persisted-index twin sim_index_probe (extensions/ann_index.py), whose
# results must be identical by construction. ``ivf_ann_oracle`` is the
# parameterized form — the big-batch distributed-probe twin
# (sim_index_probe_bigbatch) pins the same pipeline over a larger
# query set.
def ivf_ann_oracle(query_filter: str) -> str:
    return _IVF_ORACLE_TEMPLATE.replace("__QUERY_FILTER__", query_filter)


_IVF_ORACLE_TEMPLATE = f"""
    WITH e AS (
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
    ), q AS (
      SELECT vec_id AS query_id, emb AS qe FROM e WHERE __QUERY_FILTER__
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
        FROM q, cent c
      ) WHERE cell_rank <= {NPROBE}
    ), scored AS (
      SELECT p.query_id, e.vec_id AS neighbor_id,
             round({_DOT_DUCK.format(a='p.qe', b='e.emb')}
                   / ({_NORM_DUCK.format(a='p.qe')}
                      * {_NORM_DUCK.format(a='e.emb')}), 6) AS cosine
      FROM probes p JOIN e ON e.label = p.cell AND e.vec_id != p.query_id
    )
    SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= {TOP_K}
    """

IVF_ANN_ORACLE = ivf_ann_oracle(f"vec_id < {N_QUERIES}")


def ivf_centroids(e: DataFrame) -> DataFrame:
    """Coarse codebook: mean vector per label cell (k-means stand-in) —
    (cell, centroid array<double>). Shared between the in-plan sim_ivf_ann
    and the persisted-index build (extensions/ann_index.py) so the two
    can never drift: positional avg via posexplode + partial aggregation,
    re-assembled in position order."""
    return (
        e.select("label", F.posexplode("emb").alias("pos", "v"))
        .groupBy("label", "pos")
        .agg(F.avg("v").alias("m"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("centroid")
        )
        .select(F.col("label").alias("cell"), "centroid")
    )


def ivf_probe_cells(
    q: DataFrame, centroids: DataFrame, broadcast_q: bool = True
) -> DataFrame:
    """(query_id, qe) × codebook → the NPROBE nearest cells per query:
    (query_id, qe, cell). The codebook is always broadcast (tiny by
    design); the query batch is broadcast too by default, but a huge
    batch passes ``broadcast_q=False`` to stay distributed — the
    per-query argmax is a window over query_id either way, so results
    are identical. Cell similarity is rounded to 6 decimals before
    ranking (ties on cell id) so the probe choice is engine-stable.
    Shared with the persisted index probe."""
    probe_w = W.partitionBy("query_id").orderBy(F.desc("cell_sim"), "cell")
    # norms hoisted out of the (query x centroid) pair projection —
    # higher-order folds are interpreted, so per-pair norm recompute
    # tripled the consult's CPU; identical doubles either way
    q = q.withColumn("_qn", _norm(F.col("qe")))
    centroids = centroids.withColumn("_cn", _norm(F.col("centroid")))
    return (
        (F.broadcast(q) if broadcast_q else q)
        .crossJoin(F.broadcast(centroids))
        .withColumn(
            "cell_sim",
            F.round(
                _dot(F.col("qe"), F.col("centroid"))
                / (F.col("_qn") * F.col("_cn")),
                6,
            ),
        )
        .withColumn("cell_rank", F.row_number().over(probe_w))
        .filter(F.col("cell_rank") <= NPROBE)
        .select("query_id", "qe", "cell")
    )


def ivf_rerank_topk(
    probes: DataFrame, e: DataFrame, k: int = TOP_K, salts: int | None = None
) -> DataFrame:
    """Exact cosine rerank of probed cells, per-query top-``k``. ``e`` is
    the (vec_id, label, emb) corpus — in-plan the full table, in the
    persisted-index path the partition-pruned cells only (identical
    results: the probe join keeps only probed cells either way).
    ``k`` defaults to the registry TOP_K; the hybrid fusion's vector arm
    asks for ARM_K candidates instead.

    ``salts``: the DISTRIBUTED big-batch path must pass a salt count.
    Its rerank is a shuffle join whose key (cell) has at most |codebook|
    distinct values, so an unsalted join serializes onto ≤|codebook|
    tasks no matter how many cores exist — measured at the 1e5-query
    design point as ONE 437 s task doing the whole rerank (AQE's
    skew-split keys off partition BYTES and never fired at that size).
    Salting replicates the pruned corpus side ``salts`` ways and keys
    queries to one salt by query_id hash: the join key becomes (cell,
    salt) — |codebook|·salts partitions — and every (query, vector)
    pair still matches exactly once, so output is identical. The
    broadcast inline path needs no salt (map-side join, no shuffle)."""
    if salts and salts > 1:
        e = e.withColumn(
            "_rsalt",
            F.explode(F.sequence(F.lit(0), F.lit(int(salts) - 1))),
        )
        probes = probes.withColumn(
            "_rsalt",
            F.pmod(F.crc32(F.col("query_id").cast("string")), F.lit(int(salts))).cast(
                "int"
            ),
        )
        # EXPLICIT fixed-n repartition on the salted key, not just the
        # salt: the join INPUTS are small in bytes while the join OUTPUT
        # explodes (|queries|·|cell| cosine evaluations computed
        # map-side — the window group-limit keeps the post-join shuffle
        # tiny), so AQE's partition coalescing — which only sees input
        # bytes — merges the salted partitions right back into one task.
        # A user-specified numPartitions is not AQE-coalescible, which
        # pins the rerank's parallelism at `salts` tasks.
        nparts = salt_partitions(probes.sparkSession, int(salts))
        e = e.repartition(nparts, "label", "_rsalt")
        probes = probes.repartition(nparts, "cell", "_rsalt")
        cond = (
            (e.label == probes.cell)
            & (e._rsalt == probes._rsalt)
            & (e.vec_id != probes.query_id)
        )
    else:
        cond = (e.label == probes.cell) & (e.vec_id != probes.query_id)
    # norms hoisted OUT of the pair projection: higher-order array
    # aggregates are interpreted (CodegenFallback), so computing
    # norm(qe)/norm(emb) per PAIR made each cosine three interpreted
    # 64-element folds instead of one — precomputing them per row cuts
    # ~2/3 of the rerank's CPU with bit-identical results (same double
    # expressions, evaluated once per side instead of once per pair)
    probes = probes.withColumn("_qn", _norm(F.col("qe")))
    e = e.withColumn("_en", _norm(F.col("emb")))
    scored = (
        probes.join(e, cond)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                _dot(F.col("qe"), F.col("emb"))
                / (F.col("_qn") * F.col("_en")),
                6,
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
    )


@query(
    "sim_ivf_ann",
    oracle=IVF_ANN_ORACLE,
    doc="IVF-style ANN: per-label centroid codebook (broadcast), probe the "
    f"{NPROBE} nearest cells per query, exact cosine rerank within cells. "
    "Full DuckDB oracle (deterministic arithmetic end-to-end); recall@10 "
    "vs brute force additionally asserted in pytest.",
)
def sim_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _emb_double().alias("emb")
    )
    centroids = ivf_centroids(e)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qe")
    )
    # probe nprobe nearest cells per query, then exact rerank within the
    # probed cells only (equi-join on cell id) — both steps shared with
    # the persisted-index twin
    return ivf_rerank_topk(ivf_probe_cells(q, centroids), e)


@query(
    "sim_pairwise_label_stats",
    oracle="""
    WITH sims AS (
      SELECT a.label AS label_a, b.label AS label_b,
             list_sum(list_transform(list_zip(a.embedding, b.embedding),
                      p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
                * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))) AS cos
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE a.vec_id < 60 AND b.vec_id < 60
    )
    SELECT CAST(label_a = label_b AS BOOLEAN) AS same_label,
           count(*) AS n_pairs,
           round(avg(cos), 6) AS avg_cos,
           round(max(cos), 6) AS max_cos
    FROM sims
    GROUP BY same_label
    """,
    doc="Embedding-space sanity statistic: within- vs cross-label cosine "
    "(bounded window — the full-corpus version runs blocked/sampled).",
)
def sim_pairwise_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 60).select(
        "vec_id", "label", _emb_double().alias("emb")
    )
    a, b = e.alias("a"), e.alias("b")
    cos = _dot(F.col("a.emb"), F.col("b.emb")) / (_norm(F.col("a.emb")) * _norm(F.col("b.emb")))
    # both sides are the constant 60-row diagnostic window; the broadcast
    # hint asserts that boundedness for the registry-wide cartesian guard
    return (
        F.broadcast(a).join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select((F.col("a.label") == F.col("b.label")).alias("same_label"), cos.alias("cos"))
        .groupBy("same_label")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("cos"), 6).alias("avg_cos"),
            F.round(F.max("cos"), 6).alias("max_cos"),
        )
    )


@query(
    "sim_int8_quantization",
    oracle="""
    WITH pe AS (
      SELECT vec_id, label,
             generate_subscripts(embedding, 1) - 1 AS idx,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings
    ), stats AS (
      SELECT idx, min(val) AS lo, max(val) AS hi FROM pe GROUP BY idx
    ), q AS (
      SELECT vec_id, label, val, lo, hi,
             round((val - lo) / (hi - lo) * 255) - 128 AS qv
      FROM pe JOIN stats USING (idx)
    ), r AS (
      SELECT vec_id, label,
             abs(val - ((qv + 128) / 255.0 * (hi - lo) + lo)) AS err
      FROM q
    )
    SELECT label,
           count(DISTINCT vec_id) AS n_vecs,
           round(avg(err), 6) AS avg_err,
           round(max(err), 6) AS max_err
    FROM r
    GROUP BY label
    ORDER BY label
    """,
    doc="Int8 scalar quantization of embeddings (per-dimension min/max "
    "codebook -> 8-bit codes -> dequantize) with per-label reconstruction "
    "error — the 4× vector-compression step of large-scale ANN pipelines. "
    "The 64-row per-dimension codebook broadcasts; everything else is one "
    "posexplode + two aggregations, no driver collects.",
)
def sim_int8_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    pe = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("idx", "valf")
    ).select("vec_id", "label", "idx", F.col("valf").cast("double").alias("val"))
    stats = pe.groupBy("idx").agg(F.min("val").alias("lo"), F.max("val").alias("hi"))
    q = pe.join(F.broadcast(stats), "idx").select(
        "vec_id",
        "label",
        "val",
        "lo",
        "hi",
        (F.round((F.col("val") - F.col("lo")) / (F.col("hi") - F.col("lo")) * 255) - 128).alias("qv"),
    )
    err = F.abs(
        F.col("val") - ((F.col("qv") + 128) / 255.0 * (F.col("hi") - F.col("lo")) + F.col("lo"))
    )
    return (
        q.select("vec_id", "label", err.alias("err"))
        .groupBy("label")
        .agg(
            F.countDistinct("vec_id").alias("n_vecs"),
            F.round(F.avg("err"), 6).alias("avg_err"),
            F.round(F.max("err"), 6).alias("max_err"),
        )
        .orderBy("label")
    )


N_PLANES = 16  # random-projection signature bits


@query(
    "sim_random_projection_lsh",
    oracle=f"""
    WITH pe AS (
      SELECT vec_id,
             generate_subscripts(embedding, 1) AS d,
             CAST(unnest(embedding) AS DOUBLE) AS val
      FROM embeddings
    ), proj AS (
      SELECT vec_id, j,
             sum(val * ((('0x' || substr(md5(CAST(j AS VARCHAR) || ','
                          || CAST(d AS VARCHAR)), 1, 15))::BIGINT % 2001
                         - 1000) / 1000.0)) AS dot
      FROM pe, range({N_PLANES}) t(j)
      GROUP BY vec_id, j
    ), sigs AS (
      SELECT vec_id,
             CAST(sum(CASE WHEN dot >= 0 THEN 1 << j ELSE 0 END) AS BIGINT)
               AS signature
      FROM proj GROUP BY vec_id
    )
    SELECT signature, count(*) AS n_vecs
    FROM sigs
    GROUP BY signature
    HAVING count(*) >= 2
    ORDER BY n_vecs DESC, signature
    LIMIT 20
    """,
    doc="Random-projection (sign) LSH over embeddings: 16 md5-derived "
    "pseudo-random hyperplanes -> sign-bit signature per vector -> "
    "candidate buckets (>=2 members). The cosine analogue of SimHash and "
    "the bucket stage of an ANN pipeline; hyperplane weights derive from "
    "md5 so both engines compute bit-identical signatures. Scale: one "
    "explode + two keyed aggregations; bucket join replaces all-pairs.",
)
def sim_random_projection_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    pe = e.select(
        "vec_id", F.posexplode("embedding").alias("d0", "valf")
    ).select("vec_id", (F.col("d0") + 1).alias("d"), F.col("valf").cast("double").alias("val"))
    planes = spark.range(N_PLANES).select(F.col("id").cast("int").alias("j"))
    weight = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(",", F.col("j").cast("string"), F.col("d").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 2001
        - 1000
    ) / 1000.0
    proj = (
        pe.crossJoin(F.broadcast(planes))
        .select("vec_id", "j", (F.col("val") * weight).alias("contrib"))
        .groupBy("vec_id", "j")
        .agg(F.sum("contrib").alias("dot"))
    )
    # shiftleft() needs a literal shift amount — column shifts go via expr
    bit = F.expr("CASE WHEN dot >= 0 THEN shiftleft(CAST(1 AS BIGINT), j) ELSE 0 END")
    sigs = proj.groupBy("vec_id").agg(F.sum(bit).cast("bigint").alias("signature"))
    return (
        sigs.groupBy("signature")
        .agg(F.count(F.lit(1)).alias("n_vecs"))
        .filter(F.col("n_vecs") >= 2)
        .orderBy(F.desc("n_vecs"), "signature")
        .limit(20)
    )


@query(
    "sim_arrow_vector_stats",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           round(sqrt(list_sum(list_transform(
             embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm,
           round(list_sum(list_transform(
             embedding, x -> CAST(x AS DOUBLE))), 4) AS comp_sum
    FROM embeddings
    """,
    doc="Vector statistics through mapInArrow — the zero-copy Python "
    "path: Arrow batches reach numpy without per-row conversion "
    "(ListArray.values is one flat float32 buffer reshaped to a matrix), "
    "vectorized math runs per batch, and Arrow batches go straight back. "
    "The template for normalize/quantize/score kernels where built-in "
    "higher-order functions run out; ~row-at-a-time UDF cost /100. "
    "Float32 values are widened to float64 before squaring on BOTH "
    "engines so the arithmetic is bit-comparable.",
)
def sim_arrow_vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pyarrow as pa

    emb = load(spark, sf_dir, "embeddings")

    def vector_stats(batches):
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            vec_id = tbl.column("vec_id").to_numpy()
            arr = tbl.column("embedding").combine_chunks()
            flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
            dim = len(flat) // len(vec_id) if len(vec_id) else 0
            mat = flat.reshape(len(vec_id), dim) if len(vec_id) else flat.reshape(0, 0)
            yield pa.RecordBatch.from_pydict(
                {
                    "vec_id": pa.array(vec_id),
                    "dim": pa.array(np.full(len(vec_id), dim, dtype=np.int32)),
                    "l2_norm": pa.array(np.round(np.sqrt((mat * mat).sum(axis=1)), 4)),
                    "comp_sum": pa.array(np.round(mat.sum(axis=1), 4)),
                }
            )

    return emb.select("vec_id", "embedding").mapInArrow(
        vector_stats, "vec_id long, dim int, l2_norm double, comp_sum double"
    )


@query(
    "curation_label_centroid_outliers",
    oracle="""
    WITH dims AS (
      SELECT vec_id, label, u.x, u.i
      FROM (
        SELECT vec_id, label,
               unnest(list_transform(embedding,
                      (v, i) -> {'x': CAST(v AS DOUBLE), 'i': i})) AS u
        FROM embeddings
      )
    ), centroids AS (
      SELECT label, i, avg(x) AS c FROM dims GROUP BY label, i
    ), scored AS (
      SELECT d.vec_id, d.label,
             sum(d.x * c.c)       AS dot,
             sqrt(sum(d.x * d.x)) AS nv,
             sqrt(sum(c.c * c.c)) AS nc
      FROM dims d JOIN centroids c ON c.label = d.label AND c.i = d.i
      GROUP BY d.vec_id, d.label
    )
    SELECT vec_id, label,
           round(dot / (nv * nc), 6) AS centroid_cosine
    FROM scored
    WHERE round(dot / (nv * nc), 6) < 0.35
    """,
    doc="Mislabel / outlier detection for training-data curation: cosine "
    "of every embedding against its label's centroid; rows far from "
    "their class centroid (cos < 0.35) are flagged for review. The "
    "centroid aggregate is posexplode → groupBy(label, dim) — "
    "|labels|x|dims| rows, tiny at any corpus scale — then broadcast "
    "back and the per-row cosine is a JVM zip_with/aggregate, so the "
    "full table is scanned once and never shuffled.",
)
def curation_label_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", F.transform("embedding", lambda v: v.cast("double")).alias("emb")
    )
    dims = e.select("label", F.posexplode("emb").alias("i", "x"))
    centroids = (
        dims.groupBy("label", "i")
        .agg(F.avg("x").alias("c"))
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("i", "c"))).alias("pairs"))
        .select("label", F.transform("pairs", lambda p: p.getField("c")).alias("centroid"))
    )
    joined = e.join(F.broadcast(centroids), "label")
    cos = _dot(F.col("emb"), F.col("centroid")) / (
        _norm(F.col("emb")) * _norm(F.col("centroid"))
    )
    return (
        joined.select("vec_id", "label", F.round(cos, 6).alias("centroid_cosine"))
        .filter(F.col("centroid_cosine") < 0.35)
    )



PREFIX_DIMS = 8  # matryoshka coarse pass uses the first 8 of 64 dims
SHORTLIST = 30  # coarse candidates per query before full-dim rerank


@query(
    "sim_matryoshka_prefix_ann",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ), coarse AS (
      SELECT q.query_id, e.vec_id AS neighbor_id, q.qe, e.embedding AS ne,
             round(
               list_sum(list_transform(list_zip(q.qe[1:{PREFIX_DIMS}], e.embedding[1:{PREFIX_DIMS}]),
                        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(q.qe[1:{PREFIX_DIMS}], x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(e.embedding[1:{PREFIX_DIMS}], x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))),
               6) AS ccos
      FROM q JOIN embeddings e ON e.vec_id != q.query_id
    ), short AS (
      SELECT query_id, neighbor_id, qe, ne FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY ccos DESC, neighbor_id) AS r
        FROM coarse
      ) WHERE r <= {SHORTLIST}
    ), rerank AS (
      SELECT query_id, neighbor_id,
             round(
               list_sum(list_transform(list_zip(qe, ne),
                        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(qe, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(ne, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))),
               6) AS cosine
      FROM short
    )
    SELECT query_id, neighbor_id, cosine, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rn
      FROM rerank
    ) WHERE rn <= {TOP_K}
    """,
    doc=f"Matryoshka / prefix-dimension ANN (MRL, Kusupati et al. 2022, "
    f"arXiv:2205.13147): score the corpus on only the first {PREFIX_DIMS} "
    f"of 64 dims (an 8x cheaper pass whose per-vector state is 8 floats), "
    f"keep a {SHORTLIST}-candidate shortlist per query, then exact "
    f"full-dim cosine rerank to top {TOP_K}. The coarse pass reads an 8x "
    "narrower vector — at 100 TB that is the memory-bandwidth win "
    "matryoshka embeddings exist for; the rerank touches only "
    "|queries| x SHORTLIST full vectors. Cosines round to 6 decimals "
    "before each ranking window with id tiebreaks — engine-stable.",
)
def sim_matryoshka_prefix_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    pairs = F.broadcast(q).join(
        e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne")),
        F.col("neighbor_id") != F.col("query_id"),
    )

    def cos(a, b, ndims=None):
        ad = F.transform(a, lambda x: x.cast("double"))
        bd = F.transform(b, lambda x: x.cast("double"))
        if ndims is not None:
            ad, bd = F.slice(ad, 1, ndims), F.slice(bd, 1, ndims)
        return F.round(_dot(ad, bd) / (_norm(ad) * _norm(bd)), 6)

    wshort = W.partitionBy("query_id").orderBy(F.desc("ccos"), "neighbor_id")
    short = (
        pairs.select(
            "query_id",
            "neighbor_id",
            "qe",
            "ne",
            cos(F.col("qe"), F.col("ne"), PREFIX_DIMS).alias("ccos"),
        )
        .withColumn("r", F.row_number().over(wshort))
        .filter(F.col("r") <= SHORTLIST)
    )
    wfull = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        short.select(
            "query_id", "neighbor_id", cos(F.col("qe"), F.col("ne")).alias("cosine")
        )
        .withColumn("rn", F.row_number().over(wfull).cast("bigint"))
        .filter(F.col("rn") <= TOP_K)
    )


RADIUS_TAU = 0.35  # cosine threshold for range search


@query(
    "sim_range_search",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe
      FROM embeddings WHERE vec_id < {N_QUERIES}
    ), scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             round(
               list_sum(list_transform(list_zip(q.qe, e.embedding),
                        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
               / (sqrt(list_sum(list_transform(q.qe, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))
                  * sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE))))),
               6) AS cosine
      FROM q JOIN embeddings e ON e.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, cosine
    FROM scored WHERE cosine >= {RADIUS_TAU}
    """,
    doc=f"Range (radius) similarity search: ALL neighbors with cosine >= "
    f"{RADIUS_TAU} per query — the other retrieval primitive ANN systems "
    "expose besides top-k (unbounded result set, threshold semantics; "
    "what dedup and recall-sweep jobs actually want). Broadcast query "
    "set, map-side scoring, threshold filter — no ranking window at all, "
    "so unlike top-k there is no per-query sort; output size is bounded "
    "by the data, not by k. Cosine rounded to 6 decimals BEFORE the "
    "threshold compare so the kept set is engine-stable.",
)
def sim_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    pairs = F.broadcast(q).join(
        e.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne")),
        F.col("neighbor_id") != F.col("query_id"),
    )
    qd, nd = _emb_double("qe"), _emb_double("ne")
    cosine = F.round(_dot(qd, nd) / (_norm(qd) * _norm(nd)), 6)
    return pairs.select("query_id", "neighbor_id", cosine.alias("cosine")).filter(
        F.col("cosine") >= RADIUS_TAU
    )


@query(
    "sim_silhouette_by_label",
    oracle="""
    WITH e AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      FROM embeddings
    ), expl AS (
      SELECT vec_id, label, u.pos, u.x
      FROM e, LATERAL (
        SELECT generate_subscripts(emb, 1) AS pos, unnest(emb) AS x
      ) AS u
    ), cent AS (
      SELECT label AS clabel, pos, avg(x) AS cx
      FROM expl GROUP BY 1, 2
    ), dist AS (
      SELECT ex.vec_id, ex.label, c.clabel,
             CAST(round(sqrt(sum((ex.x - c.cx) * (ex.x - c.cx))) * 1000000.0)
                  AS BIGINT) AS d_u
      FROM expl ex JOIN cent c ON c.pos = ex.pos
      GROUP BY 1, 2, 3
    ), ab AS (
      SELECT vec_id, label,
             min(CASE WHEN clabel = label THEN d_u END) AS a_u,
             min(CASE WHEN clabel != label THEN d_u END) AS b_u
      FROM dist GROUP BY 1, 2
    ), ratio AS (
      SELECT vec_id, label, a_u, b_u,
             CAST(round((b_u - a_u) * 1000000.0 / greatest(a_u, b_u))
                  AS BIGINT) AS s_u
      FROM ab
    )
    SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
           round(CAST(sum(s_u) AS DOUBLE) / count(*) / 1000000.0, 6)
             AS silhouette,
           round(CAST(sum(a_u) AS DOUBLE) / count(*) / 1000000.0, 6)
             AS mean_intra,
           round(CAST(sum(b_u) AS DOUBLE) / count(*) / 1000000.0, 6)
             AS mean_nearest_other
    FROM ratio
    GROUP BY label
    """,
    doc="Simplified (centroid-based) silhouette score per label — the "
    "clustering-quality gauge for the label blocking that "
    "dedup_semantic_semdedup / sim_kmeans_ann rely on: a = distance to "
    "the OWN label centroid, b = distance to the nearest OTHER "
    "centroid, s = (b - a)/max(a, b), averaged per label (s near 1 = "
    "compact well-separated labels; near 0 = blocking is doing "
    "nothing). Centroids are a |labels| x dim aggregate broadcast back; "
    "per-vector distances are one posexplode-regroup (never an "
    "all-pairs join — the O(n^2) exact silhouette is what this "
    "closed-form variant avoids at 100 TB). Distances are rounded to "
    "1e-6 and carried as exact integer MICRO-UNITS (bigint) from that "
    "point on: the nearest-other min, the per-vector ratio (itself "
    "re-quantized to micro-units), and all three final averages are "
    "integer sums divided by count once — integer addition is "
    "associative, so the result is invariant to partial-aggregation "
    "order (a float avg over the rounded doubles flipped the 6th "
    "decimal of label 9's mean_nearest_other between 16- and 32-core "
    "runs at sf0.01: the true mean sits on a 5e-7 rounding boundary).",
)
def sim_silhouette_by_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.posexplode(F.transform("embedding", lambda x: x.cast("double"))).alias(
            "pos", "x"
        ),
    )
    cent = e.groupBy(F.col("label").alias("clabel"), "pos").agg(
        F.avg("x").alias("cx")
    )
    dist = (
        e.join(F.broadcast(cent), "pos")
        .groupBy("vec_id", "label", "clabel")
        .agg(
            F.round(
                F.sqrt(F.sum((F.col("x") - F.col("cx")) * (F.col("x") - F.col("cx"))))
                * F.lit(1000000.0)
            )
            .cast("bigint")
            .alias("d_u")
        )
    )
    ab = dist.groupBy("vec_id", "label").agg(
        F.min(F.when(F.col("clabel") == F.col("label"), F.col("d_u"))).alias("a_u"),
        F.min(F.when(F.col("clabel") != F.col("label"), F.col("d_u"))).alias("b_u"),
    )
    ratio = ab.withColumn(
        "s_u",
        F.round(
            (F.col("b_u") - F.col("a_u"))
            * F.lit(1000000.0)
            / F.greatest(F.col("a_u"), F.col("b_u"))
        ).cast("bigint"),
    )
    micro_mean = lambda c: F.round(  # noqa: E731 — integer sum / count / 1e6
        F.sum(c).cast("double") / F.count(F.lit(1)) / F.lit(1000000.0), 6
    )
    return ratio.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        micro_mean("s_u").alias("silhouette"),
        micro_mean("a_u").alias("mean_intra"),
        micro_mean("b_u").alias("mean_nearest_other"),
    )
