"""Distributed PCA over the embedding corpus — integer-exact covariance
+ deterministic normalized matrix squaring.

The missing dimensionality-reduction member of the embedding family
(matryoshka prefix-ANN truncates stored prefixes; PCA LEARNS the
projection): the top principal component of the 64-dim embedding
covariance, computed the way a 100 TB pipeline has to —

1. **One corpus pass for the Gram matrix, integer-exact.** Embeddings
   are quantized to micro-units (round(x·1e6) as BIGINT, the house
   convention), and each Arrow batch emits its PARTIAL Gram X^T X
   (64×64), column sums, and row count — at most 64·64+64+1 = 4161 rows
   per batch regardless of batch size, so the shuffle is bounded by
   #batches·4161 rows, never by the corpus. Integer partials make the
   reduction ORDER-FREE: any partition count / AQE re-plan produces the
   same exact sums (no float-mean partition-invariance hazard).
2. **Exact centered covariance.** n·S_ij − m_i·m_j in DECIMAL(38,0)
   (the fixture values fit LONG, but n·S overflows int64 at the 30x
   scale fixture already — DuckDB widens to HUGEINT, Spark needs the
   explicit decimal), then ONE correctly-rounded cast to DOUBLE per
   entry. Both engines see bit-identical covariance inputs.
3. **Deterministic spectral extraction, in-plan.** Plain power
   iteration is hopeless here — the corpus covariance has λ2/λ1 ≈ 0.99
   (measured), needing ~900 matvecs. Normalized matrix SQUARING gets
   the same effect in ten steps: M ← round(M·M / max|M·M|,
   12) raises C to the 2^t power (ratio^1024 ≈ 2e-6 — converged), each
   step one 64×64 self-join whose dot products are ordered left folds
   (F.aggregate / list_sum over index order — no distributed float
   reduction anywhere; the max-normalizer is an order-free exact max)
   and whose per-entry 12-decimal rounding absorbs engine ulp drift
   instead of compounding it. The eigenvector is the max-diagonal
   column of the converged M (guaranteed non-degenerate — no start-
   vector overlap gamble), the eigenvalue its Rayleigh quotient against
   the ORIGINAL covariance. Validated against numpy.linalg.eigh to
   ~1e-8 on all three fixture SFs (pytest).

Reference parity note: the reference engine (yarenty/datafusion_nats,
src/ 820 LoC) has no vector surface; this extends SURVEY §2C's
similarity family with the PCA/whitening step embedding pipelines run
before indexing (e.g. IVF-PCA in the Faiss lineage).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_nats_spark.extensions.similarity import _emb_double
from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load

EMB_DIM = 64
PCA_MU = 1_000_000  # micro-unit quantization, the house convention
# normalized-squaring steps: effective power 2^10 = 1024 — measured
# λ2/λ1 ≈ 0.987 at sf0.01 → residual mixing ratio ≈ 2e-6
PCA_SQUARINGS = 10
PCA_PROJECT_TOPK = 10  # the apply-side ranking depth

_ADD = lambda acc, x: acc + x  # noqa: E731 — ordered left-fold step
_R = f"range(1, {EMB_DIM + 1})"  # the oracle's 1-based dim range


def _gram_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One corpus pass → exact integer sufficient statistics as rows
    (i, j, s): the Gram entries S_ij (i,j ≥ 1), the column sums m_i
    (j = 0), and the corpus count n (i = j = 0)."""
    e = load(spark, sf_dir, "embeddings").select(
        F.transform(
            _emb_double(), lambda x: F.round(x * PCA_MU, 0).cast("long")
        ).alias("q")
    )

    def partial_gram(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["q"].to_numpy()).astype(np.int64)
            g = x.T @ x  # (64, 64) exact int64 partial
            m = x.sum(axis=0)
            ii, jj = np.indices((EMB_DIM, EMB_DIM))
            yield pd.DataFrame(
                {
                    "i": np.concatenate(
                        [ii.ravel() + 1, np.arange(1, EMB_DIM + 1), [0]]
                    ).astype("int32"),
                    "j": np.concatenate(
                        [jj.ravel() + 1, np.zeros(EMB_DIM, dtype=int), [0]]
                    ).astype("int32"),
                    "s": np.concatenate([g.ravel(), m, [len(pdf)]]),
                }
            )

    parts = e.mapInPandas(partial_gram, schema="i int, j int, s long")
    # order-free exact reduction: 4161 keys, any partitioning. The
    # per-batch partials fit int64 (≤ 1e12 per row × Arrow batch size),
    # but the REDUCED sums do not at the advertised scale (S_ij ~
    # 1e12·n overflows int64 near n=1e7 rows) — widen to decimal BEFORE
    # the sum, mirroring the oracle's HUGEINT aggregate.
    return parts.groupBy("i", "j").agg(
        F.sum(F.col("s").cast("decimal(38,0)")).alias("s")
    )


def _covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(i, j, c): the 64×64 covariance in DOUBLE, each entry the result
    of exactly one decimal→double cast, two double divisions, and ONE
    12-decimal rounding — the same grid the squaring steps use. The
    rounding is load-bearing for cross-engine determinism (round-8
    review): DuckDB's HUGEINT→DOUBLE cast is not correctly rounded
    (ldexp double-rounding), so without it a ~1e-16 covariance
    discrepancy could enter sq0 and amplify ~64× per squaring past the
    per-step absorption grid; snapping the covariance itself to the
    grid makes the squaring input bit-identical in both engines and
    shrinks the halfway-point exposure to this single rounding layer."""
    sums = _gram_sums(spark, sf_dir)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    ndf = sums.filter((F.col("i") == 0) & (F.col("j") == 0)).select(
        F.col("s").alias("n")
    )
    m1 = sums.filter((F.col("i") > 0) & (F.col("j") == 0)).select(
        F.col("i").alias("i"), F.col("s").alias("m_i")
    )
    m2 = m1.select(F.col("i").alias("j"), F.col("m_i").alias("m_j"))
    s_ij = sums.filter((F.col("i") > 0) & (F.col("j") > 0))
    centered = (
        dec("n") * dec("s") - dec("m_i") * dec("m_j")
    )  # ≤ ~1e22 at the 30x fixture — exact in decimal(38,0)
    n_d = F.col("n").cast("double")
    return (
        s_ij.join(F.broadcast(m1), "i")
        .join(F.broadcast(m2), "j")
        .crossJoin(F.broadcast(ndf))
        .select(
            "i",
            "j",
            F.round(
                centered.cast("double") / (n_d * n_d)
                / F.lit(float(PCA_MU) ** 2),
                12,
            ).alias("c"),
        )
    )


def _sorted_vals(key: str, val: str):
    """collect_list (key, val) structs → val array in key order (the
    deterministic array-assembly idiom used across the registry)."""
    return F.transform(
        F.array_sort(F.collect_list(F.struct(key, val))), lambda s: s[val]
    )


# One normalized-squaring step as a chained CTE (sq{t} from sq{t-1}).
# NOT a recursive CTE, and the max-abs normalizer is hoisted into its
# own subquery level: DuckDB 1.0.0 heap-corrupts on `flatten(col)`
# referenced inside a nested list lambda that also captures `col`
# (reproduced in isolation), while the hoisted form is fine.
_SQ_STEP = """sq{t} AS (
      SELECT list_transform(m2, row -> list_transform(row, x ->
               round(x / mx, 12))) AS cm
      FROM (
        SELECT m2, list_max(list_transform(flatten(m2), y -> abs(y))) AS mx
        FROM (
          SELECT list_transform({r}, i -> list_transform({r}, j ->
                   list_sum(list_transform({r}, k -> cm[i][k] * cm[j][k]))))
                   AS m2
          FROM sq{prev}
        )
      )
    )"""

_SQ_CHAIN = ", ".join(
    _SQ_STEP.format(t=t, prev=t - 1, r=_R)
    for t in range(1, PCA_SQUARINGS + 1)
)

# Shared oracle CTE chain: micro-unit quantization → HUGEINT Gram →
# exact covariance → chained normalized squarings → sign-fixed component.
_PCA_CTES = f"""e AS (
      SELECT list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * {PCA_MU}, 0) AS BIGINT)) AS q
      FROM embeddings
    ), pairs AS (
      SELECT i, j, sum(CAST(q[i] AS HUGEINT) * q[j]) AS s
      FROM e, {_R} t(i), {_R} u(j)
      GROUP BY i, j
    ), msum AS (
      SELECT i, sum(CAST(q[i] AS HUGEINT)) AS m
      FROM e, {_R} t(i) GROUP BY i
    ), nn AS (
      SELECT CAST(count(*) AS HUGEINT) AS n FROM e
    ), cov AS (
      -- round-12 mirrors the Spark side: snap the covariance to the
      -- squaring steps' grid so the (not-correctly-rounded) HUGEINT->
      -- DOUBLE cast can't seed sub-grid drift into sq0
      SELECT p.i, p.j,
             round(CAST(n * s - mi.m * mj.m AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) / 1e12, 12) AS c
      FROM pairs p
      JOIN msum mi ON mi.i = p.i
      JOIN msum mj ON mj.i = p.j
      CROSS JOIN nn
    ), cmat AS (
      SELECT list(c ORDER BY i) AS cm
      FROM (SELECT i, list(c ORDER BY j) AS c FROM cov GROUP BY i)
    ), sq0 AS (
      SELECT cm FROM cmat
    ), {_SQ_CHAIN}, fin AS (
      SELECT cm AS m FROM sq{PCA_SQUARINGS}
    ), pick AS (
      SELECT m[CAST(list_position(
               list_transform({_R}, i -> m[i][i]),
               list_max(list_transform({_R}, i -> m[i][i]))) AS INT)] AS vraw
      FROM fin
    ), vnorm AS (
      SELECT list_transform(vraw, x ->
               round(x / sqrt(list_sum(list_transform(vraw, y -> y * y))), 9))
               AS v
      FROM pick
    ), signed AS (
      SELECT list_transform(v, x -> x *
               CASE WHEN v[list_position(list_transform(v, a -> abs(a)),
                                         list_max(list_transform(v, a -> abs(a))))]
                         < 0
                    THEN CAST(-1.0 AS DOUBLE) ELSE CAST(1.0 AS DOUBLE) END) AS v
      FROM vnorm
    )"""

_ORACLE = f"""
    WITH {_PCA_CTES}, ray AS (
      SELECT v,
             list_sum(list_transform({_R}, i -> v[i] *
               list_sum(list_transform({_R}, j -> cm[i][j] * v[j])))) AS lam,
             list_sum(list_transform({_R}, i -> cm[i][i])) AS trace
      FROM signed, cmat
    )
    SELECT CAST(i AS INT)            AS dim,
           round(v[i], 6)            AS loading,
           round(lam, 6)             AS eigenvalue,
           round(lam / trace, 6)     AS explained_frac
    FROM ray, {_R} t(i)
"""

_PROJECT_ORACLE = f"""
    WITH {_PCA_CTES}
    SELECT vec_id, projection FROM (
      SELECT e2.vec_id,
             round(list_sum(list_transform({_R}, i -> qe[i] * v[i])), 6)
               AS projection
      FROM (SELECT vec_id,
                   list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qe
            FROM embeddings) e2, signed
    ) ORDER BY abs(projection) DESC, vec_id LIMIT {PCA_PROJECT_TOPK}
"""


@query(
    "sim_pca_power_iteration",
    oracle=_ORACLE,
    doc=f"Top principal component of the embedding covariance — the "
    "PCA/whitening step embedding pipelines run before indexing: ONE "
    "Arrow-batched corpus pass emits bounded integer Gram partials "
    f"(≤{EMB_DIM * EMB_DIM + EMB_DIM + 1} rows/batch — the shuffle never "
    "scales with the corpus, and integer partials make the reduction "
    "order-free), the exact centered covariance is formed in decimal and "
    f"cast once to double, then {PCA_SQUARINGS} deterministic normalized "
    "matrix squarings (effective power 2^"
    f"{PCA_SQUARINGS}; ordered-fold dot products, per-step 12-decimal "
    "rounding so engine ulp drift is absorbed, never compounded) "
    "converge where plain power iteration (λ2/λ1≈0.99 measured) cannot. "
    "Emits per-dimension loadings (max-diagonal column, sign-fixed), "
    "the Rayleigh eigenvalue, and the explained-variance fraction; "
    "validated against numpy.linalg.eigh to ~1e-8 in pytest; the oracle "
    "runs the identical recursion in DuckDB HUGEINT/list arithmetic.",
)
def sim_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    signed, cmat0 = _component_state(spark, sf_dir)
    dim_seq = F.sequence(F.lit(1), F.lit(EMB_DIM))
    cv = F.transform(
        dim_seq,
        lambda i: F.aggregate(
            F.zip_with(
                F.element_at(F.col("c0"), i.cast("int")),
                F.col("v"),
                lambda a, x: a * x,
            ),
            F.lit(0.0),
            _ADD,
        ),
    )
    lam = F.aggregate(F.zip_with(F.col("v"), cv, lambda a, x: a * x), F.lit(0.0), _ADD)
    trace = F.aggregate(
        F.transform(
            dim_seq,
            lambda i: F.element_at(
                F.element_at(F.col("c0"), i.cast("int")), i.cast("int")
            ),
        ),
        F.lit(0.0),
        _ADD,
    )
    ray = signed.crossJoin(F.broadcast(cmat0)).select(
        "v", lam.alias("lam"), trace.alias("trace")
    )
    return ray.select(
        "lam", "trace", F.posexplode(F.col("v")).alias("pos", "loading")
    ).select(
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.round(F.col("loading"), 6).alias("loading"),
        F.round(F.col("lam"), 6).alias("eigenvalue"),
        F.round(F.col("lam") / F.col("trace"), 6).alias("explained_frac"),
    )


@query(
    "sim_pca_project_topk",
    oracle=_PROJECT_ORACLE,
    doc=f"The APPLY side of the learned PCA component — projection "
    "scoring, the whitening/compression step a pipeline runs after "
    "learning the component: every embedding's dot product with the "
    "sign-fixed unit component (broadcast 1-row state, one ordered-fold "
    f"map over the corpus — no shuffle), ranked to the top "
    f"{PCA_PROJECT_TOPK} by |projection| (6-decimal-rounded before "
    "ranking, the house determinism rule) via TakeOrderedAndProject. "
    "Shares _component_state with sim_pca_power_iteration so learn and "
    "apply can never drift; the oracle reuses the identical CTE chain.",
)
def sim_pca_project_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    signed, _ = _component_state(spark, sf_dir)
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", _emb_double().alias("emb")
    )
    pr = F.round(
        F.aggregate(
            F.zip_with("emb", "v", lambda a, x: a * x), F.lit(0.0), _ADD
        ),
        6,
    )
    return (
        e.crossJoin(F.broadcast(signed))
        .select("vec_id", pr.alias("projection"))
        .orderBy(F.abs(F.col("projection")).desc(), F.col("vec_id"))
        .limit(PCA_PROJECT_TOPK)
    )


def _component_state(spark: SparkSession, sf_dir: str):
    """The learn side shared by the loadings report and the projection
    apply: (signed, cmat0) — the sign-fixed unit component as a 1-row
    array DataFrame, and the original covariance as a 1-row 64×64
    array-of-arrays DataFrame (for Rayleigh/trace)."""
    cov = _covariance(spark, sf_dir)
    # 64 rows; the iteration references each round's result TWICE (the
    # max-normalizer and the normalize join), so without truncation the
    # lineage doubles per squaring (2^10 copies of the corpus pass).
    # localCheckpoint per round — the house idiom for iterative plans
    # (connected components, pagerank) — keeps every round O(1).
    crows = cov.groupBy("i").agg(_sorted_vals("j", "c").alias("c")).localCheckpoint()
    cmat0 = crows.agg(_sorted_vals("i", "c").alias("c0"))  # 1 row, 64×64
    m = crows
    for _ in range(PCA_SQUARINGS):
        b = m.select(F.col("i").alias("j"), F.col("c").alias("cj"))
        prod = m.crossJoin(F.broadcast(b)).select(
            "i",
            "j",
            F.aggregate(
                F.zip_with("c", "cj", lambda a, x: a * x), F.lit(0.0), _ADD
            ).alias("m2"),
        )
        mx = prod.agg(F.max(F.abs(F.col("m2"))).alias("mx"))  # exact, order-free
        m = (
            prod.crossJoin(F.broadcast(mx))
            .select("i", "j", F.round(F.col("m2") / F.col("mx"), 12).alias("c"))
            .groupBy("i")
            .agg(_sorted_vals("j", "c").alias("c"))
            .localCheckpoint()
        )
    mat = m.agg(_sorted_vals("i", "c").alias("m"))  # 1 row, converged M
    dim_seq = F.sequence(F.lit(1), F.lit(EMB_DIM))
    diag = F.transform(
        dim_seq, lambda i: F.element_at(F.element_at(F.col("m"), i.cast("int")), i.cast("int"))
    )
    vraw = F.element_at(
        F.col("m"), F.array_position(diag, F.array_max(diag)).cast("int")
    )
    picked = mat.select(vraw.alias("vraw"))
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("vraw"), lambda y: y * y), F.lit(0.0), _ADD
        )
    )
    vnorm = picked.select(
        F.transform(F.col("vraw"), lambda x: F.round(x / norm, 9)).alias("v")
    )
    absv = F.transform(F.col("v"), F.abs)
    sgn = F.when(
        F.element_at(
            F.col("v"), F.array_position(absv, F.array_max(absv)).cast("int")
        )
        < 0,
        F.lit(-1.0),
    ).otherwise(F.lit(1.0))
    signed = vnorm.select(F.transform(F.col("v"), lambda x: x * sgn).alias("v"))
    return signed, cmat0
