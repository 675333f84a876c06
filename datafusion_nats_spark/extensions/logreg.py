"""In-engine quality-classifier training: logistic regression by
unrolled deterministic batch gradient descent, expressed as relational
algebra — no MLlib, no driver-side math, no UDFs.

The standard LLM-corpus quality filter (GPT-3/C4/Gopher lineage) is a
tiny linear classifier over cheap text statistics, trained on a labeled
slice and then applied to the whole corpus as a map. At 100 TB the
training set itself can be billions of rows, so training has to BE a
distributed aggregation: each GD step is one corpus pass computing the
mean gradient (a 4-number aggregate), the model is a 1-row relation
broadcast back for the next pass — the classic "broadcast model,
aggregate gradient" loop, the same shape parameter servers distribute.

Fixture task — heuristic distillation, the way production corpus
filters are actually bootstrapped (label with a hand rule, train a
model to generalize it): the label is the repo's own composite quality
gate (``text_quality_score``'s length+stopword formula, thresholded at
its class-balancing midpoint 0.45), and the student learns it back
from the raw statistics (stopword ratio, scaled token count,
type-token ratio). The teacher's min-caps make it non-linear, so this
is a genuine fit, not an identity: 3 GD steps reach ~0.71-0.85
accuracy against a ~0.51 majority class at every SF, with logloss
strictly falling (pinned in pytest; exact trajectory pinned by the
full DuckDB oracle).

Determinism contract (the house FP rules):
- features are rounded to the 6-decimal grid once, up front;
- each doc's per-feature gradient / per-doc logloss contribution is
  rounded to 6 decimals and summed as exact integer micro-units
  (LONG), so the reduction is partition- and engine-invariant;
- weights live on the 6-decimal grid after every update;
- the sigmoid/ln calls happen per row BEFORE the rounding+integer
  conversion, so a last-ulp libm divergence between engines is
  absorbed by the grid except on measure-zero boundaries (same
  exposure as every ln/exp oracle in the registry);
- iterations are UNROLLED (ITERS is a compile-time constant) — the
  oracle pins the entire trajectory, not just the fixed point.

Reference parity note: the reference engine has no ML surface; this
extends the curation family (SURVEY.md §2C) with the
train-the-filter-in-the-engine primitive its pipelines assume exists.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_nats_spark.extensions.text import tokens
from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load

ITERS = 3  # unrolled GD steps
LR = 2.0  # learning rate (features are O(1)-scaled)
STOPWORDS = ("the", "a", "of", "and", "in", "to", "is")  # en profile
_MU = 1_000_000  # 6-decimal integer micro-units


QUALITY_THRESHOLD = 0.45  # class-balancing midpoint of the teacher gate


def quality_features(docs: DataFrame) -> DataFrame:
    """(doc_id, y, x1, x2, x3): label = the heuristic teacher
    (``text_quality_score``'s composite, thresholded at
    QUALITY_THRESHOLD); features = English-stopword ratio, token count
    / 100, type-token ratio — all on the 6-decimal grid. One narrow map
    over documents."""
    toks = tokens(F.col("text"))
    n_tok = F.size(toks).cast("double")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("double")
    stop_ratio = n_stop / n_tok
    teacher = (
        F.least(n_tok / 100, F.lit(1.0)) * 0.5
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.5
    )
    return docs.select(
        "doc_id",
        (teacher >= QUALITY_THRESHOLD).cast("double").alias("y"),
        F.round(stop_ratio, 6).alias("x1"),
        F.round(n_tok / 100, 6).alias("x2"),
        F.round(F.size(F.array_distinct(toks)).cast("double") / n_tok, 6).alias(
            "x3"
        ),
    )


def _mu_sum(col):
    """Exact integer-micro-unit sum of a 6-decimal-rounded double —
    the partition-invariant reduction."""
    return F.sum(F.round(col * _MU, 0).cast("long"))


def _eval_pass(feats: DataFrame, w: DataFrame) -> DataFrame:
    """ONE corpus pass against the broadcast 1-row model ``w``
    (w0..w3): returns a 1-row relation with the model's own metrics
    (logloss, accuracy) AND its mean-gradient micro-unit sums — the
    parameter-server step as an aggregate."""
    z = (
        F.col("w0")
        + F.col("w1") * F.col("x1")
        + F.col("w2") * F.col("x2")
        + F.col("w3") * F.col("x3")
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    e = p - F.col("y")
    # the sigmoid saturates to exactly 0/1 once |z| ≳ 37 (reachable on
    # adversarially long documents: x2 = n_tok/100 is unbounded), and
    # ln(0) = -inf would poison the micro-unit sum (Spark clamps the
    # LONG cast at Long.MaxValue, DuckDB errors — engine/oracle
    # divergence). Clamp p to [1e-12, 1-1e-12] inside the log terms
    # ONLY (gradients keep the exact p), mirrored verbatim in the
    # oracle CTE (_training_blocks) so both engines clamp identically
    # (round-7 advisory).
    p_c = F.greatest(F.least(p, F.lit(1.0 - 1e-12)), F.lit(1e-12))
    ll = -(
        F.col("y") * F.log(p_c)
        + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - p_c)
    )
    correct = F.when(
        ((z >= 0) & (F.col("y") == 1.0)) | ((z < 0) & (F.col("y") == 0.0)), 1
    ).otherwise(0)
    scored = feats.crossJoin(F.broadcast(w)).select(
        "w0",
        "w1",
        "w2",
        "w3",
        F.round(e, 6).alias("g0"),
        F.round(e * F.col("x1"), 6).alias("g1"),
        F.round(e * F.col("x2"), 6).alias("g2"),
        F.round(e * F.col("x3"), 6).alias("g3"),
        F.round(ll, 6).alias("ll"),
        correct.alias("correct"),
    )
    return scored.groupBy("w0", "w1", "w2", "w3").agg(
        _mu_sum(F.col("g0")).alias("s0"),
        _mu_sum(F.col("g1")).alias("s1"),
        _mu_sum(F.col("g2")).alias("s2"),
        _mu_sum(F.col("g3")).alias("s3"),
        _mu_sum(F.col("ll")).alias("sll"),
        F.sum("correct").alias("n_correct"),
        F.count(F.lit(1)).alias("n"),
    )


def _metrics_row(ev: DataFrame, it: int) -> DataFrame:
    return ev.select(
        F.lit(it).alias("it"),
        F.col("w0").alias("w_bias"),
        F.col("w1").alias("w_stop"),
        F.col("w2").alias("w_len"),
        F.col("w3").alias("w_ttr"),
        F.round(F.col("sll").cast("double") / _MU / F.col("n"), 6).alias(
            "logloss"
        ),
        F.round(F.col("n_correct").cast("double") / F.col("n"), 6).alias(
            "accuracy"
        ),
    )


def _next_weights(ev: DataFrame) -> DataFrame:
    upd = lambda w, s: F.round(  # noqa: E731
        F.col(w) - LR * (F.col(s).cast("double") / _MU / F.col("n")), 6
    )
    return ev.select(
        upd("w0", "s0").alias("w0"),
        upd("w1", "s1").alias("w1"),
        upd("w2", "s2").alias("w2"),
        upd("w3", "s3").alias("w3"),
    )


def _training_blocks() -> list[str]:
    """The shared unrolled-CTE training prefix: feats, it0..it{ITERS},
    ev0..ev{ITERS} — composed by the trajectory oracle AND the
    persisted-model scoring oracle so the two can never drift."""
    feats = f"""
    raw AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS n_tok,
             CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                          t -> t IN ('the','a','of','and','in','to','is'))) AS DOUBLE) AS n_stop,
             CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS DOUBLE) AS n_uniq
      FROM documents
    ), feats AS (
      SELECT doc_id,
             CAST(least(n_tok / 100, 1.0) * 0.5
                  + least(n_stop / n_tok * 5, 1.0) * 0.5
                  >= {QUALITY_THRESHOLD} AS DOUBLE) AS y,
             round(n_stop / n_tok, 6) AS x1,
             round(n_tok / 100, 6) AS x2,
             round(n_uniq / n_tok, 6) AS x3
      FROM raw
    )"""
    blocks = [feats, "it0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3)"]
    for t in range(ITERS + 1):
        blocks.append(f"""
    ev{t} AS (
      SELECT w0, w1, w2, w3,
             sum(CAST(round(round(p - y, 6) * {_MU}, 0) AS BIGINT)) AS s0,
             sum(CAST(round(round((p - y) * x1, 6) * {_MU}, 0) AS BIGINT)) AS s1,
             sum(CAST(round(round((p - y) * x2, 6) * {_MU}, 0) AS BIGINT)) AS s2,
             sum(CAST(round(round((p - y) * x3, 6) * {_MU}, 0) AS BIGINT)) AS s3,
             sum(CAST(round(round(-(y * ln(greatest(least(p, 1.0 - 1e-12), 1e-12))
                                    + (1 - y) * ln(1 - greatest(least(p, 1.0 - 1e-12), 1e-12))), 6) * {_MU}, 0) AS BIGINT)) AS sll,
             sum(CASE WHEN (z >= 0 AND y = 1.0) OR (z < 0 AND y = 0.0)
                      THEN 1 ELSE 0 END) AS n_correct,
             count(*) AS n
      FROM (
        SELECT w0, w1, w2, w3, y, x1, x2, x3,
               w0 + w1 * x1 + w2 * x2 + w3 * x3 AS z,
               1.0 / (1.0 + exp(-(w0 + w1 * x1 + w2 * x2 + w3 * x3))) AS p
        FROM feats CROSS JOIN it{t}
      )
      GROUP BY w0, w1, w2, w3
    )""")
        if t < ITERS:
            blocks.append(f"""
    it{t + 1} AS (
      SELECT round(w0 - {LR} * (CAST(s0 AS DOUBLE) / {_MU} / n), 6) AS w0,
             round(w1 - {LR} * (CAST(s1 AS DOUBLE) / {_MU} / n), 6) AS w1,
             round(w2 - {LR} * (CAST(s2 AS DOUBLE) / {_MU} / n), 6) AS w2,
             round(w3 - {LR} * (CAST(s3 AS DOUBLE) / {_MU} / n), 6) AS w3
      FROM ev{t}
    )""")
    return blocks


def _logreg_oracle() -> str:
    blocks = _training_blocks()
    selects = [
        f"""SELECT {t} AS it, w0 AS w_bias, w1 AS w_stop, w2 AS w_len, w3 AS w_ttr,
               round(CAST(sll AS DOUBLE) / {_MU} / n, 6) AS logloss,
               round(CAST(n_correct AS DOUBLE) / n, 6) AS accuracy
        FROM ev{t}"""
        for t in range(ITERS + 1)
    ]
    return (
        "WITH " + ",".join(blocks) + "\n" + "\nUNION ALL\n".join(selects)
    )


@query(
    "curation_quality_logreg",
    oracle=_logreg_oracle(),
    doc=f"Quality-classifier training inside the engine: logistic "
    "regression distilling the heuristic quality gate "
    f"(text_quality_score's composite ≥ {QUALITY_THRESHOLD}) back from "
    "raw statistics (stopword ratio / scaled token count / type-token "
    f"ratio) by {ITERS} unrolled batch-GD steps, lr={LR} — how "
    "production corpus filters are bootstrapped (label with a hand "
    "rule, train a model to generalize it). Each step is ONE corpus "
    "pass aggregating the mean "
    "gradient in exact integer micro-units against the broadcast 1-row "
    "model — the parameter-server shape as relational algebra; no "
    "MLlib, no UDFs, no driver math. Emits the full (weights, logloss, "
    "accuracy) trajectory per iteration, pinned end-to-end by the "
    "unrolled-CTE DuckDB oracle; logloss decrease and "
    "beats-majority-class accuracy pinned in pytest.",
)
def curation_quality_logreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    feats = quality_features(docs)
    w = spark.createDataFrame(
        [(0.0, 0.0, 0.0, 0.0)], "w0 double, w1 double, w2 double, w3 double"
    )
    out = None
    for t in range(ITERS + 1):
        ev = _eval_pass(feats, w)
        row = _metrics_row(ev, t)
        out = row if out is None else out.unionByName(row)
        if t < ITERS:
            # 1-row model relation; localCheckpoint truncates the
            # growing lineage exactly like the Lloyd codebook loop
            w = _next_weights(ev).localCheckpoint()
    return out

# --------------------------------------------------------------------------
# persisted model: train once, atomic versioned publish, score many
# --------------------------------------------------------------------------


def quality_model_build(
    spark: SparkSession,
    sf_dir: str,
    index_dir: str | None = None,
    rebuild: bool = False,
) -> str:
    """Train the quality classifier ONCE and publish the 1-row weight
    relation as a versioned on-disk artifact, exactly like the
    ANN/LSH index families (fresh ``v{N}/`` directory, atomic CURRENT
    pointer swap, flavor marker, ``gc_index_versions`` reclamation):
    at 100 TB training is a many-pass corpus job you amortize, scoring
    is a cheap map you run per ingest batch — the same
    build-once/probe-many economics as the indexes, so it shares their
    publish machinery. Idempotent once published; ``rebuild=True``
    retrains on the current corpus and publishes a new version while
    live scorers keep their resolved version."""
    from datafusion_nats_spark.extensions.ann_index import (
        _current_version,
        _index_root,
        _publish_version,
        _read_flavor,
        _version_dir,
        _write_flavor,
    )

    index_dir = index_dir or _index_root("logreg", sf_dir)
    cur = _current_version(index_dir)
    if cur is not None and not rebuild:
        stored = _read_flavor(_version_dir(index_dir, cur))
        if stored != "logreg":
            raise ValueError(
                f"artifact at {index_dir} is published with flavor "
                f"{stored!r}, not 'logreg' — pass rebuild=True or use a "
                f"different index_dir"
            )
        return index_dir
    version = (cur or 0) + 1
    vdir = _version_dir(index_dir, version)
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    feats = quality_features(docs)
    w = spark.createDataFrame(
        [(0.0, 0.0, 0.0, 0.0)], "w0 double, w1 double, w2 double, w3 double"
    )
    for _ in range(ITERS):
        w = _next_weights(_eval_pass(feats, w)).localCheckpoint()
    w.write.mode("overwrite").parquet(os.path.join(vdir, "model"))
    _write_flavor(vdir, "logreg")
    _publish_version(index_dir, version)  # the atomic commit
    return index_dir


def quality_model_score(
    spark: SparkSession, index_dir: str, docs: DataFrame
) -> DataFrame:
    """Score a document batch (doc_id, text) against the CURRENT
    published model version: one narrow map — features, broadcast
    1-row weights, sigmoid — emitting (doc_id, score, keep). The
    filter every ingest batch runs; resolve-once semantics make it
    safe against a concurrent retrain publish."""
    from datafusion_nats_spark.extensions.ann_index import current_index_dir

    vdir = current_index_dir(index_dir)
    w = spark.read.parquet(os.path.join(vdir, "model"))
    feats = quality_features(docs)
    z = (
        F.col("w0")
        + F.col("w1") * F.col("x1")
        + F.col("w2") * F.col("x2")
        + F.col("w3") * F.col("x3")
    )
    return (
        feats.crossJoin(F.broadcast(w))
        .select(
            "doc_id",
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("score"),
            (z >= 0).alias("keep"),
        )
    )


def _scored_oracle() -> str:
    blocks = _training_blocks()
    return (
        "WITH "
        + ",".join(blocks)
        + f"""
    SELECT f.doc_id,
           round(1.0 / (1.0 + exp(-(w.w0 + w.w1 * f.x1 + w.w2 * f.x2
                                    + w.w3 * f.x3))), 6) AS score,
           (w.w0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3) >= 0 AS keep
    FROM feats f CROSS JOIN it{ITERS} w
    """
    )


@query(
    "curation_quality_model_score",
    oracle=_scored_oracle(),
    doc="Persisted-model corpus scoring: the trained quality classifier "
    "is published once as a versioned on-disk artifact (same atomic "
    "CURRENT-pointer machinery as the ANN/LSH indexes) and every "
    "document is scored by a single narrow map against the broadcast "
    "1-row weights — train-once/score-many, the economics a 100 TB "
    "quality filter actually runs under. Oracle re-derives the same "
    "weights via the shared unrolled training CTEs and scores "
    "identically — results equal by construction.",
)
def curation_quality_model_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    index_dir = quality_model_build(spark, sf_dir)
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return quality_model_score(spark, index_dir, docs)
