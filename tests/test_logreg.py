"""In-engine logistic-regression training (extensions/logreg.py):
the exact trajectory is pinned by the unrolled-CTE DuckDB oracle in the
sweep; these tests pin the LEARNING claims — loss falls, the student
beats the majority class on the fixture, and the GD machinery drives a
separable synthetic problem to perfect accuracy."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_nats_spark.extensions.logreg import (
    ITERS,
    _eval_pass,
    _metrics_row,
    _next_weights,
    curation_quality_logreg,
    quality_features,
)
from datafusion_nats_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_logloss_falls_and_beats_majority(spark):
    rows = sorted(curation_quality_logreg(spark, SF).collect(), key=lambda r: r.it)
    assert [r.it for r in rows] == list(range(ITERS + 1))
    lls = [r.logloss for r in rows]
    assert all(a > b for a, b in zip(lls, lls[1:])), f"logloss not falling: {lls}"
    feats = quality_features(
        load(spark, SF, "documents").select("doc_id", "text", "lang")
    )
    pos = feats.agg(F.avg("y")).first()[0]
    majority = max(pos, 1 - pos)
    assert rows[0].accuracy <= majority + 1e-9  # w=0 predicts one class
    assert rows[-1].accuracy > majority + 0.05, (
        f"trained accuracy {rows[-1].accuracy} does not beat majority {majority}"
    )


def test_gd_machinery_solves_separable_problem(spark):
    """A linearly separable synthetic set (y decided by x2's sign,
    margin 1): three lr=2 GD steps must reach accuracy 1.0 — the
    optimizer itself works, independent of the fixture's teacher."""
    feats = spark.createDataFrame(
        [(float(y), 0.0, x2, 0.0) for x2, y in
         [(-1.0, 0), (-1.2, 0), (-0.8, 0), (1.0, 1), (1.1, 1), (0.9, 1)]],
        "y double, x1 double, x2 double, x3 double",
    )
    w = spark.createDataFrame(
        [(0.0, 0.0, 0.0, 0.0)], "w0 double, w1 double, w2 double, w3 double"
    )
    for t in range(ITERS):
        w = _next_weights(_eval_pass(feats, w)).localCheckpoint()
    final = _metrics_row(_eval_pass(feats, w), ITERS).first()
    assert final.accuracy == 1.0
    assert final.w_len > 0  # weight on the separating feature

def test_persisted_model_lifecycle(spark, tmp_path):
    """Train-once/score-many: the published model artifact is
    idempotent (second build returns without retraining), flavor-
    guarded against another family claiming the directory, versioned
    (rebuild publishes v2 while v1 stays on disk), and its scores
    equal the registry query's output by construction."""
    import pytest
    from datafusion_nats_spark.extensions.ann_index import (
        _current_version,
        ivf_index_build,
    )
    from datafusion_nats_spark.extensions.logreg import (
        curation_quality_model_score,
        quality_model_build,
        quality_model_score,
    )

    index_dir = quality_model_build(spark, SF, str(tmp_path / "m"))
    assert _current_version(index_dir) == 1
    assert quality_model_build(spark, SF, index_dir) == index_dir
    assert _current_version(index_dir) == 1  # idempotent, no retrain
    with pytest.raises(ValueError, match="'logreg'"):
        ivf_index_build(spark, SF, index_dir)
    docs = load(spark, SF, "documents").select("doc_id", "text")
    got = sorted(
        tuple(r) for r in quality_model_score(spark, index_dir, docs).collect()
    )
    want = sorted(tuple(r) for r in curation_quality_model_score(spark, SF).collect())
    assert got == want
    quality_model_build(spark, SF, index_dir, rebuild=True)
    assert _current_version(index_dir) == 2

def test_stream_quality_screen_epochs_and_replay(spark):
    """The screen's two pinned batches land as two epochs covering the
    full streamed id set, and re-running the whole stream (fresh
    checkpoint, overwrite-per-epoch verdicts) reproduces identical
    results — the idempotent-replay contract."""
    from datafusion_nats_spark.streaming.pipelines import (
        _QSCREEN_SHIFT,
        stream_quality_screen,
    )

    first = stream_quality_screen(spark, SF).collect()
    epochs = {r.epoch for r in first}
    assert epochs == {0, 1}
    assert all(r.doc_id >= _QSCREEN_SHIFT for r in first)
    expected = {
        r.doc_id + _QSCREEN_SHIFT
        for r in load(spark, SF, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .select("doc_id")
        .collect()
    }
    assert {r.doc_id for r in first} == expected
    second = stream_quality_screen(spark, SF).collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, second))

def test_model_score_survives_concurrent_republish(spark, tmp_path):
    """Resolve-once semantics for the persisted model, mirroring the
    index families' atomic-publish race test: a scoring plan bound to
    v1 keeps returning v1's scores after a new version publishes; a
    plan created afterwards resolves v2. v2 is published through the
    same version machinery with deliberately shifted weights (a
    retrain on the same fixture is deterministic and would be
    indistinguishable)."""
    import os

    from datafusion_nats_spark.extensions.ann_index import (
        _publish_version,
        _version_dir,
        _write_flavor,
        current_index_dir,
    )
    from datafusion_nats_spark.extensions.logreg import (
        quality_model_build,
        quality_model_score,
    )

    index_dir = quality_model_build(spark, SF, str(tmp_path / "race"))
    v1 = current_index_dir(index_dir)
    docs = load(spark, SF, "documents").select("doc_id", "text").limit(20)
    plan_v1 = quality_model_score(spark, index_dir, docs)  # bound to v1
    before = {r.doc_id: (r.score, r.keep) for r in plan_v1.collect()}
    # publish v2 with a strong positive bias: every doc scores > 0.5
    v2dir = _version_dir(index_dir, 2)
    spark.createDataFrame(
        [(5.0, 0.0, 0.0, 0.0)], "w0 double, w1 double, w2 double, w3 double"
    ).write.mode("overwrite").parquet(os.path.join(v2dir, "model"))
    _write_flavor(v2dir, "logreg")
    _publish_version(index_dir, 2)
    assert current_index_dir(index_dir) != v1 and os.path.exists(v1)
    # the v1-bound plan still returns v1's scores
    again = {r.doc_id: (r.score, r.keep) for r in plan_v1.collect()}
    assert again == before
    # a fresh plan resolves v2: the +5 bias keeps everything
    fresh = quality_model_score(spark, index_dir, docs).collect()
    assert all(r.keep for r in fresh)
    assert any(not k for _, k in before.values())  # v1 really differed

def test_stream_screen_resolves_model_per_batch(spark, tmp_path):
    """The screen's documented contract: the model version is resolved
    per micro-batch, so a republish between epochs flips atomically at
    a batch boundary — epoch 0 scores with v1, epoch 1 with v2 — and a
    replayed epoch rewrites its own verdicts with the version current
    at replay time (idempotent overwrite, never double-applied)."""
    import os

    from datafusion_nats_spark.extensions.ann_index import (
        _publish_version,
        _version_dir,
        _write_flavor,
    )
    from datafusion_nats_spark.extensions.logreg import quality_model_build
    from datafusion_nats_spark.streaming.pipelines import (
        quality_stream_screen_apply,
    )

    index_dir = quality_model_build(spark, SF, str(tmp_path / "sv"))
    results = str(tmp_path / "verdicts")
    apply_fn = quality_stream_screen_apply(index_dir, results)
    batch = spark.createDataFrame(
        [(1, "short doc"), (2, " ".join(["tok"] * 150) + " the a of is")],
        "doc_id long, text string",
    )
    apply_fn(batch, 0)  # epoch 0 under v1
    e0 = {r.doc_id: r.keep for r in spark.read.parquet(f"{results}/epoch=0").collect()}
    # republish with a strong positive bias (v2): everything kept
    v2dir = _version_dir(index_dir, 2)
    spark.createDataFrame(
        [(5.0, 0.0, 0.0, 0.0)], "w0 double, w1 double, w2 double, w3 double"
    ).write.mode("overwrite").parquet(os.path.join(v2dir, "model"))
    _write_flavor(v2dir, "logreg")
    _publish_version(index_dir, 2)
    apply_fn(batch, 1)  # epoch 1 under v2
    e1 = {r.doc_id: r.keep for r in spark.read.parquet(f"{results}/epoch=1").collect()}
    assert e0[1] is False  # v1 rejects the degenerate short doc
    assert e1 == {1: True, 2: True}  # v2's bias keeps everything
    # epoch-0 replay (same batch id) rewrites with the CURRENT version
    apply_fn(batch, 0)
    e0_replayed = {
        r.doc_id: r.keep for r in spark.read.parquet(f"{results}/epoch=0").collect()
    }
    assert e0_replayed == {1: True, 2: True}
    assert len(spark.read.parquet(results).collect()) == 4  # no duplicates
