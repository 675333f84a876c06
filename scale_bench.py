"""Extension-surface scale-up measurement (round-6 evidence, verdict
ask #5; extended in round 7 with a second scale point and per-query
shuffle-byte metrics): replicate the corpus tables key-shifted at each
requested factor, run the LLM-pipeline headliners at 1x and Nx, and
report per-query wall times, the scaling exponent log_N(tN/t1) — 1.0
means linear, < 1.0 sublinear, > 1.0 superlinear (a scale red flag) —
and the shuffle read/write bytes each query moved (from the Spark
status REST API), so the sublinear claim rests on how much data
actually crossed the shuffle, not wall time alone.

Replication: doc_id/vec_id shifted by k*10,000,000 per replica
(divisible by NEW_BATCH_MOD=5, so the incremental-dedup new/old split
is preserved); text and embeddings are copied verbatim, which makes
EVERY document an N-way duplicate cluster — deliberately the worst case
for the dedup family (mega-cluster stress of the BUCKET_CAP / df-cap
paths), and a fixed query set against an Nx corpus for the ANN family.
Dimension-free: only the tables these queries read (documents,
embeddings) are replicated; the rest are symlinked unchanged.

Usage:  python scale_bench.py          # sf0.1 base, 10x and 30x points
Env:    SPARK_GRAFT_SF_DIR, SPARK_GRAFT_SCALE_REPLICAS (comma list,
        default "10,30"), SPARK_GRAFT_CPUS

Prints one JSON line:
{"metric": "extension_scaleup", "replicas": [10, 30], "sf_dir": ...,
 "queries": {name: {"t1": s, "shuffle_mb1": mb,
                    "t10": s, "exp10": e, "shuffle_mb10": mb,
                    "t30": s, "exp30": e, "shuffle_mb30": mb}}}

(Replicated-key data, so this run is NOT oracle-checked — correctness
runs at sf0.001/0.01/0.1; this is purely a scaling measurement.
See PERFORMANCE.md "Measured scale-up".)
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

QUERIES = [
    # dedup family — worst-case N-way clusters by construction
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_connected_components",
    "dedup_incremental_new_batch",
    "dedup_index_probe",
    # similarity family — fixed 5-query batch vs Nx corpus
    "sim_ivf_ann",
    "sim_index_probe",
    "sim_index_probe_bigbatch",
    "sim_bruteforce_topk",
    # PCA: the corpus pass must dominate; Gram partials bound the shuffle
    "sim_pca_power_iteration",
    # text / curation
    "text_span_dedup",
    "text_span_collapse",
    "text_token_stats",
    "curation_sequence_packing",
    # multimodal — replicated payloads = N-way identical fingerprints,
    # the worst case for the band buckets (PHASH_BUCKET_CAP path)
    "mm_phash_near_dup",
    "mm_phash_index_probe",
    # retrieval family — fixed query workload vs Nx corpus
    "search_bm25_topk",
    "search_hybrid_rrf",
    "search_index_probe_bm25",
    "search_index_probe_phrase",
    "search_hybrid_rrf_indexed",
]

REPLICATED = {"documents": ["doc_id"], "embeddings": ["vec_id"]}
SHIFT = 10_000_000  # divisible by NEW_BATCH_MOD → id-class-preserving


def _replicate(spark, sf_dir: str, replicas: int) -> str:
    from pyspark.sql import functions as F

    from datafusion_nats_spark.tables import TABLES

    tag = hashlib.md5(f"{sf_dir}:{replicas}".encode()).hexdigest()[:10]
    out_root = os.path.join("/tmp", f"spark_graft_scale_{tag}")
    done = os.path.join(out_root, "_DONE")
    if os.path.exists(done):
        return out_root
    os.makedirs(out_root, exist_ok=True)
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        dst = os.path.join(out_root, f"{t}.parquet")
        if t in REPLICATED:
            base = spark.read.parquet(src)
            key = REPLICATED[t][0]
            parts = [
                base.withColumn(key, F.col(key) + F.lit(k * SHIFT))
                for k in range(replicas)
            ]
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            out.repartition(16).write.mode("overwrite").option(
                "compression", "snappy"
            ).parquet(dst)  # match the fixture codec, not the session's
            # artifact default (zstd since r10) — keeps replica scans
            # comparable with the snappy captures of rounds 6-9
        elif not os.path.exists(dst):
            os.symlink(os.path.abspath(src), dst)
    with open(done, "w") as f:
        f.write("ok")
    return out_root


# Zipf-skew grid: a doc's multiplicity is ~ H / (1 + doc_id % B) — the
# classic 1/rank head-heavy law over a B-key grid. H is solved so the
# EXPECTED multiplicity is the requested factor (sum_{u<B} 1/(1+u) ≈
# ln(B+1)), so a skewed point moves ~the same total rows as the uniform
# point while concentrating them: at factor 10 the hottest key carries
# ~1477 copies (a 1477-way duplicate mega-cluster / hot LSH bucket / hot
# IVF cell) while the median key carries ~3.
SKEW_B = 1024


def _replicate_skewed(spark, sf_dir: str, factor: int) -> str:
    from pyspark.sql import functions as F

    from datafusion_nats_spark.tables import TABLES

    tag = hashlib.md5(f"{sf_dir}:zipf:{factor}".encode()).hexdigest()[:10]
    out_root = os.path.join("/tmp", f"spark_graft_skew_{tag}")
    done = os.path.join(out_root, "_DONE")
    if os.path.exists(done):
        return out_root
    os.makedirs(out_root, exist_ok=True)
    h = int(round(factor * SKEW_B / math.log(SKEW_B + 1)))
    for t in TABLES:
        src = f"{sf_dir}/{t}.parquet"
        dst = os.path.join(out_root, f"{t}.parquet")
        if t in REPLICATED:
            key = REPLICATED[t][0]
            base = spark.read.parquet(src)
            mult = F.greatest(
                F.lit(1),
                F.round(
                    F.lit(h) / (F.lit(1) + F.pmod(F.col(key), F.lit(SKEW_B))), 0
                ).cast("int"),
            )
            out = (
                base.withColumn(
                    "_k", F.explode(F.sequence(F.lit(0), mult - 1))
                )
                # k*SHIFT keeps doc_id % NEW_BATCH_MOD (SHIFT % 5 == 0),
                # so the incremental-dedup new/old split is preserved
                # exactly like the uniform replication
                .withColumn(key, F.col(key) + F.col("_k").cast("long") * SHIFT)
                .drop("_k")
            )
            out.repartition(16).write.mode("overwrite").option(
                "compression", "snappy"
            ).parquet(dst)  # match the fixture codec, not the session's
            # artifact default (zstd since r10) — keeps replica scans
            # comparable with the snappy captures of rounds 6-9
        elif not os.path.exists(dst):
            os.symlink(os.path.abspath(src), dst)
    with open(done, "w") as f:
        f.write("ok")
    return out_root


class _ShuffleMeter:
    """Per-query shuffle read+write bytes AND max single-task runtime
    via the status REST API (SPARK_GRAFT_UI=1 turns the UI on). Stages
    are attributed to a query by diffing completed stage IDs around it.
    Max task time is the straggler metric the skewed fixture exists for
    (round-7 verdict ask #5): skew shows up in the slowest task, not in
    the shuffle-byte total. Degrades to None when the UI is unreachable
    — the timing columns never depend on it."""

    def __init__(self, spark):
        self._base = None
        try:
            ui = spark.sparkContext.uiWebUrl
            app = spark.sparkContext.applicationId
            if ui:
                self._base = f"{ui}/api/v1/applications/{app}/stages"
        except Exception:
            pass

    def _stages(self):
        if not self._base:
            return None
        try:
            with urllib.request.urlopen(self._base, timeout=10) as r:
                return {
                    (s["stageId"], s["attemptId"]): (
                        s.get("shuffleReadBytes", 0),
                        s.get("shuffleWriteBytes", 0),
                    )
                    for s in json.load(r)
                    if s.get("status") in ("COMPLETE", "FAILED")
                }
        except Exception:
            return None

    def _max_task_ms(self, stage_keys):
        """Max executorRunTime over the given stages' tasks (the
        straggler), or None when the summary endpoint is unavailable."""
        worst = None
        for sid, att in stage_keys:
            try:
                url = f"{self._base}/{sid}/{att}/taskSummary?quantiles=1.0"
                with urllib.request.urlopen(url, timeout=10) as r:
                    t = json.load(r).get("executorRunTime", [None])[0]
                if t is not None:
                    worst = t if worst is None else max(worst, t)
            except Exception:
                continue
        return round(worst, 1) if worst is not None else None

    def measure(self, fn):
        """Run fn(); return (wall_sec, shuffle_mb or None,
        max_task_ms or None)."""
        before = self._stages()
        t0 = time.perf_counter()
        fn()
        wall = time.perf_counter() - t0
        after = self._stages()
        if before is None or after is None:
            return wall, None, None
        new = {k: v for k, v in after.items() if k not in before}
        mb = sum(r + w for r, w in new.values()) / (1024 * 1024)
        return wall, round(mb, 1), self._max_task_ms(new.keys())


def _time_queries(spark, queries, sf_dir: str, meter):
    times, shuffles, stragglers = {}, {}, {}
    for name in QUERIES:
        df = queries[name](spark, sf_dir)
        wall, mb, max_task = meter.measure(
            lambda: df.write.format("noop").mode("overwrite").save()
        )
        times[name] = round(wall, 3)
        shuffles[name] = mb
        stragglers[name] = max_task
    return times, shuffles, stragglers


# ---------------------------------------------------------------------------
# Workload-scaled probe rows (round-8 verdict asks #1/#4/#8): the registered
# probe queries carry fixture-sized workloads, so the scale table above
# exercises corpus growth but not WORKLOAD growth. This section drives the
# persisted-index probes at their design points against the LARGEST uniform
# replica dir: >TERMS_INLINE_MAX phrases/terms (the distributed workload
# path), a >=1e5-query ANN batch (the _distributed_probe path whose driver
# collect is bounded by |codebook| distinct cells, never |queries|*nprobe),
# and Zipfian TERM distributions (hot postings buckets) so the 64-bucket x
# 4-files-per-bucket salting's straggler bound is measured, not asserted.
# Enabled with SPARK_GRAFT_SCALE_PROBES=1.
# ---------------------------------------------------------------------------

PROBE_SMALL_Q = 256  # inline-path comparison point
# the workload exponent is computed BETWEEN TWO DISTRIBUTED points (mid
# -> big, both forced inline=False) so it measures workload growth within
# ONE plan shape — an inline->distributed exponent would conflate the
# physical-plan switch's constant cost with workload scaling
PROBE_MID_Q = 1_000
# > TERMS_INLINE_MAX=5000 -> auto-routes distributed. Sized to the
# fixture corpus: its vocabulary is 31 words with df ~ 0.8*n_docs for
# EVERY term (no discriminative tail exists to draw from), so a probe's
# true output is |workload| x 0.8*n_docs matched postings — 10k queries
# at a 30x replica is ~10^8 scored pairs, a real measurement that still
# finishes locally; bigger multiplies a degenerate-stopword join, not
# insight.
PROBE_BIG_Q = 10_000
ANN_BATCH_Q = 100_000
ZIPF_VOCAB = 512  # ranks in the Zipfian term/phrase workloads


def _head_skip(nterms: int) -> int:
    """Workloads draw from the DISCRIMINATIVE band of the vocabulary,
    not its stopword head: a probe term's join output is |workload
    copies| x df(term), and the corpus' most common terms have df ~
    n_docs — a 20k-query workload over the top-512 stopwords would
    measure a degenerate billions-of-rows scoring job no real
    routing/contamination sweep runs (real sweeps use discriminative
    terms; BM25's idf gives stopword matches ~zero weight anyway).
    Skip the top max(64, 10%) of the frequency-ranked vocabulary when
    it is big enough to have a head; tiny fixtures keep everything."""
    return min(max(nterms - ZIPF_VOCAB, 0), max(64, nterms // 10))


def _doc_tokens(spark, sf_dir):
    from pyspark.sql import functions as F

    from datafusion_nats_spark.extensions.text import tokens
    from datafusion_nats_spark.tables import load

    return (
        load(spark, sf_dir, "documents")
        .select(tokens(F.col("text")).alias("t"))
        .filter(F.size("t") >= 2)
    )


def _number(df, cols):
    """Deterministic query_id over a bounded workload relation."""
    from pyspark.sql import Window, functions as F

    w = Window.orderBy(*cols)
    return df.withColumn("query_id", F.row_number().over(w).cast("int"))


def _fan_workload(ranked, key_cols, n, zipf: bool):
    """Fan a ranked key relation (rank column ``r``, 1-based, bounded by
    ZIPF_VOCAB) out to EXACTLY n (query_id, *key) rows. A query workload
    repeats terms across query_ids (that is what makes a bucket hot), so
    n is the ROW count, never bounded by the corpus vocabulary — the
    fixture vocabulary is tiny (tens of distinct tokens). Uniform:
    round-robin over the keys (numbering by (k, r) interleaves, so the
    first n rows cover every key evenly). Zipf: rank r carries ~H/r
    copies (H solved so the total ~ n) — the head-heavy law that makes
    the top key's postings bucket the straggler candidate."""
    from pyspark.sql import functions as F

    nkeys = ranked.count()  # bounded by ZIPF_VOCAB — always a tiny count
    if zipf:
        h = int(round(n / math.log(nkeys + 1))) + 1
        mult = F.greatest(
            F.lit(1), F.round(F.lit(h) / F.col("r"), 0).cast("int")
        )
    else:
        mult = F.lit(int(-(-n // nkeys)))  # ceil(n / keys)
    fan = ranked.select(
        *key_cols, "r", F.explode(F.sequence(F.lit(1), mult)).alias("k")
    )
    # trim order matters: uniform numbers by (k, r) — round-robin, so the
    # trim stays even; zipf numbers by (r, k) — head-first, so the trim
    # eats the tail ranks and PRESERVES the hot key's full multiplicity
    order = ["r", "k"] if zipf else ["k", "r"]
    return (
        _number(fan, order)
        .filter(F.col("query_id") <= n)
        .select("query_id", *key_cols)
    )


def _band_rank(counted, key_cols):
    """(keys, cnt) → (keys, r): the ZIPF_VOCAB keys of the
    discriminative band (frequency ranks (_head_skip, _head_skip +
    ZIPF_VOCAB]), re-ranked 1-based by descending count within the band
    — rank 1 (the Zipf workloads' hot key) is the band's most frequent
    key, just below the stopword cutoff. The take-ordered limit bounds
    the global numbering window to skip+ZIPF_VOCAB rows."""
    from pyspark.sql import Window, functions as F

    skip = _head_skip(counted.count())
    w = Window.orderBy(F.desc("cnt"), *key_cols)
    return (
        counted.orderBy(F.desc("cnt"), *key_cols)
        .limit(skip + ZIPF_VOCAB)
        .withColumn("r0", F.row_number().over(w).cast("int"))
        .filter(F.col("r0") > skip)
        .select(*key_cols, (F.col("r0") - skip).alias("r"))
    )


def _term_workload(spark, sf_dir, n, zipf: bool):
    """(query_id, term): n rows over the top-ZIPF_VOCAB corpus terms by
    occurrence count, spread uniformly or Zipf-concentrated (the
    hot-bucket shape a routing/contamination sweep really has)."""
    from pyspark.sql import functions as F

    toks = _doc_tokens(spark, sf_dir)
    vocab = (
        toks.select(F.explode("t").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    ranked = _band_rank(vocab, ["term"])
    return _fan_workload(ranked, ["term"], n, zipf)


def _phrase_workload(spark, sf_dir, n, zipf: bool):
    """(query_id, term_a, term_b): n rows over the top-ZIPF_VOCAB corpus
    bigrams by occurrence count, uniform or Zipf-concentrated."""
    from pyspark.sql import functions as F

    toks = _doc_tokens(spark, sf_dir)
    bigrams = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.get("t", i - 1).alias("term_a"),
                    F.get("t", i).alias("term_b"),
                ),
            )
        ).alias("p")
    ).select("p.term_a", "p.term_b")
    counts = bigrams.groupBy("term_a", "term_b").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    ranked = _band_rank(counts, ["term_a", "term_b"])
    return _fan_workload(ranked, ["term_a", "term_b"], n, zipf)


def _workload_probe_rows(spark, big_dir: str, meter) -> dict:
    from pyspark.sql import functions as F

    from datafusion_nats_spark.extensions.ann_index import (
        ivf_index_build,
        ivf_index_probe,
    )
    from datafusion_nats_spark.extensions.similarity import _emb_double
    from datafusion_nats_spark.extensions.text_index import (
        bm25_index_build,
        bm25_index_probe,
        phrase_index_probe,
    )
    from datafusion_nats_spark.tables import load

    rows = {}
    bm25_dir = bm25_index_build(spark, big_dir)

    def mat(df):
        """Materialize a workload BEFORE the measured probe run: the
        workload synthesizers above aggregate the (replicated) corpus —
        lazily recomputing that inside meter.measure would charge
        corpus-sized workload construction to the probe row. Workloads
        are bounded (<= ANN_BATCH_Q rows), so an eager localCheckpoint
        is tiny and, unlike cache(), immune to cache hygiene clears."""
        return df.localCheckpoint(eager=True)

    def run(name, df_fn, n_queries):
        df = df_fn()
        wall, mb, max_task = meter.measure(
            lambda: df.write.format("noop").mode("overwrite").save()
        )
        rows[name] = {
            "q": n_queries,
            "t": round(wall, 3),
            "shuffle_mb": mb,
            "max_task_ms": max_task,
        }

    # phrase probe: inline comparison point, two distributed workload
    # sizes (the exponent pair), Zipf-hot
    ph_small = mat(_phrase_workload(spark, big_dir, PROBE_SMALL_Q, zipf=False))
    ph_mid = mat(_phrase_workload(spark, big_dir, PROBE_MID_Q, zipf=False))
    ph_big = mat(_phrase_workload(spark, big_dir, PROBE_BIG_Q, zipf=False))
    ph_zipf = mat(_phrase_workload(spark, big_dir, PROBE_BIG_Q, zipf=True))
    run(
        "phrase_probe_inline",
        lambda: phrase_index_probe(spark, bm25_dir, ph_small, inline=True),
        PROBE_SMALL_Q,
    )
    run(
        "phrase_probe_mid",
        lambda: phrase_index_probe(spark, bm25_dir, ph_mid, inline=False),
        PROBE_MID_Q,
    )
    run(
        "phrase_probe_distributed",
        lambda: phrase_index_probe(spark, bm25_dir, ph_big, inline=False),
        PROBE_BIG_Q,
    )
    run(
        "phrase_probe_zipf",
        lambda: phrase_index_probe(spark, bm25_dir, ph_zipf, inline=False),
        PROBE_BIG_Q,
    )
    # BM25 probe: same quartet over single-term workloads
    t_small = mat(_term_workload(spark, big_dir, PROBE_SMALL_Q, zipf=False))
    t_mid = mat(_term_workload(spark, big_dir, PROBE_MID_Q, zipf=False))
    t_big = mat(_term_workload(spark, big_dir, PROBE_BIG_Q, zipf=False))
    t_zipf = mat(_term_workload(spark, big_dir, PROBE_BIG_Q, zipf=True))
    run(
        "bm25_probe_inline",
        lambda: bm25_index_probe(spark, bm25_dir, t_small, inline=True),
        PROBE_SMALL_Q,
    )
    run(
        "bm25_probe_mid",
        lambda: bm25_index_probe(spark, bm25_dir, t_mid, inline=False),
        PROBE_MID_Q,
    )
    run(
        "bm25_probe_distributed",
        lambda: bm25_index_probe(spark, bm25_dir, t_big, inline=False),
        PROBE_BIG_Q,
    )
    run(
        "bm25_probe_zipf",
        lambda: bm25_index_probe(spark, bm25_dir, t_zipf, inline=False),
        PROBE_BIG_Q,
    )
    # ANN big batch at the design point: >=1e5 query vectors through the
    # distributed probe (driver collects only the <=|codebook| distinct
    # cells; the rerank join key has <=|codebook| values — AQE skew-split
    # territory). The corpus caps at 60k embeddings even at 30x, so the
    # batch fans every corpus vector k times (k = ceil(1e5/n)) — repeated
    # queries concentrate probe cells exactly like a real clustered query
    # batch, the worst case for cell pruning.
    ivf_dir = ivf_index_build(spark, big_dir)
    emb = load(spark, big_dir, "embeddings")
    n_total = emb.count()
    k = max(1, -(-ANN_BATCH_Q // max(1, n_total)))  # ceil
    q = (
        emb.select("vec_id", _emb_double().alias("qe"))
        .withColumn("c", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .select((F.col("vec_id") * k + F.col("c")).alias("query_id"), "qe")
    )
    q = mat(q)
    n_q = q.count()
    run(
        "ann_probe_bigbatch",
        lambda: ivf_index_probe(spark, ivf_dir, q, inline=False),
        n_q,
    )
    # workload exponents: growth in wall time per growth in workload size
    # (corpus fixed), between the TWO DISTRIBUTED points so the plan
    # shape is held constant — ~0 means the probe pays a fixed cost
    # regardless of workload; 1.0 means linear in the workload
    for fam in ("phrase_probe", "bm25_probe"):
        t0, t1 = rows[f"{fam}_mid"]["t"], rows[f"{fam}_distributed"]["t"]
        if t0 > 0 and t1 > 0:
            rows[f"{fam}_distributed"]["workload_exp"] = round(
                math.log(t1 / t0) / math.log(PROBE_BIG_Q / PROBE_MID_Q), 2
            )
    return rows


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    replica_points = [
        int(x)
        for x in os.environ.get("SPARK_GRAFT_SCALE_REPLICAS", "10,30").split(",")
        if x.strip()
    ]

    os.environ.setdefault("SPARK_GRAFT_UI", "1")  # shuffle metrics need the UI

    from datafusion_nats_spark.registry import all_queries
    from datafusion_nats_spark.session import get_spark

    spark = get_spark("scale-bench")
    queries = all_queries()
    meter = _ShuffleMeter(spark)

    # warm the session once so t1 doesn't pay JVM/footer costs tN skips
    queries["text_token_stats"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    want_probes = os.environ.get("SPARK_GRAFT_SCALE_PROBES") == "1"
    only_probes = os.environ.get("SPARK_GRAFT_SCALE_ONLY_PROBES") == "1"
    if (want_probes or only_probes) and not replica_points:
        raise SystemExit(
            "probe sections need a replica point: set "
            "SPARK_GRAFT_SCALE_REPLICAS (probes run at its max)"
        )

    def probes_section() -> dict:
        big_dir = _replicate(spark, sf_dir, max(replica_points))
        return {
            "at_replicas": max(replica_points),
            "queries": _workload_probe_rows(spark, big_dir, meter),
        }

    # SPARK_GRAFT_SCALE_ONLY_PROBES=1: skip the per-query scale table and
    # run just the workload-probe section (targeted evidence captures —
    # the full table is an hour-scale run at sf0.1 x 30).
    if only_probes:
        out = {
            "metric": "extension_scaleup_probes_only",
            "sf_dir": sf_dir,
            "workload_probes": probes_section(),
        }
        print(json.dumps(out))
        return

    t1, sh1, mt1 = _time_queries(spark, queries, sf_dir, meter)
    rows = {
        name: {
            "t1": t1[name],
            "shuffle_mb1": sh1[name],
            "max_task_ms1": mt1[name],
        }
        for name in QUERIES
    }
    totals = {"total_t1": round(sum(t1.values()), 2)}
    for n in replica_points:
        big_dir = _replicate(spark, sf_dir, n)
        tn, shn, mtn = _time_queries(spark, queries, big_dir, meter)
        for name in QUERIES:
            ratio = tn[name] / t1[name] if t1[name] else float("nan")
            rows[name][f"t{n}"] = tn[name]
            rows[name][f"exp{n}"] = (
                round(math.log(ratio) / math.log(n), 2) if ratio > 0 else None
            )
            rows[name][f"shuffle_mb{n}"] = shn[name]
            rows[name][f"max_task_ms{n}"] = mtn[name]
        totals[f"total_t{n}"] = round(sum(tn.values()), 2)
    out = {
        "metric": "extension_scaleup",
        "replicas": replica_points,
        "sf_dir": sf_dir,
        "queries": rows,
        **totals,
    }
    if want_probes:
        out["workload_probes"] = probes_section()
    skew = int(os.environ.get("SPARK_GRAFT_SCALE_SKEW", "0"))
    if skew > 1:
        # Zipf-skewed point (round-7 verdict ask #5): same expected row
        # factor, head-heavy key distribution — exponents computed
        # against the ACTUAL realized factor so the skewed point is
        # comparable to the uniform ones.
        skew_dir = _replicate_skewed(spark, sf_dir, skew)
        base_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        skew_docs = spark.read.parquet(f"{skew_dir}/documents.parquet").count()
        factor = skew_docs / base_docs
        ts, shs, mts = _time_queries(spark, queries, skew_dir, meter)
        srows = {}
        for name in QUERIES:
            ratio = ts[name] / t1[name] if t1[name] else float("nan")
            srows[name] = {
                "t": ts[name],
                "exp": (
                    round(math.log(ratio) / math.log(factor), 2)
                    if ratio > 0
                    else None
                ),
                "shuffle_mb": shs[name],
                "max_task_ms": mts[name],
            }
        out["skew"] = {
            "requested_factor": skew,
            "realized_factor": round(factor, 2),
            "zipf_grid": SKEW_B,
            "queries": srows,
            "total_t": round(sum(ts.values()), 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
