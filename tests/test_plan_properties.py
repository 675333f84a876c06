"""Physical-plan property tests: the scale contract, enforced.

Each assertion pins a plan property that matters at 100 TB — filter
pushdown reaching the parquet scan, column pruning, broadcast of bounded
dimensions, top-k instead of full sort. A regression here is a perf bug
even when results stay correct."""

from __future__ import annotations

import pytest

from datafusion_nats_spark.registry import all_queries

QUERIES = all_queries()


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushes_filter_and_prunes_columns(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # pruned scan: only the 7 needed columns, not l_orderkey/l_partkey/...
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]


def test_q5_broadcasts_dimensions_no_sortmerge(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q5_local_supplier_volume")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # facts resolve via broadcast/AQE here


def test_q3_uses_topk_not_full_sort(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q3_shipping_priority")
    assert "TakeOrderedAndProject" in plan


def test_q6_aggregates_partial_then_final(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q6_forecast_revenue")
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_minhash_never_all_pairs(spark, sf_dir):
    # the candidate join must be an equi-join on (band_id, band_key) —
    # a nested-loop join would mean the O(n²) path snuck back in
    plan = _plan(spark, sf_dir, "dedup_minhash_lsh")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_minhash_df_cap_broadcasts_banned_set(spark, sf_dir):
    """The shingle df-frequency cap must be a broadcast LEFT ANTI join
    against the banned (df > MAX_DF) head — small by construction. An
    inner join against the broadcast *allowed* set is the unbounded-at-
    100TB shape (the allowed side grows with corpus vocabulary)."""
    plan = _plan(spark, sf_dir, "dedup_minhash_lsh")
    assert "LeftAnti, BuildRight" in plan
    # and the cap never regresses to broadcasting the allowed set: the
    # only inner joins on a shingle column would be that shape
    for line in plan.splitlines():
        if "Join [shingle" in line:
            assert "LeftAnti" in line


def test_battery_distinct_split_keeps_moments_narrow(spark, sf_dir):
    """agg_function_battery computes its count-distinct in a separate
    narrow branch broadcast-joined back (round 9): inline, Spark's
    one-distinct strategy keys the partial aggregation of ALL twelve
    regular aggregates by (l_returnflag, l_orderkey) — a 33-buffer-
    column exchange at near-row cardinality (the round-9 stage profile
    measured 30 MB and ~3 s of executor time per side at sf0.1). Pin:
    the moment aggregates never aggregate at orderkey granularity, and
    the distinct branch rejoins via broadcast."""
    plan = _plan(spark, sf_dir, "agg_function_battery")
    assert "BroadcastHashJoin" in plan
    wide_distinct = [
        line
        for line in plan.splitlines()
        if "HashAggregate" in line
        and "l_orderkey" in line
        and ("stddev" in line or "corr" in line or "covar" in line)
    ]
    assert not wide_distinct, wide_distinct[0]


def test_simhash_single_pass_no_bit_explode(spark, sf_dir):
    """dedup_simhash computes the 32 bit-majority sums as 32 conditional
    aggregates in ONE pass over the token table (round 9): the previous
    explode(sequence(0, 31)) pushed 32x the token rows through the
    aggregate — it would reappear as a second Generate node."""
    plan = _plan(spark, sf_dir, "dedup_simhash")
    assert plan.count("Generate") == 1


def test_ngram_jaccard_df_cap_broadcasts_banned_set(spark, sf_dir):
    plan = _plan(spark, sf_dir, "dedup_ngram_jaccard")
    # two cap joins survive (candidate pipeline + verify pipeline)
    assert "LeftAnti, BuildRight" in plan


def test_bruteforce_sim_broadcasts_queries(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sim_bruteforce_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_text_ops_are_map_only_before_agg(spark, sf_dir):
    # token stats: one scan, no joins at all
    plan = _plan(spark, sf_dir, "text_token_stats")
    assert "Join" not in plan
    assert plan.count("FileScan") == 1


@pytest.mark.parametrize(
    "name", ["q1_pricing_summary", "join_inner_equi", "fn_string_battery"]
)
def test_whole_stage_codegen_active(spark, sf_dir, name):
    import contextlib
    import io

    # AQE wraps the plan before execution and reports zero codegen
    # subtrees — inspect the statically planned form
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    out = buf.getvalue()
    assert "Found" in out and "WholeStageCodegen subtree" in out, (
        f"no codegen stages in {name}:\n{out[:400]}"
    )
    n = int(out.split("Found ")[1].split(" ")[0])
    assert n >= 1


def test_contamination_broadcasts_benchmark_set(spark, sf_dir):
    # the benchmark shingle set must broadcast; the corpus side must
    # never feed a nested-loop or cartesian join
    plan = _plan(spark, sf_dir, "curation_benchmark_contamination")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_split_assignment_is_map_side(spark, sf_dir):
    # deterministic split: no join anywhere; single scan; the only
    # shuffle is the 3-group final aggregate
    plan = _plan(spark, sf_dir, "curation_split_train_val_test")
    assert "Join" not in plan
    assert plan.count("FileScan") == 1


def test_profile_columns_single_scan(spark, sf_dir):
    # the profiler must be ONE scan + multi-aggregate (the oracle's
    # 5-scan UNION is only the semantic twin)
    plan = _plan(spark, sf_dir, "curation_profile_columns")
    assert plan.count("FileScan") == 1


def test_q15_rank_after_aggregation(spark, sf_dir):
    # the unpartitioned rank window must sit ABOVE the per-supplier
    # aggregate (|supplier| rows), never over raw lineitem
    plan = _plan(spark, sf_dir, "q15_top_supplier")
    agg_pos = plan.find("HashAggregate")
    win_pos = plan.find("Window")
    assert agg_pos != -1 and win_pos != -1
    # executedPlan prints top-down: Window above means smaller offset
    assert win_pos < agg_pos
    # lineitem scan carries the pushed shipdate range filter
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_q21_semi_and_anti_joins(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q21_suppliers_kept_waiting")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_tfidf_broadcasts_df_table(spark, sf_dir):
    plan = _plan(spark, sf_dir, "text_tfidf_top_terms")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_quantization_broadcasts_codebook(spark, sf_dir):
    # the 64-row per-dimension codebook must broadcast; the exploded
    # vector table must never sort-merge
    plan = _plan(spark, sf_dir, "sim_int8_quantization")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pq_ann_broadcasts_codebook_and_lut(spark, sf_dir):
    # PQ encode joins the corpus against the 64-row codebook, and ADC
    # joins the code table against the query LUT — both must broadcast;
    # nothing in the compressed-domain path may go all-pairs
    plan = _plan(spark, sf_dir, "sim_pq_ann")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_train_ready_pipeline_no_cartesian(spark, sf_dir):
    plan = _plan(spark, sf_dir, "pipeline_train_ready")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "LeftSemi" in plan and "LeftAnti" in plan


def test_aqe_splits_skewed_join_partition(spark):
    """AQE skew-join must detect and split a hot key at runtime — the
    behavioral proof behind session.py's skewJoin.enabled=true. 90% of
    the left side lands on one join key; with broadcast disabled the
    sort-merge shuffle would put ~8 MB on one task while the median
    partition is tiny, so AQE rewrites the join with skew=true."""
    from pyspark.sql import functions as F

    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
    ]
    old = {k: spark.conf.get(k, None) for k in keys}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "65536"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    try:
        left = spark.range(120_000).select(
            F.when(F.col("id") % 10 < 9, 0)
            .otherwise(F.col("id") % 50)
            .alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("payload"),
        )
        right = spark.range(50).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        joined = left.join(right, "k")
        # collect() (not count()) so THIS DataFrame's QueryExecution runs —
        # count() builds a separate plan and leaves this one un-finalized.
        assert len(joined.collect()) == 120_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_ohlc_is_single_aggregate_no_window(spark, sf_dir):
    """OHLC uses min_by/max_by extremum aggregates — one hash-aggregate
    pair, never a per-bucket window sort."""
    plan = _plan(spark, sf_dir, "timeseries_ohlc_resample")
    assert "Window" not in plan
    # struct-keyed min_by/max_by can't use a primitive hash buffer, so
    # Spark picks SortAggregate — still a partial/final pair, no window
    n_agg = plan.count("HashAggregate") + plan.count("SortAggregate")
    assert n_agg >= 2  # partial + final


def test_funnel_attribution_no_cartesian(spark, sf_dir):
    """The time-range condition must ride on the user_id equi-join; a
    cartesian/broadcast-NL plan would explode at scale."""
    plan = _plan(spark, sf_dir, "funnel_click_attribution")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sessionize_windows_partitioned_by_user(spark, sf_dir):
    """Both window passes must be partitioned (per-user), never a global
    single-partition sort."""
    plan = _plan(spark, sf_dir, "window_sessionize")
    import re

    for m in re.finditer(r"Window \[", plan):
        frag = plan[m.start() : m.start() + 400]
        assert "user_id" in frag


def test_upsert_merge_is_single_key_join(spark, sf_dir):
    """The SCD-1 merge must resolve as ONE join on the business key —
    never a nested loop, and no second shuffle before the final agg."""
    plan = _plan(spark, sf_dir, "maintenance_upsert_scd1")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_scd2_windows_partitioned_by_key(spark, sf_dir):
    import re

    plan = _plan(spark, sf_dir, "maintenance_scd2_history")
    for m in re.finditer(r"Window \[", plan):
        frag = plan[m.start() : m.start() + 400]
        assert "key" in frag  # per-key partitioning, no global sort


def test_lateral_topk_decorrelates_to_window(spark, sf_dir):
    # the ORDER BY+LIMIT lateral must become a window/filter over ONE
    # equi-join — per-outer-row re-execution would be a nested loop
    plan = _plan(spark, sf_dir, "join_lateral_topk")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_cogroup_asof_single_exchange_per_side(spark, sf_dir):
    plan = _plan(spark, sf_dir, "cogroup_asof_join")
    assert "FlatMapCoGroupsInPandas" in plan
    # both sides shuffle once on user_id and meet in the cogroup — no
    # join node anywhere (the as-of logic lives in the pandas kernel)
    assert "Join" not in plan


def test_pagerank_iterations_reuse_cached_edges(spark, sf_dir):
    plan = _plan(spark, sf_dir, "graph_pagerank_suppliers")
    # the cached edge list must be read from the block store, not
    # recomputed from parquet each iteration
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan


def test_arrow_vector_stats_is_pure_map(spark, sf_dir):
    plan = _plan(spark, sf_dir, "sim_arrow_vector_stats")
    assert "MapInArrow" in plan or "PythonMapInArrow" in plan
    assert "Exchange" not in plan  # map-only: no shuffle at any width


def test_continuous_aggregate_partials_before_union(spark, sf_dir):
    # both branches (hourly rollup re-agg + raw tail) must partial-agg
    # before the final merge: >=4 HashAggregate nodes (2 per branch)
    plan = _plan(spark, sf_dir, "rollup_continuous_aggregate")
    assert plan.count("HashAggregate") >= 4
    assert "Union" in plan


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """Runtime filtering: when the build side of a shuffle join is
    selectively filtered, Spark injects a bloom_filter_agg subquery and a
    might_contain() predicate on the probe side — at 100 TB this skips
    shuffling probe rows that can never match. Pinned here with broadcast
    disabled (broadcast joins don't need the bloom) and the scan-size
    threshold dropped for the small local files."""
    from pyspark.sql import functions as F

    from datafusion_nats_spark.tables import load

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        orders = load(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load(spark, sf_dir, "lineitem")
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.sum("l_extendedprice"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_sql_join_hints_are_honored(spark, sf_dir):
    """SQL join-strategy hints: /*+ BROADCAST(d) */ must produce a
    BroadcastHashJoin, /*+ MERGE(d) */ a SortMergeJoin — the escape
    hatch when statistics mislead the planner at scale."""
    from datafusion_nats_spark.tables import register_views

    register_views(spark, sf_dir)
    bc = spark.sql(
        """SELECT /*+ BROADCAST(n) */ c_custkey, n_name
           FROM customer JOIN nation n ON c_nationkey = n_nationkey"""
    )
    assert "BroadcastHashJoin" in bc._jdf.queryExecution().executedPlan().toString()
    smj = spark.sql(
        """SELECT /*+ MERGE(n) */ c_custkey, n_name
           FROM customer JOIN nation n ON c_nationkey = n_nationkey"""
    )
    assert "SortMergeJoin" in smj._jdf.queryExecution().executedPlan().toString()


def test_distribute_and_cluster_by_partition_the_exchange(spark, sf_dir):
    """DISTRIBUTE BY hashes rows to partitions without a sort; CLUSTER BY
    adds the partition-local sort — the SQL spellings of
    repartition()/repartition().sortWithinPartitions() used to pre-shape
    data for bucketed writes."""
    from datafusion_nats_spark.tables import register_views

    register_views(spark, sf_dir)
    dist = spark.sql("SELECT * FROM events DISTRIBUTE BY user_id")
    dplan = dist._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(user_id" in dplan
    assert "Sort" not in dplan
    clus = spark.sql("SELECT * FROM events CLUSTER BY user_id")
    cplan = clus._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(user_id" in cplan
    assert "Sort [user_id" in cplan


def test_range_bucketed_join_is_equi_not_nested_loop(spark, sf_dir):
    # the whole point of the bucket rewrite: the range predicate must ride
    # on a hash equi-join, never a nested loop over per-user rows
    plan = _plan(spark, sf_dir, "join_range_bucketed")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_dynamic_partition_pruning_on_partitioned_table(spark, sf_dir, tmp_path):
    """Joining a partitioned fact table with a selectively-filtered dim must
    plan a dynamic-partition-pruning subquery: at scale the fact scan reads
    only the partitions the dim filter selects, discovered at runtime —
    without DPP the scan reads every partition."""
    from pyspark.sql import functions as F

    from datafusion_nats_spark.tables import load

    fact_dir = str(tmp_path / "orders_by_status")
    load(spark, sf_dir, "orders").write.partitionBy("o_orderstatus").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    # the dim filter is on a NON-join column: the surviving `status` values
    # are only known at runtime, so static partition-filter inference can't
    # fire and the scan must take a DPP subquery. (Filtering the join key
    # itself would let Catalyst push a static literal filter instead.)
    dim = spark.createDataFrame(
        [("F", "finished"), ("O", "open"), ("P", "pending")], ["status", "label"]
    ).filter(F.col("label") == "finished")
    joined = fact.join(dim, fact.o_orderstatus == dim.status).groupBy("label").agg(
        F.count("*").alias("n")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    assert joined.collect()[0]["n"] > 0


def test_cached_plan_reuses_inmemory_scan(spark, sf_dir):
    """df.cache() must turn downstream scans into InMemoryTableScan — the
    iterative-algorithm contract (PageRank, connected components) that the
    source is read once, not once per iteration."""
    from pyspark.sql import functions as F

    from datafusion_nats_spark.tables import load

    base = load(spark, sf_dir, "nation").groupBy("n_regionkey").agg(
        F.count("*").alias("n")
    )
    base.cache()
    try:
        base.count()  # materialize
        plan = (
            base.filter(F.col("n") > 0)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the executed plan must read from the cache; the FileScan string
        # still appears inside InMemoryTableScan's description of the plan
        # it cached, so assert the scan node itself, not FileScan absence
        assert "InMemoryTableScan" in plan
        assert plan.index("InMemoryTableScan") < plan.index("FileScan")
    finally:
        base.unpersist()


def test_reused_exchange_for_shared_subplan(spark, sf_dir):
    """When the same aggregated subplan feeds both sides of a join, the
    physical plan must materialize its shuffle ONCE and wire the second
    consumer to a ReusedExchange — at scale this halves the shuffle I/O
    of any self-comparison query (week-over-week, share-of-total, ...)."""
    from pyspark.sql import functions as F

    from datafusion_nats_spark.tables import load

    li = load(spark, sf_dir, "lineitem")
    per_supp = li.groupBy("l_suppkey").agg(F.sum("l_quantity").alias("qty"))
    a = per_supp.alias("a")
    b = per_supp.alias("b")
    j = a.join(b, F.col("a.l_suppkey") == F.col("b.l_suppkey") + 1).select(
        F.col("a.l_suppkey"), (F.col("a.qty") - F.col("b.qty")).alias("delta")
    )
    j.collect()  # AQE finalizes the plan at execution
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan or "ReusedQueryStage" in plan.replace(" ", "")


def test_min_label_propagation_bounded_plan_depth(spark):
    """Iterative loops must not grow lineage with iteration count:
    localCheckpoint every k rounds truncates the plan, and superseded
    label frames are unpersisted (VERDICT r1 #6). A 14-hop path graph
    needs ~13 propagation rounds — without hygiene the final plan would
    nest ~26 joins; with checkpoint_every=3 it carries at most 3 rounds."""
    from pyspark.sql import functions as F

    from datafusion_nats_spark.extensions.dedup import min_label_propagation

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(14)], "doc_a long, doc_b long"
    )
    adj = edges.union(
        edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    labels = min_label_propagation(adj, max_iter=20, checkpoint_every=3)
    rows = {r.id: r.comp for r in labels.collect()}
    assert rows == {i: 0 for i in range(15)}  # one component, min label 0
    plan = labels._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") <= 8


def test_runtime_bloom_filter_prunes_probe_side(spark, sf_dir):
    """Runtime bloom-filter join (Spark 3.3+ runtime filters): a
    selective creation side must inject bloom_filter_might_contain into
    the probe-side scan so the big fact table drops non-joining rows
    BEFORE the shuffle — at 100 TB this is the difference between
    shuffling the whole fact table and shuffling the matching slice.
    Local thresholds are lowered because the application-side default
    (10 GB scanned) is cluster-scale."""
    from datafusion_nats_spark.tables import load

    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
    ]
    old = {k: spark.conf.get(k) for k in keys}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
    )
    try:
        from pyspark.sql import functions as F

        o = (
            load(spark, sf_dir, "orders")
            .filter(F.col("o_totalprice") > 500000)
            .select("o_orderkey")
        )
        li = load(spark, sf_dir, "lineitem")
        j = li.join(o, li.l_orderkey == o.o_orderkey)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_topk_per_group_uses_window_group_limit(spark, sf_dir):
    """Per-group top-k must compile to WindowGroupLimit (Partial before
    the shuffle + Final after): each map task forwards only its local
    top-k per group instead of every row — at 100 TB the shuffle input
    drops from |rows| to ~k x |groups| x |tasks|."""
    plan = _plan(spark, sf_dir, "topk_per_group_orders")
    assert plan.count("WindowGroupLimit") >= 2  # Partial + Final


def test_dsir_topk_and_broadcast_logratio(spark, sf_dir):
    # selection must be TakeOrderedAndProject (per-partition heaps), and
    # the B-row log-ratio model must reach scoring as a broadcast join
    plan = _plan(spark, sf_dir, "curation_dsir_importance")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_weighted_sample_is_topk_not_full_sort(spark, sf_dir):
    # the A-ES selection must be TakeOrderedAndProject over the map-side
    # keys — a global sort would shuffle the whole corpus at scale
    plan = _plan(spark, sf_dir, "curation_weighted_sample")
    assert "TakeOrderedAndProject" in plan
    assert "Join" not in plan


def test_triangles_never_cartesian(spark, sf_dir):
    # wedge + closing joins are equi-joins on vertex ids; a cartesian
    # or nested-loop plan would be the all-triples blowup
    plan = _plan(spark, sf_dir, "graph_knn_triangles")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cohort_retention_broadcasts_sizes(spark, sf_dir):
    plan = _plan(spark, sf_dir, "timeseries_cohort_retention")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bloom_prefilter_broadcasts_filter_no_cartesian(spark, sf_dir):
    """The Bloom bitmap (<=1024 rows) must broadcast to the fact side and
    the whole reduction must stay equi-join-shaped — a nested loop or
    cartesian would mean the bit-test join degenerated."""
    plan = _plan(spark, sf_dir, "join_bloom_prefilter")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_domain_caps_single_exchange(spark, sf_dir):
    """Per-domain capping shuffles ONCE on the domain key; the window rank
    and the follow-up per-domain aggregate must reuse that partitioning
    (a second Exchange would double the corpus shuffle at 100 TB)."""
    plan = _plan(spark, sf_dir, "curation_domain_caps")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange SinglePartition" not in plan.split("Window")[0]


def test_inverted_index_partial_aggregation(spark, sf_dir):
    """The (term, doc) tf counts and the per-term df/total_tf stats must
    both run partial->final (map-side combine before the term shuffle),
    and posting ranking must stay per-term (no global sort)."""
    plan = _plan(spark, sf_dir, "text_inverted_index")
    assert plan.count("HashAggregate") >= 4  # >=2 aggregates, each 2-phase
    assert "CartesianProduct" not in plan


def test_ewma_single_partition_sort(spark, sf_dir):
    """The 8-lag EWMA is ONE window pass: exactly one hash Exchange on
    user_id and no extra shuffles — all 16 lag/presence expressions must
    share the same window frame."""
    plan = _plan(spark, sf_dir, "timeseries_ewma_smooth")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 1


def test_mad_outliers_broadcasts_group_stats(spark, sf_dir):
    """Both per-group percentile frames (median, MAD) are O(|event types|)
    and must broadcast back against the big scan — a sort-merge join here
    would shuffle the full corpus twice."""
    plan = _plan(spark, sf_dir, "timeseries_mad_outliers")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan


def test_incremental_refresh_merges_partials(spark, sf_dir):
    """State + delta partials merge through a re-aggregation (union ->
    final agg). Each partial build and the merge itself must be 2-phase
    hash aggregates; no join is needed anywhere in the refresh."""
    plan = _plan(spark, sf_dir, "maintenance_incremental_agg_refresh")
    assert "Union" in plan
    assert plan.count("HashAggregate") >= 4
    assert "Join" not in plan


def test_incremental_dedup_probe_is_equi_join(spark, sf_dir):
    """The new-batch probe against the corpus LSH index must stay an
    equi-join on (band_id, band_key) with the banned-shingle list
    broadcast — any nested-loop/cartesian means the O(|batch|) ingest
    contract is broken."""
    plan = _plan(spark, sf_dir, "dedup_incremental_new_batch")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan  # banned-list anti-join


def test_hard_negative_mining_stays_blocked(spark, sf_dir):
    """Positives block on label, negatives on the k-means cell — both
    equi-joins. A cartesian would mean a corpus-wide pairwise snuck in."""
    plan = _plan(spark, sf_dir, "sim_hard_negative_mining")
    assert "CartesianProduct" not in plan


def test_datacard_aggregates_partial_final(spark, sf_dir):
    """The content-key canonical map and the (lang, source) rollup must
    both run partial->final; no broadcast of the unbounded key space."""
    plan = _plan(spark, sf_dir, "report_corpus_datacard")
    assert plan.count("HashAggregate") >= 4
    assert "CartesianProduct" not in plan


def test_key_skew_report_uses_topk_heap(spark, sf_dir):
    """The top-10 heaviest keys must come from TakeOrderedAndProject (a
    bounded heap), never a single-partition global sort of the full key
    space."""
    plan = _plan(spark, sf_dir, "report_key_skew")
    assert "TakeOrderedAndProject" in plan


def test_bfs_frontier_is_equi_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "graph_bfs_levels")
    assert "CartesianProduct" not in plan


def test_nested_schema_pruning(spark, sf_dir, tmp_path):
    """Catalyst prunes STRUCT fields at the scan: selecting one nested
    field from a struct column must put only that subfield in ReadSchema
    — at 100 TB wide nested schemas, reading whole structs for one leaf
    is the difference between a column scan and a table scan."""
    out = str(tmp_path / "nested")
    spark.sql(
        "SELECT id, named_struct('a', id * 2, 'b', CAST(id AS STRING), "
        "'c', id % 7) AS s FROM range(1000)"
    ).write.parquet(out)
    df = spark.read.parquet(out).select("s.b")
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:")[1][:200]
    assert "b:string" in read_schema
    assert "a:" not in read_schema and "c:" not in read_schema


def test_constant_folding_in_plan(spark, sf_dir):
    """1 + 2 * 3 never survives to the physical plan — Catalyst folds
    constants at optimization time."""
    df = QUERIES["q6_forecast_revenue"](spark, sf_dir).selectExpr(
        "revenue + (1 + 2 * 3) AS shifted"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the folded +7 is absorbed into the final aggregate's result
    # expression; what must NOT survive is the unfolded arithmetic
    assert "2 * 3" not in plan and "(1 + " not in plan


def test_tautology_filter_eliminated(spark, sf_dir):
    """`WHERE x > 5 AND true AND 1 = 1` simplifies to the bare predicate
    — no literal-true conjuncts reach the physical Filter."""
    from pyspark.sql import functions as F

    from datafusion_nats_spark.tables import load

    df = load(spark, sf_dir, "orders").filter(
        (F.col("o_custkey") > 5) & F.lit(True) & (F.lit(1) == F.lit(1))
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "true" not in plan.split("Filter")[1][:120].lower()


# ---------------------------------------------------------------------------
# registry-wide unpartitioned-window guard (VERDICT r2 #4)
# ---------------------------------------------------------------------------

# Queries allowed to keep an unpartitioned window over a NON-aggregated,
# NON-limited input. Empty today: every global window in the registry runs
# over an aggregated or top-k-limited (hence bounded) input. Add a name
# here only with a written justification of why the input is provably
# bounded at 100 TB.
UNPARTITIONED_WINDOW_ALLOWLIST: set[str] = set()

_BOUNDED = {"Aggregate", "GlobalLimit", "LocalLimit", "Deduplicate"}
_PASS_THROUGH = {
    "Project", "Filter", "Sort", "SubqueryAlias", "Window", "WindowGroupLimit",
    "RepartitionByExpression", "Repartition", "WithCTE", "CTERelationRef",
    "Distinct",
}


def _children(node):
    ch = node.children()
    return [ch.apply(i) for i in range(ch.length())]


def _walk_logical(node):
    yield node
    for child in _children(node):
        yield from _walk_logical(child)


def _bounded_input(node) -> bool:
    """A window input is provably bounded when, descending through
    pass-through unary nodes, every branch terminates in an Aggregate or
    a Limit — i.e. the rows reaching the single-partition sort are an
    already-collapsed relation (per-group totals, a top-k head), not the
    raw corpus."""
    name = node.getClass().getSimpleName()
    if name in _BOUNDED:
        return True
    if name in _PASS_THROUGH or name == "Join":
        kids = _children(node)
        return bool(kids) and all(_bounded_input(k) for k in kids)
    return False


def _unpartitioned_window_offenders(df) -> list[str]:
    plan = df._jdf.queryExecution().optimizedPlan()
    out = []
    for node in _walk_logical(plan):
        if (
            node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().isEmpty()
            and not _bounded_input(_children(node)[0])
        ):
            out.append(node.getClass().getSimpleName())
    return out


def test_walker_flags_global_window_over_raw_scan(spark, sf_dir):
    """Negative control: the guard must actually catch the bad shape —
    a global row_number over the raw fact table."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    bad = li.withColumn("rn", F.row_number().over(W.orderBy("l_orderkey")))
    assert _unpartitioned_window_offenders(bad)
    # and the fixed shape (window over an aggregate) passes
    good = (
        li.groupBy("l_returnflag")
        .count()
        .withColumn("rn", F.row_number().over(W.orderBy("l_returnflag")))
    )
    assert not _unpartitioned_window_offenders(good)


def test_registry_has_no_unpartitioned_window_over_unbounded_input(spark, sf_dir):
    """Walk every registered query's optimized logical plan: any Window
    with an empty partition spec must sit over a provably bounded input
    (aggregated or limited) — the shape that at 100 TB funnels the whole
    relation through ONE reducer must never reappear (VERDICT r2: the
    sweepline prefix sum and the RFM ntiles were exactly this, both now
    segmented)."""
    failures = {}
    for name in sorted(QUERIES):
        if name in UNPARTITIONED_WINDOW_ALLOWLIST:
            continue
        df = QUERIES[name](spark, sf_dir)
        off = _unpartitioned_window_offenders(df)
        if off:
            failures[name] = off
    assert not failures, f"single-partition window shapes: {failures}"


def test_iterative_ops_bounded_plan_depth(spark, sf_dir):
    """Iterative operators (k-center FPS, MMR rerank, BFS) must truncate
    lineage per round (localCheckpoint) so the FINAL plan is constant-size
    regardless of iteration count — mirroring
    test_min_label_propagation_bounded_plan_depth. Without hygiene these
    plans would nest one join per round and eventually blow the
    optimizer."""
    for name in [
        "curation_coreset_kcenter",
        "sim_mmr_rerank",
        "graph_bfs_levels",
        "graph_label_propagation",
    ]:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("Join") <= 2, f"{name} lineage grew: {plan}"
        # LPA unions one constant-size aggregate per round over
        # checkpointed label state — still round-count-bounded, not
        # lineage growth (each branch is Aggregate over LogicalRDD)
        cap = 12 if not name.endswith("label_propagation") else 16
        assert len(plan.splitlines()) <= cap, f"{name} lineage grew: {plan}"


def test_salted_join_partitions_on_salt(spark, sf_dir):
    """join_skew_salted_shuffle's demonstrated property: a SHUFFLED join
    whose two exchanges both hash on (key, salt) — a hot custkey's fact
    rows spread over N_SALTS reducers instead of one straggler partition.
    The only broadcast is the 16-row salt range replicating the dim
    (tiny by construction); the dim itself is never broadcast."""
    import re

    plan = _plan(spark, sf_dir, "join_skew_salted_shuffle")
    assert "ShuffledHashJoin" in plan  # the hint pinned the shuffled strategy
    assert re.search(r"hashpartitioning\(o_custkey#\d+L?, fact_salt", plan), plan
    assert re.search(r"hashpartitioning\(c_custkey#\d+L?, dim_salt", plan), plan
    # replication source is the literal 16-row salt range, not the dim
    assert "Range (0, 16" in plan
    assert "BroadcastExchange IdentityBroadcastMode" in plan


# ---------------------------------------------------------------------------
# registry-wide cartesian / theta-join guard (sibling of the window guard)
# ---------------------------------------------------------------------------

# Queries allowed to run a cross or non-equi join where NEITHER side is
# provably bounded (Aggregate/Limit/Range/LocalRelation terminal) NOR
# explicitly broadcast-hinted. Empty today: every cartesian-shaped join
# in the registry either sits over a collapsed relation or carries the
# broadcast hint that asserts (reviewably, at the call site) its side is
# bounded. Add a name only with a written justification.
CARTESIAN_ALLOWLIST: set[str] = set()

_TINY_LEAVES = {"Range", "LocalRelation", "OneRowRelation"}


def _bounded_join_side(node) -> bool:
    name = node.getClass().getSimpleName()
    if name in _BOUNDED or name in _TINY_LEAVES:
        return True
    if name in _PASS_THROUGH or name == "Join":
        kids = _children(node)
        return bool(kids) and all(_bounded_join_side(k) for k in kids)
    return False


def _unbounded_cartesian_offenders(df) -> list[str]:
    """Cross or non-equi Join nodes (no '=' conjunct in the condition)
    where no side is provably bounded and no side carries an explicit
    broadcast hint — the shape that is a full cartesian shuffle/NL loop
    over two unbounded relations at 100 TB."""
    out = []
    for node in _walk_logical(df._jdf.queryExecution().optimizedPlan()):
        if node.getClass().getSimpleName() != "Join":
            continue
        cond = node.condition()
        cstr = "" if cond.isEmpty() else cond.get().toString()
        if " = " in cstr or "<=>" in cstr:
            continue  # has an equi conjunct — hash-joinable
        if "broadcast" in node.hint().toString().lower():
            continue  # explicit boundedness assertion at the call site
        left, right = _children(node)
        if _bounded_join_side(left) or _bounded_join_side(right):
            continue
        out.append(cstr[:80] or "<cross>")
    return out


def test_walker_flags_unbounded_cartesian(spark, sf_dir):
    """Negative control: an unhinted cross join of two raw fact tables
    must be flagged; adding the broadcast assertion or collapsing one
    side clears it."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    from pyspark.sql import functions as F

    assert _unbounded_cartesian_offenders(li.crossJoin(o))
    assert _unbounded_cartesian_offenders(
        li.join(o, li.l_extendedprice > o.o_totalprice)  # pure theta
    )
    assert not _unbounded_cartesian_offenders(li.crossJoin(F.broadcast(o)))
    assert not _unbounded_cartesian_offenders(
        li.crossJoin(o.groupBy("o_orderstatus").count())
    )


def test_registry_has_no_unbounded_cartesian_join(spark, sf_dir):
    """Walk every registered query's optimized logical plan: no cross or
    pure-theta join may pair two unbounded, unhinted relations."""
    failures = {}
    for name in sorted(QUERIES):
        if name in CARTESIAN_ALLOWLIST:
            continue
        off = _unbounded_cartesian_offenders(QUERIES[name](spark, sf_dir))
        if off:
            failures[name] = off
    assert not failures, f"unbounded cartesian joins: {failures}"
