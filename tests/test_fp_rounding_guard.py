"""Registry-wide FP-determinism lint: every ``avg``-shaped reduction
must be justified.

The silhouette incident (round 4's one driver-red row): ``round(avg(d),
6)`` over distances pre-rounded to 1e-6 summed doubles in partition
order, and a mean sitting exactly on a 5e-7 rounding boundary flipped
its 6th decimal between 16- and 32-core runs. The repo's FP playbook
therefore bans float ``avg`` over DECIMAL-GRID inputs (exact cents,
2-decimal money, explicitly pre-round()ed values): those means land on
a coarse rational grid that intersects round-half boundaries with real
probability, so they must be recomposed as integer-unit sums (exact,
associative) divided by count once.

Inputs that are safe WITHOUT integer units, and why:

- **integer inputs** (counts, n_chars, integer-valued quantity): both
  Spark (long accumulator for integral avg; integer-valued doubles sum
  exactly below 2^53) and DuckDB (hugeint accumulator) sum exactly, so
  the single final division is bit-identical regardless of
  partitioning;
- **continuous dyadic inputs** (logs, cosines, z-scores, quantization
  errors — anything carrying ~50 significant bits): the exact mean is
  a fine-grained dyadic rational, so the probability it falls within
  the ~1e-13 summation-order noise of a decimal round-half boundary is
  measure-zero in practice;
- **window-frame aggregates**: each output row's frame is a fixed,
  sort-ordered row set evaluated sequentially, so the summation order
  is data-determined, not partitioning-determined;
- **centroid intermediates**: per-coordinate means whose ~1e-13 order
  noise is absorbed by an explicit 1e-6 rounding applied to every
  downstream distance before any min/argmin/output.

This guard forces the audit to stay current: any NEW query whose Spark
source or oracle mentions ``avg(`` must either use the integer-unit
recomposition (and thus not match the pattern) or be added here with
one of the four justifications above.
"""

from __future__ import annotations

import inspect
import re

from datafusion_nats_spark.registry import REGISTRY, _load_all

AVG_PAT = re.compile(r"F\.avg\(|\bavg\s*\(", re.IGNORECASE)

# query name -> audited justification (see module docstring for the
# taxonomy). An entry asserts a human re-derived WHY the float avg (or
# the mere mention of avg) cannot flip with the partial-aggregation
# tree. Round-5 audit, 2026-08-15.
ALLOWLIST: dict[str, str] = {
    "agg_filter_clause": "integer-valued l_quantity: exact double sums",
    "curation_label_centroid_outliers": (
        "centroid intermediate; downstream distances rounded to 1e-6"
    ),
    "curation_minmax_normalize": "integer n_chars input: exact sums",
    "curation_stratified_sample": "integer n_chars input: exact sums",
    "dedup_semantic_semdedup": (
        "centroid intermediate; downstream cosines rounded to 1e-6"
    ),
    "pipeline_corpus_curation": "integer n_chars input: exact sums",
    "pipeline_embedding_ready": (
        "centroid intermediate; downstream distances rounded to 1e-6"
    ),
    "q17_small_quantity_revenue": (
        "integer-valued l_quantity: exact double sums; x0.5 threshold "
        "compare exact"
    ),
    "q22_global_sales_opportunity": (
        "membership test converted to cents*count > sum(cents) int64; "
        "'avg' appears only in the docstring describing the banned form"
    ),
    "report_key_skew": "integer per-key counts: exact sums",
    "sim_ann_recall_report": (
        "centroid intermediate; recall ratio is integer hits / k"
    ),
    "sim_hard_negative_mining": (
        "centroid intermediate; downstream cosines rounded to 1e-6"
    ),
    "sim_int8_quantization": (
        "continuous dyadic quantization errors: boundary hit measure-zero"
    ),
    "sim_index_probe": (
        "persisted-index twin of sim_ivf_ann: same centroid avg (built "
        "once, parquet round-trip exact); downstream cosines rounded to "
        "1e-6"
    ),
    "sim_index_probe_kmeans": (
        "persisted-index twin of sim_kmeans_ann: same Lloyd centroid avg "
        "(built once, parquet round-trip exact); downstream cosines "
        "rounded to 1e-6"
    ),
    "sim_index_probe_bigbatch": (
        "distributed-path twin of sim_index_probe: the avg( is the same "
        "IVF-oracle centroid intermediate (built once, parquet "
        "round-trip exact); probe ranks and rerank cosines rounded to "
        "1e-6"
    ),
    "search_hybrid_rrf_indexed": (
        "vector arm is the persisted IVF probe — the avg( is the same "
        "centroid intermediate as sim_index_probe (built once, parquet "
        "round-trip exact); both arms' scores and the RRF fusion are "
        "rounded to 1e-6 before ranking"
    ),
    "sim_stream_screen": (
        "persisted-index probe per micro-batch: same centroid avg as "
        "sim_index_probe (built once, parquet round-trip exact); probe "
        "ranks, ingest assignment and rerank all round cosines to 1e-6"
    ),
    "sim_ivf_ann": "centroid intermediate; distances rounded to 1e-6",
    "sim_kmeans_ann": "centroid intermediate; distances rounded to 1e-6",
    "sim_pairwise_label_stats": (
        "continuous dyadic cosines: boundary hit measure-zero"
    ),
    "sim_silhouette_by_label": (
        "centroid intermediate only; finals are integer micro-unit sums "
        "(the round-4 fix)"
    ),
    "text_bigram_lm_score": (
        "continuous log(count) values: boundary hit measure-zero"
    ),
    "text_burrows_delta": (
        "continuous z-scores (sqrt denominators): boundary hit measure-zero"
    ),
    "timeseries_autocorrelation": "integer daily counts: exact sums",
    "timeseries_changepoint_meanshift": (
        "integer counts + deterministic window frames"
    ),
    "timeseries_daily_count_spikes": "integer daily counts: exact sums",
    "timeseries_rolling_zscore_anomaly": (
        "deterministic per-row window frames, sequential in-frame eval"
    ),
    "window_frames_rows": (
        "deterministic window frames over sorted rows, sequential eval"
    ),
}


def test_every_avg_site_is_audited():
    _load_all()
    offenders = []
    for name, spec in sorted(REGISTRY.items()):
        src = inspect.getsource(spec.fn) + (spec.oracle or "")
        if AVG_PAT.search(src) and name not in ALLOWLIST:
            offenders.append(name)
    assert not offenders, (
        "queries use avg( without an FP-determinism audit entry — either "
        "recompose as integer-unit sums (see sim_silhouette_by_label) or "
        f"add a justified ALLOWLIST entry: {offenders}"
    )


def test_allowlist_has_no_stale_entries():
    _load_all()
    stale = []
    for name in ALLOWLIST:
        spec = REGISTRY.get(name)
        if spec is None:
            stale.append(name)
            continue
        src = inspect.getsource(spec.fn) + (spec.oracle or "")
        if not AVG_PAT.search(src):
            stale.append(name)
    assert not stale, f"ALLOWLIST entries no longer matching any avg( site: {stale}"


def test_no_float_avg_over_decimal_grid_columns():
    """The strongest static form of the playbook rule: ``F.avg`` applied
    DIRECTLY to a known decimal-grid column (exact cents / 2-decimal
    money) is banned outright — no allowlist. The safe recomposition is
    sum(cast(round(col*100) as bigint)) / count."""
    _load_all()
    grid_cols = (
        "value",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "o_totalprice",
        "c_acctbal",
        "s_acctbal",
    )
    pat = re.compile(
        r"F\.avg\(\s*(?:F\.col\()?[\"'](%s)[\"']" % "|".join(grid_cols)
    )
    offenders = []
    for name, spec in sorted(REGISTRY.items()):
        for line in inspect.getsource(spec.fn).splitlines():
            # window-frame avgs are order-deterministic (fixed sorted
            # frame per output row) — the ban targets grouped reductions
            if pat.search(line) and ".over(" not in line:
                offenders.append(name)
                break
    assert not offenders, (
        f"float F.avg over exact-decimal money/cents columns: {offenders}"
    )


def test_integer_unit_sums_overflow_loudly(spark):
    """The integer-unit recomposition's documented failure mode: past
    ~int64 headroom (q1 docstring: ~300x at sf0.1) an ANSI-mode bigint
    SUM must raise, never wrap silently — a wrapped sum would pass the
    shape checks while being arbitrarily wrong."""
    import pytest
    from pyspark.sql import functions as F

    near_max = (1 << 62) + 7
    df = spark.createDataFrame([(near_max,), (near_max,), (near_max,)], "u long")
    with pytest.raises(Exception, match="(?i)overflow|arithmetic"):
        df.agg(F.sum("u").alias("s")).collect()
    # and the in-range path is exact to the last unit
    ok = spark.createDataFrame([(near_max,), (5,)], "u long")
    assert ok.agg(F.sum("u")).collect()[0][0] == near_max + 5
