"""Test-data table loading + temp-view registration.

Tables are the driver-generated TPC-H-ish star schema plus the stream /
LLM-pipeline extension tables (TESTDATA.md / FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _pin_session_invariants(spark: SparkSession) -> None:
    """Correctness-critical session settings, enforced on every load so
    the oracle contract holds even under a driver-constructed session:
    UTC timestamps (codec semantics, reference csv.rs:162-164, and every
    epoch/date-function oracle assumes it)."""
    if spark.conf.get("spark.sql.session.timeZone", "") != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table. Parquet scan → Catalyst gets pushdown + pruning.

    Timestamp normalization: driver-generated parquet stores timestamps
    as INT64 TIMESTAMP(isAdjustedToUTC=false) — Spark reads these as
    TIMESTAMP_NTZ, which breaks epoch functions (unix_micros) and
    streaming watermarks (both require TIMESTAMP_LTZ). With the session
    timezone pinned to UTC, an NTZ→LTZ cast is value-preserving against
    the DuckDB oracle (which reads the same parquet as naive TIMESTAMP).
    A legacy branch also tolerates INT64 TIMESTAMP(NANOS) files read as
    bigint (earlier driver data generations used nanos).
    """
    _pin_session_invariants(spark)
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    from pyspark.sql import functions as F

    dtypes = dict(df.dtypes)
    if name == "events" and dtypes.get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        dtypes = dict(df.dtypes)
    for col, dt in dtypes.items():
        if dt == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL entry points."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)


def scan_parallelism(
    spark: SparkSession, sf_dir: str, name: str, bytes_per_task: int = 16 << 10
) -> int:
    """Partition count for a CPU-bound map over table ``name``, derived
    from the table's on-disk size instead of a flat defaultParallelism
    (guide §2: make partitioning scale-adaptive, not a constant tuned
    for one scale).

    The flat ``repartition(defaultParallelism, ...)`` the dedup/text
    family used was right for the bench SF but pathological below it:
    at sf0.001 every stage of every iterative pipeline ran 32 tasks over
    ~500 rows, and the per-task dispatch overhead (amplified by 32-way
    thread contention) dominated wall clock — the corpus_curation
    example spent minutes scheduling no-op tasks. Clamped to
    defaultParallelism, so at the bench SF and above this returns
    exactly the old value and plans/timings there are unchanged.

    ``bytes_per_task`` is deliberately tiny (16 KiB parquet ≈ a few
    hundred KiB of text): these maps are CPU-heavy per byte (shingling,
    md5 per shingle), the opposite of the byte-balanced sizing AQE's
    advisory-size coalescing assumes — which is also why the call sites
    pin an explicit partition count rather than letting AQE coalesce
    the exchange to one task. Reads only file metadata (one Hadoop
    ``getContentSummary`` call), never data."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(f"{sf_dir}/{name}.parquet")
    try:
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        n_bytes = fs.getContentSummary(hpath).getLength()
    except Exception:  # unreadable path → keep the old flat behavior
        return spark.sparkContext.defaultParallelism
    dp = spark.sparkContext.defaultParallelism
    return max(1, min(dp, int(n_bytes) // bytes_per_task))


# Upper bound on the salted-join replication factor. The skew salts
# replicate the SMALL side S ways; with S = defaultParallelism the
# replicated bytes scale linearly with cluster size (on a 1,000-core
# cluster the workload/corpus side is duplicated 1,000× — a local-mode
# assumption hiding inside an otherwise correct technique, round-9
# verdict). 32-way parallelism per hot key is plenty to break the
# measured stragglers (49 s / 233 s max tasks went away at S=32 in the
# round-9 captures, which ran at exactly this value); past that, more
# salts buy diminishing parallelism for linearly more replication.
SALT_CAP = 32


def salt_factor(spark: SparkSession) -> int:
    """Salt count for the low-cardinality-key skew joins (semdedup,
    embedding-cosine, BM25/phrase probe, IVF rerank): parallel enough to
    break per-key serialization, capped so replication bytes stay
    constant as the cluster grows. Equal to defaultParallelism on
    local[<=32], so local plans and bench numbers are unchanged."""
    return max(1, min(spark.sparkContext.defaultParallelism, SALT_CAP))


def salt_partitions(spark: SparkSession, salts: int) -> int:
    """Partition count for the salted joins' pinned repartitions.

    Two different knobs were conflated until round 10: the SALT count
    bounds replication bytes (salt_factor, capped at SALT_CAP), while
    the PARTITION count only controls how the |keys|·salts distinct
    join cells spread across tasks. Pinning the partition count AT the
    salt count stacked ~|keys| cells per task by hash collision and
    capped every salted fan-out at `salts` tasks regardless of cores —
    the round-10 30x bigbatch capture measured the IVF rerank (a
    13.8k-cpu-s stage) running as exactly 32 tasks with 378/608/975 s
    min/median/max durations: parallel, but collision-stacked and
    unable to use more cores. The count stays a USER-specified
    numPartitions (AQE's byte-based coalescing would merge the
    deliberately small-input fan-out partitions back into ~one task —
    the original reason for pinning), but is decoupled from the salt
    count: ×16 headroom so cells rarely collide, and scaling with
    cluster cores so the fan-out is never partition-bound."""
    dp = spark.sparkContext.defaultParallelism
    return max(int(salts) * 16, dp * 4)
