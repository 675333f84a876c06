"""Distributed BPE merge training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units"): learn the first
MERGES byte-pair-encoding merge rules from the corpus word histogram —
each round counts adjacent symbol pairs weighted by word frequency,
picks the most frequent pair (ties: lexicographic), and applies the
greedy left-to-right non-overlapping merge to every word.

Scale design (100 TB):
- BPE never touches raw text after the first pass: training runs on the
  WORD HISTOGRAM (token, count), which is the only corpus-scale
  aggregate — here additionally truncated to the top-VOCAB tokens
  (orderBy+limit = TakeOrderedAndProject), the standard
  dictionary-bounded trainer setup;
- each round is one explode+sum pair count over the histogram (map-side
  partial aggregation), a 1-row argmax, and a map-only merge rewrite
  with the winning pair broadcast as a single-row cross join;
- the winning pair and the rewritten histogram are localCheckpointed
  per round — bounded plan depth, same hygiene as the Lloyd/pagerank
  iterations.

Determinism: pair counts are integers; the argmax orders by
(count DESC, left, right); the greedy merge is expressed as pure array
expressions with run-parity handling for self-pairs (l == r), verified
identical on both engines — so the full MERGES-round training carries a
DuckDB oracle with every round unrolled as chained CTEs.

Reference parity note: the reference engine has no tokenizer surface;
this extends the mandated text-analysis family (token counting) with
the trainer that produces the vocabulary those counters assume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load, scan_parallelism

VOCAB = 500  # word-histogram truncation (top-VOCAB by count, then token)
MERGES = 3  # merge rounds to learn

# --- the greedy non-overlapping merge, as engine-twin array expressions.
# Match positions i have w[i]=l, w[i+1]=r; for self-pairs (l == r) a
# match only *starts* a merge when its offset inside the maximal run of
# l-symbols is even (greedy-from-run-start semantics). Emission: merged
# symbol at each start, skip at start+1, passthrough elsewhere.

_SPARK_STARTS = """
CASE WHEN size(w) < 2 THEN CAST(array() AS array<int>) ELSE
  filter(sequence(1, size(w)-1), i ->
    element_at(w, CAST(i AS INT)) = ml AND element_at(w, CAST(i+1 AS INT)) = mr AND
    (ml != mr OR ((i - array_max(filter(sequence(1, i), j ->
        j = 1 OR element_at(w, CAST(j-1 AS INT)) != ml))) % 2 = 0)))
END
"""

_SPARK_APPLY = """
filter(transform(sequence(1, size(w)), i ->
    CASE WHEN array_contains(starts, i) THEN concat(ml, mr)
         WHEN array_contains(starts, CAST(i-1 AS INT)) THEN NULL
         ELSE element_at(w, CAST(i AS INT)) END), x -> x IS NOT NULL)
"""


def _duck_merge_round(k: int) -> str:
    """CTEs for round k: pair counts over w{k-1}, 1-row argmax best{k},
    and the rewritten histogram w{k}."""
    return f"""
    , p{k} AS (
      SELECT p.l AS l, p.r AS r, CAST(sum(wc) AS BIGINT) AS cnt FROM (
        SELECT unnest(list_transform(range(1, len(w)),
                 i -> struct_pack(l := w[i], r := w[i+1]))) AS p, wc
        FROM w{k - 1} WHERE len(w) >= 2
      ) GROUP BY 1, 2
    ), best{k} AS (
      SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1
    ), w{k} AS (
      SELECT list_filter(list_transform(range(1, len(w)+1), i ->
          CASE WHEN list_contains(starts, i) THEN l || r
               WHEN list_contains(starts, i-1) THEN NULL
               ELSE w[i] END), x -> x IS NOT NULL) AS w, wc
      FROM (
        SELECT w, wc, b.l, b.r,
          list_filter(range(1, len(w)), i -> w[i] = b.l AND w[i+1] = b.r AND
            (b.l != b.r OR ((i - coalesce(list_max(list_filter(range(1, i+1),
                j -> j = 1 OR w[j-1] != b.l)), 1)) % 2 = 0))) AS starts
        FROM w{k - 1}, best{k} b
      )
    )
    """


def _bpe_oracle() -> str:
    parts = [
        f"""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ), hist AS (
      SELECT tok, count(*) AS wc FROM toks
      WHERE regexp_matches(tok, '^[a-z]+$')
      GROUP BY tok ORDER BY wc DESC, tok LIMIT {VOCAB}
    ), w0 AS (
      SELECT list_transform(range(1, length(tok)+1), i -> substr(tok, i, 1)) AS w, wc
      FROM hist
    )
    """
    ]
    parts.extend(_duck_merge_round(k) for k in range(1, MERGES + 1))
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS INT) AS merge_rank, l AS left_sym, r AS right_sym, cnt AS pair_count FROM best{k}"
        for k in range(1, MERGES + 1)
    )
    return "".join(parts) + union


@query(
    "text_bpe_merges",
    oracle=_bpe_oracle(),
    doc=f"BPE merge training over the top-{VOCAB} word histogram: "
    f"{MERGES} rounds of frequency-weighted pair counting, deterministic "
    "argmax (count DESC then lexicographic), and greedy non-overlapping "
    "merge application expressed as pure array expressions (run-parity "
    "handling for self-pairs). Emits the learned merge table "
    "(merge_rank, left_sym, right_sym, pair_count); the DuckDB oracle "
    "unrolls every round as chained CTEs.",
)
def text_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    merges, _ = _train(spark, sf_dir)
    out = merges[0]
    for m in merges[1:]:
        out = out.unionByName(m)
    return out


def _train_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The histogram with all MERGES rules applied — w{MERGES} in the
    oracle's CTE chain."""
    _, words = _train(spark, sf_dir)
    return words


def _train(spark: SparkSession, sf_dir: str) -> tuple[list[DataFrame], DataFrame]:
    d = load(spark, sf_dir, "documents").repartition(
        scan_parallelism(spark, sf_dir, "documents"), "doc_id"
    )
    toks = d.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok")
    ).filter(F.col("tok").rlike("^[a-z]+$"))
    hist = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("wc"))
        .orderBy(F.desc("wc"), "tok")
        .limit(VOCAB)
    )
    words = hist.select(
        F.expr("transform(sequence(1, length(tok)), i -> substr(tok, i, 1))").alias("w"),
        "wc",
    ).localCheckpoint()

    merges = []
    for k in range(1, MERGES + 1):
        pairs = (
            words.filter(F.size("w") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(w)-1), i -> "
                        "struct(element_at(w, CAST(i AS INT)) AS l, "
                        "element_at(w, CAST(i+1 AS INT)) AS r))"
                    )
                ).alias("p"),
                "wc",
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("wc").alias("cnt"))
        )
        # 1-row argmax; localCheckpoint so the rule feeds both the output
        # table and the rewrite without recomputing the round
        best = pairs.orderBy(F.desc("cnt"), "l", "r").limit(1).localCheckpoint()
        merges.append(
            best.select(
                F.lit(k).alias("merge_rank"),
                F.col("l").alias("left_sym"),
                F.col("r").alias("right_sym"),
                F.col("cnt").alias("pair_count"),
            )
        )
        words = (
            words.crossJoin(
                F.broadcast(best.select(F.col("l").alias("ml"), F.col("r").alias("mr")))
            )
            .withColumn("starts", F.expr(_SPARK_STARTS))
            .select(F.expr(_SPARK_APPLY).alias("w"), "wc")
            .localCheckpoint()  # bounded plan depth across rounds
        )
    return merges, words


def _bpe_segment_oracle() -> str:
    """Chain the training CTEs, then report the segmentation the learned
    merges induce on the histogram: w{MERGES} is the vocabulary with all
    MERGES rules applied in order."""
    head = _bpe_oracle().rsplit("SELECT CAST(1", 1)[0]  # CTE chain, no final UNION
    return head + f"""
    SELECT array_to_string(w, ' ') AS segmented,
           CAST(len(w) AS INT) AS n_symbols,
           CAST(wc AS BIGINT) AS wc
    FROM w{MERGES}
    """


@query(
    "text_bpe_segment",
    oracle=_bpe_segment_oracle(),
    doc=f"BPE vocabulary segmentation: apply the {MERGES} learned merge "
    f"rules (from text_bpe_merges, same training chain) to the top-{VOCAB} "
    "word histogram and emit each word's subword segmentation plus its "
    "symbol count — the compression the tokenizer would achieve. Pure "
    "array expressions end-to-end; the oracle reuses the unrolled "
    "training CTEs.",
)
def text_bpe_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = _train_words(spark, sf_dir)
    return words.select(
        F.array_join("w", " ").alias("segmented"),
        F.size("w").alias("n_symbols"),
        F.col("wc"),
    )
