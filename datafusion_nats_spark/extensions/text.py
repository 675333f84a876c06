"""Text-analysis operators for LLM-data pipelines (driver mandate,
BASELINE.json north_star): token statistics, quality scoring, language
identification, document fingerprinting.

All pure built-in expressions (split/transform/aggregate/md5) — JVM-side,
no Python in the row path; each operator is a narrow map over `documents`
with no shuffle except the final (optional) aggregation, so throughput
scales linearly with executors at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_nats_spark.registry import query
from datafusion_nats_spark.tables import load, scan_parallelism


def tokens(col):
    """Whitespace tokenization of trimmed text (identical semantics in the
    DuckDB oracle via regexp_split_to_array)."""
    return F.split(F.trim(col), r"\s+")


def _adjacent_bigrams(toks):
    """Adjacent "a b" bigram array of a token-array COLUMN (pass an
    attribute, not an expression tree: a captured computation subtree is
    re-evaluated per element by interpreted HOF eval — the round-9
    O(tokens x tokenize) bug class this helper exists to prevent).
    zip_with pads the shorter side with NULL (concat propagates it), so
    entries 1..n-1 of the zip are the bigrams and the outer slice drops
    the NULL tail; docs under 2 tokens yield an empty array. One shared
    definition for text_bigram_lm_score / text_boilerplate_ngrams /
    text_repetition_gopher, pinned by the differential test in
    tests/test_extensions.py (round-9 ADVICE: the three inline copies
    could drift independently)."""
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.slice(
            F.zip_with(
                toks,
                F.slice(toks, 2, F.greatest(n - 1, F.lit(1))),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
            1,
            n - 1,
        ),
    ).otherwise(F.array().cast("array<string>"))


@query(
    "text_token_stats",
    oracle="""
    SELECT
      doc_id,
      CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER) AS n_tokens,
      CAST(length(text) AS INTEGER)                                   AS n_chars_measured,
      CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS INTEGER)
                                                                      AS n_unique_tokens,
      round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
            / len(regexp_split_to_array(trim(text), '\\s+')), 6)      AS avg_token_len,
      round(CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS DOUBLE)
            / len(regexp_split_to_array(trim(text), '\\s+')), 6)      AS ttr
    FROM documents
    """,
    doc="Token counting: whitespace tokens, unique tokens, type-token "
    "ratio, average token length (BPE-ish regex tokenizer = whitespace "
    "split here; vocabulary-free).",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_tokens = F.size(toks)
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
            / n_tokens,
            6,
        ).alias("avg_token_len"),
        F.round(F.size(F.array_distinct(toks)).cast("double") / n_tokens, 6).alias("ttr"),
    )


@query(
    "text_quality_score",
    oracle="""
    WITH stats AS (
      SELECT
        doc_id,
        len(regexp_split_to_array(trim(text), '\\s+')) AS n_tok,
        length(text) AS n_ch,
        len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                        t -> t IN ('the','a','of','and','in','to','is'))) AS n_stop
      FROM documents
    )
    SELECT
      doc_id,
      CAST(n_tok AS INTEGER) AS n_tok,
      round(CAST(n_stop AS DOUBLE) / n_tok, 6) AS stopword_ratio,
      CAST((n_tok BETWEEN 20 AND 1000) AS BOOLEAN) AS length_ok,
      round(least(CAST(n_tok AS DOUBLE) / 100, 1.0) * 0.5
            + least(CAST(n_stop AS DOUBLE) / n_tok * 5, 1.0) * 0.5, 6) AS quality
    FROM stats
    """,
    doc="Quality scoring: stopword ratio + length gate + composite score "
    "(C4/Gopher-style heuristics).",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_tok = F.size(toks)
    # counts stopword *occurrences* (filter), not distinct hits (intersect)
    n_stop = F.size(F.filter(toks, lambda t: t.isin("the", "a", "of", "and", "in", "to", "is")))
    return d.select(
        "doc_id",
        n_tok.alias("n_tok"),
        F.round(n_stop.cast("double") / n_tok, 6).alias("stopword_ratio"),
        n_tok.between(20, 1000).alias("length_ok"),
        F.round(
            F.least(n_tok.cast("double") / 100, F.lit(1.0)) * 0.5
            + F.least(n_stop.cast("double") / n_tok * 5, F.lit(1.0)) * 0.5,
            6,
        ).alias("quality"),
    )


# Language-ID stopword profiles (tiny n-gram/stopword heuristic — the
# point is the distributed shape, not linguistic accuracy).
_LANG_PROFILES = {
    "en": ("the", "and", "of", "to", "is"),
    "es": ("el", "la", "de", "que", "y"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "des"),
    "zh": ("de", "shi", "le", "bu", "wo"),
}


@query(
    "text_langid",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS t
      FROM documents
    ), scores AS (
      SELECT doc_id,
        {", ".join(
            "len(list_filter(t, x -> x IN ({})) ) AS score_{}".format(
                ", ".join(f"'{w}'" for w in words), lang
            )
            for lang, words in _LANG_PROFILES.items()
        )}
      FROM toks
    )
    SELECT doc_id,
      CASE
        WHEN score_en >= score_es AND score_en >= score_de AND score_en >= score_fr AND score_en >= score_zh THEN 'en'
        WHEN score_es >= score_de AND score_es >= score_fr AND score_es >= score_zh THEN 'es'
        WHEN score_de >= score_fr AND score_de >= score_zh THEN 'de'
        WHEN score_fr >= score_zh THEN 'fr'
        ELSE 'zh'
      END AS lang_pred,
      CAST(score_en AS INTEGER) AS score_en
    FROM scores
    """,
    doc="Language-ID heuristic: per-language stopword hit counts, argmax "
    "with a fixed priority tiebreak (en>es>de>fr>zh).",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    def score(words):
        # NB: lambda must take exactly one arg — Spark's higher-order
        # function binding passes a Column per declared parameter.
        return F.size(F.filter(toks, lambda t: t.isin(*words)))

    scores = {lang: score(words) for lang, words in _LANG_PROFILES.items()}
    pred = (
        F.when(
            (scores["en"] >= scores["es"])
            & (scores["en"] >= scores["de"])
            & (scores["en"] >= scores["fr"])
            & (scores["en"] >= scores["zh"]),
            "en",
        )
        .when(
            (scores["es"] >= scores["de"])
            & (scores["es"] >= scores["fr"])
            & (scores["es"] >= scores["zh"]),
            "es",
        )
        .when((scores["de"] >= scores["fr"]) & (scores["de"] >= scores["zh"]), "de")
        .when(scores["fr"] >= scores["zh"], "fr")
        .otherwise("zh")
    )
    return d.select("doc_id", pred.alias("lang_pred"), scores["en"].alias("score_en"))


@query(
    "text_fingerprint",
    oracle="""
    SELECT
      doc_id,
      md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS content_fp,
      ('0x' || substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 15))::BIGINT
        AS fp_int,
      CAST(('0x' || substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 15))::BIGINT
        % 1024 AS INTEGER) AS fp_bucket
    FROM documents
    """,
    doc="Document fingerprinting: whitespace-normalized content hash + a "
    "64-bit integer fingerprint + shard bucket (the exact-dedup / "
    "routing key at 100 TB).",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    fp = F.md5(norm)
    fp_int = F.conv(F.substring(fp, 1, 15), 16, 10).cast("bigint")
    return d.select(
        "doc_id",
        fp.alias("content_fp"),
        fp_int.alias("fp_int"),
        (fp_int % 1024).cast("int").alias("fp_bucket"),
    )


@query(
    "text_tfidf_top_terms",
    oracle="""
    WITH words AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
      FROM documents
    ), tf AS (
      SELECT doc_id, word, count(*) AS tf FROM words GROUP BY doc_id, word
    ), df AS (
      SELECT word, count(DISTINCT doc_id) AS df FROM words GROUP BY word
    ), n AS (
      SELECT count(DISTINCT doc_id) AS n FROM words
    ), scored AS (
      SELECT t.doc_id, t.word,
             round(t.tf * ln(CAST(n.n AS DOUBLE) / d.df), 6) AS tfidf
      FROM tf t JOIN df d USING (word) CROSS JOIN n
    ), ranked AS (
      SELECT doc_id, word, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, word) AS rn
      FROM scored
    )
    SELECT doc_id, word, tfidf, CAST(rn AS INT) AS rn
    FROM ranked
    WHERE rn <= 3 AND doc_id < 10
    ORDER BY doc_id, rn
    """,
    doc="TF-IDF top terms per document: term frequency (per doc) × "
    "ln(N/document-frequency), top-3 per doc by (tfidf desc, word) — the "
    "keyword-extraction primitive. The df table is |vocabulary|-sized "
    "and broadcasts; tf shuffles once on (doc, word); the per-doc rank "
    "partitions on doc_id — no driver collects, no all-pairs.",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(tokens(F.col("text"))).alias("word"))
    tf = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df = words.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = words.agg(F.countDistinct("doc_id").alias("n"))
    scored = (
        tf.join(F.broadcast(df), "word")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "word",
            F.round(
                F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), "word")
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter((F.col("rn") <= 3) & (F.col("doc_id") < 10))
        .select("doc_id", "word", "tfidf", "rn")
        .orderBy("doc_id", "rn")
    )


@query(
    "text_bigram_lm_score",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\\s+') AS ws
      FROM documents
    ), bigrams AS (
      SELECT doc_id, unnest(list_transform(range(1, greatest(len(ws) - 1, 0) + 1),
                                           i -> ws[i] || ' ' || ws[i + 1])) AS bg
      FROM toks
    ), model AS (
      SELECT bg, count(*) AS c12 FROM bigrams GROUP BY bg
    )
    SELECT b.doc_id,
           CAST(count(*) AS BIGINT)                        AS n_bigrams,
           CAST(count(DISTINCT b.bg) AS BIGINT)            AS n_distinct,
           CAST(count(*) FILTER (WHERE m.c12 <= 2) AS BIGINT) AS n_rare,
           round(avg(ln(CAST(m.c12 AS DOUBLE))), 6)        AS avg_log_count
    FROM bigrams b JOIN model m USING (bg)
    GROUP BY b.doc_id
    """,
    doc="Corpus bigram language-model scoring: count every consecutive "
    "word pair over the corpus (the 'model'), then score each document by "
    "its bigram frequency profile — rare-bigram count flags disfluent / "
    "machine-garbled text, avg log-count is the unnormalized LM "
    "likelihood. Two shuffles total (model build + per-doc score), both "
    "on high-cardinality keys; the bigram extraction is a map-side "
    "transform over the token array.",
)
def text_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # token array materialized into its own projection (a captured
    # ATTRIBUTE is a row-slot read under any eval mode; the inline
    # expression was referenced 3x and relied on codegen CSE), then the
    # shared _adjacent_bigrams helper
    t = d.select("doc_id", tokens(F.lower(F.col("text"))).alias("_toks"))
    bigrams = t.select(
        "doc_id", F.explode(_adjacent_bigrams(F.col("_toks"))).alias("bg")
    )
    model = bigrams.groupBy("bg").agg(F.count(F.lit(1)).alias("c12"))
    return (
        bigrams.join(model, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.countDistinct("bg").alias("n_distinct"),
            F.count_if(F.col("c12") <= 2).alias("n_rare"),
            F.round(F.avg(F.log(F.col("c12").cast("double"))), 6).alias(
                "avg_log_count"
            ),
        )
    )


@query(
    "text_vocab_heavy_hitters",
    oracle="""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ), counted AS (
      SELECT tok, count(*) AS cnt FROM toks WHERE tok <> '' GROUP BY tok
    ), total AS (SELECT count(*) AS n FROM toks WHERE tok <> '')
    SELECT tok, cnt,
           round(CAST(cnt AS DOUBLE) / (SELECT n FROM total), 8) AS corpus_share
    FROM counted
    WHERE cnt >= 200
    """,
    doc="Corpus vocabulary heavy hitters: tokens appearing >= 200 times "
    "plus their corpus share. The groupBy is a classic two-phase "
    "(map-side partial count, then merge) hash aggregate over the "
    "exploded token stream — at 100 TB the partial combine collapses "
    "each executor's token stream to its local vocabulary before any "
    "shuffle, and the HAVING filter runs post-merge. The corpus total "
    "rides along as a 1-row broadcast cross join, not a second scan.",
)
def text_vocab_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    counted = toks.groupBy("tok").agg(F.count("*").alias("cnt")).filter(
        F.col("cnt") >= 200
    )
    total = toks.agg(F.count("*").alias("n"))
    return counted.crossJoin(F.broadcast(total)).select(
        "tok",
        "cnt",
        F.round(F.col("cnt").cast("double") / F.col("n"), 8).alias("corpus_share"),
    )


@query(
    "text_boilerplate_ngrams",
    oracle="""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents
    ), bg AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(1, len(toks)),
               i -> array_to_string(toks[i:i+1], ' ')))) AS bg
      FROM t
    ), dfc AS (
      SELECT bg, count(DISTINCT doc_id) AS df FROM bg GROUP BY bg
    ), boiler AS (
      SELECT bg FROM dfc WHERE df * 10 >= (SELECT count(*) FROM documents)
    )
    SELECT b.doc_id,
           count(*)                                        AS n_bigrams,
           count(bl.bg)                                    AS n_boiler,
           round(CAST(count(bl.bg) AS DOUBLE) / count(*), 6) AS boiler_ratio
    FROM bg b LEFT JOIN boiler bl ON b.bg = bl.bg
    GROUP BY b.doc_id
    """,
    doc="Boilerplate detection: bigrams that occur in >=10% of all "
    "documents are corpus boilerplate (templates, headers, navigation "
    "chrome); each document is scored by the fraction of its distinct "
    "bigrams that are boilerplate. The document-frequency table is "
    "computed once (shuffle on the bigram key — bounded by vocabulary^2, "
    "not corpus size) and the qualifying set is broadcast back, so the "
    "corpus itself is never re-shuffled; the 10% threshold is relative "
    "to corpus size (scale-invariant).",
)
def text_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # token array materialized (see text_bigram_lm_score) + the shared
    # _adjacent_bigrams helper; per-doc distinct bigrams
    t = d.select("doc_id", tokens(F.col("text")).alias("_toks"))
    ex = t.select(
        "doc_id",
        F.explode(F.array_distinct(_adjacent_bigrams(F.col("_toks")))).alias("bg"),
    )
    dfc = ex.groupBy("bg").agg(F.countDistinct("doc_id").alias("df"))
    total = d.agg(F.count(F.lit(1)).alias("n_docs"))
    boiler = (
        dfc.crossJoin(F.broadcast(total))
        .filter(F.col("df") * 10 >= F.col("n_docs"))
        .select("bg")
        .withColumn("is_b", F.lit(1))
    )
    marked = ex.join(F.broadcast(boiler), "bg", "left")
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.count("is_b").alias("n_boiler"),
        F.round(F.count("is_b").cast("double") / F.count(F.lit(1)), 6).alias(
            "boiler_ratio"
        ),
    )


# Sliding-window chunking (context-window prep): CHUNK tokens per piece,
# STRIDE-token hop -> 50% overlap keeps boundary context in both pieces.
CHUNK_TOKENS, CHUNK_STRIDE = 40, 20


@query(
    "text_chunk_sliding",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents
    ), s AS (
      SELECT doc_id, toks, unnest(range(0, len(toks), {CHUNK_STRIDE})) AS s
      FROM t
    )
    SELECT doc_id,
           s // {CHUNK_STRIDE}                                   AS chunk_idx,
           CAST(least({CHUNK_TOKENS}, len(toks) - s) AS INTEGER) AS chunk_len,
           md5(array_to_string(toks[s+1:s+{CHUNK_TOKENS}], ' ')) AS chunk_md5
    FROM s
    """,
    doc=f"Sliding-window chunking: each document becomes overlapping "
    f"{CHUNK_TOKENS}-token chunks on a {CHUNK_STRIDE}-token stride (the "
    "standard context-window prep for embedding / pretraining loaders). "
    "Pure generate-and-explode — a map-side Generate with no shuffle at "
    "all; output rows carry a content hash so downstream exact-dedup of "
    "chunks composes directly.",
)
def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n = F.size(toks)
    starts = F.sequence(F.lit(0), n - 1, F.lit(CHUNK_STRIDE))
    ex = d.select("doc_id", toks.alias("toks"), n.alias("n"), F.explode(starts).alias("s"))
    return ex.select(
        "doc_id",
        F.expr(f"s DIV {CHUNK_STRIDE}").alias("chunk_idx"),
        F.least(F.lit(CHUNK_TOKENS), F.col("n") - F.col("s")).alias("chunk_len"),
        F.md5(F.array_join(F.slice(F.col("toks"), F.col("s") + 1, CHUNK_TOKENS), " ")).alias(
            "chunk_md5"
        ),
    )


@query(
    "text_repetition_gopher",
    oracle="""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents
    ), m AS (
      SELECT doc_id,
             len(toks) AS n_tok,
             list_max(list_transform(list_distinct(toks),
                      t -> len(list_filter(toks, x -> x = t)))) AS top_cnt,
             len(list_distinct(list_transform(
               range(1, len(toks)),
               i -> array_to_string(toks[i:i+1], ' ')))) AS dist_bg
      FROM t
    )
    SELECT doc_id,
           CAST(n_tok AS INTEGER) AS n_tok,
           round(CAST(top_cnt AS DOUBLE) / n_tok, 6) AS top_token_share,
           round(1.0 - CAST(dist_bg AS DOUBLE) / (n_tok - 1), 6) AS dup_bigram_frac,
           (CAST(top_cnt AS DOUBLE) / n_tok > 0.1
            OR 1.0 - CAST(dist_bg AS DOUBLE) / (n_tok - 1) > 0.3) AS is_repetitive
    FROM m
    """,
    doc="Gopher-style repetition filters: top-token share (a document "
    "dominated by one token) and duplicate-bigram fraction (copy-paste "
    "loops) — the quality signals used to drop degenerate documents "
    "before training. Computed entirely with array higher-order "
    "functions inside one map stage: zero shuffles, linear scan, "
    "per-document cost bounded by len x distinct (fine for web-scale "
    "documents; an explode+groupBy twin is the fallback for books).",
)
def text_repetition_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    # materialize the token array in its own projection: the top_cnt
    # lambdas below reference it from their bodies, and a captured
    # computation subtree is re-evaluated per element by interpreted HOF
    # eval (O(distinct x tokens x tokenize) per doc here) — a captured
    # ATTRIBUTE is a row-slot read. CollapseProject keeps the projection:
    # the alias is multiply-referenced and split() is non-cheap.
    t = d.select("doc_id", tokens(F.col("text")).alias("_toks"))
    toks = F.col("_toks")
    n = F.size(toks)
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda tk: F.size(F.filter(toks, lambda x: x == tk)),
        )
    )
    # shared adjacent-bigram helper (n>=2 guard included; for n==1 the
    # unguarded slice produced the same empty array, so this is
    # value-identical)
    dist_bg = F.size(F.array_distinct(_adjacent_bigrams(toks)))
    top_share = top_cnt.cast("double") / n
    dup_frac = F.lit(1.0) - dist_bg.cast("double") / (n - 1)
    return t.select(
        "doc_id",
        n.alias("n_tok"),
        F.round(top_share, 6).alias("top_token_share"),
        F.round(dup_frac, 6).alias("dup_bigram_frac"),
        ((top_share > 0.1) | (dup_frac > 0.3)).alias("is_repetitive"),
    )


# Cross-document span dedup: non-overlapping windows this size dedupe at
# the chunk level (the C4/RefinedWeb "remove duplicated spans" pass —
# finer-grained than whole-doc near-dup, catches shared boilerplate
# paragraphs inside otherwise-unique documents).
SPAN_TOKENS = 20


@query(
    "text_span_dedup",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents
    ), chunks AS (
      SELECT doc_id,
             md5(array_to_string(toks[s+1:s+{SPAN_TOKENS}], ' ')) AS h
      FROM (SELECT doc_id, toks,
                   unnest(range(0, len(toks), {SPAN_TOKENS})) AS s
            FROM t)
    ), df AS (
      SELECT h, count(DISTINCT doc_id) AS n_docs
      FROM chunks GROUP BY h
    )
    SELECT c.doc_id,
           count(*)                                        AS n_spans,
           CAST(sum(CASE WHEN d.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
                                                           AS n_shared_spans,
           round(CAST(sum(CASE WHEN d.n_docs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6)                            AS shared_frac
    FROM chunks c JOIN df d USING (h)
    GROUP BY c.doc_id
    """,
    doc=f"Cross-document span dedup (C4/RefinedWeb-style): documents are "
    f"cut into NON-overlapping {SPAN_TOKENS}-token spans, each hashed; a "
    "span appearing in >1 document is shared boilerplate. Emits per-doc "
    "span counts and the shared fraction — the signal both for dropping "
    "duplicated paragraphs and for flagging template-heavy documents "
    "that whole-doc near-dup misses. Plan: map-side chunk+hash Generate, "
    "ONE shuffle for the span document-frequency aggregate, one "
    "hash-equi-join back (no broadcast of the unbounded span "
    "vocabulary — same scale rule as the MinHash df cap), then the "
    "per-doc rollup reuses the doc_id partitioning.",
)
def text_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").repartition(
        scan_parallelism(spark, sf_dir, "documents"), "doc_id"
    )
    toks = F.split(F.trim(F.col("text")), r"\s+")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(F.col("toks")) - 1, F.lit(0)),
        F.lit(SPAN_TOKENS),
    )
    chunks = (
        d.select("doc_id", toks.alias("toks"))
        .select("doc_id", "toks", F.explode(starts).alias("s"))
        .select(
            "doc_id",
            F.md5(F.array_join(F.slice(F.col("toks"), F.col("s") + 1, SPAN_TOKENS), " ")).alias("h"),
        )
        .persist()
    )
    df_tbl = chunks.groupBy("h").agg(F.countDistinct("doc_id").alias("n_docs"))
    shared = F.when(F.col("n_docs") > 1, 1).otherwise(0)
    return (
        chunks.join(df_tbl, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(shared).cast("bigint").alias("n_shared_spans"),
            F.round(F.sum(shared).cast("double") / F.count(F.lit(1)), 6).alias(
                "shared_frac"
            ),
        )
    )


@query(
    "text_span_collapse",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
      FROM documents
    ), chunks AS (
      SELECT doc_id, s,
             array_to_string(toks[s+1:s+{SPAN_TOKENS}], ' ') AS span,
             md5(array_to_string(toks[s+1:s+{SPAN_TOKENS}], ' ')) AS h
      FROM (SELECT doc_id, toks,
                   unnest(range(0, len(toks), {SPAN_TOKENS})) AS s
            FROM t)
    ), ranked AS (
      SELECT doc_id, s, span,
             row_number() OVER (PARTITION BY h ORDER BY doc_id, s) AS rn
      FROM chunks
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT)                            AS n_spans,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
                                                               AS n_kept,
           string_agg(CASE WHEN rn = 1 THEN span END, ' ' ORDER BY s)
                                                               AS cleaned_text
    FROM ranked
    GROUP BY doc_id
    """,
    doc=f"Exact-substring dedup with COLLAPSE (the Lee et al. 2022 "
    '"Deduplicating Training Data Makes Language Models Better" shape, '
    "suffix-array pass re-expressed over fixed windows): where "
    "text_span_dedup only FLAGS shared spans, this emits the cleaned "
    f"corpus — every {SPAN_TOKENS}-token span keeps exactly its globally "
    "FIRST occurrence (ordered by doc_id, then start offset; later "
    "occurrences — across documents or repeated within one — are "
    "dropped) and each document's surviving spans are reassembled in "
    "offset order (whitespace-normalized; a fully-duplicated document "
    "collapses to NULL). Plan (skew-proof per the round-8 review — a "
    "heavily replicated span must NOT funnel its raw occurrence count "
    "into one task): map-side chunk+hash Generate, a partial-aggregating "
    "per-(h, doc_id) rollup (min offset + copy count; hot hashes "
    "condense map-side), then the global first owner per hash is a "
    "MIN(struct(doc_id, s)) hash aggregate — partial aggregation again, "
    "never a per-hash sort — joined back on h (AQE skew-split covers the "
    "residual hot-key join), then the per-doc reassembly aggregate. No "
    "span-vocabulary broadcast, no all-pairs stage, no unbounded window "
    "partition — the 100 TB-safe shape.",
)
def text_span_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").repartition(
        scan_parallelism(spark, sf_dir, "documents"), "doc_id"
    )
    toks = F.split(F.trim(F.col("text")), r"\s+")
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(F.col("toks")) - 1, F.lit(0)),
        F.lit(SPAN_TOKENS),
    )
    span = F.array_join(
        F.slice(F.col("toks"), F.col("s") + 1, SPAN_TOKENS), " "
    )
    chunks = (
        d.select("doc_id", toks.alias("toks"))
        .select("doc_id", "toks", F.explode(starts).alias("s"))
        .select("doc_id", "s", span.alias("span"), F.md5(span).alias("h"))
    )
    # per-(h, doc_id) rollup: only the doc's FIRST copy of a span can be
    # the global first owner, so later same-doc copies reduce to a count
    # here (partial aggregation bounds the hot-hash task input); span is
    # constant within an h group, min() just picks it deterministically
    per_doc = chunks.groupBy("h", "doc_id").agg(
        F.min("s").alias("s"),
        F.count(F.lit(1)).alias("copies"),
        F.min("span").alias("span"),
    )
    # global first owner per hash as a hash aggregate (struct min orders
    # by doc_id, then s — exactly the old window's ORDER BY) instead of
    # a row_number window whose per-hash partition was unbounded
    winner = per_doc.groupBy("h").agg(
        F.min(F.struct("doc_id", "s")).alias("w")
    )
    ranked = per_doc.join(winner, "h").withColumn(
        "is_first", F.col("doc_id") == F.col("w.doc_id")
    )
    kept = F.when(F.col("is_first"), 1).otherwise(0)
    kept_span = F.when(
        F.col("is_first"), F.struct(F.col("s"), F.col("span"))
    )
    agg = ranked.groupBy("doc_id").agg(
        F.sum("copies").cast("bigint").alias("n_spans"),
        F.sum(kept).cast("bigint").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_span)), lambda x: x["span"]
            ),
            " ",
        ).alias("joined"),
    )
    return agg.select(
        "doc_id",
        "n_spans",
        "n_kept",
        F.when(F.col("n_kept") > 0, F.col("joined")).alias("cleaned_text"),
    )


@query(
    "text_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id, length(text) AS n,
             unnest(list_transform(range(1, length(text) + 1),
                    i -> substr(text, i, 1))) AS ch
      FROM documents
    ), freq AS (
      SELECT doc_id, n, ch, count(*) AS c FROM chars GROUP BY 1, 2, 3
    )
    SELECT doc_id, CAST(n AS INT) AS n_chars_measured,
           round(-sum((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)), 6)
             AS char_entropy
    FROM freq
    GROUP BY doc_id, n
    """,
    doc="Per-document character-level Shannon entropy (nats): low values "
    "flag repetitive/gibberish text, high values flag noise — a standard "
    "cheap quality signal next to the Gopher repetition ratios. One "
    "explode + two-phase hash aggregate; the per-doc alphabet is tiny so "
    "the shuffle carries ~|alphabet| rows per doc.",
)
def text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").repartition(
        scan_parallelism(spark, sf_dir, "documents"), "doc_id"
    )
    chars = d.select(
        "doc_id",
        F.length("text").alias("n"),
        F.explode(
            F.expr("transform(sequence(1, length(text)), i -> substr(text, i, 1))")
        ).alias("ch"),
    )
    freq = chars.groupBy("doc_id", "n", "ch").agg(F.count(F.lit(1)).alias("c"))
    p = F.col("c").cast("double") / F.col("n")
    return freq.groupBy("doc_id", "n").agg(
        F.round(-F.sum(p * F.log(p)), 6).alias("char_entropy")
    ).select("doc_id", F.col("n").cast("int").alias("n_chars_measured"), "char_entropy")


INDEX_MIN_DF = 5  # terms must appear in >= this many docs to be indexed


@query(
    "text_inverted_index",
    oracle=f"""
    WITH postings AS (
      SELECT t.term, d.doc_id, count(*) AS tf
      FROM documents d,
           unnest(regexp_split_to_array(trim(lower(d.text)), '\\s+')) AS t(term)
      GROUP BY t.term, d.doc_id
    ), stats AS (
      SELECT term,
             CAST(count(*) AS BIGINT)  AS df,
             CAST(sum(tf) AS BIGINT)   AS total_tf
      FROM postings GROUP BY term
      HAVING count(*) >= {INDEX_MIN_DF}
    ), ranked AS (
      SELECT p.term, p.doc_id, p.tf,
             row_number() OVER (PARTITION BY p.term
                                ORDER BY p.tf DESC, p.doc_id) AS rk
      FROM postings p JOIN stats s ON p.term = s.term
    )
    SELECT s.term, s.df, s.total_tf,
           string_agg(CAST(r.doc_id AS VARCHAR), ','
                      ORDER BY r.rk) AS top_docs_csv
    FROM stats s JOIN ranked r ON s.term = r.term AND r.rk <= 3
    GROUP BY s.term, s.df, s.total_tf
    """,
    doc="Inverted-index build (the search-engine primitive over a text "
    "corpus): term -> document frequency, total term frequency, and the "
    "top-3 posting heads by tf. Scale: tokens aggregate to (term, doc) "
    "partials map-side before the term shuffle, the df >= MIN_DF filter "
    "drops the singleton long tail before the ranking window, and each "
    "term's posting rank is a bounded per-term sort — no global sort and "
    "no driver-side index assembly. The posting heads are emitted as a "
    "CSV string so the result stays scalar-typed.",
)
def text_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    postings = (
        d.select(
            "doc_id",
            F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("term"),
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    stats = (
        postings.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("total_tf"))
        .filter(F.col("df") >= INDEX_MIN_DF)
    )
    wr = W.partitionBy("term").orderBy(F.desc("tf"), "doc_id")
    ranked = (
        postings.join(stats.select("term"), "term")
        .select("term", "doc_id", "tf", F.row_number().over(wr).alias("rk"))
        .filter(F.col("rk") <= 3)
    )
    heads = ranked.groupBy("term").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("rk"), F.col("doc_id")))
                ),
                lambda s: s.getField("doc_id").cast("string"),
            ),
            ",",
        ).alias("top_docs_csv")
    )
    return stats.join(heads, "term").select("term", "df", "total_tf", "top_docs_csv")


_RAKE_STOPS = ("the", "a", "of", "and", "in", "to", "is")
_RAKE_STOPS_SQL = ", ".join(f"'{w}'" for w in _RAKE_STOPS)
RAKE_TOP = 15


@query(
    "text_rake_keyphrases",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS word,
             generate_subscripts(
               regexp_split_to_array(trim(lower(text)), '\\s+'), 1) AS pos
      FROM documents
    ), seg AS (
      SELECT doc_id, word, pos,
             sum(CASE WHEN word IN ({_RAKE_STOPS_SQL}) THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS phrase_id,
             word IN ({_RAKE_STOPS_SQL}) AS is_stop
      FROM toks
    ), members AS (
      SELECT doc_id, phrase_id, word, pos FROM seg WHERE NOT is_stop
    ), phrases AS (
      SELECT doc_id, phrase_id,
             string_agg(word, ' ' ORDER BY pos) AS phrase,
             count(*) AS plen
      FROM members GROUP BY doc_id, phrase_id
    ), word_stats AS (
      SELECT m.word,
             count(*) AS freq,
             sum(p.plen) AS degree
      FROM members m
      JOIN phrases p ON p.doc_id = m.doc_id AND p.phrase_id = m.phrase_id
      GROUP BY m.word
    ), phrase_scores AS (
      SELECT p.phrase,
             round(sum(CAST(w.degree AS DOUBLE) / w.freq), 6) AS score
      FROM phrases p
      JOIN members m ON m.doc_id = p.doc_id AND m.phrase_id = p.phrase_id
      JOIN word_stats w ON w.word = m.word
      GROUP BY p.doc_id, p.phrase_id, p.phrase
    )
    SELECT phrase, round(max(score), 6) AS score,
           CAST(count(*) AS BIGINT) AS n_occurrences
    FROM phrase_scores
    GROUP BY phrase
    ORDER BY score DESC, phrase
    LIMIT {RAKE_TOP}
    """,
    doc="RAKE keyphrase extraction (Rose et al. 2010, Automatic Keyword "
    "Extraction from Individual Documents): stopwords segment each doc "
    "into candidate phrases; word score = degree/frequency where degree "
    "sums the lengths of phrases containing the word; phrase score sums "
    "its word scores; corpus top-15 by max score. All relational: one "
    "running-count window per doc for segmentation, two keyed aggregates "
    "for word stats (the word table is vocabulary-sized, partial-agg "
    "both phases), a bounded TakeOrderedAndProject for the final top-k.",
)
def text_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias(
            "pos0", "word"
        ),
    ).select("doc_id", "word", (F.col("pos0") + 1).alias("pos"))
    is_stop = F.col("word").isin(*_RAKE_STOPS)
    wseg = W.partitionBy("doc_id").orderBy("pos")
    seg = toks.select(
        "doc_id",
        "word",
        "pos",
        F.sum(F.when(is_stop, 1).otherwise(0)).over(wseg).alias("phrase_id"),
        is_stop.alias("is_stop"),
    )
    members = seg.filter(~F.col("is_stop")).select("doc_id", "phrase_id", "word", "pos")
    phrases = members.groupBy("doc_id", "phrase_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "word"))),
                lambda s: s.getField("word"),
            ),
            " ",
        ).alias("phrase"),
        F.count(F.lit(1)).alias("plen"),
    )
    word_stats = (
        members.join(phrases, ["doc_id", "phrase_id"])
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"), F.sum("plen").alias("degree"))
    )
    phrase_scores = (
        phrases.join(members, ["doc_id", "phrase_id"])
        .join(word_stats, "word")
        .groupBy("doc_id", "phrase_id", "phrase")
        .agg(
            F.round(
                F.sum(F.col("degree").cast("double") / F.col("freq")), 6
            ).alias("score")
        )
    )
    return (
        phrase_scores.groupBy("phrase")
        .agg(
            F.round(F.max("score"), 6).alias("score"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .orderBy(F.desc("score"), "phrase")
        .limit(RAKE_TOP)
    )


@query(
    "text_naive_bayes_langid",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang AS true_lang, tok
      FROM (SELECT doc_id, lang,
                   unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
            FROM documents)
      WHERE tok <> ''
    ), vocab AS (
      SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v FROM toks
    ), docs AS (
      SELECT doc_id, lang AS true_lang FROM documents
    ), langdim AS (
      SELECT d.lang AS cand_lang,
             ln(CAST(d.n_docs AS DOUBLE) / (SELECT sum(n_docs) FROM
               (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang) t))
               AS log_prior,
             CAST(coalesce(tk.n_toks, 0) AS DOUBLE) + (SELECT v FROM vocab) AS denom
      FROM (SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang) d
      LEFT JOIN (SELECT true_lang, count(*) AS n_toks FROM toks GROUP BY true_lang) tk
        ON tk.true_lang = d.lang
    ), model AS (
      SELECT true_lang AS cand_lang, tok, count(*) AS c FROM toks GROUP BY 1, 2
    ), tok_scores AS (
      SELECT t.doc_id, l.cand_lang,
             sum(ln((CAST(coalesce(m.c, 0) AS DOUBLE) + 1) / l.denom)) AS s
      FROM toks t
      CROSS JOIN langdim l
      LEFT JOIN model m ON m.cand_lang = l.cand_lang AND m.tok = t.tok
      GROUP BY t.doc_id, l.cand_lang
    ), scored AS (
      SELECT d.doc_id, d.true_lang, l.cand_lang,
             round(l.log_prior + coalesce(ts.s, 0), 6) AS score
      FROM docs d
      CROSS JOIN langdim l
      LEFT JOIN tok_scores ts
        ON ts.doc_id = d.doc_id AND ts.cand_lang = l.cand_lang
    ), ranked AS (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, cand_lang) AS rk
      FROM scored
    )
    SELECT true_lang, cand_lang AS predicted_lang,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM ranked WHERE rk = 1
    GROUP BY true_lang, cand_lang
    """,
    doc="Multinomial Naive Bayes language identification, trained and "
    "evaluated on the corpus itself (self-consistency confusion matrix): "
    "the model is the per-(lang, token) occurrence count with add-one "
    "smoothing over the corpus vocabulary, priors are document "
    "frequencies, and each document's posterior is the token-stream "
    "log-likelihood sum per candidate language. Spark-first shape: the "
    "language dimension (5 rows of prior + smoothing denominator) is a "
    "broadcast, the (lang, token) model joins the token stream on its "
    "natural composite key — a shuffle hash join that never broadcasts "
    "the unbounded vocabulary — and the per-(doc, lang) score is one "
    "partial-aggregated sum. Scores are rounded to 1e-6 BEFORE the "
    "argmax ranking with a language tie-break, so summation-order "
    "noise (~1e-13) cannot flip the prediction across engines. "
    "Complements text_langid (closed-vocabulary n-gram heuristic) with "
    "the corpus-trained generative classifier.",
)
def text_naive_bayes_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id",
            F.col("lang").alias("true_lang"),
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .persist()
    )
    vocab = toks.agg(F.countDistinct("tok").cast("double").alias("v"))
    lang_docs = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    total_docs = lang_docs.agg(F.sum("n_docs").alias("d_total"))
    lang_toks = toks.groupBy("true_lang").agg(F.count(F.lit(1)).alias("n_toks"))
    langdim = (
        lang_docs.join(lang_toks, lang_docs["lang"] == lang_toks["true_lang"], "left")
        .crossJoin(F.broadcast(total_docs))
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col("lang").alias("cand_lang"),
            F.log(F.col("n_docs").cast("double") / F.col("d_total")).alias(
                "log_prior"
            ),
            (
                F.coalesce(F.col("n_toks"), F.lit(0)).cast("double") + F.col("v")
            ).alias("denom"),
        )
    )
    model = toks.groupBy(
        F.col("true_lang").alias("cand_lang"), "tok"
    ).agg(F.count(F.lit(1)).alias("c"))
    tok_scores = (
        toks.crossJoin(F.broadcast(langdim))
        .join(model, ["cand_lang", "tok"], "left")
        .groupBy("doc_id", "cand_lang")
        .agg(
            F.sum(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)).cast("double") + 1)
                    / F.col("denom")
                )
            ).alias("s")
        )
    )
    scored = (
        d.select("doc_id", F.col("lang").alias("true_lang"))
        .crossJoin(F.broadcast(langdim))
        .join(tok_scores, ["doc_id", "cand_lang"], "left")
        .select(
            "doc_id",
            "true_lang",
            "cand_lang",
            F.round(
                F.col("log_prior") + F.coalesce(F.col("s"), F.lit(0.0)), 6
            ).alias("score"),
        )
    )
    rk = W.partitionBy("doc_id").orderBy(F.col("score").desc(), "cand_lang")
    return (
        scored.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") == 1)
        .groupBy("true_lang", F.col("cand_lang").alias("predicted_lang"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "text_zipf_law_fit",
    oracle="""
    WITH toks AS (
      SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ), counted AS (
      SELECT tok, count(*) AS cnt FROM toks WHERE tok <> '' GROUP BY tok
    ), ranked AS (
      SELECT cnt, row_number() OVER (ORDER BY cnt DESC, tok) AS rk
      FROM counted
    ), pts AS (
      SELECT ln(CAST(rk AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y
      FROM ranked
    ), s AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             sum(x) AS sx, sum(y) AS sy,
             sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
      FROM pts
    )
    SELECT CAST(n AS BIGINT) AS n_terms,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
           round(sy / n - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * (sx / n), 6)
             AS intercept,
           round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r_squared
    FROM s
    """,
    doc="Zipf's-law fit over the corpus vocabulary: token frequencies "
    "ranked (count DESC, token tie-break), then an ordinary-least-squares "
    "line through the (ln rank, ln frequency) cloud — the slope is the "
    "Zipf exponent (~-1 for natural language; a strong deviation flags "
    "synthetic or templated corpora), with R² as fit quality. The corpus "
    "collapses to its vocabulary in one map-side-combined hash "
    "aggregate; the global rank runs over that aggregated, "
    "domain-bounded relation (same shape as the BPE trainer's word "
    "histogram rank), and the regression is a single 6-sum aggregate "
    "with the closed-form solution evaluated on ONE row. Slope, "
    "intercept, and R² derive from identical IEEE expressions on both "
    "engines; summation-order noise is absorbed by round(..., 6).",
)
def text_zipf_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    counted = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    rk = W.orderBy(F.desc("cnt"), "tok")
    pts = counted.select(
        F.log(F.row_number().over(rk).cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return s.select(
        n.cast("bigint").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(sy / n - slope * (sx / n), 6).alias("intercept"),
        F.round(
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
            6,
        ).alias("r_squared"),
    )


@query(
    "text_lexical_diversity",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ), tf AS (
      SELECT doc_id, tok, count(*) AS c
      FROM toks WHERE tok <> '' GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_types,
           round(CAST(count(*) AS DOUBLE) / sum(c), 6) AS ttr,
           CAST(count(*) FILTER (WHERE c = 1) AS BIGINT) AS n_hapax,
           round(CAST(count(*) FILTER (WHERE c = 1) AS DOUBLE) / count(*), 6)
             AS hapax_share
    FROM tf
    GROUP BY doc_id
    """,
    doc="Per-document lexical-diversity metrics: type-token ratio "
    "(distinct tokens / total tokens — low TTR flags repetitive or "
    "templated text) and hapax-legomenon share (fraction of the "
    "document's vocabulary appearing exactly once — low hapax share "
    "flags looping generation). One (doc_id, token) count aggregate "
    "partitioned by the high-cardinality doc_id, then a per-doc "
    "conditional-count reduction — two map-side-combinable shuffles, "
    "nothing corpus-global. Ratios are integer/integer divisions, "
    "bit-identical across engines before the cosmetic round.",
)
def text_lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    return tf.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.round(F.count(F.lit(1)).cast("double") / F.sum("c"), 6).alias("ttr"),
        F.count(F.when(F.col("c") == 1, 1)).alias("n_hapax"),
        F.round(
            F.count(F.when(F.col("c") == 1, 1)).cast("double") / F.count(F.lit(1)), 6
        ).alias("hapax_share"),
    )


BURROWS_TOP = 30


@query(
    "text_burrows_delta",
    oracle=f"""
    WITH toks AS (
      SELECT source, unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS tok
      FROM documents
    ), st AS (
      SELECT source, tok, CAST(count(*) AS DOUBLE) AS c
      FROM toks WHERE tok <> '' GROUP BY 1, 2
    ), totals AS (
      SELECT source, sum(c) AS tot FROM st GROUP BY 1
    ), top AS (
      SELECT tok FROM (
        SELECT tok, sum(c) AS corpus_c,
               row_number() OVER (ORDER BY sum(c) DESC, tok) AS rk
        FROM st GROUP BY tok
      ) WHERE rk <= {BURROWS_TOP}
    ), freq AS (
      SELECT t.source, p.tok, coalesce(st.c, 0) / t.tot AS f
      FROM totals t CROSS JOIN top p
      LEFT JOIN st ON st.source = t.source AND st.tok = p.tok
    ), stats AS (
      SELECT tok, CAST(count(*) AS DOUBLE) AS n,
             sum(f) AS sf, sum(f * f) AS sff
      FROM freq GROUP BY 1
    ), z AS (
      SELECT f.source, f.tok,
             (f.f - s.sf / s.n) / sqrt(s.sff / s.n - (s.sf / s.n) * (s.sf / s.n)) AS z
      FROM freq f JOIN stats s ON s.tok = f.tok
      WHERE (s.sff / s.n - (s.sf / s.n) * (s.sf / s.n)) > 0
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS n_terms,
           round(avg(abs(a.z - b.z)), 6) AS delta
    FROM z a JOIN z b ON a.tok = b.tok AND a.source < b.source
    GROUP BY 1, 2
    """,
    doc=f"Burrows' Delta stylometric distance between every pair of "
    f"document sources: relative frequencies of the corpus's top-"
    f"{BURROWS_TOP} tokens per source, z-scored per token across "
    "sources (population sigma via identical closed-form IEEE "
    "expressions), then Delta(a, b) = mean |z_a - z_b| — the standard "
    "authorship/provenance attribution measure, here a duplicate-"
    "pipeline screen (near-zero Delta = two sources emitting the same "
    "template). Everything after the (source, token) count shuffle is "
    "domain-bounded: the top-token rank runs over the aggregated "
    "vocabulary, frequencies/z-scores live on a |sources| x "
    f"{BURROWS_TOP} grid, and the pairwise join is over that tiny "
    "grid keyed by token. Constant-frequency tokens are excluded by "
    "the variance guard on BOTH sides.",
)
def text_burrows_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    toks = d.select(
        "source",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    st = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).cast("double").alias("c"))
    st = st.persist()  # feeds totals, the top-token rank, and the freq join
    totals = st.groupBy("source").agg(F.sum("c").alias("tot"))
    rk = W.orderBy(F.desc("corpus_c"), "tok")
    top = (
        st.groupBy("tok")
        .agg(F.sum("c").alias("corpus_c"))
        .withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= BURROWS_TOP)
        .select("tok")
    )
    freq = (
        totals.crossJoin(F.broadcast(top))
        .join(st, ["source", "tok"], "left")
        .select(
            "source",
            "tok",
            (F.coalesce(F.col("c"), F.lit(0.0)) / F.col("tot")).alias("f"),
        )
    )
    stats = freq.groupBy("tok").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("f").alias("sf"),
        F.sum(F.col("f") * F.col("f")).alias("sff"),
    )
    n, sf, sff = F.col("n"), F.col("sf"), F.col("sff")
    var = sff / n - (sf / n) * (sf / n)
    z = (
        freq.join(F.broadcast(stats.filter(var > 0)), "tok")
        .select(
            "source",
            "tok",
            ((F.col("f") - sf / n) / F.sqrt(sff / n - (sf / n) * (sf / n))).alias("z"),
        )
    )
    a = z.select(F.col("source").alias("source_a"), "tok", F.col("z").alias("za"))
    b = z.select(F.col("source").alias("source_b"), F.col("tok").alias("tok_b"), F.col("z").alias("zb"))
    return (
        a.join(
            b,
            (F.col("tok") == F.col("tok_b")) & (F.col("source_a") < F.col("source_b")),
        )
        .groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.avg(F.abs(F.col("za") - F.col("zb"))), 6).alias("delta"),
        )
    )


@query(
    "text_readability_flesch",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE) AS words,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS DOUBLE)
               AS sentences,
             CAST(greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
               AS DOUBLE) AS syllables
      FROM documents
    )
    SELECT doc_id,
           CAST(words AS BIGINT) AS n_words,
           CAST(sentences AS BIGINT) AS n_sentences,
           CAST(syllables AS BIGINT) AS n_syllables,
           round(206.835 - 1.015 * (words / sentences)
                 - 84.6 * (syllables / words), 6) AS flesch_score
    FROM m
    """,
    doc="Flesch reading-ease per document — the classic readability "
    "filter (very negative = run-on machine-generated text; the "
    "syllable count is the standard vowel-group heuristic "
    "[aeiouy]+, sentences are terminal-punctuation runs, both "
    "clamped to >= 1 so the score is total). Pure map-side regexp "
    "counting — no shuffle at all, same zero-exchange shape as "
    "text_quality_score — and the score is a closed form over three "
    "integers, bit-identical across engines before the cosmetic "
    "round. Complements the stopword/length quality score with the "
    "sentence-structure signal.",
)
def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    words = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("double")
    sentences = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), 0)), F.lit(1)
    ).cast("double")
    syllables = F.greatest(
        F.size(F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[aeiouy]+"), 0)),
        F.lit(1),
    ).cast("double")
    return d.select(
        "doc_id",
        words.cast("bigint").alias("n_words"),
        sentences.cast("bigint").alias("n_sentences"),
        syllables.cast("bigint").alias("n_syllables"),
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * (words / sentences)
            - F.lit(84.6) * (syllables / words),
            6,
        ).alias("flesch_score"),
    )
