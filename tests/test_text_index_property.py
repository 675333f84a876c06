"""Differential fuzz for the persisted text index: on hypothesis-
generated corpora (short docs, repeated tokens, degenerate vocabularies,
absent workload terms), a freshly built index's probes must reproduce
the in-plan operators EXACTLY — same rows, same 6-decimal scores, same
phrase positions. The registry twins pin one fixture corpus; this pins
the equivalence CONTRACT itself, including the build's tokenize/
positions/df/dl derivation and the probe's bucket resolution, across
adversarial shapes the fixture never hits.

Each example pays a real build (two parquet writes), so the example
budget is deliberately small; scale it with SPARK_GRAFT_FUZZ_EXAMPLES.
"""

from __future__ import annotations

import os
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datafusion_nats_spark.extensions.retrieval import (
    bm25_scores,
    phrase_match,
)
from datafusion_nats_spark.extensions.text_index import (
    bm25_index_build,
    bm25_index_probe,
    phrase_index_probe,
)

_SETTINGS = settings(
    max_examples=max(
        1, int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "50")) // 10
    ),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

VOCAB = ["a", "b", "c", "d", "e"]

corpus_st = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=1, max_size=10),
    min_size=1,
    max_size=8,
)
terms_st = st.lists(st.sampled_from(VOCAB), min_size=1, max_size=3, unique=True)
phrases_st = st.lists(
    st.tuples(st.sampled_from(VOCAB), st.sampled_from(VOCAB)),
    min_size=1,
    max_size=3,
    unique=True,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _build(spark, docs):
    """Materialize a random corpus as an sf_dir shape and build the
    index into a fresh temp root (no cross-example cache reuse)."""
    root = tempfile.mkdtemp(prefix="ti_fuzz_")
    ddf = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)],
        "doc_id long, text string",
    )
    ddf.write.parquet(os.path.join(root, "documents.parquet"))
    return ddf, bm25_index_build(spark, root, os.path.join(root, "idx"))


@given(docs=corpus_st, terms=terms_st)
@_SETTINGS
def test_index_probe_equals_in_plan_bm25_on_random_corpora(spark, docs, terms):
    ddf, index_dir = _build(spark, docs)
    tdf = spark.createDataFrame(
        [(0, t) for t in terms], "query_id int, term string"
    )
    assert _rows(bm25_index_probe(spark, index_dir, tdf)) == _rows(
        bm25_scores(ddf, tdf)
    )


@given(docs=corpus_st, phrases=phrases_st)
@_SETTINGS
def test_phrase_probe_equals_in_plan_scan_on_random_corpora(
    spark, docs, phrases
):
    ddf, index_dir = _build(spark, docs)
    pdf = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(phrases)],
        "query_id int, term_a string, term_b string",
    )
    assert _rows(phrase_index_probe(spark, index_dir, pdf)) == _rows(
        phrase_match(ddf, pdf)
    )
