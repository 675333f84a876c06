"""Independent reference model for `text_span_dedup`.

The query and oracle share the chunk/hash spec; the model re-derives
the per-doc shared-span report from first principles — Python
tokenization, non-overlapping SPAN_TOKENS windows (last span ragged),
span STRINGS as identity (no hashing at all) and a plain
which-docs-contain-this-span index — pinning the chunk boundary
arithmetic (starts at 0, SPAN, 2·SPAN …; a doc shorter than one span
still yields exactly one span) and the >1-distinct-docs sharing rule."""

from __future__ import annotations

import re


def test_span_dedup_matches_string_index_model(spark, sf_dir):
    from datafusion_nats_spark.extensions.text import SPAN_TOKENS, text_span_dedup
    from datafusion_nats_spark.tables import load

    rows = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    spans_by_doc: dict = {}
    doc_sets: dict = {}
    for r in rows:
        toks = re.split(r"\s+", r.text.strip())
        spans = [
            " ".join(toks[s : s + SPAN_TOKENS])
            for s in range(0, max(len(toks), 1), SPAN_TOKENS)
        ]
        spans_by_doc[r.doc_id] = spans
        for sp in spans:
            doc_sets.setdefault(sp, set()).add(r.doc_id)

    got = {
        r.doc_id: (r.n_spans, r.n_shared_spans, r.shared_frac)
        for r in text_span_dedup(spark, sf_dir).collect()
    }
    assert set(got) == set(spans_by_doc)
    for doc, spans in spans_by_doc.items():
        n_spans, n_shared, frac = got[doc]
        exp_shared = sum(1 for sp in spans if len(doc_sets[sp]) > 1)
        assert n_spans == len(spans), (doc, n_spans, len(spans))
        assert n_shared == exp_shared, (doc, n_shared, exp_shared)
        assert abs(frac - exp_shared / len(spans)) <= 5.1e-7, (doc, frac)
