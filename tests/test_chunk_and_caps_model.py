"""Independent reference models for `text_chunk_sliding` and
`curation_domain_caps` — both share their window/rank spec with their
oracles, so the boundary arithmetic is re-derived here from first
principles in plain Python.

Sliding chunks: starts at 0, STRIDE, 2·STRIDE… strictly below the token
count; chunk_idx = start // STRIDE; the tail chunk is ragged
(chunk_len = min(WINDOW, n - start)); content identity checked via the
exact md5 of the joined token slice.

Domain caps: per source, the kept set is exactly the DOMAIN_CAP lowest
(md5(doc_id), doc_id) keys — a deterministic uniform sample whose
retention funnel (kept/dropped/kept_chars) the model recomputes from a
literal sort."""

from __future__ import annotations

import hashlib
import re


def test_sliding_chunks_match_window_walk(spark, sf_dir):
    from datafusion_nats_spark.extensions.text import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        text_chunk_sliding,
    )
    from datafusion_nats_spark.tables import load

    rows = load(spark, sf_dir, "documents").select("doc_id", "text").collect()
    expected = {}
    for r in rows:
        toks = re.split(r"\s+", r.text.strip())
        for s in range(0, max(len(toks), 1), CHUNK_STRIDE):
            window = toks[s : s + CHUNK_TOKENS]
            expected[(r.doc_id, s // CHUNK_STRIDE)] = (
                min(CHUNK_TOKENS, len(toks) - s),
                hashlib.md5(" ".join(window).encode()).hexdigest(),
            )

    got = {
        (r.doc_id, r.chunk_idx): (r.chunk_len, r.chunk_md5)
        for r in text_chunk_sliding(spark, sf_dir).collect()
    }
    assert got == expected, {
        "missing": sorted(set(expected) - set(got))[:5],
        "extra": sorted(set(got) - set(expected))[:5],
    }


def test_domain_caps_match_sorted_sample(spark, sf_dir):
    from datafusion_nats_spark.extensions.curation import (
        DOMAIN_CAP,
        curation_domain_caps,
    )
    from datafusion_nats_spark.tables import load

    rows = load(spark, sf_dir, "documents").select("source", "doc_id", "n_chars").collect()
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)

    got = {r.source: r for r in curation_domain_caps(spark, sf_dir).collect()}
    assert set(got) == set(by_src)
    for src, docs in by_src.items():
        docs.sort(key=lambda r: (hashlib.md5(str(r.doc_id).encode()).hexdigest(), r.doc_id))
        kept = docs[:DOMAIN_CAP]
        g = got[src]
        assert g.n_docs == len(docs)
        assert g.n_kept == len(kept)
        assert g.n_dropped == len(docs) - len(kept)
        assert g.kept_chars == sum(r.n_chars for r in kept), src
