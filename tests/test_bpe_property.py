"""Differential property test for the distributed BPE trainer
(`extensions/bpe.py`) against an independent from-scratch Python
reference of Sennrich et al. 2016: frequency-weighted overlapping pair
counts, argmax by (count DESC, left, right), greedy left-to-right
non-overlapping merge application.

The registry oracle unrolls the SAME spec in DuckDB CTEs, so a shared
misreading (especially of the self-pair run-parity rule that makes the
array-expression merge equal the greedy scan on runs like 'aaaa') would
pass both engines. The reference here is a literal greedy scan, and the
generator uses a 2-letter alphabet to make self-pair runs common.

Generator constraint (documented engine edge): a round with ZERO
remaining adjacent pairs produces an empty argmax, and the histogram
rewrite (cross join with the empty best row) empties — both engines
agree, but the reference would diverge. A sentinel length-5 word
guarantees at least one pair survives every one of the MERGES=3
rounds (length 5 → ≥3 symbols after round 1 → ≥2 after round 2)."""

from __future__ import annotations

import os
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = settings(
    max_examples=int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "50")) // 3 or 1,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

SENTINEL = "babab"  # length 5: pairs survive all 3 merge rounds


def _ref_apply(w: list, l: str, r: str) -> list:
    out, i = [], 0
    while i < len(w):
        if i + 1 < len(w) and w[i] == l and w[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(w[i])
            i += 1
    return out


def _ref_train(hist: dict, n_merges: int):
    words = {tok: [c for c in tok] for tok in hist}
    rules = []
    for k in range(1, n_merges + 1):
        cnt = Counter()
        for tok, w in words.items():
            for a, b in zip(w, w[1:]):  # overlapping occurrences count
                cnt[(a, b)] += hist[tok]
        assert cnt, "generator must guarantee a pair every round"
        (l, r), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        rules.append((k, l, r, c))
        words = {tok: _ref_apply(w, l, r) for tok, w in words.items()}
    return rules, words


@_SETTINGS
@given(
    corpus=st.dictionaries(
        keys=st.text(alphabet="ab", min_size=1, max_size=6),
        values=st.integers(min_value=1, max_value=5),
        min_size=1,
        max_size=12,
    )
)
def test_bpe_trainer_matches_reference_model(spark, tmp_path_factory, corpus):
    from datafusion_nats_spark.extensions.bpe import (
        MERGES,
        text_bpe_merges,
        text_bpe_segment,
    )

    corpus = dict(corpus)
    corpus[SENTINEL] = corpus.get(SENTINEL, 0) + 1
    text = " ".join(tok for tok, wc in sorted(corpus.items()) for _ in range(wc))
    out = str(tmp_path_factory.mktemp("bpe_prop"))
    spark.createDataFrame(
        [(0, text, "en", "src0", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    exp_rules, exp_words = _ref_train(corpus, MERGES)

    got_rules = sorted(
        (r.merge_rank, r.left_sym, r.right_sym, r.pair_count)
        for r in text_bpe_merges(spark, out).collect()
    )
    assert got_rules == exp_rules, (got_rules, exp_rules, corpus)

    got_seg = {r.segmented: (r.n_symbols, r.wc) for r in text_bpe_segment(spark, out).collect()}
    exp_seg = {
        " ".join(w): (len(w), corpus[tok]) for tok, w in exp_words.items()
    }
    assert got_seg == exp_seg, (got_seg, exp_seg, corpus)
