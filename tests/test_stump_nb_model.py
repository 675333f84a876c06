"""Independent reference models for `curation_info_gain_stump` and
`text_naive_bayes_langid`.

Both are corpus-trained classifiers whose query and oracle share the
training spec, so a plain-Python pass re-derives them. Pinned for the
stump: bins come from the GLOBAL per-feature min/max (a constant
feature collapses to bin 0), the cumulative histogram walks only
OBSERVED bins, the last cumulative row (empty right side) is never a
candidate split, and the argmax uses round(gain, 9) with a bin
tie-break. Pinned for Naive Bayes: add-one smoothing uses the GLOBAL
vocabulary size in every language's denominator, priors are document
(not token) frequencies, unseen (lang, token) pairs still contribute
ln(1/denom) per occurrence, and the argmax ranks 1e-6-rounded scores
with a language tie-break.
"""

from __future__ import annotations

import math
import re
from collections import Counter

_WS = re.compile(r"\s+", re.ASCII)


def _tokens(text: str) -> list[str]:
    # mirror F.split(F.trim(col), r"\s+"): trim strips ASCII spaces only,
    # split keeps a leading '' if other whitespace leads the string
    return _WS.split(text.strip(" "))


def test_info_gain_stump_matches_histogram_walk(spark, sf_dir):
    from datafusion_nats_spark.extensions.curation import (
        N_STUMP_BINS,
        curation_info_gain_stump,
    )
    from datafusion_nats_spark.tables import load

    raw = load(spark, sf_dir, "documents").select("text", "lang").collect()
    feats: dict = {"n_chars": [], "n_tokens": []}
    for r in raw:
        pos = 1 if r.lang == "en" else 0
        feats["n_chars"].append((float(len(r.text)), pos))
        feats["n_tokens"].append((float(len(_tokens(r.text))), pos))

    def entropy(p):
        if p <= 0 or p >= 1:
            return 0.0
        return -(p * math.log(p) + (1 - p) * math.log(1 - p))

    expected = {}
    for feat, vals in feats.items():
        vmin = min(v for v, _ in vals)
        vmax = max(v for v, _ in vals)
        hist: Counter = Counter()
        poshist: Counter = Counter()
        for v, pos in vals:
            b = (
                min(N_STUMP_BINS - 1, int(math.floor((v - vmin) * float(N_STUMP_BINS) / (vmax - vmin))))
                if vmax > vmin
                else 0
            )
            hist[b] += 1
            poshist[b] += pos
        nt = sum(hist.values())
        post = sum(poshist.values())
        nl = posl = 0
        cands = []
        for b in sorted(hist):
            nl += hist[b]
            posl += poshist[b]
            if nl <= 0 or nt - nl <= 0:
                continue
            gain = (
                entropy(post / nt)
                - (nl / nt) * entropy(posl / nl)
                - ((nt - nl) / nt) * entropy((post - posl) / (nt - nl))
            )
            cands.append((round(gain, 9), -b, b, nl, nt - nl, posl, post - posl, gain))
        cands.sort(reverse=True)
        g = cands[0]
        expected[feat] = (g[2], g[3], g[4], g[5], g[6], g[7])

    got = {
        r.feature: (r.split_bin, r.n_left, r.n_right, r.pos_left, r.pos_right, r.info_gain)
        for r in curation_info_gain_stump(spark, sf_dir).collect()
    }
    assert set(got) == set(expected)
    for feat, (b, nl, nr, pl, pr, gain) in expected.items():
        gb, gnl, gnr, gpl, gpr, ggain = got[feat]
        assert (gb, gnl, gnr, gpl, gpr) == (b, nl, nr, pl, pr), feat
        assert abs(ggain - gain) <= 5.1e-6, (feat, ggain, gain)


def test_naive_bayes_langid_matches_counting_walk(spark, sf_dir):
    from datafusion_nats_spark.extensions.text import text_naive_bayes_langid
    from datafusion_nats_spark.tables import load

    raw = load(spark, sf_dir, "documents").select("doc_id", "text", "lang").collect()
    docs = [
        (r.doc_id, r.lang, [t for t in _tokens(r.text.lower()) if t != ""])
        for r in raw
    ]
    vocab = {t for _, _, toks in docs for t in toks}
    n_docs: Counter = Counter(lang for _, lang, _ in docs)
    total_docs = sum(n_docs.values())
    tok_counts: dict = {}
    lang_tok_totals: Counter = Counter()
    for _, lang, toks in docs:
        lang_tok_totals[lang] += len(toks)
        for t in toks:
            tok_counts[(lang, t)] = tok_counts.get((lang, t), 0) + 1

    langs = sorted(n_docs)
    confusion: Counter = Counter()
    for _, true_lang, toks in docs:
        scored = []
        for cand in langs:
            denom = lang_tok_totals[cand] + len(vocab)
            s = math.log(n_docs[cand] / total_docs) + sum(
                math.log((tok_counts.get((cand, t), 0) + 1) / denom) for t in toks
            )
            scored.append((round(s, 6), cand))
        scored.sort(key=lambda p: (-p[0], p[1]))
        confusion[(true_lang, scored[0][1])] += 1

    got = {
        (r.true_lang, r.predicted_lang): r.n_docs
        for r in text_naive_bayes_langid(spark, sf_dir).collect()
    }
    assert got == dict(confusion)
    assert sum(got.values()) == len(docs)  # every document classified once
