"""Independent reference model for `graph_adamic_adar_linkpred`.

The query and its oracle share the wedge-join spec, so a brute-force
walk re-derives the scores: build the SAME within-label top-K cosine
kNN edge set (cosines rounded to 1e-6 BEFORE the per-vertex ranking,
ties to the smaller neighbor id — the spec's determinism contract),
then for every unordered non-adjacent pair count common neighbors by
set intersection and sum 1/ln(degree) over them. Also pinned: a wedge
middle always has degree >= 2 (ln is never 0), and no returned pair is
an existing edge.
"""

from __future__ import annotations

import math
from itertools import combinations


def _knn_und_model(spark, sf_dir):
    from datafusion_nats_spark.extensions.graph import KNN_K
    from datafusion_nats_spark.tables import load

    raw = load(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    ).collect()
    by_label: dict = {}
    for r in raw:
        by_label.setdefault(r.label, []).append((r.vec_id, [float(x) for x in r.embedding]))

    und = set()
    for grp in by_label.values():
        norms = {vid: math.sqrt(sum(x * x for x in emb)) for vid, emb in grp}
        embs = dict(grp)
        for vid, emb in grp:
            scored = [
                (
                    round(
                        sum(a * b for a, b in zip(emb, embs[o]))
                        / (norms[vid] * norms[o]),
                        6,
                    ),
                    o,
                )
                for o, _ in grp
                if o != vid
            ]
            scored.sort(key=lambda p: (-p[0], p[1]))
            for _, o in scored[:KNN_K]:
                und.add((min(vid, o), max(vid, o)))
    return und


def test_adamic_adar_matches_brute_force(spark, sf_dir):
    from datafusion_nats_spark.extensions.graph import (
        LINKPRED_TOP,
        graph_adamic_adar_linkpred,
    )

    und = _knn_und_model(spark, sf_dir)
    adj: dict = {}
    for x, y in und:
        adj.setdefault(x, set()).add(y)
        adj.setdefault(y, set()).add(x)
    deg = {v: len(ns) for v, ns in adj.items()}

    cand = []
    for u, w in combinations(sorted(adj), 2):
        if w in adj[u]:
            continue
        common = adj[u] & adj[w]
        if not common:
            continue
        for mid in common:
            assert deg[mid] >= 2  # a wedge middle has two distinct neighbors
        cand.append(
            (
                round(sum(1.0 / math.log(deg[m]) for m in common), 6),
                u,
                w,
                len(common),
            )
        )
    cand.sort(key=lambda c: (-c[0], c[1], c[2]))
    expected = [(u, w, n, s) for s, u, w, n in cand[:LINKPRED_TOP]]

    got = [
        (r.vec_a, r.vec_b, r.common_neighbors, r.adamic_adar)
        for r in graph_adamic_adar_linkpred(spark, sf_dir).collect()
    ]
    assert len(got) == min(LINKPRED_TOP, len(cand))
    for (gu, gw, gn, gs), (eu, ew, en, es) in zip(
        sorted(got), sorted(expected)
    ):
        assert (gu, gw, gn) == (eu, ew, en)
        assert abs(gs - es) <= 5.1e-7, ((gu, gw), gs, es)
        assert (min(gu, gw), max(gu, gw)) not in und  # never an existing edge
