"""Independent reference model for `mba_item_pair_lift`.

The query and its DuckDB oracle share the within-order self-join spec;
this model rebuilds the association table from first principles —
per-order item SETS (deduping repeated lineitems of the same part), all
itertools pairs, frequency counts — and checks co-counts exactly and
lift/support to the rounding ulp. Catches the classic double-count (a
part appearing twice in one order inflating the self-join) and pair
orientation mistakes a shared spec would not."""

from __future__ import annotations

import itertools
from collections import Counter


def test_pair_lift_matches_itertools_model(spark, sf_dir):
    from datafusion_nats_spark.queries.advanced import mba_item_pair_lift
    from datafusion_nats_spark.tables import load

    rows = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    baskets: dict = {}
    for r in rows:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)

    n_orders = len(baskets)
    freq = Counter(p for items in baskets.values() for p in items)
    co = Counter(
        pair
        for items in baskets.values()
        for pair in itertools.combinations(sorted(items), 2)
    )
    expected = {pair: c for pair, c in co.items() if c >= 2}

    got = {
        (r.part_x, r.part_y): (r.co_count, r.lift, r.support)
        for r in mba_item_pair_lift(spark, sf_dir).collect()
    }
    assert set(got) == set(expected), {
        "missing": sorted(set(expected) - set(got))[:5],
        "extra": sorted(set(got) - set(expected))[:5],
    }
    for (x, y), c in expected.items():
        co_count, lift, support = got[(x, y)]
        assert x < y  # canonical orientation
        assert co_count == c, ((x, y), co_count, c)
        # tolerance just over the 6/8-decimal rounding half-step: exact
        # .xxxxxx5 quotients (e.g. 2946/768 = 3.8359375) round half-UP in
        # Spark, landing a full half-step from the unrounded value
        assert abs(lift - c * n_orders / (freq[x] * freq[y])) <= 5.1e-7
        assert abs(support - c / n_orders) <= 5.1e-9
