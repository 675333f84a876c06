"""Independent reference model for `curation_temporal_split`.

The query and oracle share the cutoff predicate; the first principles
worth pinning: the boundary is strict (< cutoff trains, an order AT the
cutoff instant evaluates), the two splits partition the orders exactly,
and the leakage audit counts precisely the customers present on BOTH
sides. A literal set walk over the collected orders re-derives all
counts."""

from __future__ import annotations


def test_temporal_split_matches_set_walk(spark, sf_dir):
    import datetime

    from datafusion_nats_spark.extensions.curation import (
        _TEMPORAL_CUTOFF,
        curation_temporal_split,
    )
    from datafusion_nats_spark.tables import load

    cutoff = datetime.datetime.fromisoformat(_TEMPORAL_CUTOFF)
    rows = load(spark, sf_dir, "orders").select("o_custkey", "o_orderdate").collect()
    train_rows = [r for r in rows if r.o_orderdate < cutoff]
    eval_rows = [r for r in rows if r.o_orderdate >= cutoff]
    assert len(train_rows) + len(eval_rows) == len(rows)  # exact partition
    train_c = {r.o_custkey for r in train_rows}
    eval_c = {r.o_custkey for r in eval_rows}
    leaked = len(train_c & eval_c)

    got = {r.split: r for r in curation_temporal_split(spark, sf_dir).collect()}
    assert set(got) == {"train", "eval"}
    assert got["train"].n_rows == len(train_rows)
    assert got["eval"].n_rows == len(eval_rows)
    assert got["train"].n_customers == len(train_c)
    assert got["eval"].n_customers == len(eval_c)
    assert got["train"].leaked_customers == leaked
    assert got["eval"].leaked_customers == leaked
