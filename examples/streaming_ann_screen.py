"""Streaming ANN ingest-screen walkthrough: embeddings arrive in
micro-batches and are screened against the persisted IVF index
(extensions/ann_index.py) via ``ivf_stream_screen_apply``
(streaming/pipelines.py) — the similarity-family twin of the streaming
LSH dedup loop.

What the run shows:
- batch 1 (a clone of a corpus vector under a fresh id) is probed
  against the stored cell-partitioned corpus only;
- batch 1's vectors are ingested as an epoch delta (assigned to their
  nearest stored centroid — the same argmax rule the probe ranks cells
  by);
- batch 2 (another clone of the same vector) therefore finds the
  batch-1 vector at rank 1 with cosine exactly 1.0 — THROUGH the stored
  index, across separate micro-batches.

The registered, DuckDB-oracle-checked flavor of this pipeline is
``sim_stream_screen`` (a real file-source foreachBatch streaming
query); this example drives the same apply function directly for a
readable two-step narrative.

Run:  python examples/streaming_ann_screen.py [SF_DIR]
SF_DIR defaults to /root/testdata/sf0.001.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    from datafusion_nats_spark.extensions.ann_index import ivf_index_build
    from datafusion_nats_spark.extensions.similarity import _emb_double
    from datafusion_nats_spark.session import get_spark
    from datafusion_nats_spark.streaming.pipelines import ivf_stream_screen_apply
    from datafusion_nats_spark.tables import load

    spark = get_spark("streaming_ann_screen_example")

    work = tempfile.mkdtemp(prefix="ann_screen_example_")
    index_dir = ivf_index_build(spark, SF_DIR, os.path.join(work, "ivf"))
    results = os.path.join(work, "hits")
    screen = ivf_stream_screen_apply(index_dir, results)
    print(f"persisted IVF index built at {index_dir}")

    base = load(spark, SF_DIR, "embeddings").filter(F.col("vec_id") == 7).select(
        _emb_double().alias("emb")
    )
    assert base.count() == 1, f"no vec_id 7 in {SF_DIR}/embeddings.parquet"
    hits = []
    for epoch, new_id in enumerate((5001, 5002)):
        batch = base.select(F.lit(new_id).cast("long").alias("vec_id"), "emb")
        screen(batch, epoch)
        hits = sorted(
            spark.read.parquet(f"{results}/epoch={epoch}").collect(),
            key=lambda r: int(r.rn),
        )
        top = hits[0]
        print(
            f"epoch {epoch}: screened vec {new_id} -> rank-1 neighbor "
            f"{top.neighbor_id} cosine={top.cosine:.6f} "
            f"({len(hits)} candidates from the pruned cells)"
        )

    # the guaranteed property: 5001 was ingested into epoch 1's top probe
    # cell (same argmax rule as the probe), so the epoch-1 clone finds it
    # at cosine exactly 1.0 within the top 2 — the original corpus vector
    # can legitimately tie at 1.0 and win the ascending-id tie-break on
    # fixtures where its label cell is also probed
    assert any(
        r.neighbor_id == 5001 and r.cosine == 1.0 and int(r.rn) <= 2
        for r in hits
    )
    print(
        "batch-2 clone matched the batch-1 INGESTED vector at cosine 1.0 "
        "— the index accumulates across micro-batches"
    )


if __name__ == "__main__":
    main()
