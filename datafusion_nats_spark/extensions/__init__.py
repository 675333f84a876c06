"""LLM-data-pipeline extension operators (driver mandate, BASELINE.json
north_star): dedup, similarity search, text analysis, multimodal columns.
Importing this package registers their queries() entries."""

from datafusion_nats_spark.extensions import (  # noqa: F401
    ann_index,
    bpe,
    contrastive,
    coreset,
    curation,
    dedup,
    dsir,
    graph,
    layout,
    logreg,
    ml_variants,
    mmr,
    multimodal,
    pca,
    pipeline,
    pq,
    retrieval,
    semdedup,
    similarity,
    text,
    text_index,
)

# imported LAST: their oracles compose oracles registered above
from datafusion_nats_spark.extensions import (  # noqa: E402,F401
    embedding_pipeline,
    eval_report,
)
