"""Category L — LLM-data-pipeline operators (SURVEY §2L, driver-mandated):
dedup, similarity search, text analysis, multimodal columns."""

from dbsuite_spark.pipeline import (  # noqa: F401
    classify,
    cleaning,
    clustering,
    corpus_filter,
    decomposition,
    dedup,
    dedup_extra,
    features,
    graph,
    graph_extra,
    graph_paths,
    media,
    mlprep,
    multimodal,
    packing,
    quantization,
    retrieval,
    similarity,
    substrings,
    text,
    text_extra,
    vocab,
)
from dbsuite_spark.pipeline import evaluation  # noqa: F401  (after text_extra:
# its oracle composes the registered text_langid_ngram spec)
