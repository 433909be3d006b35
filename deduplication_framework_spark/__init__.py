"""deduplication_framework_spark — a PySpark-native near-duplicate detection
and clustering engine.

A brand-new Spark-first rebuild with the query/data-processing capabilities of
xiaoyu-ops/Deduplication_framework (reference at /root/reference, read-only).
The reference is single-node Python (for-loops, numpy, ThreadPoolExecutor);
this engine re-expresses the same semantics as Spark DataFrame plans:

    pages -> docs (extract + exact-hash dedup) -> shingles -> signatures
          -> LSH band buckets (salted) -> candidate pairs -> verified edges
          -> connected components -> clusters -> keepers + metrics

Everything here derives from public knowledge only: the Apache Spark API,
the reference repo's observable behavior, and published papers/specs
(MinHash per Broder 1997 / the datasketch library's public hash spec,
SimHash per Charikar 2002 / the `simhash` PyPI library's public spec,
exact-substring dedup per Lee et al. 2022, connected components per
Kiveris et al. 2014).
"""

from deduplication_framework_spark.config import (
    PipelineConfig,
    TextDedupConfig,
    TextEmbeddingConfig,
    load_pipeline_config,
)

__all__ = [
    "PipelineConfig",
    "TextDedupConfig",
    "TextEmbeddingConfig",
    "load_pipeline_config",
]

__version__ = "0.1.0"
