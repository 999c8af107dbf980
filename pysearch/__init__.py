"""pysearch — a PySpark-native inverted-index build + BM25 top-k query engine.

Re-expresses the per-segment index lifecycle of the reference plugin
``opensearch-project/opensearch-jvector`` (build -> flush -> merge -> search,
see /root/reference/src/main/java/org/opensearch/knn/index/codec/jvector/
JVectorWriter.java and JVectorReader.java) as an inverted-index pipeline over
a corpus table ``repo_files(repo, path, commit, lang, content)``:

* code-aware tokenization via vectorized Arrow/pandas UDFs (no per-row Python)
* per-segment posting-list construction with delta-gap + varint compression
  and per-block max-score metadata (block-max)
* hierarchical / incremental segment merge mirroring the plugin's merge policy
  (leading-segment reuse, tombstone-density rebuild guard)
* BM25 top-k retrieval via block-max MaxScore/WAND skipping with exact rerank
* checkpointed, idempotently resumable builds with per-partition lineage +
  metrics (the KNNCounter / VectorIndexFieldMetadata analog)

Everything here derives from public knowledge only: the Apache Spark / PySpark
API, the reference repository's observable behavior, and published IR papers
(BM25; Broder et al. WAND; Ding & Suel block-max WAND).
"""

from pysearch.config import IndexConfig

__all__ = ["IndexConfig"]
__version__ = "0.1.0"
