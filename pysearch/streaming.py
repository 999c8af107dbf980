"""Near-real-time indexing via Structured Streaming.

The reference indexes continuously: every refresh flushes buffered docs into
a new immutable segment and background merges fold segments together
(JVectorWriter.flush / mergeOneField). The Spark-native analog: a streaming
source of corpus rows -> ``foreachBatch`` -> ``append_segment`` (one new
committed segment per micro-batch, keyed by batch id so replays after a
failure are idempotent — exactly the commit-log resume semantics) ->
optional size-tiered merge round every `merge_every` batches.

No watermarks/stateful operators are needed: indexing is append-only and
per-batch exact (SURVEY §2.5: the reference has no streaming aggregation
surface either — "streaming" means incremental segment creation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pysearch.build import append_segment
from pysearch.config import IndexConfig
from pysearch.merge import run_merge_round


def attach_indexing_stream(
    stream_df: DataFrame,
    index_dir: str,
    config: IndexConfig | None = None,
    merge_every: int = 4,
    checkpoint_location: str | None = None,
    trigger_available_now: bool = False,
):
    """Wire a streaming DataFrame of repo_files rows into the index.

    Returns the StreamingQuery. Each micro-batch becomes one append segment
    committed under key ``stream_<batch_id>``; every `merge_every` batches a
    background merge round runs (the tiered merge-policy analog).
    """
    spark = stream_df.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        append_segment(
            spark, index_dir, batch_df, key=f"stream_{batch_id:012d}", config=config
        )
        if merge_every and batch_id > 0 and batch_id % merge_every == 0:
            run_merge_round(spark, index_dir)

    writer = stream_df.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint_location:
        writer = writer.option("checkpointLocation", checkpoint_location)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def attach_vector_stream(
    stream_df: DataFrame,
    index_dir: str,
    merge_every: int = 4,
    checkpoint_location: str | None = None,
    trigger_available_now: bool = False,
):
    """NRT vector indexing: wire a streaming DataFrame of (vec_id, embedding)
    rows into a PRE-BUILT persisted IVF index (build_vector_index must have
    run — appends reuse its centroid codebook, the compression-state-reuse
    analog). Each micro-batch becomes one append segment committed under key
    ``stream_<batch_id>`` (idempotent on replay); every `merge_every` batches
    a size-tiered vector merge round bounds the segment count."""
    from pysearch.ops.vector_index import append_vectors, run_vector_merge_round

    spark = stream_df.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        append_vectors(spark, index_dir, batch_df, key=f"stream_{batch_id:012d}")
        if merge_every and batch_id > 0 and batch_id % merge_every == 0:
            run_vector_merge_round(spark, index_dir)

    writer = stream_df.writeStream.foreachBatch(process).outputMode("append")
    if checkpoint_location:
        writer = writer.option("checkpointLocation", checkpoint_location)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
