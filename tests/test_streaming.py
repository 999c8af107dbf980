"""Structured-Streaming ingestion test: file-source micro-batches become
append segments; results match a batch build of the same corpus (the
near-real-time refresh analog)."""

import os

from pysearch.build import build_index
from pysearch.checkpoint import IndexMeta
from pysearch.config import IndexConfig
from pysearch.corpus import CORPUS_SCHEMA
from pysearch.fixtures import generate_repo_files
from pysearch.oracle import bm25_topk
from pysearch.query import Query, SearchIndex
from pysearch.streaming import attach_indexing_stream

CFG = IndexConfig(segment_rows=512, term_buckets=8, approximate_threshold=16)


def test_stream_ingest_matches_batch(spark, tmp_index, tmp_path):
    corpus = generate_repo_files(spark, 240, seed=11).persist()
    src_dir = str(tmp_path / "stream_src")
    os.makedirs(src_dir)
    # three "arrival" chunks
    for i in range(3):
        corpus.where(f"pmod(crc32(path), 3) = {i}").write.mode("overwrite").parquet(
            f"{src_dir}/chunk={i}"
        )

    meta = IndexMeta(tmp_index)
    meta.initialize(CFG)
    stream = (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", "8")
        .parquet(f"{src_dir}/chunk=*")
    )
    q = attach_indexing_stream(
        stream,
        tmp_index,
        config=CFG,
        merge_every=0,
        checkpoint_location=str(tmp_path / "ckpt"),
        trigger_available_now=True,
    )
    q.awaitTermination(120)

    si = SearchIndex(spark, tmp_index)
    assert si.num_docs == corpus.count()

    # identical top-k semantics as a batch oracle over the same corpus,
    # modulo doc ids (streaming assigns per-arrival ids) -> compare by path
    hits = si.search(Query(text="license merge tok0200", k=10))
    got = [(r["path"], round(r["score"], 6)) for r in hits.collect()]

    batch_idx = str(tmp_path / "batch_idx")
    build_index(spark, corpus, batch_idx, CFG)
    bi = SearchIndex(spark, batch_idx)
    exp = [
        (r["path"], round(r["score"], 6))
        for r in bi.search(Query(text="license merge tok0200", k=10)).collect()
    ]
    assert sorted(got) == sorted(exp)
    corpus.unpersist()


def test_windowed_agg_streaming_equals_batch(spark, tmp_path):
    """The SAME tumbling-window aggregation expression runs under Structured
    Streaming (readStream + withWatermark + availableNow) and in batch, with
    identical results — the watermarked windowed-agg surface of the task
    brief. Late data handling comes from the watermark; availableNow drains
    the backlog so the final state is the exact batch answer."""
    from pyspark.sql import functions as F

    from pysearch.ops.events import tumbling_counts

    import shutil

    # FileStreamSource needs a directory, the testdata table is one file
    src = str(tmp_path / "events_src")
    os.makedirs(src, exist_ok=True)
    shutil.copy("/root/testdata/sf0.001/events.parquet", src + "/part-0.parquet")
    batch_df = spark.read.parquet(src)
    expect = sorted(
        map(tuple, tumbling_counts(
            batch_df.withColumn("ts", F.col("ts").cast("timestamp"))
        ).collect())
    )

    stream = (
        spark.readStream.schema(batch_df.schema)
        .parquet(src)
        # parquet NTZ timestamps need the instant type for event-time
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 hour")
    )
    out_dir = str(tmp_path / "win_out")
    chk = str(tmp_path / "win_chk")
    q = (
        tumbling_counts(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.table("win_counts").collect()))
    assert got == expect and len(got) > 0


def test_stateful_sessionize_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionization: the closed sessions a single
    availableNow pass emits are EXACTLY the batch sessions minus each user's
    final (still-open-in-state) session, with identical ids/aggregates."""
    import shutil

    from pyspark.sql import functions as F

    from pysearch.ops.events import sessionize, sessionize_stream

    src = str(tmp_path / "ev_src")
    os.makedirs(src, exist_ok=True)
    shutil.copy("/root/testdata/sf0.001/events.parquet", src + "/part-0.parquet")
    batch_df = spark.read.parquet(src).withColumn("ts", F.col("ts").cast("timestamp"))

    full = sessionize(batch_df, 30).toPandas()
    last_per_user = full.loc[full.groupby("user_id")["session_id"].idxmax()]
    expect = full.merge(
        last_per_user[["user_id", "session_id"]],
        on=["user_id", "session_id"],
        how="left",
        indicator=True,
    )
    expect = expect[expect["_merge"] == "left_only"].drop(columns="_merge")

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .parquet(src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    q = (
        sessionize_stream(stream, 30)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(tmp_path / "sess_chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("sess_out").toPandas()

    cols = ["user_id", "session_id", "n_events", "start_epoch", "end_epoch", "sum_value"]
    to_set = lambda df: {tuple(r) for r in df[cols].itertuples(index=False)}  # noqa: E731
    got_s, closed_s, full_s = to_set(got), to_set(expect), to_set(full)
    # every closed session is emitted with batch-identical aggregates; any
    # extra rows are open sessions flushed by the processing-time timeout
    # (whether the trigger runs that extra batch is timing-dependent)
    assert closed_s and closed_s <= got_s
    assert got_s <= full_s
