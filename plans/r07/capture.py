"""Capture .explain("formatted") for every bench query surface touched in
round 7. Usage:  python plans/r07/capture.py <tag>   (tag = before | after)

Writes plans/r07/<query>_<tag>.txt. Builds a small 20k-doc index (same config
shape as bench.py: 4 segments, 32 term buckets) so plan SHAPE matches the
bench at a fraction of the build time — plan structure (Exchange count, scan
pushdown, kernel nodes) is size-independent.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
OUT = os.path.dirname(os.path.abspath(__file__))
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def explain_str(df) -> str:
    jqe = df._jdf.queryExecution()
    return df.sparkSession._jvm.PythonSQLUtils.explainString(jqe, "formatted")


def save(name: str, df) -> None:
    p = os.path.join(OUT, f"{name}_{TAG}.txt")
    with open(p, "w") as f:
        f.write(explain_str(df))
    print(f"wrote {p}")


def _noop_hit_kernel(pdf, restrict=None):
    from pysearch.query import _empty_hits

    return _empty_hits()


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("plans-r07")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pysearch.build import build_index, bucket_of
    from pysearch.config import IndexConfig
    from pysearch.fixtures import generate_queries, generate_repo_files
    from pysearch.ops import dedup, similarity
    from pysearch.query import HIT_SCHEMA, Query, SearchIndex

    work = tempfile.mkdtemp(prefix="plans_r07_")
    idx = os.path.join(work, "idx")
    # 20k docs / 5k-row segments -> 4 segments like the bench index
    build_index(
        spark,
        generate_repo_files(spark, 20_000, seed=42),
        idx,
        IndexConfig(segment_rows=5_000, term_buckets=32),
        concurrency=4,
    )
    si = SearchIndex(spark, idx)
    # materialize the postings cache first (the bench's warm-up does the
    # same): an unmaterialized AQE-cached relation reports unknown output
    # partitioning, so plans captured before the first query would show an
    # ENSURE_REQUIREMENTS exchange that warm queries never pay
    si.search(Query(text="warm cache", k=5)).collect()

    # ---- bm25 single query: the kernel pipeline exactly as _search_impl
    # builds it (search() collects internally, so the lazy DF is
    # reconstructed here with a no-op kernel body — plan shape identical)
    with si._single_query_confs():
        text = "merge segment"
        terms = [t for t in si._tokenize_query(text) if t in si.global_term_stats(si._tokenize_query(text))]
        buckets = sorted({bucket_of(t, si.config.term_buckets) for t in terms})
        postings = si._postings_source().where(
            F.col("bucket").isin(buckets) & F.col("term").isin(terms)
        ).drop("poss")
        n_parts = si._kernel_partitions()
        prepart = getattr(si, "_postings_prepartitioned", None)
        if prepart is None or not prepart():
            postings = postings.repartition(n_parts, "segment_id")
        cands = postings.groupBy("segment_id").applyInPandas(
            _noop_hit_kernel, schema=HIT_SCHEMA
        )
        top = (
            cands.where(F.col("doc_id") >= 0)
            .orderBy(F.desc(F.round(F.col("score"), 9)), F.asc("doc_id"))
            .limit(10)
        )
        save("bm25_single_query", top)

    # ---- batch 100 queries (search_batch returns the lazy DF)
    qs = [
        Query(text=q["query_text"], k=q["k"], filter_expr=q["filter_expr"])
        for q in generate_queries(100, seed=42)
    ]
    save("bm25_batch_100", si.search_batch(qs))

    # ---- batch table 10k (lazy result DF; internal collects already ran)
    texts = [q["query_text"] for q in generate_queries(100, seed=42)]
    text_arr = F.array(*[F.lit(t) for t in texts])
    qdf = spark.range(10_000).select(
        F.col("id").alias("query_id"),
        F.element_at(text_arr, (F.col("id") % 100 + 1).cast("int")).alias("text"),
    )
    save("bm25_batch_table", si.search_batch_table(qdf, default_k=10, chunk=10_000))

    # ---- merge compact: the re-encode pipeline as _compact_rewrite builds
    # it (mirrors pysearch/merge.py on a no-tombstone input set)
    from pysearch.checkpoint import IndexMeta, read_parquet_union
    from pysearch.build import BLOCK_SCHEMA
    from pysearch import merge as merge_mod

    meta = IndexMeta(idx)
    seg_ids = meta.live_segments()
    blocks = [
        read_parquet_union(spark, meta.postings_paths(s), schema=BLOCK_SCHEMA)
        for s in seg_ids
    ]
    allb = blocks[0]
    for b in blocks[1:]:
        allb = allb.unionByName(b)
    cfgm = meta.load_config()
    if hasattr(merge_mod, "_reencode_bucket_factory"):
        reenc = allb.groupBy("bucket").applyInPandas(
            merge_mod._reencode_bucket_factory(
                cfgm.block_size, cfgm.min_block_docs, cfgm.store_positions
            ),
            schema=BLOCK_SCHEMA,
        )
    else:
        from pysearch.merge import _POSTING_ROW_SCHEMA, _decode_factory
        from pysearch.build import _encode_bucket_factory

        rows = allb.mapInPandas(
            _decode_factory(cfgm.store_positions), schema=_POSTING_ROW_SCHEMA
        )
        reenc = rows.groupBy("bucket").applyInPandas(
            _encode_bucket_factory(
                cfgm.block_size, cfgm.min_block_docs,
                store_positions=cfgm.store_positions,
            ),
            schema=BLOCK_SCHEMA,
        )
    save("merge_compact_reencode", reenc)

    # ---- dedup minhash LSH (lazy)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    save(
        "dedup_minhash_lsh",
        dedup.minhash_lsh_pairs(docs, tau=0.95, num_hashes=64, bands=16),
    )

    # ---- ann cosine topk (lazy)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    save("ann_cosine_topk", similarity.cosine_topk(emb, list(range(10)), k=10))

    # ---- ivf table search, int8-quantized index (lazy)
    from pysearch.ops.vector_index import build_vector_index, search_vector_index_table

    vidx = os.path.join(work, "vidx")
    build_vector_index(spark, emb, vidx, nlist=16, seed=42, quantize=True)
    qtab = emb.limit(1000).select(F.col("vec_id").alias("query_id"), "embedding")
    save(
        "ann_ivf_table",
        search_vector_index_table(spark, vidx, qtab, k=10, nprobe=4),
    )

    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
