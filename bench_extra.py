"""Extra benchmarks / phase profiling for the optimization rounds.

NOT the driver's bench (bench.py is frozen); this file isolates each phase
with sub-stage timers and job descriptions so the Spark UI / logs attribute
time to operators (guide §1.4/§1.5). Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python bench_extra.py [phase ...]

Phases: build doc_build query batch table merge dedup ann ivf all
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    phases = set(sys.argv[1:]) or {"all"}

    def want(p: str) -> bool:
        return "all" in phases or p in phases

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pysearch-bench-extra")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("PYSEARCH_DRIVER_MEM", "48g"))
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pysearch.build import build_index
    from pysearch.config import IndexConfig
    from pysearch.corpus import corpus_from_documents
    from pysearch.fixtures import generate_queries, generate_repo_files
    from pysearch.ops import dedup, similarity
    from pysearch.query import Query, SearchIndex

    out: dict[str, float] = {}

    def timed(label: str, fn, n: int = 1):
        best = None
        for _ in range(n):
            spark.sparkContext.setJobDescription(label)
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            spark.sparkContext.setJobDescription(None)
        out[label] = round(best, 3)
        print(f"  {label}: {best:.3f}s", file=sys.stderr, flush=True)
        return best

    work = tempfile.mkdtemp(prefix="pysearch_bx_")
    idx = os.path.join(work, "idx")

    need_idx = want("build") or want("query") or want("batch") or want("table") or want("merge")
    if need_idx:
        n_rows = 100_000
        cfg = IndexConfig(segment_rows=25_000, term_buckets=32)
        corpus = generate_repo_files(spark, n_rows, seed=42).persist()
        corpus.count()
        build_index(
            spark, generate_repo_files(spark, 4000, seed=7),
            os.path.join(work, "warm"), IndexConfig(segment_rows=1000, term_buckets=32),
            concurrency=4,
        )
        if want("build"):
            os.environ["PYSEARCH_DEBUG_TIMING"] = "1"
            for t in range(3):
                d = os.path.join(work, f"idx_t{t}") if t else idx
                timed(f"build_trial_{t}", lambda d=d: build_index(spark, corpus, d, cfg, concurrency=4))
            os.environ.pop("PYSEARCH_DEBUG_TIMING", None)
        else:
            build_index(spark, corpus, idx, cfg, concurrency=4)

    if want("query"):
        si = SearchIndex(spark, idx)
        qset = generate_queries(100, seed=42)[:30]
        for q in qset[:3]:
            si.search(Query(text=q["query_text"], k=q["k"], filter_expr=q["filter_expr"])).collect()
        lats = [float("inf")] * len(qset)
        for _ in range(3):
            for i, q in enumerate(qset):
                t0 = time.time()
                si.search(Query(text=q["query_text"], k=q["k"], filter_expr=q["filter_expr"])).collect()
                lats[i] = min(lats[i], time.time() - t0)
        out["bm25_query_p50"] = round(statistics.median(lats), 4)
        out["bm25_query_p90"] = round(sorted(lats)[int(0.9 * len(lats))], 4)
        print(f"  bm25_query_p50: {out['bm25_query_p50']}s p90 {out['bm25_query_p90']}s", file=sys.stderr)

    if want("batch") or want("table"):
        si = SearchIndex(spark, idx)
        batch_qs = [
            Query(text=q["query_text"], k=q["k"], filter_expr=q["filter_expr"])
            for q in generate_queries(100, seed=42)
        ]
        texts = [q["query_text"] for q in generate_queries(100, seed=42)]
        text_arr = F.array(*[F.lit(t) for t in texts])
        qdf = spark.range(10_000).select(
            F.col("id").alias("query_id"),
            F.element_at(text_arr, (F.col("id") % 100 + 1).cast("int")).alias("text"),
        )
        if want("batch"):
            timed("bm25_batch_100", lambda: si.search_batch(batch_qs).collect(), n=3)
        if want("table"):
            timed(
                "bm25_batch_table_10k",
                lambda: si.search_batch_table(qdf, default_k=10, chunk=10_000).count(),
                n=3,
            )

    if want("doc_build"):
        timed(
            "build_documents_corpus",
            lambda: build_index(
                spark, corpus_from_documents(spark, sf_dir),
                os.path.join(work, "idx_docs"),
                IndexConfig(segment_rows=2000, term_buckets=16),
            ),
        )

    if want("merge"):
        from pysearch.checkpoint import IndexMeta
        from pysearch.merge import merge_segments

        segs = IndexMeta(idx).live_segments()
        timed("merge_incremental", lambda: merge_segments(spark, idx, segs, compact=False))
        segs2 = IndexMeta(idx).live_segments()
        timed("merge_compact", lambda: merge_segments(spark, idx, segs2, compact=True))

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    if want("dedup"):
        timed(
            "dedup_minhash_lsh",
            lambda: dedup.minhash_lsh_pairs(docs, tau=0.95, num_hashes=64, bands=16).count(),
            n=3,
        )

    if want("ann"):
        timed(
            "ann_cosine_topk",
            lambda: similarity.cosine_topk(emb, list(range(10)), k=10).count(),
            n=3,
        )

    if want("ivf"):
        from pysearch.ops.vector_index import build_vector_index, search_vector_index_table

        work_v = tempfile.mkdtemp(prefix="pysearch_bxv_")
        qtab = emb.limit(1000).select(F.col("vec_id").alias("query_id"), "embedding")
        vb, vt = [], []
        for t in range(2):
            vidx = os.path.join(work_v, f"vidx{t}")
            t0 = time.time()
            build_vector_index(spark, emb, vidx, nlist=16, seed=42, quantize=True)
            vb.append(time.time() - t0)
            t0 = time.time()
            search_vector_index_table(spark, vidx, qtab, k=10, nprobe=4).count()
            vt.append(time.time() - t0)
        out["ann_ivf_build"] = round(min(vb), 3)
        out["ann_ivf_table_1k"] = round(min(vt), 3)
        print(f"  ann_ivf_build: {out['ann_ivf_build']}s  ann_ivf_table_1k: {out['ann_ivf_table_1k']}s", file=sys.stderr)
        shutil.rmtree(work_v, ignore_errors=True)

    shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
