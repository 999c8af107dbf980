"""Vector-index scale-up check (the embeddings analog of BASELINE.md's
10x text check): build the persisted IVF index (int8 tier on) over synthetic
embeddings at two corpus sizes a 10x apart, run a 10k-query TABLE search at
the larger size, and measure probe-path recall vs exact brute force on a
query sample.

Run:    python BENCH/vector_scale.py [--small 20000] [--big 200000] [--dim 64]
Prints one JSON line; numbers are recorded in BENCH/BASELINE.md.

Deterministic: vectors come from a hash-seeded uniform generator (no RNG
state), so reruns are identical.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import tempfile
import time


def synth_embeddings(spark, n: int, dim: int):
    """Deterministic pseudo-random unit-ish vectors: dims derive from
    crc-style integer hashing of (id, dim index) — executor-side, no RNG."""
    from pyspark.sql import functions as F

    dims = F.array(
        *[
            (
                F.pmod(
                    F.xxhash64(F.col("vec_id"), F.lit(j)), F.lit(2_000_003)
                ).cast("double")
                / 1_000_001.5
                - 1.0
            ).cast("float")
            for j in range(dim)
        ]
    )
    return (
        spark.range(n)
        .select(F.col("id").alias("vec_id"))
        .withColumn("embedding", dims)
    )


def run_level(
    spark, n: int, dim: int, nlist: int, queries: int, workdir: str,
    quant_kind: str = "int8",
) -> dict:
    from pysearch.ops.similarity import cosine_topk
    from pysearch.ops.vector_index import (
        build_vector_index,
        search_vector_index_table,
    )
    from pyspark.sql import functions as F

    emb = synth_embeddings(spark, n, dim).persist()
    emb.count()  # materialize outside the build timer
    idx = os.path.join(workdir, f"vidx_{quant_kind}_{n}")
    t0 = time.time()
    build_vector_index(
        spark, emb, idx, nlist=nlist, seed=42, quantize=True,
        quant_kind=quant_kind,
    )
    build_sec = time.time() - t0

    qtab = emb.where(F.col("vec_id") < queries).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    t0 = time.time()
    got = search_vector_index_table(spark, idx, qtab, k=10, nprobe=8)
    n_rows = got.count()
    search_sec = time.time() - t0

    # probe-path recall vs exact brute force on a 50-query sample
    sample_ids = list(range(0, queries, max(queries // 50, 1)))[:50]
    approx = {}
    for r in search_vector_index_table(
        spark, idx, qtab.where(F.col("query_id").isin(sample_ids)), k=10, nprobe=8
    ).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    exact = {}
    for r in cosine_topk(emb, sample_ids, k=10).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ]
    emb.unpersist()
    return {
        "n_vectors": n,
        "quant_kind": quant_kind,
        "nlist": nlist,
        "build_sec": round(build_sec, 2),
        "build_vecs_per_sec": round(n / build_sec, 1),
        "table_queries": queries,
        "table_search_sec": round(search_sec, 2),
        "table_qps": round(queries / search_sec, 1),
        "result_rows": n_rows,
        "probe_recall_at10_nprobe8": round(sum(recalls) / len(recalls), 4),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=20_000)
    ap.add_argument("--big", type=int, default=200_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--queries", type=int, default=10_000)
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("pysearch-vector-scale")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "40g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    work = tempfile.mkdtemp(prefix="pysearch_vscale_")
    try:
        out = {
            "dim": args.dim,
            "small": run_level(
                spark, args.small, args.dim,
                nlist=max(int(math.sqrt(args.small)) // 2, 16),
                queries=min(args.queries, args.small), workdir=work,
            ),
            "big": run_level(
                spark, args.big, args.dim,
                nlist=max(int(math.sqrt(args.big)) // 2, 16),
                queries=args.queries, workdir=work,
            ),
            # pq tier at the big level: 16x codes (m = dim/4) through the
            # same build + 10k-query table protocol, recall measured with
            # the tier-default rerank oversample
            "big_pq": run_level(
                spark, args.big, args.dim,
                nlist=max(int(math.sqrt(args.big)) // 2, 16),
                queries=args.queries, workdir=work, quant_kind="pq",
            ),
        }
        out["build_throughput_ratio_big_vs_small"] = round(
            out["big"]["build_vecs_per_sec"] / out["small"]["build_vecs_per_sec"], 3
        )
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
