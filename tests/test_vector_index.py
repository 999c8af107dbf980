"""Persisted IVF vector index: build/search lifecycle, recall vs exact,
partition pruning, filtered search, idempotent rebuild."""

import os

from pyspark.sql import functions as F

from pysearch.checkpoint import IndexMeta
from pysearch.ops.similarity import cosine_topk
from pysearch.ops.vector_index import build_vector_index, search_vector_index

SF = "/root/testdata/sf0.001"


def _by_q(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ivf_lifecycle(spark, tmp_index):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").persist()
    meta = build_vector_index(spark, emb, tmp_index, nlist=8, seed=42)
    assert meta.live_segments() == ["vectors"]
    assert meta.read_manifest("vectors")["num_docs"] == emb.count()
    # idempotent rebuild
    n = len(meta.commits())
    build_vector_index(spark, emb, tmp_index, nlist=8, seed=42)
    assert len(meta.commits()) == n

    qrows = emb.where("vec_id < 4").collect()
    queries = [(r["vec_id"], list(r["embedding"])) for r in qrows]

    # full probe == exact brute force
    full = _by_q(search_vector_index(spark, tmp_index, queries, k=10, nprobe=8).collect())
    exact = _by_q(cosine_topk(emb, [q[0] for q in queries], k=10).collect())
    assert full == exact

    # partial probe: decent recall, fewer cells scanned
    approx = _by_q(search_vector_index(spark, tmp_index, queries, k=10, nprobe=3).collect())
    recalls = [len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.4, recalls

    # cell-partitioned layout exists (the pruning surface)
    cells_dir = os.path.join(IndexMeta(tmp_index).segment_dir("vectors"), "cells.parquet")
    assert any(d.startswith("cell=") for d in os.listdir(cells_dir))

    # filtered search (accept-bits analog)
    allow = [r["vec_id"] for r in emb.where("vec_id % 2 = 0").select("vec_id").collect()]
    filt = search_vector_index(spark, tmp_index, queries, k=5, nprobe=8, allow_ids=allow).collect()
    assert filt and all(r["neighbor_id"] % 2 == 0 for r in filt)
    emb.unpersist()
