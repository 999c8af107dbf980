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


def test_ivf_append_delete_merge_lifecycle(spark, tmp_index):
    """The reference's signature merge lifecycle on the vector side
    (mergeOneField, JVectorWriter.java:192-213; codebook reuse :1072-1152):
    build -> append (centroids reused, no retrain) -> delete (tombstone
    parquet) -> merge (compact, tombstones dropped) — full-probe results stay
    exact at every step."""
    import json

    from pysearch.ops.vector_index import (
        append_vectors,
        delete_vectors,
        merge_vector_index,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet").persist()
    base = emb.where("vec_id < 300")
    rest = emb.where("vec_id >= 300")
    build_vector_index(spark, base, tmp_index, nlist=8, seed=42)
    meta = IndexMeta(tmp_index)
    cb_before = json.load(open(os.path.join(tmp_index, "centroids.json")))

    seg = append_vectors(spark, tmp_index, rest, key="rest")
    assert seg in meta.live_segments() and len(meta.live_segments()) == 2
    # codebook unchanged by append (compression-state reuse)
    assert json.load(open(os.path.join(tmp_index, "centroids.json"))) == cb_before
    # idempotent re-append
    n = len(meta.commits())
    append_vectors(spark, tmp_index, rest, key="rest")
    assert len(meta.commits()) == n

    # query ids chosen NOT divisible by 17 so they survive the delete below
    queries = [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.where("vec_id in (1, 2, 3)").collect()
    ]
    full = _by_q(search_vector_index(spark, tmp_index, queries, k=10, nprobe=8).collect())
    exact = _by_q(cosine_topk(emb, [q[0] for q in queries], k=10).collect())
    assert full == exact  # appended vectors searchable, exact under full probe

    n_dead = delete_vectors(spark, tmp_index, key="mod17", where="vec_id % 17 = 0")
    assert n_dead > 0 and meta.tombstone_count() == n_dead
    survivors = emb.where("vec_id % 17 <> 0")
    full = _by_q(search_vector_index(spark, tmp_index, queries, k=10, nprobe=8).collect())
    exact = _by_q(cosine_topk(survivors, [q[0] for q in queries], k=10).collect())
    assert full == exact  # deletes masked immediately

    # tombstone density (~6%) is below the guard, so force compaction (the
    # auto path would pick the incremental pure-metadata merge)
    merged = merge_vector_index(spark, tmp_index, compact=True)
    assert meta.live_segments() == [merged]
    assert meta.tombstone_count() == 0  # state rewritten by the merge commit
    assert meta.read_manifest(merged)["num_docs"] == survivors.count()
    full = _by_q(search_vector_index(spark, tmp_index, queries, k=10, nprobe=8).collect())
    assert full == exact  # identical results after compaction
    # idempotent re-merge
    n = len(meta.commits())
    merge_vector_index(spark, tmp_index, compact=True)
    assert len(meta.commits()) == n
    emb.unpersist()


def test_similarity_spaces_vs_numpy(spark):
    """l2 / innerproduct / l1 / linf top-k vs a numpy reference, and the
    reference's score translations (SpaceType.java:43-160)."""
    import numpy as np

    from pysearch.ops.similarity import similarity_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    pdf = emb.toPandas().sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy(np.int64)
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    qids = [0, 7, 21]
    for space in ("l2", "innerproduct", "l1", "linf"):
        got = similarity_topk(emb, qids, k=10, space=space).collect()
        by_q = {}
        for r in got:
            by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["score"]))
        for q in qids:
            d = X[ids == q][0]
            if space == "l2":
                sim = -((X - d) ** 2).sum(axis=1)
            elif space == "innerproduct":
                sim = X @ d
            elif space == "l1":
                sim = -np.abs(X - d).sum(axis=1)
            else:
                sim = -np.abs(X - d).max(axis=1)
            sim[ids == q] = -np.inf
            order = np.lexsort((ids, -np.round(sim, 9)))[:10]
            expect = [int(ids[i]) for i in order]
            assert [n for _, n, _ in sorted(by_q[q])] == expect, space
            # score translation is monotone-decreasing along ranks
            scores = [s for _, _, s in sorted(by_q[q])]
            assert scores == sorted(scores, reverse=True)
