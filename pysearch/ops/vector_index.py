"""Persisted IVF (inverted-file) vector index — the structural twin of the
reference's on-disk ANN index, Spark-first, with the FULL segment lifecycle
(the reference's signature feature):

* build      train a compact centroid codebook once and encode all vectors
             with it (PQ training, JVectorIndexQuantization.java:114-140) ->
             deterministic k-means on a seeded sample, persisted as tiny
             metadata; vectors land in cell-partitioned parquet under an
             immutable segment + manifest + commit log (REUSES
             pysearch.checkpoint.IndexMeta verbatim).
* append     new vectors become a NEW immutable segment assigned with the
             EXISTING centroids — the codebook/compression-state reuse analog
             (JVectorWriter.java:1072-1152: merged segments reuse the
             quantization state instead of retraining).
* delete     tombstone commits referencing parquet delete files (same
             scalable mechanics as the text index; liveDocs analog).
* merge      compact all live segments into one: union minus tombstones,
             re-partitioned by cell, centroids REUSED (no retrain), inputs
             retired + tombstone state rewritten in one atomic commit —
             mergeOneField (JVectorWriter.java:192-213) re-expressed.
* search     probe only the `nprobe` nearest cells across every live segment
             (directory-level partition pruning), exact scoring inside probed
             cells in any supported space (SpaceType.java:43-160) — recall is
             governed by nprobe, precision is always 1.0; deleted vectors are
             masked by a distributed anti-join.

At 100 TB: cells are the unit of pruning and of parallelism; `nlist` scales
with corpus size (sqrt(n) rule of thumb) while per-task memory stays O(cell
size); appends add segments, merges bound segment count, the commit log
makes every step idempotent/resumable.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pysearch.checkpoint import IndexMeta, _write_json_atomic, read_parquet_union
from pysearch.ops.similarity import _space_similarities, train_centroids

_VEC_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("cell", T.IntegerType()),
    ]
)


def _cells_path(meta: IndexMeta, seg: str) -> str:
    return os.path.join(meta.segment_dir(seg), "cells.parquet")


def _load_centroids(index_dir: str) -> np.ndarray:
    cb = json.load(open(os.path.join(index_dir, "centroids.json")))
    return np.array(cb["centroids"], dtype=np.float64)


def _assign_factory(bC, space: str, id_col: str, vec: str):
    """Nearest-centroid assignment in the index's space (centroids are unit
    vectors from spherical k-means; l2 uses true distances to them)."""

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Cv = bC.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec].to_numpy()).astype(np.float64)
            S = _space_similarities(X, Cv, space)  # higher = closer
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(np.int64),
                    "embedding": pdf[vec],
                    "cell": np.argmax(S, axis=1).astype(np.int32),
                }
            )

    return assign


def _write_vector_segment(
    spark, meta: IndexMeta, seg: str, assigned: DataFrame, source: dict, t0: float
) -> None:
    path = _cells_path(meta, seg)
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)
    written = spark.read.schema(_VEC_SCHEMA).parquet(path)
    per_cell = written.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    total = int(sum(r["n"] for r in per_cell))
    cfg = meta.load_config()
    meta.write_manifest(
        seg,
        {
            "segment_id": seg,
            "num_docs": total,
            "sum_dl": 0,
            "doc_id_min": -1,
            "doc_id_max": -1,
            "num_terms": int(cfg.extra.get("nlist", 0)),
            "num_postings": total,
            "config_fingerprint": cfg.fingerprint(),
            "source": source,
        },
    )
    meta.write_metrics(
        seg,
        [
            {"bucket": int(r["cell"]), "n_postings": int(r["n"]), "stage": "ivf_cell"}
            for r in per_cell
        ]
        + [
            {
                "bucket": -1,
                "n_postings": total,
                "stage": f"ivf_{source['type']}_total",
                "num_docs": total,
                "wall_time_sec": time.time() - t0,
            }
        ],
    )


def build_vector_index(
    spark: SparkSession,
    emb: DataFrame,
    index_dir: str,
    nlist: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec: str = "embedding",
    space: str = "cosinesimil",
) -> IndexMeta:
    """Train centroids, assign every vector to its nearest cell, persist the
    cell-partitioned vector segment + centroid codebook + manifest.
    Idempotent (commit-log keyed)."""
    from pysearch.config import IndexConfig

    meta = IndexMeta(index_dir)
    meta.initialize(
        IndexConfig(extra={"kind": "ivf", "nlist": nlist, "seed": seed, "space": space})
    )
    if meta.has_commit("build_vectors"):
        return meta
    t0 = time.time()

    C = train_centroids(emb, nlist=nlist, seed=seed, id_col=id_col, vec=vec)
    _write_json_atomic(
        os.path.join(index_dir, "centroids.json"),
        {"nlist": int(C.shape[0]), "dim": int(C.shape[1]), "centroids": C.tolist()},
    )
    bC = spark.sparkContext.broadcast(C)
    assigned = emb.select(id_col, vec).mapInPandas(
        _assign_factory(bC, space, id_col, vec), schema=_VEC_SCHEMA
    )
    _write_vector_segment(
        spark, meta, "vectors", assigned,
        {"type": "ivf_build", "nlist": nlist, "seed": seed, "space": space}, t0,
    )
    meta.append_commit("build_vectors", op="add", adds=["vectors"])
    return meta


def append_vectors(
    spark: SparkSession,
    index_dir: str,
    emb: DataFrame,
    key: str,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> str | None:
    """Index an appended vector batch as a NEW immutable segment using the
    EXISTING centroid codebook (compression-state reuse,
    JVectorWriter.java:1072-1152 — no retraining). Idempotent per `key`."""
    meta = IndexMeta(index_dir)
    seg = f"vectors_a_{key}"
    commit_key = f"build_{seg}"
    if meta.has_commit(commit_key):
        return seg
    if emb.isEmpty():
        meta.append_commit(commit_key, op="add", adds=[], extra={"empty": True})
        return None
    t0 = time.time()
    cfg = meta.load_config()
    bC = spark.sparkContext.broadcast(_load_centroids(index_dir))
    assigned = emb.select(id_col, vec).mapInPandas(
        _assign_factory(bC, cfg.extra.get("space", "cosinesimil"), id_col, vec),
        schema=_VEC_SCHEMA,
    )
    _write_vector_segment(
        spark, meta, seg, assigned, {"type": "ivf_append", "key": key}, t0
    )
    meta.append_commit(commit_key, op="add", adds=[seg])
    return seg


def delete_vectors(
    spark: SparkSession,
    index_dir: str,
    key: str,
    vec_ids: list[int] | None = None,
    where: str | None = None,
) -> int:
    """Tombstone vectors by id or predicate over (vec_id, cell) — the same
    parquet-delete-file mechanics as the text index (ids never inlined in
    JSON or plans). Searches mask them immediately; a merge drops them."""
    meta = IndexMeta(index_dir)
    if meta.has_commit(f"delete_{key}"):
        return 0
    if vec_ids is None:
        if where is None:
            raise ValueError("need vec_ids or where")
        live = _live_vector_segments(meta)
        cells = _read_cells(spark, meta, live)
        dead = cells.where(where).select(
            F.col("vec_id").cast("long").alias("doc_id")
        ).distinct()
    else:
        dead = spark.createDataFrame(
            [(int(v),) for v in set(vec_ids)], "doc_id long"
        )
    existing = meta.tombstones_df(spark)
    if existing is not None:
        dead = dead.join(existing, "doc_id", "left_anti")
    rel = meta.delete_file_rel(key)
    os.makedirs(meta.deletes_dir(), exist_ok=True)
    dead.write.mode("overwrite").parquet(os.path.join(meta.index_dir, rel))
    n = spark.read.schema("doc_id long").parquet(
        os.path.join(meta.index_dir, rel)
    ).count()
    meta.append_commit(
        f"delete_{key}", op="delete", extra={"delete_file": rel, "delete_count": n}
    )
    return n


def merge_vector_index(spark: SparkSession, index_dir: str) -> str:
    """Compact every live vector segment into one: union minus tombstones,
    re-partitioned by cell with the centroids REUSED (the mergeOneField
    analog, JVectorWriter.java:192-213: fold segments, drop deleted docs,
    reuse quantization state). Atomic + idempotent via the commit log; the
    tombstone state is rewritten in the same commit."""
    meta = IndexMeta(index_dir)
    inputs = _live_vector_segments(meta)
    if len(inputs) == 1 and meta.tombstone_count() == 0:
        return inputs[0]  # already compact, nothing to fold or drop
    digest = hashlib.sha1("|".join(sorted(inputs)).encode()).hexdigest()[:12]
    new_seg = f"vectors_m_{digest}"
    key = f"merge_{new_seg}"
    if meta.has_commit(key):
        return new_seg
    t0 = time.time()
    cells = _read_cells(spark, meta, inputs)
    dead_df = meta.tombstones_df(spark)
    if dead_df is not None:
        dead_here = (
            cells.select(F.col("vec_id").alias("doc_id"))
            .join(dead_df, "doc_id", "left_semi")
            .persist()
        )
        cells = cells.join(
            dead_here.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_anti"
        )
    # cell assignment is deterministic given the (reused) codebook: keep it
    _write_vector_segment(
        spark, meta, new_seg, cells, {"type": "ivf_merge", "inputs": inputs}, t0
    )
    extra = {"mode": "compact", "merge_wall_time_sec": time.time() - t0}
    if dead_df is not None:
        remaining = dead_df.join(dead_here, "doc_id", "left_anti")
        r_n = remaining.count()
        rel = None
        if r_n:
            rel = meta.delete_file_rel(f"reset_{new_seg}")
            remaining.write.mode("overwrite").parquet(
                os.path.join(meta.index_dir, rel)
            )
        extra.update({"tombstones_reset": True, "reset_file": rel, "reset_count": r_n})
        dead_here.unpersist()
    meta.append_commit(key, op="replace", adds=[new_seg], removes=inputs, extra=extra)
    return new_seg


def _live_vector_segments(meta: IndexMeta) -> list[str]:
    return [s for s in meta.live_segments()]


def _read_cells(spark, meta: IndexMeta, segs: list[str]) -> DataFrame:
    return read_parquet_union(
        spark, [_cells_path(meta, s) for s in segs], schema=_VEC_SCHEMA
    )


def search_vector_index(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 4,
    allow_ids: list[int] | None = None,
    space: str | None = None,
) -> DataFrame:
    """Top-k per query vector across every live segment, scanning only the
    probed cells (partition pruning), deleted vectors masked by an anti-join
    — returns (query_id, neighbor_id, cosine, rank). `space` defaults to the
    index's build-time space."""
    meta = IndexMeta(index_dir)
    cfg = meta.load_config()
    space = space or cfg.extra.get("space", "cosinesimil")
    C = _load_centroids(index_dir)
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    Q = np.array([q[1] for q in queries], dtype=np.float64)
    probes = np.argsort(-_space_similarities(Q, C, space), axis=1)[
        :, : min(nprobe, C.shape[0])
    ]
    cells = sorted({int(c) for row in probes for c in row})

    data = _read_cells(spark, meta, _live_vector_segments(meta)).where(
        F.col("cell").isin(cells)
    )
    dead = meta.tombstones_df(spark)
    if dead is not None:
        data = data.join(
            dead.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_anti"
        )
    if allow_ids is not None:
        data = data.where(F.col("vec_id").isin([int(i) for i in allow_ids]))

    bq = spark.sparkContext.broadcast((qids, Q, probes))

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, Q_, probes_ = bq.value
        probe_sets = [set(int(c) for c in row) for row in probes_]
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            ids = pdf["vec_id"].to_numpy(np.int64)
            cell = pdf["cell"].to_numpy(np.int64)
            S = _space_similarities(Q_, X, space)
            outs = []
            for qi in range(len(qids_)):
                m = np.isin(cell, list(probe_sets[qi])) & (ids != qids_[qi])
                if not m.any():
                    continue
                s = S[qi][m]
                kk = min(k, s.size)
                part = np.argpartition(-s, kk - 1)[:kk]
                outs.append(
                    pd.DataFrame(
                        {
                            "query_id": qids_[qi],
                            "neighbor_id": ids[m][part],
                            "cosine": s[part],
                        }
                    )
                )
            if outs:
                yield pd.concat(outs, ignore_index=True)

    local = data.mapInPandas(score, schema=out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("cosine"), 9)), F.asc("neighbor_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )
