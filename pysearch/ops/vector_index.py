"""Persisted IVF (inverted-file) vector index — the structural twin of the
reference's on-disk ANN index, Spark-first.

Reference lifecycle being mirrored:
* training a compact codebook once and encoding all vectors with it
  (PQ training, JVectorIndexQuantization.java:114-140)  ->  k-means
  centroids trained on a deterministic sample, persisted as the index's
  tiny metadata.
* per-segment immutable files + manifest (JVectorWriter.java:374-563)
  ->  vectors parquet partitioned by `cell`, centroids.json, manifest +
  commit log (REUSES pysearch.checkpoint.IndexMeta verbatim).
* approximate traversal + exact rerank (JVectorReader.java:166-174)
  ->  queries probe only the `nprobe` nearest cells (directory-level
  partition pruning: the scan never touches other cells' files), scores
  inside probed cells are EXACT cosine — recall is governed by nprobe,
  precision is always 1.0.
* filtered search (accept-bits)  ->  optional id allow-list pushed into
  the scan predicate.

At 100 TB: cells are the unit of pruning and of parallelism; `nlist`
scales with corpus size (sqrt(n) rule of thumb) while per-task memory stays
O(cell size); appends write new cell files (same commit-log idempotence).
"""

from __future__ import annotations

import json
import os
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pysearch.checkpoint import IndexMeta, _write_json_atomic
from pysearch.ops.similarity import _normalize, train_centroids

_VEC_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("cell", T.IntegerType()),
    ]
)


def build_vector_index(
    spark: SparkSession,
    emb: DataFrame,
    index_dir: str,
    nlist: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec: str = "embedding",
) -> IndexMeta:
    """Train centroids, assign every vector to its nearest cell, persist the
    cell-partitioned vector file + centroid codebook + manifest. Idempotent
    (commit-log keyed)."""
    from pysearch.config import IndexConfig

    meta = IndexMeta(index_dir)
    meta.initialize(IndexConfig(extra={"kind": "ivf", "nlist": nlist, "seed": seed}))
    if meta.has_commit("build_vectors"):
        return meta
    t0 = time.time()

    C = train_centroids(emb, nlist=nlist, seed=seed, id_col=id_col, vec=vec)
    _write_json_atomic(
        os.path.join(index_dir, "centroids.json"),
        {"nlist": int(C.shape[0]), "dim": int(C.shape[1]), "centroids": C.tolist()},
    )
    bC = spark.sparkContext.broadcast(C)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Cv = bC.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = _normalize(np.stack(pdf[vec].to_numpy()).astype(np.float64))
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(np.int64),
                    "embedding": pdf[vec],
                    "cell": np.argmax(X @ Cv.T, axis=1).astype(np.int32),
                }
            )

    out = emb.select(id_col, vec).mapInPandas(assign, schema=_VEC_SCHEMA)
    path = os.path.join(meta.segment_dir("vectors"), "cells.parquet")
    out.write.mode("overwrite").partitionBy("cell").parquet(path)

    written = spark.read.schema(_VEC_SCHEMA).parquet(path)
    per_cell = written.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    meta.write_manifest(
        "vectors",
        {
            "segment_id": "vectors",
            "num_docs": int(sum(r["n"] for r in per_cell)),
            "sum_dl": 0,
            "doc_id_min": -1,
            "doc_id_max": -1,
            "num_terms": int(C.shape[0]),
            "num_postings": int(sum(r["n"] for r in per_cell)),
            "config_fingerprint": meta.load_config().fingerprint(),
            "source": {"type": "ivf_build", "nlist": nlist, "seed": seed},
        },
    )
    meta.write_metrics(
        "vectors",
        [
            {"bucket": int(r["cell"]), "n_postings": int(r["n"]), "stage": "ivf_cell"}
            for r in per_cell
        ]
        + [
            {
                "bucket": -1,
                "n_postings": int(sum(r["n"] for r in per_cell)),
                "stage": "ivf_build_total",
                "wall_time_sec": time.time() - t0,
            }
        ],
    )
    meta.append_commit("build_vectors", op="add", adds=["vectors"])
    return meta


def search_vector_index(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 4,
    allow_ids: list[int] | None = None,
) -> DataFrame:
    """Top-k cosine per query vector, scanning only the probed cells
    (partition pruning) — returns (query_id, neighbor_id, cosine, rank)."""
    meta = IndexMeta(index_dir)
    cb = json.load(open(os.path.join(index_dir, "centroids.json")))
    C = np.array(cb["centroids"], dtype=np.float64)
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    Q = _normalize(np.array([q[1] for q in queries], dtype=np.float64))
    probes = np.argsort(-(Q @ C.T), axis=1)[:, : min(nprobe, C.shape[0])]
    cells = sorted({int(c) for row in probes for c in row})

    path = os.path.join(meta.segment_dir("vectors"), "cells.parquet")
    data = spark.read.schema(_VEC_SCHEMA).parquet(path).where(F.col("cell").isin(cells))
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
            X = _normalize(np.stack(pdf["embedding"].to_numpy()).astype(np.float64))
            ids = pdf["vec_id"].to_numpy(np.int64)
            cell = pdf["cell"].to_numpy(np.int64)
            S = Q_ @ X.T
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
