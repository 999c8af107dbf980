"""Similarity search over an embedding column (array<float>).

* brute-force cosine top-k — the exactness baseline: blocked numpy matmuls
  inside mapInPandas (each partition scores all queries against its shard of
  the corpus, emits partition-local top-k), then a global window top-k.
  One pass over the data, no cross join materialized.
* IVF (inverted-file) top-k — the 100 TB path: deterministic k-means
  centroids (seeded sample + Lloyd iterations on the driver — centroids are
  tiny metadata, like the reference's PQ codebooks,
  JVectorIndexQuantization.java:114-140), cluster assignment distributed,
  queries probe only the nearest `nprobe` cells. Recall vs brute force is
  asserted in pytest (the RecallTestsIT analog for the vector side).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _normalize(X: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(X, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return X / n


# ---------------------------------------------------------------------------
# similarity spaces (SpaceType.java:43-160 analog): each space defines a raw
# similarity (higher = more similar; distances are negated) and the
# reference's Lucene-range score translation.
# ---------------------------------------------------------------------------

SPACES = ("cosinesimil", "l2", "l1", "linf", "innerproduct", "hamming")

_POPCNT_TBL = np.array([bin(i).count("1") for i in range(256)], dtype=np.int32)


def _pack_binary(M: np.ndarray) -> np.ndarray:
    """Bit-pack rows at the 0.5 threshold: binary (0/1) vectors pack
    exactly; FRACTIONAL rows (k-means cell centroids over binary data)
    binarize to the per-bit majority — the hamming-median, the proper
    binary k-means representative."""
    return np.packbits(np.asarray(M, dtype=np.float64) > 0.5, axis=1)


# byte budget for the (nq_chunk, n, dim) intermediate the elementwise
# spaces (l1 / linf / hamming) materialize: the query axis is processed in
# chunks sized so the tensor stays cache-friendly and a 10^4-query call
# cannot OOM a worker (results identical — each query row is independent)
_PAIR_TENSOR_BUDGET = 1 << 27  # 128 MiB of float64 elements equivalent


def _space_similarities(Q: np.ndarray, X: np.ndarray, space: str) -> np.ndarray:
    """(nq, n) raw similarity matrix, higher = more similar. Distance spaces
    are negated so one descending sort serves every space. The elementwise
    spaces chunk the query axis to bound their (nq, n, dim) intermediate."""
    if space == "cosinesimil":
        return _normalize(Q) @ _normalize(X).T
    if space == "innerproduct":
        return Q @ X.T
    if space == "l2":
        # -||q - x||^2 via the expansion (one matmul, no pair loop)
        return -(
            (Q * Q).sum(axis=1)[:, None] + (X * X).sum(axis=1)[None, :] - 2 * (Q @ X.T)
        )
    if space in ("l1", "linf"):
        per_q = max(1, X.shape[0] * max(X.shape[1], 1) * 8)
        step = max(1, _PAIR_TENSOR_BUDGET // per_q)
        out = np.empty((Q.shape[0], X.shape[0]), dtype=np.float64)
        for q0 in range(0, Q.shape[0], step):
            q1 = min(q0 + step, Q.shape[0])
            D = np.abs(Q[q0:q1, None, :] - X[None, :, :])
            out[q0:q1] = -(D.sum(axis=2) if space == "l1" else D.max(axis=2))
        return out
    if space == "hamming":
        # binary vectors (SpaceType.java HAMMING): negative bit distance
        # via packbits + POPCNT lookup — dim/8 bytes per row in the xor
        # tensor instead of dim floats
        qb, xb = _pack_binary(Q), _pack_binary(X)
        per_q = max(1, xb.shape[0] * max(xb.shape[1], 1))
        step = max(1, _PAIR_TENSOR_BUDGET // per_q)
        out = np.empty((qb.shape[0], xb.shape[0]), dtype=np.float64)
        for q0 in range(0, qb.shape[0], step):
            q1 = min(q0 + step, qb.shape[0])
            out[q0:q1] = -_POPCNT_TBL[qb[q0:q1, None, :] ^ xb[None, :, :]].sum(
                axis=2
            ).astype(np.float64)
        return out
    raise ValueError(f"unknown space {space!r}; one of {SPACES}")


def space_score(space: str, sim: np.ndarray) -> np.ndarray:
    """The reference's scoreTranslation (SpaceType.java:43-160): map raw
    similarity to the Lucene-range score. Monotone in `sim` for every space,
    so ranks are translation-invariant."""
    if space == "cosinesimil":
        return np.maximum((2.0 - (1.0 - sim)) / 2.0, 0.0)  # (1+cos)/2
    if space == "l2":
        return 1.0 / (1.0 - sim)  # sim = -d^2  ->  1/(1+d^2)
    if space in ("l1", "linf", "hamming"):
        # hamming translation is the reference's 1/(1+d) with sim = -d
        return 1.0 / (1.0 - sim)
    if space == "innerproduct":
        # raw library score is -dot; translation: dot>=0 -> dot+1, else 1/(1-dot)
        return np.where(sim >= 0, sim + 1.0, 1.0 / (1.0 - sim))
    raise ValueError(f"unknown space {space!r}")


def similarity_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    space: str = "cosinesimil",
    id_col: str = "vec_id",
    vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact top-k neighbors for each query id in any supported space
    (SpaceType.java:43-160 analog: l2 / cosinesimil / innerproduct / l1 /
    linf). Returns (query_id, neighbor_id, sim, score, rank): `sim` is the
    raw similarity (distances negated), `score` the reference's
    Lucene-range translation, rank 1..k with neighbor-id tiebreak.

    Plan shape: broadcast queries -> partition-local vectorized top-k inside
    mapInPandas -> one global window. One pass over the data, no cross join.
    """
    spark = emb.sparkSession
    qrows = emb.where(F.col(id_col).isin([int(q) for q in query_ids])).select(
        id_col, vec
    ).collect()
    Q = np.array([r[vec] for r in qrows], dtype=np.float64)
    qids = np.array([r[id_col] for r in qrows], dtype=np.int64)
    bq = spark.sparkContext.broadcast((qids, Q))

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("sim", T.DoubleType()),
        ]
    )

    def score_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qids_, Q_ = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            S = _space_similarities(Q_, X, space)
            if exclude_self:
                for qi, qid in enumerate(qids_):
                    S[qi, ids == qid] = -np.inf
            kk = min(k, S.shape[1])
            part = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
            out = pd.DataFrame(
                {
                    "query_id": np.repeat(qids_, kk),
                    "neighbor_id": ids[part].ravel(),
                    "sim": np.take_along_axis(S, part, axis=1).ravel(),
                }
            )
            yield out[np.isfinite(out["sim"])]

    local = emb.select(id_col, vec).mapInPandas(score_part, schema=schema)
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("sim"), 9)), F.asc("neighbor_id")
    )
    sim = F.col("sim")
    if space == "cosinesimil":
        score = F.greatest((F.lit(1.0) + sim) / 2, F.lit(0.0))
    elif space == "innerproduct":
        score = F.when(sim >= 0, sim + 1).otherwise(1 / (1 - sim))
    else:  # l2 / l1 / linf: sim = -distance
        score = 1 / (1 - sim)
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("sim", 6).alias("sim"),
            F.round(score, 6).alias("score"),
            "rank",
        )
    )


def cosine_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec: str = "embedding",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query id. Returns
    (query_id, neighbor_id, cosine, rank) with rank 1..k, ties by neighbor id."""
    out = similarity_topk(
        emb, query_ids, k=k, space="cosinesimil",
        id_col=id_col, vec=vec, exclude_self=exclude_self,
    )
    return out.select(
        "query_id", "neighbor_id", F.col("sim").alias("cosine"), "rank"
    )


def hamming_topk(
    sigs: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "doc_id",
    sig_col: str = "simhash",
) -> DataFrame:
    """Exact hamming-distance top-k over 64-bit sketch signatures — the
    binary/hamming space (SpaceType.java HAMMING; KNNScoringUtil bit
    kernels), composed with any bit sketch (e.g. dedup.simhash_signatures).

    Pure JVM column expressions end to end: the tiny query side broadcasts,
    bit_count(xor) is codegen'd, one window ranks. Returns
    (query_id, neighbor_id, hamming, rank); reference score translation for
    hamming is 1/(1+d) (monotone, so ranks are translation-invariant)."""
    q = sigs.where(F.col(id_col).isin([int(x) for x in query_ids])).select(
        F.col(id_col).cast("long").alias("query_id"),
        F.col(sig_col).alias("_qsig"),
    )
    out = (
        sigs.select(
            F.col(id_col).cast("long").alias("neighbor_id"), F.col(sig_col)
        )
        .join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn(
            "hamming", F.bit_count(F.col(sig_col).bitwiseXOR(F.col("_qsig")))
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("neighbor_id")
    )
    return (
        out.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "hamming", "rank")
    )


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------

def train_centroids(
    emb: DataFrame,
    nlist: int = 16,
    iters: int = 5,
    sample: int = 2048,
    seed: int = 42,
    id_col: str = "vec_id",
    vec: str = "embedding",
    space: str = "cosinesimil",
) -> np.ndarray:
    """Deterministic mini k-means: seeded reservoir-free sample (lowest
    hashed ids — order-independent), kmeans++-lite init, `iters` Lloyd steps
    on the driver. Centroids are small metadata (nlist x dim).

    Spherical (unit-norm) k-means for the float spaces; `space="hamming"`
    switches to binary k-means — no normalization (a unit-normalized binary
    mean would pack to all-zero bits and collapse every centroid), fractional
    means kept as-is (their 0.5-threshold packing is the per-bit majority =
    the hamming-median), assignment by true bit distance."""
    rows = (
        emb.select(id_col, vec)
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(sample)
        .collect()
    )
    raw = np.array([r[vec] for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    if space == "hamming":
        X = raw
        C = X[rng.choice(len(X), size=min(nlist, len(X)), replace=False)].copy()
        for _ in range(iters):
            assign = np.argmax(_space_similarities(X, C, "hamming"), axis=1)
            for c in range(C.shape[0]):
                m = assign == c
                if m.any():
                    C[c] = X[m].mean(axis=0)
        return C
    X = _normalize(raw)
    C = X[rng.choice(len(X), size=min(nlist, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(C.shape[0]):
            m = assign == c
            if m.any():
                v = X[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    C[c] = v / n
    return C


def cosine_topk_ivf(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: vectors are assigned to their nearest
    centroid cell; each query scans only its `nprobe` nearest cells. The
    candidate scan reuses the exact brute-force kernel on the reduced set."""
    spark = emb.sparkSession
    C = train_centroids(emb, nlist=nlist, seed=seed, id_col=id_col, vec=vec)
    bC = spark.sparkContext.broadcast(C)

    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("cell", T.IntegerType())]
    )

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Cv = bC.value
        for pdf in batches:
            if not len(pdf):
                continue
            X = _normalize(np.stack(pdf[vec].to_numpy()).astype(np.float64))
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].to_numpy(dtype=np.int64),
                    "cell": np.argmax(X @ Cv.T, axis=1).astype(np.int32),
                }
            )

    cells = emb.select(id_col, vec).mapInPandas(assign, schema=schema)

    qrows = emb.where(F.col(id_col).isin([int(q) for q in query_ids])).select(id_col, vec).collect()
    Q = _normalize(np.array([r[vec] for r in qrows], dtype=np.float64))
    probes = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]
    probe_cells = sorted({int(c) for row in probes for c in row})

    cand_ids = cells.where(F.col("cell").isin(probe_cells)).select(
        F.col("id").alias(id_col)
    )
    cand = emb.join(cand_ids, id_col, "left_semi")
    return cosine_topk(cand, query_ids, k=k, id_col=id_col, vec=vec)
