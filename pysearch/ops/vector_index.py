"""Persisted IVF (inverted-file) vector index — the structural twin of the
reference's on-disk ANN index, Spark-first, with the FULL segment lifecycle
(the reference's signature feature):

* build      train a compact centroid codebook once and encode all vectors
             with it (PQ training, JVectorIndexQuantization.java:114-140) ->
             deterministic k-means on a seeded sample, persisted as tiny
             metadata; vectors land in cell-partitioned parquet under an
             immutable segment + manifest + commit log (REUSES
             pysearch.checkpoint.IndexMeta verbatim).
* quantize   optional int8 compression tier (JVectorIndexQuantization.java:
             45-140 analog): per-vector min/max scalar quantization stored in
             a `qcode` binary column NEXT TO the full-precision column —
             parquet column pruning means the approximate traversal reads
             1 byte/dim while the exact rerank fetches 4 bytes/dim for the
             few candidates only (the two-tier trigger-policy shape of
             JVectorWriter.java:263-283).
* append     new vectors become a NEW immutable segment assigned with the
             EXISTING centroids — the codebook/compression-state reuse analog
             (JVectorWriter.java:1072-1152: merged segments reuse the
             quantization state instead of retraining).
* delete     tombstone commits referencing parquet delete files (same
             scalable mechanics as the text index; liveDocs analog).
* merge      two modes, mirroring the text index exactly:
             - INCREMENTAL (default, JVectorWriter.java:1166-1341): cells are
               vec-disjoint across segments and address vectors by global id,
               so the merged cell set IS the union of the inputs' cell files
               — the merge is PURE METADATA: one manifest with storage
               pointers at the inputs' data dirs, zero bytes moved.
             - COMPACT (density guard / force): union minus tombstones,
               re-partitioned by cell, centroids REUSED (no retrain), inputs
               retired + tombstone state rewritten in one atomic commit —
               mergeOneField (JVectorWriter.java:192-213) re-expressed.
             plan_vector_merges adds the size-tiered background policy.
* search     probe only the `nprobe` nearest cells across every live segment
             (directory-level partition pruning), vectorized scoring over ALL
             queries at once in any supported space (SpaceType.java:43-160);
             deleted vectors are masked by a distributed anti-join, allowed
             sets arrive as an id DataFrame and semi-join (never literal
             id lists in the plan). Quantized indexes run approximate
             traversal over qcodes then exact rerank over full precision.

At 100 TB: cells are the unit of pruning and of parallelism; `nlist` scales
with corpus size (sqrt(n) rule of thumb) while per-task memory stays O(cell
size); appends add segments, incremental merges bound segment count at
metadata cost, compaction reclaims tombstones, the commit log makes every
step idempotent/resumable, and the quantized traversal cuts scan bytes 4x.
"""

from __future__ import annotations

import hashlib
import json
import os
import threading
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pysearch.checkpoint import IndexMeta, _write_json_atomic, read_parquet_union
from pysearch.ops.similarity import _space_similarities, train_centroids

_BASE_FIELDS = [
    T.StructField("vec_id", T.LongType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
    T.StructField("cell", T.IntegerType()),
]
_Q_FIELDS = [
    T.StructField("qcode", T.BinaryType()),
    T.StructField("qlo", T.DoubleType()),
    T.StructField("qstep", T.DoubleType()),
]
_VEC_SCHEMA = T.StructType(_BASE_FIELDS)
_VEC_SCHEMA_Q = T.StructType(_BASE_FIELDS + _Q_FIELDS)


def _schema_for(quantize: bool) -> T.StructType:
    return _VEC_SCHEMA_Q if quantize else _VEC_SCHEMA


def _cells_own_path(meta: IndexMeta, seg: str) -> str:
    return os.path.join(meta.segment_dir(seg), "cells.parquet")


def _cells_rel_split(meta: IndexMeta, seg: str) -> tuple[list[str], list[str]]:
    """Relative cell-data paths as (full_precision, quantized) lists,
    resolving manifest ``storage`` pointers — an incrementally-merged vector
    segment owns no files and reads its inputs' directories (the same
    pure-metadata resolution as the text index's postings/docmap/dictionary
    kinds). Quantized-ness is tracked per PATH because the trigger policy
    (quantize-if-large) can leave an index with mixed segments."""
    mf_path = os.path.join(meta.manifest_dir, f"{seg}.json")
    mf = json.load(open(mf_path)) if os.path.exists(mf_path) else {}
    st = mf.get("storage")
    if st and ("cells" in st or "cells_q" in st):
        return list(st.get("cells", [])), list(st.get("cells_q", []))
    own = [os.path.relpath(_cells_own_path(meta, seg), meta.index_dir)]
    return ([], own) if mf.get("quantized") else (own, [])


def _cells_rel(meta: IndexMeta, seg: str) -> list[str]:
    plain, quant = _cells_rel_split(meta, seg)
    return plain + quant


def _load_centroids(index_dir: str) -> np.ndarray:
    cb = json.load(open(os.path.join(index_dir, "centroids.json")))
    return np.array(cb["centroids"], dtype=np.float64)


# one-bit quantization state (OneBitScalarQuantizationState /
# QuantizationStateSerializer analog): per-dimension mean thresholds trained
# once from a deterministic sample, persisted as tiny metadata, REUSED by
# appends and merges (never retrained — the compression-state-reuse rule).

ONEBIT_SAMPLE_SIZE = 25_000  # reference DEFAULT_SAMPLE_SIZE


def _train_onebit_thresholds(
    emb: DataFrame, id_col: str, vec: str, sample: int = ONEBIT_SAMPLE_SIZE
) -> np.ndarray:
    """Per-dimension mean over a deterministic sample (lowest md5-hashed ids
    — order-independent, so resume reproduces it; the ReservoirSampler
    analog made deterministic), QuantizerHelper.calculateMeanThresholds."""
    rows = (
        emb.select(id_col, vec)
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(sample)
        .collect()
    )
    X = np.array([r[vec] for r in rows], dtype=np.float64)
    return X.mean(axis=0)


def _quant_state_path(index_dir: str) -> str:
    return os.path.join(index_dir, "quant_state.json")


def _load_onebit_thresholds(index_dir: str) -> np.ndarray:
    st = json.load(open(_quant_state_path(index_dir)))
    return np.array(st["thresholds"], dtype=np.float64)


# --- product quantization (subspace PQ) tier -------------------------------
# The reference's primary compression regime: per-subspace KMeans++ codebooks
# (JVectorIndexQuantization.java:114-140 computePqVectors — 256 clusters per
# subspace), trained ONCE on the deterministic sample and persisted/reused by
# appends and merges exactly like the one-bit thresholds (trained-state reuse,
# QuantizationState analog). A vector's code is m bytes (one centroid id per
# subspace) — at the default m = dim/4 that is 16x compression vs float32,
# the reference's "16x" compression_level, with better recall per byte than
# scalar tiers at high dimension.

PQ_CLUSTERS = 256
PQ_LLOYD_ITERS = 8

# Per-tier default rescore oversample (the CompressionLevel.java:33-61
# compression-level -> default-RescoreContext contract): lossier codes need a
# wider exact-rerank candidate superset. int8 keeps the historical 4; pq
# (m-byte subspace codes, ~2 bits/dim at the default m=dim/4) doubles it;
# onebit (1 bit/dim) collapses whole orthants to one code — the adversarial
# decoy construction in tests/test_vector_table_modes.py shows budgets below
# ~32x recalling 0/10, so its default is the 70x that provably covers it.
DEFAULT_RERANK_BY_TIER = {"int8": 4, "pq": 8, "onebit": 70}


def _default_pq_m(dim: int) -> int:
    """Reference default subspace counts (docs/user_guide.md:978-986:
    dim/4 up to ~1k dims, dim/8 above), snapped down to a divisor of dim."""
    target = max(dim // 4 if dim <= 1024 else dim // 8, 1)
    while dim % target:
        target -= 1
    return target


def _sq_dists(Xs: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Squared euclidean distances (n, k) via the expansion trick — no
    n x k x d intermediate tensor."""
    return (
        (Xs * Xs).sum(axis=1)[:, None]
        - 2.0 * (Xs @ C.T)
        + (C * C).sum(axis=1)[None, :]
    )


def _kmeanspp(Xs: np.ndarray, k: int, rng: np.random.Generator) -> np.ndarray:
    """KMeans++ init + Lloyd iterations over one subspace sample. Fully
    vectorized: assignment via the distance expansion, centroid update via
    per-dimension bincount."""
    n = Xs.shape[0]
    k = min(k, n)
    cents = [Xs[int(rng.integers(n))]]
    d2 = ((Xs - cents[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        tot = d2.sum()
        if tot <= 0:  # all points already coincide with a centroid
            cents.append(Xs[int(rng.integers(n))])
            continue
        nxt = Xs[int(rng.choice(n, p=d2 / tot))]
        cents.append(nxt)
        d2 = np.minimum(d2, ((Xs - nxt) ** 2).sum(axis=1))
    C = np.array(cents, dtype=np.float64)
    for _ in range(PQ_LLOYD_ITERS):
        a = _sq_dists(Xs, C).argmin(axis=1)
        cnt = np.bincount(a, minlength=C.shape[0]).astype(np.float64)
        sums = np.stack(
            [
                np.bincount(a, weights=Xs[:, d], minlength=C.shape[0])
                for d in range(Xs.shape[1])
            ],
            axis=1,
        )
        nz = cnt > 0
        C[nz] = sums[nz] / cnt[nz, None]
    return C


def _train_pq_codebooks(
    emb: DataFrame,
    id_col: str,
    vec: str,
    m: int,
    seed: int,
    sample: int = ONEBIT_SAMPLE_SIZE,
) -> np.ndarray:
    """(m, PQ_CLUSTERS, dim/m) codebooks from the SAME deterministic
    lowest-md5 sample the one-bit trainer uses — resume/append reproduce the
    identical state without retraining. When the sample has fewer than
    PQ_CLUSTERS rows the trailing codebook slots repeat earlier centroids
    (argmin picks the first occurrence, so padded slots are never coded)."""
    rows = (
        emb.select(id_col, vec)
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(sample)
        .collect()
    )
    X = np.array([r[vec] for r in rows], dtype=np.float64)
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"pq_m={m} must divide dim={dim}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    cb = np.empty((m, PQ_CLUSTERS, dsub), dtype=np.float64)
    for j in range(m):
        C = _kmeanspp(X[:, j * dsub : (j + 1) * dsub], PQ_CLUSTERS, rng)
        reps = -(-PQ_CLUSTERS // C.shape[0])
        cb[j] = np.tile(C, (reps, 1))[:PQ_CLUSTERS]
    return cb


def _pq_codes(X: np.ndarray, cb: np.ndarray) -> list[bytes]:
    """Encode rows to m-byte codes: nearest codebook centroid per subspace."""
    n = X.shape[0]
    m, _, dsub = cb.shape
    codes = np.empty((n, m), dtype=np.uint8)
    for j in range(m):
        d = _sq_dists(X[:, j * dsub : (j + 1) * dsub], cb[j])
        codes[:, j] = d.argmin(axis=1).astype(np.uint8)
    return [c.tobytes() for c in codes]


def _pq_decode(raw: bytes, n: int, cb: np.ndarray) -> np.ndarray:
    """Reconstruct approximate float vectors from concatenated m-byte codes
    — one gather per subspace, no per-row loop (the _dequantize analog)."""
    m = cb.shape[0]
    codes = np.frombuffer(raw, dtype=np.uint8).reshape(n, m)
    return np.concatenate([cb[j][codes[:, j]] for j in range(m)], axis=1)


def _load_quant_state(index_dir: str, quant_kind: str):
    """Trained-state tuple for the broadcast: ("onebit", thresholds) |
    ("pq", codebooks) | None (int8 needs no trained state)."""
    if quant_kind == "onebit":
        return ("onebit", _load_onebit_thresholds(index_dir))
    if quant_kind == "pq":
        st = json.load(open(_quant_state_path(index_dir)))
        return ("pq", np.array(st["codebooks"], dtype=np.float64))
    return None


# single popcount lookup table for the whole package (defined alongside the
# hamming space + _pack_binary it serves)
from pysearch.ops.similarity import _POPCNT_TBL as _POPCNT  # noqa: E402


def _onebit_codes(X: np.ndarray, thr: np.ndarray) -> list[bytes]:
    bits = np.packbits(X > thr[None, :], axis=1)
    return [b.tobytes() for b in bits]


def _quant_columns(out: pd.DataFrame, X: np.ndarray, state) -> None:
    """Attach the compression-tier columns in place: `state` is the trained
    quant-state tuple — ("onebit", thresholds) bit codes, ("pq", codebooks)
    m-byte subspace codes, or None for int8 min/max codes. THE single encode
    path — build, append and compact-merge all route through it so codes can
    never diverge between write sites."""
    if state is not None and state[0] == "onebit":
        out["qcode"] = _onebit_codes(X, state[1])
        out["qlo"] = 0.0
        out["qstep"] = 0.0
    elif state is not None and state[0] == "pq":
        out["qcode"] = _pq_codes(X, state[1])
        out["qlo"] = 0.0
        out["qstep"] = 0.0
    else:
        codes, lo, step = _quantize_rows(X)
        out["qcode"] = codes
        out["qlo"] = lo
        out["qstep"] = step


def _quantize_rows(X: np.ndarray) -> tuple[list[bytes], np.ndarray, np.ndarray]:
    """Per-vector min/max int8 scalar quantization (vectorized over the
    batch). code = round((x - lo) / step), step = (hi - lo) / 255."""
    lo = X.min(axis=1)
    hi = X.max(axis=1)
    step = (hi - lo) / 255.0
    step = np.where(step <= 0, 1.0, step)
    codes = np.rint((X - lo[:, None]) / step[:, None]).astype(np.uint8)
    return [c.tobytes() for c in codes], lo, step


def _dequantize(pdf: pd.DataFrame) -> np.ndarray:
    """Reconstruct approximate float vectors from the qcode/qlo/qstep
    columns — one frombuffer over the concatenated codes, no per-row loop."""
    raw = b"".join(pdf["qcode"])
    n = len(pdf)
    codes = np.frombuffer(raw, dtype=np.uint8).reshape(n, -1).astype(np.float64)
    lo = pdf["qlo"].to_numpy(np.float64)
    step = pdf["qstep"].to_numpy(np.float64)
    return lo[:, None] + codes * step[:, None]


def _assign_factory(
    bC, space: str, id_col: str, vec: str, quantize: bool, bthr=None
):
    """Nearest-centroid assignment in the index's space (centroids are unit
    vectors from spherical k-means; l2 uses true distances to them), plus
    the optional compression tier: int8 min/max codes, or one-bit/pq codes
    when a trained-state broadcast (`_load_quant_state` tuple) is supplied."""

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Cv = bC.value
        thr = bthr.value if bthr is not None else None
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec].to_numpy()).astype(np.float64)
            S = _space_similarities(X, Cv, space)  # higher = closer
            out = pd.DataFrame(
                {
                    "vec_id": pdf[id_col].to_numpy(np.int64),
                    "embedding": pdf[vec],
                    "cell": np.argmax(S, axis=1).astype(np.int32),
                }
            )
            if quantize:
                _quant_columns(out, X, thr)
            yield out

    return assign


def _write_vector_segment(
    spark,
    meta: IndexMeta,
    seg: str,
    assigned: DataFrame,
    source: dict,
    t0: float,
    quantized: bool,
) -> None:
    cfg = meta.load_config()
    path = _cells_own_path(meta, seg)
    assigned.write.mode("overwrite").partitionBy("cell").parquet(path)
    written = spark.read.schema(_schema_for(quantized)).parquet(path)
    per_cell = written.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    total = int(sum(r["n"] for r in per_cell))
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
            "quantized": bool(quantized),
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


def _quantize_segment(cfg, n_rows_fn) -> bool:
    """The quantize-if-large trigger policy (JVectorWriter.java:263-283,
    MINIMUM_BATCH_SIZE_FOR_QUANTIZATION analog): the tier applies only when
    the segment is big enough to be worth compressing. `n_rows_fn` is lazy —
    no count job when the threshold is 0 (always) or the tier is off."""
    if not cfg.extra.get("quantize"):
        return False
    min_rows = int(cfg.extra.get("min_quant_rows", 0))
    return True if min_rows <= 0 else n_rows_fn() >= min_rows


def build_vector_index(
    spark: SparkSession,
    emb: DataFrame,
    index_dir: str,
    nlist: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec: str = "embedding",
    space: str = "cosinesimil",
    quantize: bool = False,
    min_quant_rows: int = 0,
    quant_kind: str = "int8",
    pq_m: int | None = None,
) -> IndexMeta:
    """Train centroids, assign every vector to its nearest cell, persist the
    cell-partitioned vector segment + centroid codebook + manifest.
    ``quantize=True`` adds a compression tier next to the full-precision
    column — ``quant_kind="int8"`` (per-vector min/max scalar codes),
    ``"onebit"`` (per-dimension mean-threshold bit codes, the
    OneBitScalarQuantizer analog: 1 bit/dim, hamming traversal), or
    ``"pq"`` (subspace product quantization, the computePqVectors analog:
    ``pq_m`` KMeans++ codebooks of 256 centroids each, m bytes/vector;
    default m follows the reference's dim->subspaces table = 16x
    compression at dim/4) — per segment, only when the segment has at
    least ``min_quant_rows`` vectors (the reference's quantize-if-large
    trigger; search handles mixed indexes). Idempotent (commit-log
    keyed)."""
    from pysearch.config import IndexConfig

    if quant_kind not in ("int8", "onebit", "pq"):
        raise ValueError("quant_kind must be 'int8', 'onebit' or 'pq'")
    meta = IndexMeta(index_dir)
    meta.initialize(
        IndexConfig(
            extra={
                "kind": "ivf",
                "nlist": nlist,
                "seed": seed,
                "space": space,
                "quantize": bool(quantize),
                "min_quant_rows": int(min_quant_rows),
                "quant_kind": quant_kind,
            }
        )
    )
    if meta.has_commit("build_vectors"):
        return meta
    t0 = time.time()
    cfg = meta.load_config()
    q_seg = _quantize_segment(cfg, emb.count)

    C = train_centroids(
        emb, nlist=nlist, seed=seed, id_col=id_col, vec=vec, space=space
    )
    _write_json_atomic(
        os.path.join(index_dir, "centroids.json"),
        {"nlist": int(C.shape[0]), "dim": int(C.shape[1]), "centroids": C.tolist()},
    )
    bthr = None
    if quantize and quant_kind == "onebit":
        thr = _train_onebit_thresholds(emb, id_col, vec)
        _write_json_atomic(
            _quant_state_path(index_dir),
            {"kind": "onebit", "dim": int(thr.size), "thresholds": thr.tolist()},
        )
        bthr = spark.sparkContext.broadcast(("onebit", thr))
    elif quantize and quant_kind == "pq":
        dim = int(C.shape[1])
        m = int(pq_m) if pq_m is not None else _default_pq_m(dim)
        cb = _train_pq_codebooks(emb, id_col, vec, m, seed)
        _write_json_atomic(
            _quant_state_path(index_dir),
            {
                "kind": "pq", "dim": dim, "m": m,
                "clusters": PQ_CLUSTERS, "codebooks": cb.tolist(),
            },
        )
        bthr = spark.sparkContext.broadcast(("pq", cb))
    bC = spark.sparkContext.broadcast(C)
    assigned = emb.select(id_col, vec).mapInPandas(
        _assign_factory(bC, space, id_col, vec, q_seg, bthr=bthr),
        schema=_schema_for(q_seg),
    )
    _write_vector_segment(
        spark, meta, "vectors", assigned,
        {"type": "ivf_build", "nlist": nlist, "seed": seed, "space": space},
        t0, quantized=q_seg,
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
    JVectorWriter.java:1072-1152 — no retraining; the quantization tier +
    its size trigger are inherited from the index config, so a small NRT
    batch stays full-precision and a bulk append compresses). Idempotent
    per `key`."""
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
    q_seg = _quantize_segment(cfg, emb.count)
    bC = spark.sparkContext.broadcast(_load_centroids(index_dir))
    bthr = None
    if q_seg:
        # quantization-state REUSE: trained thresholds/codebooks, never
        # retrained (None for int8, which needs no trained state)
        state = _load_quant_state(index_dir, cfg.extra.get("quant_kind", "int8"))
        if state is not None:
            bthr = spark.sparkContext.broadcast(state)
    assigned = emb.select(id_col, vec).mapInPandas(
        _assign_factory(
            bC, cfg.extra.get("space", "cosinesimil"), id_col, vec, q_seg, bthr=bthr
        ),
        schema=_schema_for(q_seg),
    )
    _write_vector_segment(
        spark, meta, seg, assigned, {"type": "ivf_append", "key": key}, t0,
        quantized=q_seg,
    )
    meta.append_commit(commit_key, op="add", adds=[seg])
    return seg


def delete_vectors(
    spark: SparkSession,
    index_dir: str,
    key: str,
    vec_ids: list[int] | None = None,
    where: str | None = None,
    vec_ids_df: DataFrame | None = None,
) -> int:
    """Tombstone vectors by id list, id DataFrame (the fully-distributed
    path), or predicate over (vec_id, cell) — the same parquet-delete-file
    mechanics as the text index (ids never inlined in JSON or plans).
    Searches mask them immediately; a compact merge drops them."""
    meta = IndexMeta(index_dir)
    if meta.has_commit(f"delete_{key}"):
        return 0
    if vec_ids_df is not None:
        dead = vec_ids_df.select(F.col("vec_id").cast("long").alias("doc_id")).distinct()
    elif vec_ids is None:
        if where is None:
            raise ValueError("need vec_ids, vec_ids_df or where")
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


# ---------------------------------------------------------------------------
# merge: size-tiered planner + incremental (pure metadata) / compact modes —
# the text index's merge algebra applied to the vector twin (cells are
# vec-disjoint across segments, exactly like posting blocks are doc-disjoint)
# ---------------------------------------------------------------------------

def plan_vector_merges(meta: IndexMeta, merge_factor: int = 4) -> list[list[str]]:
    """Size-tiered planner over the manifest table (merge.plan_merges twin):
    segments whose live-vector counts share a log2 tier merge once
    >= merge_factor of them pile up. Driver-side, tiny metadata."""
    tiers: dict[int, list[str]] = {}
    for seg in _live_vector_segments(meta):
        m = meta.read_manifest(seg)
        tier = -1 if m["num_docs"] == 0 else int(np.log2(max(m["num_docs"], 1)))
        tiers.setdefault(tier, []).append(seg)
    plans = []
    for tier in sorted(tiers):
        segs = sorted(tiers[tier])
        while len(segs) >= merge_factor:
            plans.append(segs[:merge_factor])
            segs = segs[merge_factor:]
    return plans


def run_vector_merge_round(
    spark: SparkSession, index_dir: str, merge_factor: int = 4
) -> list[str]:
    """One background-merge round over the tiered planner's picks."""
    meta = IndexMeta(index_dir)
    return [
        merge_vector_index(spark, index_dir, segs=group)
        for group in plan_vector_merges(meta, merge_factor)
    ]


def merge_vector_index(
    spark: SparkSession,
    index_dir: str,
    segs: list[str] | None = None,
    compact: bool | None = None,
    max_tombstone_density: float = 0.4,
) -> str:
    """Merge vector segments. Default mode is chosen by the reference's
    density guard (JVectorWriter.java:695-699): below
    ``max_tombstone_density`` the merge is INCREMENTAL — pure metadata, one
    manifest pointing at every input's cell directories, zero data bytes
    moved (the JVectorWriter.java:1166-1341 incremental-graph-merge analog;
    valid because cells are vec-disjoint and address vectors by global id) —
    otherwise (or with compact=True) it COMPACTS: union minus tombstones,
    re-partitioned by cell with the centroids REUSED (mergeOneField,
    JVectorWriter.java:192-213; compression state :1072-1152). Atomic +
    idempotent via the commit log; compaction rewrites the tombstone state
    in the same commit."""
    meta = IndexMeta(index_dir)
    inputs = sorted(segs) if segs is not None else _live_vector_segments(meta)
    tomb_n = meta.tombstone_count()
    if len(inputs) == 1 and tomb_n == 0:
        return inputs[0]  # already compact, nothing to fold or drop

    def seg_name(c: bool) -> str:
        digest = hashlib.sha1(
            ("|".join(inputs) + f"|compact={c}").encode()
        ).hexdigest()[:12]
        return f"vectors_m_{digest}"

    # idempotent replay short-circuits BEFORE any data job (an auto merge
    # resolved to one of the two digests on its first run)
    for c in ((False, True) if compact is None else (compact,)):
        if meta.has_commit(f"merge_{seg_name(c)}"):
            return seg_name(c)

    total = sum(meta.read_manifest(s)["num_docs"] for s in inputs)
    dead_df = meta.tombstones_df(spark)
    dead_here = None
    n_dead = 0
    # the dead-rows scan only matters to resolve the density guard or to
    # drop rows in a compaction — an EXPLICIT incremental merge stays pure
    # metadata with zero data jobs
    if dead_df is not None and compact is not False:
        dead_here = (
            _read_cells(spark, meta, inputs)
            .select(F.col("vec_id").alias("doc_id"))
            .join(dead_df, "doc_id", "left_semi")
            .persist()
        )
        n_dead = dead_here.count()
    if compact is None:
        compact = (n_dead / total if total else 0.0) > max_tombstone_density
        if not compact:
            # pointer-growth guard (merge.MAX_INCREMENTAL_POINTERS twin):
            # chained incremental merges flatten pointers transitively; past
            # the cap the auto policy compacts so a manifest never fans out
            # to unbounded directories
            from pysearch.merge import MAX_INCREMENTAL_POINTERS

            pointers = 0
            for s in inputs:
                p, q = _cells_rel_split(meta, s)
                pointers += len(p) + len(q)
            compact = pointers > MAX_INCREMENTAL_POINTERS

    new_seg = seg_name(compact)
    key = f"merge_{new_seg}"
    t0 = time.time()

    if compact:
        cfg = meta.load_config()
        cells = _read_cells(spark, meta, inputs)
        if dead_here is not None:
            cells = cells.join(
                dead_here.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_anti"
            )
        # cell assignment is deterministic given the (reused) codebook: keep
        # it; the quantize-if-large policy re-evaluates on the MERGED size
        # (small full-precision appends compress once folded into a big
        # segment — per-vector min/max codes are deterministic, so this is
        # state reuse, not retraining)
        q_out = _quantize_segment(cfg, lambda: total - n_dead)
        if q_out:
            state = _load_quant_state(
                index_dir, cfg.extra.get("quant_kind", "int8")
            )
            bthr = (
                spark.sparkContext.broadcast(state)
                if state is not None
                else None
            )

            def requant(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                thr = bthr.value if bthr is not None else None
                for pdf in batches:
                    if not len(pdf):
                        continue
                    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                    out = pdf[["vec_id", "embedding", "cell"]].copy()
                    _quant_columns(out, X, thr)
                    yield out

            cells = cells.mapInPandas(requant, schema=_VEC_SCHEMA_Q)
        _write_vector_segment(
            spark, meta, new_seg, cells,
            {"type": "ivf_merge", "inputs": inputs, "mode": "compact"}, t0,
            quantized=q_out,
        )
    else:
        _incremental_vector_manifest(spark, meta, inputs, new_seg, t0)

    extra = {"mode": "compact" if compact else "incremental",
             "merge_wall_time_sec": time.time() - t0}
    if compact and dead_df is not None:
        remaining = dead_df.join(dead_here, "doc_id", "left_anti")
        r_n = remaining.count()
        rel = None
        if r_n:
            rel = meta.delete_file_rel(f"reset_{new_seg}")
            remaining.write.mode("overwrite").parquet(
                os.path.join(meta.index_dir, rel)
            )
        extra.update({"tombstones_reset": True, "reset_file": rel, "reset_count": r_n})
    if dead_here is not None:
        dead_here.unpersist()
    meta.append_commit(key, op="replace", adds=[new_seg], removes=inputs, extra=extra)
    return new_seg


def _incremental_vector_manifest(spark, meta, inputs, new_seg, t0):
    """The pure-metadata vector merge: manifest storage pointers at every
    input's cell directories — no file moved, linked or rewritten (identical
    on object stores). Pointer lists flatten transitively through chained
    incremental merges; retired inputs' directories stay referenced and are
    protected from GC (admin.gc_segments reads manifest storage)."""
    cfg = meta.load_config()
    manifests = [meta.read_manifest(s) for s in inputs]
    plain, quant = [], []
    for s in inputs:
        p, q = _cells_rel_split(meta, s)
        plain += p
        quant += q
    # per-path tier tracking survives the pointer merge (mixed indexes)
    storage = {"cells": plain, "cells_q": quant}
    meta.write_manifest(
        new_seg,
        {
            "segment_id": new_seg,
            "num_docs": int(sum(m["num_docs"] for m in manifests)),
            "sum_dl": 0,
            "doc_id_min": -1,
            "doc_id_max": -1,
            "num_terms": int(cfg.extra.get("nlist", 0)),
            "num_postings": int(sum(m["num_postings"] for m in manifests)),
            "config_fingerprint": cfg.fingerprint(),
            "source": {"type": "ivf_merge", "inputs": inputs, "mode": "incremental"},
            "storage": storage,
        },
    )
    meta.write_metrics(
        new_seg,
        [
            {
                "bucket": -1,
                "n_postings": int(sum(m["num_postings"] for m in manifests)),
                "payload_bytes": 0,  # zero bytes moved — the merge IS the manifest
                "stage": "ivf_merge_incremental_total",
                "num_docs": int(sum(m["num_docs"] for m in manifests)),
                "wall_time_sec": time.time() - t0,
            }
        ],
    )


def _live_vector_segments(meta: IndexMeta) -> list[str]:
    return [s for s in meta.live_segments()]


def _cells_paths_split(meta: IndexMeta, segs: list[str]) -> tuple[list[str], list[str]]:
    plain, quant = [], []
    for s in segs:
        p, q = _cells_rel_split(meta, s)
        plain += p
        quant += q
    return meta._abs(plain), meta._abs(quant)


def _read_paths(spark, paths: list[str], columns: list[str]) -> DataFrame:
    schema = T.StructType(
        [f for f in _VEC_SCHEMA_Q.fields if f.name in columns]
    )
    return read_parquet_union(spark, paths, schema=schema)


def _read_cells(
    spark, meta: IndexMeta, segs: list[str], columns: list[str] | None = None
) -> DataFrame:
    """Full-precision view over every segment (quantized files also carry
    the float column, so the base schema reads uniformly across a mixed
    index)."""
    plain, quant = _cells_paths_split(meta, segs)
    return _read_paths(
        spark, plain + quant, columns or ["vec_id", "embedding", "cell"]
    )


# ---------------------------------------------------------------------------
# search
# ---------------------------------------------------------------------------

# queries scored per executor-batch slice: bounds the (queries x batch)
# similarity matrix — and the onebit (queries x batch x dim/8) XOR tensor —
# to _QUERY_CHUNK rows regardless of how many queries the caller passes, so
# a 10^4+-entry driver list degrades gracefully instead of OOMing a worker
_QUERY_CHUNK = 1024


def _topk_kernel_factory(bq, space: str, k_out: int, quantized):
    """Per-batch vectorized top-k: one similarity matrix per QUERY SLICE
    (<= _QUERY_CHUNK queries at a time), one probe-membership mask indexed
    by cell (no per-query Python loop), one argpartition along axis 1.
    `quantized` is False (score exact floats), "int8" (score dequantized
    approximations), "pq" (score subspace-codebook reconstructions —
    m bytes/vector scanned) or "onebit" (score negative hamming over
    packed bit codes — 1 bit/dim scanned)."""

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # probe_mask: (nq, nlist); qextra: packed query bits (onebit) or
        # the pq codebooks, per tier
        qids_, Q_, probe_mask, qextra = bq.value
        nq = qids_.size
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf["vec_id"].to_numpy(np.int64)
            cell = pdf["cell"].to_numpy(np.int64)
            if quantized == "onebit":
                codes = np.frombuffer(b"".join(pdf["qcode"]), np.uint8).reshape(
                    len(pdf), -1
                )
                X = None
            elif quantized == "pq":
                codes = None
                X = _pq_decode(b"".join(pdf["qcode"]), len(pdf), qextra)
            else:
                codes = None
                X = _dequantize(pdf) if quantized else np.stack(
                    pdf["embedding"].to_numpy()
                ).astype(np.float64)
            parts = []
            for q0 in range(0, nq, _QUERY_CHUNK):
                q1 = min(q0 + _QUERY_CHUNK, nq)
                if codes is not None:
                    xor = qextra[q0:q1, None, :] ^ codes[None, :, :]
                    S = -_POPCNT[xor].sum(axis=2).astype(np.float64)
                else:
                    S = _space_similarities(Q_[q0:q1], X, space)
                mask = probe_mask[q0:q1][:, cell] & (
                    ids[None, :] != qids_[q0:q1, None]
                )
                S = np.where(mask, S, -np.inf)
                kk = min(k_out, S.shape[1])
                part = np.argpartition(-S, kk - 1, axis=1)[:, :kk]
                sims = np.take_along_axis(S, part, axis=1).ravel()
                fin = np.isfinite(sims)
                parts.append(
                    (
                        np.repeat(qids_[q0:q1], kk)[fin],
                        ids[part.ravel()][fin],
                        sims[fin],
                    )
                )
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate([p[0] for p in parts]),
                    "neighbor_id": np.concatenate([p[1] for p in parts]),
                    "sim": np.concatenate([p[2] for p in parts]),
                }
            )

    return score


def _space_sim_rowwise(Qr: np.ndarray, X: np.ndarray, space: str) -> np.ndarray:
    """Row-aligned similarity: sim(Qr[i], X[i]) for each i (the exact-rerank
    kernel — one einsum, no pair matrix)."""
    if space == "cosinesimil":
        qn = Qr / np.maximum(np.linalg.norm(Qr, axis=1, keepdims=True), 1e-300)
        xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-300)
        return np.einsum("ij,ij->i", qn, xn)
    if space == "innerproduct":
        return np.einsum("ij,ij->i", Qr, X)
    if space == "l2":
        d = Qr - X
        return -np.einsum("ij,ij->i", d, d)
    if space == "l1":
        return -np.abs(Qr - X).sum(axis=1)
    if space == "linf":
        return -np.abs(Qr - X).max(axis=1)
    if space == "hamming":
        from pysearch.ops.similarity import _pack_binary

        qb, xb = _pack_binary(Qr), _pack_binary(X)
        return -_POPCNT[qb ^ xb].sum(axis=1).astype(np.float64)
    raise ValueError(f"unknown space {space!r}")


_OUT_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("sim", T.DoubleType()),
    ]
)


def _group_cut(qids, nids, sim, kks):
    """Per-batch per-query cut: keep every row whose half-up-quantized
    score (floor(sim*1e9+0.5) — the same rounding the global window
    ranks by) is within ONE quantum of the per-query kks-th best (kks is
    per-ROW, constant within a query — the method_parameters k). This is
    the tie-inclusive THRESHOLD form the text batch kernel uses — a
    provable superset of the per-query top-k under the window's rounded
    ordering, with no fixed positional-slack assumption (a positional
    cut could drop a global-top-k row if >slack rounding-boundary ties
    landed in one batch)."""
    r = np.floor(sim * 1e9 + 0.5)
    order = np.lexsort((nids, -r, qids))
    qids, nids, sim, r, kks = (
        qids[order], nids[order], sim[order], r[order], kks[order]
    )
    starts = np.flatnonzero(np.concatenate(([True], qids[1:] != qids[:-1])))
    counts = np.diff(np.concatenate((starts, [qids.size])))
    kth = np.repeat(
        r[starts + np.minimum(kks[starts] - 1, counts - 1)], counts
    )
    keep = r >= kth - 1.0
    return qids[keep], nids[keep], sim[keep], keep


def _flat_pairs(S, pq, nid):
    """Flatten a (nq, nx) similarity matrix into pair arrays with the self
    pair removed: (qids, nids, sim, probe_row_index)."""
    nq, nx = S.shape
    qids = np.repeat(pq, nx)
    nids = np.tile(nid, nq)
    sim = S.ravel()
    pidx = np.repeat(np.arange(nq, dtype=np.int64), nx)
    keep = nids != qids
    return qids[keep], nids[keep], sim[keep], pidx[keep]


def _cell_exact_kernel(space):
    """Cogrouped per-(cell, salt) EXACT scoring kernel for the query-table
    path: one similarity matrix per group (each query embedding and each
    data vector crosses the Arrow boundary ONCE — the old per-pair join
    shipped q_emb once per candidate pair, dim x 8 bytes each), then the
    same tie-inclusive per-query cut as the pair kernel on the flattened
    scores. Query axis chunked to bound the matrix."""

    def kern(probes_pdf: pd.DataFrame, data_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "query_id": pd.Series(dtype="int64"),
                "neighbor_id": pd.Series(dtype="int64"),
                "sim": pd.Series(dtype="float64"),
            }
        )
        if not len(probes_pdf) or not len(data_pdf):
            return empty
        Q = np.stack(probes_pdf["q_emb"].to_numpy())
        pq = probes_pdf["query_id"].to_numpy(np.int64)
        pk = probes_pdf["_k"].to_numpy(np.int64)
        X = np.stack(data_pdf["embedding"].to_numpy()).astype(np.float64)
        nid = data_pdf["vec_id"].to_numpy(np.int64)
        outs = []
        for q0 in range(0, pq.size, _QUERY_CHUNK):
            q1 = min(q0 + _QUERY_CHUNK, pq.size)
            S = _space_similarities(Q[q0:q1], X, space)
            qids, nids, sim, pidx = _flat_pairs(S, pq[q0:q1], nid)
            if not qids.size:
                continue
            kks = pk[q0:q1][pidx]
            qids, nids, sim, _ = _group_cut(qids, nids, sim, kks)
            outs.append((qids, nids, sim))
        if not outs:
            return empty
        return pd.DataFrame(
            {
                "query_id": np.concatenate([o[0] for o in outs]),
                "neighbor_id": np.concatenate([o[1] for o in outs]),
                "sim": np.concatenate([o[2] for o in outs]),
            }
        )

    return kern


def _cell_radial_kernel(space, thr_scalar):
    """Cogrouped per-(cell, salt) RADIAL kernel: matrix scoring, then the
    per-row threshold filter (thr_scalar, or the probe row's _ms when the
    table mixes radial and top-k rows)."""

    def kern(probes_pdf: pd.DataFrame, data_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "query_id": pd.Series(dtype="int64"),
                "neighbor_id": pd.Series(dtype="int64"),
                "sim": pd.Series(dtype="float64"),
            }
        )
        if not len(probes_pdf) or not len(data_pdf):
            return empty
        Q = np.stack(probes_pdf["q_emb"].to_numpy())
        pq = probes_pdf["query_id"].to_numpy(np.int64)
        thr_all = (
            np.full(pq.size, thr_scalar)
            if thr_scalar is not None
            else probes_pdf["_ms"].to_numpy(np.float64)
        )
        X = np.stack(data_pdf["embedding"].to_numpy()).astype(np.float64)
        nid = data_pdf["vec_id"].to_numpy(np.int64)
        outs = []
        for q0 in range(0, pq.size, _QUERY_CHUNK):
            q1 = min(q0 + _QUERY_CHUNK, pq.size)
            S = _space_similarities(Q[q0:q1], X, space)
            qids, nids, sim, pidx = _flat_pairs(S, pq[q0:q1], nid)
            keep = sim >= thr_all[q0:q1][pidx]
            if not keep.any():
                continue
            outs.append((qids[keep], nids[keep], sim[keep]))
        if not outs:
            return empty
        return pd.DataFrame(
            {
                "query_id": np.concatenate([o[0] for o in outs]),
                "neighbor_id": np.concatenate([o[1] for o in outs]),
                "sim": np.concatenate([o[2] for o in outs]),
            }
        )

    return kern


def _cell_approx_kernel(space, bstate):
    """Cogrouped per-(cell, salt) APPROX-tier kernel: scores the compressed
    column (int8 dequantized / pq reconstruction / onebit hamming) as one
    matrix per group and keeps the per-query top-_kt candidates with exactly
    the pair kernel's positional cut; emits (query_id, neighbor_id, q_emb)
    for the exact rerank join."""

    def kern(probes_pdf: pd.DataFrame, data_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "query_id": pd.Series(dtype="int64"),
                "neighbor_id": pd.Series(dtype="int64"),
                "q_emb": pd.Series(dtype="object"),
            }
        )
        if not len(probes_pdf) or not len(data_pdf):
            return empty
        state = bstate.value if bstate is not None else None
        Q = np.stack(probes_pdf["q_emb"].to_numpy())
        pq = probes_pdf["query_id"].to_numpy(np.int64)
        pkt = probes_pdf["_kt"].to_numpy(np.int64)
        q_embs = probes_pdf["q_emb"].to_numpy()
        nid = data_pdf["vec_id"].to_numpy(np.int64)
        if state is not None and state[0] == "onebit":
            thr = state[1]
            xb = np.frombuffer(b"".join(data_pdf["qcode"]), np.uint8).reshape(
                len(data_pdf), -1
            )
            Xa = None
        else:
            xb = None
            Xa = (
                _pq_decode(b"".join(data_pdf["qcode"]), len(data_pdf), state[1])
                if state is not None and state[0] == "pq"
                else _dequantize(data_pdf)
            )
        outs_q, outs_n, outs_e = [], [], []
        for q0 in range(0, pq.size, _QUERY_CHUNK):
            q1 = min(q0 + _QUERY_CHUNK, pq.size)
            if xb is not None:
                qb = np.packbits(Q[q0:q1] > thr[None, :], axis=1)
                S = -_POPCNT[qb[:, None, :] ^ xb[None, :, :]].sum(axis=2).astype(
                    np.float64
                )
            else:
                S = _space_similarities(Q[q0:q1], Xa, space)
            qids, nids, sim, pidx = _flat_pairs(S, pq[q0:q1], nid)
            if not qids.size:
                continue
            kt = pkt[q0:q1][pidx]
            embs = q_embs[q0:q1][pidx]
            # identical positional cut to the pair-join approx kernel
            order = np.lexsort((nids, -np.round(sim, 9), qids))
            qids, nids, embs, kt = (
                qids[order], nids[order], embs[order], kt[order]
            )
            starts = np.flatnonzero(
                np.concatenate(([True], qids[1:] != qids[:-1]))
            )
            counts = np.diff(np.concatenate((starts, [qids.size])))
            pos = np.arange(qids.size) - np.repeat(starts, counts)
            kp = pos < kt
            outs_q.append(qids[kp])
            outs_n.append(nids[kp])
            outs_e.append(embs[kp])
        if not outs_q:
            return empty
        return pd.DataFrame(
            {
                "query_id": np.concatenate(outs_q),
                "neighbor_id": np.concatenate(outs_n),
                "q_emb": list(np.concatenate(outs_e)),
            }
        )

    return kern


def _radial_threshold(
    space: str, min_sim: float | None, max_distance: float | None
) -> float | None:
    """The reference's radial contract (KNNQueryBuilder.java:440-474):
    exactly one of min_sim | max_distance, with the distance converted to
    the engine's raw-similarity scale per space (cosine distance = 1-cos;
    l2 sim = -d^2; l1/linf sim = -d; innerproduct has no distance form)."""
    if min_sim is not None and max_distance is not None:
        raise ValueError("set at most one of min_sim | max_distance")
    if max_distance is None:
        return min_sim
    if space == "cosinesimil":
        return 1.0 - max_distance
    if space == "l2":
        return -(max_distance ** 2)
    if space in ("l1", "linf", "hamming"):
        return -max_distance
    raise ValueError("max_distance is undefined for innerproduct; use min_sim")


def search_vector_index(
    spark: SparkSession,
    index_dir: str,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    nprobe: int = 4,
    allow_ids: "list[int] | DataFrame | None" = None,
    space: str | None = None,
    rerank_factor: int | None = None,
    min_sim: float | None = None,
    max_distance: float | None = None,
) -> DataFrame:
    """Top-k per query vector across every live segment, scanning only the
    probed cells (partition pruning), deleted vectors masked by an anti-join,
    allowed ids by a semi-join (an id DataFrame or list — never literals in
    the plan). Quantized indexes run a two-tier plan: approximate traversal
    over the compressed column (full-precision bytes never read), then exact
    rerank of the per-batch top-(k*rerank_factor) candidates against the
    full-precision column. Rerank scores are exact, so results equal the
    full-precision ranking WHENEVER the true top-k survives the approximate
    k*rerank_factor cut — recall is governed by `rerank_factor`, the
    reference's overquery trade (KNNConstants.java:90 rescore/oversample):
    raising it widens the candidate superset and can only improve recall
    (tests/test_vector_merge_quant.py exercises a case where it provably
    does). When `rerank_factor` is None it defaults PER TIER via
    DEFAULT_RERANK_BY_TIER — lossier codes get a wider candidate superset
    (the CompressionLevel.java:33-61 compression-level -> rescore-defaults
    contract). Returns (query_id, neighbor_id, cosine, rank). `space`
    defaults to the index's build-time space.

    RADIAL mode (the reference's max_distance | min_score contract,
    KNNQueryBuilder.java:64-81 / RadialQuery): set `min_sim` (raw-similarity
    threshold — cosine for cosinesimil, negated distance for metric spaces)
    or `max_distance` (converted per space) and EVERY neighbor at or above
    the threshold is returned, unbounded — `k` is ignored. Radial scoring is
    exact-tier by construction (thresholds cannot be proven against lossy
    codes), reading the full-precision column on every segment."""
    meta = IndexMeta(index_dir)
    cfg = meta.load_config()
    space = space or cfg.extra.get("space", "cosinesimil")
    min_sim = _radial_threshold(space, min_sim, max_distance)
    C = _load_centroids(index_dir)
    qids = np.array([q[0] for q in queries], dtype=np.int64)
    Q = np.array([q[1] for q in queries], dtype=np.float64)
    nlist = C.shape[0]
    probes = np.argsort(-_space_similarities(Q, C, space), axis=1)[
        :, : min(nprobe, nlist)
    ]
    probe_mask = np.zeros((len(qids), nlist), dtype=bool)
    probe_mask[np.arange(len(qids))[:, None], probes] = True
    cells = sorted({int(c) for row in probes for c in row})

    live = _live_vector_segments(meta)
    plain_paths, quant_paths = _cells_paths_split(meta, live)
    dead = meta.tombstones_df(spark)
    allow_df = None
    if allow_ids is not None:
        # accept-set as a distributed semi-join (the delete_docs(doc_ids_df=)
        # pattern) — a 10^5-id allow set never rides the plan as literals
        if isinstance(allow_ids, DataFrame):
            allow_df = allow_ids.select(F.col("vec_id").cast("long"))
        else:
            allow_df = spark.createDataFrame(
                [(int(i),) for i in allow_ids], "vec_id long"
            )

    def restricted(data: DataFrame) -> DataFrame:
        data = data.where(F.col("cell").isin(cells))
        if dead is not None:
            data = data.join(
                dead.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_anti"
            )
        if allow_df is not None:
            data = data.join(allow_df, "vec_id", "left_semi")
        return data

    if min_sim is not None:
        # radial: exact full-precision scan of the probed cells, EVERY hit
        # >= threshold kept (unbounded by contract, like the text engine's
        # min_score mode — no per-batch or global truncation)
        brad = spark.sparkContext.broadcast((qids, Q, probe_mask))
        thr_v = float(min_sim)

        def radial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            qids_, Q_, pmask = brad.value
            nq = qids_.size
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                ids = pdf["vec_id"].to_numpy(np.int64)
                cell = pdf["cell"].to_numpy(np.int64)
                # query-sliced like _topk_kernel_factory: bounds the
                # similarity matrix at _QUERY_CHUNK x batch for any list size
                for q0 in range(0, nq, _QUERY_CHUNK):
                    q1 = min(q0 + _QUERY_CHUNK, nq)
                    S = _space_similarities(Q_[q0:q1], X, space)
                    hit = (
                        pmask[q0:q1][:, cell]
                        & (ids[None, :] != qids_[q0:q1, None])
                        & (S >= thr_v)
                    )
                    qi, xi = np.nonzero(hit)
                    if not qi.size:
                        continue
                    yield pd.DataFrame(
                        {
                            "query_id": qids_[q0:q1][qi],
                            "neighbor_id": ids[xi],
                            "sim": S[qi, xi],
                        }
                    )

        data_all = restricted(
            _read_paths(
                spark, plain_paths + quant_paths, ["vec_id", "embedding", "cell"]
            )
        )
        local = data_all.mapInPandas(radial, schema=_OUT_SCHEMA)
        w = Window.partitionBy("query_id").orderBy(
            F.desc(F.round(F.col("sim"), 9)), F.asc("neighbor_id")
        )
        return local.withColumn("rank", F.row_number().over(w)).select(
            "query_id", "neighbor_id", F.round("sim", 6).alias("cosine"), "rank"
        )

    quant_kind = cfg.extra.get("quant_kind", "int8")
    if rerank_factor is None:
        rerank_factor = DEFAULT_RERANK_BY_TIER.get(quant_kind, 4)
    qextra = None
    if quant_paths and quant_kind == "onebit":
        thr = _load_onebit_thresholds(index_dir)
        qextra = np.packbits(Q > thr[None, :], axis=1)
    elif quant_paths and quant_kind == "pq":
        qextra = _load_quant_state(index_dir, "pq")[1]
    bq = spark.sparkContext.broadcast((qids, Q, probe_mask, qextra))
    locals_: list[DataFrame] = []
    if plain_paths:
        # full-precision segments: exact scoring in one pass
        data_f = restricted(_read_paths(spark, plain_paths, ["vec_id", "embedding", "cell"]))
        locals_.append(
            data_f.mapInPandas(
                _topk_kernel_factory(bq, space, k, quantized=False),
                schema=_OUT_SCHEMA,
            )
        )
    if quant_paths:
        # quantized segments: approximate traversal over the compressed
        # column only (int8: 1 byte/dim dequantized scoring; onebit:
        # 1 bit/dim hamming), then exact rerank of the per-batch
        # top-(k*rerank_factor) candidates against the float column — the
        # final window ranks everything on exact scores
        k_traverse = max(k * rerank_factor, 50)
        quant_cols = (
            ["vec_id", "cell", "qcode"] if quant_kind in ("onebit", "pq")
            else ["vec_id", "cell", "qcode", "qlo", "qstep"]
        )
        data_q = restricted(_read_paths(spark, quant_paths, quant_cols))
        cand = data_q.mapInPandas(
            _topk_kernel_factory(bq, space, k_traverse, quantized=quant_kind),
            schema=_OUT_SCHEMA,
        ).select("query_id", "neighbor_id")
        # candidates live inside probed cells by construction, so the rerank
        # scan keeps the same cell partition pruning — full-precision bytes
        # are read for the probed cells only, not the whole index
        full = _read_paths(spark, quant_paths, ["vec_id", "embedding", "cell"]).where(
            F.col("cell").isin(cells)
        ).drop("cell")
        joined = cand.join(
            full.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id"
        )
        qpos = {int(q): i for i, q in enumerate(qids)}
        bqr = spark.sparkContext.broadcast((qpos, Q))

        def rerank(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            qpos_, Q_ = bqr.value
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                qi = pdf["query_id"].map(qpos_).to_numpy(np.int64)
                yield pd.DataFrame(
                    {
                        "query_id": pdf["query_id"].to_numpy(np.int64),
                        "neighbor_id": pdf["neighbor_id"].to_numpy(np.int64),
                        "sim": _space_sim_rowwise(Q_[qi], X, space),
                    }
                )

        locals_.append(joined.mapInPandas(rerank, schema=_OUT_SCHEMA))

    local = locals_[0]
    for d in locals_[1:]:
        local = local.unionByName(d)

    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col("sim"), 9)), F.asc("neighbor_id")
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.round("sim", 6).alias("cosine"), "rank"
        )
    )


# at most ONE persisted probe fan-out is retained across calls: each
# search_vector_index_table invocation releases the previous call's cache,
# so long-lived sessions (server, bench loops, offline sweeps) don't
# accumulate cached blocks until session end. If a caller holds an
# un-executed lazy result from an EARLIER table search when a later one
# runs, the earlier plan's probe stage recomputes on execution (correct,
# just uncached) — the cache is a single-slot working-set bound, not a
# correctness dependency. The swap is lock-guarded so concurrent
# server/threaded calls can't double-unpersist or leak a slot.
_PROBE_CACHE: list = []
_PROBE_CACHE_LOCK = threading.Lock()


def _swap_probe_cache(df: DataFrame) -> None:
    with _PROBE_CACHE_LOCK:
        while _PROBE_CACHE:
            try:
                _PROBE_CACHE.pop().unpersist()
            except Exception:
                pass
        _PROBE_CACHE.append(df)


def search_vector_index_table(
    spark: SparkSession,
    index_dir: str,
    queries_df: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "query_id",
    vec: str = "embedding",
    space: str | None = None,
    rerank_factor: int | None = None,
    allow_ids: "list[int] | DataFrame | None" = None,
    min_sim: float | None = None,
    max_distance: float | None = None,
    nprobe_col: str | None = None,
    rerank_factor_col: str | None = None,
    k_col: str | None = None,
    min_sim_col: str | None = None,
    allow_pairs: DataFrame | None = None,
    _keep_raw_sim: bool = False,
) -> DataFrame:
    """Query-TABLE vector search — the offline-evaluation / training-data
    regime (10^6+ query vectors), fully distributed: query embeddings never
    ride the driver. Probe assignment runs in one Arrow pass (each query
    emits its `nprobe` nearest cells), the (query, cell) fan-out JOINS the
    cell-partitioned index on `cell` (both sides hash-partition on the same
    key — the co-located join), exact per-pair scoring is one rowwise einsum,
    and the per-batch pre-cut keeps the global top-k window input at
    O(queries * partitions * k). Deleted vectors are anti-joined out.
    Quantized segments keep the two-tier plan here too: the cell join scans
    the compressed column only (int8 1 byte/dim or one-bit 1 bit/dim), then
    the per-batch top-(k*rerank_factor) candidates join back to the
    full-precision column of the probed cells for exact rescoring. Returns
    (query_id, neighbor_id, cosine, rank).

    Filtered search (the accept-set contract, JVectorReader.java:154-164 /
    KNNQueryBuilder.java:536-541): `allow_ids` — an id DataFrame or list —
    restricts candidates via a distributed semi-join (ids never ride the
    plan as literals), same as the driver-list path.

    RADIAL mode (KNNQueryBuilder.java:440-474): set `min_sim` or
    `max_distance` (converted per space) and EVERY neighbor of every query
    at/above the threshold within the probed cells is returned, unbounded —
    `k` and the quantized tier are bypassed (thresholds cannot be proven
    against lossy codes, so radial always scores full precision).

    Per-row method parameters (the method_parameters analog,
    KNNQueryBuilder.java:71-76,241-258): `nprobe_col` / `rerank_factor_col`
    / `k_col` name integer columns of `queries_df` overriding the per-call
    defaults row by row — a table mixing easy and hard queries widens its
    probe / rerank / result budget only where needed. Nulls fall back to
    the defaults.

    Per-QUERY filters (`allow_pairs`, the per-knn-clause filter analog —
    each reference knn clause carries its OWN filter,
    KNNQueryBuilder.java:536-541): a DataFrame of (query_id, vec_id) accept
    pairs; each query only matches its own listed ids, applied as one
    distributed two-column semi-join (never literals). Composes with the
    call-wide `allow_ids`.

    Per-row RADIAL (`min_sim_col`, the text table's `min_score_col` twin):
    a row with a non-null raw-similarity threshold switches to radial mode
    — every neighbor at/above its threshold, unbounded, exact-tier, its k
    ignored — while null rows stay top-k; the two sub-plans share ONE probe
    fan-out and union."""
    meta = IndexMeta(index_dir)
    cfg = meta.load_config()
    space = space or cfg.extra.get("space", "cosinesimil")
    if rerank_factor is None:
        # per-tier rescore default (CompressionLevel.java:33-61 contract)
        rerank_factor = DEFAULT_RERANK_BY_TIER.get(
            cfg.extra.get("quant_kind", "int8"), 4
        )
    if min_sim_col is not None and (min_sim is not None or max_distance is not None):
        raise ValueError("min_sim_col is exclusive with per-call min_sim/max_distance")
    min_sim = _radial_threshold(space, min_sim, max_distance)
    radial = min_sim is not None
    mixed = min_sim_col is not None

    def _final_select(ranked: DataFrame) -> DataFrame:
        # reported score rounds to 6 decimals (the reference's float score
        # precision); callers that aggregate downstream (nested parent
        # search) get the UNROUNDED sim via the internal _keep_raw_sim
        # flag so per-child rounding error never compounds
        cols = [
            F.col("query_id"), F.col("neighbor_id"),
            F.round("sim", 6).alias("cosine"), F.col("rank"),
        ]
        if _keep_raw_sim:
            cols.append(F.col("sim").alias("sim_raw"))
        return ranked.select(*cols)
    C = _load_centroids(index_dir)
    bC = spark.sparkContext.broadcast(C)
    nlist = C.shape[0]
    nprobe = min(nprobe, nlist)

    # cogrouped scoring (the default): probes and data meet per (cell, salt)
    # group and score as ONE similarity matrix — each query embedding
    # crosses the Arrow boundary once per probed cell instead of once per
    # candidate PAIR (the old join shipped q_emb dim x 8 bytes per pair;
    # at 10^3 queries x 10^2-vector cells that alone was ~10^2 MB per tier).
    # The salt splits each cell's data rows into `salt` deterministic
    # sub-groups (probes replicated across them) so kernel parallelism is
    # nlist x salt, scale-adaptive via the shuffle budget; a many-cell index
    # keeps salt == 1. allow_pairs (per-query accept sets must prune PAIRS
    # before scoring) stays on the pair-join path.
    try:
        _budget = max(1, int(spark.conf.get("spark.sql.shuffle.partitions")))
    except Exception:
        _budget = 200
    salt = max(1, min(8, _budget // max(nlist, 1)))
    # scale switch: below ~10^5 live vectors the per-pair bytes are tiny and
    # the pair join (broadcast, zero extra exchanges) wins on scheduling
    # overhead (measured 3.1s vs 4.5s at 2k vectors); above it the pair
    # materialization grows as cell_size x nprobe x dim x 8 B per query and
    # the cogroup's two small exchanges are noise (measured 2.2x at 200k
    # vectors x 5k queries). allow_pairs (per-query accept sets must prune
    # PAIRS before scoring) always stays on the pair-join path.
    total_vecs = sum(
        m.get("num_docs", 0) for m in meta.live_manifests().values()
    )
    use_cogroup = allow_pairs is None and total_vecs >= int(
        os.environ.get("PYSEARCH_VEC_COGROUP_MIN_DOCS", "100000")
    )

    def _cogrouped(probes: DataFrame, data: DataFrame):
        if salt == 1:
            p = probes.withColumn("_s", F.lit(0))
            d = data.withColumn("_s", F.lit(0))
        else:
            p = probes.withColumn(
                "_s", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
            )
            d = data.withColumn(
                "_s", F.pmod(F.xxhash64(F.col("vec_id")), F.lit(salt)).cast("int")
            )
        return p.groupBy("cell", "_s").cogroup(d.groupBy("cell", "_s"))

    probe_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("q_emb", T.ArrayType(T.DoubleType())),
            T.StructField("cell", T.IntegerType()),
            # per-row budgets ride the fan-out so every cut can vary per
            # query: _kt = rerank budget (k * rerank_factor, floored),
            # _k = final top-k, _ms = radial threshold (NaN = top-k row)
            T.StructField("_kt", T.IntegerType()),
            T.StructField("_k", T.IntegerType()),
            T.StructField("_ms", T.DoubleType()),
        ]
    )
    qcols = [id_col, vec]
    for c in (nprobe_col, rerank_factor_col, k_col, min_sim_col):
        if c:
            qcols.append(c)

    def assign_probes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Cv = bC.value
        for pdf in batches:
            if not len(pdf):
                continue
            n = len(pdf)
            Q = np.stack(pdf[vec].to_numpy()).astype(np.float64)
            order = np.argsort(-_space_similarities(Q, Cv, space), axis=1)
            def _perrow(col, default, name, hi=None):
                # nulls fall back to the per-call default; EXPLICIT
                # non-positive values are caller bugs and raise (mirroring
                # search_batch_table's per-row k validation) rather than
                # being silently clipped into plausible-looking results
                v = pdf[col].fillna(default).to_numpy(np.int64)
                if (v <= 0).any():
                    raise ValueError(
                        f"per-row {name} ({col}) values must be > 0; "
                        f"got {int(v.min())}"
                    )
                return v.clip(None, hi) if hi is not None else v

            if nprobe_col:
                npb = _perrow(nprobe_col, nprobe, "nprobe", hi=nlist)
            else:
                npb = np.full(n, nprobe, dtype=np.int64)
            if rerank_factor_col:
                rf = _perrow(rerank_factor_col, rerank_factor, "rerank_factor")
            else:
                rf = np.full(n, rerank_factor, dtype=np.int64)
            if k_col:
                kv = _perrow(k_col, k, "k")
            else:
                kv = np.full(n, k, dtype=np.int64)
            kt = np.maximum(kv * rf, 50)
            if min_sim_col:
                ms = pd.to_numeric(pdf[min_sim_col], errors="coerce").to_numpy(
                    np.float64
                )  # nulls -> NaN = top-k row
            else:
                ms = np.full(n, np.nan)
            # vectorized variable-width probe take: row-major ravel of the
            # first npb[i] columns of each row's cell order
            mask = np.arange(nlist)[None, :] < npb[:, None]
            reps = np.repeat(np.arange(n), npb)
            yield pd.DataFrame(
                {
                    "query_id": pdf[id_col].to_numpy(np.int64)[reps],
                    "q_emb": [Q[i] for i in reps],
                    "cell": order[mask].astype(np.int32),
                    "_kt": kt[reps].astype(np.int32),
                    "_k": kv[reps].astype(np.int32),
                    "_ms": ms[reps],
                }
            )

    probes_df = queries_df.select(*qcols).mapInPandas(
        assign_probes, schema=probe_schema
    )

    live = _live_vector_segments(meta)
    plain_paths, quant_paths = _cells_paths_split(meta, live)
    if (quant_paths and not radial) or mixed:
        # the probe fan-out feeds multiple subtrees (quant join + rerank
        # cell semi-join, and/or the mixed radial/top-k split) — persist so
        # the assign pass over the query table runs once. The previous
        # call's persisted fan-out (if any) is released here: long-lived
        # sessions (server, bench loops) hold at most ONE probe cache.
        probes_df = probes_df.persist()
        _swap_probe_cache(probes_df)
    dead = meta.tombstones_df(spark)
    allow_df = None
    if allow_ids is not None:
        # accept-set as a distributed semi-join — never literals in the plan
        if isinstance(allow_ids, DataFrame):
            allow_df = allow_ids.select(F.col("vec_id").cast("long"))
        else:
            allow_df = spark.createDataFrame(
                [(int(i),) for i in allow_ids], "vec_id long"
            )

    def masked(data: DataFrame) -> DataFrame:
        if dead is not None:
            data = data.join(
                dead.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_anti"
            )
        if allow_df is not None:
            data = data.join(allow_df, "vec_id", "left_semi")
        return data

    def pair_filtered(joined: DataFrame) -> DataFrame:
        """Per-query accept sets: semi-join the (query, candidate) fan-out
        against the (query_id, vec_id) pairs table BEFORE scoring, so each
        query's filter prunes its own candidates distributed."""
        if allow_pairs is None:
            return joined
        ap = allow_pairs.select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("vec_id").cast("long").alias("vec_id"),
        )
        return joined.join(ap, ["query_id", "vec_id"], "left_semi")

    def radial_out(probes: DataFrame, thr_scalar: float | None) -> DataFrame:
        # exact full-precision scan of the probed cells of EVERY tier; all
        # hits at/above the (per-call or per-row) threshold kept (unbounded
        # by contract — no per-batch or global truncation, no quantized
        # traversal)
        def radial_pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                Qr = np.stack(pdf["q_emb"].to_numpy())
                X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                qids = pdf["query_id"].to_numpy(np.int64)
                nids = pdf["vec_id"].to_numpy(np.int64)
                thr = (
                    np.full(len(pdf), thr_scalar)
                    if thr_scalar is not None
                    else pdf["_ms"].to_numpy(np.float64)
                )
                sim = _space_sim_rowwise(Qr, X, space)
                keep = (nids != qids) & (sim >= thr)
                if not keep.any():
                    continue
                yield pd.DataFrame(
                    {
                        "query_id": qids[keep],
                        "neighbor_id": nids[keep],
                        "sim": sim[keep],
                    }
                )

        data_all = masked(
            _read_paths(
                spark, plain_paths + quant_paths, ["vec_id", "embedding", "cell"]
            )
        )
        if use_cogroup:
            local = _cogrouped(probes, data_all).applyInPandas(
                _cell_radial_kernel(space, thr_scalar), schema=_OUT_SCHEMA
            )
        else:
            local = pair_filtered(probes.join(data_all, "cell")).mapInPandas(
                radial_pairs, schema=_OUT_SCHEMA
            )
        w = Window.partitionBy("query_id").orderBy(
            F.desc(F.round(F.col("sim"), 9)), F.asc("neighbor_id")
        )
        return _final_select(local.withColumn("rank", F.row_number().over(w)))

    if radial:
        return radial_out(probes_df, float(min_sim))

    def score_pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            Qr = np.stack(pdf["q_emb"].to_numpy())
            X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            qids = pdf["query_id"].to_numpy(np.int64)
            nids = pdf["vec_id"].to_numpy(np.int64)
            kks = pdf["_k"].to_numpy(np.int64)
            sim = _space_sim_rowwise(Qr, X, space)
            keep = nids != qids
            qids, nids, sim, kks = qids[keep], nids[keep], sim[keep], kks[keep]
            if not qids.size:
                continue
            qids, nids, sim, _ = _group_cut(qids, nids, sim, kks)
            yield pd.DataFrame(
                {"query_id": qids, "neighbor_id": nids, "sim": sim}
            )

    def topk_out(probes: DataFrame) -> DataFrame:
        locals_: list[DataFrame] = []
        if plain_paths:
            data_f = masked(
                _read_paths(spark, plain_paths, ["vec_id", "embedding", "cell"])
            )
            if use_cogroup:
                locals_.append(
                    _cogrouped(probes, data_f).applyInPandas(
                        _cell_exact_kernel(space), schema=_OUT_SCHEMA
                    )
                )
            else:
                locals_.append(
                    pair_filtered(probes.join(data_f, "cell"))
                    .mapInPandas(score_pairs, schema=_OUT_SCHEMA)
                )
        if quant_paths:
            quant_kind = cfg.extra.get("quant_kind", "int8")
            state2 = _load_quant_state(index_dir, quant_kind)
            bthr2 = (
                spark.sparkContext.broadcast(state2)
                if state2 is not None
                else None
            )
            quant_cols = (
                ["vec_id", "cell", "qcode"] if quant_kind in ("onebit", "pq")
                else ["vec_id", "cell", "qcode", "qlo", "qstep"]
            )
            data_q = masked(_read_paths(spark, quant_paths, quant_cols))
            cand_schema = T.StructType(
                [
                    T.StructField("query_id", T.LongType()),
                    T.StructField("neighbor_id", T.LongType()),
                    T.StructField("q_emb", T.ArrayType(T.DoubleType())),
                ]
            )

            def approx_pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                state = bthr2.value if bthr2 is not None else None
                for pdf in batches:
                    if not len(pdf):
                        continue
                    qids = pdf["query_id"].to_numpy(np.int64)
                    nids = pdf["vec_id"].to_numpy(np.int64)
                    if state is not None and state[0] == "onebit":
                        thr = state[1]
                        Qr = np.stack(pdf["q_emb"].to_numpy())
                        qb = np.packbits(Qr > thr[None, :], axis=1)
                        xb = np.frombuffer(b"".join(pdf["qcode"]), np.uint8).reshape(
                            len(pdf), -1
                        )
                        sim = -_POPCNT[qb ^ xb].sum(axis=1).astype(np.float64)
                    else:
                        Qr = np.stack(pdf["q_emb"].to_numpy())
                        Xa = (
                            _pq_decode(b"".join(pdf["qcode"]), len(pdf), state[1])
                            if state is not None and state[0] == "pq"
                            else _dequantize(pdf)
                        )
                        sim = _space_sim_rowwise(Qr, Xa, space)
                    keep = nids != qids
                    if not keep.any():
                        continue
                    q_embs = pdf["q_emb"].to_numpy()
                    # per-row rerank budget (method_parameters analog): _kt is
                    # constant within a query, so the cut below can vary by row
                    kt = pdf["_kt"].to_numpy(np.int64)
                    qids, nids, sim = qids[keep], nids[keep], sim[keep]
                    q_embs, kt = q_embs[keep], kt[keep]
                    order = np.lexsort((nids, -np.round(sim, 9), qids))
                    qids, nids, q_embs, kt = (
                        qids[order], nids[order], q_embs[order], kt[order]
                    )
                    starts = np.flatnonzero(
                        np.concatenate(([True], qids[1:] != qids[:-1]))
                    )
                    counts = np.diff(np.concatenate((starts, [qids.size])))
                    pos = np.arange(qids.size) - np.repeat(starts, counts)
                    kp = pos < kt
                    yield pd.DataFrame(
                        {
                            "query_id": qids[kp],
                            "neighbor_id": nids[kp],
                            "q_emb": list(q_embs[kp]),
                        }
                    )

            if use_cogroup:
                cand = _cogrouped(probes, data_q).applyInPandas(
                    _cell_approx_kernel(space, bthr2), schema=cand_schema
                )
            else:
                cand = pair_filtered(probes.join(data_q, "cell")).mapInPandas(
                    approx_pairs, schema=cand_schema
                )
            # exact rescore: candidates join the full-precision column of the
            # probed cells only (the semi-join against the probe fan-out keeps
            # the pruning — candidates are inside probed cells by construction)
            full_q = masked(
                _read_paths(spark, quant_paths, ["vec_id", "embedding", "cell"])
            ).join(
                probes.select("cell").distinct(), "cell", "left_semi"
            ).drop("cell")

            def exact_pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                for pdf in batches:
                    if not len(pdf):
                        continue
                    Qr = np.stack(pdf["q_emb"].to_numpy())
                    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
                    yield pd.DataFrame(
                        {
                            "query_id": pdf["query_id"].to_numpy(np.int64),
                            "neighbor_id": pdf["neighbor_id"].to_numpy(np.int64),
                            "sim": _space_sim_rowwise(Qr, X, space),
                        }
                    )

            locals_.append(
                cand.join(full_q.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
                .mapInPandas(exact_pairs, schema=_OUT_SCHEMA)
            )

        local = locals_[0]
        for d in locals_[1:]:
            local = local.unionByName(d)
        w = Window.partitionBy("query_id").orderBy(
            F.desc(F.round(F.col("sim"), 9)), F.asc("neighbor_id")
        )
        ranked = local.withColumn("rank", F.row_number().over(w))
        if k_col:
            # per-row k (method_parameters analog): the final cut joins the
            # tiny (query_id, k) projection of the input table — never a
            # literal map in the plan
            qk = queries_df.select(
                F.col(id_col).cast("long").alias("query_id"),
                F.coalesce(F.col(k_col).cast("int"), F.lit(k)).alias("_qk"),
            )
            ranked = ranked.join(qk, "query_id").where(
                F.col("rank") <= F.col("_qk")
            )
        else:
            ranked = ranked.where(F.col("rank") <= k)
        return _final_select(ranked)

    if not mixed:
        return topk_out(probes_df)
    # mixed per-row radial/top-k table: ONE probe fan-out, split by the
    # per-row threshold column, two sub-plans union (the text table's
    # min_score_col contract on the vector side)
    # a NaN _ms may arrive as SQL null after the Arrow pass (pandas float
    # NaN <-> null conversion) — treat both as "top-k row"
    is_radial_row = F.col("_ms").isNotNull() & ~F.isnan(F.col("_ms"))
    out_topk = topk_out(probes_df.where(~is_radial_row))
    out_rad = radial_out(probes_df.where(is_radial_row), None)
    return out_topk.unionByName(out_rad)


def search_vector_index_nested(
    spark: SparkSession,
    index_dir: str,
    queries_df: DataFrame,
    parents_df: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "query_id",
    vec: str = "embedding",
    child_oversample: int = 3,
    score_mode: str = "max",
    **table_kwargs,
) -> DataFrame:
    """Nested-vector search — the reference's nested-field knn
    (NestedKnnVectorQueryFactory.java:1-77 / Lucene
    DiversifyingChildrenFloatKnnVectorQuery): a PARENT document owns many
    child vectors (passages, chunks, frames); search returns the top-k
    parents per query, each scored by its children per `score_mode`
    ("max" = best child, Lucene ToParentBlockJoin max — the reference
    default; "sum"; "count").

    Composition, fully distributed: one `search_vector_index_table` pass
    fetches the per-query top-(k * child_oversample) CHILDREN (the
    oversample is the diversification budget — a parent with many near-top
    children can crowd the child list, exactly the trade the reference's
    traversal-time diversification solves in-graph; raising
    `child_oversample` widens coverage, and `k * oversample >= corpus`
    makes the parent ranking exact), then children join `parents_df`
    (vec_id -> parent_id, a distributed map — never a driver structure)
    and aggregate per (query, parent), ranked by (rounded score desc,
    parent_id asc). Returns (query_id, parent_id, score, n_children, rank).
    Extra keyword args pass through to the table search (filters, per-row
    method params, ...)."""
    if score_mode not in ("max", "sum", "count"):
        raise ValueError("score_mode must be max | sum | count")
    # _keep_raw_sim: aggregate UNROUNDED child similarities — the table's
    # reported `cosine` is rounded to 6 decimals, which would tie parents
    # whose best children differ by <1e-6 (and compound error under sum
    # mode); only the final reported parent score is rounded
    children = search_vector_index_table(
        spark, index_dir, queries_df,
        k=max(k * child_oversample, k), nprobe=nprobe,
        id_col=id_col, vec=vec, _keep_raw_sim=True, **table_kwargs,
    )
    pmap = parents_df.select(
        F.col("vec_id").cast("long").alias("neighbor_id"),
        F.col("parent_id").cast("long").alias("parent_id"),
    )
    per_parent = (
        children.join(pmap, "neighbor_id")
        .groupBy("query_id", "parent_id")
        .agg(
            F.max("sim_raw").alias("max_score"),
            F.sum("sim_raw").alias("sum_score"),
            F.count(F.lit(1)).cast("long").alias("n_children"),
        )
    )
    score_col = {
        "max": "max_score", "sum": "sum_score", "count": "n_children"
    }[score_mode]
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round(F.col(score_col), 9)), F.asc("parent_id")
    )
    return (
        per_parent.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "parent_id",
            F.round(F.col(score_col), 6).alias("score"),
            "n_children", "rank",
        )
    )
