"""Deduplication operators for web-scale training-data pipelines.

Five tiers, all deterministic:

* exact           — content-hash groupBy (one shuffle, salably trivial)
* n-gram Jaccard  — EXACT set-similarity pairs via shingle inverted join
                    (the verification oracle for the sketches below)
* MinHash + LSH   — shingle -> minwise signatures -> banded buckets ->
                    candidate pairs -> exact-Jaccard verification
* SimHash         — 64-bit weighted-bit sketch, banded hamming candidates
* embedding cosine— exact pair scan (test scale) + hyperplane-LSH (scale path)

Scale notes: the shingle join drops shingles with document frequency above
`max_df` (a boilerplate shingle joins O(df^2) pairs — the same skew argument
as hot terms in the index build); MinHash/SimHash banding keeps candidate
generation near-linear; every kernel is numpy-vectorized inside Arrow UDFs.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pysearch.ops.text import tokens_col

_MERSENNE = np.uint64((1 << 61) - 1)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_duplicates(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Canonicalize by content hash: every doc maps to the min doc_id of its
    sha256 group (group_size > 1 -> duplicates)."""
    h = df.select(
        F.col(id_col).cast("long").alias("doc_id"), F.sha2(F.col(text), 256).alias("h")
    )
    w = Window.partitionBy("h")
    return h.select(
        "doc_id",
        F.min("doc_id").over(w).alias("canonical_id"),
        F.count(F.lit(1)).over(w).cast("long").alias("group_size"),
    )


# ---------------------------------------------------------------------------
# shingles + exact n-gram Jaccard pairs
# ---------------------------------------------------------------------------

def shingle_sets(
    df: DataFrame, text: str = "text", id_col: str = "doc_id", ngram: int = 1
) -> DataFrame:
    """(doc_id, shingle) distinct pairs; ngram=1 -> token set, ngram>1 ->
    word n-gram shingles (space-joined)."""
    toks = tokens_col(F.col(text))
    if ngram == 1:
        sh = F.array_distinct(toks)
    else:
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - ngram, F.lit(-1)))
        sh = F.array_distinct(
            F.transform(
                idx, lambda i: F.array_join(F.slice(toks, i + 1, ngram), " ")
            )
        )
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"), F.explode(sh).alias("shingle")
    )


def jaccard_pairs(
    df: DataFrame,
    tau: float,
    text: str = "text",
    id_col: str = "doc_id",
    ngram: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """EXACT Jaccard-similar pairs (a < b, jaccard >= tau) via the shingle
    inverted join: |A∩B| from the self-join on shingle, |A∪B| = |A|+|B|-|A∩B|.
    `max_df` drops ultra-common shingles (skew guard at scale: a shingle with
    df=d contributes d^2 join rows)."""
    sh = shingle_sets(df, text, id_col, ngram)
    if max_df is not None:
        ok = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_s")).where(
            F.col("df_s") <= max_df
        )
        sh = sh.join(ok.select("shingle"), "shingle", "left_semi")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("doc_id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")).cast("double"),
        )
        .where(F.col("jaccard") >= tau)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _md5_u64(values: pd.Series) -> np.ndarray:
    return np.array(
        [
            int.from_bytes(hashlib.md5(v.encode()).digest()[:8], "big")
            for v in values
        ],
        dtype=np.uint64,
    ) & _MERSENNE


def _hash_params(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE), num_hashes, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE), num_hashes, dtype=np.uint64)
    return a, b


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = 64, seed: int = 42
) -> DataFrame:
    """Minwise signatures from (doc_id, shingle) rows. Vectorized: per Arrow
    batch, shingles are md5-hashed once per distinct value, the H permutations
    applied as one (H x n) matmul-style broadcast, and per-doc minima taken
    with np.minimum.reduceat (no Python loops over rows)."""
    a, b = _hash_params(num_hashes, seed)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("sig", T.ArrayType(T.LongType())),
        ]
    )

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id", kind="mergesort")
        uniq, inv = np.unique(pdf["shingle"].to_numpy(), return_inverse=True)
        base = _md5_u64(pd.Series(uniq))[inv]  # hash per row
        ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        starts = np.flatnonzero(np.diff(ids, prepend=ids[0] - 1))
        # (H, n): permuted hashes; per-doc min via reduceat per hash row
        sig = np.empty((num_hashes, starts.size), dtype=np.uint64)
        for h in range(num_hashes):
            perm = (a[h] * base + b[h]) & _MERSENNE
            sig[h] = np.minimum.reduceat(perm, starts)
        out_ids = ids[starts]
        return pd.DataFrame(
            {"doc_id": out_ids, "sig": [sig[:, i].astype(np.int64).tolist() for i in range(starts.size)]}
        )

    # group by a doc-hash bucket so each Arrow group holds complete docs
    bucketed = shingles.withColumn("g", F.pmod(F.crc32(F.col("doc_id").cast("string")), F.lit(64)))
    return bucketed.groupBy("g").applyInPandas(
        lambda pdf: run(None, pdf.drop(columns=["g"])), schema=schema
    )


def minhash_lsh_pairs(
    df: DataFrame,
    tau: float,
    text: str = "text",
    id_col: str = "doc_id",
    ngram: int = 1,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: banded signature buckets generate
    candidates, then candidates are verified with EXACT Jaccard (so precision
    is 1.0; banding only affects recall)."""
    rows_per_band = num_hashes // bands
    sh = shingle_sets(df, text, id_col, ngram)
    sigs = minhash_signatures(sh, num_hashes=num_hashes, seed=seed)
    band_cols = [
        F.hash(
            F.lit(bnd), *[F.col("sig")[bnd * rows_per_band + r] for r in range(rows_per_band)]
        ).alias("bucket")
        for bnd in range(bands)
    ]
    buckets = sigs.select(
        "doc_id", F.posexplode(F.array(*band_cols)).alias("band", "bucket")
    )
    x = buckets.alias("x")
    y = buckets.alias("y")
    cands = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
        .distinct()
    )
    # exact verification on CANDIDATES ONLY — O(|candidates|), never the
    # quadratic all-pairs join: fetch both shingle sets and intersect JVM-side
    sets = (
        shingle_sets(df, text, id_col, ngram)
        .groupBy("doc_id")
        .agg(F.collect_list("shingle").alias("ts"))
    )
    a_s = sets.select(
        F.col("doc_id").alias("id_a"), F.col("ts").alias("ts_a")
    )
    b_s = sets.select(
        F.col("doc_id").alias("id_b"), F.col("ts").alias("ts_b")
    )
    return (
        cands.join(a_s, "id_a")
        .join(b_s, "id_b")
        .withColumn("inter", F.size(F.array_intersect("ts_a", "ts_b")).cast("long"))
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.size("ts_a") + F.size("ts_b") - F.col("inter")).cast("double"),
        )
        .where(F.col("jaccard") >= tau)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per doc: tf-weighted sum of token-hash bit vectors,
    sign-thresholded. Vectorized via np.bincount over (doc, bit) keys."""
    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("simhash", T.LongType())]
    )
    from pysearch.analyze import tokenize_text

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_out, sig_out = [], []
            toks_list = [tokenize_text(t) for t in pdf[text]]
            all_tokens = [t for ts in toks_list for t in ts]
            if not all_tokens:
                yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"), "simhash": 0})
                continue
            uniq, inv = np.unique(np.array(all_tokens, dtype=object), return_inverse=True)
            th = _md5_u64(pd.Series(uniq.astype(str)))
            bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
                np.int64
            ) * 2 - 1  # (n_uniq, 64) in {-1, +1}
            doc_rep = np.repeat(
                np.arange(len(toks_list)), [len(ts) for ts in toks_list]
            )
            acc = np.zeros((len(toks_list), 64), dtype=np.int64)
            np.add.at(acc, doc_rep, bits[inv])
            sig = (acc > 0).astype(np.uint64) @ (
                np.uint64(1) << np.arange(64, dtype=np.uint64)
            )
            ids_out = pdf[id_col].astype("int64").to_numpy()
            sig_out = sig.astype(np.int64)
            yield pd.DataFrame({"doc_id": ids_out, "simhash": sig_out})

    return df.select(id_col, text).mapInPandas(run, schema=schema)


def simhash_pairs(
    df: DataFrame, hamming_max: int = 3, text: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= hamming_max, candidates via
    (hamming_max + 1)-band exact-match (pigeonhole: any pair within the
    radius shares at least one identical band)."""
    bands = hamming_max + 1
    width = 64 // bands
    sigs = simhash_signatures(df, text, id_col)
    parts = [
        F.struct(
            F.lit(i).alias("band"),
            F.shiftright(F.col("simhash"), i * width).bitwiseAND(
                F.lit((1 << width) - 1)
            ).alias("val"),
        )
        for i in range(bands)
    ]
    buckets = sigs.select(
        "doc_id", "simhash", F.explode(F.array(*parts)).alias("bk")
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.val").alias("val"))
    x, y = buckets.alias("x"), buckets.alias("y")
    cands = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.val") == F.col("y.val"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("id_a"),
            F.col("y.doc_id").alias("id_b"),
            F.col("x.simhash").alias("sa"),
            F.col("y.simhash").alias("sb"),
        )
        .distinct()
    )
    return (
        cands.withColumn("hamming", F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))))
        .where(F.col("hamming") <= hamming_max)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def _with_norm(emb: DataFrame, vec: str = "embedding") -> DataFrame:
    sq = F.aggregate(
        F.transform(F.col(vec), lambda x: (x * x).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.withColumn("_norm", F.sqrt(sq))


def embedding_neardup_exact(
    emb: DataFrame, tau: float, id_col: str = "vec_id", vec: str = "embedding"
) -> DataFrame:
    """Exact cosine >= tau pairs via the pair join (test-scale oracle; the
    LSH variant below is the 100 TB path). Dot products run JVM-side
    (zip_with + aggregate) — no Python in the plan."""
    e = _with_norm(emb, vec).select(
        F.col(id_col).cast("long").alias("id"), F.col(vec).alias("v"), "_norm"
    )
    a, b = e.alias("a"), e.alias("b")
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: (x * y).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .withColumn("cosine", dot / (F.col("a._norm") * F.col("b._norm")))
        .where(F.col("cosine") >= tau)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )


def embedding_neardup_lsh(
    emb: DataFrame,
    tau: float,
    id_col: str = "vec_id",
    vec: str = "embedding",
    planes: int = 8,
    tables: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """Hyperplane-LSH (random-projection) near-dup: `tables` independent
    sign-sketches of `planes` bits bucket the vectors; colliding pairs are
    verified with exact cosine (precision 1.0; banding only affects recall).
    Collision probability per table is (1 - θ/π)^planes, so size `planes`
    to the target regime: defaults suit genuine near-dups (cosine >= ~0.8);
    for low thresholds use fewer planes + more tables (recall asserted in
    pytest)."""
    spark = emb.sparkSession
    if dim is None:
        dim = len(emb.select(vec).first()[0])
    rng = np.random.default_rng(seed)
    planes_m = rng.standard_normal((tables, planes, dim))
    b_planes = spark.sparkContext.broadcast(planes_m)

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("table", T.IntegerType()),
            T.StructField("bucket", T.LongType()),
        ]
    )

    def sketch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        P = b_planes.value
        pw2 = (1 << np.arange(P.shape[1], dtype=np.int64))
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf[vec].to_numpy()).astype(np.float64)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            outs = []
            for t in range(P.shape[0]):
                signs = (X @ P[t].T) > 0  # (n, planes)
                bucket = signs.astype(np.int64) @ pw2
                outs.append(pd.DataFrame({"id": ids, "table": t, "bucket": bucket}))
            yield pd.concat(outs, ignore_index=True)

    buckets = emb.select(id_col, vec).mapInPandas(sketch, schema=schema)
    x, y = buckets.alias("x"), buckets.alias("y")
    cands = (
        x.join(
            y,
            (F.col("x.table") == F.col("y.table"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    e = _with_norm(emb, vec).select(
        F.col(id_col).cast("long").alias("id"), F.col(vec).alias("v"), "_norm"
    )
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda p, q: (p * q).cast("double")),
        F.lit(0.0),
        lambda acc, p: acc + p,
    )
    return (
        cands.join(e.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("_norm").alias("na")), "id_a")
        .join(e.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("_norm").alias("nb")), "id_b")
        .withColumn("cosine", dot / (F.col("na") * F.col("nb")))
        .where(F.col("cosine") >= tau)
        .select("id_a", "id_b")
    )
