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

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pysearch.ops.text import tokens_col

_MERSENNE = np.uint64((1 << 61) - 1)

# Default shingle document-frequency cap (the hot-term skew guard, on by
# default — north_rule: boilerplate skew handled explicitly). A shingle in
# more than this many docs carries ~zero Jaccard signal (it is boilerplate)
# but contributes df^2 rows to the inverted self-join; dropping it bounds the
# join at web scale. The cap defines the shingle SPACE consistently: minhash
# signatures AND exact verification read the same capped sets, so precision
# stays 1.0 under capped-Jaccard semantics. At the correctness-gate scales
# (<= 5k docs) no shingle can exceed the cap, so capped == uncapped there.
DEFAULT_MAX_SHINGLE_DF = 5000


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


def _cap_shingles(sh: DataFrame, max_df: int) -> DataFrame:
    """Drop shingles whose document frequency exceeds `max_df` (one groupBy
    + semi-join; the df side is tiny after the threshold)."""
    ok = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_s")).where(
        F.col("df_s") <= max_df
    )
    return sh.join(ok.select("shingle"), "shingle", "left_semi")


def jaccard_pairs(
    df: DataFrame,
    tau: float,
    text: str = "text",
    id_col: str = "doc_id",
    ngram: int = 1,
    max_df: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> DataFrame:
    """EXACT Jaccard-similar pairs (a < b, jaccard >= tau) via the shingle
    inverted join: |A∩B| from the self-join on shingle, |A∪B| = |A|+|B|-|A∩B|.
    `max_df` (finite by DEFAULT — see DEFAULT_MAX_SHINGLE_DF) drops
    ultra-common shingles from the shingle space (skew guard at scale: a
    shingle with df=d contributes d^2 join rows); pass None to disable."""
    sh = shingle_sets(df, text, id_col, ngram)
    if max_df is not None:
        sh = _cap_shingles(sh, max_df)
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

def _hash_params(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE), num_hashes, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE), num_hashes, dtype=np.uint64)
    return a, b


def shingle_set_lists(
    df: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    ngram: int = 1,
    max_df: int | None = None,
) -> DataFrame:
    """(doc_id, ts: array<string>) — the distinct shingle set per doc, as one
    row per doc. The single tokenize/shingle pass that both signature
    generation and candidate verification consume (the round-1 double pass
    recomputed shingles for verification). `max_df` applies the hot-shingle
    cap to the set itself, so every downstream consumer sees the same capped
    space."""
    sh = shingle_sets(df, text, id_col, ngram)
    if max_df is not None:
        sh = _cap_shingles(sh, max_df)
    return sh.groupBy("doc_id").agg(F.collect_list("shingle").alias("ts"))


def minhash_signatures_from_sets(
    sets: DataFrame, num_hashes: int = 64, seed: int = 42
) -> DataFrame:
    """Minwise signatures from (doc_id, ts array) rows. Fully vectorized per
    Arrow batch: all docs' shingles are flattened into one array with offsets,
    hashed ONCE with the vectorized poly hash (pysearch.ops.hashing — no
    per-element Python), the H permutations applied as whole-array ops, and
    per-doc minima taken with np.minimum.reduceat."""
    from pysearch.ops.hashing import poly_hash

    a, b = _hash_params(num_hashes, seed)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("sig", T.ArrayType(T.LongType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            arrs = pdf["ts"].to_numpy()
            lens = pd.Series(arrs).map(len).to_numpy(dtype=np.int64)
            keep = lens > 0
            if not keep.any():
                continue
            ids = pdf["doc_id"].to_numpy(dtype=np.int64)[keep]
            lens = lens[keep]
            flat = np.concatenate(
                [np.asarray(x, dtype=object) for x in arrs[np.flatnonzero(keep)]]
            )
            # hash distinct values once per batch, broadcast back
            uniq, inv = np.unique(flat, return_inverse=True)
            base = poly_hash(uniq)[inv]
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            sig = np.empty((num_hashes, ids.size), dtype=np.uint64)
            for h in range(num_hashes):
                perm = (a[h] * base + b[h]) & _MERSENNE  # wraps mod 2^64, masked
                sig[h] = np.minimum.reduceat(perm, starts)
            sig_t = sig.T.astype(np.int64)
            yield pd.DataFrame({"doc_id": ids, "sig": list(sig_t)})

    return sets.mapInPandas(run, schema=schema)


def minhash_signatures(
    shingles: DataFrame, num_hashes: int = 64, seed: int = 42
) -> DataFrame:
    """Back-compat wrapper over (doc_id, shingle) rows."""
    sets = shingles.groupBy("doc_id").agg(F.collect_list("shingle").alias("ts"))
    return minhash_signatures_from_sets(sets, num_hashes=num_hashes, seed=seed)


def minhash_lsh_pairs(
    df: DataFrame,
    tau: float,
    text: str = "text",
    id_col: str = "doc_id",
    ngram: int = 1,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    prefilter_margin: float | None = 0.2,
    max_df: int | None = DEFAULT_MAX_SHINGLE_DF,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: banded signature buckets generate
    candidates, then candidates are verified with EXACT Jaccard (so precision
    is 1.0; banding only affects recall). The hot-shingle cap `max_df`
    (finite by default) defines the shingle space BEFORE signatures, so
    signatures and verification agree on capped-Jaccard semantics.

    ``prefilter_margin``: before the (relatively expensive) exact set
    intersection, candidates are screened by their full-signature agreement —
    an unbiased jaccard estimate with std sqrt(j(1-j)/H). Pairs whose
    estimate falls below ``tau - prefilter_margin`` are dropped; at H=64 and
    margin 0.2 a TRUE pair at j=tau survives with probability > 1 - 1e-9
    (>= 3.5 sigma even at j=0.7, ~7 sigma at j=0.95), while random band
    collisions (j << tau, endemic on small token universes) are eliminated
    before they touch the set join. Set None to disable the screen."""
    rows_per_band = num_hashes // bands
    # ONE tokenize/shingle pass feeds both signatures and verification;
    # persisted so the two consumers don't recompute the lineage (at scale
    # this spills to disk and is the natural checkpoint of the pipeline)
    from pyspark import StorageLevel

    sets = shingle_set_lists(df, text, id_col, ngram, max_df=max_df).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    sigs = minhash_signatures_from_sets(sets, num_hashes=num_hashes, seed=seed)
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
    if prefilter_margin is not None:
        # signature-agreement screen (see docstring): one cheap column pass
        # per candidate, joined against the tiny per-doc signature table
        sig_a = sigs.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"))
        sig_b = sigs.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"))
        agree = F.size(
            F.filter(F.zip_with("sig_a", "sig_b", lambda p, q: p == q), lambda v: v)
        ).cast("double") / F.lit(float(num_hashes))
        cands = (
            cands.join(sig_a, "id_a")
            .join(sig_b, "id_b")
            .where(agree >= F.lit(float(tau - prefilter_margin)))
            .select("id_a", "id_b")
        )
    # exact verification on CANDIDATES ONLY — O(|candidates|), never the
    # quadratic all-pairs join: fetch both shingle sets and intersect JVM-side
    a_s = sets.select(
        F.col("doc_id").alias("id_a"), F.col("ts").alias("ts_a")
    )
    b_s = sets.select(
        F.col("doc_id").alias("id_b"), F.col("ts").alias("ts_b")
    )
    out = (
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
    # callers that materialize the pairs can release the cached shingle sets
    # via out._pysearch_cached.unpersist() (same contract as
    # corpus.assign_doc_ids); left cached, Spark evicts it LRU
    out._pysearch_cached = sets
    return out


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """63-bit SimHash per doc: tf-weighted sum of token-hash bit vectors,
    sign-thresholded. Tokenization runs JVM-side (codegen'd regexp); the Arrow
    kernel is pure vectorized numpy — flatten all docs' tokens, hash distinct
    tokens once with the SQL-replicable poly hash (pysearch.ops.hashing), and
    accumulate per-(doc, bit) with np.add.at. The 63-bit hash keeps every
    signature non-negative in int64 AND reproducible in DuckDB BIGINT math,
    so the correctness gate verifies signatures (and hence pairs) bit-exactly.
    """
    from pysearch.ops.hashing import poly_hash63

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("simhash", T.LongType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            arrs = pdf["toks"].to_numpy()
            lens = pd.Series(arrs).map(len).to_numpy(dtype=np.int64)
            ids_out = pdf[id_col].astype("int64").to_numpy()
            if int(lens.sum()) == 0:
                yield pd.DataFrame({"doc_id": ids_out, "simhash": np.int64(0)})
                continue
            flat = np.concatenate(
                [np.asarray(x, dtype=object) for x in arrs if len(x)]
            )
            uniq, inv = np.unique(flat, return_inverse=True)
            th = poly_hash63(uniq)
            bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(
                np.int64
            ) * 2 - 1  # (n_uniq, 64) in {-1, +1}; bit 63 is always -1 (h < 2^63)
            doc_rep = np.repeat(np.arange(len(arrs)), lens)
            acc = np.zeros((len(arrs), 64), dtype=np.int64)
            np.add.at(acc, doc_rep, bits[inv])
            sig = (acc > 0).astype(np.uint64) @ (
                np.uint64(1) << np.arange(64, dtype=np.uint64)
            )
            yield pd.DataFrame({"doc_id": ids_out, "simhash": sig.astype(np.int64)})

    toks = df.select(
        F.col(id_col).cast("long").alias(id_col), tokens_col(F.col(text)).alias("toks")
    )
    return toks.mapInPandas(run, schema=schema)


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
    sql_planes: bool = False,
) -> DataFrame:
    """Hyperplane-LSH (random-projection) near-dup: `tables` independent
    sign-sketches of `planes` bits bucket the vectors; colliding pairs are
    verified with exact cosine (precision 1.0; banding only affects recall).
    Collision probability per table is (1 - θ/π)^planes, so size `planes`
    to the target regime: defaults suit genuine near-dups (cosine >= ~0.8);
    for low thresholds use fewer planes + more tables (recall asserted in
    pytest).

    ``sql_planes=True`` swaps the Gaussian planes for Rademacher ±1
    coefficients derived from the SQL-replicable poly_hash63 of
    ``"{table}:{plane}:{dim}"`` and projects integer-QUANTIZED embeddings
    (``floor(v * 2^20)`` as int64, exact in both float64 and SQL DOUBLE
    arithmetic). Rademacher sign-projection is the standard ±1 variant of
    hyperplane LSH (same collision-probability regime as Gaussian planes),
    and the all-integer projection makes every bucket bit reproducible
    bit-for-bit in ANSI SQL — order-independent, no float summation at all
    — so the DuckDB correctness oracle can recompute the exact candidate
    set (magnitude bound: |proj| <= dim * 2^20 << 2^63)."""
    spark = emb.sparkSession
    if dim is None:
        dim = len(emb.select(vec).first()[0])
    if sql_planes:
        from pysearch.ops.hashing import poly_hash63

        keys = [
            f"{t}:{p}:{i}"
            for t in range(tables)
            for p in range(planes)
            for i in range(dim)
        ]
        # sign = POPCOUNT PARITY of the 63-bit hash (SQL: bit_count(h) % 2):
        # folding all bits decorrelates the signs — the raw low bit of the
        # polynomial hash is nearly affine in the varying key digits and
        # collapsed the 64 plane rows to 2 distinct patterns (measured),
        # capping LSH recall regardless of table count
        h = poly_hash63(keys)
        bits = np.zeros(len(h), dtype=np.int64)
        for _ in range(63):
            bits ^= (h & np.uint64(1)).astype(np.int64)
            h >>= np.uint64(1)
        planes_m = (bits * 2 - 1).reshape(tables, planes, dim).astype(np.float64)
    else:
        rng = np.random.default_rng(seed)
        planes_m = rng.standard_normal((tables, planes, dim))
    b_planes = spark.sparkContext.broadcast(planes_m)
    quantize_input = bool(sql_planes)

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
            if quantize_input:
                # exact-integer projection grid (see docstring): float64
                # multiply by 2^20 is exact for float32 inputs, floor is
                # deterministic, and the signed sums stay far inside int64
                X = np.floor(X * float(1 << 20))
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
