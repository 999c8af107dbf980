"""Index build (the write path): corpus -> segments.

Re-expresses the reference's flush pipeline (JVectorWriter.flush,
JVectorWriter.java:216-261: buffer -> quantize decision -> graph build ->
serialize graph/map/metadata) as:

  stage 0  assign deterministic global doc ids (GraphNodeIdToDocMap analog)
           and stage the id-carrying corpus partitioned by segment_id —
           one distributed sort, committed once, resumable.
  stage 1  per segment (a fixed-size contiguous doc_id range):
             tokenize (Arrow UDF) -> per-(doc,term) tf -> bucket by term ->
             applyInPandas posting-block encode (delta+varint, block-max
             metadata) -> parquet partitioned by term bucket
             + docmap + dictionary + deterministic manifest + metrics
           committed per segment (the "flush" atomic unit).

Scale notes (design target: 10^12 files, 1000 executors):
* segment size is FIXED — per-task memory is O(segment_rows), never O(corpus).
* the only corpus-wide shuffles are the stage-0 range sort and the
  per-segment (term, doc) tf aggregation, which Catalyst executes with
  map-side partial aggregation; skew from boilerplate terms is capped
  because grouping keys include doc_id (tf) or term-bucket (encode), and a
  bucket group holds at most `segment_rows` postings per term.
* segments build concurrently (driver thread pool -> concurrent Spark jobs),
  the Spark scheduler interleaves their stages across the cluster.
* everything per-row runs inside Arrow batches (pandas UDFs); no Python
  row loops (input_hint).
"""

from __future__ import annotations

import concurrent.futures as cf
import hashlib
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pysearch.checkpoint import IndexMeta
from pysearch.codec import encode_posting_blocks
from pysearch.config import IndexConfig
from pysearch.corpus import assign_doc_ids

BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("block_id", T.IntegerType()),
        T.StructField("n", T.IntegerType()),
        T.StructField("first_id", T.LongType()),
        T.StructField("last_id", T.LongType()),
        T.StructField("ids", T.BinaryType()),
        T.StructField("tfs", T.BinaryType()),
        T.StructField("dls", T.BinaryType()),
        T.StructField("max_tf", T.IntegerType()),
        T.StructField("min_dl", T.IntegerType()),
        T.StructField("sum_tf", T.LongType()),
        T.StructField("codec", T.IntegerType()),
        T.StructField("poss", T.BinaryType()),
    ]
)


FIELD_SEP = "\x1f"  # namespaces extra fields' terms; cannot occur in tokens


def term_key(field: str, term: str, primary: str) -> str:
    """Posting-dictionary key for (field, term): the primary field keeps bare
    terms (back-compatible), extra fields are namespaced."""
    return term if field == primary else f"{field}{FIELD_SEP}{term}"


def bucket_of(term: str, buckets: int) -> int:
    """Portable term -> bucket hash (same value in Python, Spark, DuckDB)."""
    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % buckets


def bucket_col(term_col, buckets: int):
    return (
        F.conv(F.substring(F.md5(term_col), 1, 8), 16, 10).cast("long") % buckets
    ).cast("int")


TF_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("dl", T.IntegerType()),
        T.StructField("tf", T.LongType()),
        T.StructField("bucket", T.IntegerType()),
        # ascending token positions of the term in the doc (phrase tier);
        # empty when store_positions is off. The term's FIELD is not carried
        # as a column — it is recoverable from the term-key prefix, and an
        # extra string per posting would inflate the build shuffle
        # measurably; dl is the term's field's per-doc token count.
        T.StructField("positions", T.ArrayType(T.IntegerType())),
    ]
)

# positions-off build shuffle: aggregated per-(term, doc) tf rows (no
# positions column — aggregate before the shuffle, guide §2.3)
TF_SCHEMA_NOPOS = T.StructType(
    [f for f in TF_SCHEMA.fields if f.name != "positions"]
)

# positions-tier build shuffle: ONE ROW PER OCCURRENCE with scalar columns
# only. A per-posting ArrayType(positions) column costs ~3x the whole
# tokenize+encode kernel time in np.split + Arrow list building + the
# per-posting Python re-assembly on the encoder side (measured 1.6s vs 0.4s
# per 3k docs); flat int columns keep both Arrow boundaries vectorized
# (guide §4.2) and the encoder groups occurrences with integer sort keys.
OCC_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("dl", T.IntegerType()),
        T.StructField("pos", T.IntegerType()),
        T.StructField("bucket", T.IntegerType()),
    ]
)


def _tokenize_tf_factory(
    term_buckets: int,
    code_aware: bool,
    store_positions: bool = False,
    fields: tuple = ("content",),
):
    """Fused analyzer stage: per field, column -> tokens -> per-(doc, term)
    tf with the FIELD's doc length and the portable term bucket attached;
    optionally the per-posting token positions (phrase tier, primary field
    only). Extra fields' terms are namespaced (term_key), so all fields share
    the posting/dictionary files while keeping per-field statistics — the
    per-field mapping analog (KNNVectorFieldMapper.java:101-177). All
    pandas/numpy; md5 bucketing is computed once per DISTINCT term per batch.
    """
    primary = fields[0]

    def one_field(pdf, col: str, is_primary: bool):
        from pysearch.analyze import tokenize_code_text, tokenize_text

        tok = tokenize_code_text if code_aware else tokenize_text
        # uniform row shape per factory: when the positions tier is on,
        # EVERY field emits occurrence rows (extra fields' position streams
        # are valid data; only the primary field's feed phrase matching)
        with_pos = store_positions
        toks = pdf[col].map(tok)
        dl = toks.map(len).astype("int32")
        dl_np = dl.to_numpy()
        if with_pos and is_primary and dl_np.size and int(dl_np.max()) >= (1 << 22):
            # phrase keys pack position into 22 bits (query._POS_SHIFT);
            # fail loudly at index time instead of silently corrupting
            # phrase matches at query time
            bad = pdf["doc_id"].to_numpy()[dl_np >= (1 << 22)][:3]
            raise ValueError(
                "store_positions=True requires doc length < 2^22 tokens; "
                f"docs {bad.tolist()} exceed it — split them or build "
                "with store_positions=False"
            )
        total = int(dl_np.sum())
        if not total:
            return None
        doc_ids = pdf["doc_id"].to_numpy().repeat(dl_np)
        terms = np.concatenate(
            [np.asarray(t, dtype=object) for t in toks if t]
            or [np.empty(0, dtype=object)]
        )
        # intra-doc token position for every occurrence
        doc_starts = np.concatenate(([0], np.cumsum(dl_np)[:-1]))
        pos = np.arange(total, dtype=np.int64) - np.repeat(doc_starts, dl_np)

        if with_pos:
            # occurrence rows, scalar columns only — no per-(term,doc)
            # grouping here at all: the encoder groups after the bucket
            # shuffle with integer sort keys (the rows land there anyway,
            # and a list column costs 3x the kernel in split/serialize)
            tf = pd.DataFrame(
                {
                    "term": terms,
                    "doc_id": doc_ids.astype(np.int64),
                    "dl": np.repeat(dl_np, dl_np).astype(np.int32),
                    "pos": pos.astype(np.int32),
                }
            )
        else:
            # per-(term, doc) tf via integer keys: factorize hashes each
            # distinct term once, then one int64 argsort replaces the pandas
            # object-tuple groupby (2-3x on boilerplate-heavy batches)
            codes, _uniq = pd.factorize(terms, sort=False)
            key = codes.astype(np.int64) * np.int64(len(pdf)) + np.repeat(
                np.arange(len(pdf), dtype=np.int64), dl_np
            )
            uk, first_idx, counts = np.unique(
                key, return_index=True, return_counts=True
            )
            tf = pd.DataFrame(
                {
                    "term": terms[first_idx],
                    "doc_id": doc_ids[first_idx].astype(np.int64),
                    "dl": np.repeat(dl_np, dl_np)[first_idx].astype(np.int32),
                    "tf": counts.astype(np.int64),
                }
            )
        if not is_primary:
            tf["term"] = col + FIELD_SEP + tf["term"]
        return tf

    out_cols = (
        ["term", "doc_id", "dl", "pos", "bucket"]
        if store_positions
        else ["term", "doc_id", "dl", "tf", "bucket"]
    )

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            parts = [
                t
                for f in fields
                if (t := one_field(pdf, f, f == primary)) is not None
            ]
            if not parts:
                continue
            tf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
            uniq = tf["term"].unique()
            bmap = {t: bucket_of(t, term_buckets) for t in uniq}
            tf["bucket"] = tf["term"].map(bmap).astype("int32")
            yield tf[out_cols]

    return run


def _encode_bucket_occ_factory(block_size: int, min_compress: int = 1):
    """Posting-block encoder over OCCURRENCE rows (OCC_SCHEMA — the
    positions-tier build shuffle). Groups occurrences into postings with
    integer sort keys: factorize the term column once, rank-map the codes so
    the term iteration order is lexicographic (deterministic output
    regardless of shuffle arrival order), then one int64 lexsort by
    (term_rank, doc_id, pos) yields every posting's tf and its ascending
    position run as slices — no per-posting Python objects anywhere."""

    def encode_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        rows: dict[str, list] = {k: [] for k in BLOCK_SCHEMA.fieldNames()}
        if not len(pdf):
            return pd.DataFrame(rows)
        bucket = int(pdf["bucket"].iloc[0])
        terms = pdf["term"].to_numpy()
        codes, uniq = pd.factorize(terms, sort=False)
        # rank codes into lexicographic term order (argsort of ~1e3 distinct
        # strings, not of the full occurrence column)
        uniq = np.asarray(uniq, dtype=object)
        order_terms = np.argsort(uniq)
        rank = np.empty(len(uniq), dtype=np.int64)
        rank[order_terms] = np.arange(len(uniq))
        ids = pdf["doc_id"].to_numpy(np.int64)
        dls = pdf["dl"].to_numpy(np.int64)
        pos = pdf["pos"].to_numpy(np.int64)
        srt = np.lexsort((pos, ids, rank[codes]))
        r_s, d_s, dl_s, p_s = rank[codes][srt], ids[srt], dls[srt], pos[srt]
        # posting boundaries: change of (term_rank, doc)
        bnd = np.flatnonzero(
            np.concatenate(
                ([True], (r_s[1:] != r_s[:-1]) | (d_s[1:] != d_s[:-1]))
            )
        )
        tf_all = np.diff(np.append(bnd, len(r_s)))
        # term boundaries over the postings
        tr = r_s[bnd]
        tbnd = np.flatnonzero(np.concatenate(([True], tr[1:] != tr[:-1])))
        tbounds = np.append(tbnd, len(tr))
        occ_starts = bnd  # occurrence index where each posting starts
        sorted_terms = uniq[order_terms]
        for t_i in range(len(tbnd)):
            s, e = tbounds[t_i], tbounds[t_i + 1]
            term = sorted_terms[tr[s]]
            occ_lo = occ_starts[s]
            occ_hi = occ_starts[e] if e < len(occ_starts) else len(r_s)
            for blk in encode_posting_blocks(
                d_s[bnd[s:e]], tf_all[s:e], dl_s[bnd[s:e]], block_size,
                min_compress, positions_concat=p_s[occ_lo:occ_hi],
            ):
                rows["term"].append(term)
                rows["bucket"].append(bucket)
                for name, val in zip(
                    ["block_id", "n", "first_id", "last_id", "ids", "tfs", "dls",
                     "max_tf", "min_dl", "sum_tf", "codec", "poss"],
                    blk,
                ):
                    rows[name].append(val)
        return pd.DataFrame(rows)

    return encode_bucket


def _encode_bucket_factory(block_size: int, min_compress: int = 1, store_positions: bool = False):
    def encode_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        # one group = one (segment, term-bucket); at most `segment_rows`
        # postings per term -> bounded memory regardless of corpus size
        pdf = pdf.sort_values(["term", "doc_id"], kind="mergesort")
        terms = pdf["term"].to_numpy()
        ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        dls = pdf["dl"].to_numpy(dtype=np.int64)
        pos_col = pdf["positions"].to_numpy() if store_positions else None
        bucket = int(pdf["bucket"].iloc[0]) if len(pdf) else 0
        uniq, starts = np.unique(terms, return_index=True)
        bounds = np.append(starts, len(terms))
        rows: dict[str, list] = {k: [] for k in BLOCK_SCHEMA.fieldNames()}
        for t_i, term in enumerate(uniq):
            s, e = bounds[t_i], bounds[t_i + 1]
            pc = None
            if pos_col is not None:
                parts = [np.asarray(p, dtype=np.int64) for p in pos_col[s:e]]
                pc = np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
            for blk in encode_posting_blocks(
                ids[s:e], tfs[s:e], dls[s:e], block_size, min_compress,
                positions_concat=pc,
            ):
                rows["term"].append(term)
                rows["bucket"].append(bucket)
                for name, val in zip(
                    ["block_id", "n", "first_id", "last_id", "ids", "tfs", "dls",
                     "max_tf", "min_dl", "sum_tf", "codec", "poss"],
                    blk,
                ):
                    rows[name].append(val)
        return pd.DataFrame(rows)

    return encode_bucket


def build_segment_from_df(
    spark: SparkSession,
    meta: IndexMeta,
    config: IndexConfig,
    segment_id: str,
    df_with_ids: DataFrame,
    source: dict,
) -> dict:
    """Build one segment from an id-carrying corpus slice and commit it.

    The atomic flush unit (JVectorWriter.flush analog). Idempotent: if the
    commit key already exists this is a no-op.
    """
    key = f"build_{segment_id}"
    if meta.has_commit(key):
        return meta.read_manifest(segment_id)

    debug = os.environ.get("PYSEARCH_DEBUG_TIMING")
    marks = [("start", time.time())]

    def mark(label):
        if debug:
            marks.append((label, time.time()))

    t0 = time.time()
    seg_dir = meta.segment_dir(segment_id)
    os.makedirs(seg_dir, exist_ok=True)

    # a segment slice often arrives as few (or one) parquet files — fan it
    # out so tokenization/encoding use the whole cluster, not one task
    par = max(spark.sparkContext.defaultParallelism, 8)
    seg = df_with_ids.repartition(par).persist()

    # fused tokenize + per-doc tf + term-bucket pass (ONE Arrow stage, one
    # shuffle to the encoder — the explode/groupBy pair this replaces cost a
    # second full shuffle of raw token strings). All configured fields are
    # analyzed in the same pass.
    fields = tuple(config.fields)
    tfrows = seg.select("doc_id", *fields).mapInPandas(
        _tokenize_tf_factory(
            config.term_buckets,
            bool(config.extra.get("code_aware")),
            store_positions=config.store_positions,
            fields=fields,
        ),
        # positions tier ships flat occurrence rows (scalar columns only);
        # the tf aggregation happens in the encoder after the bucket shuffle
        schema=OCC_SCHEMA if config.store_positions else TF_SCHEMA_NOPOS,
    ).persist()

    blocks = tfrows.groupBy("bucket").applyInPandas(
        _encode_bucket_occ_factory(config.block_size, config.min_block_docs)
        if config.store_positions
        else _encode_bucket_factory(
            config.block_size, config.min_block_docs, store_positions=False
        ),
        schema=BLOCK_SCHEMA,
    )
    (
        blocks.write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(meta.postings_path(segment_id))
    )
    mark("postings")

    # docmap: doc_id -> identity + per-row content sha256 (the
    # GraphNodeIdToDocMap + derived-source invariant: content itself is NOT
    # stored in the index; reconstruct by joining the source table).
    # dl = primary-field token count; each extra field gets its own dl_<f>
    # column (per-field norms feed per-field BM25 collection stats).
    dl_col = lambda f: "dl" if f == fields[0] else f"dl_{f}"  # noqa: E731

    def field_pred(f):
        # field recovered from the term-key namespace (no per-row field col)
        if f == fields[0]:
            return ~F.col("term").contains(FIELD_SEP)
        return F.col("term").startswith(f + FIELD_SEP)

    dls = tfrows.groupBy("doc_id").agg(
        *[
            F.max(F.when(field_pred(f), F.col("dl"))).alias(dl_col(f))
            for f in fields
        ]
    )
    # doc_id-range-partitioned, sorted files: row-group pruning on doc_id
    # works AND the sha256 + write runs parallel (a single-file docmap was a
    # measurable serial bottleneck in the scaling benchmark). Doc stats are
    # OBSERVED during the write action (zero extra pass — the finalize step
    # previously re-scanned the docmap just for these aggregates).
    from pyspark.sql import Observation

    docmap_files = max(par // 4, 1)
    obs = Observation()
    extra_dl_cols = sorted(dl_col(f) for f in fields[1:])
    (
        seg.select(
            "doc_id",
            "repo",
            "path",
            "commit",
            "lang",
            F.sha2(F.col("content"), 256).alias("content_sha"),
        )
        .join(F.broadcast(dls), "doc_id", "left")
        .withColumns(
            {dl_col(f): F.coalesce(F.col(dl_col(f)), F.lit(0)).cast("int") for f in fields}
        )
        .repartitionByRange(docmap_files, "doc_id")
        .sortWithinPartitions("doc_id")
        .observe(
            obs,
            F.count(F.lit(1)).alias("num_docs"),
            F.sum("dl").alias("sum_dl"),
            F.min("doc_id").alias("doc_min"),
            F.max("doc_id").alias("doc_max"),
            *[F.sum(c).alias(c) for c in extra_dl_cols],
        )
        .write.mode("overwrite")
        .parquet(meta.docmap_path(segment_id))
    )
    doc_stats = obs.get
    tfrows.unpersist()
    seg.unpersist()
    mark("docmap")

    manifest = finalize_segment(
        spark, meta, config, segment_id, source, t0, stage="build",
        doc_stats=doc_stats,
    )
    mark("finalize")
    if debug:
        import sys

        deltas = " ".join(
            f"{label}={t1 - t0_:.1f}s"
            for (_, t0_), (label, t1) in zip(marks, marks[1:])
        )
        print(f"[timing] {segment_id}: {deltas}", file=sys.stderr, flush=True)
    meta.append_commit(
        key,
        op="add",
        adds=[segment_id],
        # doc-id high-watermark: appends allocate ABOVE every id ever
        # assigned, even after compactions drop the top tombstoned docs
        extra={"source": source, "doc_id_max": manifest["doc_id_max"]},
    )
    return manifest


def finalize_segment(
    spark: SparkSession,
    meta: IndexMeta,
    config: IndexConfig,
    segment_id: str,
    source: dict,
    t0: float,
    stage: str,
    doc_stats: dict | None = None,
) -> dict:
    """Shared tail of build & merge: derive dictionary/stats/manifest/metrics
    from the already-written postings + docmap (the VectorIndexFieldMetadata
    write, JVectorWriter.java:512-563). Column-pruned read-back: Parquet
    never materializes the binary columns for the aggregates. `doc_stats`:
    optionally the docmap aggregates already OBSERVED during the docmap
    write (num_docs, sum_dl, doc_min, doc_max, dl_<f> sums) — skips the
    docmap re-scan; when absent (merge paths) finalize scans as before."""
    # explicit schema: a zero-posting segment (valid, M8) has no data files
    written = spark.read.schema(BLOCK_SCHEMA).parquet(meta.postings_path(segment_id))
    # ONE scan serves the dictionary AND the per-bucket lineage: the
    # per-(term, bucket) aggregate (with the binary payload lengths folded
    # in) is persisted tiny, the dictionary projects it, and the per-bucket
    # rollup re-aggregates it — previously the postings were scanned twice,
    # once of them reading every binary column just for F.length
    per_term = written.groupBy("term", "bucket").agg(
        F.sum("n").cast("long").alias("df"),
        F.sum("sum_tf").cast("long").alias("cf"),
        F.count(F.lit(1)).cast("int").alias("n_blocks"),
        (
            F.sum(F.length("ids")) + F.sum(F.length("tfs")) + F.sum(F.length("dls"))
        ).alias("payload_bytes"),
    ).persist()
    per_term.select("term", "bucket", "df", "cf", "n_blocks").repartition(
        1
    ).sortWithinPartitions("term").write.mode("overwrite").parquet(
        meta.dictionary_path(segment_id)
    )

    if doc_stats is None:
        dm = spark.read.parquet(meta.docmap_path(segment_id))
        extra_dl_cols = sorted(c for c in dm.columns if c.startswith("dl_"))
        doc_stats = (
            dm.agg(
                F.count(F.lit(1)).alias("num_docs"),
                F.sum("dl").alias("sum_dl"),
                F.min("doc_id").alias("doc_min"),
                F.max("doc_id").alias("doc_max"),
                *[F.sum(c).alias(c) for c in extra_dl_cols],
            )
            .collect()[0]
            .asDict()
        )
    extra_dl_cols = sorted(c for c in doc_stats if c.startswith("dl_"))
    # per-bucket rollup from the cached per-term aggregate (term -> bucket
    # is functional, so per-bucket distinct-term counts sum to the total)
    per_bucket = (
        per_term.groupBy("bucket")
        .agg(
            F.sum("n_blocks").alias("n_blocks"),
            F.sum("df").alias("n_postings"),
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("payload_bytes").alias("payload_bytes"),
        )
        .collect()
    )
    per_term.unpersist()
    manifest = {
        "segment_id": segment_id,
        "num_docs": int(doc_stats["num_docs"]),
        "sum_dl": int(doc_stats["sum_dl"] or 0),
        "doc_id_min": int(doc_stats["doc_min"]) if doc_stats["doc_min"] is not None else -1,
        "doc_id_max": int(doc_stats["doc_max"]) if doc_stats["doc_max"] is not None else -1,
        "num_terms": int(sum(r["n_terms"] for r in per_bucket)),
        "num_postings": int(sum(r["n_postings"] for r in per_bucket)),
        "config_fingerprint": config.fingerprint(),
        "source": source,
    }
    if extra_dl_cols:
        # per-extra-field token totals (per-field avgdl at query time)
        manifest["sum_dl_fields"] = {
            c[3:]: int(doc_stats[c] or 0) for c in extra_dl_cols
        }
    meta.write_manifest(segment_id, manifest)

    # per-bucket lineage/metrics (KNNCounter analog: docs/postings/bytes/time)
    metrics = [
        {
            "bucket": int(r["bucket"]),
            "n_blocks": int(r["n_blocks"]),
            "n_postings": int(r["n_postings"]),
            "payload_bytes": int(r["payload_bytes"]),
            "stage": stage,
        }
        for r in per_bucket
    ]
    metrics.append(
        {
            "bucket": -1,
            "n_blocks": sum(m["n_blocks"] for m in metrics),
            "n_postings": manifest["num_postings"],
            "payload_bytes": sum(m["payload_bytes"] for m in metrics),
            "stage": stage + "_total",
            "num_docs": manifest["num_docs"],
            "wall_time_sec": time.time() - t0,
        }
    )
    meta.write_metrics(segment_id, metrics)
    return manifest


def seg_name(k: int) -> str:
    return f"seg_{k:08d}"


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    index_dir: str,
    config: IndexConfig | None = None,
    stop_after_segments: int | None = None,
    concurrency: int = 4,
) -> IndexMeta:
    """Full build: doc-id stage + per-segment flushes. Fully resumable —
    rerunning after a crash (or a deliberate `stop_after_segments` stop)
    skips every committed stage and reproduces identical manifests.
    """
    config = config or IndexConfig()
    meta = IndexMeta(index_dir)
    meta.initialize(config)

    staging = meta.staging_corpus_path()
    if not meta.has_commit("stage_docids"):
        ids = assign_doc_ids(corpus)
        staged = ids.withColumn(
            "segment_id", F.floor(F.col("doc_id") / config.segment_rows).cast("long")
        )
        staged.write.mode("overwrite").partitionBy("segment_id").parquet(staging)
        cached = getattr(ids, "_pysearch_cached", None)
        if cached is not None:
            cached.unpersist()
        n_segs = len(_staged_segments(staging))
        meta.append_commit("stage_docids", op="stage", extra={"num_segments": n_segs})

    seg_ks = _staged_segments(staging)
    pending = [k for k in seg_ks if not meta.has_commit(f"build_{seg_name(k)}")]
    if stop_after_segments is not None:
        pending = pending[:stop_after_segments]

    def run(k: int):
        df = spark.read.parquet(staging).filter(F.col("segment_id") == k).drop(
            "segment_id"
        )
        return build_segment_from_df(
            spark,
            meta,
            config,
            seg_name(k),
            df,
            source={"type": "build", "staging_partition": k},
        )

    if len(pending) <= 1 or concurrency <= 1:
        for k in pending:
            run(k)
    else:
        with cf.ThreadPoolExecutor(max_workers=concurrency) as pool:
            list(pool.map(run, pending))
    return meta


def _staged_segments(staging: str) -> list[int]:
    out = []
    for d in os.listdir(staging):
        if d.startswith("segment_id="):
            out.append(int(d.split("=", 1)[1]))
    return sorted(out)


def next_doc_id(meta: IndexMeta) -> int:
    """Next append base = commit-log high-watermark + 1 (NOT the live
    manifests' max, which can shrink after a compact merge drops the highest
    tombstoned docs and would reuse their ids)."""
    return meta.doc_id_hwm() + 1


def append_segment(
    spark: SparkSession,
    index_dir: str,
    batch: DataFrame,
    key: str,
    config: IndexConfig | None = None,
) -> str | None:
    """Index an appended corpus batch as a new segment (the near-real-time
    refresh analog: new docs become searchable as a new immutable segment;
    merges fold them in later). Idempotent per `key`."""
    meta = IndexMeta(index_dir)
    config = config or meta.load_config()
    meta.initialize(config)
    segment_id = f"seg_a_{key}"
    if meta.has_commit(f"build_{segment_id}"):
        return segment_id
    if batch.isEmpty():
        # empty-input flush still commits (JVectorWriter.java:1013-1019:
        # zero-vector merge writes a valid empty index)
        meta.append_commit(f"build_{segment_id}", op="add", adds=[], extra={"empty": True})
        return None
    base = next_doc_id(meta)
    ids = assign_doc_ids(batch).withColumn("doc_id", F.col("doc_id") + F.lit(base))
    build_segment_from_df(
        spark, meta, config, segment_id, ids,
        source={"type": "append", "key": key, "base_doc_id": base},
    )
    return segment_id
