"""Index administration: integrity verification and the stats surface.

* verify_index — the checkIntegrity analog (JVectorReader.java:84-96
  checksums every index file): reconciles postings against dictionaries and
  manifests, checks docmap invariants, and (optionally) re-verifies the
  per-row content sha256 against the source-of-truth corpus (the input_hint
  invariant, the derived-source reconstruction check).
* stats — the /_plugins/_knn/stats analog (plugin/stats/StatNames.java:14-58,
  RestKNNStatsHandler): every per-segment build/merge metrics row (docs,
  postings, bytes, wall-time, per-bucket lineage) exposed as one DataFrame.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pysearch.checkpoint import IndexMeta, read_parquet_union


def verify_index(
    spark: SparkSession, index_dir: str, corpus: DataFrame | None = None
) -> dict:
    """Run integrity checks over all live segments; raises AssertionError on
    the first violation, returns a summary dict when clean."""
    from pysearch.build import BLOCK_SCHEMA

    meta = IndexMeta(index_dir)
    summary = {"segments": 0, "docs": 0, "postings": 0, "sha_checked": 0}
    for seg in meta.live_segments():
        m = meta.read_manifest(seg)
        postings = read_parquet_union(spark, meta.postings_paths(seg), schema=BLOCK_SCHEMA)
        # a pointer-merged segment reads several input dictionaries: roll
        # them up per term before reconciling
        dictionary = (
            read_parquet_union(spark, meta.dictionary_paths(seg))
            .groupBy("term")
            .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
        )
        docmap = read_parquet_union(spark, meta.docmap_paths(seg))

        # postings <-> dictionary reconciliation (per term AND in total)
        p_agg = postings.groupBy("term").agg(
            F.sum("n").alias("df_p"), F.sum("sum_tf").alias("cf_p")
        )
        mismatch = (
            p_agg.join(dictionary, "term", "full")
            .where(
                F.col("df_p").isNull()
                | F.col("df").isNull()
                | (F.col("df_p") != F.col("df"))
                | (F.col("cf_p") != F.col("cf"))
            )
            .count()
        )
        assert mismatch == 0, f"{seg}: dictionary/postings mismatch on {mismatch} terms"

        n_docs = docmap.count()
        n_postings = dictionary.agg(F.sum("df")).collect()[0][0] or 0
        assert n_docs == m["num_docs"], f"{seg}: docmap count != manifest"
        assert int(n_postings) == m["num_postings"], f"{seg}: postings != manifest"

        # doc ids unique within the segment & inside the manifest range
        dup = docmap.groupBy("doc_id").count().where("count > 1").count()
        assert dup == 0, f"{seg}: duplicate doc ids"
        if n_docs:
            rng = docmap.agg(F.min("doc_id"), F.max("doc_id")).collect()[0]
            assert rng[0] >= m["doc_id_min"] and rng[1] <= m["doc_id_max"], (
                f"{seg}: doc id range outside manifest"
            )

        # per-row content sha256 vs the source table (input_hint invariant)
        if corpus is not None:
            src = corpus.select(
                "repo", "path", F.sha2("content", 256).alias("src_sha")
            )
            bad = (
                docmap.join(src, ["repo", "path"], "inner")
                .where(F.col("content_sha") != F.col("src_sha"))
                .count()
            )
            assert bad == 0, f"{seg}: {bad} docs fail the content sha256 invariant"
            summary["sha_checked"] += n_docs

        summary["segments"] += 1
        summary["docs"] += n_docs
        summary["postings"] += int(n_postings)
    return summary


def verify_vector_index(spark: SparkSession, index_dir: str) -> dict:
    """checkIntegrity twin for the persisted IVF index: per-segment cell
    counts reconcile with the manifest, vec_ids are unique within a segment,
    cell assignments are in range, and quantized segments carry well-formed
    codes (constant byte length = packed dim). Raises AssertionError on the
    first violation, returns a summary when clean."""
    import json as _json

    from pysearch.ops.vector_index import _cells_rel_split, _read_paths

    meta = IndexMeta(index_dir)
    cfg = meta.load_config()
    assert cfg.extra.get("kind") == "ivf", "not a vector index"
    nlist = int(cfg.extra.get("nlist", 0))
    cb = _json.load(open(os.path.join(index_dir, "centroids.json")))
    dim = int(cb["dim"])
    summary = {"segments": 0, "vectors": 0, "quantized_segments": 0}
    for seg in meta.live_segments():
        m = meta.read_manifest(seg)
        plain, quant = _cells_rel_split(meta, seg)
        n_total = 0
        for paths, quantized in ((plain, False), (quant, True)):
            if not paths:
                continue
            cols = ["vec_id", "embedding", "cell"] + (
                ["qcode"] if quantized else []
            )
            cells = _read_paths(spark, meta._abs(paths), cols)
            agg = cells.agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("vec_id").alias("n_ids"),
                F.min("cell").alias("lo"),
                F.max("cell").alias("hi"),
                F.min(F.size("embedding")).alias("dim_lo"),
                F.max(F.size("embedding")).alias("dim_hi"),
            ).collect()[0]
            n_total += int(agg["n"])
            if agg["n"]:
                assert agg["n"] == agg["n_ids"], f"{seg}: duplicate vec_ids"
                assert 0 <= agg["lo"] and agg["hi"] < max(nlist, 1), (
                    f"{seg}: cell out of range"
                )
                assert agg["dim_lo"] == dim == agg["dim_hi"], (
                    f"{seg}: embedding dim != codebook dim"
                )
            if quantized and agg["n"]:
                qk = cfg.extra.get("quant_kind", "int8")
                want = (dim + 7) // 8 if qk == "onebit" else dim
                bad = cells.where(F.length("qcode") != want).count()
                assert bad == 0, f"{seg}: {bad} malformed qcodes"
                summary["quantized_segments"] += 1
        if plain and quant:
            # a mixed incrementally-merged segment could hide a duplicate id
            # SPLIT across the plain and quantized tiers — the per-tier
            # checks above can't see it, so assert uniqueness once over the
            # union of both tiers' ids too
            u = (
                _read_paths(spark, meta._abs(plain), ["vec_id"])
                .unionByName(_read_paths(spark, meta._abs(quant), ["vec_id"]))
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.countDistinct("vec_id").alias("n_ids"),
                )
                .collect()[0]
            )
            assert u["n"] == u["n_ids"], (
                f"{seg}: duplicate vec_ids across plain/quantized tiers"
            )
        assert n_total == m["num_docs"], (
            f"{seg}: cells {n_total} != manifest {m['num_docs']}"
        )
        summary["segments"] += 1
        summary["vectors"] += n_total
    return summary


def global_dictionary(spark: SparkSession, index_dir: str) -> DataFrame:
    """Global term statistics (df, cf, segments) rolled up across every live
    segment dictionary with EXPLICIT two-phase salted aggregation
    (north_rule skew requirement).

    Why salt here: a boilerplate term ("license", "import") appears in EVERY
    segment's dictionary, so at 10^12-file scale (10^7 segments) the final
    groupBy(term) funnels 10^7 rows into one reducer key. Phase 1 aggregates
    (term, salt) — spreading each hot key over `salt_buckets` reducers —
    phase 2 combines the tiny per-salt partials. (Catalyst's map-side partial
    aggregation helps only when the mapper sees many rows of the key; the
    salt guards the reduce side regardless of input layout.)
    """
    meta = IndexMeta(index_dir)
    config = meta.load_config()
    live = meta.live_segments()
    if not live:
        return spark.createDataFrame([], "term string, df long, cf long, segments long")
    d = None
    for seg in live:
        x = read_parquet_union(spark, meta.dictionary_paths(seg))
        d = x if d is None else d.unionByName(x)
    salted = (
        d.withColumn(
            "salt", F.pmod(F.crc32(F.col("term")) + F.spark_partition_id(), F.lit(config.salt_buckets))
        )
        .groupBy("term", "salt")
        .agg(
            F.sum("df").alias("df_p"),
            F.sum("cf").alias("cf_p"),
            F.count(F.lit(1)).alias("seg_p"),
        )
    )
    return salted.groupBy("term").agg(
        F.sum("df_p").cast("long").alias("df"),
        F.sum("cf_p").cast("long").alias("cf"),
        F.sum("seg_p").cast("long").alias("segments"),
    )


def gc_segments(index_dir: str, dry_run: bool = False) -> list[str]:
    """Delete segment directories no longer reachable from the commit log
    (retired by merges, or orphaned by crashes before their commit). Safe at
    any time: visibility is determined solely by the log, so removal of
    non-live directories cannot affect readers — the Lucene
    IndexFileDeleter / Iceberg orphan-file-cleanup analog.

    A directory is reachable if a LIVE segment either is it or POINTS at it:
    incrementally-merged segments reference their (retired) inputs' data
    dirs through manifest storage pointers, which protects those dirs until
    a compaction rewrites the data."""
    import shutil

    meta = IndexMeta(index_dir)
    live = set(meta.live_segments())
    referenced: set[str] = set(live)
    for s in live:
        rels = [
            rel
            for kind in ("postings", "docmap", "dictionary")
            for rel in meta.storage_rel(s, kind)
        ]
        # manifest storage pointers of ANY kind (e.g. the vector index's
        # "cells") also protect their input directories
        mf = meta.read_manifest(s) if os.path.exists(
            os.path.join(meta.manifest_dir, f"{s}.json")
        ) else {}
        for ps in (mf.get("storage") or {}).values():
            rels.extend(ps)
        for rel in rels:
            parts = rel.replace(os.sep, "/").split("/")
            if len(parts) >= 2 and parts[0] == "segments":
                referenced.add(parts[1])
    victims = [
        d
        for d in sorted(os.listdir(meta.segments_dir))
        if d not in referenced and os.path.isdir(os.path.join(meta.segments_dir, d))
    ]
    # delete files superseded by a tombstones_reset rewrite no longer affect
    # any replay — collect them too (rolling delete+compact cycles would
    # otherwise accumulate dead files forever)
    live_deletes: set[str] = set()
    for kind, val in meta.tombstone_events():
        if kind == "reset":
            live_deletes = {val} if val else set()
        elif kind == "add_file":
            live_deletes.add(val)
    deletes_dir = meta.deletes_dir()
    if os.path.isdir(deletes_dir):
        live_names = {os.path.basename(p.rstrip("/")) for p in live_deletes}
        for d in sorted(os.listdir(deletes_dir)):
            if d not in live_names:
                victims.append(os.path.join("deletes", d))
    if not dry_run:
        for d in victims:
            path = (
                os.path.join(meta.index_dir, d)
                if d.startswith("deletes")
                else os.path.join(meta.segments_dir, d)
            )
            shutil.rmtree(path, ignore_errors=True)
    return victims


def stats(spark: SparkSession, index_dir: str) -> DataFrame:
    """All recorded build/merge metrics rows as one DataFrame (the stats
    REST surface analog) — per-bucket lineage plus *_total rollups with
    docs / postings / payload bytes / wall time."""
    meta = IndexMeta(index_dir)
    files = [
        os.path.join(meta.metrics_dir, f)
        for f in sorted(os.listdir(meta.metrics_dir))
        if f.endswith(".parquet")
    ]
    if not files:
        return spark.createDataFrame(
            [], "segment_id string, stage string, bucket int"
        )
    return spark.read.parquet(*files)
