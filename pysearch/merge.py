"""Segment merge: the reference's signature feature, re-expressed.

Reference behavior being mirrored (citations into /root/reference):
* merge driver dispatch over N segment readers       JVectorWriter.java:192-213   (M1)
* leading-segment reuse (largest live segment's index
  is NOT rebuilt; others are folded in)              JVectorWriter.java:752-849   (M2)
* doc remap across merge, deleted docs dropped       JVectorWriter.java:854-987   (M3)
* incremental merge vs full rebuild, guarded by a
  density threshold                                  JVectorWriter.java:1166-1341,
                                                     :695-699 (0.4 guard)         (M4)
* compression-state reuse on merge                   JVectorWriter.java:1072-1152 (M5)
* merges exclude deleted docs via liveDocs           JVectorWriter.java:762-806   (M6)
* force-merge-to-1 merge policy                      ForceMergesOnlyMergePolicy.java:34-61 (M7)
* empty merged segment still valid                   JVectorWriter.java:1013-1019 (M8)

Our posting algebra makes the "leading segment" trick *total*: segments own
disjoint doc_id ranges and blocks address docs by global id, so the union of
two segments' posting-block sets IS the merged posting list — the incremental
merge is therefore PURE METADATA: one manifest pointing at every input's data
directories, zero bytes moved (no hard links, no copies — identical on S3/
HDFS). The compact path (tombstone density
above `max_tombstone_density`, or an explicit force-compact) decodes, drops
deleted docs, and re-encodes — the "full rebuild" fallback — and clears the
dropped tombstones so collection statistics return to exact.

Deletes/updates follow the OpenSearch model: a delete is a tombstone commit
(liveDocs analog — queries mask them immediately, stats unchanged until
compaction); an update is delete + re-index into a fresh append segment.
"""

from __future__ import annotations

import hashlib
import os
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pysearch.build import (
    BLOCK_SCHEMA,
    _encode_bucket_factory,
    append_segment,
    finalize_segment,
)
from pysearch.checkpoint import IndexMeta, read_parquet_union
from pysearch.config import IndexConfig

# auto-merge bound on storage-pointer fan-out: once an incremental merge
# would leave a manifest pointing at more than this many data directories,
# the auto policy compacts instead (explicit compact=False is still honored)
MAX_INCREMENTAL_POINTERS = 16

_POSTING_ROW_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("dl", T.LongType()),
        T.StructField("tf", T.LongType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("positions", T.ArrayType(T.IntegerType())),
    ]
)


# ---------------------------------------------------------------------------
# merge planning (M7): size-tiered + force-merge
# ---------------------------------------------------------------------------

def plan_merges(meta: IndexMeta, config: IndexConfig) -> list[list[str]]:
    """Size-tiered planner over the manifest table: segments whose live-doc
    counts share a log2 tier are merged once >= merge_factor of them pile up.
    A driver-side function over tiny metadata, like the reference's
    MergePolicy running on the IndexWriter thread."""
    manifests = meta.live_manifests()
    tiers: dict[int, list[str]] = {}
    for seg, m in manifests.items():
        if m["num_docs"] == 0:
            tiers.setdefault(-1, []).append(seg)
            continue
        tiers.setdefault(int(np.log2(max(m["num_docs"], 1))), []).append(seg)
    plans = []
    for tier in sorted(tiers):
        segs = sorted(tiers[tier])
        while len(segs) >= config.merge_factor:
            plans.append(segs[: config.merge_factor])
            segs = segs[config.merge_factor:]
    return plans


def run_merge_round(spark: SparkSession, index_dir: str) -> list[str]:
    """One background-merge round: execute the planner's picks."""
    meta = IndexMeta(index_dir)
    config = meta.load_config()
    out = []
    for group in plan_merges(meta, config):
        out.append(merge_segments(spark, index_dir, group))
    return out


def force_merge(
    spark: SparkSession, index_dir: str, max_segments: int = 1, compact: bool | None = None
) -> list[str]:
    """ForceMergesOnlyMergePolicy analog: merge ALL live segments down to
    `max_segments` (default 1)."""
    meta = IndexMeta(index_dir)
    live = meta.live_segments()
    if len(live) <= max_segments:
        return live
    groups = [sorted(live[i::max_segments]) for i in range(max_segments)]
    return [
        merge_segments(spark, index_dir, g, compact=compact) for g in groups if len(g) > 1
    ] + [g[0] for g in groups if len(g) == 1]


# ---------------------------------------------------------------------------
# merge execution (M1-M6, M8)
# ---------------------------------------------------------------------------

def merge_segments(
    spark: SparkSession,
    index_dir: str,
    seg_ids: list[str],
    compact: bool | None = None,
) -> str:
    """Merge `seg_ids` into one new segment. Atomic + idempotent: the new
    segment becomes visible (and the inputs retired) in a single commit-log
    entry keyed by the input set, so re-running after a crash either skips
    (already committed) or rebuilds the invisible output directory."""
    meta = IndexMeta(index_dir)
    config = meta.load_config()
    seg_ids = sorted(seg_ids)

    # which tombstones live inside these segments (liveDocs analog, M6) —
    # a distributed semi-join against the delete files, never a driver list
    dead_all_df = meta.tombstones_df(spark)
    docmaps = _union_docmaps(spark, meta, seg_ids)
    if dead_all_df is not None:
        dead_here_df = (
            docmaps.select("doc_id")
            .join(dead_all_df, "doc_id", "left_semi")
            .persist()
        )
        n_dead = dead_here_df.count()
    else:
        dead_here_df, n_dead = None, 0
    total_docs = sum(meta.read_manifest(s)["num_docs"] for s in seg_ids)
    density = (n_dead / total_docs) if total_docs else 0.0
    if compact is None:
        # density guard (JVectorWriter.java:695-699 analog): too many
        # tombstones -> incremental merge is not worth it, rebuild instead
        compact = density > config.max_tombstone_density
        if not compact:
            # pointer-growth guard: chained incremental merges flatten input
            # pointers transitively, so N auto rounds would yield a manifest
            # referencing N directories (N list/open calls per query). Past
            # the cap the auto policy forces a real compaction — the missing
            # half of the tiered policy (the reference bounds this by making
            # its merge policy force real merges,
            # ForceMergesOnlyMergePolicy.java:34-61). Explicit
            # compact=False still honors the caller (pure metadata).
            pointers = sum(len(meta.storage_rel(s, "postings")) for s in seg_ids)
            compact = pointers > MAX_INCREMENTAL_POINTERS

    digest = hashlib.sha1(
        ("|".join(seg_ids) + f"|compact={compact}").encode()
    ).hexdigest()[:12]
    new_seg = f"seg_m_{digest}"
    key = f"merge_{new_seg}"
    if meta.has_commit(key):
        if dead_here_df is not None:
            dead_here_df.unpersist()
        return new_seg

    t0 = time.time()
    source = {
        "type": "merge",
        "inputs": seg_ids,
        "mode": "compact" if compact else "incremental",
        "tombstones_dropped": n_dead if compact else 0,
    }
    if compact:
        _compact_rewrite(spark, meta, config, seg_ids, new_seg, dead_here_df)
        finalize_segment(spark, meta, config, new_seg, source, t0=t0, stage="merge")
    else:
        _incremental_manifest(spark, meta, config, seg_ids, new_seg, source, t0)
    extra = {
        "mode": "compact" if compact else "incremental",
        "merge_wall_time_sec": time.time() - t0,  # KNN_GRAPH_MERGE_TIME analog
    }
    if compact and dead_all_df is not None:
        # rewrite the tombstone state: survivors = global set minus the ids
        # this compaction dropped (a distributed anti-join + tiny parquet
        # write — the liveDocs-generation rewrite; ids never enter the JSON)
        remaining = dead_all_df.join(dead_here_df, "doc_id", "left_anti")
        r_n = remaining.count()
        rel = None
        if r_n:
            rel = meta.delete_file_rel(f"reset_{new_seg}")
            remaining.write.mode("overwrite").parquet(
                os.path.join(meta.index_dir, rel)
            )
        extra.update(
            {"tombstones_reset": True, "reset_file": rel, "reset_count": r_n}
        )
    meta.append_commit(key, op="replace", adds=[new_seg], removes=seg_ids, extra=extra)
    if dead_here_df is not None:
        dead_here_df.unpersist()
    return new_seg


def _union_docmaps(spark: SparkSession, meta: IndexMeta, seg_ids: list[str]) -> DataFrame:
    dfs = [read_parquet_union(spark, meta.docmap_paths(s)) for s in seg_ids]
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def _incremental_manifest(spark, meta, config, seg_ids, new_seg, source, t0):
    """Incremental merge (M2/M4 analog) as PURE METADATA: the new segment's
    manifest points at every input's posting/docmap/dictionary directories —
    no file is moved, linked or rewritten anywhere (works identically on
    object stores with no hard links). Valid because segments are
    doc-disjoint and blocks address global doc ids, so the merged posting
    list of a term is exactly the union of its inputs' block rows. This is
    the posting-algebra generalization of the reference's leading-segment
    graph reuse (JVectorWriter.java:752-849) taken to its limit: EVERY input
    is the leader. Pointer lists flatten transitively, so chained incremental
    merges still resolve to concrete directories; retired inputs' files stay
    referenced and are protected from GC (admin.gc_segments)."""
    manifests = [meta.read_manifest(s) for s in seg_ids]
    storage = {
        kind: [p for s in seg_ids for p in meta.storage_rel(s, kind)]
        for kind in ("postings", "docmap", "dictionary")
    }
    mins = [m["doc_id_min"] for m in manifests if m["doc_id_min"] >= 0]
    maxs = [m["doc_id_max"] for m in manifests if m["doc_id_max"] >= 0]
    # the only data touched: one tiny scan over the input dictionaries for
    # the exact distinct-term count (manifests stay deterministic)
    n_terms = (
        read_parquet_union(spark, meta._abs(storage["dictionary"]))
        .select("term")
        .distinct()
        .count()
        if sum(m["num_postings"] for m in manifests)
        else 0
    )
    manifest = {
        "segment_id": new_seg,
        "num_docs": int(sum(m["num_docs"] for m in manifests)),
        "sum_dl": int(sum(m["sum_dl"] for m in manifests)),
        "doc_id_min": int(min(mins)) if mins else -1,
        "doc_id_max": int(max(maxs)) if maxs else -1,
        "num_terms": int(n_terms),
        "num_postings": int(sum(m["num_postings"] for m in manifests)),
        "config_fingerprint": config.fingerprint(),
        "source": source,
        "storage": storage,
    }
    field_keys = sorted({k for m in manifests for k in m.get("sum_dl_fields", {})})
    if field_keys:
        manifest["sum_dl_fields"] = {
            k: int(sum(m.get("sum_dl_fields", {}).get(k, 0) for m in manifests))
            for k in field_keys
        }
    meta.write_manifest(new_seg, manifest)
    meta.write_metrics(
        new_seg,
        [
            {
                "bucket": -1,
                "n_blocks": 0,
                "n_postings": manifest["num_postings"],
                "payload_bytes": 0,  # zero bytes written — the merge IS the manifest
                "stage": "merge_total",
                "num_docs": manifest["num_docs"],
                "wall_time_sec": time.time() - t0,
            }
        ],
    )


def _decode_factory(with_positions: bool):
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pysearch.codec import decode_blocks_batch, decode_positions

        for pdf in batches:
            if len(pdf) == 0:
                continue
            # batch-decode runs of blocks per term: same-term blocks (even
            # from different input segments) have disjoint ascending id
            # ranges, so one stitched decode per term suffices
            pdf = pdf.sort_values(["term", "first_id"], kind="mergesort")
            outs = []
            for term, g in pdf.groupby("term", sort=False):
                ids, tfs, dls = decode_blocks_batch(
                    g["first_id"].to_numpy(np.int64),
                    g["last_id"].to_numpy(np.int64),
                    g["n"].to_numpy(np.int64),
                    list(g["ids"]),
                    list(g["tfs"]),
                    list(g["dls"]),
                    g["codec"].to_numpy(np.int64),
                )
                out = pd.DataFrame(
                    {
                        "term": term,
                        "doc_id": ids,
                        "dl": dls,
                        "tf": tfs,
                        "bucket": np.int32(g["bucket"].iloc[0]),
                    }
                )
                if with_positions:
                    # per-BLOCK streams must decode with their own tfs; the
                    # stitched multi-block stream is safe because deltas
                    # reset at every posting start
                    pos = decode_positions(tfs, b"".join(g["poss"]))
                    out["positions"] = np.split(
                        pos.astype(np.int32), np.cumsum(tfs)[:-1]
                    )
                else:
                    out["positions"] = [[]] * len(out)
                outs.append(out)
            yield pd.concat(outs, ignore_index=True)

    return decode


def _reencode_bucket_factory(block_size: int, min_compress: int, store_positions: bool):
    """Fused decode -> re-encode over one bucket's ENCODED block rows (the
    no-tombstone compaction kernel). The old pipeline decoded postings to
    rows in one Arrow stage and shuffled ~40 B/posting (plus position
    arrays) to the encoder; blocks are already bucketed on disk, so
    shuffling the compressed block rows instead moves ~10x fewer bytes
    (guide §2.3 — shuffle the compressed form, expand after placement) and
    skips the intermediate row materialization entirely. Per term the
    stitched multi-segment decode and the block re-encode both run inside
    one task; output blocks are byte-identical to the decode->shuffle->
    encode path (same postings, same sort, same codec policy)."""

    def reencode(pdf: pd.DataFrame) -> pd.DataFrame:
        from pysearch.codec import decode_blocks_batch, decode_positions, encode_posting_blocks

        rows: dict[str, list] = {k: [] for k in BLOCK_SCHEMA.fieldNames()}
        if not len(pdf):
            return pd.DataFrame(rows)
        bucket = int(pdf["bucket"].iloc[0])
        pdf = pdf.sort_values(["term", "first_id"], kind="mergesort")
        for term, g in pdf.groupby("term", sort=False):
            ids, tfs, dls = decode_blocks_batch(
                g["first_id"].to_numpy(np.int64),
                g["last_id"].to_numpy(np.int64),
                g["n"].to_numpy(np.int64),
                list(g["ids"]),
                list(g["tfs"]),
                list(g["dls"]),
                g["codec"].to_numpy(np.int64),
            )
            pc = None
            if store_positions:
                # stitched multi-block stream decodes with the concatenated
                # tfs (deltas reset at every posting start); ids ascend
                # across input segments, so the posting-major order already
                # matches the encode input order
                pc = decode_positions(tfs, b"".join(g["poss"]))
            for blk in encode_posting_blocks(
                ids, tfs, dls, block_size, min_compress, positions_concat=pc
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

    return reencode


def _compact_rewrite(spark, meta, config, seg_ids, new_seg, dead_df):
    """Compaction rebuild (M3/M4 fallback/M6): decode all inputs' postings,
    drop tombstoned docs, re-encode. Global doc ids are stable (they ARE the
    primary identity, unlike Lucene ordinals), so no renumbering is needed —
    the docmap simply loses the dead rows; collection stats become exact
    again. Runs distributed end to end; two plans by tombstone presence:

    * no tombstones (force-merge compaction): the ENCODED block rows shuffle
      by bucket and each task decodes + re-encodes its bucket's terms in one
      pass (_reencode_bucket_factory) — no decoded-posting exchange at all.
    * with tombstones: decode via mapInPandas, dead docs masked by an
      anti-join against the delete-file DataFrame (AQE broadcasts it while
      it fits, shuffles when it doesn't — ids never ride the driver),
      re-encode via the same bucketed applyInPandas as the build path (M5:
      identical compression parameters are reused by construction)."""
    os.makedirs(meta.segment_dir(new_seg), exist_ok=True)
    blocks = [
        read_parquet_union(spark, meta.postings_paths(s), schema=BLOCK_SCHEMA)
        for s in seg_ids
    ]
    allb = blocks[0]
    for b in blocks[1:]:
        allb = allb.unionByName(b)
    if dead_df is None:
        reenc = allb.groupBy("bucket").applyInPandas(
            _reencode_bucket_factory(
                config.block_size, config.min_block_docs, config.store_positions
            ),
            schema=BLOCK_SCHEMA,
        )
    else:
        rows = allb.mapInPandas(
            _decode_factory(config.store_positions), schema=_POSTING_ROW_SCHEMA
        ).join(dead_df, "doc_id", "left_anti")
        reenc = rows.groupBy("bucket").applyInPandas(
            _encode_bucket_factory(
                config.block_size, config.min_block_docs,
                store_positions=config.store_positions,
            ),
            schema=BLOCK_SCHEMA,
        )
    reenc.write.mode("overwrite").partitionBy("bucket").parquet(
        meta.postings_path(new_seg)
    )
    dm = _union_docmaps(spark, meta, seg_ids)
    if dead_df is not None:
        dm = dm.join(dead_df, "doc_id", "left_anti")
    (
        dm.repartitionByRange(4, "doc_id")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .parquet(meta.docmap_path(new_seg))
    )


# ---------------------------------------------------------------------------
# deletes & updates (tombstones; JVectorMergeWithDeletedDocsTests scenario)
# ---------------------------------------------------------------------------

def delete_docs(
    spark: SparkSession,
    index_dir: str,
    key: str,
    doc_ids: list[int] | None = None,
    where: str | None = None,
    doc_ids_df: DataFrame | None = None,
) -> int:
    """Tombstone docs by id, by predicate over identity columns, or by an
    id-carrying DataFrame (the fully-distributed path for bulk deletes).
    Queries mask them immediately; stats update at the next compaction
    (Lucene liveDocs semantics). Idempotent per `key`.

    Scale path: the dead ids are written as a PARQUET DELETE FILE referenced
    from the commit (never inlined in JSON or plans) — a ``where`` predicate
    deleting 10% of a 10^9-doc corpus stays distributed end to end: docmap
    scan -> dedup vs existing tombstones (anti-join) -> parquet write."""
    meta = IndexMeta(index_dir)
    if meta.has_commit(f"delete_{key}"):
        return 0
    if doc_ids_df is not None:
        dead = doc_ids_df.select(F.col("doc_id").cast("long")).distinct()
    elif doc_ids is None:
        if where is None:
            raise ValueError("need doc_ids, doc_ids_df or where")
        live = meta.live_segments()
        dms = [read_parquet_union(spark, meta.docmap_paths(s)) for s in live]
        dm = dms[0]
        for d in dms[1:]:
            dm = dm.unionByName(d)
        dead = dm.where(where).select(F.col("doc_id").cast("long")).distinct()
    else:
        dead = spark.createDataFrame(
            [(int(d),) for d in set(doc_ids)], "doc_id long"
        )
    existing = meta.tombstones_df(spark)
    if existing is not None:
        dead = dead.join(existing, "doc_id", "left_anti")
    rel = meta.delete_file_rel(key)
    path = os.path.join(meta.index_dir, rel)
    os.makedirs(meta.deletes_dir(), exist_ok=True)
    dead.write.mode("overwrite").parquet(path)
    n = spark.read.schema("doc_id long").parquet(path).count()
    meta.append_commit(
        f"delete_{key}", op="delete", extra={"delete_file": rel, "delete_count": n}
    )
    return n


def apply_updates(
    spark: SparkSession,
    index_dir: str,
    updates: pd.DataFrame,
    batch_key: str,
) -> dict:
    """One FIXTURES.md §3 batch: rows (op in {delete, update}, repo, path,
    content?). update = delete old doc + index new content as an append
    segment (the OpenSearch update model). Idempotent per batch_key."""
    meta = IndexMeta(index_dir)
    live = meta.live_segments()
    dms = [read_parquet_union(spark, meta.docmap_paths(s)) for s in live]
    dm = dms[0]
    for d in dms[1:]:
        dm = dm.unionByName(d)

    keys = spark.createDataFrame(updates[["repo", "path", "op"]])
    affected = dm.join(keys, ["repo", "path"], "inner").select("doc_id", "op")
    n_dead = delete_docs(
        spark, index_dir, key=batch_key, doc_ids_df=affected.select("doc_id")
    )

    upd = updates[updates["op"] == "update"]
    new_seg = None
    if len(upd):
        lang_map = (
            dm.join(
                spark.createDataFrame(upd[["repo", "path"]]), ["repo", "path"], "inner"
            )
            .select("repo", "path", "lang")
        )
        new_rows = (
            spark.createDataFrame(upd[["repo", "path", "content"]])
            .join(lang_map, ["repo", "path"], "left")
            .select(
                "repo",
                "path",
                F.md5(F.concat_ws(":", "repo", "path", "content")).alias("commit"),
                F.coalesce("lang", F.lit("unknown")).alias("lang"),
                "content",
            )
        )
        new_seg = append_segment(spark, index_dir, new_rows, key=f"upd_{batch_key}")
    return {"tombstoned": n_dead, "append_segment": new_seg}
