"""Index metadata: commit log, manifests, tombstones, metrics.

The reference persists a per-segment manifest (VectorIndexFieldMetadata,
JVectorWriter.java:512-563) and relies on Lucene's segments_N generation
files for atomic visibility of flushes/merges. We re-express that as a tiny
append-only JSON commit log (the Iceberg-snapshot pattern):

    index_dir/
      config.json                   # IndexConfig + fingerprint
      commits/000123__<key>.json    # {op, adds, removes, deleted_doc_ids}
      manifest/<segment_id>.json    # deterministic per-segment manifest
      segments/<segment_id>/        # docmap.parquet, postings.parquet,
                                    # dictionary.parquet
      metrics/<segment_id>.parquet  # per-bucket lineage/metrics rows
      _staging/corpus/              # id-assigned corpus, partitioned by seg

* Every commit file carries an idempotency ``key``; re-running a completed
  stage finds its key and skips (resume-idempotence, north_rule).
* A merge is one atomic commit {adds, removes}: readers replay the log, so
  a crash before the commit leaves the old segments live and the new
  directory invisible (garbage, collectable) — never a mixed state.
* Manifests are deterministic (no timestamps) so a resumed build reproduces
  them byte-identically; wall-times live in metrics, not manifests.
* Tombstones (deleted doc ids) live in parquet DELETE FILES under
  ``deletes/``, referenced from ``delete`` commits; a compact merge commits a
  rewritten ``reset_file`` with the survivors (Iceberg delete-file / Lucene
  liveDocs-generation pattern) — ids never ride in JSON or in query plans.

All writes are atomic: write ``<file>.tmp`` then ``os.replace``. On a real
deployment this layer maps onto Iceberg table commits / a DFS with atomic
rename; the protocol is identical.
"""

from __future__ import annotations

import json
import os
import threading
import time
from dataclasses import asdict
from typing import Any

from pysearch.config import IndexConfig

# serializes commit-sequence allocation across the driver's builder threads
# (build_index commits segments from a thread pool); cross-process writers
# are handled by the exclusive-create in append_commit
_COMMIT_LOCK = threading.Lock()


def read_parquet_union(spark, paths: list[str], schema=None):
    """Read several parquet roots as one DataFrame via per-root union.
    Required because bucket-partitioned roots (postings) cannot be listed in
    a single spark.read.parquet(p1, p2, ...) call — Spark's partition
    discovery rejects multiple conflicting directory roots. Each root keeps
    its own scan node, so partition pruning still applies per root."""
    dfs = []
    for p in paths:
        reader = spark.read
        if schema is not None:
            reader = reader.schema(schema)
        dfs.append(reader.parquet(p))
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def _write_json_atomic(path: str, payload: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, sort_keys=True, indent=1)
    os.replace(tmp, path)


class IndexMeta:
    """Driver-side handle on an index directory's metadata."""

    def __init__(self, index_dir: str):
        self.index_dir = index_dir
        self.commits_dir = os.path.join(index_dir, "commits")
        self.manifest_dir = os.path.join(index_dir, "manifest")
        self.segments_dir = os.path.join(index_dir, "segments")
        self.metrics_dir = os.path.join(index_dir, "metrics")
        self.staging_dir = os.path.join(index_dir, "_staging")

    # -- lifecycle ---------------------------------------------------------
    def initialize(self, config: IndexConfig) -> None:
        for d in (
            self.index_dir,
            self.commits_dir,
            self.manifest_dir,
            self.segments_dir,
            self.metrics_dir,
            self.staging_dir,
        ):
            os.makedirs(d, exist_ok=True)
        cfg_path = os.path.join(self.index_dir, "config.json")
        if os.path.exists(cfg_path):
            existing = json.load(open(cfg_path))
            if existing["fingerprint"] != config.fingerprint():
                raise ValueError(
                    "index at %s was built with a different IndexConfig "
                    "(fingerprint %s != %s); refusing to mix segments"
                    % (self.index_dir, existing["fingerprint"], config.fingerprint())
                )
        else:
            _write_json_atomic(
                cfg_path,
                {"config": asdict(config), "fingerprint": config.fingerprint()},
            )

    def load_config(self) -> IndexConfig:
        raw = json.load(open(os.path.join(self.index_dir, "config.json")))["config"]
        return IndexConfig(**raw)

    # -- commit log --------------------------------------------------------
    def _commit_files(self) -> list[str]:
        if not os.path.isdir(self.commits_dir):
            return []
        return sorted(
            f
            for f in os.listdir(self.commits_dir)
            if f.endswith(".json") and not f.startswith(".")
        )

    def commits(self) -> list[dict]:
        return [json.load(open(os.path.join(self.commits_dir, f))) for f in self._commit_files()]

    def has_commit(self, key: str) -> bool:
        suffix = f"__{key}.json"
        return any(f.endswith(suffix) for f in self._commit_files())

    def append_commit(
        self,
        key: str,
        op: str,
        adds: list[str] | None = None,
        removes: list[str] | None = None,
        deleted_doc_ids: list[int] | None = None,
        extra: dict | None = None,
    ) -> bool:
        """Append a commit; returns False if `key` was already committed
        (idempotent re-run). Sequence numbers are unique and ordered even
        under concurrent appenders: allocation is lock-serialized in-process
        and the commit file is claimed with an exclusive create (os.link onto
        a unique temp file fails if the seq was taken), retrying on collision.
        """
        with _COMMIT_LOCK:
            tmp = os.path.join(self.commits_dir, f".tmp__{key}.{os.getpid()}.json")
            suffix = f"__{key}.json"
            while True:
                # key-idempotence and seq allocation from the SAME listing:
                # if another process committed this key between iterations
                # (its link can land under any seq), this re-check sees it
                # before we would claim a second seq for the same key
                files = self._commit_files()
                if any(f.endswith(suffix) for f in files):
                    try:
                        os.unlink(tmp)
                    except FileNotFoundError:
                        pass
                    return False
                seq = len(files)
                payload: dict[str, Any] = {
                    "seq": seq,
                    "key": key,
                    "op": op,
                    "adds": adds or [],
                    "removes": removes or [],
                    "deleted_doc_ids": deleted_doc_ids or [],
                }
                if extra:
                    payload["extra"] = extra
                with open(tmp, "w") as f:
                    json.dump(payload, f, sort_keys=True, indent=1)
                final = os.path.join(self.commits_dir, f"{seq:08d}__{key}.json")
                try:
                    os.link(tmp, final)  # atomic + exclusive claim of `seq`
                    os.unlink(tmp)
                    return True
                except FileExistsError:
                    continue  # another writer took this seq — re-list, retry

    def live_segments(self) -> list[str]:
        live: list[str] = []
        for c in self.commits():
            for s in c["removes"]:
                if s in live:
                    live.remove(s)
            for s in c["adds"]:
                live.append(s)
        return sorted(live)

    # -- tombstones ----------------------------------------------------------
    # Deleted doc ids live in PARQUET DELETE FILES under index_dir/deletes/,
    # referenced from delete commits (``extra.delete_file``) — never inlined
    # in JSON or in query plans, so a 10M-doc delete costs one small parquet
    # file and a distributed anti-join, not a driver list (the Iceberg
    # delete-file pattern). A compact merge REWRITES the state: its commit
    # carries ``extra.tombstones_reset`` + ``reset_file`` holding the
    # tombstones that survive the compaction (Lucene liveDocs-generation
    # analog). Replay = fold events in commit order. Legacy inline
    # ``deleted_doc_ids`` / ``tombstones_cleared`` commits are still replayed
    # for old indexes.

    def deletes_dir(self) -> str:
        return os.path.join(self.index_dir, "deletes")

    def delete_file_rel(self, key: str) -> str:
        return os.path.join("deletes", f"{key}.parquet")

    def tombstone_events(self) -> list[tuple[str, Any]]:
        """Ordered tombstone replay events:
        ("reset", rel_path | None) | ("add_file", rel_path) |
        ("add_inline", ids) | ("sub_inline", ids)."""
        ev: list[tuple[str, Any]] = []
        for c in self.commits():
            ex = c.get("extra", {})
            if ex.get("tombstones_reset"):
                ev.append(("reset", ex.get("reset_file")))
            elif ex.get("tombstones_cleared"):
                ev.append(("sub_inline", ex["tombstones_cleared"]))
            if ex.get("delete_file"):
                ev.append(("add_file", ex["delete_file"]))
            if c.get("deleted_doc_ids"):
                ev.append(("add_inline", c["deleted_doc_ids"]))
        return ev

    def tombstone_count(self) -> int:
        """Exact current tombstone count, replayed from the per-commit counts
        (delete files are written pre-deduplicated against the prior state,
        so counts are additive). O(commits), no file reads."""
        n = 0
        for kind, val in self._tombstone_count_events():
            if kind == "reset":
                n = val
            else:
                n += val
        return n

    def _tombstone_count_events(self) -> list[tuple[str, int]]:
        ev: list[tuple[str, int]] = []
        for c in self.commits():
            ex = c.get("extra", {})
            if ex.get("tombstones_reset"):
                ev.append(("reset", int(ex.get("reset_count", 0))))
            elif ex.get("tombstones_cleared"):
                ev.append(("add", -len(ex["tombstones_cleared"])))
            if ex.get("delete_file"):
                ev.append(("add", int(ex.get("delete_count", 0))))
            if c.get("deleted_doc_ids"):
                ev.append(("add", len(c["deleted_doc_ids"])))
        return ev

    def tombstones_df(self, spark) -> "Any | None":
        """Current tombstone set as a DataFrame(doc_id long) — the form every
        query/merge plan consumes (distributed anti-join, never a collected
        list). Returns None when no tombstones exist."""
        from pyspark.sql import functions as F

        if self.tombstone_count() == 0:
            return None
        cur = None
        for kind, val in self.tombstone_events():
            if kind == "reset":
                cur = (
                    spark.read.schema("doc_id long").parquet(
                        os.path.join(self.index_dir, val)
                    )
                    if val
                    else None
                )
            elif kind == "add_file":
                df = spark.read.schema("doc_id long").parquet(
                    os.path.join(self.index_dir, val)
                )
                cur = df if cur is None else cur.unionByName(df)
            elif kind == "add_inline":
                df = spark.createDataFrame([(int(i),) for i in val], "doc_id long")
                cur = df if cur is None else cur.unionByName(df)
            elif kind == "sub_inline" and cur is not None:
                cur = cur.where(~F.col("doc_id").isin([int(i) for i in val]))
        return cur

    def tombstones(self) -> set[int]:
        """Driver-side materialized tombstone set — an admin/test convenience
        for SMALL states only; query and merge plans use tombstones_df()."""
        import pyarrow.parquet as pq

        def read_ids(rel: str) -> set[int]:
            path = os.path.join(self.index_dir, rel)
            files = (
                [
                    os.path.join(path, f)
                    for f in sorted(os.listdir(path))
                    if f.endswith(".parquet")
                ]
                if os.path.isdir(path)
                else [path]
            )
            out: set[int] = set()
            for f in files:
                out.update(pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist())
            return out

        dead: set[int] = set()
        for kind, val in self.tombstone_events():
            if kind == "reset":
                dead = read_ids(val) if val else set()
            elif kind == "add_file":
                dead |= read_ids(val)
            elif kind == "add_inline":
                dead.update(int(i) for i in val)
            elif kind == "sub_inline":
                dead.difference_update(int(i) for i in val)
        return dead

    def doc_id_hwm(self) -> int:
        """Monotonic doc-id high-watermark: the max doc_id EVER assigned,
        replayed from the commit log (``extra.doc_id_max`` stamped by every
        build/append commit). Live manifests alone are not enough — a compact
        merge that drops the highest tombstoned docs shrinks their
        doc_id_max, and allocating appends from it would silently reuse ids
        of deleted documents."""
        hwm = -1
        for c in self.commits():
            hwm = max(hwm, int(c.get("extra", {}).get("doc_id_max", -1)))
        for m in self.live_manifests().values():
            hwm = max(hwm, int(m.get("doc_id_max", -1)))
        return hwm

    # -- manifests ---------------------------------------------------------
    def write_manifest(self, segment_id: str, manifest: dict) -> None:
        _write_json_atomic(
            os.path.join(self.manifest_dir, f"{segment_id}.json"), manifest
        )

    def read_manifest(self, segment_id: str) -> dict:
        return json.load(open(os.path.join(self.manifest_dir, f"{segment_id}.json")))

    def live_manifests(self) -> dict[str, dict]:
        return {s: self.read_manifest(s) for s in self.live_segments()}

    # -- paths -------------------------------------------------------------
    def segment_dir(self, segment_id: str) -> str:
        return os.path.join(self.segments_dir, segment_id)

    def postings_path(self, segment_id: str) -> str:
        return os.path.join(self.segment_dir(segment_id), "postings.parquet")

    def docmap_path(self, segment_id: str) -> str:
        return os.path.join(self.segment_dir(segment_id), "docmap.parquet")

    def dictionary_path(self, segment_id: str) -> str:
        return os.path.join(self.segment_dir(segment_id), "dictionary.parquet")

    def staging_corpus_path(self) -> str:
        return os.path.join(self.staging_dir, "corpus")

    # -- storage resolution --------------------------------------------------
    # An incrementally-merged segment owns NO data files: its manifest's
    # ``storage`` maps each kind to the (relative) directories of its inputs
    # (pure-metadata merge — the zero-copy generalization of the reference's
    # leading-segment reuse). Readers resolve through these lists; segments
    # without ``storage`` read their own directory.

    def storage_rel(self, segment_id: str, kind: str) -> list[str]:
        """Relative data paths of `kind` ('postings'|'docmap'|'dictionary')."""
        own = {
            "postings": self.postings_path,
            "docmap": self.docmap_path,
            "dictionary": self.dictionary_path,
        }[kind](segment_id)
        mf = os.path.join(self.manifest_dir, f"{segment_id}.json")
        if os.path.exists(mf):
            st = json.load(open(mf)).get("storage")
            if st and kind in st:
                return list(st[kind])
        return [os.path.relpath(own, self.index_dir)]

    def _abs(self, rels: list[str]) -> list[str]:
        return [os.path.join(self.index_dir, p) for p in rels]

    def postings_paths(self, segment_id: str) -> list[str]:
        return self._abs(self.storage_rel(segment_id, "postings"))

    def docmap_paths(self, segment_id: str) -> list[str]:
        return self._abs(self.storage_rel(segment_id, "docmap"))

    def dictionary_paths(self, segment_id: str) -> list[str]:
        return self._abs(self.storage_rel(segment_id, "dictionary"))

    # -- metrics (KNNCounter / stats analog, StatNames.java:14-58) ----------
    _METRIC_COLS = (
        ("segment_id", "string"),
        ("stage", "string"),
        ("bucket", "int64"),
        ("n_blocks", "int64"),
        ("n_postings", "int64"),
        ("payload_bytes", "int64"),
        ("num_docs", "int64"),
        ("wall_time_sec", "float64"),
        ("ts", "float64"),
    )

    def write_metrics(self, segment_id: str, rows: list[dict]) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        path = os.path.join(self.metrics_dir, f"{segment_id}.parquet")
        now = time.time()
        schema = pa.schema([(n, t) for n, t in self._METRIC_COLS])
        stamped = [
            {
                name: dict(r, segment_id=segment_id, ts=now).get(name)
                for name, _ in self._METRIC_COLS
            }
            for r in rows
        ]
        pq.write_table(pa.Table.from_pylist(stamped, schema=schema), path + ".tmp")
        os.replace(path + ".tmp", path)
