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
* Tombstones (deleted doc ids) ride in ``delete`` commits. At test scale
  they are inlined in the JSON; at 10^12-file scale the commit would carry a
  parquet file reference instead — the log schema already has the field.

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
            if self.has_commit(key):
                return False
            tmp = os.path.join(self.commits_dir, f".tmp__{key}.{os.getpid()}.json")
            seq = len(self._commit_files())
            while True:
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
                    seq += 1  # another writer took this seq — retry

    def live_segments(self) -> list[str]:
        live: list[str] = []
        for c in self.commits():
            for s in c["removes"]:
                if s in live:
                    live.remove(s)
            for s in c["adds"]:
                live.append(s)
        return sorted(live)

    def tombstones(self) -> set[int]:
        """Deleted doc ids not yet compacted away. A compact-merge commit
        clears the tombstones of the segments it replaces via the
        ``cleared`` marker in extra."""
        dead: set[int] = set()
        for c in self.commits():
            dead.update(c.get("deleted_doc_ids", []))
            if c.get("extra", {}).get("tombstones_cleared"):
                dead.difference_update(c["extra"]["tombstones_cleared"])
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
