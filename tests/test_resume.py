"""Checkpoint/resume tests (north_rule: build resumes idempotently
mid-segment from the checkpoint table; FIXTURES.md invariant #3: killing the
build after segment i and re-running produces byte-identical manifests and
identical query results, each (segment, stage) committed exactly once)."""

import json
import os

import pytest

from pysearch.build import build_index
from pysearch.checkpoint import IndexMeta
from pysearch.config import IndexConfig
from pysearch.fixtures import generate_repo_files
from pysearch.query import Query, SearchIndex

CFG = IndexConfig(segment_rows=128, term_buckets=8, approximate_threshold=32)


def _manifest_bytes(idx, seg):
    with open(os.path.join(idx, "manifest", f"{seg}.json"), "rb") as f:
        return f.read()


def test_kill_and_resume_byte_identical(spark, tmp_index, tmp_path):
    corpus = generate_repo_files(spark, 400, seed=42)

    # simulated crash: stop after 2 segments committed
    build_index(spark, corpus, tmp_index, CFG, stop_after_segments=2)
    meta = IndexMeta(tmp_index)
    partial = meta.live_segments()
    assert len(partial) == 2
    early = {s: _manifest_bytes(tmp_index, s) for s in partial}
    commits_before = {c["key"] for c in meta.commits()}

    # resume to completion
    build_index(spark, corpus, tmp_index, CFG)
    full = meta.live_segments()
    assert len(full) == 4  # 400 docs / 128
    # committed-once: earlier segments untouched, manifests byte-identical
    for s, blob in early.items():
        assert _manifest_bytes(tmp_index, s) == blob
    keys = [c["key"] for c in meta.commits()]
    assert len(keys) == len(set(keys))
    assert commits_before <= set(keys)

    # a from-scratch build of the same corpus gives byte-identical manifests
    ref_idx = str(tmp_path / "ref")
    build_index(spark, corpus, ref_idx, CFG)
    for s in full:
        assert _manifest_bytes(tmp_index, s) == _manifest_bytes(ref_idx, s)

    # and identical query results
    a = SearchIndex(spark, tmp_index).search(Query(text="license merge tok0300", k=10))
    b = SearchIndex(spark, ref_idx).search(Query(text="license merge tok0300", k=10))
    assert [r.asDict() for r in a.collect()] == [r.asDict() for r in b.collect()]


def test_rerun_completed_build_is_noop(spark, tmp_index):
    corpus = generate_repo_files(spark, 200, seed=3)
    build_index(spark, corpus, tmp_index, CFG)
    meta = IndexMeta(tmp_index)
    n = len(meta.commits())
    build_index(spark, corpus, tmp_index, CFG)
    assert len(meta.commits()) == n


def test_config_fingerprint_guard(spark, tmp_index):
    corpus = generate_repo_files(spark, 100, seed=3)
    build_index(spark, corpus, tmp_index, CFG)
    with pytest.raises(ValueError, match="different IndexConfig"):
        build_index(spark, corpus, tmp_index, IndexConfig(segment_rows=999))


def test_commit_log_replay(tmp_index):
    meta = IndexMeta(tmp_index)
    meta.initialize(CFG)
    meta.append_commit("a", op="add", adds=["s1"])
    meta.append_commit("b", op="add", adds=["s2"])
    meta.append_commit("m", op="replace", adds=["s3"], removes=["s1", "s2"])
    meta.append_commit("d", op="delete", deleted_doc_ids=[5, 6])
    assert meta.live_segments() == ["s3"]
    assert meta.tombstones() == {5, 6}
    meta.append_commit(
        "m2", op="replace", adds=["s4"], removes=["s3"],
        extra={"tombstones_cleared": [5, 6]},
    )
    assert meta.live_segments() == ["s4"] and meta.tombstones() == set()
    # idempotency
    assert meta.append_commit("a", op="add", adds=["zz"]) is False
    assert meta.live_segments() == ["s4"]


def test_merge_crash_before_commit_recovers(spark, tmp_index):
    """A merge that died after writing data but BEFORE its commit leaves the
    output invisible (old segments stay live); re-running the merge succeeds
    and produces a consistent index (the atomic-visibility guarantee)."""
    import shutil

    from pyspark.sql import functions as F

    from pysearch.fixtures import generate_repo_files
    from pysearch.merge import merge_segments

    corpus = generate_repo_files(spark, 300, seed=21)
    build_index(spark, corpus, tmp_index, CFG)
    meta = IndexMeta(tmp_index)
    segs = meta.live_segments()[:2]

    # simulate the crash: materialize a half-written merge output with no
    # commit — a garbage dir that the retry must overwrite
    import hashlib

    digest = hashlib.sha1(("|".join(sorted(segs)) + "|compact=False").encode()).hexdigest()[:12]
    victim = meta.segment_dir(f"seg_m_{digest}")
    os.makedirs(os.path.join(victim, "postings.parquet"), exist_ok=True)
    with open(os.path.join(victim, "postings.parquet", "garbage"), "w") as f:
        f.write("partial")
    assert meta.live_segments() == sorted(set(meta.live_segments()))  # old still live
    assert f"seg_m_{digest}" not in meta.live_segments()

    new_seg = merge_segments(spark, tmp_index, segs)
    assert new_seg == f"seg_m_{digest}"
    assert new_seg in meta.live_segments()
    from pysearch.query import Query, SearchIndex

    si = SearchIndex(spark, tmp_index)
    assert si.search(Query(text="license merge", k=5)).count() == 5
