"""Regression tests for the round-1 advisor findings (ADVICE.md):

1. min_score (radial) mode must return EVERY hit >= min_score — no silent
   per-segment or global truncation (the 10k cap applied only to k mode).
2. store_positions builds must reject docs whose length overflows the 22-bit
   phrase position packing, loudly, at index time.
3. Prefix queries keep the leading analyzed subtokens of a starred token
   ('fooBar*' scores 'foo' as a term and expands only 'bar').
4. Commit sequence numbers stay unique and ordered under concurrent appends.
5. Appended doc ids never reuse ids freed by a compact merge (monotonic
   high-watermark from the commit log).
"""

import concurrent.futures as cf
import json
import os

import pytest
from pyspark.sql import functions as F

from pysearch.build import append_segment, build_index, next_doc_id
from pysearch.checkpoint import IndexMeta
from pysearch.config import IndexConfig
from pysearch.merge import delete_docs, force_merge
from pysearch.query import Query, SearchIndex


def _tiny_corpus(spark, rows):
    return spark.createDataFrame(
        [("r", f"p{i:05d}", "c", "py", text) for i, text in enumerate(rows)],
        "repo string, path string, commit string, lang string, content string",
    )


def test_min_score_returns_all_matches_beyond_k_cap(spark, tmp_index):
    # 30 matching docs with k-mode cap forced far below the match count:
    # min_score mode must still return every one of them
    rows = [f"alpha common w{i}" for i in range(30)] + ["unrelated text"] * 5
    cfg = IndexConfig(segment_rows=8, term_buckets=4, approximate_threshold=4)
    build_index(spark, _tiny_corpus(spark, rows), tmp_index, cfg)
    si = SearchIndex(spark, tmp_index)
    hits = si.search(Query(text="alpha", k=None, min_score=1e-9, overquery_factor=1))
    assert hits.count() == 30
    # batch path: same contract
    out = si.search_batch([Query(text="alpha", k=None, min_score=1e-9)])
    assert out.count() == 30


def test_position_overflow_guard(spark, tmp_index):
    big = " ".join(["tok"] * ((1 << 22) + 5))
    cfg = IndexConfig(segment_rows=4, term_buckets=2, store_positions=True)
    with pytest.raises(Exception) as ei:
        build_index(spark, _tiny_corpus(spark, ["ok doc", big]), tmp_index, cfg)
    assert "2^22" in str(ei.value)


def test_prefix_keeps_leading_subtokens(spark, tmp_index):
    rows = ["foo only doc", "bar only doc", "baz filler"]
    cfg = IndexConfig(
        segment_rows=8, term_buckets=4, approximate_threshold=4,
        extra={"code_aware": True},
    )
    build_index(spark, _tiny_corpus(spark, rows), tmp_index, cfg)
    si = SearchIndex(spark, tmp_index)
    terms = si._tokenize_query("fooBar*")
    assert terms[0] == "foo", terms  # leading subtoken kept as a normal term
    assert "bar" in terms  # final subtoken expanded over the dictionary
    hits = si.search(Query(text="fooBar*", k=10))
    got = {r["path"] for r in hits.collect()}
    assert got == {"p00000", "p00001"}  # both the foo doc and the bar doc


def test_commit_seq_unique_under_concurrency(tmp_index):
    meta = IndexMeta(tmp_index)
    meta.initialize(IndexConfig())
    base = len(meta._commit_files())
    with cf.ThreadPoolExecutor(max_workers=8) as pool:
        list(pool.map(lambda i: meta.append_commit(f"k{i}", op="add"), range(24)))
    files = meta._commit_files()
    assert len(files) == base + 24
    seqs = [json.load(open(os.path.join(meta.commits_dir, f)))["seq"] for f in files]
    assert sorted(seqs) == list(range(len(files)))  # unique AND dense
    for f, s in zip(files, sorted(seqs)):
        assert f.startswith(f"{s:08d}__")  # filename order == replay order


def test_append_never_reuses_compacted_doc_ids(spark, tmp_index):
    rows = [f"doc number w{i}" for i in range(20)]
    cfg = IndexConfig(segment_rows=8, term_buckets=4)
    build_index(spark, _tiny_corpus(spark, rows), tmp_index, cfg)
    meta = IndexMeta(tmp_index)
    hwm_before = meta.doc_id_hwm()
    assert hwm_before == 19
    # tombstone the TOP ids, then compact: live manifests' doc_id_max shrinks
    delete_docs(spark, tmp_index, key="top", doc_ids=[16, 17, 18, 19])
    force_merge(spark, tmp_index, max_segments=1, compact=True)
    live_max = max(m["doc_id_max"] for m in meta.live_manifests().values())
    assert live_max == 15
    assert next_doc_id(meta) == 20  # watermark survives the compaction
    append_segment(
        spark, tmp_index, _tiny_corpus(spark, ["fresh appended doc"]), key="a1"
    )
    si = SearchIndex(spark, tmp_index)
    new_ids = {
        r["doc_id"]
        for r in si.docmaps().where(F.col("path") == "p00000").collect()
        if r["doc_id"] >= 20
    }
    assert new_ids == {20}  # appended doc got a never-used id


def test_first_pass_k_clamps_and_defaults():
    """RescoreContext.getFirstPassK analog (RescoreContext.java:83-99):
    user oversample wins, width-based defaults otherwise, [100, 10000]
    clamps always."""
    from pysearch.query import first_pass_k

    assert first_pass_k(10, 5, n_terms=2) == 100       # MIN clamp
    assert first_pass_k(10_000, 5, n_terms=2) == 10_000  # MAX clamp
    assert first_pass_k(200, 2, n_terms=1) == 400      # user-provided wins
    # width-based defaults: narrow queries oversample more
    assert first_pass_k(200, None, n_terms=1) == 600   # <4 terms -> 3x
    assert first_pass_k(200, None, n_terms=5) == 400   # 4..9 terms -> 2x
    assert first_pass_k(200, None, n_terms=12) == 200  # >=10 terms -> 1x
    # config floor raises the default, never lowers it
    assert first_pass_k(200, None, n_terms=12, floor=5) == 1000


def test_commit_key_idempotent_across_handles(tmp_index):
    """Same key via different IndexMeta handles (the cross-process shape):
    exactly one commit lands; a pre-claimed seq is skipped, not corrupted."""
    m1, m2 = IndexMeta(tmp_index), IndexMeta(tmp_index)
    m1.initialize(IndexConfig())
    assert m1.append_commit("dup", op="add") is True
    assert m2.append_commit("dup", op="add") is False  # second writer yields
    files = [f for f in m1._commit_files() if f.endswith("__dup.json")]
    assert len(files) == 1
    # a foreign file claiming the next seq forces the retry path
    seq = len(m1._commit_files())
    import json as _json

    with open(os.path.join(m1.commits_dir, f"{seq:08d}__foreign.json"), "w") as f:
        _json.dump({"seq": seq, "key": "foreign", "op": "add", "adds": [],
                    "removes": [], "deleted_doc_ids": []}, f)
    assert m2.append_commit("after", op="add") is True
    seqs = [int(f.split("__")[0]) for f in m1._commit_files()]
    assert sorted(seqs) == list(range(len(seqs)))


def test_overquery_validation():
    with pytest.raises(ValueError):
        Query(text="x", k=5, overquery_factor=0).validate()
    Query(text="x", k=5, overquery_factor=1).validate()  # ok


def test_concurrent_searches_are_safe(spark, tmp_path):
    """The single-query conf tuning engages under a try-lock: two threads
    searching concurrently both return correct results (an overlapping
    query runs untuned rather than racing the save/restore), and the
    session confs are restored afterwards."""
    import threading

    from pysearch.build import build_index
    from pysearch.config import IndexConfig
    from pysearch.fixtures import generate_repo_files
    from pysearch.query import Query, SearchIndex

    idx = str(tmp_path / "conc_idx")
    build_index(
        spark, generate_repo_files(spark, 300, seed=21), idx,
        IndexConfig(segment_rows=128, term_buckets=4),
    )
    si = SearchIndex(spark, idx)
    expected = {
        t: [(r["doc_id"], round(float(r["score"]), 9))
            for r in si.search(Query(text=t, k=5)).collect()]
        for t in ("license merge", "import license")
    }
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled")

    results, errors = {}, []

    def run(t):
        try:
            for _ in range(3):
                rows = si.search(Query(text=t, k=5)).collect()
                got = [(r["doc_id"], round(float(r["score"]), 9)) for r in rows]
                assert got == expected[t], t
            results[t] = True
        except Exception as e:  # surfaced below
            errors.append((t, e))

    threads = [threading.Thread(target=run, args=(t,)) for t in expected]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    assert len(results) == 2
    assert spark.conf.get("spark.sql.adaptive.enabled") == aqe_before
