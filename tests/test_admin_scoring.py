"""Integrity verification (I5), stats surface (Q18), custom scoring (Q12)."""

import pytest
from pyspark.sql import functions as F

from pysearch.admin import stats, verify_index
from pysearch.build import build_index
from pysearch.config import IndexConfig
from pysearch.corpus import assign_doc_ids
from pysearch.fixtures import generate_repo_files
from pysearch.merge import force_merge
from pysearch.checkpoint import IndexMeta
from pysearch.oracle import custom_score_topk

CFG = IndexConfig(segment_rows=128, term_buckets=8)


def test_verify_index_and_stats(spark, tmp_index):
    corpus = generate_repo_files(spark, 300, seed=5).persist()
    build_index(spark, corpus, tmp_index, CFG)
    summary = verify_index(spark, tmp_index, corpus=corpus)
    assert summary["segments"] >= 2
    assert summary["docs"] == corpus.count() == summary["sha_checked"]

    s = stats(spark, tmp_index)
    assert s.where("stage = 'build_total'").count() == summary["segments"]
    row = s.where("stage = 'build_total'").agg(
        F.sum("num_docs"), F.sum("n_postings")
    ).collect()[0]
    assert row[0] == summary["docs"] and row[1] == summary["postings"]

    # merge adds merge-stage metrics and stays verifiable
    force_merge(spark, tmp_index, max_segments=1)
    assert verify_index(spark, tmp_index, corpus=corpus)["segments"] == 1
    assert stats(spark, tmp_index).where("stage = 'merge_total'").count() == 1
    corpus.unpersist()


def test_verify_detects_corruption(spark, tmp_index):
    corpus = generate_repo_files(spark, 150, seed=6)
    meta = build_index(spark, corpus, tmp_index, CFG)
    seg = meta.live_segments()[0]
    m = meta.read_manifest(seg)
    m["num_postings"] += 1  # corrupt the manifest
    meta.write_manifest(seg, m)
    with pytest.raises(AssertionError, match="postings != manifest"):
        verify_index(spark, tmp_index)


def test_custom_score_hook(spark):
    corpus = assign_doc_ids(generate_repo_files(spark, 200, seed=7))
    # pure-TF kernel: rank == doc with most query-term occurrences
    got = custom_score_topk(
        corpus, "license import", lambda tf, df, dl, n, avg: tf, k=5
    ).collect()
    assert len(got) == 5
    # independently recompute the top doc's score
    from pysearch.analyze import tokenize_text

    contents = {r["doc_id"]: r["content"] for r in corpus.collect()}
    def tf_total(c):
        toks = tokenize_text(c)
        return toks.count("license") + toks.count("import")
    best = max(contents, key=lambda d: (tf_total(contents[d]), -d))
    assert got[0]["doc_id"] == best
    assert got[0]["score"] == tf_total(contents[best])
    # BM25 expressed through the hook == the built-in oracle
    from pysearch.oracle import bm25_topk

    k1, b = 1.2, 0.75
    bm25_fn = lambda tf, df, dl, n, avg: (
        F.log(F.lit(1.0) + (n - df + F.lit(0.5)) / (df + F.lit(0.5)))
        * tf / (tf + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * dl / avg))
    )
    via_hook = [
        (r["doc_id"], round(r["score"], 6))
        for r in custom_score_topk(corpus, "merge query", bm25_fn, k=10).collect()
    ]
    via_oracle = [
        (r["doc_id"], round(r["score"], 6))
        for r in bm25_topk(corpus, "merge query", k=10).collect()
    ]
    assert via_hook == via_oracle


def test_gc_segments(spark, tmp_index):
    import os

    from pysearch.admin import gc_segments
    from pysearch.merge import force_merge
    from pysearch.query import Query, SearchIndex

    corpus = generate_repo_files(spark, 300, seed=8)
    build_index(spark, corpus, tmp_index, CFG)
    meta = IndexMeta(tmp_index)
    before = meta.live_segments()

    # incremental (pointer) merge: retired inputs stay REFERENCED by the
    # live pointer manifest and must survive GC
    force_merge(spark, tmp_index, max_segments=1, compact=False)
    assert gc_segments(tmp_index, dry_run=True) == []
    gc_segments(tmp_index)
    si = SearchIndex(spark, tmp_index)
    assert si.search(Query(text="license merge", k=5)).count() == 5

    # compaction rewrites the data: the old directories become collectible
    from pysearch.merge import merge_segments

    merge_segments(spark, tmp_index, meta.live_segments(), compact=True)
    victims = gc_segments(tmp_index, dry_run=True)
    assert set(before) <= set(victims)
    gc_segments(tmp_index)
    remaining = os.listdir(os.path.join(tmp_index, "segments"))
    assert set(remaining) == set(meta.live_segments())
    # index still fully queryable after GC
    si = SearchIndex(spark, tmp_index)
    assert si.search(Query(text="license merge", k=5)).count() == 5
