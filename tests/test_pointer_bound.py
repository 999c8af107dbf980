"""Pointer-growth bound for chained incremental merges (round-4): the pure-
metadata merge flattens input storage pointers transitively, so without a
cap N chained auto rounds leave a manifest referencing N directories (N
list/open calls per query). The auto policy now forces a real compaction
past MAX_INCREMENTAL_POINTERS — the missing half of the tiered policy (the
reference bounds fan-out by forcing real merges,
ForceMergesOnlyMergePolicy.java:34-61) — on BOTH the text and vector twins."""

import pytest
from pyspark.sql import functions as F

import pysearch.merge as merge_mod
from pysearch.build import append_segment, build_index
from pysearch.checkpoint import IndexMeta
from pysearch.config import IndexConfig
from pysearch.fixtures import generate_repo_files
from pysearch.merge import merge_segments
from pysearch.ops.similarity import cosine_topk
from pysearch.ops.vector_index import (
    append_vectors,
    build_vector_index,
    merge_vector_index,
    search_vector_index,
)
from pysearch.query import Query, SearchIndex

SF = "/root/testdata/sf0.001"


def test_text_chained_incremental_merges_bounded(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(merge_mod, "MAX_INCREMENTAL_POINTERS", 4)
    idx = str(tmp_path / "ptr_text")
    cfg = IndexConfig(segment_rows=10_000, term_buckets=4)
    build_index(spark, generate_repo_files(spark, 80, seed=90), idx, cfg)
    meta = IndexMeta(idx)

    modes, ptr_counts = [], []
    for i in range(8):
        append_segment(spark, idx, generate_repo_files(spark, 40, seed=100 + i), key=f"r{i}")
        merged = merge_segments(spark, idx, meta.live_segments())
        m = meta.read_manifest(merged)
        modes.append(m["source"]["mode"])
        ptr_counts.append(len(meta.storage_rel(merged, "postings")))

    # the cap held on EVERY round, and the chain actually crossed it
    assert max(ptr_counts) <= 4, ptr_counts
    assert "incremental" in modes and "compact" in modes, modes
    # compaction resets the fan-out to a single owned directory
    assert ptr_counts[modes.index("compact")] == 1

    # queries survive the whole chain: the chained index returns exactly
    # what a full compact rewrite of the same state returns (the compact
    # path is oracle-verified elsewhere)
    si = SearchIndex(spark, idx)
    key = lambda rows: [(r["doc_id"], round(float(r["score"]), 9)) for r in rows]
    chained = key(si.search(Query(text="license merge import", k=10)).collect())
    merge_segments(spark, idx, IndexMeta(idx).live_segments(), compact=True)
    si2 = SearchIndex(spark, idx)
    compacted = key(si2.search(Query(text="license merge import", k=10)).collect())
    assert chained == compacted and len(chained) == 10


def test_vector_chained_incremental_merges_bounded(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(merge_mod, "MAX_INCREMENTAL_POINTERS", 4)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").persist()
    idx = str(tmp_path / "ptr_vec")
    build_vector_index(spark, emb.where("vec_id < 100"), idx, nlist=4, seed=42)
    meta = IndexMeta(idx)

    modes, ptr_counts = [], []
    hi = 100
    for i in range(8):
        batch = emb.where(f"vec_id >= {hi} and vec_id < {hi + 40}")
        hi += 40
        append_vectors(spark, idx, batch, key=f"r{i}")
        merged = merge_vector_index(spark, idx)
        m = meta.read_manifest(merged)
        modes.append(m["source"]["mode"])
        st = m.get("storage", {})
        if st:
            ptr_counts.append(len(st.get("cells", [])) + len(st.get("cells_q", [])))
        else:  # compact segment owns a single cells dir
            ptr_counts.append(1)

    assert max(ptr_counts) <= 4, ptr_counts
    assert "incremental" in modes and "compact" in modes, modes

    # full-probe search over the chained index == exact brute force over
    # everything appended (vec ids are disjoint, so the oracle is direct)
    corpus = emb.where(f"vec_id < {hi}")
    got = search_vector_index(
        spark, idx,
        [(r["vec_id"], list(r["embedding"])) for r in emb.where("vec_id in (1, 2)").collect()],
        k=10, nprobe=4,
    ).collect()
    exact = cosine_topk(corpus, [1, 2], k=10).collect()
    by_q = lambda rows: {
        q: {r["neighbor_id"] for r in rows if r["query_id"] == q} for q in (1, 2)
    }
    assert by_q(got) == by_q(exact)
    emb.unpersist()
