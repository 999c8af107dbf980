"""Merge lifecycle tests — the JVectorWriterMergeTests /
JVectorMergeWithDeletedDocsTests analog: merges (incremental + compact),
deletes, updates, force-merge, idempotence; rank identity re-verified against
the oracle after every round (FIXTURES.md §3/§4)."""

import os

import pytest
from pyspark.sql import functions as F

from pysearch.build import build_index
from pysearch.checkpoint import IndexMeta
from pysearch.config import IndexConfig
from pysearch.corpus import assign_doc_ids
from pysearch.fixtures import generate_repo_files, generate_updates
from pysearch.merge import (
    apply_updates,
    delete_docs,
    force_merge,
    merge_segments,
    plan_merges,
)
from pysearch.oracle import bm25_topk
from pysearch.query import Query, SearchIndex

CFG = IndexConfig(segment_rows=128, term_buckets=8, approximate_threshold=32)
QUERIES = ["license merge segment", "import tok0100", "data query tok0400"]


def _pairs(df):
    return [(r["doc_id"], round(float(r["score"]), 6)) for r in df.collect()]


def _payload_bytes(spark, meta, segs):
    from pysearch.checkpoint import read_parquet_union

    total = 0
    for s in segs:
        df = read_parquet_union(spark, meta.postings_paths(s))
        total += df.agg(
            (F.sum(F.length("ids")) + F.sum(F.length("tfs")) + F.sum(F.length("dls")))
        ).collect()[0][0]
    return total


@pytest.fixture()
def built(spark, tmp_index):
    corpus = generate_repo_files(spark, 450, seed=42)
    build_index(spark, corpus, tmp_index, CFG)
    return tmp_index, corpus


def test_incremental_merge_preserves_results_and_bytes(spark, built):
    idx, corpus = built
    meta = IndexMeta(idx)
    before_segs = meta.live_segments()
    assert len(before_segs) >= 3
    si = SearchIndex(spark, idx)
    before = {q: _pairs(si.search(Query(text=q, k=10))) for q in QUERIES}
    bytes_before = _payload_bytes(spark, meta, before_segs[:2])

    new_seg = merge_segments(spark, idx, before_segs[:2])
    after_segs = meta.live_segments()
    assert len(after_segs) == len(before_segs) - 1
    assert new_seg in after_segs
    manifest = meta.read_manifest(new_seg)
    assert manifest["source"]["mode"] == "incremental"
    # pure-metadata merge: ZERO data files written anywhere — the new
    # segment owns no directory, its manifest points at the inputs' data
    # (works identically on object stores with no hard-link support)
    assert not os.path.exists(meta.segment_dir(new_seg))
    assert sorted(manifest["storage"]["postings"]) == sorted(
        os.path.join("segments", s, "postings.parquet") for s in before_segs[:2]
    )
    # byte-reuse evidence: compressed payload identical, nothing re-encoded
    assert _payload_bytes(spark, meta, [new_seg]) == bytes_before

    si = SearchIndex(spark, idx)
    for q in QUERIES:
        assert _pairs(si.search(Query(text=q, k=10))) == before[q]

    # GC must protect the retired inputs while the pointer segment lives
    from pysearch.admin import gc_segments, verify_index

    victims = gc_segments(idx, dry_run=True)
    assert not set(victims) & set(before_segs[:2])
    # integrity checks resolve pointers too
    verify_index(spark, idx)

    # chained incremental merge (pointer segment + a plain one): pointers
    # flatten to concrete directories
    live = meta.live_segments()
    plain = [s for s in live if s != new_seg]
    seg2 = merge_segments(spark, idx, [new_seg, plain[0]])
    st = meta.read_manifest(seg2)["storage"]["postings"]
    assert all("seg_m_" not in p for p in st), st
    si = SearchIndex(spark, idx)
    for q in QUERIES:
        assert _pairs(si.search(Query(text=q, k=10))) == before[q]


def test_merge_idempotent(spark, built):
    idx, _ = built
    meta = IndexMeta(idx)
    segs = meta.live_segments()[:2]
    a = merge_segments(spark, idx, segs)
    n_commits = len(meta.commits())
    b = merge_segments(spark, idx, segs)
    assert a == b and len(meta.commits()) == n_commits


def test_force_merge_rank_identity(spark, built):
    idx, corpus = built
    force_merge(spark, idx, max_segments=1)
    meta = IndexMeta(idx)
    assert len(meta.live_segments()) == 1
    si = SearchIndex(spark, idx)
    ids = assign_doc_ids(corpus)
    for q in QUERIES:
        assert _pairs(si.search(Query(text=q, k=10))) == _pairs(
            bm25_topk(ids, q, k=10, config=CFG)
        )


def test_deletes_masked_then_compacted(spark, built):
    """Deletes mask immediately (liveDocs semantics: stats unchanged), and a
    compact merge drops them (stats exact again) — verified against oracles
    with matching stats semantics at both points."""
    idx, corpus = built
    ids = assign_doc_ids(corpus).persist()
    n_full = ids.count()

    dead = [r["doc_id"] for r in ids.where("lang = 'go'").select("doc_id").collect()]
    n = delete_docs(spark, idx, key="b0", doc_ids=dead)
    assert n == len(dead) > 0
    # idempotent
    assert delete_docs(spark, idx, key="b0", doc_ids=dead) == 0

    si = SearchIndex(spark, idx)
    q = "license import tok0200"
    hits = si.search(Query(text=q, k=15))
    got_ids = [r["doc_id"] for r in hits.collect()]
    assert not set(got_ids) & set(dead)
    # oracle: FULL-corpus stats (df, N, avgdl include deleted docs), results
    # exclude them — exactly the pre-compaction engine semantics
    from pysearch.analyze import with_tokens

    full = with_tokens(ids)
    avgdl = full.agg(F.avg("dl")).collect()[0][0]
    orc = bm25_topk(
        ids, q, k=15,
        filter_expr=f"doc_id NOT IN ({','.join(map(str, dead))})",
        config=CFG, stats=(n_full, float(avgdl)),
    )
    assert _pairs(hits) == _pairs(orc)

    # compact: tombstones dropped, stats return to the surviving corpus
    force_merge(spark, idx, max_segments=1, compact=True)
    meta = IndexMeta(idx)
    assert meta.tombstones() == set()
    (seg,) = meta.live_segments()
    assert meta.read_manifest(seg)["num_docs"] == n_full - len(dead)
    si = SearchIndex(spark, idx)
    survivors = ids.where(~F.col("doc_id").isin(dead))
    assert _pairs(si.search(Query(text=q, k=15))) == _pairs(
        bm25_topk(survivors, q, k=15, config=CFG)
    )
    ids.unpersist()


def test_compact_density_guard(spark, built):
    """Tombstone density above max_tombstone_density forces the rebuild path
    even without explicit compact=True (the 0.4 guard analog)."""
    idx, corpus = built
    meta = IndexMeta(idx)
    segs = meta.live_segments()[:2]
    doc_lo = meta.read_manifest(segs[0])["doc_id_min"]
    doc_hi = meta.read_manifest(segs[0])["doc_id_max"]
    # kill >40% of the pair's docs
    dead = list(range(doc_lo, doc_hi + 1))
    delete_docs(spark, idx, key="guard", doc_ids=dead)
    new_seg = merge_segments(spark, idx, segs)
    assert IndexMeta(idx).read_manifest(new_seg)["source"]["mode"] == "compact"
    assert IndexMeta(idx).read_manifest(new_seg)["num_docs"] == (
        meta.read_manifest(segs[1])["num_docs"]
    )


def test_empty_compaction_valid(spark, built):
    """Zero-live-doc merged segment is still a valid, committed segment
    (JVectorWriter.java:1013-1019 analog)."""
    idx, _ = built
    meta = IndexMeta(idx)
    seg0 = meta.live_segments()[0]
    m = meta.read_manifest(seg0)
    delete_docs(
        spark, idx, key="all0",
        doc_ids=list(range(m["doc_id_min"], m["doc_id_max"] + 1)),
    )
    new_seg = merge_segments(spark, idx, [seg0], compact=True)
    nm = meta.read_manifest(new_seg)
    assert nm["num_docs"] == 0 and nm["num_postings"] == 0
    # index still queryable
    si = SearchIndex(spark, idx)
    assert si.search(Query(text="license", k=5)).count() == 5


def test_plan_merges_tiered(spark, built):
    idx, _ = built
    meta = IndexMeta(idx)
    cfg = meta.load_config()
    plans = plan_merges(meta, cfg)
    # 450 docs / 128 per seg -> segs of 128,128,128,66: tier(7)x3 + tier(6)x1
    assert any(len(p) == cfg.merge_factor for p in plans) or plans == []


def test_update_batches_rank_identity(spark, tmp_index):
    """FIXTURES.md §3: delete/update batches applied batch-by-batch with a
    compact merge after each; rank identity re-verified on the surviving
    corpus after every round, plus the sha256 invariant."""
    corpus = generate_repo_files(spark, 260, seed=7)
    cfg = IndexConfig(segment_rows=96, term_buckets=8, approximate_threshold=16)
    build_index(spark, corpus, tmp_index, cfg)

    state = {
        (r["repo"], r["path"]): r["content"] for r in corpus.collect()
    }
    batches = generate_updates(corpus, n_batches=2, seed=42)
    for b, pdf in enumerate(batches):
        # only touch keys still present
        pdf = pdf[[(r, p) in state for r, p in zip(pdf["repo"], pdf["path"])]]
        apply_updates(spark, tmp_index, pdf, batch_key=f"batch{b}")
        for _, row in pdf.iterrows():
            if row["op"] == "delete":
                state.pop((row["repo"], row["path"]), None)
            else:
                state[(row["repo"], row["path"])] = row["content"]
        force_merge(spark, tmp_index, max_segments=1, compact=True)

        meta = IndexMeta(tmp_index)
        si = SearchIndex(spark, tmp_index)
        # engine's live docmap must mirror the logical state exactly
        dm = si.docmaps().select("doc_id", "repo", "path", "content_sha").toPandas()
        assert len(dm) == len(state)
        import hashlib as _h

        for _, r in dm.iterrows():
            assert r["content_sha"] == _h.sha256(
                state[(r["repo"], r["path"])].encode()
            ).hexdigest()
        # oracle over the surviving corpus with the engine's doc ids
        oracle_corpus = spark.createDataFrame(
            [
                (int(r["doc_id"]), r["repo"], r["path"], "c", "l",
                 state[(r["repo"], r["path"])])
                for _, r in dm.iterrows()
            ],
            "doc_id long, repo string, path string, commit string, lang string, content string",
        )
        for q in ["merge query segment", "license tok0150"]:
            assert _pairs(si.search(Query(text=q, k=10))) == _pairs(
                bm25_topk(oracle_corpus, q, k=10, config=cfg)
            ), f"batch {b} query {q}"
