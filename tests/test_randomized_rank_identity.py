"""Seeded randomized rank-identity sweep — the LuceneTestCase randomized
strategy analog (KNNJVectorTests.java:771 random-vector cases): multiple
corpora seeds x query mixes, engine vs oracle, exact rank+score identity."""

import pytest

from pysearch.build import build_index
from pysearch.config import IndexConfig
from pysearch.corpus import assign_doc_ids
from pysearch.fixtures import generate_queries, generate_repo_files
from pysearch.oracle import bm25_topk
from pysearch.query import Query, SearchIndex


@pytest.mark.parametrize("seed", [404, 505])
def test_randomized_batch_parity(spark, tmp_path, seed):
    """Randomized BATCH parity: search_batch and search_batch_table return
    the same (doc_id, score) sets as per-query search() across varied
    segment geometry, ks and filters — guards the batch kernel's amortized
    TAAT scoring and its tie-inclusive per-segment cut."""
    from pyspark.sql import functions as F

    cfg = IndexConfig(
        segment_rows=64 + seed % 100,
        term_buckets=4 + seed % 5,
        block_size=16 + seed % 50,
        approximate_threshold=seed % 200,
    )
    corpus = generate_repo_files(spark, 250, seed=seed).persist()
    idx = str(tmp_path / f"bidx{seed}")
    build_index(spark, corpus, idx, cfg)
    si = SearchIndex(spark, idx)

    qmix = generate_queries(100, seed=seed)[:10]
    qs = [
        Query(text=q["query_text"], k=q["k"], filter_expr=q["filter_expr"])
        for q in qmix
    ]
    singles = [
        {
            (r["doc_id"], round(float(r["score"]), 6))
            for r in si.search(q).collect()
        }
        for q in qs
    ]
    by_q: dict[int, set] = {}
    for r in si.search_batch(qs).collect():
        by_q.setdefault(r["query_id"], set()).add(
            (r["doc_id"], round(float(r["score"]), 6))
        )
    for i, want in enumerate(singles):
        assert by_q.get(i, set()) == want, f"search_batch seed={seed} q={i}"

    qdf = spark.createDataFrame(
        [
            (i, q["query_text"], q["k"], q["filter_expr"])
            for i, q in enumerate(qmix)
        ],
        "query_id long, text string, k int, f string",
    )
    by_t: dict[int, set] = {}
    for r in si.search_batch_table(qdf, k_col="k", filter_col="f", chunk=3).collect():
        by_t.setdefault(r["query_id"], set()).add(
            (r["doc_id"], round(float(r["score"]), 6))
        )
    for i, want in enumerate(singles):
        assert by_t.get(i, set()) == want, f"batch_table seed={seed} q={i}"
    corpus.unpersist()


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_randomized_corpus_rank_identity(spark, tmp_path, seed):
    cfg = IndexConfig(
        segment_rows=64 + seed % 100,  # vary segment geometry too
        term_buckets=4 + seed % 5,
        block_size=16 + seed % 50,
        approximate_threshold=seed % 200,
    )
    corpus = generate_repo_files(spark, 250, seed=seed).persist()
    idx = str(tmp_path / f"idx{seed}")
    build_index(spark, corpus, idx, cfg)
    si = SearchIndex(spark, idx)
    ids = assign_doc_ids(corpus).persist()

    queries = generate_queries(100, seed=seed)[:6]
    for q in queries:
        eng = [
            (r["doc_id"], round(float(r["score"]), 6))
            for r in si.search(
                Query(text=q["query_text"], k=q["k"], filter_expr=q["filter_expr"])
            ).collect()
        ]
        orc = [
            (r["doc_id"], round(float(r["score"]), 6))
            for r in bm25_topk(
                ids, q["query_text"], k=q["k"], filter_expr=q["filter_expr"], config=cfg
            ).collect()
        ]
        assert eng == orc, f"seed={seed} query={q}"
    corpus.unpersist()
    ids.unpersist()
