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
