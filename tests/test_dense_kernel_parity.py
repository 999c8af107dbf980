"""The batch kernel's two scoring paths — dense-range bincount accumulator
(the default: segments own disjoint doc-id ranges, so a cache-resident
scatter-add replaces the np.unique comparison sort) and the sparse-range
sort fallback — must be rank- AND score-identical. The accumulator walks
the concatenated input sequentially exactly like bincount-over-inverse, so
sums are bit-identical, not just close."""

import numpy as np
import pytest
from pyspark.sql import functions as F

import pysearch.query as qmod
from pysearch.build import build_index
from pysearch.config import IndexConfig
from pysearch.fixtures import generate_queries, generate_repo_files
from pysearch.query import Query, SearchIndex


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("dense") / "idx")
    corpus = generate_repo_files(spark, 3000, seed=5)
    build_index(spark, corpus, idx, IndexConfig(segment_rows=600, term_buckets=8))
    return idx


def _run_batch(spark, idx):
    si = SearchIndex(spark, idx)
    qs = [
        Query(text=q["query_text"], k=q["k"], filter_expr=q["filter_expr"])
        for q in generate_queries(25, seed=9)
    ]
    rows = si.search_batch(qs).collect()
    return sorted((r["query_id"], r["doc_id"], r["score"]) for r in rows)


def test_dense_and_sort_paths_identical(spark, built, monkeypatch):
    dense = _run_batch(spark, built)
    assert dense  # non-trivial result set
    # force the sparse-range sort fallback everywhere; the factory captures
    # the cap by value, so the pin reaches the worker-side kernels
    monkeypatch.setattr(qmod, "_DENSE_RANGE_CAP", -1)
    sorted_path = _run_batch(spark, built)
    assert dense == sorted_path  # bit-identical scores, identical ranks


def test_table_path_parity_across_kernels(spark, built, monkeypatch):
    si = SearchIndex(spark, built)
    texts = [q["query_text"] for q in generate_queries(12, seed=3)]
    qdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "query_id long, text string"
    )
    key = lambda rows: sorted((r["query_id"], r["doc_id"], r["score"]) for r in rows)
    dense = key(si.search_batch_table(qdf, default_k=7).collect())
    monkeypatch.setattr(qmod, "_DENSE_RANGE_CAP", -1)
    sort_p = key(si.search_batch_table(qdf, default_k=7).collect())
    assert dense and dense == sort_p
