"""Round-7: the query-table vector search picks between two physical plans
by live vector count (pair-join below PYSEARCH_VEC_COGROUP_MIN_DOCS, the
per-(cell, salt) cogrouped matrix kernel above — measured 8.3x faster at
200k vectors x 5k queries, BENCH/vector_table_scale_r07.json). Both plans
must return IDENTICAL results; this forces each via the env override and
compares row-for-row on plain, quantized, radial, filtered and per-row-k
surfaces."""

import os

import pytest
from pyspark.sql import functions as F

from pysearch.ops.vector_index import build_vector_index, search_vector_index_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
_ENV = "PYSEARCH_VEC_COGROUP_MIN_DOCS"


@pytest.fixture(scope="module")
def emb(spark):
    import os as _os

    if not _os.path.isdir(SF) and not _os.path.isfile(f"{SF}/embeddings.parquet"):
        pytest.skip(f"test data {SF} not present")
    df = spark.read.parquet(f"{SF}/embeddings.parquet").persist()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def plain_idx(spark, emb, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("cg_plain"))
    build_vector_index(spark, emb, idx, nlist=8, seed=42)
    return idx


@pytest.fixture(scope="module")
def quant_idx(spark, emb, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("cg_quant"))
    build_vector_index(spark, emb, idx, nlist=8, seed=42, quantize=True)
    return idx


def _qdf(emb, qids):
    return emb.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def _both_paths(call):
    """Run `call` under the pair-join gate and the forced-cogroup gate."""
    prev = os.environ.get(_ENV)
    try:
        os.environ[_ENV] = str(10 ** 9)
        pair = call()
        os.environ[_ENV] = "0"
        cog = call()
    finally:
        if prev is None:
            os.environ.pop(_ENV, None)
        else:
            os.environ[_ENV] = prev
    return pair, cog


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_topk_parity(spark, emb, plain_idx):
    pair, cog = _both_paths(
        lambda: _rows(
            search_vector_index_table(
                spark, plain_idx, _qdf(emb, [1, 2, 3]), k=10, nprobe=8
            )
        )
    )
    assert pair and pair == cog


def test_quantized_parity(spark, emb, quant_idx):
    # full probe + wide oversample: the candidate superset covers the corpus
    # on both paths, so the exact rerank output is identical
    pair, cog = _both_paths(
        lambda: _rows(
            search_vector_index_table(
                spark, quant_idx, _qdf(emb, [1, 2]), k=10, nprobe=8,
                rerank_factor=8,
            )
        )
    )
    assert pair and pair == cog


def test_radial_and_filter_parity(spark, emb, plain_idx):
    allow = emb.where("vec_id % 2 = 0").select("vec_id")
    pair, cog = _both_paths(
        lambda: _rows(
            search_vector_index_table(
                spark, plain_idx, _qdf(emb, [1, 2]), nprobe=8, min_sim=0.2,
                allow_ids=allow,
            )
        )
    )
    assert pair and pair == cog


def test_perrow_k_and_mixed_radial_parity(spark, emb, plain_idx):
    qdf = _qdf(emb, [1, 2, 3]).withColumn(
        "kk",
        F.when(F.col("query_id") == 1, F.lit(5)).when(
            F.col("query_id") == 2, F.lit(15)
        ),
    ).withColumn("ms", F.when(F.col("query_id") == 3, F.lit(0.25)))
    pair, cog = _both_paths(
        lambda: _rows(
            search_vector_index_table(
                spark, plain_idx, qdf, k=10, nprobe=8, k_col="kk",
                min_sim_col="ms",
            )
        )
    )
    assert pair and pair == cog
