"""Physical-plan guarantees: the properties that make the engine scale must
be visible in the executed plan, not just asserted in prose — partition
pruning on term buckets, parquet predicate pushdown on terms, and positions-
column pruning for non-phrase scans. A regression here silently turns
O(matched postings) scans into O(index) scans at 100 TB."""

import pytest

from pysearch.build import build_index
from pysearch.config import IndexConfig
from pysearch.fixtures import generate_repo_files
from pysearch.query import Query, SearchIndex


@pytest.fixture(scope="module")
def si(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("plan_idx"))
    build_index(
        spark,
        generate_repo_files(spark, 400, seed=3),
        idx,
        IndexConfig(segment_rows=128, term_buckets=8),
    )
    return SearchIndex(spark, idx)


def _postings_plan(si, terms, with_poss):
    """The postings scan exactly as search() builds it."""
    from pyspark.sql import functions as F

    from pysearch.build import bucket_of

    buckets = sorted({bucket_of(t, si.config.term_buckets) for t in terms})
    scan = si._postings_df.where(
        F.col("bucket").isin(buckets) & F.col("term").isin(terms)
    )
    if not with_poss:
        scan = scan.drop("poss")
    return scan._jdf.queryExecution().executedPlan().toString()


def test_postings_scan_prunes_and_pushes(si):
    plan = _postings_plan(si, ["license", "merge"], with_poss=False)
    # directory-level partition pruning on the term bucket
    assert "PartitionFilters" in plan and "bucket" in plan.split("PartitionFilters")[1][:200]
    # term predicate pushed into the parquet row groups
    pushed = plan.split("PushedFilters")[1][:300]
    assert "In(term" in pushed or "in(term" in pushed.lower()
    # positions payload NOT read for non-phrase queries (column pruning)
    read_schema = plan.split("ReadSchema")[1][:500]
    assert "poss" not in read_schema
    assert "ids" in read_schema and "tfs" in read_schema


def test_phrase_scan_reads_positions(si):
    plan = _postings_plan(si, ["license", "merge"], with_poss=True)
    read_schema = plan.split("ReadSchema")[1][:600]
    assert "poss" in read_schema


def test_search_runs_as_single_action(spark, si):
    """The fused query path: one .collect() on search() output triggers the
    whole pipeline; the small-index identity cache means no second
    docmap-join job (7 -> 4 jobs measured at 100k docs)."""
    sc = spark.sparkContext
    sc.setJobGroup("plan_probe", "plan_probe")
    si.search(Query(text="license merge", k=5)).collect()
    jobs = sc.statusTracker().getJobIdsForGroup("plan_probe")
    # kernel pipeline under AQE = a handful of stage-jobs; the old two-action
    # path added 3+ more — guard the ceiling
    assert 0 < len(jobs) <= 5, f"search() submitted {len(jobs)} jobs"


@pytest.fixture(scope="module")
def si_big_seg(spark, tmp_path_factory):
    """One segment big enough (600 docs, approximate_threshold=64) that the
    normal strategy is block_max_maxscore, with small blocks so block-level
    pruning is visible in the metrics."""
    idx = str(tmp_path_factory.mktemp("fex_idx"))
    build_index(
        spark,
        generate_repo_files(spark, 600, seed=11),
        idx,
        IndexConfig(
            segment_rows=5000, term_buckets=4, block_size=16,
            approximate_threshold=64,
        ),
    )
    return SearchIndex(spark, idx)


def test_filtered_exact_search_switch(si_big_seg):
    """The second exact-search gate (filtered_exact_search_threshold analog,
    KNNSettings.java:80): a ~1%-selectivity filter flips the segment to
    brute-force over the accepted docs — strategy 'taat_filtered', decoding
    ONLY blocks whose id range contains an accepted doc — and returns
    exactly the same hits as the block-max path."""
    si = si_big_seg
    filt = "doc_id IN (3, 77, 205, 411, 599)"
    fast_hits, fast_m = si.search(
        Query(text="license merge import", k=5, filter_expr=filt),
        with_metrics=True,
    )
    slow_hits, slow_m = si.search(
        Query(
            text="license merge import", k=5, filter_expr=filt,
            params={"filtered_exact_search_threshold": 0},
        ),
        with_metrics=True,
    )
    fm, sm = fast_m.collect(), slow_m.collect()
    assert fm and {r["strategy"] for r in fm} == {"taat_filtered"}
    assert {r["strategy"] for r in sm} == {"block_max_maxscore"}
    scanned_fast = sum(r["blocks_scanned"] for r in fm)
    scanned_slow = sum(r["blocks_scanned"] for r in sm)
    assert scanned_fast < scanned_slow, (scanned_fast, scanned_slow)

    key = lambda rows: [(r["doc_id"], round(float(r["score"]), 9)) for r in rows]
    assert key(fast_hits.collect()) == key(slow_hits.collect())


def test_filtered_exact_leaves_unfiltered_alone(si_big_seg):
    """No filter -> the selectivity gate never fires (big segment stays on
    block-max)."""
    _, m = si_big_seg.search(
        Query(text="license merge", k=5), with_metrics=True
    )
    assert {r["strategy"] for r in m.collect()} == {"block_max_maxscore"}


def test_pq_table_traversal_reads_codes_only(spark, tmp_path_factory):
    """The quantized query-table path's approx pass must scan ONLY the
    m-byte code column (ReadSchema without the float embedding column) —
    reading full vectors on the traversal side would erase the PQ tier's
    16x scan reduction at 10^6-query scale (BENCH/PLANS.md round-6 plan)."""
    import os

    from pyspark.sql import functions as F

    from pysearch.ops.vector_index import (
        build_vector_index,
        search_vector_index_table,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = os.path.join(str(tmp_path_factory.mktemp("pq_plan")), "pq")
    build_vector_index(
        spark, emb, idx, nlist=8, seed=42, quantize=True, quant_kind="pq"
    )
    qdf = emb.where("vec_id < 4").select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = search_vector_index_table(spark, idx, qdf, k=10, nprobe=8,
                                    rerank_factor=12)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # (plan Location strings truncate long paths, so scans are identified by
    # ReadSchema, not by file name)
    schemas = [
        seg.split("ReadSchema")[1].split("\n")[0]
        for seg in plan.split("FileScan parquet")[1:]
        if "ReadSchema" in seg
    ]
    # the traversal scan reads the m-byte codes and NOT the float vectors
    code_scans = [sc for sc in schemas if "qcode:binary" in sc]
    assert code_scans, f"no code-only traversal scan found; schemas={schemas}"
    for sc in code_scans:
        assert "embedding" not in sc, sc
    # the rerank side reads full precision only for broadcast candidate ids
    assert "BroadcastHashJoin [neighbor_id" in plan
