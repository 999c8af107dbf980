"""Distributed batch-table compilation at scale: a 100k-row query table runs
end-to-end WITHOUT query texts ever reaching the driver — tokenization +
phrase parsing happen in one Arrow pass over the table, term stats resolve in
one dictionary join for the whole table's vocabulary, and only the compact
compiled form (term keys, k, filter) is collected for kernel dispatch."""

import os
import time

import pytest
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pysearch.build import build_index
from pysearch.config import IndexConfig
from pysearch.fixtures import generate_repo_files
from pysearch.query import Query, SearchIndex


@pytest.fixture(scope="module")
def si(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("bt_idx"))
    build_index(
        spark,
        generate_repo_files(spark, 2000, seed=5),
        idx,
        IndexConfig(segment_rows=512, term_buckets=8),
    )
    return SearchIndex(spark, idx)


def test_100k_query_table_no_text_collect(spark, si, monkeypatch):
    qdf = spark.range(100_000).select(
        F.col("id").alias("query_id"),
        F.concat(
            F.lit("license tok0"), (F.col("id") % 97).cast("string"), F.lit(" merge")
        ).alias("text"),
    )

    # guard: any DataFrame.collect() of a frame that still carries the query
    # text column would mean the driver pulled 100k texts — forbidden
    orig_collect = DataFrame.collect

    def guarded(self_df):
        assert "_text" not in self_df.columns and "text" not in self_df.columns, (
            f"query texts collected to the driver: {self_df.columns}"
        )
        return orig_collect(self_df)

    monkeypatch.setattr(DataFrame, "collect", guarded)

    t0 = time.time()
    out = si.search_batch_table(qdf, default_k=3, chunk=12_500)
    rows = out.collect()
    dt = time.time() - t0
    assert len(rows) == 300_000  # 3 hits per query, all queries answered

    # streamed dispatch guard: the driver held ONE chunk of compiled rows at
    # a time — peak is O(chunk) (with hash-assignment skew tolerance), never
    # O(query count)
    st = si.last_batch_table_stats
    assert st["n_queries"] == 100_000
    assert st["n_chunks"] == 8
    assert st["max_chunk_rows"] <= 12_500 * 1.25, st

    qps = 100_000 / dt
    # hard parity/no-collect guards above are the real gate; the wall-clock
    # floor flakes on a loaded shared host (BASELINE.md documents ~2x noise
    # windows), so it is opt-in for perf runs
    if os.environ.get("PYSEARCH_PERF_ASSERTS"):
        assert qps > 300, f"batch-table throughput regressed: {qps:.0f} q/s"

    # spot parity: table results == single-query engine results
    monkeypatch.setattr(DataFrame, "collect", orig_collect)
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(float(r["score"]), 6))
        )
    for qid in (0, 41, 99_996):
        text = f"license tok0{qid % 97} merge"
        single = [
            (r["doc_id"], round(float(r["score"]), 6))
            for r in si.search(Query(text=text, k=3)).collect()
        ]
        assert sorted(by_q[qid]) == sorted(single), qid


def test_table_prefix_and_phrase_still_work(spark, si):
    """The distributed compile path keeps trailing-* prefix expansion and
    quoted phrases working (expansion stays a tiny driver-side dictionary
    lookup over the DISTINCT prefixes, not per query)."""
    qdf = spark.createDataFrame(
        [(1, "lice* merge"), (2, '"license merge" import'), (3, "license merge")],
        "query_id long, text string",
    )
    out = si.search_batch_table(qdf, default_k=5).collect()
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(float(r["score"]), 6))
        )
    for qid, text in [(1, "lice* merge"), (2, '"license merge" import'), (3, "license merge")]:
        single = [
            (r["doc_id"], round(float(r["score"]), 6))
            for r in si.search(Query(text=text, k=5)).collect()
        ]
        assert sorted(by_q.get(qid, [])) == sorted(single), text


def test_filtered_table_dedupes_predicates(spark, si):
    """5k filtered rows sharing 3 DISTINCT predicates: the restrict plan
    compiles one pushdown branch per distinct predicate (member qids ride a
    broadcast table, not literal expression nodes), and every row matches
    its per-query single-search result."""
    import time as _time

    langs = ["rust", "go", "java"]
    qdf = spark.range(5_000).select(
        F.col("id").alias("query_id"),
        F.concat(
            F.lit("license tok0"), (F.col("id") % 61).cast("string"), F.lit(" merge")
        ).alias("text"),
        F.concat(
            F.lit("lang = '"),
            F.element_at(
                F.array(*[F.lit(l) for l in langs]), (F.col("id") % 3 + 1).cast("int")
            ),
            F.lit("'"),
        ).alias("filt"),
    )
    t0 = _time.time()
    rows = si.search_batch_table(
        qdf, default_k=3, filter_col="filt", chunk=5_000
    ).collect()
    dt = _time.time() - t0
    assert dt < 120, f"filtered table took {dt:.0f}s (plan bloat?)"
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(float(r["score"]), 6))
        )
    from pysearch.query import Query

    for qid in (0, 1, 2, 4999):
        single = [
            (r["doc_id"], round(float(r["score"]), 6))
            for r in si.search(
                Query(
                    text=f"license tok0{qid % 61} merge", k=3,
                    filter_expr=f"lang = '{langs[qid % 3]}'",
                )
            ).collect()
        ]
        assert sorted(by_q.get(qid, [])) == sorted(single), qid
