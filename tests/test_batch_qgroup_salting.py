"""Round-7: the batch/table kernel salts queries across (segment, qgroup)
sub-keys when a big query chunk meets a few-segment index (posting blocks
replicated, each task scores qid % qgroups == group). Salted and unsalted
dispatch must return IDENTICAL rows; this runs the same 600-query table
under a shuffle budget that salts (qgroups > 1) and one that cannot
(budget == #segments -> qgroups == 1) and compares row-for-row."""

import pytest
from pyspark.sql import functions as F

from pysearch.build import build_index
from pysearch.config import IndexConfig
from pysearch.fixtures import generate_repo_files
from pysearch.query import SearchIndex


@pytest.fixture(scope="module")
def si(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("qg_idx"))
    # 2 segments so the test session's 8-partition budget yields qgroups > 1
    build_index(
        spark,
        generate_repo_files(spark, 1200, seed=5),
        idx,
        IndexConfig(segment_rows=600, term_buckets=8),
    )
    return SearchIndex(spark, idx)


def _qdf(spark, n):
    texts = [
        "license merge", "import segment", "def query stream", "tok0042",
        "buffer config test", "return index merge",
    ]
    arr = F.array(*[F.lit(t) for t in texts])
    return spark.range(n).select(
        F.col("id").alias("query_id"),
        F.element_at(arr, (F.col("id") % len(texts) + 1).cast("int")).alias("text"),
        # a filtered slice exercises the restrict-side group routing too
        F.when(F.col("id") % 7 == 0, F.lit("lang = 'python'")).alias("flt"),
    )


def test_salted_dispatch_matches_unsalted(spark, si):
    qdf = _qdf(spark, 600)
    n_parts = si._kernel_partitions()

    def run():
        return sorted(
            tuple(r)
            for r in si.search_batch_table(
                qdf, filter_col="flt", default_k=10, chunk=1000
            ).collect()
        )

    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        # budget >> #segments: the salting formula must engage
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        assert min(8 // n_parts, -(-600 // 256)) > 1, "salting not engaged"
        salted = run()
        # budget == #segments: qgroups == 1 (the unsalted reference path)
        spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
        unsalted = run()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert salted and salted == unsalted
