"""Skew handling (north_rule: skewed terms — huge repos, boilerplate tokens —
handled explicitly). Two mechanisms under test:

1. STRUCTURAL capping: segments are fixed-size and postings group by
   (segment, term-bucket), so a boilerplate term present in >50% of docs
   contributes at most `segment_rows` postings to any single Arrow group,
   and bucket payloads stay balanced under a Zipf vocabulary.
2. EXPLICIT two-phase salted aggregation for global term stats
   (admin.global_dictionary): hot terms appear in every segment dictionary,
   so the global rollup salts the hot keys before the final combine.
"""

from pyspark.sql import functions as F

from pysearch.admin import global_dictionary
from pysearch.build import build_index
from pysearch.checkpoint import IndexMeta
from pysearch.config import IndexConfig
from pysearch.corpus import assign_doc_ids
from pysearch.fixtures import generate_repo_files
from pysearch.oracle import bm25_topk
from pysearch.query import Query, SearchIndex

CFG = IndexConfig(segment_rows=200, term_buckets=8, approximate_threshold=32)


def test_boilerplate_term_build_and_query(spark, tmp_index):
    corpus = generate_repo_files(spark, 600, seed=42).persist()
    meta = build_index(spark, corpus, tmp_index, CFG)
    si = SearchIndex(spark, tmp_index)

    # the fixture guarantees boilerplate head terms in >50% of docs
    stats = si.global_term_stats(["license", "import", "return"])
    assert all(df > 0.5 * si.num_docs for df in stats.values()), stats

    # hot-term query still rank-identical to the oracle
    ids = assign_doc_ids(corpus)
    q = "license import"
    eng = [(r["doc_id"], round(r["score"], 6)) for r in si.search(Query(text=q, k=10)).collect()]
    orc = [(r["doc_id"], round(r["score"], 6)) for r in bm25_topk(ids, q, k=10, config=CFG).collect()]
    assert eng == orc

    # bucket payloads stay balanced despite Zipf skew: no bucket carries
    # more than a small multiple of the mean payload
    from pysearch.build import BLOCK_SCHEMA

    for seg in meta.live_segments():
        per_bucket = (
            spark.read.schema(BLOCK_SCHEMA)
            .parquet(meta.postings_path(seg))
            .groupBy("bucket")
            .agg(F.sum("n").alias("p"))
            .collect()
        )
        loads = [r["p"] for r in per_bucket]
        assert max(loads) <= 6 * (sum(loads) / len(loads)), loads
    corpus.unpersist()


def test_salted_global_dictionary(spark, tmp_index):
    corpus = generate_repo_files(spark, 500, seed=9)
    build_index(spark, corpus, tmp_index, CFG)
    si = SearchIndex(spark, tmp_index)

    gd = global_dictionary(spark, tmp_index)
    rows = {r["term"]: (r["df"], r["cf"]) for r in gd.collect()}
    # equals the unsalted per-term rollup
    meta = IndexMeta(tmp_index)
    plain = None
    for seg in meta.live_segments():
        d = spark.read.parquet(meta.dictionary_path(seg))
        plain = d if plain is None else plain.unionByName(d)
    expect = {
        r["term"]: (r["df"], r["cf"])
        for r in plain.groupBy("term").agg(F.sum("df").alias("df"), F.sum("cf").alias("cf")).collect()
    }
    assert rows == expect
    # and matches the engine's per-query stats for a sample
    st = si.global_term_stats(["license", "tok0100"])
    for t, df in st.items():
        assert rows[t][0] == df
