"""The golden gate: engine top-k RANK-IDENTICAL to the brute-force BM25
oracle on the reference query set — the RecallTestsIT analog
(RecallTestsIT.java:48-78 computes brute-force ground truth; our assertion
is stronger: identical doc ids, identical order, scores within 1e-6,
per north_rule), plus the per-row sha256 invariant (input_hint)."""

import pytest
from pyspark.sql import functions as F

from pysearch.build import build_index
from pysearch.config import IndexConfig
from pysearch.corpus import assign_doc_ids
from pysearch.fixtures import generate_queries, generate_repo_files
from pysearch.oracle import bm25_topk
from pysearch.query import Query, SearchIndex

N_DOCS = 900
CFG = IndexConfig(segment_rows=256, term_buckets=8, approximate_threshold=64)


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("idx"))
    corpus = generate_repo_files(spark, N_DOCS, seed=42)
    build_index(spark, corpus, idx, CFG)
    ids = assign_doc_ids(corpus).persist()
    ids.count()
    return idx, ids


def _pairs(df):
    return [(r["doc_id"], round(float(r["score"]), 6)) for r in df.collect()]


def test_rank_identity_query_set(spark, built):
    idx, ids = built
    si = SearchIndex(spark, idx)
    queries = [q for q in generate_queries(100, seed=42)][:20]
    assert any(q["filter_expr"] for q in queries)
    for q in queries:
        eng = si.search(Query(text=q["query_text"], k=q["k"], filter_expr=q["filter_expr"]))
        orc = bm25_topk(ids, q["query_text"], k=q["k"], filter_expr=q["filter_expr"], config=CFG)
        assert _pairs(eng) == _pairs(orc), f"mismatch on query {q}"


def test_min_score_radial(spark, built):
    """Radial / score-threshold query (Q9 analog: min_score mode)."""
    idx, ids = built
    si = SearchIndex(spark, idx)
    eng = si.search(Query(text="license import merge", k=None, min_score=1.0))
    orc = bm25_topk(ids, "license import merge", k=None, min_score=1.0, config=CFG)
    assert _pairs(eng) == _pairs(orc)
    assert all(r["score"] >= 1.0 for r in eng.collect())


def test_sha256_invariant(spark, built):
    """Per-row content sha256 equality vs the source table (input_hint)."""
    idx, ids = built
    si = SearchIndex(spark, idx)
    hits = si.search(Query(text="segment merge query", k=25))
    src = ids.select("doc_id", F.sha2("content", 256).alias("src_sha"))
    joined = hits.join(src, "doc_id")
    assert joined.count() == hits.count()
    assert joined.where(F.col("content_sha") != F.col("src_sha")).count() == 0


def test_blockmax_skips_blocks(spark, tmp_path_factory):
    """The block-max path must actually skip blocks on a hot+rare query
    (same results, fewer blocks touched — SURVEY §7.2 step 4). Uses one big
    segment so the hot term spans many blocks while the rare term pins few
    candidates; then asserts rank identity is preserved anyway."""
    from pysearch.build import build_index as _build

    idx = str(tmp_path_factory.mktemp("idx_skip"))
    cfg = IndexConfig(segment_rows=4096, term_buckets=8, approximate_threshold=4)
    corpus = generate_repo_files(spark, N_DOCS, seed=42)
    _build(spark, corpus, idx, cfg)
    si = SearchIndex(spark, idx)
    hits, metrics = si.search(Query(text="tok1500 license", k=1), with_metrics=True)
    m = metrics.agg(
        F.sum("blocks_skipped").alias("sk"), F.sum("blocks_scanned").alias("sc")
    ).collect()[0]
    assert hits.count() == 1
    assert m["sk"] and m["sk"] > 0, f"expected skipping, got {m}"
    ids = assign_doc_ids(corpus)
    orc = bm25_topk(ids, "tok1500 license", k=1, config=cfg)
    assert _pairs(hits) == _pairs(orc)


def test_oov_and_empty_queries(spark, built):
    idx, _ = built
    si = SearchIndex(spark, idx)
    assert si.search(Query(text="zzznotaword qqqalsonot", k=10)).count() == 0
    assert si.search(Query(text="", k=10)).count() == 0
    # mixed OOV + real term: OOV contributes nothing, real term still scores
    assert si.search(Query(text="zzznotaword merge", k=5)).count() == 5


def test_search_batch_matches_single(spark, built):
    """Batch retrieval (one distributed job for the whole query set) must be
    result-identical to the per-query path."""
    idx, _ = built
    si = SearchIndex(spark, idx)
    qs = [
        Query(text=q["query_text"], k=q["k"], filter_expr=q["filter_expr"])
        for q in generate_queries(100, seed=42)[:12]
    ]
    batch = si.search_batch(qs).collect()
    by_q: dict[int, list] = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(float(r["score"]), 6))
        )
    for qid, q in enumerate(qs):
        single = _pairs(si.search(q))
        assert by_q.get(qid, []) == single, f"batch mismatch on query {qid}"


def test_query_validation():
    with pytest.raises(ValueError):
        Query(text="x", k=None, min_score=None).validate()
    with pytest.raises(ValueError):
        Query(text="x", k=0).validate()
    with pytest.raises(ValueError):
        Query(text="x", k=20000).validate()


def test_prefix_query_rank_identity(spark, built):
    """Trailing-* prefix terms (MultiTermQuery analog) expand over the
    dictionary and stay rank-identical to the oracle with the same rule."""
    idx, ids = built
    si = SearchIndex(spark, idx)
    for q in ["tok012* license", "merge tok05*"]:
        eng = si.search(Query(text=q, k=10))
        orc = bm25_topk(ids, q, k=10, config=CFG)
        assert _pairs(eng) == _pairs(orc), q
        assert eng.count() > 0
    # expansion itself: deterministic, term-ascending, capped
    exp = si.expand_prefix("tok01")
    assert exp == sorted(exp) and len(exp) <= si.MAX_PREFIX_EXPANSIONS
    assert all(t.startswith("tok01") for t in exp) and exp


def test_phrase_query_rank_identity(spark, built):
    """Quoted phrases filter to exact adjacent token runs (positions tier),
    component terms still score — identical to the oracle's adjacency rule."""
    idx, ids = built
    si = SearchIndex(spark, idx)
    # find a phrase that actually occurs: take two adjacent tokens of doc 0
    from pysearch.analyze import tokenize_text

    content0 = ids.where("doc_id = 0").collect()[0]["content"]
    t = tokenize_text(content0)
    phrase = f'"{t[10]} {t[11]}"'
    for q in [phrase, f"{phrase} license"]:
        eng = si.search(Query(text=q, k=10))
        orc = bm25_topk(ids, q, k=10, config=CFG)
        assert _pairs(eng) == _pairs(orc), q
        assert eng.count() > 0, q
        assert 0 in [r["doc_id"] for r in eng.collect()] or eng.count() == 10
    # non-occurring phrase (terms exist, adjacency doesn't have to)
    rare = '"tok1500 tok1501"'
    eng = si.search(Query(text=rare, k=10))
    orc = bm25_topk(ids, rare, k=10, config=CFG)
    assert _pairs(eng) == _pairs(orc)
    # phrase with an OOV term can never match
    assert si.search(Query(text='"license zzznope"', k=10)).count() == 0


def test_reconstruct_source_roundtrip(spark, built):
    """Derived-source read-back: hits rejoin the source-of-truth corpus with
    content + snippet attached and the stored sha256 verified."""
    idx, ids = built
    si = SearchIndex(spark, idx)
    hits = si.search(Query(text="license merge segment", k=8))
    full = si.reconstruct_source(hits, ids, snippet_chars=32)
    rows = full.collect()
    assert len(rows) == 8
    assert all(r["sha_ok"] for r in rows)
    assert all(r["content"].startswith(r["snippet"]) for r in rows)
    # order preserved (score desc, doc_id asc) and content is the source's
    src = {(r["repo"], r["path"]): r["content"] for r in ids.collect()}
    assert [r["doc_id"] for r in rows] == [r["doc_id"] for r in hits.collect()]
    assert all(src[(r["repo"], r["path"])] == r["content"] for r in rows)


def test_search_batch_table_parity(spark, built):
    """Query-table batch API: (query_id, text, k, filter) rows in, results
    identical to per-query search(); chunking preserves original ids."""
    idx, ids = built
    si = SearchIndex(spark, idx)
    qrows = [
        (100, "license merge segment", 5, None),
        (203, "import tok0100", 10, None),
        (307, "data query tok0400", 7, "lang = 'go'"),
        (451, "zzznotaterm", 5, None),
    ]
    qdf = spark.createDataFrame(
        qrows, "query_id long, text string, k int, filter string"
    )
    out = si.search_batch_table(
        qdf, k_col="k", filter_col="filter", chunk=2  # force multi-chunk
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(float(r["score"]), 6))
        )
    for qid, text, k, filt in qrows:
        single = [
            (r["doc_id"], round(float(r["score"]), 6))
            for r in si.search(Query(text=text, k=k, filter_expr=filt)).collect()
        ]
        assert sorted(by_q.get(qid, [])) == sorted(single), qid

    # per-row RADIAL mode: a non-null min_score cell switches the row to the
    # unbounded threshold contract, same as Query(min_score=...)
    rdf = spark.createDataFrame(
        [
            (7, "license merge segment", None),
            (8, "license import merge", 0.3),
        ],
        "query_id long, text string, ms double",
    )
    rout = si.search_batch_table(rdf, min_score_col="ms").collect()
    by_r = {}
    for r in rout:
        by_r.setdefault(r["query_id"], set()).add(
            (r["doc_id"], round(float(r["score"]), 6))
        )
    want_k = {
        (r["doc_id"], round(float(r["score"]), 6))
        for r in si.search(Query(text="license merge segment", k=10)).collect()
    }
    want_ms = {
        (r["doc_id"], round(float(r["score"]), 6))
        for r in si.search(
            Query(text="license import merge", k=None, min_score=0.3)
        ).collect()
    }
    assert by_r[7] == want_k
    assert by_r[8] == want_ms and len(want_ms) > 10  # genuinely unbounded


def test_big_index_identity_path_rank_identity(spark, built, monkeypatch):
    """The big-index identity path (driver cache disabled): isin-pruned
    docmap lookup must return identical hits, k and radial mode."""
    idx, ids = built
    monkeypatch.setattr(SearchIndex, "IDENTITY_CACHE_MAX_DOCS", 0)
    si = SearchIndex(spark, idx)
    assert si._identity_cache is None
    for q in [
        Query(text="license merge segment", k=8),
        Query(text="import tok0100", k=5, filter_expr="lang = 'go'"),
        Query(text="license import merge", k=None, min_score=1.0),
    ]:
        got = _pairs(si.search(q))
        orc = bm25_topk(
            ids, q.text, k=q.k, min_score=q.min_score,
            filter_expr=q.filter_expr, config=CFG,
        )
        assert got == _pairs(orc), q.text
        # identity columns present and populated
        row = si.search(Query(text="license", k=1)).collect()[0]
        assert row["path"] and row["content_sha"]
