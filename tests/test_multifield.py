"""Multi-field indexes (the per-field mapping analog,
KNNVectorFieldMapper.java:101-177 / per-field files JVectorWriter.java:374-433):
several corpus columns indexed under one segment set with per-field doc
lengths and collection stats; queries combine per-field BM25 with weights.
Verified against an independent pure-python BM25."""

import math
import re

import pytest

from pysearch.build import build_index
from pysearch.config import IndexConfig
from pysearch.merge import force_merge
from pysearch.query import Query, SearchIndex

ROWS = [
    ("spark merge join data", "alpha"),
    ("spark spark table", "beta"),
    ("merge window sort", "alpha tools"),
    ("data table row", "gamma"),
    ("join join merge spark", "beta"),
    ("sort filter scan", "alpha"),
    ("window scan spark merge", "delta tools"),
    ("table scan merge row", "alpha"),
]

CFG = IndexConfig(
    segment_rows=3, term_buckets=4, approximate_threshold=2,
    fields=("content", "title"),
)


def _toks(s):
    return re.findall(r"[a-z0-9]+", s.lower())


def _bm25_field(docs, qterms, field, weight, k1=1.2, b=0.75):
    n = len(docs)
    dls = [len(_toks(d[field])) for d in docs]
    avgdl = sum(dls) / n
    out = {}
    for t in set(qterms):
        df = sum(1 for d in docs if t in _toks(d[field]))
        if not df:
            continue
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for i, d in enumerate(docs):
            tf = _toks(d[field]).count(t)
            if tf:
                out[i] = out.get(i, 0.0) + weight * idf * tf / (
                    tf + k1 * (1 - b + b * dls[i] / avgdl)
                )
    return out


def _expected(qtext, fields):
    qt = _toks(qtext)
    combined = {}
    for (fi, w) in fields:
        for k, v in _bm25_field(ROWS, qt, fi, w).items():
            combined[k] = combined.get(k, 0.0) + v
    return [
        (k, round(v, 6))
        for k, v in sorted(combined.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))
    ]


@pytest.fixture(scope="module")
def mf_index(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("mf"))
    df = spark.createDataFrame(
        [("r", f"p{i:03d}", "c", "py", t, s) for i, (t, s) in enumerate(ROWS)],
        "repo string, path string, commit string, lang string, content string, title string",
    )
    build_index(spark, df, idx, CFG)
    return idx


def _got(si, q):
    return [(r["doc_id"], round(float(r["score"]), 6)) for r in si.search(q).collect()]


def test_weighted_two_field_query(spark, mf_index):
    si = SearchIndex(spark, mf_index)
    assert si.avgdl_fields["title"] == pytest.approx(
        sum(len(_toks(s)) for _, s in ROWS) / len(ROWS)
    )
    q = Query(text="spark alpha", k=10, fields={"content": 1.0, "title": 2.0})
    assert _got(si, q) == _expected("spark alpha", [(0, 1.0), (1, 2.0)])


def test_single_field_selection(spark, mf_index):
    si = SearchIndex(spark, mf_index)
    # title-only query: content matches must NOT contribute
    q = Query(text="alpha spark", k=10, fields={"title": 1.0})
    assert _got(si, q) == _expected("alpha spark", [(1, 1.0)])
    # primary-only (default) unchanged by the extra field's presence
    q2 = Query(text="spark merge", k=10)
    assert _got(si, q2) == _expected("spark merge", [(0, 1.0)])


def test_multifield_survives_merges(spark, mf_index):
    si = SearchIndex(spark, mf_index)
    q = Query(text="spark tools", k=10, fields={"content": 1.0, "title": 3.0})
    before = _got(si, q)
    force_merge(spark, mf_index, max_segments=1, compact=False)
    assert _got(SearchIndex(spark, mf_index), q) == before
    force_merge(spark, mf_index, max_segments=1, compact=True)
    assert _got(SearchIndex(spark, mf_index), q) == before


def test_multifield_batch_parity(spark, mf_index):
    si = SearchIndex(spark, mf_index)
    qs = [
        Query(text="spark alpha", k=10, fields={"content": 1.0, "title": 2.0}),
        Query(text="merge scan", k=4),
        Query(text='"table scan" merge', k=5),
    ]
    out = si.search_batch(qs)
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(float(r["score"]), 6))
        )
    for qid, q in enumerate(qs):
        assert by_q.get(qid, []) == _got(si, q), f"batch/single diverge on q{qid}"


def test_multifield_query_table(spark, mf_index):
    """fields_col on the query-table surface: a JSON weights cell runs the
    row as a weighted multi-field query, identical to Query.fields; mixed
    with plain rows in one table."""
    import json

    si = SearchIndex(spark, mf_index)
    qdf = spark.createDataFrame(
        [
            (1, "spark alpha", json.dumps({"content": 1.0, "title": 2.0})),
            (2, "alpha spark", json.dumps({"title": 1.0})),
            (3, "merge scan", None),
        ],
        "query_id long, text string, flds string",
    )
    out = si.search_batch_table(qdf, fields_col="flds", default_k=10)
    by_q = {}
    for r in out.collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], round(float(r["score"]), 6))
        )
    singles = {
        1: Query(text="spark alpha", k=10, fields={"content": 1.0, "title": 2.0}),
        2: Query(text="alpha spark", k=10, fields={"title": 1.0}),
        3: Query(text="merge scan", k=10),
    }
    for qid, q in singles.items():
        assert sorted(by_q.get(qid, [])) == sorted(_got(si, q)), qid
    # unknown field and prefix-on-fielded-row are rejected
    bad = spark.createDataFrame(
        [(9, "spark", json.dumps({"nope": 1.0}))],
        "query_id long, text string, flds string",
    )
    with pytest.raises(Exception):
        si.search_batch_table(bad, fields_col="flds").collect()
    bad2 = spark.createDataFrame(
        [(9, "spa* merge", json.dumps({"title": 1.0}))],
        "query_id long, text string, flds string",
    )
    with pytest.raises(Exception):
        si.search_batch_table(bad2, fields_col="flds").collect()


def test_unknown_field_rejected(spark, mf_index):
    si = SearchIndex(spark, mf_index)
    with pytest.raises(ValueError):
        si.search(Query(text="spark", k=5, fields={"nope": 1.0}))
    with pytest.raises(ValueError):
        Query(text="spark", k=5, fields={"title": 0.0}).validate()
