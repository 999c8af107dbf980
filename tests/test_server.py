"""Q16 transport analog: JSON-over-HTTP search served from a long-lived
SearchIndex handle; results identical to direct search()."""

import json
import urllib.request

import pytest

from pysearch.build import build_index
from pysearch.config import IndexConfig
from pysearch.fixtures import generate_repo_files
from pysearch.query import Query, SearchIndex
from pysearch.server import serve


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("srv_idx"))
    build_index(
        spark, generate_repo_files(spark, 300, seed=5), idx,
        IndexConfig(segment_rows=128, term_buckets=8),
    )
    si = SearchIndex(spark, idx)
    server = serve(si, port=0)  # ephemeral: parallel test runs can't collide
    port = server.server_address[1]
    yield si, f"http://127.0.0.1:{port}"
    server.shutdown()


def _post(url, payload):
    req = urllib.request.Request(
        url + "/search", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_search_matches_engine(served):
    si, url = served
    status, body = _post(url, {"text": "license merge", "k": 5})
    assert status == 200
    direct = si.search(Query(text="license merge", k=5)).collect()
    assert [(h["doc_id"], round(h["score"], 9)) for h in body["hits"]] == [
        (r["doc_id"], round(float(r["score"]), 9)) for r in direct
    ]
    assert all(h["content_sha"] for h in body["hits"])


def test_http_filtered_and_errors(served):
    si, url = served
    status, body = _post(url, {"text": "license", "k": 3, "filter": "lang = 'rust'"})
    assert status == 200 and body["hits"]  # non-vacuous: the filter matched
    assert all(h["lang"] == "rust" for h in body["hits"])
    status, body = _post(url, {"k": 3})  # missing text
    assert status == 400 and "error" in body
    status, body = _post(url, {"text": "x", "k": 0})  # invalid k
    assert status == 400
    status, body = _post(url, {"text": "x", "k": 5, "fields": {"nope": 1.0}})
    assert status == 400  # unknown field surfaces as a client error
    status, body = _post(url, {"text": "x", "k": 5, "min_score": 0.1})
    assert status == 400  # exactly-one-of contract is surfaced, not masked
    status, body = _post(url, {"text": "x", "k": "ten"})
    assert status == 400  # type confusion is a 400, not a dropped connection
    status, body = _post(url, [1, 2])
    assert status == 400  # non-object JSON body


def test_http_stats(served):
    si, url = served
    with urllib.request.urlopen(url + "/stats", timeout=30) as r:
        body = json.loads(r.read())
    assert body["num_docs"] == 300 and body["segments"] >= 1


@pytest.fixture(scope="module")
def served_knn(spark, tmp_path_factory):
    from pysearch.ops.vector_index import build_vector_index

    tidx = str(tmp_path_factory.mktemp("srvk_t"))
    vidx = str(tmp_path_factory.mktemp("srvk_v"))
    build_index(
        spark, generate_repo_files(spark, 200, seed=6), tidx,
        IndexConfig(segment_rows=128, term_buckets=4),
    )
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    build_vector_index(spark, emb, vidx, nlist=8, seed=42)
    si = SearchIndex(spark, tidx)
    server = serve(si, port=0, vector_index=vidx)
    port = server.server_address[1]
    yield spark, vidx, f"http://127.0.0.1:{port}"
    server.shutdown()


def _post_knn(url, payload):
    req = urllib.request.Request(
        url + "/knn", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    try:
        with urllib.request.urlopen(req, timeout=120) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_http_knn_matches_engine(served_knn):
    from pysearch.ops.vector_index import search_vector_index

    spark, vidx, url = served_knn
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    vec = list(emb.where("vec_id = 1").collect()[0]["embedding"])
    code, out = _post_knn(url, {"vector": vec, "k": 5, "nprobe": 8})
    assert code == 200
    direct = search_vector_index(spark, vidx, [(-1, vec)], k=5, nprobe=8).collect()
    assert [(n["neighbor_id"], n["rank"]) for n in out["neighbors"]] == [
        (r["neighbor_id"], r["rank"]) for r in direct
    ]
    # radial through the transport
    code, out = _post_knn(url, {"vector": vec, "nprobe": 8, "min_sim": 0.3})
    assert code == 200 and out["neighbors"]
    assert all(n["score"] >= 0.3 for n in out["neighbors"])
    # contract violations surface as 400
    code, _ = _post_knn(url, {"vector": []})
    assert code == 400
    code, _ = _post_knn(url, {"vector": vec, "min_sim": 0.1, "max_distance": 0.5})
    assert code == 400
    # non-numeric / null vector elements are malformed REQUESTS (400),
    # not server errors (500)
    code, _ = _post_knn(url, {"vector": ["a", "b", "c"]})
    assert code == 400
    code, _ = _post_knn(url, {"vector": [0.1, None, 0.3]})
    assert code == 400
