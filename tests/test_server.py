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
