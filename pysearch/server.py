"""Minimal query-serving surface — the Q16 transport analog.

The reference exposes search over OpenSearch's REST/gRPC transports
(KNNQueryBuilder consumed by the _search endpoint; SURVEY §2.4 Q16). The
Spark-native analog is a thin JSON-over-HTTP front on a long-lived
SparkSession + SearchIndex handle: the driver is the coordinator node, the
executors are the data nodes, and every request reuses the warmed session
(dictionary/identity caches, parquet footers) exactly like a reader-cache in
the reference.

Deliberately stdlib-only (http.server): the transport is NOT the engine —
swap in any ASGI stack in production; the handler body is the whole
integration surface.

    POST /search   {"text": "...", "k": 10, "min_score": null,
                    "filter": "lang = 'py'", "fields": {"content": 1.0}}
    POST /knn      {"vector": [...], "k": 10, "nprobe": 4,
                    "min_sim": null, "max_distance": null,
                    "rerank_factor": 4, "filter_ids": [ids...]} —
                    served when the server was started with a vector
                    index dir (the knn clause of the reference's _search
                    endpoint, KNNQueryBuilder.java:64-81)
    GET  /stats    index-level stats (segments, docs, tombstones)

Run: ``python -m pysearch.server --index <dir> [--port 8080]`` or via
``pysearch.cli serve``.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pysearch.query import Query, SearchIndex


def make_handler(
    si: SearchIndex, lock: threading.Lock, vector_index: str | None = None
):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/stats":
                return self._send(404, {"error": "unknown path"})
            with lock:
                m = si.manifests
                self._send(
                    200,
                    {
                        "segments": len(m),
                        "num_docs": si.num_docs,
                        "avgdl": round(si.avgdl, 4),
                        "fields": list(si.index_fields),
                        "tombstones": si.meta.tombstone_count(),
                    },
                )

        MAX_BODY = 1 << 20  # JSON query bodies are tiny; cap the read

        def do_POST(self):
            if self.path == "/knn":
                return self._knn()
            if self.path != "/search":
                return self._send(404, {"error": "unknown path"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                if not (0 <= n <= self.MAX_BODY):
                    return self._send(400, {"error": "bad Content-Length"})
                req = json.loads(self.rfile.read(n) or b"{}")
                if not isinstance(req, dict):
                    raise ValueError("request body must be a JSON object")
                # pass k/min_score through verbatim: supplying both is the
                # client's contract violation and must surface as a 400
                # (Query.validate enforces exactly-one), never be papered over
                k = req.get("k", 10 if req.get("min_score") is None else None)
                q = Query(
                    text=req["text"],
                    k=k,
                    min_score=req.get("min_score"),
                    filter_expr=req.get("filter"),
                    fields=req.get("fields"),
                    overquery_factor=req.get("overquery_factor"),
                )
                q.validate()
            except KeyError as e:
                return self._send(400, {"error": f"missing field {e}"})
            except Exception as e:  # malformed JSON / wrong types / bad values
                return self._send(400, {"error": str(e)})
            # Spark driver calls are serialized: one session, many HTTP
            # threads (the coordinator pattern — parallelism lives in the
            # cluster, not in concurrent driver actions)
            with lock:
                try:
                    rows = si.search(q).collect()
                except ValueError as e:  # engine-level request rejection
                    return self._send(400, {"error": str(e)})
                except Exception as e:  # genuine server-side failure
                    return self._send(500, {"error": str(e)})
            self._send(
                200,
                {
                    "hits": [
                        {
                            "doc_id": r["doc_id"],
                            "score": r["score"],
                            "repo": r["repo"],
                            "path": r["path"],
                            "lang": r["lang"],
                            "content_sha": r["content_sha"],
                        }
                        for r in rows
                    ]
                },
            )

        def _knn(self):
            if vector_index is None:
                return self._send(
                    400, {"error": "server started without --vector-index"}
                )
            try:
                n = int(self.headers.get("Content-Length", 0))
                if not (0 <= n <= self.MAX_BODY):
                    return self._send(400, {"error": "bad Content-Length"})
                req = json.loads(self.rfile.read(n) or b"{}")
                vec = req["vector"]
                if not isinstance(vec, list) or not vec:
                    raise ValueError("vector must be a non-empty list")
                # element conversion is request validation: non-numeric /
                # null elements are a malformed request (400), not a
                # server error (500)
                try:
                    vec = [float(x) for x in vec]
                except (TypeError, ValueError):
                    raise ValueError("vector elements must be numbers")
            except KeyError as e:
                return self._send(400, {"error": f"missing field {e}"})
            except Exception as e:
                return self._send(400, {"error": str(e)})
            from pysearch.ops.vector_index import search_vector_index

            with lock:
                try:
                    rows = search_vector_index(
                        si.spark, vector_index,
                        [(-1, vec)],
                        k=int(req.get("k", 10)),
                        nprobe=int(req.get("nprobe", 4)),
                        rerank_factor=(
                            int(req["rerank_factor"])
                            if "rerank_factor" in req
                            else None  # per-tier default kicks in
                        ),
                        min_sim=req.get("min_sim"),
                        max_distance=req.get("max_distance"),
                        allow_ids=req.get("filter_ids"),
                    ).collect()
                except ValueError as e:
                    return self._send(400, {"error": str(e)})
                except Exception as e:
                    return self._send(500, {"error": str(e)})
            self._send(
                200,
                {
                    "neighbors": [
                        {
                            "neighbor_id": r["neighbor_id"],
                            "score": r["cosine"],
                            "rank": r["rank"],
                        }
                        for r in rows
                    ]
                },
            )

    return Handler


def serve(
    si: SearchIndex, port: int = 8080, vector_index: str | None = None
) -> ThreadingHTTPServer:
    """Start the HTTP server on a daemon thread (non-blocking). Returns the
    bound server: read ``.server_address`` for the actual port (pass port=0
    for an ephemeral one), call ``.shutdown()`` to stop."""
    server = ThreadingHTTPServer(
        ("127.0.0.1", port), make_handler(si, threading.Lock(), vector_index)
    )
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server


def run_blocking(
    si: SearchIndex, port: int, vector_index: str | None = None
) -> None:
    """Serve until interrupted; shared by `python -m pysearch.server` and
    `pysearch.cli serve` (clean shutdown on Ctrl-C)."""
    server = serve(si, port, vector_index)
    print(
        json.dumps(
            {
                "serving": f"http://127.0.0.1:{server.server_address[1]}",
                "docs": si.num_docs,
            }
        ),
        flush=True,
    )
    try:
        threading.Event().wait()
    except KeyboardInterrupt:
        server.shutdown()


def main(argv=None) -> int:
    import argparse

    from pyspark.sql import SparkSession

    ap = argparse.ArgumentParser(prog="pysearch-server")
    ap.add_argument("--index", required=True)
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--vector-index", default=None,
                    help="also serve POST /knn from this vector index dir")
    args = ap.parse_args(argv)
    spark = SparkSession.builder.appName("pysearch-server").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    run_blocking(SearchIndex(spark, args.index), args.port, args.vector_index)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
