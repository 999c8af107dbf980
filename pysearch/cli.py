"""spark-submit entry points:  build | merge | query | delete | verify | gc | stats | serve.

Cluster usage (north_rule):
    zip -r pysearch.zip pysearch
    spark-submit --py-files pysearch.zip -m pysearch.cli build \
        --corpus s3://bucket/repo_files --index s3://bucket/index
The same code runs unchanged on local[N]: the engine's parallelism comes
entirely from Spark partitioning (segments x term-buckets), not from any
local assumption.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _spark(cpus: str | None = None, shuffle: int | None = None):
    from pyspark.sql import SparkSession

    b = SparkSession.builder.appName("pysearch")
    if cpus:
        b = b.master(f"local[{cpus}]")
        b = b.config("spark.sql.shuffle.partitions", str(shuffle or cpus))
    b = (
        b.config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    s = b.getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    return s


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pysearch")
    sub = p.add_subparsers(dest="cmd", required=True)

    pb = sub.add_parser("build")
    pb.add_argument("--corpus", required=True, help="repo_files parquet path")
    pb.add_argument("--index", required=True)
    pb.add_argument("--segment-rows", type=int, default=100_000)
    pb.add_argument("--term-buckets", type=int, default=16)
    pb.add_argument("--fields", default=None,
                    help="comma-separated field columns, primary first "
                         "(default: content)")
    pb.add_argument("--code-aware", action="store_true",
                    help="camelCase/snake_case subword analyzer")
    pb.add_argument("--no-positions", action="store_true",
                    help="skip the phrase positions tier (smaller index)")
    pb.add_argument("--cpus", default=None)

    pm = sub.add_parser("merge")
    pm.add_argument("--index", required=True)
    pm.add_argument("--force", type=int, default=0, help="force-merge to N segments")
    pm.add_argument("--compact", action="store_true",
                    help="rewrite data (drop tombstones) instead of the "
                         "pure-metadata incremental merge")
    pm.add_argument("--cpus", default=None)

    pq = sub.add_parser("query")
    pq.add_argument("--index", required=True)
    pq.add_argument("--text", required=True,
                    help='query text; "quoted phrases" and trailing-* prefixes work')
    pq.add_argument("--k", type=int, default=10)
    pq.add_argument("--min-score", type=float, default=None,
                    help="radial mode: return ALL hits >= this (k ignored)")
    pq.add_argument("--filter", default=None)
    pq.add_argument("--fields", default=None,
                    help="per-field weights, e.g. content=1,title=2")
    pq.add_argument("--cpus", default=None)

    pd_ = sub.add_parser("delete")
    pd_.add_argument("--index", required=True)
    pd_.add_argument("--key", required=True, help="idempotency key")
    pd_.add_argument("--where", default=None,
                     help="SQL predicate over docmap columns")
    pd_.add_argument("--ids", default=None, help="comma-separated doc ids")
    pd_.add_argument("--cpus", default=None)

    pv = sub.add_parser("verify")
    pv.add_argument("--index", required=True)
    pv.add_argument("--corpus", default=None,
                    help="source table for the sha256 invariant check")
    pv.add_argument("--cpus", default=None)

    pg = sub.add_parser("gc")
    pg.add_argument("--index", required=True)
    pg.add_argument("--dry-run", action="store_true")
    pg.add_argument("--cpus", default=None)

    ps = sub.add_parser("stats")
    ps.add_argument("--index", required=True)
    ps.add_argument("--cpus", default=None)

    pserve = sub.add_parser("serve")
    pserve.add_argument("--index", required=True)
    pserve.add_argument("--port", type=int, default=8080)
    pserve.add_argument("--vector-index", default=None,
                        help="also serve POST /knn from this vector index dir")
    pserve.add_argument("--cpus", default=None)

    pvb = sub.add_parser("vector-build")
    pvb.add_argument("--embeddings", required=True,
                     help="parquet of (vec_id, embedding) rows")
    pvb.add_argument("--index", required=True)
    pvb.add_argument("--nlist", type=int, default=16)
    pvb.add_argument("--space", default="cosinesimil")
    pvb.add_argument("--quantize", action="store_true",
                     help="add the compressed traversal tier (exact rerank at query)")
    pvb.add_argument("--quant-kind", default="int8",
                     choices=("int8", "onebit", "pq"),
                     help="int8 min/max codes, one-bit mean-threshold codes, "
                          "or subspace product quantization (16x at the "
                          "default dim/4 subspaces)")
    pvb.add_argument("--pq-m", type=int, default=None,
                     help="pq subspace count (must divide dim; default = "
                          "the reference's dim->subspaces table)")
    pvb.add_argument("--cpus", default=None)

    pvs = sub.add_parser("vector-search")
    pvs.add_argument("--index", required=True)
    pvs.add_argument("--queries", required=True,
                     help="parquet of (vec_id, embedding) query rows "
                          "(distributed table search)")
    pvs.add_argument("--k", type=int, default=10)
    pvs.add_argument("--nprobe", type=int, default=4)
    pvs.add_argument("--rerank-factor", type=int, default=None,
                     help="candidate oversample on quantized indexes (the "
                          "overquery analog; recall-governing). Unset = the "
                          "tier default: int8 4, pq 8, onebit 70")
    pvs.add_argument("--min-sim", type=float, default=None,
                     help="RADIAL mode: every neighbor at/above this raw "
                          "similarity, unbounded (k ignored)")
    pvs.add_argument("--max-distance", type=float, default=None,
                     help="RADIAL mode via distance (converted per space)")
    pvs.add_argument("--allow", default=None,
                     help="parquet of accepted vec_id rows (filtered search "
                          "semi-join)")
    pvs.add_argument("--allow-pairs", default=None,
                     help="parquet of (query_id, vec_id) accept pairs "
                          "(per-query filters)")
    pvs.add_argument("--nprobe-col", default=None,
                     help="per-row nprobe column of the query table")
    pvs.add_argument("--rerank-factor-col", default=None,
                     help="per-row rerank_factor column")
    pvs.add_argument("--k-col", default=None, help="per-row k column")
    pvs.add_argument("--min-sim-col", default=None,
                     help="per-row radial-threshold column (non-null rows "
                          "switch to radial)")
    pvs.add_argument("--cpus", default=None)

    pvm = sub.add_parser("vector-merge")
    pvm.add_argument("--index", required=True)
    pvm.add_argument("--compact", action="store_true",
                     help="rewrite data (drop tombstones) instead of the "
                          "density-guarded default")
    pvm.add_argument("--cpus", default=None)

    pvd = sub.add_parser("vector-delete")
    pvd.add_argument("--index", required=True)
    pvd.add_argument("--key", required=True, help="idempotency key")
    pvd.add_argument("--where", default=None)
    pvd.add_argument("--ids", default=None, help="comma-separated vec ids")
    pvd.add_argument("--cpus", default=None)

    args = p.parse_args(argv)
    spark = _spark(args.cpus)

    from pysearch.config import IndexConfig

    if args.cmd == "build":
        from pysearch.build import build_index
        from pysearch.corpus import load_repo_files

        t0 = time.time()
        cfg_kw = dict(
            segment_rows=args.segment_rows,
            term_buckets=args.term_buckets,
            store_positions=not args.no_positions,
        )
        if args.fields:
            cfg_kw["fields"] = tuple(f.strip() for f in args.fields.split(","))
        if args.code_aware:
            cfg_kw["extra"] = {"code_aware": True}
        corpus = spark.read.parquet(args.corpus)
        if not args.fields:
            corpus = load_repo_files(spark, args.corpus)
        meta = build_index(spark, corpus, args.index, IndexConfig(**cfg_kw))
        docs = sum(m["num_docs"] for m in meta.live_manifests().values())
        print(json.dumps({"built_docs": docs, "sec": time.time() - t0}))
    elif args.cmd == "merge":
        from pysearch.merge import force_merge, run_merge_round

        compact = True if args.compact else None
        if args.force:
            out = force_merge(spark, args.index, max_segments=args.force, compact=compact)
        else:
            out = run_merge_round(spark, args.index)
        print(json.dumps({"merged": out}))
    elif args.cmd == "query":
        from pysearch.query import Query, SearchIndex

        fields = None
        if args.fields:
            fields = {}
            for kv in args.fields.split(","):
                name, sep, w = kv.partition("=")
                if not sep or not name.strip():
                    raise SystemExit(
                        f"--fields expects name=weight pairs, got {kv!r} "
                        "(e.g. content=1,title=2)"
                    )
                try:
                    fields[name.strip()] = float(w)
                except ValueError:
                    raise SystemExit(f"--fields weight for {name!r} is not a number: {w!r}")
        si = SearchIndex(spark, args.index)
        q = Query(
            text=args.text,
            k=None if args.min_score is not None else args.k,
            min_score=args.min_score,
            filter_expr=args.filter,
            fields=fields,
        )
        for r in si.search(q).collect():
            print(json.dumps({"doc_id": r["doc_id"], "score": r["score"], "path": r["path"]}))
    elif args.cmd == "delete":
        from pysearch.merge import delete_docs

        ids = [int(x) for x in args.ids.split(",")] if args.ids else None
        n = delete_docs(spark, args.index, key=args.key, doc_ids=ids, where=args.where)
        print(json.dumps({"tombstoned": n}))
    elif args.cmd == "verify":
        from pysearch.admin import verify_index, verify_vector_index
        from pysearch.checkpoint import IndexMeta
        from pysearch.corpus import load_repo_files

        if IndexMeta(args.index).load_config().extra.get("kind") == "ivf":
            print(json.dumps(verify_vector_index(spark, args.index)))
        else:
            corpus = load_repo_files(spark, args.corpus) if args.corpus else None
            print(json.dumps(verify_index(spark, args.index, corpus)))
    elif args.cmd == "gc":
        from pysearch.admin import gc_segments

        print(json.dumps({"removed": gc_segments(args.index, dry_run=args.dry_run)}))
    elif args.cmd == "stats":
        from pysearch.admin import stats

        rows = stats(spark, args.index).where("bucket = -1").collect()
        for r in rows:
            print(json.dumps({k: r[k] for k in ("segment_id", "stage", "num_docs", "n_postings", "payload_bytes", "wall_time_sec")}))
    elif args.cmd == "serve":
        from pysearch.query import SearchIndex
        from pysearch.server import run_blocking

        run_blocking(
            SearchIndex(spark, args.index), args.port, args.vector_index
        )
    elif args.cmd == "vector-build":
        from pysearch.ops.vector_index import build_vector_index

        t0 = time.time()
        emb = spark.read.parquet(args.embeddings)
        meta = build_vector_index(
            spark, emb, args.index, nlist=args.nlist, space=args.space,
            quantize=args.quantize, quant_kind=args.quant_kind,
            pq_m=args.pq_m,
        )
        docs = sum(m["num_docs"] for m in meta.live_manifests().values())
        print(json.dumps({"indexed_vectors": docs, "sec": time.time() - t0}))
    elif args.cmd == "vector-search":
        from pysearch.ops.vector_index import search_vector_index_table

        qdf = spark.read.parquet(args.queries)
        out = search_vector_index_table(
            spark, args.index, qdf, k=args.k, nprobe=args.nprobe,
            id_col="vec_id", rerank_factor=args.rerank_factor,
            min_sim=args.min_sim, max_distance=args.max_distance,
            allow_ids=(
                spark.read.parquet(args.allow).select("vec_id")
                if args.allow else None
            ),
            allow_pairs=(
                spark.read.parquet(args.allow_pairs) if args.allow_pairs else None
            ),
            nprobe_col=args.nprobe_col,
            rerank_factor_col=args.rerank_factor_col,
            k_col=args.k_col,
            min_sim_col=args.min_sim_col,
        )
        for r in out.collect():
            print(json.dumps(
                {"query_id": r["query_id"], "neighbor_id": r["neighbor_id"],
                 "cosine": r["cosine"], "rank": r["rank"]}
            ))
    elif args.cmd == "vector-merge":
        from pysearch.ops.vector_index import merge_vector_index

        out = merge_vector_index(
            spark, args.index, compact=True if args.compact else None
        )
        print(json.dumps({"merged": out}))
    elif args.cmd == "vector-delete":
        from pysearch.ops.vector_index import delete_vectors

        ids = [int(x) for x in args.ids.split(",")] if args.ids else None
        n = delete_vectors(
            spark, args.index, key=args.key, vec_ids=ids, where=args.where
        )
        print(json.dumps({"tombstoned": n}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
