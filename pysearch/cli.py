"""spark-submit entry points:  build | merge | query | bench.

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
    pb.add_argument("--cpus", default=None)

    pm = sub.add_parser("merge")
    pm.add_argument("--index", required=True)
    pm.add_argument("--force", type=int, default=0, help="force-merge to N segments")
    pm.add_argument("--cpus", default=None)

    pq = sub.add_parser("query")
    pq.add_argument("--index", required=True)
    pq.add_argument("--text", required=True)
    pq.add_argument("--k", type=int, default=10)
    pq.add_argument("--filter", default=None)
    pq.add_argument("--cpus", default=None)

    args = p.parse_args(argv)
    spark = _spark(args.cpus)

    from pysearch.config import IndexConfig

    if args.cmd == "build":
        from pysearch.build import build_index
        from pysearch.corpus import load_repo_files

        t0 = time.time()
        meta = build_index(
            spark,
            load_repo_files(spark, args.corpus),
            args.index,
            IndexConfig(segment_rows=args.segment_rows),
        )
        docs = sum(m["num_docs"] for m in meta.live_manifests().values())
        print(json.dumps({"built_docs": docs, "sec": time.time() - t0}))
    elif args.cmd == "merge":
        from pysearch.merge import force_merge, run_merge_round

        if args.force:
            out = force_merge(spark, args.index, max_segments=args.force)
        else:
            out = run_merge_round(spark, args.index)
        print(json.dumps({"merged": out}))
    elif args.cmd == "query":
        from pysearch.query import Query, SearchIndex

        si = SearchIndex(spark, args.index)
        hits = si.search(Query(text=args.text, k=args.k, filter_expr=args.filter))
        for r in hits.collect():
            print(json.dumps({"doc_id": r["doc_id"], "score": r["score"], "path": r["path"]}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
