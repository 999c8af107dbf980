"""Process-boundary scaling evidence (r6 verdict ask #3): the query-table
criterion on a REAL localhost standalone cluster — master + a 4-core worker,
the app capped at N single-core executor JVMs (spark.executor.cores=1,
spark.cores.max=N), so every shuffle crosses executor process boundaries
(serialization + localhost sockets), unlike local[N] threads.

Orchestration (cluster lifecycle is external):
    /opt/spark/sbin/start-master.sh -h 127.0.0.1 -p 7077
    /opt/spark/sbin/start-worker.sh spark://127.0.0.1:7077 -c 4 -m 24g
    python BENCH/scaling_cluster.py            # drives both submits
Writes BENCH/scaling_cluster.json:
    raw_efficiency = (T_2exec / T_4exec) / 2, plus a single-process hw
    calibration bracketing each run (same probe as bench.py) so host
    contention is separable.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
MASTER = os.environ.get("PYSEARCH_CLUSTER_MASTER", "spark://127.0.0.1:7077")
PYTHON = sys.executable
N_DOCS = int(os.environ.get("PYSEARCH_CLUSTER_DOCS", "100000"))
N_QUERIES = int(os.environ.get("PYSEARCH_CLUSTER_QUERIES", "20000"))


def _hw_calibration() -> float:
    import numpy as np

    rng = np.random.default_rng(12345)
    x = rng.standard_normal(4_000_000)
    a = rng.standard_normal((512, 512))
    t0 = time.time()
    np.argsort(x)
    b = a.copy()
    for _ in range(8):
        b = b @ a
        b /= np.abs(b).max()
    return time.time() - t0


def child(index_dir: str) -> None:
    """Runs INSIDE spark-submit against the standalone master: times the
    20k-query table workload best-of-2 on the prebuilt index."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, REPO)
    from pysearch.fixtures import generate_queries
    from pysearch.query import Query, SearchIndex

    si = SearchIndex(spark, index_dir)
    si.search(Query(text="warm cache terms", k=10)).collect()
    texts = [q["query_text"] for q in generate_queries(100, seed=42)]
    arr = F.array(*[F.lit(t) for t in texts])
    qdf = spark.range(N_QUERIES).select(
        F.col("id").alias("query_id"),
        F.element_at(arr, (F.col("id") % 100 + 1).cast("int")).alias("text"),
    )
    best = None
    for _ in range(2):
        t0 = time.time()
        si.search_batch_table(qdf, default_k=10, chunk=N_QUERIES).count()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(json.dumps({"table_sec": round(best, 2), "n_queries": N_QUERIES}))


def drive() -> None:
    work = tempfile.mkdtemp(prefix="pysearch_cluster_")
    idx = os.path.join(work, "idx")
    # build once, locally (build time is not the criterion here)
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sys.path.insert(0, REPO)
    from pysearch.build import build_index
    from pysearch.config import IndexConfig
    from pysearch.fixtures import generate_repo_files

    corpus = generate_repo_files(spark, N_DOCS, seed=42).persist()
    corpus.count()
    build_index(
        spark, corpus, idx,
        IndexConfig(segment_rows=25_000, term_buckets=32), concurrency=4,
    )
    spark.stop()

    zip_path = os.path.join(work, "pysearch.zip")
    shutil.make_archive(zip_path[:-4], "zip", REPO, "pysearch")

    out: dict = {
        "criterion": "20k-query table retrieval, 100k-doc index",
        "executors": "N single-core executor JVMs on a standalone worker",
        "n_docs": N_DOCS, "n_queries": N_QUERIES,
    }
    results = {}
    for n_exec in (2, 4):
        calib0 = _hw_calibration()
        env = dict(os.environ)
        env["PYSPARK_PYTHON"] = PYTHON
        env["PYSPARK_DRIVER_PYTHON"] = PYTHON
        cmd = [
            "/opt/spark/bin/spark-submit",
            "--master", MASTER,
            "--conf", "spark.executor.cores=1",
            "--conf", "spark.executor.memory=4g",
            "--conf", f"spark.cores.max={n_exec}",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.sql.adaptive.enabled=true",
            "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.driver.memory=8g",
            "--py-files", zip_path,
            os.path.abspath(__file__), "child", idx,
        ]
        t0 = time.time()
        proc = subprocess.run(cmd, env=env, capture_output=True, text=True)
        wall = time.time() - t0
        calib1 = _hw_calibration()
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if proc.returncode != 0 or not line:
            print(proc.stderr[-4000:], file=sys.stderr)
            raise SystemExit(f"child at {n_exec} executors failed")
        parsed = json.loads(line[-1])
        results[n_exec] = parsed["table_sec"]
        out[f"exec{n_exec}"] = {
            "table_sec": parsed["table_sec"],
            "submit_wall_sec": round(wall, 1),
            "hw_calib_before": round(calib0, 3),
            "hw_calib_after": round(calib1, 3),
        }
        print(f"  {n_exec} executors: {parsed['table_sec']}s", file=sys.stderr)

    out["raw_efficiency_2_to_4"] = round((results[2] / results[4]) / 2.0, 3)
    with open(os.path.join(HERE, "scaling_cluster.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "child":
        child(sys.argv[2])
    else:
        drive()
