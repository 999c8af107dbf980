"""Round-7 evidence: the query-table vector search's pair-join vs cogroup
crossover. Builds a 200k x 64-dim int8-quantized IVF index (nlist=64) and
times a 5k-query table search under both paths (PYSEARCH_VEC_COGROUP_MIN_DOCS
toggles), best-of-2 each. Writes BENCH/vector_table_scale_r07.json."""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("vec-table-scale-r07")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import pandas as pd

    n, dim, nlist, nq = 200_000, 64, 64, 5_000

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy(np.int64)
            rng = np.random.default_rng(ids[0] if ids.size else 0)
            X = rng.standard_normal((ids.size, dim)).astype(np.float32)
            yield pd.DataFrame({"vec_id": ids, "embedding": list(X)})

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    emb = spark.range(n).mapInPandas(gen, schema).persist()
    emb.count()

    from pysearch.ops.vector_index import build_vector_index, search_vector_index_table

    work = tempfile.mkdtemp(prefix="vec_scale_r07_")
    vidx = os.path.join(work, "vidx")
    build_vector_index(spark, emb, vidx, nlist=nlist, seed=42, quantize=True)
    qtab = emb.limit(nq).select(F.col("vec_id").alias("query_id"), "embedding").persist()
    qtab.count()

    out = {"n_vectors": n, "dim": dim, "nlist": nlist, "n_queries": nq, "cpus": cpus}
    for label, thresh in (("pair_join", str(10 ** 9)), ("cogroup", "0")):
        os.environ["PYSEARCH_VEC_COGROUP_MIN_DOCS"] = thresh
        best = None
        for _ in range(2):
            t0 = time.time()
            cnt = search_vector_index_table(spark, vidx, qtab, k=10, nprobe=4).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[label + "_sec"] = round(best, 2)
        out[label + "_rows"] = int(cnt)
        print(f"  {label}: {best:.2f}s rows={cnt}", file=sys.stderr, flush=True)
    os.environ.pop("PYSEARCH_VEC_COGROUP_MIN_DOCS", None)

    out["speedup"] = round(out["pair_join_sec"] / out["cogroup_sec"], 2)
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "vector_table_scale_r07.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))

    import shutil

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
