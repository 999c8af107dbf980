"""Corpus loading and deterministic global doc-id assignment.

The corpus is any DataFrame with the input_hint shape
``repo_files(repo:string, path:string, commit:string, lang:string,
content:string)``; primary key ``(repo, path)``.

Doc-id assignment is the analog of the reference's ordinal<->docID mapping
(GraphNodeIdToDocMap.java:25-61): ids must be dense, deterministic, and
independent of partitioning/parallelism. A naive
``row_number() OVER (ORDER BY repo, path)`` collapses the whole corpus into
ONE partition — fatal at 10^12 rows — so we use the scalable two-pass
pattern instead:

  1. range-repartition + sort by the PK (distributed sort, each partition
     holds a contiguous key range),
  2. count rows per partition (tiny driver-side array),
  3. broadcast the cumulative offsets and number rows per-partition with a
     stateful ``mapInPandas`` (pure Arrow batches, no per-row Python).

Because ``(repo, path)`` is a total order (PK), the resulting ids are a pure
function of the data — identical at local[1] and on 1000 executors — even
though the sampled range boundaries are not.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)

CORPUS_COLS = [f.name for f in CORPUS_SCHEMA.fields]


def assign_doc_ids(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Return the corpus with a dense deterministic ``doc_id`` (0-based,
    ordered by (repo, path)) added. Scalable two-pass numbering (see module
    docstring). The input must have unique (repo, path).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = max(spark.sparkContext.defaultParallelism, 1)

    ranged = (
        df.repartitionByRange(num_partitions, "repo", "path")
        .sortWithinPartitions("repo", "path")
        .withColumn("_pid", F.spark_partition_id())
    )
    # Pin the partitioning: range boundaries are sampled, so the same plan
    # re-evaluated could place rows differently. Persisting materializes one
    # assignment that both passes below observe.
    ranged = ranged.persist()
    counts = {
        r["_pid"]: r["cnt"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    boffsets = spark.sparkContext.broadcast(offsets)

    out_schema = T.StructType(
        ranged.schema.fields + [T.StructField("doc_id", T.LongType())]
    )

    def number_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        seen = 0
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(doc_id=pd.Series(dtype="int64"))
                continue
            base = boffsets.value[int(pdf["_pid"].iloc[0])]
            pdf = pdf.copy()
            pdf["doc_id"] = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield pdf

    out = ranged.mapInPandas(number_partition, schema=out_schema).drop("_pid")
    # let the caller release the pinned partitioning once ids are persisted
    out._pysearch_cached = ranged
    return out


def load_repo_files(spark: SparkSession, path: str) -> DataFrame:
    """Read a repo_files parquet table with the canonical schema."""
    return spark.read.schema(CORPUS_SCHEMA).parquet(path)


def load_repo_files_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Read repo_files from JSON-lines (common crawl/export shape); extra
    fields are dropped, missing optional fields (commit, lang) are filled.
    Same downstream contract as the parquet loader."""
    df = spark.read.json(path)
    cols = {c.lower(): c for c in df.columns}
    missing = [c for c in ("repo", "path", "content") if c not in cols]
    if missing:
        raise ValueError(f"jsonl corpus at {path} lacks columns: {missing}")
    sel = [F.col(cols[c]).cast("string").alias(c) for c in ("repo", "path")]
    commit = (
        F.col(cols["commit"]).cast("string") if "commit" in cols else F.lit(None)
    )
    lang = F.col(cols["lang"]).cast("string") if "lang" in cols else F.lit(None)
    sel.append(F.coalesce(commit, F.md5(F.col(cols["content"]))).alias("commit"))
    sel.append(F.coalesce(lang, F.lit("unknown")).alias("lang"))
    sel.append(F.col(cols["content"]).cast("string").alias("content"))
    return df.select(*sel)


def load_repo_files_table(spark: SparkSession, table: str) -> DataFrame:
    """Read repo_files from a catalog table (e.g. an Iceberg table
    `catalog.db.repo_files` when an Iceberg catalog is configured on the
    session). Same DataFrame source contract as the parquet path — Catalyst
    pushes filters/column pruning into the Iceberg scan, and everything
    downstream is identical. (The sandbox has no Iceberg runtime jar, so
    this path is exercised on real clusters; parquet is the tested stand-in.)
    """
    df = spark.table(table)
    missing = [c for c in CORPUS_COLS if c not in df.columns]
    if missing:
        raise ValueError(f"table {table} lacks repo_files columns: {missing}")
    return df.select(*CORPUS_COLS)


def corpus_from_documents(
    spark: SparkSession, sf_dir: str, extra_fields: tuple = ()
) -> DataFrame:
    """Adapt the driver's ``documents`` test table to the repo_files shape.

    doc_id alignment: ``path`` is the zero-padded documents.doc_id under a
    single repo, so lexical (repo, path) order == numeric doc_id order and
    the engine's assigned doc_id equals documents.doc_id — which keeps every
    DuckDB oracle joinable on doc_id.

    ``extra_fields``: additional documents columns to carry through for
    multi-field indexing (e.g. ``("source",)``).
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return docs.select(
        F.lit("corpus").alias("repo"),
        F.format_string("docs/%012d.txt", F.col("doc_id")).alias("path"),
        F.sha2(F.concat_ws("\x00", F.lit("corpus"), F.col("doc_id").cast("string")), 256)
        .alias("commit"),
        F.col("lang"),
        F.col("text").alias("content"),
        *[F.col(c) for c in extra_fields],
    )
