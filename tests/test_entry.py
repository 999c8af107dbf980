"""Local mirror of the driver's correctness gate: run every queries() entry
and compare against oracle_sql() via DuckDB — row count, column names, and
exact value equality after column-name sort (the driver hashes values, so we
compare exactly, not approximately)."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns), kind="mergesort").reset_index(drop=True)


ORACLES = entrymod.oracle_sql()
ALL_QUERIES = entrymod.queries()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert "doc_id" in df.columns and "score" in df.columns


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_query_vs_oracle(spark, con, name):
    got = ALL_QUERIES[name](spark, SF).toPandas()
    if name not in ORACLES:
        # rows-only check (sketch/approx ops): non-crashing, sane output
        assert got is not None
        return
    exp = con.execute(ORACLES[name]).df()
    assert sorted(got.columns) == sorted(exp.columns), (
        f"{name}: columns {sorted(got.columns)} != {sorted(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: {len(got)} rows vs oracle {len(exp)}"
    g, e = _canon(got), _canon(exp)
    for c in g.columns:
        gv, ev = g[c].tolist(), e[c].tolist()
        assert gv == ev, (
            f"{name}: column {c} differs; first diff at "
            f"{next((i, a, b) for i, (a, b) in enumerate(zip(gv, ev)) if a != b)}"
        )


# ---------------------------------------------------------------------------
# machine-checked invariants for the rows-only (no_oracle) entries: the
# approximate operators are verified against their exact counterparts in-gate
# (recall floor + precision-1.0 subset), and MMR against its contract.
# ---------------------------------------------------------------------------

def _pairs(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_embedding_neardup_lsh_invariants(spark, con):
    exact = set(map(tuple, con.execute(ORACLES["embedding_neardup"]).fetchall()))
    lsh = _pairs(ALL_QUERIES["embedding_neardup_lsh"](spark, SF))
    assert lsh <= exact, "LSH emitted a non-duplicate pair (precision < 1.0)"
    assert len(lsh) / len(exact) >= 0.7, f"LSH recall {len(lsh)/len(exact):.3f} < 0.7"


def test_ann_cosine_ivf_invariants(spark, con):
    exact = {}
    for qid, nid, _rk in con.execute(ORACLES["ann_cosine_topk"]).fetchall():
        exact.setdefault(qid, set()).add(nid)
    approx = {}
    for r in ALL_QUERIES["ann_cosine_ivf"](spark, SF).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact]
    assert sum(recalls) / len(recalls) >= 0.5, f"IVF recall {recalls}"


def test_mmr_rerank_invariants(spark):
    out1 = ALL_QUERIES["mmr_rerank_topk"](spark, SF).toPandas()
    out2 = ALL_QUERIES["mmr_rerank_topk"](spark, SF).toPandas()
    assert out1["doc_id"].tolist() == out2["doc_id"].tolist(), "MMR not deterministic"
    assert sorted(out1["mmr_rank"].tolist()) == list(range(1, len(out1) + 1))
    # rank 1 is the highest-relevance candidate (BM25 top doc of Q_MULTI with
    # an embedding present)
    import __spark_entry__ as em
    from pysearch.oracle import bm25_topk
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.lit("r").alias("repo"), F.lit("p").alias("path"),
        F.lit("c").alias("commit"), "lang", F.col("text").alias("content"),
    )
    cand = bm25_topk(docs, em.Q_MULTI, k=30, config=em.ENTRY_CFG).toPandas()
    have_emb = {
        r["vec_id"]
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").select("vec_id").collect()
    }
    top = next(d for d in cand["doc_id"] if int(d) in have_emb)
    assert int(out1.loc[out1["mmr_rank"] == 1, "doc_id"].iloc[0]) == int(top)
