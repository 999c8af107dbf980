"""Shingle-join skew guard (north_rule: boilerplate skew handled
explicitly): a shingle appearing in d docs contributes d^2 rows to the
exact-Jaccard inverted self-join, so `max_df` — now a FINITE default
(dedup.DEFAULT_MAX_SHINGLE_DF) — drops ultra-common shingles from the
shingle SPACE consistently: both the minhash signatures and the exact
verification read the same capped sets, so LSH precision stays 1.0 under
the capped-Jaccard semantics."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pysearch.ops import dedup


def _capped_jaccard_pairs(rows, tau, max_df):
    """Independent pandas/pure-python oracle for capped-shingle Jaccard."""
    import re

    sets = {i: set(re.findall(r"[a-z0-9]+", t.lower())) for i, t in rows}
    df_count: dict[str, int] = {}
    for s in sets.values():
        for tok in s:
            df_count[tok] = df_count.get(tok, 0) + 1
    capped = {
        i: {t for t in s if df_count[t] <= max_df} for i, s in sets.items()
    }
    out = set()
    ids = sorted(capped)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = capped[ids[x]], capped[ids[y]]
            if not a or not b:
                continue
            inter = len(a & b)
            j = inter / (len(a) + len(b) - inter)
            if j >= tau:
                out.add((ids[x], ids[y]))
    return out


@pytest.fixture(scope="module")
def boiler_docs(spark):
    """300 docs sharing one 100%-df boilerplate shingle; pairs of docs are
    true near-dups only through their non-boilerplate tokens."""
    rows = []
    for i in range(300):
        grp = i // 2  # doc 2g and 2g+1 share their unique vocabulary
        toks = " ".join(f"tok{grp}x{j}" for j in range(8))
        extra = f"only{i}" if i % 2 else ""
        rows.append((i, f"boilerplate {toks} {extra}"))
    return rows


def test_default_cap_is_finite_and_consistent(spark, boiler_docs):
    assert dedup.DEFAULT_MAX_SHINGLE_DF is not None
    assert np.isfinite(dedup.DEFAULT_MAX_SHINGLE_DF)
    df = spark.createDataFrame(boiler_docs, "doc_id long, text string")
    # cap below the boilerplate df (300) -> the hot shingle leaves the space
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.jaccard_pairs(df, tau=0.8, max_df=50).collect()
    }
    expect = _capped_jaccard_pairs(boiler_docs, tau=0.8, max_df=50)
    assert got == expect and len(got) == 150  # one pair per 2-doc group
    # docs whose ONLY overlap is boilerplate never pair up
    assert all(b - a == 1 and a % 2 == 0 for a, b in got)


def test_hot_shingle_join_rows_bounded(spark, boiler_docs):
    """The guard keeps the inverted join candidate-linear: with the cap the
    join's row count is the sum of per-shingle df^2 over SURVIVING shingles
    (~8 per group), never the 300^2 of the boilerplate shingle."""
    df = spark.createDataFrame(boiler_docs, "doc_id long, text string")
    sh = dedup.shingle_sets(df, "text", "doc_id", 1)
    ok = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df_s")).where(
        F.col("df_s") <= 50
    )
    survivors = sh.join(ok.select("shingle"), "shingle", "left_semi")
    dfs = [r["df_s"] for r in ok.collect()]
    join_rows = sum(d * d for d in dfs)
    assert join_rows < 20_000  # uncapped: boilerplate alone is 90,000
    assert survivors.count() < sh.count()


def test_minhash_lsh_capped_consistency(spark, boiler_docs):
    """minhash_lsh_pairs under a cap: signatures AND exact verification use
    the same capped sets — results equal the capped-Jaccard oracle (banding
    miss probability at these parameters ~1e-12)."""
    df = spark.createDataFrame(boiler_docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_lsh_pairs(
            df, tau=0.8, num_hashes=64, bands=16, max_df=50
        ).collect()
    }
    expect = _capped_jaccard_pairs(boiler_docs, tau=0.8, max_df=50)
    assert got == expect
