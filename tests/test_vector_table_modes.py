"""Round-4 vector query-TABLE surface: filtered search (allow_ids
semi-join), radial mode (min_sim / max_distance), per-row method parameters
(nprobe / rerank_factor columns — the method_parameters analog,
KNNQueryBuilder.java:71-76,241-258), the chunked driver-list kernel at
10^4 queries, and the rerank_factor<->recall trade the reference documents
as overquery (KNNConstants.java:90)."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pysearch.ops.similarity import cosine_topk
from pysearch.ops.vector_index import (
    build_vector_index,
    delete_vectors,
    search_vector_index,
    search_vector_index_table,
)

SF = "/root/testdata/sf0.001"


def _key(rows):
    return sorted((r["query_id"], r["rank"], r["neighbor_id"]) for r in rows)


def _by_q(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _queries(emb, ids):
    return [
        (r["vec_id"], list(r["embedding"]))
        for r in emb.where(F.col("vec_id").isin(ids)).collect()
    ]


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet(f"{SF}/embeddings.parquet").persist()
    yield df
    df.unpersist()


@pytest.fixture(scope="module")
def plain_idx(spark, emb, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("vt_plain"))
    build_vector_index(spark, emb, idx, nlist=8, seed=42)
    return idx


@pytest.fixture(scope="module")
def quant_idx(spark, emb, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("vt_quant"))
    build_vector_index(spark, emb, idx, nlist=8, seed=42, quantize=True)
    return idx


def _qdf(emb, qids):
    return emb.where(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_table_filtered_semijoin_parity(spark, emb, plain_idx, quant_idx):
    """allow_ids on the TABLE path: id-DataFrame semi-join, parity with the
    driver-list path and with exact filtered brute force under full probe —
    on both plain and quantized indexes."""
    qids = [2, 4, 6]  # even: present in the filtered corpus for the oracle
    allow_df = emb.where("vec_id % 2 = 0").select("vec_id")
    allow = [r["vec_id"] for r in allow_df.collect()]
    exact = cosine_topk(emb.where("vec_id % 2 = 0"), qids, k=10).collect()
    for idx in (plain_idx, quant_idx):
        table = search_vector_index_table(
            spark, idx, _qdf(emb, qids), k=10, nprobe=8, allow_ids=allow_df,
            rerank_factor=8,
        ).collect()
        assert table and all(r["neighbor_id"] % 2 == 0 for r in table)
        lst = search_vector_index(
            spark, idx, _queries(emb, qids), k=10, nprobe=8, allow_ids=allow,
            rerank_factor=8,
        ).collect()
        assert _key(table) == _key(lst), idx
        assert _by_q(table) == _by_q(exact), idx


def test_table_radial_parity(spark, emb, plain_idx, quant_idx):
    """min_sim / max_distance on the TABLE path: unbounded result set at or
    above the threshold, parity with the driver-list radial path; the
    quantized tier is bypassed (radial is always exact-tier), so plain and
    quantized indexes return identical hits."""
    qids = [1, 2, 3, 4]
    thr = 0.2
    lst = search_vector_index(
        spark, plain_idx, _queries(emb, qids), nprobe=8, min_sim=thr
    ).collect()
    assert lst and len({r["query_id"] for r in lst}) == len(qids)
    for idx in (plain_idx, quant_idx):
        table = search_vector_index_table(
            spark, idx, _qdf(emb, qids), nprobe=8, min_sim=thr
        ).collect()
        assert _key(table) == _key(lst), idx
        assert all(r["cosine"] >= thr for r in table)
    # max_distance converts per space (cosine distance = 1 - cos)
    via_dist = search_vector_index_table(
        spark, plain_idx, _qdf(emb, qids), nprobe=8, max_distance=1.0 - thr
    ).collect()
    assert _key(via_dist) == _key(lst)
    with pytest.raises(ValueError):
        search_vector_index_table(
            spark, plain_idx, _qdf(emb, qids), min_sim=0.1, max_distance=0.5
        )


def test_table_radial_respects_filter_and_deletes(spark, emb, tmp_path):
    idx = str(tmp_path / "vt_rad_f")
    build_vector_index(spark, emb, idx, nlist=8, seed=42)
    delete_vectors(spark, idx, key="mod23", where="vec_id % 23 = 0")
    allow_df = emb.where("vec_id % 2 = 0").select("vec_id")
    rows = search_vector_index_table(
        spark, idx, _qdf(emb, [1, 2]), nprobe=8, min_sim=0.2,
        allow_ids=allow_df,
    ).collect()
    assert rows
    assert all(r["neighbor_id"] % 2 == 0 for r in rows)
    assert all(r["neighbor_id"] % 23 != 0 for r in rows)


def test_per_row_nprobe_matches_per_call(spark, emb, plain_idx):
    """A query table mixing easy (nprobe=2) and hard (nprobe=8) rows returns,
    per row, exactly what a per-call search with that nprobe returns."""
    qids = [1, 2, 3, 4]
    npb = {1: 2, 2: 8, 3: 2, 4: 8}
    qdf = _qdf(emb, qids).withColumn(
        "np",
        F.when(F.col("query_id").isin([2, 4]), F.lit(8)).otherwise(F.lit(2)),
    )
    table = search_vector_index_table(
        spark, plain_idx, qdf, k=10, nprobe=999, nprobe_col="np"
    ).collect()
    for q in qids:
        lst = search_vector_index(
            spark, plain_idx, _queries(emb, [q]), k=10, nprobe=npb[q]
        ).collect()
        got = [r for r in table if r["query_id"] == q]
        assert _key(got) == _key(lst), q


def test_per_row_rerank_factor_column(spark, emb, quant_idx):
    """Per-row rerank_factor on a quantized index: each row's candidate
    budget follows its column value — parity with per-call searches."""
    qids = [1, 2, 3]
    rfs = {1: 4, 2: 12, 3: 4}
    qdf = _qdf(emb, qids).withColumn(
        "rf", F.when(F.col("query_id") == 2, F.lit(12)).otherwise(F.lit(4))
    )
    table = search_vector_index_table(
        spark, quant_idx, qdf, k=10, nprobe=8, rerank_factor_col="rf"
    ).collect()
    for q in qids:
        lst = search_vector_index(
            spark, quant_idx, _queries(emb, [q]), k=10, nprobe=8,
            rerank_factor=rfs[q],
        ).collect()
        got = [r for r in table if r["query_id"] == q]
        assert _key(got) == _key(lst), q
    # the per-row budget MATTERS is proven adversarially in
    # test_rerank_factor_governs_recall (table variant included there)


def test_driver_list_kernel_chunks_large_query_count(spark, emb, plain_idx):
    """10^4 queries through the driver-list API: the kernel scores
    _QUERY_CHUNK-query slices (the (nq x batch) matrix never materializes),
    every query is answered, and a sampled query matches the 1-query call."""
    base = [list(r["embedding"]) for r in emb.where("vec_id < 20").collect()]
    rng = np.random.default_rng(7)
    queries = []
    for i in range(10_000):
        v = np.array(base[i % len(base)], dtype=np.float64)
        queries.append((1_000_000 + i, list(v + 1e-6 * rng.standard_normal(v.size))))
    out = search_vector_index(
        spark, plain_idx, queries, k=3, nprobe=2
    ).groupBy("query_id").count().collect()
    assert len(out) == 10_000
    assert all(r["count"] == 3 for r in out)
    # a 2000-query call spans a _QUERY_CHUNK boundary: queries on either
    # side match their single-query results exactly
    multi = search_vector_index(spark, plain_idx, queries[:2000], k=3, nprobe=2).collect()
    for probe_i in (0, 1500):
        single = search_vector_index(
            spark, plain_idx, queries[probe_i : probe_i + 1], k=3, nprobe=2
        ).collect()
        got = [r for r in multi if r["query_id"] == queries[probe_i][0]]
        assert _key(got) == _key(single), probe_i


def test_rerank_factor_governs_recall(spark, tmp_path):
    """The quantized cut is candidate-bounded, not unconditionally exact: an
    adversarial one-bit corpus (decoys sharing the query's bit pattern but
    with mediocre cosine; true neighbors bit-distant but near-identical in
    float) yields recall 0 at rerank_factor=1 and recall 1 once the
    candidate superset covers the decoys — the overquery trade
    (KNNConstants.java:90)."""
    dim = 8
    eps = 0.01
    rows = []
    vid = 0
    # 300 decoys: all-positive -> bits 11111111, cosine ~0.71 vs q
    for _ in range(300):
        rows.append((vid, [0.1] * dim)); vid += 1
    # 300 fillers: all-negative -> bits 00000000 (keeps per-dim means ~0)
    for _ in range(300):
        rows.append((vid, [-0.1] * dim)); vid += 1
    # 20 true neighbors: bits 11110000 (hamming 4 from q) but cosine ~0.9999
    true_ids = []
    for j in range(20):
        s = 1.0 + 0.001 * j
        rows.append((vid, [s, s, s, s, -eps, -eps, -eps, -eps]))
        true_ids.append(vid); vid += 1
    df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]),
    )
    idx = str(tmp_path / "adv_ob")
    build_vector_index(
        spark, df, idx, nlist=2, seed=1, quantize=True, quant_kind="onebit"
    )
    q = [(9_999_999, [1.0, 1.0, 1.0, 1.0, eps, eps, eps, eps])]

    def hits(rf):
        return {
            r["neighbor_id"]
            for r in search_vector_index(
                spark, idx, q, k=10, nprobe=2, rerank_factor=rf
            ).collect()
        }

    # exact top-10 by cosine: true neighbors beat every decoy
    lo = hits(1)
    hi = hits(70)  # candidate budget 700 > 300 decoys + 20 true neighbors
    r_lo = len(lo & set(true_ids)) / 10
    r_hi = len(hi & set(true_ids)) / 10
    assert r_lo == 0.0, lo  # the cut provably bites
    assert r_hi == 1.0, hi  # widening the superset recovers exactness

    # per-row rerank_factor column steers the SAME trade on the table path:
    # two rows with the same vector, rf 1 vs 70 — only the wide row recalls
    qdf = spark.createDataFrame(
        [(101, q[0][1], 1), (102, q[0][1], 70)],
        T.StructType([
            T.StructField("query_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
            T.StructField("rf", T.IntegerType()),
        ]),
    )
    rows = search_vector_index_table(
        spark, idx, qdf, k=10, nprobe=2, rerank_factor_col="rf"
    ).collect()
    by_q = _by_q(rows)
    assert len(by_q[101] & set(true_ids)) == 0, by_q[101]
    assert len(by_q[102] & set(true_ids)) == 10, by_q[102]


def test_per_row_k_and_mixed_radial(spark, emb, plain_idx):
    """Per-row k (k_col) and per-row radial (min_sim_col) on one table —
    the text table's per-row k / min_score_col contract on the vector side:
    row 1 -> k=5, row 2 -> k=15, row 3 -> radial at 0.25 (its k ignored).
    Each row matches the equivalent per-call search exactly."""
    qids = [1, 2, 3]
    qdf = _qdf(emb, qids).withColumn(
        "kk",
        F.when(F.col("query_id") == 1, F.lit(5)).when(
            F.col("query_id") == 2, F.lit(15)
        ),
    ).withColumn(
        "ms", F.when(F.col("query_id") == 3, F.lit(0.25))
    )
    rows = search_vector_index_table(
        spark, plain_idx, qdf, k=10, nprobe=8, k_col="kk", min_sim_col="ms"
    ).collect()
    got = {q: [r for r in rows if r["query_id"] == q] for q in qids}
    assert len(got[1]) == 5 and len(got[2]) == 15
    for q, kk in ((1, 5), (2, 15)):
        lst = search_vector_index(
            spark, plain_idx, _queries(emb, [q]), k=kk, nprobe=8
        ).collect()
        assert _key(got[q]) == _key(lst), q
    rad = search_vector_index(
        spark, plain_idx, _queries(emb, [3]), nprobe=8, min_sim=0.25
    ).collect()
    assert _key(got[3]) == _key(rad)
    assert all(r["cosine"] >= 0.25 for r in got[3])


def test_allow_pairs_per_query_filter(spark, emb, plain_idx, quant_idx):
    """Per-QUERY accept sets (the per-knn-clause filter analog): an
    (query_id, vec_id) pairs table restricts each query independently —
    query 1 to even ids, query 2 to ids % 3 == 0 — matching per-call
    allow_ids searches exactly, on plain and quantized indexes."""
    pairs = (
        emb.where("vec_id % 2 = 0").select(F.lit(1).alias("query_id"), "vec_id")
        .unionByName(
            emb.where("vec_id % 3 = 0").select(F.lit(2).alias("query_id"), "vec_id")
        )
    )
    for idx in (plain_idx, quant_idx):
        table = search_vector_index_table(
            spark, idx, _qdf(emb, [1, 2]), k=10, nprobe=8,
            allow_pairs=pairs, rerank_factor=8,
        ).collect()
        r1 = [r for r in table if r["query_id"] == 1]
        r2 = [r for r in table if r["query_id"] == 2]
        assert r1 and all(r["neighbor_id"] % 2 == 0 for r in r1)
        assert r2 and all(r["neighbor_id"] % 3 == 0 for r in r2)
        for q, mod in ((1, 2), (2, 3)):
            lst = search_vector_index(
                spark, idx, _queries(emb, [q]), k=10, nprobe=8,
                allow_ids=emb.where(f"vec_id % {mod} = 0").select("vec_id"),
                rerank_factor=8,
            ).collect()
            got = [r for r in table if r["query_id"] == q]
            assert _key(got) == _key(lst), (idx, q)
    # radial + per-query pairs compose
    rad = search_vector_index_table(
        spark, plain_idx, _qdf(emb, [1]), nprobe=8, min_sim=0.2,
        allow_pairs=pairs,
    ).collect()
    assert rad and all(r["neighbor_id"] % 2 == 0 for r in rad)
    assert all(r["cosine"] >= 0.2 for r in rad)


def test_nested_parent_search(spark, emb, plain_idx):
    """Nested-vector search (diversifying-children analog): parents own
    many child vectors; top-k parents scored by best child. With the child
    budget covering the corpus the parent ranking is EXACT vs a numpy
    oracle; score modes follow their aggregates."""
    from pysearch.ops.vector_index import search_vector_index_nested

    parents = emb.select("vec_id", (F.col("vec_id") % 37).alias("parent_id"))
    qids = [1, 2]
    n = emb.count()
    got = search_vector_index_nested(
        spark, plain_idx, _qdf(emb, qids), parents, k=5, nprobe=8,
        child_oversample=n,  # cover everything -> exact
    ).collect()

    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    by_q = {q: sorted(
        (r["rank"], r["parent_id"], r["score"]) for r in got if r["query_id"] == q
    ) for q in qids}
    for q in qids:
        qi = int(np.flatnonzero(ids == q)[0])
        sims = Xn @ Xn[qi]
        mask = ids != q
        best: dict[int, float] = {}
        for vid, s_ in zip(ids[mask], sims[mask]):
            pid = int(vid) % 37
            best[pid] = max(best.get(pid, -2.0), float(s_))
        want = sorted(best.items(), key=lambda t: (-round(t[1], 9), t[0]))[:5]
        got_pids = [p_ for _, p_, __ in by_q[q]]
        assert got_pids == [p_ for p_, __ in want], (q, got_pids, want)
        for (_, gp, gs), (wp, ws) in zip(by_q[q], want):
            assert abs(gs - round(ws, 6)) < 2e-6, (gp, gs, ws)

    # score_mode count ranks parents by child count
    got_cnt = search_vector_index_nested(
        spark, plain_idx, _qdf(emb, [1]), parents, k=3, nprobe=8,
        child_oversample=n, score_mode="count",
    ).collect()
    assert [r["rank"] for r in got_cnt] == [1, 2, 3]
    counts = [r["score"] for r in got_cnt]
    assert counts == sorted(counts, reverse=True)


def test_per_row_nonpositive_params_raise(spark, emb, plain_idx, quant_idx):
    """Explicit non-positive per-row k / nprobe / rerank_factor values are
    caller bugs and raise (the text batch table's validation contract) —
    they must NOT be silently clipped into plausible-looking results."""
    for col_kw, col in (
        ("k_col", "kk"), ("nprobe_col", "kk"), ("rerank_factor_col", "kk")
    ):
        idx = quant_idx if col_kw == "rerank_factor_col" else plain_idx
        qdf = _qdf(emb, [1, 2]).withColumn(
            "kk", F.when(F.col("query_id") == 2, F.lit(0)).otherwise(F.lit(5))
        )
        with pytest.raises(Exception) as ei:
            search_vector_index_table(
                spark, idx, qdf, k=5, nprobe=8, **{col_kw: col}
            ).collect()
        assert "must be > 0" in str(ei.value)
        # nulls are fine: they fall back to the per-call default
        qdf_null = _qdf(emb, [1, 2]).withColumn(
            "kk",
            F.when(F.col("query_id") == 2, F.lit(None).cast("int"))
            .otherwise(F.lit(5)),
        )
        out = search_vector_index_table(
            spark, idx, qdf_null, k=5, nprobe=8, **{col_kw: col}
        ).collect()
        assert out


def test_keep_raw_sim_column(spark, emb, plain_idx):
    """_keep_raw_sim appends the UNROUNDED similarity (what the nested
    parent aggregation consumes) while `cosine` stays the 6-decimal
    reported score; without the flag the schema is unchanged."""
    rows = search_vector_index_table(
        spark, plain_idx, _qdf(emb, [1, 2]), k=10, nprobe=8,
        _keep_raw_sim=True,
    ).collect()
    assert rows and "sim_raw" in rows[0].asDict()
    for r in rows:
        assert abs(r["cosine"] - round(r["sim_raw"], 6)) < 1e-12
    # at least one row keeps sub-1e-6 precision the rounded column drops
    assert any(r["sim_raw"] != r["cosine"] for r in rows)
    plain = search_vector_index_table(
        spark, plain_idx, _qdf(emb, [1]), k=5, nprobe=8
    )
    assert plain.columns == ["query_id", "neighbor_id", "cosine", "rank"]
