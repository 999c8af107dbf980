"""Training-data pipeline operator tests: dedup tiers, similarity search,
text analysis, multimodal plumbing, MMR/grouped rerank — each verified
against an independent python/numpy reference on real testdata."""

import hashlib
import zlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pysearch.ops import dedup, multimodal, rerank, similarity, text
from pysearch.analyze import tokenize_text

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").persist()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").persist()


@pytest.fixture(scope="module")
def docs_pd(docs):
    return docs.toPandas()


@pytest.fixture(scope="module")
def emb_np(emb):
    pdf = emb.toPandas().sort_values("vec_id")
    X = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    X = X / np.linalg.norm(X, axis=1, keepdims=True)
    return pdf["vec_id"].to_numpy(np.int64), X


# --- text analysis ----------------------------------------------------------

def test_token_stats(docs, docs_pd):
    got = {r["doc_id"]: r for r in text.token_stats(docs).collect()}
    for _, row in docs_pd.head(50).iterrows():
        toks = tokenize_text(row["text"])
        g = got[row["doc_id"]]
        assert g["n_tokens"] == len(toks)
        assert g["n_unique"] == len(set(toks))
        assert g["token_chars"] == sum(len(t) for t in toks)


def test_quality_and_langid_deterministic(docs):
    q1 = {r["doc_id"]: r["quality"] for r in text.quality_score(docs).collect()}
    q2 = {r["doc_id"]: r["quality"] for r in text.quality_score(docs).collect()}
    assert q1 == q2 and all(0 <= v <= 1.0 for v in q1.values())
    lids = text.language_id(docs).collect()
    assert all(r["lang_guess"] in (*text.LANG_MARKERS, "unknown") for r in lids)


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello,  WORLD! foo"), (2, "hello world FOO"), (3, "different text")],
        "doc_id long, text string",
    )
    fps = {r["doc_id"]: r["fingerprint"] for r in text.fingerprint(df).collect()}
    assert fps[1] == fps[2] != fps[3]


def test_winnow_fingerprints(docs):
    out = text.winnow_fingerprints(docs.limit(30)).collect()
    assert all(len(r["sig"]) > 0 for r in out)
    # identical text -> identical signature
    a = text.winnow_fingerprints(docs.limit(1)).collect()[0]["sig"]
    b = text.winnow_fingerprints(docs.limit(1)).collect()[0]["sig"]
    assert a == b


# --- dedup ------------------------------------------------------------------

def test_exact_duplicates(spark):
    df = spark.createDataFrame(
        [(1, "aa bb"), (2, "aa bb"), (3, "cc"), (4, "aa bb")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dedup.exact_duplicates(df).collect()}
    assert rows[1]["canonical_id"] == rows[2]["canonical_id"] == rows[4]["canonical_id"] == 1
    assert rows[1]["group_size"] == 3 and rows[3]["group_size"] == 1


def _py_jaccard_pairs(docs_pd, tau, ngram=1):
    sets = {}
    for _, r in docs_pd.iterrows():
        toks = tokenize_text(r["text"])
        if ngram == 1:
            s = set(toks)
        else:
            s = {" ".join(toks[i : i + ngram]) for i in range(len(toks) - ngram + 1)}
        sets[r["doc_id"]] = s
    ids = sorted(sets)
    out = set()
    for i, a in enumerate(ids):
        for b_ in ids[i + 1:]:
            inter = len(sets[a] & sets[b_])
            if inter == 0:
                continue
            j = inter / (len(sets[a]) + len(sets[b_]) - inter)
            if j >= tau:
                out.add((a, b_))
    return out


def test_jaccard_pairs_exact(docs, docs_pd):
    sub = docs.where("doc_id < 120")
    sub_pd = docs_pd[docs_pd.doc_id < 120]
    got = {(r["id_a"], r["id_b"]) for r in dedup.jaccard_pairs(sub, tau=0.9).collect()}
    assert got == _py_jaccard_pairs(sub_pd, 0.9)


def test_minhash_lsh_recall_and_precision(docs, docs_pd):
    sub = docs.where("doc_id < 150")
    sub_pd = docs_pd[docs_pd.doc_id < 150]
    exact = _py_jaccard_pairs(sub_pd, 0.95)
    got = dedup.minhash_lsh_pairs(sub, tau=0.95, num_hashes=64, bands=16).collect()
    pairs = {(r["id_a"], r["id_b"]) for r in got}
    # precision 1.0 by construction (exact verification)
    assert pairs <= _py_jaccard_pairs(sub_pd, 0.95 - 1e-9)
    if exact:
        recall = len(pairs & exact) / len(exact)
        assert recall >= 0.8, f"minhash-lsh recall too low: {recall}"


def test_simhash_pairs(docs):
    sub = docs.where("doc_id < 150")
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash_signatures(sub).collect()}
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in dedup.simhash_pairs(sub, 3).collect()}
    # verify every reported pair + completeness vs brute-force hamming
    ids = sorted(sigs)
    expect = {}
    for i, a in enumerate(ids):
        for b_ in ids[i + 1:]:
            h = bin((sigs[a] ^ sigs[b_]) & ((1 << 64) - 1)).count("1")
            if h <= 3:
                expect[(a, b_)] = h
    assert got == expect


def test_embedding_neardup_exact_and_lsh(emb, emb_np):
    ids, X = emb_np
    S = X @ X.T
    iu = np.triu_indices(len(ids), k=1)
    expect = {
        (int(ids[i]), int(ids[j]))
        for i, j in zip(*iu)
        if S[i, j] >= 0.35
    }
    got = {(r["id_a"], r["id_b"]) for r in dedup.embedding_neardup_exact(emb, 0.35).collect()}
    assert got == expect and len(expect) > 0
    # low-τ regime -> short sketches, many tables (see docstring)
    lsh = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_neardup_lsh(emb, 0.35, planes=4, tables=16).collect()
    }
    assert lsh <= expect
    assert len(lsh) / len(expect) >= 0.7, f"lsh recall {len(lsh)/len(expect)}"


# --- similarity search ------------------------------------------------------

def test_cosine_topk_exact(emb, emb_np):
    ids, X = emb_np
    qids = [0, 5, 17]
    got = similarity.cosine_topk(emb, qids, k=10).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    for q in qids:
        sims = X[q] @ X.T
        sims[ids == q] = -np.inf
        order = np.lexsort((ids, -np.round(sims, 9)))[:10]
        expect = [int(ids[i]) for i in order]
        assert [n for _, n in sorted(by_q[q])] == expect


def test_cosine_topk_ivf_recall(emb):
    qids = [0, 5, 17, 33]
    exact = similarity.cosine_topk(emb, qids, k=10).collect()
    approx = similarity.cosine_topk_ivf(emb, qids, k=10, nlist=8, nprobe=4).collect()
    ex = {}
    ap = {}
    for r in exact:
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in approx:
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(ex[q] & ap.get(q, set())) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.5, recalls
    # full probe == exact
    full = similarity.cosine_topk_ivf(emb, qids, k=10, nlist=8, nprobe=8).collect()
    fl = {}
    for r in full:
        fl.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert fl == ex


# --- multimodal -------------------------------------------------------------

def test_multimodal_plumbing(docs, docs_pd):
    media = multimodal.attach_media(docs.limit(40))
    feats = {r["doc_id"]: r for r in multimodal.extract_features(media).collect()}
    for _, row in docs_pd.head(40).iterrows():
        b = row["text"].encode()
        g = feats[row["doc_id"]]
        assert g["n_bytes"] == len(b)
        assert g["crc32"] == zlib.crc32(b)
        assert g["head_hex"] == b[:8].hex()
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"x", "image/png", strict=True)


# --- rerank -----------------------------------------------------------------

def test_group_top_docs(spark):
    df = spark.createDataFrame(
        [(1, "g1", 2.0), (2, "g1", 3.0), (3, "g2", 1.0), (4, "g2", 1.0)],
        "doc_id long, grp string, score double",
    )
    got = {r["grp"]: r["doc_id"] for r in rerank.group_top_docs(df, "grp").collect()}
    assert got == {"g1": 2, "g2": 3}  # tie in g2 -> lowest doc_id


def test_mmr_rerank_deterministic_and_diverse(emb_np):
    ids, X = emb_np
    cand = pd.DataFrame({"doc_id": ids[:30], "score": np.linspace(2.0, 1.0, 30)})
    embs = {int(i): X[k] for k, i in enumerate(ids[:30])}
    out1 = rerank.mmr_rerank(cand, embs, k=8, lam=0.5)
    out2 = rerank.mmr_rerank(cand, embs, k=8, lam=0.5)
    assert out1["doc_id"].tolist() == out2["doc_id"].tolist()
    assert out1["doc_id"].iloc[0] == cand["doc_id"].iloc[0]  # top relevance first
    # λ=0 -> pure relevance order
    rel = rerank.mmr_rerank(cand, embs, k=8, lam=0.0)
    assert rel["doc_id"].tolist() == cand["doc_id"].head(8).tolist()


# --- event analytics + hamming space ---------------------------------------

def test_events_sessionize_properties(spark):
    from pysearch.ops.events import sessionize

    ev = spark.read.parquet(f"{SF}/events.parquet")
    sess = sessionize(ev, gap_minutes=30).toPandas()
    # sessions partition the events exactly
    assert sess["n_events"].sum() == ev.count()
    # no session spans a gap: end-start <= (n-1)*gap
    assert (
        (sess["end_epoch"] - sess["start_epoch"])
        <= (sess["n_events"] - 1).clip(lower=0) * 1800
    ).all()
    # session ids dense per user starting at 0
    for uid, grp in sess.groupby("user_id"):
        assert sorted(grp["session_id"]) == list(range(len(grp)))


def test_hamming_topk_vs_python(spark, docs):
    from pysearch.ops.similarity import hamming_topk

    sigs = dedup.simhash_signatures(docs.limit(80))
    pdf = sigs.toPandas()
    ref = {int(r["doc_id"]): int(r["simhash"]) for _, r in pdf.iterrows()}
    got = hamming_topk(sigs, [0, 3], k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["hamming"]))
    for qid in (0, 3):
        dists = sorted(
            (bin(ref[qid] ^ s).count("1"), i) for i, s in ref.items() if i != qid
        )[:5]
        assert [(h, i) for _, i, h in sorted(by_q[qid])] == [(h, i) for h, i in dists]
