"""Deterministic synthetic fixtures (FIXTURES.md): the `repo_files` corpus,
the reference query set, and the delete/update batches.

Generation is counter-based (splitmix64 over the row index), so the corpus
is a pure function of (seed, n_rows) — identical at any parallelism, and
generated DISTRIBUTED via ``spark.range(n).mapInPandas`` so fixture creation
itself scales (no driver-side materialization). Mirrors the reference's
seeded randomized test strategy (KNNJVectorTests.java:771 random-vector
cases, RecallTestsIT.java QUERY_COUNT=100 / TEST_K=100).

Corpus shape (FIXTURES.md §1): Zipf-skewed repos (repo 0 ~20% of rows),
~2k-term Zipf vocabulary with boilerplate head terms in >50% of docs
(exercises hot-term handling and block-max skipping), log-normal doc
lengths clipped to [20, 2000].
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from pysearch.corpus import CORPUS_SCHEMA

_EXTS = ["py", "java", "scala", "rs", "go", "md"]
_LANGS = {"py": "python", "java": "java", "scala": "scala", "rs": "rust", "go": "go", "md": "markdown"}

_BOILERPLATE = ["license", "import", "return", "def", "class", "public", "static"]


def _vocab(size: int = 2000) -> list[str]:
    kw = _BOILERPLATE + [
        "void", "int", "string", "self", "this", "new", "function", "value",
        "result", "error", "data", "index", "query", "merge", "segment",
        "buffer", "stream", "config", "test", "assert", "util", "parse",
    ]
    ids = [f"tok{i:04d}" for i in range(size - len(kw))]
    return kw + ids


def _zipf_cdf(n: int, s: float = 1.1) -> np.ndarray:
    w = 1.0 / np.power(np.arange(1, n + 1, dtype=np.float64), s)
    return np.cumsum(w / w.sum())


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _uniform(idx: np.ndarray, salt: int, seed: int) -> np.ndarray:
    """Deterministic U[0,1) per (idx, salt, seed) — counter-based, order-free."""
    h = _splitmix64(idx.astype(np.uint64) ^ np.uint64(seed * 0x5DEECE66D + salt * 0x2545F4914F6CDD1D))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def generate_repo_files(spark: SparkSession, n_rows: int, seed: int = 42) -> DataFrame:
    """Distributed deterministic corpus with the input_hint shape."""
    vocab = np.array(_vocab(), dtype=object)
    cdf = _zipf_cdf(len(vocab))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            i = pdf["id"].to_numpy(dtype=np.int64)
            if i.size == 0:
                yield pd.DataFrame({f.name: pd.Series(dtype="object") for f in CORPUS_SCHEMA.fields})
                continue
            u_repo = _uniform(i, 1, seed)
            u_repo2 = _uniform(i, 2, seed)
            # Zipf-skewed repos: repo 0 owns ~20% of rows
            repo_num = np.where(u_repo < 0.2, 0, 1 + (u_repo2 * 100).astype(np.int64))
            org = i % 7
            repo = np.array([f"org{o}/repo{r}" for o, r in zip(org, repo_num)], dtype=object)
            ext = np.array(_EXTS, dtype=object)[(_splitmix64(i.astype(np.uint64) ^ np.uint64(seed + 3)) % 6).astype(np.int64)]
            path = np.array(
                [f"src/d{int(d) % 50}/f{int(x)}.{e}" for d, x, e in zip(_splitmix64(i.astype(np.uint64) + np.uint64(7)) % 50, i, ext)],
                dtype=object,
            )
            lang = np.array([_LANGS[e] for e in ext], dtype=object)

            # log-normal doc lengths in [20, 2000]
            z = np.sqrt(-2 * np.log(np.clip(_uniform(i, 4, seed), 1e-12, 1))) * np.cos(
                2 * np.pi * _uniform(i, 5, seed)
            )
            dl = np.clip(np.exp(4.5 + 0.8 * z), 20, 2000).astype(np.int64)

            # token streams: counter-based per (doc, position)
            doc_rep = np.repeat(np.arange(i.size), dl)
            pos = np.arange(doc_rep.size) - np.repeat(
                np.concatenate(([0], np.cumsum(dl)[:-1])), dl
            )
            keys = (i[doc_rep].astype(np.uint64) << np.uint64(21)) | pos.astype(np.uint64)
            u_tok = _uniform(keys.astype(np.int64), 6, seed)
            tok_idx = np.searchsorted(cdf, u_tok)
            toks = vocab[np.minimum(tok_idx, len(vocab) - 1)]
            content = (
                pd.Series(toks).groupby(doc_rep).agg(" ".join).to_numpy(dtype=object)
            )

            commit = np.array(
                [hashlib.md5(f"{seed}:{r}:{p}".encode()).hexdigest() for r, p in zip(repo, path)],
                dtype=object,
            )
            yield pd.DataFrame(
                {"repo": repo, "path": path, "commit": commit, "lang": lang, "content": content}
            )

    df = spark.range(n_rows).mapInPandas(gen, schema=CORPUS_SCHEMA)
    # PK uniqueness: hash-derived paths can collide; keep the first per PK
    return df.dropDuplicates(["repo", "path"])


def generate_queries(n: int = 100, seed: int = 42) -> list[dict]:
    """The reference query set (FIXTURES.md §2): 40% single-term, 40% 2-3
    terms mixing hot+rare, 20% 4-5 terms incl. one OOV term; k=10 for 80%,
    k=100 for 20%; 30% carry a filter predicate."""
    vocab = _vocab()
    rng = np.random.default_rng(seed)
    hot, rare = vocab[:20], vocab[200:]
    queries = []
    for qid in range(n):
        r = rng.random()
        if r < 0.4:
            terms = [vocab[int(rng.integers(0, 300))]]
        elif r < 0.8:
            terms = [hot[int(rng.integers(0, len(hot)))]] + [
                rare[int(rng.integers(0, len(rare)))]
                for _ in range(int(rng.integers(1, 3)))
            ]
        else:
            terms = [vocab[int(rng.integers(0, 500))] for _ in range(int(rng.integers(3, 5)))]
            terms.append(f"zzoutofvocab{qid}")
        k = 100 if rng.random() < 0.2 else 10
        filt = None
        if rng.random() < 0.3:
            filt = rng.choice(
                [
                    "lang = 'python'",
                    "repo = 'org0/repo0'",
                    "lang IN ('java', 'scala')",
                    "path LIKE 'src/d1/%'",
                ]
            )
        queries.append(
            {"query_id": qid, "query_text": " ".join(terms), "k": int(k), "filter_expr": filt}
        )
    return queries


def generate_updates(corpus: DataFrame, n_batches: int = 4, seed: int = 42) -> list[pd.DataFrame]:
    """Delete/update batches (FIXTURES.md §3): per batch ~5% deletes and
    ~5% updates over the current corpus keys."""
    keys = corpus.select("repo", "path").toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    rng = np.random.default_rng(seed + 99)
    batches = []
    for b in range(n_batches):
        m = len(keys)
        sel = rng.random(m)
        ops = np.where(sel < 0.05, "delete", np.where(sel < 0.10, "update", None))
        idx = np.flatnonzero(ops != None)  # noqa: E711
        pdf = keys.iloc[idx].copy()
        pdf["op"] = ops[idx]
        pdf["batch"] = b
        pdf["content"] = [
            f"updated content batch {b} row {j} merge query segment data"
            if o == "update"
            else None
            for j, o in zip(idx, ops[idx])
        ]
        batches.append(pdf.reset_index(drop=True))
    return batches
