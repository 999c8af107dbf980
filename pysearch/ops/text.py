"""Text analysis operators for training-data pipelines.

All of these are deliberately expressible BOTH as Spark built-in column
expressions (JVM-side, whole-stage codegen — no Python in the plan) and as
ANSI SQL, so the DuckDB oracle can verify them bit-for-bit. The heavier
winnowing fingerprint is the numpy/Arrow exception and is verified in pytest
against a pure-Python reference instead.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKEN_PATTERN = "[a-z0-9]+"

# tiny per-language marker-word sets for the n-gram/stopword language-ID
# heuristic (deterministic; ties broken by language name ascending)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "fast", "small", "big", "slow"],
    "db": ["table", "row", "query", "join", "index", "hash"],
    "st": ["stream", "batch", "window", "spark", "merge"],
}

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def tokens_col(text_col):
    """JVM-side tokenizer identical to pysearch.analyze.tokenize_text."""
    return F.regexp_extract_all(F.lower(text_col), F.lit(TOKEN_PATTERN), 0)


def token_stats(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc token counting: total tokens, distinct tokens, token chars."""
    toks = tokens_col(F.col(text))
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("token_chars"),
    )


def quality_score(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic document quality: length saturation, lexical diversity,
    stopword plausibility. Deterministic scalar expression (codegen'd)."""
    toks = tokens_col(F.col(text))
    n = F.size(toks).cast("double")
    uniq = F.size(F.array_distinct(toks)).cast("double")
    stop = F.size(
        F.array_intersect(F.array_distinct(toks), F.array(*[F.lit(s) for s in STOPWORDS]))
    ).cast("double")
    score = (
        F.lit(0.4) * F.least(n / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * F.when(n > 0, uniq / n).otherwise(F.lit(0.0))
        + F.lit(0.3) * F.least(stop / F.lit(4.0), F.lit(1.0))
    )
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(score, 6).alias("quality"),
    )


def language_id(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Marker-word language-ID heuristic: count distinct marker hits per
    candidate label, take the argmax (ties -> lexicographically first)."""
    toks = F.array_distinct(tokens_col(F.col(text)))
    hits = {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
        ).cast("long")
        for lang, words in LANG_MARKERS.items()
    }
    out = df.select(F.col(id_col).cast("long").alias("doc_id"), *[
        hits[lang].alias(f"hits_{lang}") for lang in sorted(LANG_MARKERS)
    ])
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"hits_{la}") for la in langs])
    guess = F.when(best == 0, F.lit("unknown"))
    for la in langs:  # first max wins (ascending label order)
        guess = guess.when(F.col(f"hits_{la}") == best, F.lit(la))
    return out.withColumn("lang_guess", guess)


def fingerprint(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Normalized document fingerprint: md5 over the canonical token stream
    (whitespace/punct/case-insensitive duplicate detection key)."""
    toks = tokens_col(F.col(text))
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.md5(F.array_join(toks, " ")).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# winnowing fingerprint (rolling hash) — numpy/Arrow path, pytest-verified
# ---------------------------------------------------------------------------

_B = np.uint64(1_000_003)
_MASK = np.uint64((1 << 61) - 1)


def _rolling_hashes(token_hashes: np.ndarray, k: int) -> np.ndarray:
    """Polynomial rolling hash of every k-gram of the token-hash sequence."""
    n = token_hashes.size
    if n < k:
        return np.empty(0, dtype=np.uint64)
    h = np.zeros(n - k + 1, dtype=np.uint64)
    acc = np.zeros_like(token_hashes)
    acc[:] = token_hashes
    out = token_hashes[: n - k + 1].copy()
    for i in range(1, k):
        out = (out * _B + token_hashes[i : n - k + 1 + i]) & _MASK
    h[:] = out
    return h


def winnow_fingerprints(
    df: DataFrame, text: str = "text", id_col: str = "doc_id", k: int = 4, window: int = 5
) -> DataFrame:
    """Winnowing (Schleimer et al., SIGMOD'03): per doc, the set of minimal
    k-gram rolling hashes over sliding windows — robust near-dup signatures.
    Vectorized numpy inside mapInPandas."""
    import hashlib

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("sig", T.ArrayType(T.LongType())),
        ]
    )
    from pysearch.analyze import tokenize_text

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def tok_hash(tokens: list[str]) -> np.ndarray:
            return np.array(
                [
                    int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
                    & ((1 << 61) - 1)
                    for t in tokens
                ],
                dtype=np.uint64,
            )

        for pdf in batches:
            sigs, ids = [], []
            for did, txt in zip(pdf[id_col], pdf[text]):
                hs = _rolling_hashes(tok_hash(tokenize_text(txt)), k)
                if hs.size == 0:
                    sigs.append([])
                else:
                    nw = max(hs.size - window + 1, 1)
                    w = np.lib.stride_tricks.sliding_window_view(
                        hs, min(window, hs.size)
                    )[:nw]
                    sigs.append(sorted(set(int(x) for x in w.min(axis=1))))
                ids.append(int(did))
            yield pd.DataFrame({"doc_id": ids, "sig": sigs})

    return df.select(id_col, text).mapInPandas(run, schema=schema)
