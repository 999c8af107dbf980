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


# BPE-ish pre-tokenizer classes (GPT-style: letter runs, digit runs,
# punctuation runs), restricted to a regex subset with IDENTICAL semantics in
# Java regex (Spark) and RE2 (DuckDB): no lookarounds, no unicode classes
BPE_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


def bpe_token_stats(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting for LLM-training budgeting: whitespace words plus a
    BPE-style pre-tokenization (letter/digit/punct runs — the unit a BPE
    tokenizer would split further). Pure column expressions, codegen'd."""
    ws = F.split(F.trim(F.col(text)), r"\s+")
    bpe = F.regexp_extract_all(F.col(text), F.lit(BPE_PATTERN), 0)
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.when(F.length(F.trim(F.col(text))) == 0, F.lit(0))
        .otherwise(F.size(ws))
        .cast("long")
        .alias("ws_tokens"),
        F.size(bpe).cast("long").alias("bpe_tokens"),
        F.size(F.array_distinct(bpe)).cast("long").alias("bpe_unique"),
        # chars-per-BPE-token: the compression-rate proxy used for budgeting
        F.round(
            F.octet_length(F.col(text))
            / F.greatest(F.size(bpe), F.lit(1)).cast("double"),
            4,
        ).alias("chars_per_token"),
    )


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

def winnow_fingerprints(
    df: DataFrame, text: str = "text", id_col: str = "doc_id", k: int = 4, window: int = 5
) -> DataFrame:
    """Winnowing (Schleimer et al., SIGMOD'03): per doc, the set of minimal
    k-gram rolling hashes over sliding windows — robust near-dup signatures.

    Fully vectorized across the whole Arrow batch (no per-doc Python loop):
    tokenization runs JVM-side; the kernel flattens every doc's tokens into
    ONE array with offsets, hashes distinct tokens once (SQL-replicable poly
    hash), computes all k-gram rolling hashes in k vector ops, takes window
    minima with a single sliding_window_view over the concatenated gram array
    (windows never cross doc boundaries because only in-doc window positions
    are selected), and splits per-doc distinct sorted values at the end.

    The hash and fold are reproducible in DuckDB SQL (see
    pysearch.ops.hashing), so the correctness gate verifies the exploded
    (doc_id, hash) fingerprint rows exactly.
    """
    from pysearch.ops.hashing import POLY_MOD, POLY_B1, poly_hash

    M = np.uint64(POLY_MOD)
    B = np.uint64(POLY_B1)
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("sig", T.ArrayType(T.LongType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if not n:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            arrs = pdf["toks"].to_numpy()
            lens = pd.Series(arrs).map(len).to_numpy(dtype=np.int64)
            total = int(lens.sum())
            if total == 0:
                yield pd.DataFrame({"doc_id": ids, "sig": [[] for _ in range(n)]})
                continue
            flat = np.concatenate([np.asarray(x, dtype=object) for x in arrs if len(x)])
            uniq, inv = np.unique(flat, return_inverse=True)
            th = poly_hash(uniq)[inv]  # (total,) uint64 < 2^50

            # all k-gram rolling hashes of the concatenated stream (k vector
            # ops), then keep only grams fully inside one doc
            tok_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            gram_counts = np.maximum(lens - k + 1, 0)
            if total >= k:
                acc = th[: total - k + 1].copy()
                for j in range(1, k):
                    acc = (acc * B + th[j : total - k + 1 + j]) % M
            else:
                acc = np.empty(0, dtype=np.uint64)
            # valid gram positions: tok_starts[d] .. tok_starts[d]+gram_counts[d]-1
            if acc.size:
                p = np.arange(acc.size)
                di = np.searchsorted(tok_starts, p, side="right") - 1
                g = acc[(p - tok_starts[di]) < gram_counts[di]]
            else:
                g = np.empty(0, dtype=np.uint64)
            gdocs = np.repeat(np.arange(n), gram_counts)
            gstarts = np.concatenate(([0], np.cumsum(gram_counts)[:-1]))

            # window minima: long docs (>= window grams) via ONE global
            # sliding-window pass; short docs via one reduceat (their single
            # window is the min over all their grams)
            out_docs_parts, out_vals_parts = [], []
            long_nw = np.maximum(gram_counts - window + 1, 0)
            if g.size >= window and long_nw.any():
                sw = np.lib.stride_tricks.sliding_window_view(g, window).min(axis=1)
                # per long doc d, window positions gstarts[d] .. gstarts[d]+nw-1
                sel_docs = np.repeat(np.arange(n), long_nw)
                intra = np.arange(int(long_nw.sum())) - np.repeat(
                    np.concatenate(([0], np.cumsum(long_nw)[:-1])), long_nw
                )
                pos = np.repeat(gstarts, long_nw) + intra
                out_docs_parts.append(sel_docs)
                out_vals_parts.append(sw[pos])
            short = (gram_counts > 0) & (gram_counts < window)
            if short.any():
                mins = np.minimum.reduceat(g, gstarts[gram_counts > 0])
                has = np.flatnonzero(gram_counts > 0)
                m = short[has]
                out_docs_parts.append(has[m])
                out_vals_parts.append(mins[m])

            if out_docs_parts:
                od = np.concatenate(out_docs_parts)
                ov = np.concatenate(out_vals_parts).astype(np.int64)
                order = np.lexsort((ov, od))
                od, ov = od[order], ov[order]
                first = np.concatenate(
                    ([True], (od[1:] != od[:-1]) | (ov[1:] != ov[:-1]))
                )
                od, ov = od[first], ov[first]
                counts = np.bincount(od, minlength=n)
                sigs = [s.tolist() for s in np.split(ov, np.cumsum(counts)[:-1])]
            else:
                sigs = [[] for _ in range(n)]
            yield pd.DataFrame({"doc_id": ids, "sig": sigs})

    toks = df.select(
        F.col(id_col).cast("long").alias(id_col), tokens_col(F.col(text)).alias("toks")
    )
    return toks.mapInPandas(run, schema=schema)
