"""Vectorized, SQL-replicable string hashing for the sketch operators.

The sketch kernels (MinHash, SimHash, winnowing) need a 50-64-bit hash per
token/shingle that is

* fully vectorized in numpy — NO per-element Python loop inside the Arrow
  kernels (the input_hint forbids per-row Python; the round-1 md5 list-comp
  was the single biggest measured cost in BENCH_r01), and
* reproducible in ANSI SQL so the DuckDB correctness oracle can compute the
  SAME signatures (``list_reduce`` over character codes).

The hash is a polynomial rolling hash over the first ``HASH_PREFIX``
characters, seeded with the full string length:

    h = length(s)
    for c in s[:HASH_PREFIX]: h = (h * B + ord(c)) % POLY_MOD

``POLY_MOD`` = 2^50 - 27 (prime) keeps every intermediate product
(h * B + 127 < 2^56) inside both uint64 and SQL BIGINT range — DuckDB has no
wrapping arithmetic, so a mod-2^64 hash could not be verified there. The
prefix cap bounds the vectorized char loop: one masked numpy pass per char
position, so cost is O(total_chars) independent of row count — a degenerate
1 MB single token costs 64 iterations, not 10^6.

Inputs are assumed ASCII: every caller hashes analyzer output
(``[a-z0-9]+`` tokens or space-joined shingles), where char length ==
byte length and ``ord(c)`` == DuckDB ``ascii(c)``.

The 63-bit variant (`poly_hash63`) combines two independent bases so all 63
bit positions are usable for SimHash sign-sketching (a single 50-bit hash
would leave the top bits constant, collapsing SimHash bands).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

POLY_MOD = (1 << 50) - 27  # prime, < 2^50
POLY_B1 = 31
POLY_B2 = 131
HASH_PREFIX = 64  # chars hashed (the full length is folded in as the seed)


def poly_hash(values, base: int = POLY_B1) -> np.ndarray:
    """Vectorized polynomial hash of an array/Series of ASCII strings.

    Returns uint64 values in [0, POLY_MOD). Equivalent SQL (DuckDB):
    ``list_reduce(list_prepend(length(s)::BIGINT,
        list_transform(string_split(substr(s,1,64), ''), c -> ascii(c)::BIGINT)),
        (a, x) -> (a * B + x) % 1125899906842597)``
    (see :func:`poly_hash_sql`).
    """
    s = pd.Series(values, dtype=object)
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    full_len = s.str.len().to_numpy(dtype=np.int64)
    head = s.str.slice(0, HASH_PREFIX)
    lens = np.minimum(full_len, HASH_PREFIX)
    joined = "".join(head.tolist())
    buf = np.frombuffer(joined.encode("ascii"), dtype=np.uint8).astype(np.uint64)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    M = np.uint64(POLY_MOD)
    B = np.uint64(base)
    h = (full_len.astype(np.uint64)) % M
    max_len = int(lens.max()) if n else 0
    for j in range(max_len):
        m = lens > j
        h[m] = (h[m] * B + buf[starts[m] + j]) % M
    return h


def poly_hash63(values) -> np.ndarray:
    """63-bit combined hash: low 32 bits from base B1, next 31 from base B2.
    Always non-negative as int64. SQL equivalent: see :func:`poly_hash63_sql`.
    """
    h1 = poly_hash(values, POLY_B1)
    h2 = poly_hash(values, POLY_B2)
    return ((h2 & np.uint64(0x7FFFFFFF)) << np.uint64(32)) | (
        h1 & np.uint64(0xFFFFFFFF)
    )


def poly_hash_sql(expr: str, base: int = POLY_B1) -> str:
    """DuckDB SQL expression computing poly_hash(expr, base) (BIGINT)."""
    return (
        f"list_reduce(list_prepend(length({expr})::BIGINT, "
        f"list_transform(string_split(substr({expr}, 1, {HASH_PREFIX}), ''), "
        f"c -> ascii(c)::BIGINT)), (a, x) -> (a * {base} + x) % {POLY_MOD})"
    )


def poly_hash63_sql(expr: str) -> str:
    """DuckDB SQL expression computing poly_hash63(expr) (BIGINT, >= 0)."""
    h1 = poly_hash_sql(expr, POLY_B1)
    h2 = poly_hash_sql(expr, POLY_B2)
    return f"(({h2}) % 2147483648) * 4294967296 + (({h1}) % 4294967296)"
