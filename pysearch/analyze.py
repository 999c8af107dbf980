"""Code-aware tokenization as a vectorized pandas/Arrow UDF.

The analog of the reference's per-field analysis step: the mapping declares
how a field is interpreted (KNNVectorFieldMapper.java:99-177 parses
dimension/space for knn_vector fields); here the "analyzer" turns ``content``
into a term array. Two analyzers:

* ``tokenize``      — lowercase alphanumeric runs: ``[a-z0-9]+``. This is the
  canonical analyzer and is deliberately expressible in ANSI SQL
  (``regexp_extract_all(lower(x), '[a-z0-9]+')``) so the DuckDB oracle can
  reproduce it bit-for-bit.
* ``tokenize_code`` — additionally splits identifiers on camelCase /
  snake_case boundaries before lowercasing (for source code), keeping the
  original subword split behavior deterministic.

Both are pure, deterministic, and run on Arrow batches — no per-row Python
in the Spark plan (input_hint requirement).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

TOKEN_RE = re.compile(r"[a-z0-9]+")
_CAMEL_RE = re.compile(r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])")


def tokenize_text(text: str) -> list[str]:
    """Canonical analyzer (plain-Python form, used by tests/oracle)."""
    if text is None:
        return []
    return TOKEN_RE.findall(text.lower())


def tokenize_code_text(text: str) -> list[str]:
    if text is None:
        return []
    return TOKEN_RE.findall(_CAMEL_RE.sub(" ", text).lower())


def _series_tokenize(s: pd.Series, code_aware: bool) -> pd.Series:
    fn = tokenize_code_text if code_aware else tokenize_text
    return s.map(fn)


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_udf(s: pd.Series) -> pd.Series:
    return _series_tokenize(s, code_aware=False)


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_code_udf(s: pd.Series) -> pd.Series:
    return _series_tokenize(s, code_aware=True)


def with_tokens(df, content_col: str = "content", code_aware: bool = False):
    """Add ``tokens`` (array<string>) and ``dl`` (doc length) columns."""
    udf = tokenize_code_udf if code_aware else tokenize_udf
    return df.withColumn("tokens", udf(F.col(content_col))).withColumn(
        "dl", F.size("tokens")
    )
