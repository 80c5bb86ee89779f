"""Text analysis: the engine's single tokenizer, used everywhere.

The reference's ``text`` fields are analyzed by OpenSearch's standard
analyzer — Unicode word segmentation + lowercase — and ``match`` queries
analyze the query string identically (reference src/jobsautoreport/
query.py:55-60; no custom analyzer in indices/*.json — SURVEY.md §2.8).

Our equivalent: lowercase + ``[a-z0-9_]+`` extraction, implemented three
ways that MUST stay in lockstep (tests enforce it):

- :func:`tokenize_column` — pure Catalyst expression (JVM, codegen'd); the
  hot path for index builds.
- :func:`tokenize_pandas` — vectorized pandas (Arrow batches); used inside
  pandas UDFs and by the brute-force oracle.
- :func:`tokenize_text`  — single string; tests/query parsing.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

TOKEN_PATTERN = r"[a-z0-9_]+"
_TOKEN_RE = re.compile(TOKEN_PATTERN)


def tokenize_text(text: str | None) -> list[str]:
    """Tokenize one string (None-safe)."""
    if text is None:
        return []
    return _TOKEN_RE.findall(text.lower())


def tokenize_pandas(texts: pd.Series) -> pd.Series:
    """Vectorized tokenize: Series[str] -> Series[list[str]] (no per-row Python)."""
    return texts.fillna("").str.lower().str.findall(TOKEN_PATTERN)


def tokenize_column(col: Column) -> Column:
    """Catalyst-native tokenize: string column -> array<string> of terms.

    ``regexp_extract_all`` runs JVM-side inside whole-stage codegen — this
    is the preferred hot path (UDFs are the slow path). Returns [] for
    NULL/empty input, matching :func:`tokenize_pandas`.
    """
    return F.coalesce(
        F.regexp_extract_all(F.lower(col), F.lit(TOKEN_PATTERN), 0),
        F.array().cast("array<string>"),
    )
