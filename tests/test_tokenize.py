"""Tokenizer lockstep tests: the Catalyst, pandas, and single-string
tokenizers must agree on every edge case (the engine's analyzer is ONE
definition — mirrors the reference's implicit ES standard analyzer,
SURVEY.md §2.8)."""

import pandas as pd
import pytest

from prow_jobs_scraper_spark.functions.tokenize import (
    tokenize_column,
    tokenize_pandas,
    tokenize_text,
)

CASES = [
    ("hello world", ["hello", "world"]),
    ("MiXeD CaSe", ["mixed", "case"]),
    ("", []),
    (None, []),
    ("!!! ??? ...", []),
    ("a-b c_d", ["a", "b", "c_d"]),
    ("123 0xdeadbeef", ["123", "0xdeadbeef"]),
    ("dup dup dup", ["dup", "dup", "dup"]),
    ("baremetalds-packet-setup", ["baremetalds", "packet", "setup"]),
    ("  \t\n ", []),
    ("tool_call(arg=1)", ["tool_call", "arg", "1"]),
]


@pytest.mark.parametrize("text,expected", CASES)
def test_tokenize_text(text, expected):
    assert tokenize_text(text) == expected


def test_tokenize_pandas_matches():
    s = pd.Series([c[0] for c in CASES], dtype=object)
    got = tokenize_pandas(s).tolist()
    assert got == [c[1] for c in CASES]


def test_tokenize_column_matches(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(CASES)], "i int, text string"
    )
    rows = df.select("i", tokenize_column(F.col("text")).alias("toks")) \
             .orderBy("i").collect()
    assert [r["toks"] for r in rows] == [c[1] for c in CASES]
