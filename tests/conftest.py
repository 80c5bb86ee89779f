"""Shared fixtures: one SparkSession per test run, one synthetic corpus.

Mirrors the reference's test strategy (SURVEY.md §5): deterministic
fixtures in, golden/oracle-checked outputs out; the numpy BM25 oracle
plays the role the mocked OpenSearch plays in the reference tests.
"""

from __future__ import annotations

import os

import pytest

from prow_jobs_scraper_spark.session import get_spark
from prow_jobs_scraper_spark.synth import synth_transcripts_pandas

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pjs-tests", cores=4, shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def corpus_pdf():
    return synth_transcripts_pandas(n_turns=2000, seed=42)


@pytest.fixture(scope="session")
def transcripts(spark, corpus_pdf):
    df = spark.createDataFrame(corpus_pdf)
    df = df.withColumn("ts", df["ts"].cast("timestamp"))
    return df.cache()
