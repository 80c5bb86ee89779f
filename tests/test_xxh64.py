"""Bit-identity of the client-side XXH64 with Spark's xxhash64 — the
query path maps query terms to term_id keys without a cluster round
trip, so this identity is load-bearing for conjunctive correctness."""

from __future__ import annotations

from pyspark.sql import functions as F

from prow_jobs_scraper_spark.functions.xxh64 import term_id_py

CASES = [
    "spark", "the_hot_term", "", "a", "ab", "abc", "abcd", "abcde",
    "12345678", "123456789012345", "1234567890123456",
    "a" * 31, "b" * 32, "c" * 33, "d" * 100, "über", "emoji_🙂",
    "w04999", "x" * 7, "y" * 24, "z" * 25, "under_scored_term",
]


def test_xxh64_matches_spark(spark):
    rows = spark.createDataFrame([(c,) for c in CASES], "s string").select(
        "s", F.xxhash64("s").alias("h")).collect()
    for r in rows:
        assert term_id_py(r["s"]) == r["h"], r["s"]


def test_pmod_bucketing_matches_spark(spark):
    from prow_jobs_scraper_spark.index.build import term_bucket_expr

    rows = spark.createDataFrame([(c,) for c in CASES], "s string").select(
        "s", term_bucket_expr(F.col("s"), 16).alias("tb")).collect()
    for r in rows:
        assert term_id_py(r["s"]) % 16 == r["tb"], r["s"]
