"""Sources (junit XML UDTF-shaped parse, schema-enforced JSON) and the
Structured Streaming incremental ingest."""

from __future__ import annotations

import json
import os

import pytest

from prow_jobs_scraper_spark.sources import readers as R
from prow_jobs_scraper_spark.streaming.incremental import incremental_ingest

JUNIT = """<?xml version="1.0"?>
<testsuites>
 <testsuite name="assisted">
  <testcase name="step-ok" time="12.5"/>
  <testcase name="step-bad" time="oops">
    <failure>boom\nmultiline details</failure>
  </testcase>
 </testsuite>
</testsuites>"""


def test_parse_junit_xml(spark):
    df = spark.createDataFrame([(bytearray(JUNIT.encode()),)], "content binary")
    rows = {r["step_name"]: r for r in R.parse_junit_xml(df).collect()}
    assert rows["step-ok"]["step_state"] == "success"
    assert rows["step-ok"]["step_duration"] == 12.5
    # malformed time falls back to 0.0 (reference step.py:36-43)
    assert rows["step-bad"]["step_duration"] == 0.0
    assert rows["step-bad"]["step_state"] == "failure"
    assert "multiline" in rows["step-bad"]["step_details"]


def test_read_job_events_json(spark, tmp_path):
    p = tmp_path / "jobs.json"
    rec = {"build_id": "b1", "name": "j", "state": "success",
           "type": "periodic", "duration": 10,
           "refs": {"org": "openshift", "repo": "assisted", "pull": 7}}
    p.write_text(json.dumps(rec) + "\n")
    df = R.read_job_events_json(spark, str(p))
    row = df.collect()[0]
    assert row["refs"]["org"] == "openshift"
    assert row["duration"] == 10
    assert df.schema["start_time"].dataType.typeName() == "timestamp"


def test_incremental_ingest_exactly_once(spark, transcripts, tmp_path):
    src = str(tmp_path / "src")
    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")
    transcripts.limit(200).write.parquet(src)

    q = incremental_ingest(spark, src, staging, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(staging).count()
    assert n1 == 200

    # second tick with no new files: nothing new ingested
    q2 = incremental_ingest(spark, src, staging, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(staging).count() == n1

    # new file arrives -> only its rows are appended
    transcripts.limit(250).write.mode("overwrite").parquet(src + "2")
    spark.read.parquet(src + "2").write.mode("append").parquet(src)
    q3 = incremental_ingest(spark, src, staging, ckpt)
    q3.awaitTermination(120)
    total = spark.read.parquet(staging).count()
    # 200 original + 250 new-file rows, minus the dropDuplicates overlap
    dedup = spark.read.parquet(staging).dropDuplicates(
        ["conv_id", "turn_idx"]).count()
    assert total >= 250 and dedup <= 250


def test_windowed_turn_counts_matches_batch(spark, transcripts, tmp_path):
    from pyspark.sql import functions as F

    from prow_jobs_scraper_spark.streaming.incremental import (
        windowed_turn_counts,
    )

    src = str(tmp_path / "wsrc")
    transcripts.write.parquet(src)

    q = (
        windowed_turn_counts(spark, src, window="1 week")
        .writeStream.format("memory").queryName("wtc")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["window_start"], r["role"]): r["n_turns"]
           for r in spark.sql("SELECT * FROM wtc").collect()}

    want = {
        (r["ws"], r["role"]): r["n"]
        for r in spark.read.parquet(src)
        .groupBy(F.window("ts", "1 week").alias("w"), "role")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "role", "n").collect()
    }
    assert got == want and len(got) > 0


def test_ingest_build_search_pipeline(spark, transcripts, tmp_path):
    """Full-pipeline: stream-ingest into staging, build the index from
    the staged table, and the search results must be rank-identical to
    the brute-force oracle over exactly the staged rows."""
    from prow_jobs_scraper_spark.index.build import (
        BuildConfig,
        build_index,
        with_doc_ids,
    )
    from prow_jobs_scraper_spark.oracle import bm25_oracle_topk
    from prow_jobs_scraper_spark.search.compressed import search_topk

    src = str(tmp_path / "psrc")
    staging = str(tmp_path / "pstaging")
    ckpt = str(tmp_path / "pckpt")
    transcripts.write.parquet(src)
    q = incremental_ingest(spark, src, staging, ckpt)
    q.awaitTermination(120)

    staged = spark.read.parquet(staging).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts")
    idx = str(tmp_path / "pidx")
    build_index(spark, staged, idx, BuildConfig(n_ranges=4, n_buckets=2))

    docs = with_doc_ids(staged).select("doc_id", "text").toPandas()
    got = search_topk(spark, idx, "spark agent", 10).toPandas()
    want = bm25_oracle_topk(docs, "spark agent", 10)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
