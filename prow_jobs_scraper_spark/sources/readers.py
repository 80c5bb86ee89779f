"""Sources/sinks (SURVEY.md §2.1): the reference's scans re-expressed as
Spark readers over explicit schemas.

The reference fetches row-at-a-time over HTTP/GCS/REST (prowjob.py:160-168,
step.py:72-82, equinix_usages.py:92-106) and validates with pydantic; here
every source is a schema-enforced DataFrame read — schema validation is
``spark.read.schema(...)`` (S1), artifact blobs are ``binaryFile`` reads
(S2/S3), and junit XML becomes rows via an Arrow-batched mapInPandas
parser + explode (S10, the UDTF-shaped operator)."""

from __future__ import annotations

import xml.etree.ElementTree as ET
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# S1 — the ProwJob JSON scan's fixed schema core (flattened JobDetails,
# reference src/prowjobsscraper/event.py:62-75)
JOB_EVENT_SCHEMA = T.StructType([
    T.StructField("build_id", T.StringType()),
    T.StructField("name", T.StringType(), False),
    T.StructField("state", T.StringType()),
    T.StructField("type", T.StringType(), False),
    T.StructField("start_time", T.TimestampType()),
    T.StructField("duration", T.LongType(), False),
    T.StructField("url", T.StringType()),
    T.StructField("variant", T.StringType()),
    T.StructField("context", T.StringType()),
    T.StructField("cloud", T.StringType()),
    T.StructField("cloud_cluster_profile", T.StringType()),
    T.StructField("refs", T.StructType([
        T.StructField("org", T.StringType()),
        T.StructField("repo", T.StringType()),
        T.StructField("base_ref", T.StringType()),
        T.StructField("pull", T.LongType()),
    ])),
])


def read_job_events_json(spark: SparkSession, path: str) -> DataFrame:
    """S1: schema-enforced JSON scan (no inference — the pydantic-parse
    equivalent, reference prowjob.py:160-168)."""
    return spark.read.schema(JOB_EVENT_SCHEMA).json(path)


def read_artifacts_binary(spark: SparkSession, path: str) -> DataFrame:
    """S2/S3: blob fetch as a distributed binaryFile scan (replaces the
    reference's N sequential GCS GETs, step.py:72-82)."""
    return spark.read.format("binaryFile").load(path)


JUNIT_STEP_SCHEMA = (
    "suite string, step_name string, step_state string, "
    "step_duration double, step_details string"
)


def parse_junit_xml(artifacts: DataFrame, xml_col: str = "content") -> DataFrame:
    """S10: junit XML → one row per <testcase> (reference
    step.py:26-50,84-91). 1 blob → N rows via mapInPandas; malformed
    ``time`` falls back to 0.0 like the reference (step.py:36-43)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for blob in pdf[xml_col]:
                text = blob.decode("utf-8", "replace") if isinstance(
                    blob, (bytes, bytearray)) else str(blob)
                try:
                    root = ET.fromstring(text)
                except ET.ParseError:
                    continue
                suites = root.iter("testsuite") if root.tag != "testsuite" \
                    else [root]
                for suite in suites:
                    sname = suite.get("name", "")
                    for case in suite.iter("testcase"):
                        try:
                            dur = float(case.get("time", "0"))
                        except ValueError:
                            dur = 0.0
                        failure = case.find("failure")
                        rows.append((
                            sname,
                            case.get("name", ""),
                            "failure" if failure is not None else "success",
                            dur,
                            failure.text if failure is not None else None,
                        ))
            yield pd.DataFrame(rows, columns=[
                "suite", "step_name", "step_state", "step_duration",
                "step_details"])

    return artifacts.mapInPandas(op, schema=JUNIT_STEP_SCHEMA)


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      mode: str = "overwrite") -> None:
    """S7/S9-shaped sink: partition-granular idempotent write (dynamic
    partition overwrite = the upsert-by-deterministic-key analog of
    event.py:204-214)."""
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def delete_where(spark: SparkSession, path: str, condition: str) -> None:
    """S8: bulk delete as an anti-filter rewrite of the affected
    partitions (row-level delete stand-in; Iceberg would do this as
    DELETE FROM with positional deletes)."""
    df = spark.read.parquet(path)
    df.where(f"NOT ({condition})").write.mode("overwrite").parquet(path + ".new")
    import shutil  # noqa: PLC0415

    shutil.rmtree(path)
    shutil.move(path + ".new", path)
