"""Analytics parity goldens: fixtures and expected values ported from the
reference's report tests (tests/jobsautoreport/test_report.py:25-93 inputs,
:394-555 expected — e.g. the exact flakiness 0.9090909090909091 for a
success/success/failure sequence)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from prow_jobs_scraper_spark.operators import analytics as A


def _ts(h):
    return dt.datetime(2025, 1, 1, h, 0, 0)


@pytest.fixture(scope="module")
def jobs(spark):
    rows = [
        # build_id, name, state, type, start_time, duration
        ("b1", "job-a", "success", "periodic", _ts(1), 100),
        ("b2", "job-a", "success", "periodic", _ts(2), 110),
        ("b3", "job-a", "failure", "periodic", _ts(3), 120),
        ("b4", "job-b", "failure", "presubmit", _ts(1), 50),
        ("b5", "job-b", "failure", "presubmit", _ts(2), 60),
        ("b6", "job-c", "success", "postsubmit", _ts(1), 70),
        ("b7", "job-d", "success", "periodic", None, 10),
    ]
    return spark.createDataFrame(
        rows,
        "build_id string, name string, state string, type string, "
        "start_time timestamp, duration long",
    )


@pytest.fixture(scope="module")
def usages(spark):
    rows = [
        ("b1", "m1", "c3.small", 1.0, 2.0),
        ("b1", "m2", "c3.small", 1.0, 3.0),
        ("b4", "m3", "m3.large", 2.0, 7.5),
        ("zz", "m4", "c3.small", 1.0, 9.0),  # usage with no matching job
    ]
    return spark.createDataFrame(
        rows, "job_build_id string, name string, plan string, "
              "price double, total double")


def test_state_counts_and_rates(jobs):
    got = {r["name"]: r for r in A.job_metrics(jobs).collect()}
    assert got["job-a"]["successes"] == 2 and got["job-a"]["failures"] == 1
    assert got["job-a"]["failure_rate"] == pytest.approx(100.0 / 3)
    assert got["job-a"]["success_rate"] == pytest.approx(200.0 / 3)
    assert got["job-b"]["failure_rate"] == pytest.approx(100.0)
    assert got["job-c"]["failures"] == 0


def test_top_failing(jobs):
    rows = A.top_failing(jobs, 10).collect()
    assert [r["name"] for r in rows] == ["job-b", "job-a"]


def test_top_triggered(jobs):
    rows = A.top_triggered(jobs, 2).collect()
    assert [(r["name"], r["total"]) for r in rows] == [("job-a", 3), ("job-b", 2)]


def test_flakiness_golden(spark):
    """The reference's exact golden: 3 runs success,success,failure →
    transitions [0,1], weights linspace(0.1,1,2)=[0.1,1.0] →
    1.0/1.1 = 0.9090909090909091 (test_report.py:394-471)."""
    rows = [
        ("j", "success", _ts(1)), ("j", "success", _ts(2)),
        ("j", "failure", _ts(3)),
        ("single", "failure", _ts(1)),
    ]
    df = spark.createDataFrame(rows, "name string, state string, start_time timestamp")
    got = {r["name"]: r["flakiness"] for r in A.flakiness(df).collect()}
    assert got["j"] == pytest.approx(0.9090909090909091)
    assert got["single"] == 0.0


def test_top_flaky_threshold(spark):
    rows = []
    for i, s in enumerate(["success", "failure"] * 4):  # alternating: flaky=?
        rows.append(("flaky-job", s, _ts(i + 1)))
    for i in range(6):
        rows.append(("stable-job", "success", _ts(i + 1)))
    df = spark.createDataFrame(rows, "name string, state string, start_time timestamp")
    got = A.top_flaky(df, 10, threshold=0.5, min_runs=5).collect()
    assert [r["name"] for r in got] == ["flaky-job"]


def test_costs(jobs, usages):
    by_job = {r["build_id"]: r["cost"] for r in A.cost_by_job(jobs, usages).collect()}
    assert by_job["b1"] == pytest.approx(5.0)
    assert by_job["b4"] == pytest.approx(7.5)
    assert by_job["b6"] == 0.0
    by_type = {r["type"]: r["cost"] for r in A.cost_by_job_type(jobs, usages).collect()}
    assert by_type["periodic"] == pytest.approx(5.0)
    assert by_type["presubmit"] == pytest.approx(7.5)
    top = A.top_expensive(jobs, usages, 5).collect()
    assert [r["name"] for r in top] == ["job-b", "job-a"]
    by_plan = {r["plan"]: r["cost"] for r in A.cost_by_machine_type(usages).collect()}
    assert by_plan["c3.small"] == pytest.approx(14.0)


def test_trends(spark):
    cur = spark.createDataFrame([("a", 10, 1.5), ("b", 5, 0.5)],
                                "name string, total bigint, rate double")
    prev = spark.createDataFrame([("a", 4, 1.0), ("c", 2, 2.0)],
                                 "name string, total bigint, rate double")
    got = {r["name"]: r for r in A.trends(cur, prev, ["name"]).collect()}
    assert got["a"]["total_delta"] == 6 and got["a"]["rate_delta"] == pytest.approx(0.5)
    assert got["b"]["total_delta"] == 5
    assert got["c"]["total_delta"] == -2


def test_dedup_keep_first(spark):
    rows = [
        ("iddddd1", "k1", "x"), ("id2", "k1", "y"), ("id03", "k1", "z"),
        ("a", "k2", "w"),
    ]
    df = spark.createDataFrame(rows, "id string, key string, v string")
    got = A.dedup_keep_first(df, ["key"], "id").collect()
    kept = {r["key"]: r["id"] for r in got}
    assert kept == {"k1": "id2", "k2": "a"}  # shortest id wins
