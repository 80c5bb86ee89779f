"""S8 bulk-delete semantics: partition-scoped rewrite, no data loss
(SURVEY.md §2.1 S8; reference src/elasticsearch_cleanup/main.py:30-51).

Round-1 verdict flagged the old implementation as a non-atomic
whole-table rewrite — these tests pin the fixed contract:
- only partitions containing matching rows are rewritten (untouched
  partitions' files stay byte-identical, same filenames);
- partitions emptied by the delete are removed;
- a crash between the staged write and the swap never loses the table
  (kill-and-rerun heals, like the index build's resume test);
- the operation is idempotent under rerun.
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from prow_jobs_scraper_spark.sources.readers import (
    delete_where,
    recover_table,
)


def _files_of(path: str) -> dict[str, float]:
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                out[os.path.relpath(p, path)] = os.path.getmtime(p)
    return out


@pytest.fixture()
def part_table(spark, tmp_path):
    p = str(tmp_path / "events_by_kind")
    df = spark.range(300).select(
        F.col("id"),
        (F.col("id") % 3).cast("int").alias("kind"),
        (F.col("id") * 7 % 100).alias("v"),
    )
    df.write.partitionBy("kind").parquet(p)
    return p


def test_delete_rewrites_only_affected_partitions(spark, part_table):
    before = _files_of(part_table)
    # condition only ever matches rows in kind=1
    delete_where(spark, part_table, "kind = 1 AND v < 50")
    after = _files_of(part_table)

    got = spark.read.parquet(part_table)
    assert got.where("kind = 1 AND v < 50").count() == 0
    assert got.where("kind != 1").count() == 200  # untouched rows intact

    # kind=0 and kind=2 files are the SAME files (names + mtimes)
    for rel, mtime in before.items():
        if "kind=0" in rel or "kind=2" in rel:
            assert rel in after and after[rel] == mtime, rel
    # kind=1 was rewritten
    assert any("kind=1" in rel for rel in after)


def test_delete_removes_emptied_partitions(spark, part_table):
    delete_where(spark, part_table, "kind = 2")
    assert not os.path.exists(os.path.join(part_table, "kind=2"))
    got = spark.read.parquet(part_table)
    assert got.count() == 200
    assert got.where("kind = 2").count() == 0


def test_delete_noop_when_nothing_matches(spark, part_table):
    before = _files_of(part_table)
    delete_where(spark, part_table, "v > 1000000")
    assert _files_of(part_table) == before  # zero files rewritten


def test_delete_idempotent_rerun(spark, part_table):
    delete_where(spark, part_table, "v < 30")
    first = sorted(r["id"] for r in spark.read.parquet(part_table).collect())
    delete_where(spark, part_table, "v < 30")
    second = sorted(r["id"] for r in spark.read.parquet(part_table).collect())
    assert first == second


def test_stale_staging_dir_is_ignored(spark, part_table):
    # crash state: a previous delete died after its staged write —
    # the live table is untouched and a rerun must just work
    os.makedirs(part_table + ".staging-deadbeef/kind=9", exist_ok=True)
    delete_where(spark, part_table, "kind = 1")
    got = spark.read.parquet(part_table)
    assert got.count() == 200 and got.where("kind = 1").count() == 0


def test_unpartitioned_delete_and_crash_recovery(spark, tmp_path):
    p = str(tmp_path / "flat")
    spark.range(100).select("id", (F.col("id") % 10).alias("m")).write.parquet(p)

    delete_where(spark, p, "m = 0")
    assert spark.read.parquet(p).count() == 90

    # crash state: swap died between "move live aside" and "move staged
    # in" — the table dir is gone but .old holds every byte
    shutil.move(p, p + ".old")
    assert recover_table(p)
    assert spark.read.parquet(p).count() == 90

    # and delete_where itself heals that state on entry
    shutil.move(p, p + ".old")
    delete_where(spark, p, "m = 1")
    assert spark.read.parquet(p).count() == 80


def test_upsert_replaces_and_inserts(spark, part_table):
    from prow_jobs_scraper_spark.sources.readers import upsert_by_key

    before = _files_of(part_table)
    # update two existing rows in kind=1 and insert one new row
    ups = spark.createDataFrame(
        [(1, 1, 999), (4, 1, 998), (1000, 1, 997)],
        "id long, kind int, v long")
    upsert_by_key(spark, part_table, ups, ["id"])

    got = {r["id"]: r["v"] for r in spark.read.parquet(part_table).collect()}
    assert got[1] == 999 and got[4] == 998        # replaced
    assert got[1000] == 997                        # inserted
    assert len(got) == 301                         # 300 + 1 new
    assert got[7] == 7 * 7 % 100                   # untouched row intact

    # only kind=1 was rewritten — kind=0/kind=2 files byte-identical
    after = _files_of(part_table)
    for rel, mtime in before.items():
        if "kind=0" in rel or "kind=2" in rel:
            assert rel in after and after[rel] == mtime, rel


def test_upsert_idempotent_replay(spark, part_table):
    from prow_jobs_scraper_spark.sources.readers import upsert_by_key

    ups = spark.createDataFrame([(2, 2, 555)], "id long, kind int, v long")
    upsert_by_key(spark, part_table, ups, ["id"])
    first = sorted(map(tuple, spark.read.parquet(part_table).collect()))
    upsert_by_key(spark, part_table, ups, ["id"])   # replay = crash rerun
    second = sorted(map(tuple, spark.read.parquet(part_table).collect()))
    assert first == second


def test_upsert_unpartitioned(spark, tmp_path):
    from pyspark.sql import functions as F

    from prow_jobs_scraper_spark.sources.readers import upsert_by_key

    p = str(tmp_path / "flat_up")
    spark.range(50).select("id", (F.col("id") * 2).alias("v")).write.parquet(p)
    ups = spark.createDataFrame([(3, 777), (99, 888)], "id long, v long")
    upsert_by_key(spark, p, ups, ["id"])
    got = {r["id"]: r["v"] for r in spark.read.parquet(p).collect()}
    assert got[3] == 777 and got[99] == 888 and len(got) == 51


def test_delete_removes_emptied_partition_with_escaped_value(spark,
                                                             tmp_path):
    # Hive-escapes special chars in partition values on disk (':' →
    # %3A, so a timestamp partition dir is 'ts=2024-05-01 00%3A00%3A00').
    # Emptied-partition cleanup must locate the REAL dir by listing +
    # unescaping, not by reconstructing 'col=value' naively — the old
    # f-string path silently missed these and the rows survived.
    p = str(tmp_path / "by_ts")
    df = spark.createDataFrame(
        [(1, "2024-05-01 00:00:00"), (2, "2024-05-01 00:00:00"),
         (3, "2024-06-01 00:00:00")],
        "id long, ts_s string").select(
        "id", F.col("ts_s").cast("timestamp").alias("ts"))
    df.write.partitionBy("ts").parquet(p)
    # the escaped dir really is on disk
    assert any("%3A" in d for d in os.listdir(p)), os.listdir(p)

    delete_where(spark, p, "ts = timestamp'2024-05-01 00:00:00'")
    got = spark.read.parquet(p)
    assert got.count() == 1 and got.where("id = 3").count() == 1
    # the emptied escaped partition dir is GONE (not silently missed)
    assert not any("2024-05-01" in d for d in os.listdir(p)), os.listdir(p)


def test_recover_table_drops_stale_old_after_completed_swap(spark,
                                                            tmp_path):
    # crash state: swap completed (live table in place) but the final
    # rmtree(.old) didn't run. recover_table must drop the stale .old —
    # otherwise the NEXT swap's move(path, path+'.old') nests the live
    # table inside it and a crash there wedges recovery.
    p = str(tmp_path / "flat_stale")
    spark.range(20).select("id", (F.col("id") % 4).alias("m")).write.parquet(p)
    os.makedirs(p + ".old", exist_ok=True)
    with open(p + ".old/junk.parquet", "w") as f:
        f.write("stale")

    assert recover_table(p)          # heals: stale .old removed
    assert not os.path.exists(p + ".old")
    assert spark.read.parquet(p).count() == 20

    # and the healing happens on entry of a delete too
    os.makedirs(p + ".old", exist_ok=True)
    delete_where(spark, p, "m = 0")
    assert not os.path.exists(p + ".old")
    assert spark.read.parquet(p).count() == 15
