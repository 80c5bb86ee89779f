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


# --------------------------------------------------------------------------
# cleanup_duplicates: the elasticsearch_cleanup tool end-to-end
# (reference src/elasticsearch_cleanup/main.py:30-107 — scan, dedup on
# comparison fields keep-first, bulk-delete the losers, dry-run mode)
# --------------------------------------------------------------------------

from prow_jobs_scraper_spark.sources.readers import (  # noqa: E402
    cleanup_duplicates,
)


@pytest.fixture()
def dup_table(spark, tmp_path):
    # 3 partitions; duplicate (a, b) groups within AND across partitions;
    # keeper = lowest (ord, id). kind is also a comparison field for one
    # group to exercise the column-overlap dedup in the loser projection.
    p = str(tmp_path / "dups_by_kind")
    rows = [
        # (id, kind, a, b, ord)
        (1, 0, "x", "m", 10),   # group (x,m): keeper (ord 10)
        (2, 0, "x", "m", 20),   # loser, same partition
        (3, 1, "x", "m", 5),    # ord 5 < 10 -> the real keeper
        (4, 1, "y", "n", 1),    # unique group
        (5, 2, "z", "o", 1),    # group (z,o): ord tie broken by id
        (6, 2, "z", "o", 1),    # loser (same ord, higher id)
        (7, 2, "q", "r", 9),    # unique group, untouched partition? no:
                                # kind=2 has loser 6, so it IS rewritten
    ]
    spark.createDataFrame(
        rows, "id long, kind int, a string, b string, ord long"
    ).write.partitionBy("kind").parquet(p)
    return p


def test_cleanup_dry_run_reports_without_deleting(spark, dup_table):
    before = _files_of(dup_table)
    losers = cleanup_duplicates(
        spark, dup_table, ["a", "b"], "ord", "id", dry_run=True)
    got = {r.id for r in losers.collect()}
    # keeper of (x,m) is id=3 (ord 5); of (z,o) is id=5 (ord tie, id asc)
    assert got == {1, 2, 6}
    assert {"id", "a", "b", "kind"} <= set(losers.columns)
    assert _files_of(dup_table) == before  # nothing touched


def test_cleanup_deletes_losers_partition_scoped(spark, dup_table):
    # make one partition loser-free so its files must stay byte-identical
    before = _files_of(dup_table)
    out = cleanup_duplicates(spark, dup_table, ["a", "b"], "ord", "id")
    # losers 1,2 live in kind=0 and loser 6 in kind=2; kind=1 holds only
    # keepers (3, 4) so it is NOT rewritten
    assert out == {"n_deleted": 3, "n_partitions_rewritten": 2}

    got = spark.read.parquet(dup_table)
    assert {r.id for r in got.collect()} == {3, 4, 5, 7}
    # survivors keep full rows
    assert got.where("id = 3").select("a", "b").first() == ("x", "m")
    # kind=1's files stayed byte-identical (names + mtimes)
    after = _files_of(dup_table)
    assert {f: t for f, t in before.items() if "kind=1" in f} == \
        {f: t for f, t in after.items() if "kind=1" in f}

    # idempotent: rerun deletes nothing, rewrites nothing
    before2 = _files_of(dup_table)
    out2 = cleanup_duplicates(spark, dup_table, ["a", "b"], "ord", "id")
    assert out2 == {"n_deleted": 0, "n_partitions_rewritten": 0}
    assert _files_of(dup_table) == before2


def test_cleanup_untouched_partition_files_intact(spark, tmp_path):
    p = str(tmp_path / "dups_one_part")
    rows = [(1, 0, "x", 1), (2, 0, "x", 2),  # dups only in kind=0
            (3, 1, "y", 1), (4, 1, "w", 1)]
    spark.createDataFrame(
        rows, "id long, kind int, a string, ord long"
    ).write.partitionBy("kind").parquet(p)
    before = _files_of(p)
    out = cleanup_duplicates(spark, p, ["a"], "ord", "id")
    assert out == {"n_deleted": 1, "n_partitions_rewritten": 1}
    after = _files_of(p)
    k1 = {f: t for f, t in before.items() if "kind=1" in f}
    assert k1 == {f: t for f, t in after.items() if "kind=1" in f}
    assert {r.id for r in spark.read.parquet(p).collect()} == {1, 3, 4}


def test_cleanup_unpartitioned_swap(spark, tmp_path):
    p = str(tmp_path / "dups_flat")
    rows = [(1, "x", 2), (2, "x", 1), (3, "y", 1)]
    spark.createDataFrame(rows, "id long, a string, ord long") \
        .write.parquet(p)
    out = cleanup_duplicates(spark, p, ["a"], "ord", "id")
    assert out["n_deleted"] == 1
    assert {r.id for r in spark.read.parquet(p).collect()} == {2, 3}
    assert not os.path.exists(p + ".old")
    # no dups left -> no swap at all
    out2 = cleanup_duplicates(spark, p, ["a"], "ord", "id")
    assert out2["n_deleted"] == 0
