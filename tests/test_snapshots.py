"""Snapshot table format (sources/snapshots.py): versioned manifests,
time travel, rollback, optimistic concurrency, stats pruning, and
transactional compaction."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from oeem_etl_spark.sources.snapshots import CommitConflict, SnapshotTable


def _ids(df) -> list[int]:
    return sorted(r["id"] for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    return SnapshotTable(str(tmp_path / "tbl"))


def test_append_overwrite_and_time_travel(spark, table):
    d1 = spark.range(0, 10)
    d2 = spark.range(10, 15)
    v1 = table.commit(d1)
    v2 = table.commit(d2)  # append
    assert (v1, v2) == (1, 2)
    assert _ids(table.read(spark)) == list(range(15))
    assert _ids(table.read(spark, version=1)) == list(range(10))
    v3 = table.commit(spark.range(100, 103), mode="overwrite")
    assert _ids(table.read(spark)) == [100, 101, 102]
    # old versions still readable after the overwrite
    assert _ids(table.read(spark, version=2)) == list(range(15))
    assert table.versions() == [1, 2, 3] and v3 == 3


def test_as_of_timestamp_resolution(spark, table):
    table.commit(spark.range(0, 3))
    t1 = table._manifest(1)["committed_at"]
    table.commit(spark.range(3, 6))
    assert _ids(table.read(spark, as_of=t1)) == [0, 1, 2]
    with pytest.raises(AssertionError):
        table.read(spark, as_of=t1 - 1000)


def test_rollback_appends_history(spark, table):
    table.commit(spark.range(0, 5))
    table.commit(spark.range(5, 9))
    v = table.rollback(1)
    assert v == 3
    assert _ids(table.read(spark)) == list(range(5))
    # the rolled-back-over version is still in history
    assert _ids(table.read(spark, version=2)) == list(range(9))


def test_concurrent_commit_conflict(spark, table):
    table.commit(spark.range(0, 5))
    # writer A reads snapshot v1, writer B commits v2 first
    table.commit(spark.range(5, 10))
    with pytest.raises(CommitConflict):
        table.commit(spark.range(99, 100), expected_version=1)
    # un-guarded append just takes the next version
    assert table.commit(spark.range(10, 12)) == 3


def test_publish_put_if_absent(spark, table):
    table.commit(spark.range(0, 2))
    m = table._manifest(1)
    with pytest.raises(CommitConflict):
        table._publish(m, 1)


def test_stats_pruning_skips_files_not_rows(spark, table):
    # two commits with disjoint id ranges -> disjoint per-file stats
    table.commit(spark.range(0, 1000).repartition(1))
    table.commit(spark.range(5000, 6000).repartition(1))
    full = table.read(spark)
    pruned = table.read(spark, prune=("id", 5500, 5600))
    # pruning dropped the low file entirely...
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    # ...but never drops qualifying rows
    exact = pruned.where(F.col("id").between(5500, 5600))
    assert _ids(exact) == list(range(5500, 5601))
    # conservative: a column with no stats keeps every file
    keep_all = table.read(spark, prune=("no_such_col", 0, 1))
    assert len(keep_all.inputFiles()) == len(full.inputFiles())


def test_compaction_is_transactional_and_lossless(spark, table):
    table.commit(spark.range(0, 2000).repartition(16))
    assert table.file_count() == 16
    v = table.compact(spark, target_file_mb=128)
    assert v == 2
    assert table.file_count() < 16
    assert _ids(table.read(spark)) == list(range(2000))
    # the pre-compaction snapshot still reads its original 16 files
    assert table.file_count(version=1) == 16
    assert _ids(table.read(spark, version=1)) == list(range(2000))


def test_manifest_files_survive_partial_writer_crash(spark, table, tmp_path):
    """A writer that dies after writing data files but before publishing
    leaves no visible change: the orphan directory is not in any manifest."""
    table.commit(spark.range(0, 4))
    orphan = os.path.join(table.data_dir, "orphan")
    spark.range(100, 104).write.parquet(orphan)
    assert _ids(table.read(spark)) == [0, 1, 2, 3]


def test_vacuum_reclaims_unreferenced_files_only(spark, table):
    table.commit(spark.range(0, 10))          # v1
    table.commit(spark.range(10, 20))         # v2 (append: shares v1 files)
    table.commit(spark.range(50, 55), mode="overwrite")  # v3: fresh files
    files_v2 = {e["path"] for e in table._manifest(2)["files"]}
    deleted, dropped = table.vacuum(retain_last=1)
    # both early manifests dropped; every v2 file was unreferenced by v3
    assert dropped == 2 and deleted == len(files_v2)
    assert table.versions() == [3]
    assert _ids(table.read(spark)) == [50, 51, 52, 53, 54]
    assert all(not os.path.exists(p) for p in files_v2)
    # vacuum with nothing to drop is a no-op
    assert table.vacuum(retain_last=1) == (0, 0)


def test_vacuum_keeps_files_shared_with_retained_versions(spark, table):
    table.commit(spark.range(0, 10))   # v1
    table.commit(spark.range(10, 20))  # v2 appends -> v2 references v1 files
    deleted, dropped = table.vacuum(retain_last=1)
    assert dropped == 1 and deleted == 0  # v1's files live on in v2
    assert _ids(table.read(spark)) == list(range(20))


def test_batch_id_commit_is_replay_idempotent(spark, table):
    v1 = table.commit(spark.range(0, 5), batch_id=0)
    v2 = table.commit(spark.range(5, 10), batch_id=1)
    # crash-replay of batch 1: no new version, no duplicate rows
    v_replay = table.commit(spark.range(5, 10), batch_id=1)
    assert (v1, v2, v_replay) == (1, 2, 2)
    assert _ids(table.read(spark)) == list(range(10))
    # the next real batch proceeds normally
    assert table.commit(spark.range(10, 12), batch_id=2) == 3


def test_streaming_restart_does_not_double_commit(spark, tmp_path):
    """availableNow run, then a second run over the same checkpoint: the
    second run has nothing new and the table must be unchanged."""
    import os

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    table = SnapshotTable(str(tmp_path / "tbl"))
    spark.range(0, 100).repartition(2).write.parquet(src)

    def run():
        sdf = (
            spark.readStream.schema(spark.read.parquet(src).schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(os.path.join(src, "*.parquet"))
        )
        q = (
            sdf.writeStream.foreachBatch(
                lambda bdf, bid: table.commit(bdf, batch_id=bid) and None
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    v_after_first = table.latest_version()
    run()  # restart: checkpoint says everything is processed
    assert table.latest_version() == v_after_first
    assert _ids(table.read(spark)) == list(range(100))


def test_partitioned_commit_prunes_by_exact_partition_value(spark, table):
    from pyspark.sql import functions as SF

    df = spark.range(0, 300).select(
        "id", (SF.col("id") % 3).cast("string").alias("dt")
    )
    table.commit(df, partition_by=["dt"])
    full = table.read(spark)
    # partition column restored through the basePath read
    assert set(full.columns) == {"id", "dt"}
    assert _ids(full) == list(range(300))
    pruned = table.read(spark, prune=("dt", 1, 1))
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    got = pruned.where(SF.col("dt") == "1")
    assert sorted(r["id"] for r in got.collect()) == [
        i for i in range(300) if i % 3 == 1
    ]


def test_partitioned_append_across_commits_unions_cleanly(spark, table):
    from pyspark.sql import functions as SF

    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        "id", (SF.col("id") % 2).cast("string").alias("dt")
    )
    table.commit(mk(0, 50), partition_by=["dt"])
    table.commit(mk(50, 80), partition_by=["dt"])
    assert _ids(table.read(spark)) == list(range(80))
    # pruning applies across both commits' file sets
    pruned = table.read(spark, prune=("dt", 0, 0))
    # (Spark's partition-type inference reads dt back as int)
    assert {str(r["dt"]) for r in pruned.select("dt").distinct().collect()} == {"0"}


def test_incremental_feed_appends_only(spark, table):
    import pytest as _pytest

    table.commit(spark.range(0, 10))
    table.commit(spark.range(10, 20))
    table.commit(spark.range(20, 30))
    assert _ids(table.read_incremental(spark, 1)) == list(range(10, 30))
    assert _ids(table.read_incremental(spark, 1, 2)) == list(range(10, 20))
    # an overwrite in range invalidates the file-diff semantics: refuse
    table.commit(spark.range(0, 5), mode="overwrite")
    with _pytest.raises(ValueError, match="not append"):
        table.read_incremental(spark, 2)
    # ranges entirely before the rewrite still work
    assert _ids(table.read_incremental(spark, 2, 3)) == list(range(20, 30))


def test_prune_to_empty_returns_empty_frame_not_error(spark, tmp_path):
    """Pruning changes I/O, never results: a range intersecting NO file's
    stats must yield an empty frame with the table schema (this bit the
    sf0.001 sweep, where the a20 prune range matches no user ids)."""
    from oeem_etl_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "t"))
    df = (
        spark.range(10)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        .coalesce(1)  # one file, so the stats range is [0, 9] exactly
    )
    t.commit(df, mode="append")
    out = t.read(spark, version=1, prune=("k", 1000, 2000))
    assert out.columns == ["k", "v"]
    assert out.count() == 0
    # an intersecting prune keeps the file (caller applies the exact filter)
    assert t.read(spark, version=1, prune=("k", 0, 3)).count() == 10


def test_schema_evolution_merge_read(spark, table):
    table.commit(spark.range(0, 5))  # (id)
    table.commit(spark.range(5, 8).withColumn("tag", F.lit("new")))
    # merged read: union schema, old files NULL-filled
    got = {
        r["id"]: r["tag"] for r in table.read(spark, merge_schema=True).collect()
    }
    assert got == {i: None for i in range(5)} | {i: "new" for i in range(5, 8)}
    # pinned pre-evolution version keeps the narrow schema
    assert table.read(spark, version=1).columns == ["id"]
