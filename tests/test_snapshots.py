"""Snapshot-versioned table: time travel, isolation, incremental scans."""

import pytest

from pliers_spark.sources.snapshots import SnapshotTable


@pytest.fixture()
def table(spark, tmp_path):
    return SnapshotTable(str(tmp_path / "pages_tbl"))


def _rows(df):
    return sorted((r.url, r.v) for r in df.collect())


def test_append_time_travel_and_isolation(spark, table):
    s1 = table.commit(spark.createDataFrame([("a", 1), ("b", 2)], "url string, v int"))
    s2 = table.commit(spark.createDataFrame([("c", 3)], "url string, v int"))

    # a reader pinned at s1 is isolated from the later commit
    pinned = table.read(spark, s1)
    assert _rows(pinned) == [("a", 1), ("b", 2)]
    assert _rows(table.read(spark)) == [("a", 1), ("b", 2), ("c", 3)]
    assert table.current_snapshot_id() == s2

    hist = table.snapshots()
    assert [m["snapshot_id"] for m in hist] == [s1, s2]
    assert hist[1]["parent_id"] == s1


def test_overwrite_is_metadata_only(spark, table):
    s1 = table.commit(spark.createDataFrame([("a", 1)], "url string, v int"))
    s2 = table.commit(
        spark.createDataFrame([("z", 9)], "url string, v int"), operation="overwrite"
    )
    assert _rows(table.read(spark, s2)) == [("z", 9)]
    # old snapshot still fully readable after the overwrite (time travel)
    assert _rows(table.read(spark, s1)) == [("a", 1)]


def test_incremental_scan_reads_only_the_delta(spark, table):
    s1 = table.commit(spark.createDataFrame([("a", 1)], "url string, v int"))
    s2 = table.commit(spark.createDataFrame([("b", 2)], "url string, v int"))
    s3 = table.commit(spark.createDataFrame([("c", 3)], "url string, v int"))

    assert _rows(table.read_incremental(spark, s1)) == [("b", 2), ("c", 3)]
    assert _rows(table.read_incremental(spark, s1, s2)) == [("b", 2)]
    assert _rows(table.read_incremental(spark, None, s2)) == [("a", 1), ("b", 2)]
    assert table.read_incremental(spark, s3).count() == 0
    with pytest.raises(ValueError):
        table.read_incremental(spark, "nonexistent")


def test_incremental_across_overwrite(spark, table):
    s1 = table.commit(spark.createDataFrame([("a", 1)], "url string, v int"))
    table.commit(spark.createDataFrame([("b", 2)], "url string, v int"))
    table.commit(spark.createDataFrame([("z", 9)], "url string, v int"), operation="overwrite")
    s4 = table.commit(spark.createDataFrame([("c", 3)], "url string, v int"))
    # rows added after s1 AND still visible at s4: the overwrite dropped b
    assert _rows(table.read_incremental(spark, s1, s4)) == [("c", 3), ("z", 9)]


def test_checkpoint_lineage_carries_snapshot_id(spark, table, tmp_path):
    from pyspark.sql import functions as F

    from pliers_spark.plans.checkpoint import CheckpointedRun

    sid = table.commit(spark.createDataFrame([("a", 1), ("b", 2)], "url string, v int"))
    run = CheckpointedRun("stage_x", str(tmp_path / "out"), num_buckets=2)
    run.run(
        spark,
        table.read(spark, sid),
        transform=lambda df: df,
        bucket_expr=F.pmod(F.xxhash64("url"), F.lit(2)),
        input_snapshot_id=sid,
    )
    man = run.metrics(spark)
    assert {r.input_snapshot_id for r in man.collect()} == {sid}


def test_commit_conflict_detected(spark, table, monkeypatch):
    """Optimistic concurrency: a commit whose parent moved underneath it
    must FAIL (and leave the winner's rows intact), not silently discard
    the other writer's commit."""
    from pliers_spark.sources import snapshots as S

    s1 = table.commit(spark.createDataFrame([("a", 1)], "url string, v int"))

    # simulate a racing writer landing between parent read and pointer flip
    real = SnapshotTable.current_snapshot_id
    state = {"fired": False}

    def racy(self):
        sid = real(self)
        if not state["fired"] and sid == s1:
            state["fired"] = True
            # interleaved commit by "another writer"
            other = SnapshotTable(self.root)
            other.commit(spark.createDataFrame([("b", 2)], "url string, v int"))
        return sid

    monkeypatch.setattr(SnapshotTable, "current_snapshot_id", racy)
    with pytest.raises(S.CommitConflictError):
        table.commit(spark.createDataFrame([("c", 3)], "url string, v int"))
    monkeypatch.setattr(SnapshotTable, "current_snapshot_id", real)
    # the racing writer's rows are still visible — nothing was discarded
    assert _rows(table.read(spark)) == [("a", 1), ("b", 2)]


def test_commit_lock_held_raises(spark, table):
    import os

    from pliers_spark.sources.snapshots import CommitConflictError

    table.commit(spark.createDataFrame([("a", 1)], "url string, v int"))
    lock = os.path.join(table._snap_dir, "_commit.lock")
    open(lock, "w").close()
    try:
        with pytest.raises(CommitConflictError):
            table.commit(spark.createDataFrame([("b", 2)], "url string, v int"))
    finally:
        os.unlink(lock)


def test_incremental_dedup_checks_delta_against_history(spark, table):
    from pliers_spark.operators.dedup import incremental_dedup

    s1 = table.commit(
        spark.createDataFrame(
            [(0, "alpha beta"), (1, "gamma delta")], "doc_id long, text string"
        )
    )
    # delta: doc 2 duplicates history, 3+4 duplicate each other, 5 is new
    table.commit(
        spark.createDataFrame(
            [
                (2, "alpha beta"),
                (3, "fresh text"),
                (4, "fresh text"),
                (5, "unique new"),
            ],
            "doc_id long, text string",
        )
    )
    out = incremental_dedup(spark, table, s1)
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [3, 5]  # 2 dropped vs history, 4 dropped within delta

    # first ingest (no history): only within-delta dedup applies
    out0 = incremental_dedup(spark, table, None)
    assert len(out0.collect()) > 0


def test_delete_where_is_copy_on_write(spark, table):
    from pyspark.sql import functions as F

    s1 = table.commit(spark.createDataFrame([("a", 1), ("b", 2)], "url string, v int"))
    s2 = table.commit(spark.createDataFrame([("c", 3), ("d", 4)], "url string, v int"))
    s3 = table.delete_where(spark, F.col("url") == "c")
    assert _rows(table.read(spark)) == [("a", 1), ("b", 2), ("d", 4)]
    # time travel still sees the deleted row
    assert ("c", 3) in _rows(table.read(spark, s2))
    # COW: only the file(s) containing 'c' were rewritten — the s1 files
    # carry over by reference
    m3 = table._load_manifest(s3)
    m1 = table._load_manifest(s1)
    assert set(m1["files"]) <= set(m3["files"])
    assert m3["operation"] == "delete" and m3["removed_files"]
    # a delete matching nothing is a metadata no-op (same snapshot id)
    assert table.delete_where(spark, F.col("url") == "zzz") == s3


def test_incremental_raises_across_delete(spark, table):
    from pyspark.sql import functions as F

    s1 = table.commit(spark.createDataFrame([("a", 1)], "url string, v int"))
    table.delete_where(spark, F.col("url") == "a")
    s3 = table.commit(spark.createDataFrame([("b", 2)], "url string, v int"))
    with pytest.raises(ValueError, match="delete snapshot"):
        table.read_incremental(spark, from_id=s1, to_id=s3)


def test_compact_rewrites_layout_not_rows(spark, table):
    s1 = table.commit(spark.createDataFrame([("a", 1)], "url string, v int").repartition(4))
    s2 = table.commit(spark.createDataFrame([("b", 2)], "url string, v int").repartition(4))
    before = table._load_manifest(s2)["files"]
    sc = table.compact(spark, target_files=1)
    after = table._load_manifest(sc)["files"]
    assert len(after) < len(before)
    assert _rows(table.read(spark)) == [("a", 1), ("b", 2)]
    # incremental across the compaction sees appended rows exactly once
    s3 = table.commit(spark.createDataFrame([("c", 3)], "url string, v int"))
    delta = table.read_incremental(spark, from_id=s1, to_id=s3)
    assert _rows(delta) == [("b", 2), ("c", 3)]


def test_read_as_of_timestamp(spark, table):
    """FOR SYSTEM_TIME AS OF semantics: the newest snapshot committed at
    or before the given wall-clock time."""
    s1 = table.commit(spark.createDataFrame([("a", 1)], "url string, v int"))
    s2 = table.commit(spark.createDataFrame([("b", 2)], "url string, v int"))
    t1 = table._load_manifest(s1)["committed_at"]
    t2 = table._load_manifest(s2)["committed_at"]
    assert _rows(table.read(spark, as_of_timestamp=t1)) == [("a", 1)]
    assert _rows(table.read(spark, as_of_timestamp=t2 + 1)) == [("a", 1), ("b", 2)]
    with pytest.raises(FileNotFoundError):
        table.read(spark, as_of_timestamp=t1 - 1)
    with pytest.raises(ValueError):
        table.read(spark, snapshot_id=s1, as_of_timestamp=t1)


def test_rollback_restores_state_as_new_commit(spark, table):
    s1 = table.commit(spark.createDataFrame([("a", 1)], "url string, v int"))
    table.commit(spark.createDataFrame([("b", 2)], "url string, v int"))
    s3 = table.rollback_to(s1)
    assert table.current_snapshot_id() == s3
    assert _rows(table.read(spark)) == [("a", 1)]
    # history preserved: the rolled-back-over snapshot is still readable
    assert [m["operation"] for m in table.snapshots()][-1] == "rollback"
    # incremental across a rollback refuses (rows disappeared)
    with pytest.raises(ValueError):
        table.read_incremental(spark, from_id=s1)
    with pytest.raises(ValueError):
        table.rollback_to("feedfacedeadbeef")


def test_expire_snapshots_deletes_unreferenced_files(spark, table):
    import os

    s1 = table.commit(spark.createDataFrame([("a", 1)], "url string, v int"))
    table.commit(
        spark.createDataFrame([("b", 2)], "url string, v int"), operation="overwrite"
    )
    s3 = table.commit(spark.createDataFrame([("c", 3)], "url string, v int"))
    s1_files = table._load_manifest(s1)["files"]
    assert all(os.path.exists(f) for f in s1_files)

    stats = table.expire_snapshots(retain_last=2)
    assert stats["expired"] == 1
    assert stats["deleted_files"] >= 1
    # s1's files were referenced only by the expired snapshot -> gone
    assert not any(os.path.exists(f) for f in s1_files)
    # current reads unchanged; expired snapshot no longer time-travelable
    assert _rows(table.read(spark)) == [("b", 2), ("c", 3)]
    with pytest.raises(FileNotFoundError):
        table.read(spark, s1)
    # retained chain re-rooted and still walkable
    hist = table.snapshots()
    assert hist[0]["parent_id"] is None
    assert hist[-1]["snapshot_id"] == s3
    # expiring below the chain length is a no-op
    assert table.expire_snapshots(retain_last=5)["expired"] == 0


def test_expire_keeps_files_shared_with_retained(spark, table):
    import os

    s1 = table.commit(spark.createDataFrame([("a", 1)], "url string, v int"))
    table.commit(spark.createDataFrame([("b", 2)], "url string, v int"))  # append: shares s1 files
    s1_files = table._load_manifest(s1)["files"]
    table.expire_snapshots(retain_last=1)
    # s1's files are still referenced by the retained append snapshot
    assert s1_files and all(os.path.exists(f) for f in s1_files)
    assert _rows(table.read(spark)) == [("a", 1), ("b", 2)]


def test_schema_evolution_merge_on_read(spark, table):
    """Iceberg-style add-column evolution: a later append may carry a
    wider schema; merge_schema=True unions them and pre-evolution rows
    read the new column as null."""
    table.commit(spark.createDataFrame([("a", 1)], "url string, v int"))
    table.commit(
        spark.createDataFrame([("b", 2, "en")], "url string, v int, lang string")
    )
    wide = table.read(spark, merge_schema=True)
    assert set(wide.columns) == {"url", "v", "lang"}
    rows = {r.url: r.lang for r in wide.collect()}
    assert rows == {"a": None, "b": "en"}
