"""Jar-free Delta transaction log (sources/deltalog.py): commits,
overwrite tombstones, time travel, partitioned layout, checkpoints,
and the create-if-absent concurrency guard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from employee_activity_etl_poc_spark.sources.deltalog import (
    _existing_versions,
    read_delta_pylog,
    write_delta_pylog,
)
from employee_activity_etl_poc_spark.sources.readers import read_delta


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_append_overwrite_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "tbl")
    a = spark.range(0, 5).select(F.col("id"), (F.col("id") * 10).alias("v"))
    b = spark.range(5, 8).select(F.col("id"), (F.col("id") * 10).alias("v"))
    c = spark.range(100, 102).select(F.col("id"), (F.col("id") * 10).alias("v"))
    assert write_delta_pylog(a, path) == 0
    assert write_delta_pylog(b, path) == 1
    assert _rows(read_delta_pylog(spark, path)) == _rows(a.unionByName(b))
    # overwrite tombstones every prior file in ONE commit
    assert write_delta_pylog(c, path, mode="overwrite") == 2
    assert _rows(read_delta_pylog(spark, path)) == _rows(c)
    # a naive directory scan would see all three batches; the log must not
    n_files = sum(
        1 for f in os.listdir(path) if f.endswith(".parquet")
    )
    assert n_files >= 3  # tombstoned files still on disk (vacuum's job)
    # time travel
    assert _rows(read_delta_pylog(spark, path, version_as_of=0)) == _rows(a)
    assert _rows(read_delta_pylog(spark, path, version_as_of=1)) == _rows(
        a.unionByName(b)
    )
    # readers.read_delta routes to the pylog reader when a log exists
    assert _rows(read_delta(spark, path)) == _rows(c)


def test_partitioned_table_recovers_partition_columns(spark, tmp_path):
    path = str(tmp_path / "ptbl")
    df = spark.range(0, 20).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("p")
    )
    write_delta_pylog(df, path, partition_by=["p"])
    back = read_delta_pylog(spark, path)
    assert set(back.columns) == {"id", "p"}
    assert _rows(back.select("id", "p")) == _rows(df)


def test_checkpoint_compaction_and_read(spark, tmp_path):
    path = str(tmp_path / "ctbl")
    for i in range(6):
        df = spark.range(i * 10, i * 10 + 10).select(
            F.col("id"), F.lit(i).alias("batch")
        )
        write_delta_pylog(df, path, checkpoint_interval=5)
    # checkpoint written at version 5; reader replays ckpt + tail
    assert os.path.exists(
        os.path.join(path, "_delta_log", f"{5:020d}.checkpoint.parquet")
    )
    assert read_delta_pylog(spark, path).count() == 60
    # state after checkpoint matches full-JSON replay (time travel still
    # replays JSONs only and must agree at the checkpointed version)
    assert read_delta_pylog(spark, path, version_as_of=5).count() == 60


def test_concurrent_commit_conflicts_loudly(spark, tmp_path, monkeypatch):
    """A true race: both writers enumerate the same latest version; the
    second open('x') on the commit file must raise, not overwrite."""
    from employee_activity_etl_poc_spark.sources import deltalog as DL

    path = str(tmp_path / "xtbl")
    df = spark.range(3).select(F.col("id"))
    write_delta_pylog(df, path)
    # racing writer lands version 1 AFTER this writer enumerated versions
    real = DL._existing_versions

    def stale_view(p):
        versions = real(p)
        log = os.path.join(path, "_delta_log", f"{1:020d}.json")
        if not os.path.exists(log):
            open(log, "w").write('{"commitInfo": {"operation": "RACE"}}\n')
        return [v for v in versions if v == 0]

    monkeypatch.setattr(DL, "_existing_versions", stale_view)
    with pytest.raises(FileExistsError):
        write_delta_pylog(df, path)
    monkeypatch.undo()
    assert _existing_versions(path) == [0, 1]


def test_delta_merge_upsert_and_version_diff(spark, tmp_path):
    """Jar-free MERGE commits one overwrite version; CDF-lite diff
    between versions reports exactly the merge's effects."""
    from employee_activity_etl_poc_spark.sources.deltalog import (
        delta_merge_upsert,
        delta_version_diff,
    )

    path = str(tmp_path / "mtbl")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)], "id long, t string, v double"
    )
    write_delta_pylog(base, path)
    updates = spark.createDataFrame(
        [(2, "b", 99.0), (4, "d", 40.0)], "id long, t string, v double"
    )
    assert delta_merge_upsert(spark, path, updates, "id") == 1
    got = {tuple(r) for r in read_delta_pylog(spark, path).collect()}
    assert got == {(1, "a", 10.0), (2, "b", 99.0), (3, "c", 30.0), (4, "d", 40.0)}
    diff = {
        r["id"]: (r["change"], list(r["changed_cols"]))
        for r in delta_version_diff(spark, path, 0, 1, ["id"]).collect()
    }
    assert diff == {2: ("changed", ["v"]), 4: ("added", [])}


def test_streaming_sink_txn_idempotency(spark, tmp_path):
    """At-least-once replay of a foreachBatch epoch is a no-op: the txn
    action committed WITH the data makes the replay detectable."""
    from employee_activity_etl_poc_spark.sources.deltalog import (
        streaming_delta_sink,
    )

    path = str(tmp_path / "stbl")
    sink = streaming_delta_sink(path, app_id="ingest-a")
    b0 = spark.range(0, 10).select(F.col("id"))
    b1 = spark.range(10, 20).select(F.col("id"))
    sink(b0, 0)
    sink(b1, 1)
    assert read_delta_pylog(spark, path).count() == 20
    sink(b1, 1)  # crash-replay of epoch 1
    sink(b0, 0)  # very late replay of epoch 0
    assert read_delta_pylog(spark, path).count() == 20
    assert _existing_versions(str(tmp_path / "stbl")) == [0, 1]


def test_compaction_preserves_rows_and_history(spark, tmp_path):
    """OPTIMIZE-lite: fewer live files, identical rows, dataChange=false
    in the commit, and every historical version still readable."""
    import json as J
    import os as O

    from employee_activity_etl_poc_spark.sources.deltalog import (
        _replay,
        compact_delta,
    )

    path = str(tmp_path / "otbl")
    for i in range(4):
        write_delta_pylog(
            spark.range(i * 5, i * 5 + 5).select(F.col("id")), path
        )
    n_files_before = len(_replay(path)[2])
    v = compact_delta(spark, path, target_partitions=1)
    assert read_delta_pylog(spark, path).count() == 20
    assert len(_replay(path)[2]) < n_files_before
    assert read_delta_pylog(spark, path, version_as_of=1).count() == 10
    commit = O.path.join(path, "_delta_log", f"{v:020d}.json")
    adds = [J.loads(x) for x in open(commit) if '"add"' in x]
    assert adds and all(a["add"]["dataChange"] is False for a in adds)


def test_vacuum_reclaims_tombstones_only(spark, tmp_path):
    """Vacuum deletes only files tombstoned past retention; the current
    snapshot is untouched, and time travel past the vacuum horizon is
    the documented casualty."""
    from employee_activity_etl_poc_spark.sources.deltalog import vacuum_delta

    path = str(tmp_path / "vtbl")
    a = spark.range(0, 5).select(F.col("id"))
    b = spark.range(100, 103).select(F.col("id"))
    write_delta_pylog(a, path)
    write_delta_pylog(b, path, mode="overwrite")
    assert vacuum_delta(path, retention_ms=10**12) == 0  # inside retention
    n = vacuum_delta(path, retention_ms=0)
    assert n >= 1
    assert {r["id"] for r in read_delta_pylog(spark, path).collect()} == {100, 101, 102}
    with pytest.raises(Exception):
        read_delta_pylog(spark, path, version_as_of=0).collect()


def test_vacuum_reclaims_orphans(spark, tmp_path):
    """A data file no commit ever added (lost race / crash between move
    and commit) is removed once past retention — real VACUUM semantics."""
    from employee_activity_etl_poc_spark.sources.deltalog import vacuum_delta

    path = str(tmp_path / "orph")
    write_delta_pylog(spark.range(5).select(F.col("id")), path)
    orphan = os.path.join(path, "part-orphaned-from-lost-race.snappy.parquet")
    open(orphan, "wb").write(b"not really parquet")
    assert vacuum_delta(path, retention_ms=10**12) == 0
    assert vacuum_delta(path, retention_ms=0) == 1
    assert not os.path.exists(orphan)
    assert read_delta_pylog(spark, path).count() == 5


def test_reader_refuses_advanced_protocol(spark, tmp_path):
    """A table demanding minReaderVersion > 1 (deletion vectors etc.)
    raises instead of silently resurrecting deleted rows."""
    path = str(tmp_path / "adv")
    write_delta_pylog(spark.range(3).select(F.col("id")), path)
    log = os.path.join(path, "_delta_log", f"{1:020d}.json")
    open(log, "w").write('{"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}}\n')
    with pytest.raises(NotImplementedError):
        read_delta_pylog(spark, path)
