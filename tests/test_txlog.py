"""ACID contract of the transaction-log table: atomic visibility, snapshot
isolation / time travel, optimistic concurrency, compaction, vacuum."""

from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from psy_supabase_spark.sources.txlog import CommitConflict, TxTable


def _rows(df):
    return sorted((r.k, r.v) for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    return TxTable(spark, str(tmp_path / "tx"), checkpoint_every=3)


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "k long, v string")


def test_append_roundtrip_and_versions(table, spark):
    assert table.latest_version() == -1
    v0 = table.append(_df(spark, [(1, "a"), (2, "b")]))
    v1 = table.append(_df(spark, [(3, "c")]))
    assert (v0, v1) == (0, 1)
    assert _rows(table.read()) == [(1, "a"), (2, "b"), (3, "c")]
    # time travel: v0 excludes the second append
    assert _rows(table.read(version=0)) == [(1, "a"), (2, "b")]


def test_uncommitted_files_invisible(table, spark):
    table.append(_df(spark, [(1, "a")]))
    # a crashed writer: data staged but no commit record
    orphan = _df(spark, [(99, "ghost")])
    files = table._write_data_files(orphan)
    assert files  # parquet exists on disk...
    assert _rows(table.read()) == [(1, "a")]  # ...but is not visible
    # default vacuum SKIPS young dirs — this orphan could equally be a
    # concurrent writer's staged-but-uncommitted data (retention window)
    assert table.vacuum() == []
    # once aged past retention it is reclaimed without touching live data
    removed = table.vacuum(retention_seconds=0.0)
    assert len(removed) == 1
    assert _rows(table.read()) == [(1, "a")]


def test_overwrite_is_atomic_replace(table, spark):
    table.append(_df(spark, [(1, "a")]))
    table.overwrite(_df(spark, [(7, "z")]))
    assert _rows(table.read()) == [(7, "z")]
    assert _rows(table.read(version=0)) == [(1, "a")]  # old snapshot intact


def test_overwrite_conflict_detected(table, spark):
    table.append(_df(spark, [(1, "a")]))
    # rival commit lands between the overwrite's read and its commit:
    # simulate by pre-creating the version file the overwrite wants
    rival_files = table._write_data_files(_df(spark, [(2, "b")]))
    assert table._try_commit(1, {"action": "append", "add": rival_files, "remove": []})
    with pytest.raises(CommitConflict):
        table._commit(
            {"action": "overwrite", "add": [], "remove": [], "read_version": 0}
        )
    # appends, by contrast, rebase and succeed
    table.append(_df(spark, [(3, "c")]))
    assert _rows(table.read()) == [(1, "a"), (2, "b"), (3, "c")]


def test_compact_preserves_rows_and_history(table, spark):
    for i in range(4):
        table.append(_df(spark, [(i, str(i))]))
    before = _rows(table.read())
    n_files_before = len(table._snapshot_files(table.latest_version()))
    v = table.compact(target_files=1)
    assert _rows(table.read()) == before
    assert len(table._snapshot_files(v)) < n_files_before
    # pre-compaction version still readable until vacuum
    assert _rows(table.read(version=v - 1)) == before
    table.vacuum(retention_seconds=0.0)
    assert _rows(table.read()) == before  # latest unaffected
    with pytest.raises(Exception):
        table.read(version=0).collect()  # vacuumed history raises, not lies


def test_checkpoint_bounds_replay(table, spark):
    for i in range(7):
        table.append(_df(spark, [(i, str(i))]))
    cps = glob.glob(os.path.join(table.root, "_txlog", "checkpoint-*.json"))
    assert cps  # checkpoint_every=3 -> at least v3 and v6
    # snapshot from checkpoint equals full replay
    with open(sorted(cps)[-1]) as f:
        cp = json.load(f)
    live = set(table._snapshot_files(table.latest_version()))
    assert set(cp["files"]) <= live
    assert _rows(table.read()) == [(i, str(i)) for i in range(7)]


def test_empty_table_read_keeps_schema(table, spark):
    table.append(_df(spark, []))
    df = table.read()
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["k", "v"]


def test_commit_files_always_complete(table, spark):
    """Every published version file parses — the os.link publish means a
    version name can never exist with empty/partial content, and losers of
    the race leave no tmp droppings behind."""
    table.append(_df(spark, [(1, "a")]))
    # a rival wins version 1; our commit must cleanly lose and rebase
    rival = table._write_data_files(_df(spark, [(2, "b")]))
    assert table._try_commit(1, {"action": "append", "add": rival, "remove": []})
    table.append(_df(spark, [(3, "c")]))  # rebases onto v2
    for p in glob.glob(os.path.join(table.root, "_txlog", "*.json")):
        with open(p) as f:
            json.load(f)  # raises on torn content
    assert not glob.glob(os.path.join(table.root, "_txlog", "*.tmp"))
    assert _rows(table.read()) == [(1, "a"), (2, "b"), (3, "c")]


def test_vacuum_spares_inflight_writer(table, spark):
    """Retention window: a concurrent writer's staged-but-uncommitted data
    dir survives default vacuum, so its commit stays readable."""
    table.append(_df(spark, [(1, "a")]))
    staged = table._write_data_files(_df(spark, [(2, "b")]))  # in-flight writer
    assert table.vacuum() == []  # young dir: skipped, not treated as orphan
    table._commit({"action": "append", "add": staged, "remove": []})
    assert _rows(table.read()) == [(1, "a"), (2, "b")]


def test_concurrent_writers_no_lost_updates(table, spark):
    """Two writers racing 50 appends: every append lands exactly once (the
    optimistic-concurrency loop rebases losers instead of dropping them)."""
    import threading

    n_each, errors = 25, []

    def writer(offset: int) -> None:
        try:
            for i in range(n_each):
                table.append(_df(spark, [(offset + i, f"w{offset}")]))
        except Exception as e:  # surface in the main thread
            errors.append(e)

    threads = [threading.Thread(target=writer, args=(off,)) for off in (0, 1000)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    assert table.latest_version() == 2 * n_each - 1  # every commit got a version
    got = _rows(table.read())
    assert len(got) == 2 * n_each  # no lost updates
    assert {k for k, _ in got} == set(range(n_each)) | set(range(1000, 1000 + n_each))


def test_streaming_sink_composes(table, spark, tmp_path):
    """foreachBatch + TxTable.append = exactly-once-visible micro-batches."""
    src = spark.readStream.format("rate").option("rowsPerSecond", "50").load()
    q = (
        src.select(F.col("value").alias("k"), F.lit("s").alias("v"))
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .foreachBatch(lambda df, epoch: table.append(df))
        .start()
    )
    q.awaitTermination(60)
    assert table.latest_version() >= 0
    got = _rows(table.read())
    assert got == sorted(set(got))  # no dup, no partial batch


def test_vacuum_sweeps_aged_commit_tmp_droppings(spark, tmp_path):
    # a writer that dies between tmp-write and os.link leaves
    # _txlog/NNNNNNNN.json.<hex>.tmp forever; vacuum reclaims aged ones
    import os
    import time as _time

    t = TxTable(spark, str(tmp_path / "t"))
    t.append(spark.range(3))
    tmp = os.path.join(str(tmp_path / "t"), "_txlog", "00000099.json.deadbeef.tmp")
    with open(tmp, "w") as f:
        f.write("{}")
    old = _time.time() - 7200
    os.utime(tmp, (old, old))
    t.vacuum(retention_seconds=3600)
    assert not os.path.exists(tmp)
    assert t.read().count() == 3  # table itself untouched
