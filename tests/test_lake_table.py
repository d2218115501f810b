"""LakeTable: atomic snapshots, bucket pruning, field-id schema evolution."""

import os

from pyspark.sql import functions as F

from data_warehouse_etl_spark.lake import LakeTable, state_hash

SCHEMA = [("url", "string"), ("v", "int")]


def _rows(df):
    return {(r["url"], r["v"]) for r in df.collect()}


def test_create_append_read(spark, tmp_lake):
    t = LakeTable.create(os.path.join(tmp_lake, "t"), SCHEMA, bucket_col="url", num_buckets=4)
    df = spark.createDataFrame([(f"u{i}", i) for i in range(20)], "url string, v int")
    t.append(df)
    assert _rows(t.read(spark)) == {(f"u{i}", i) for i in range(20)}
    # snapshot isolation: a handle loaded before a second append still reads v1
    old = LakeTable.load(t.path)
    t.append(spark.createDataFrame([("u99", 99)], "url string, v int"))
    assert len(_rows(old.read(spark))) == 20
    assert len(_rows(t.read(spark))) == 21


def test_bucket_pruning_and_overwrite(spark, tmp_lake):
    t = LakeTable.create(os.path.join(tmp_lake, "t"), SCHEMA, bucket_col="url", num_buckets=4)
    df = spark.createDataFrame([(f"u{i}", i) for i in range(40)], "url string, v int")
    t.append(df)
    # compute which bucket u3 belongs to, read only that bucket, find u3 there
    b3 = df.filter(F.col("url") == "u3").select(t.bucket_expr()).collect()[0][0]
    pruned = t.read(spark, buckets=[b3])
    assert ("u3", 3) in _rows(pruned)
    assert len(_rows(pruned)) < 40  # actually pruned

    # copy-on-write: bump v for every url in bucket b3 only
    newb = t.read(spark, buckets=[b3]).withColumn("v", F.col("v") + 1000)
    t.overwrite_buckets(newb, [b3])
    all_rows = dict(_rows(t.read(spark)))
    assert all_rows["u3"] == 1003
    assert all_rows["u4"] == 4 or all_rows["u4"] == 1004  # depends on u4's bucket
    # rows outside b3 untouched
    outside = [u for u, v in all_rows.items() if v < 1000]
    assert outside, "some rows must live outside the overwritten bucket"


def test_replace_and_properties(spark, tmp_lake):
    t = LakeTable.create(os.path.join(tmp_lake, "t"), SCHEMA, bucket_col="url", num_buckets=2)
    t.append(spark.createDataFrame([("a", 1)], "url string, v int"))
    t.replace(
        spark.createDataFrame([("b", 2)], "url string, v int"),
        properties_update={"batch": "7"},
    )
    assert _rows(t.read(spark)) == {("b", 2)}
    assert LakeTable.load(t.path).manifest.properties["batch"] == "7"


def test_schema_evolution_add_and_rename(spark, tmp_lake):
    t = LakeTable.create(os.path.join(tmp_lake, "t"), SCHEMA, bucket_col="url", num_buckets=2)
    t.append(spark.createDataFrame([("a", 1)], "url string, v int"))
    t.add_column("fetch_status", "int")
    t.rename_column("v", "version")
    # old file resolves by field id: v -> version, fetch_status -> null
    t.append(
        spark.createDataFrame([("b", 2, 200)], "url string, version int, fetch_status int")
    )
    got = {r["url"]: (r["version"], r["fetch_status"]) for r in t.read(spark).collect()}
    assert got == {"a": (1, None), "b": (2, 200)}
    # reload from disk sees the same evolved view (manifest round-trip)
    got2 = {r["url"]: (r["version"], r["fetch_status"]) for r in
            LakeTable.load(t.path).read(spark).collect()}
    assert got2 == got


def test_state_hash_order_insensitive(spark):
    a = spark.createDataFrame([("a", 1), ("b", 2)], "url string, v int")
    b = spark.createDataFrame([("b", 2), ("a", 1)], "url string, v int").repartition(3)
    assert state_hash(a) == state_hash(b)
    c = spark.createDataFrame([("a", 1), ("b", 3)], "url string, v int")
    assert state_hash(a) != state_hash(c)


def test_lock_break_toctou_restores_live_lock(tmp_path, monkeypatch):
    """Round-4 ADVICE fix: a breaker that stats the lock as stale but then
    renames a FRESH lock (one recreated in its stat->rename window by another
    breaker + new committer) must detect the hijack on re-stat, restore the
    live lock, and report the slot held — never admit two committers."""
    import time

    import pytest

    lock = str(tmp_path / "commit.lock")
    fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    os.close(fd)
    real_getmtime = os.path.getmtime

    def fake_getmtime(p):
        # the pre-rename stat (lock path) reports a stale age; the re-stat of
        # the renamed copy reports its TRUE fresh mtime — exactly the TOCTOU
        if p == lock:
            return time.time() - 400.0
        return real_getmtime(p)

    monkeypatch.setattr("os.path.getmtime", fake_getmtime)
    with pytest.raises(RuntimeError, match="concurrent commit in progress"):
        LakeTable._acquire_lock(lock)
    # the live lock was put back, not stolen or unlinked
    assert os.path.exists(lock)
