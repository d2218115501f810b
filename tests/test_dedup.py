"""LWW dedup unit laws: ordering, tie-break, mode equivalence, skew."""

import pytest
from pyspark.sql import functions as F

from data_warehouse_etl_spark.cdc.dedup import lww_dedup, lww_dedup_salted


@pytest.fixture(scope="module")
def events(spark):
    rows = []
    # url A: ts ties broken by seq; url B: out-of-order ts; hot url H: many rows
    rows += [(1, "A", "2024-01-01 10:00:00", "v1"),
             (2, "A", "2024-01-01 10:00:00", "v2"),   # same ts, higher seq wins
             (3, "B", "2024-01-01 12:00:00", "b-late"),
             (4, "B", "2024-01-01 09:00:00", "b-early")]  # older ts, higher seq loses
    rows += [(100 + i, "H", "2024-01-01 11:00:00", f"h{i}") for i in range(500)]
    df = spark.createDataFrame(rows, "seq long, url string, ts string, payload string")
    return df.withColumn("warc_ts", F.col("ts").cast("timestamp")).drop("ts")


def _winners(df):
    return {r["url"]: r["payload"] for r in df.collect()}


def test_lww_basic_laws(spark, events):
    got = _winners(lww_dedup(events, key="url", order=("warc_ts", "seq")))
    assert got["A"] == "v2"        # tie on warc_ts → seq decides
    assert got["B"] == "b-late"    # warc_ts dominates seq
    assert got["H"] == "h499"      # same ts for all H → max seq


def test_salted_modes_equal_plain(spark, events):
    plain = _winners(lww_dedup(events))
    always = _winners(lww_dedup_salted(events, n_salts=7, hot_threshold=None))
    detect = _winners(lww_dedup_salted(events, n_salts=7, hot_threshold=50))
    nohot = _winners(lww_dedup_salted(events, n_salts=7, hot_threshold=10_000))
    assert plain == always == detect == nohot


def test_salted_partition_invariance(spark, events):
    a = _winners(lww_dedup_salted(events.repartition(1), n_salts=4))
    b = _winners(lww_dedup_salted(events.repartition(16), n_salts=4))
    assert a == b


def test_no_window_sort_in_plan(spark, events):
    """The dedup must be an aggregation (map-side combinable), not a window
    sort — a window would funnel each hot key through one task."""
    plan = lww_dedup_salted(events)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan or "SortAggregate" in plan
