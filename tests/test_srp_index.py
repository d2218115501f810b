"""Materialized SRP-LSH index (round 4): the probe-bucket candidate scan
must be physically partition-pruned, and the indexed query must return
exactly the inline (oracle-shaped) result."""

import os
import re

from data_warehouse_etl_spark.functions.similarity import (
    _cos_spark,
    _knn_lsh_sql,
    _srp_bucket_spark,
    build_srp_index,
    q_knn_lsh_srp,
    srp_bucket_scan_df,
    srp_query_bucket,
)

SF_DIR = "/root/testdata/sf0.001"


def test_srp_index_builds_once_and_is_bucket_partitioned(spark, tmp_path):
    idx = build_srp_index(spark, SF_DIR, index_dir=str(tmp_path / "srp"))
    buckets = [
        d for d in os.listdir(os.path.join(idx, "buckets")) if d.startswith("srp_bucket=")
    ]
    assert len(buckets) >= 2
    # idempotent: second call is a no-op (marker mtime unchanged)
    marker = os.path.join(idx, "_built_from.txt")
    m0 = os.path.getmtime(marker)
    build_srp_index(spark, SF_DIR, index_dir=str(tmp_path / "srp"))
    assert os.path.getmtime(marker) == m0


def test_srp_probe_scan_is_partition_pruned(spark):
    qb = srp_query_bucket(spark, SF_DIR)
    assert 0 <= qb < 16  # 4 hyperplanes -> 4-bit bucket
    scan = srp_bucket_scan_df(spark, SF_DIR, qb)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "srp_bucket" in m.group(1), plan[:2000]


def test_srp_indexed_equals_inline(spark):
    spark.read.parquet(f"{SF_DIR}/embeddings.parquet").createOrReplaceTempView(
        "embeddings_v"
    )
    inline = spark.sql(_knn_lsh_sql("embeddings_v", _cos_spark, _srp_bucket_spark))
    got = [tuple(r) for r in q_knn_lsh_srp(spark, SF_DIR).collect()]
    want = [tuple(r) for r in inline.collect()]
    assert got == want and len(got) == 10
