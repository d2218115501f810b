"""Materialized IVF index (round 3): the probed-cell scan must be
physically partition-pruned, and the indexed query must return exactly the
inline (oracle-shaped) result."""

import os

from data_warehouse_etl_spark.functions.similarity import (
    _centroids_spark,
    _cos_spark,
    _knn_ivf_sql,
    build_ivf_index,
    ivf_cell_scan_df,
    ivf_probed_cells_df,
    q_knn_ivf_probed,
)

SF_DIR = "/root/testdata/sf0.001"


def test_ivf_index_builds_once_and_is_cell_partitioned(spark, tmp_path):
    idx = build_ivf_index(spark, SF_DIR, index_dir=str(tmp_path / "ivf"))
    # layout: one directory per cell under cells/
    cells = [d for d in os.listdir(os.path.join(idx, "cells")) if d.startswith("label=")]
    assert len(cells) >= 2
    # idempotent: second call is a no-op (marker mtime unchanged)
    marker = os.path.join(idx, "_built_from.txt")
    m0 = os.path.getmtime(marker)
    build_ivf_index(spark, SF_DIR, index_dir=str(tmp_path / "ivf"))
    assert os.path.getmtime(marker) == m0


def test_ivf_probed_scan_is_partition_pruned(spark):
    labels = [int(r["label"]) for r in ivf_probed_cells_df(spark, SF_DIR).collect()]
    assert len(labels) == 2
    scan = ivf_cell_scan_df(spark, SF_DIR, labels)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "label" in plan
    # the file-source relation must select only the probed cells' partitions
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "label" in m.group(1), plan[:2000]


def test_ivf_indexed_equals_inline(spark):
    spark.read.parquet(f"{SF_DIR}/embeddings.parquet").createOrReplaceTempView(
        "embeddings_v"
    )
    inline = spark.sql(
        _knn_ivf_sql("embeddings_v", _cos_spark, _centroids_spark("embeddings_v"))
    )
    got = [tuple(r) for r in q_knn_ivf_probed(spark, SF_DIR).collect()]
    want = [tuple(r) for r in inline.collect()]
    assert got == want and len(got) == 10
