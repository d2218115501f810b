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


def test_ivf_index_upsert_rewrites_cells_and_refreshes_centroids(spark, tmp_path):
    """Incremental maintenance (round 4, twin of the SRP upsert test): an
    upsert batch with one NEW vector and one vector MOVED between cells must
    rewrite exactly the affected cell partitions, refresh exactly those
    cells' centroid rows (value-identical to a recompute over the updated
    cells), and carry every untouched centroid row over unchanged."""
    from data_warehouse_etl_spark.functions.similarity import ivf_index_upsert

    idx = build_ivf_index(spark, SF_DIR, index_dir=str(tmp_path / "ivf"))
    cdir = os.path.join(idx, "cells")

    def listing():
        return {
            d: sorted(f for f in os.listdir(os.path.join(cdir, d)) if f.endswith(".parquet"))
            for d in os.listdir(cdir)
            if d.startswith("label=")
        }

    def centroids():
        return {
            int(r["label"]): tuple(r["cv"])
            for r in spark.read.parquet(os.path.join(idx, "centroids")).collect()
        }

    before, cents_before = listing(), centroids()
    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    v0 = emb.filter("vec_id = 0").first()
    lbl0 = int(v0["label"])
    mover = emb.filter(f"label <> {lbl0}").first()
    old_lbl = int(mover["label"])
    rows = [
        (10**9, lbl0, list(v0["embedding"])),
        (int(mover["vec_id"]), lbl0, list(mover["embedding"])),  # moved cell
    ]
    new_df = spark.createDataFrame(
        rows, "vec_id bigint, label int, embedding array<float>"
    )
    affected = ivf_index_upsert(spark, idx, new_df)
    assert set(affected) == {lbl0, old_lbl}

    after = listing()
    changed = {d for d in set(before) | set(after) if before.get(d) != after.get(d)}
    assert changed == {f"label={lbl0}", f"label={old_lbl}"}, changed

    cents_after = centroids()
    # untouched cells: centroid rows carried over bit-identically (no recompute)
    for lbl, cv in cents_before.items():
        if lbl not in affected:
            assert cents_after[lbl] == cv
    # affected cells: value-identical to a recompute over the updated cells
    spark.read.parquet(cdir).selectExpr(
        "vec_id", "embedding", "CAST(label AS INT) AS label"
    ).filter(f"label IN ({lbl0}, {old_lbl})").createOrReplaceTempView("chk_cells_v")
    want = {
        int(r["label"]): tuple(r["cv"])
        for r in spark.sql(
            "WITH " + _centroids_spark("chk_cells_v").strip()
            + " SELECT label, cv FROM centroids"
        ).collect()
    }
    for lbl in affected:
        assert cents_after[lbl] == want[lbl]

    # the mover left its old cell and sits in the new one
    cells = spark.read.parquet(cdir)
    assert cells.filter(f"label = {old_lbl} AND vec_id = {mover['vec_id']}").count() == 0
    assert cells.filter(f"label = {lbl0} AND vec_id = {mover['vec_id']}").count() == 1
