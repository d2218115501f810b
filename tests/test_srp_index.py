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


def test_srp_index_upsert_rewrites_only_affected_partitions(spark, tmp_path):
    """Incremental maintenance (round 4): an upsert batch with one NEW
    vector and one MOVED vector (embedding changed -> bucket flips) must
    rewrite exactly the affected bucket partitions — every other partition's
    file set is untouched — and the pruned probe scan must see the new
    state."""
    from data_warehouse_etl_spark.functions.similarity import srp_index_upsert

    idx = build_srp_index(spark, SF_DIR, index_dir=str(tmp_path / "srp"))
    bdir = os.path.join(idx, "buckets")

    def listing():
        return {
            d: sorted(f for f in os.listdir(os.path.join(bdir, d)) if f.endswith(".parquet"))
            for d in os.listdir(bdir)
            if d.startswith("srp_bucket=")
        }

    before = listing()
    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    qb = srp_query_bucket(spark, SF_DIR)
    # the probe vector's own embedding -> lands in the probe's bucket
    v0 = list(emb.filter("vec_id = 0").first()["embedding"])
    # a vector currently in the probe's bucket, to MOVE by negating its
    # embedding (sign flips on every hyperplane -> complement bucket 15-qb)
    mover = (
        spark.read.parquet(bdir)
        .filter(f"srp_bucket = {qb} AND vec_id <> 0")
        .select("vec_id", "label", "embedding")
        .first()
    )
    rows = [
        (10**9, 0, v0),
        (int(mover["vec_id"]), int(mover["label"]), [-x for x in mover["embedding"]]),
    ]
    new_df = spark.createDataFrame(
        rows, "vec_id bigint, label int, embedding array<float>"
    )
    affected = srp_index_upsert(spark, idx, new_df)
    assert qb in affected and (15 - qb) in affected

    after = listing()
    changed = {
        d for d in set(before) | set(after) if before.get(d) != after.get(d)
    }
    assert changed == {f"srp_bucket={qb}", f"srp_bucket={15 - qb}"}, changed

    # the probe's pruned scan now surfaces the new vector as the top hit
    # (identical embedding to the probe -> cosine 1.0) and no longer the mover
    got = srp_bucket_scan_df(spark, SF_DIR, qb, index_dir=idx).collect()
    assert got[0]["vec_id"] == 10**9 and abs(got[0]["cosine"] - 1.0) < 1e-6
    assert all(r["vec_id"] != mover["vec_id"] for r in got)
    # the mover landed in its complement bucket with its new embedding
    moved = (
        spark.read.parquet(bdir)
        .filter(f"srp_bucket = {15 - qb} AND vec_id = {int(mover['vec_id'])}")
        .collect()
    )
    assert len(moved) == 1


def test_srp_index_upsert_drops_emptied_bucket(spark, tmp_path):
    """Edge: when an upsert moves EVERY vector out of a bucket, the dynamic
    overwrite has no rows for that partition and would leave its stale files
    — the upsert must drop the emptied directory (buckets/ and assign/) so
    a later probe of that bucket sees nothing."""
    from data_warehouse_etl_spark.functions.similarity import srp_index_upsert

    idx = build_srp_index(spark, SF_DIR, index_dir=str(tmp_path / "srp"))
    bdir = os.path.join(idx, "buckets")
    smallest = min(
        spark.read.parquet(bdir).groupBy("srp_bucket").count().collect(),
        key=lambda r: r["count"],
    )
    b = int(smallest["srp_bucket"])
    victims = (
        spark.read.parquet(bdir)
        .filter(f"srp_bucket = {b}")
        .select("vec_id", "label", "embedding")
        .collect()
    )
    batch = [
        (int(r["vec_id"]), int(r["label"]), [-x for x in r["embedding"]])
        for r in victims
    ]
    new_df = spark.createDataFrame(
        batch, "vec_id bigint, label int, embedding array<float>"
    )
    affected = srp_index_upsert(spark, idx, new_df)
    assert b in affected and (15 - b) in affected
    assert not os.path.exists(os.path.join(bdir, f"srp_bucket={b}"))
    assert not os.path.exists(os.path.join(idx, "assign", f"srp_bucket={b}"))
    # every victim landed in the complement bucket
    ids = ", ".join(str(v[0]) for v in batch)
    got = (
        spark.read.parquet(bdir)
        .filter(f"srp_bucket = {15 - b} AND vec_id IN ({ids})")
        .count()
    )
    assert got == len(batch)


def test_srp_multiprobe_pruned_and_equals_inline(spark):
    """v5 multiprobe: the candidate scan must be partition-pruned to the
    probe's bucket plus its Hamming-1 neighbors (5 of 16 partitions), and
    the indexed result must equal the self-contained inline (oracle) form."""
    from data_warehouse_etl_spark.functions.similarity import (
        _MULTIPROBE_MASKS,
        _knn_lsh_multiprobe_sql,
        _xor_spark,
        q_knn_lsh_multiprobe,
    )

    qb = srp_query_bucket(spark, SF_DIR)
    probes = sorted({qb ^ m for m in _MULTIPROBE_MASKS})
    scan = srp_bucket_scan_df(spark, SF_DIR, probes)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "srp_bucket" in m.group(1) and " IN " in m.group(1), plan[:2000]

    spark.read.parquet(f"{SF_DIR}/embeddings.parquet").createOrReplaceTempView(
        "embeddings_v"
    )
    inline = spark.sql(
        _knn_lsh_multiprobe_sql("embeddings_v", _cos_spark, _srp_bucket_spark, _xor_spark)
    )
    got = [tuple(r) for r in q_knn_lsh_multiprobe(spark, SF_DIR).collect()]
    want = [tuple(r) for r in inline.collect()]
    assert got == want and len(got) == 10
    # multiprobe candidates are a superset of v4's single bucket
    assert {r[3] for r in got} <= set(probes)


def test_srp_upsert_heals_torn_state(spark, tmp_path):
    """Round-5 advisor fix: a crash between the buckets/ overwrite and the
    assign/ sidecar overwrite used to leave assign stale, so a LATER upsert
    of the same vector computed the wrong old-bucket set and the vector
    ended up duplicated across two bucket partitions. The redo log
    (_pending + _pending.json) must let the next upsert detect and redo the
    interrupted apply, leaving exactly one copy of every vector."""
    import shutil

    from data_warehouse_etl_spark.functions.similarity import (
        _redo_paths,
        srp_index_upsert,
    )

    idx = build_srp_index(spark, SF_DIR, index_dir=str(tmp_path / "srp"))
    bdir = os.path.join(idx, "buckets")
    qb = srp_query_bucket(spark, SF_DIR)
    mover = (
        spark.read.parquet(bdir)
        .filter(f"srp_bucket = {qb}")
        .select("vec_id", "label", "embedding")
        .first()
    )
    batch1 = spark.createDataFrame(
        [(int(mover["vec_id"]), int(mover["label"]), [-x for x in mover["embedding"]])],
        "vec_id bigint, label int, embedding array<float>",
    )

    # simulate the torn state: run the full upsert, then restore the OLD
    # assign/ sidecar and resurrect the redo record — exactly the on-disk
    # state of a crash after the buckets/ write and before the assign/ write
    assign = os.path.join(idx, "assign")
    assign_backup = str(tmp_path / "assign_old")
    shutil.copytree(assign, assign_backup)
    affected1 = srp_index_upsert(spark, idx, batch1)
    shutil.rmtree(assign)
    shutil.copytree(assign_backup, assign)
    pend, meta = _redo_paths(idx)
    batch1.selectExpr(
        "*", f"CAST({_srp_bucket_spark('embedding')} AS INT) AS srp_bucket"
    ).write.mode("overwrite").parquet(pend)
    import json as _json

    with open(meta, "w") as fh:
        _json.dump({"affected": affected1}, fh)

    # upsert the same vector again (back to its original embedding): without
    # healing, the stale assign says it still lives in qb, missing the copy
    # in 15-qb -> duplicate. With healing the redo runs first.
    batch2 = spark.createDataFrame(
        [(int(mover["vec_id"]), int(mover["label"]), list(mover["embedding"]))],
        "vec_id bigint, label int, embedding array<float>",
    )
    srp_index_upsert(spark, idx, batch2)
    assert not os.path.exists(meta) and not os.path.exists(pend)

    dups = (
        spark.read.parquet(bdir)
        .groupBy("vec_id")
        .count()
        .filter("count > 1")
        .collect()
    )
    assert dups == []
    back = (
        spark.read.parquet(bdir)
        .filter(f"vec_id = {int(mover['vec_id'])}")
        .collect()
    )
    assert len(back) == 1 and int(back[0]["srp_bucket"]) == qb
    # assign sidecar agrees with the layout again
    arow = (
        spark.read.parquet(os.path.join(idx, "assign"))
        .filter(f"vec_id = {int(mover['vec_id'])}")
        .collect()
    )
    assert len(arow) == 1 and int(arow[0]["srp_bucket"]) == qb


def test_srp_upsert_invalidates_build_stamp(spark, tmp_path):
    """Round-5 advisor fix: after an upsert the index no longer mirrors the
    source parquet, so the build stamp must stop claiming it does — the next
    default build_srp_index() resyncs from source and parity queries stay
    value-identical with the DuckDB oracle (which always reads the source)."""
    from data_warehouse_etl_spark.functions.similarity import srp_index_upsert

    idx = build_srp_index(spark, SF_DIR, index_dir=str(tmp_path / "srp"))
    marker = os.path.join(idx, "_built_from.txt")
    stamp0 = open(marker).read()
    emb = spark.read.parquet(SF_DIR + "/embeddings.parquet")
    v0 = list(emb.filter("vec_id = 0").first()["embedding"])
    srp_index_upsert(
        spark,
        idx,
        spark.createDataFrame(
            [(10**9, 0, v0)], "vec_id bigint, label int, embedding array<float>"
        ),
    )
    assert open(marker).read().startswith("upserted:")
    # a rebuild resyncs from source: stamp restored, upserted vector gone
    build_srp_index(spark, SF_DIR, index_dir=idx)
    assert open(marker).read() == stamp0
    assert (
        spark.read.parquet(os.path.join(idx, "buckets"))
        .filter("vec_id = 1000000000")
        .count()
        == 0
    )


def test_ann_recall_summary_invariants(spark):
    """Pins the recall measurement's structure, not host-dependent values:
    v5's candidate set is a strict superset of v4's (the zero mask is in
    _MULTIPROBE_MASKS) so its recall and scan fraction must both dominate;
    every variant scans a strict subset of the corpus; recall/scan land in
    [0, 1]; lift = recall/scan. Deterministic probe stride => same numbers
    every run at a given sf."""
    from data_warehouse_etl_spark.functions.similarity import ann_recall_summary

    rows = {
        r["variant"]: r
        for r in ann_recall_summary(
            spark, "/root/testdata/sf0.01", k=10, max_probes=25
        ).collect()
    }
    assert set(rows) == {
        "v2_ivf_nprobe1", "v2_knn_ivf_probed", "v2_ivf_nprobe4",
        "v4_knn_lsh_srp", "v5_knn_lsh_multiprobe",
    }
    for r in rows.values():
        assert 0.0 <= r["recall_at_k"] <= 1.0
        assert 0.0 < r["scan_frac"] < 1.0
        assert abs(r["lift"] - round(r["recall_at_k"] / r["scan_frac"], 2)) < 0.02
    v4, v5 = rows["v4_knn_lsh_srp"], rows["v5_knn_lsh_multiprobe"]
    assert v5["recall_at_k"] >= v4["recall_at_k"]
    assert v5["scan_frac"] > v4["scan_frac"]
    # the IVF n_probe curve: candidate supersets => both recall and scan
    # fraction monotone in n_probe
    p1, p2, p4 = (rows[v] for v in
                  ("v2_ivf_nprobe1", "v2_knn_ivf_probed", "v2_ivf_nprobe4"))
    assert p1["recall_at_k"] <= p2["recall_at_k"] <= p4["recall_at_k"]
    assert p1["scan_frac"] < p2["scan_frac"] < p4["scan_frac"]
