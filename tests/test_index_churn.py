"""Randomized-but-seeded churn stress for the incremental index upserts
(round 5 — VERDICT r4 item 7): after EVERY one of 20 mixed batches (new
vectors, moved vectors, same-value rewrites), the incrementally-maintained
layout must equal a from-scratch rebuild of the same corpus state — the
CDC-maintains-the-index story made load-bearing, the same
replay-to-identical-snapshot law the engine's north rule applies to pages
(SURVEY.md §1.3 field-id-evolution analog: incremental maintenance replaces
the reference's rebuild-and-rename idiom,
``/root/reference/Sql Scripts/FCT_RESERVATION_UPD.sql:167-256``)."""

import os
import random

import pandas as pd
import pytest

from data_warehouse_etl_spark.functions.similarity import (
    build_ivf_index,
    build_srp_index,
    ivf_index_upsert,
    srp_index_upsert,
)

SF_DIR = "/root/testdata/sf0.001"
N_BATCHES = 20
SCHEMA = "vec_id bigint, label int, embedding array<float>"


def _corpus(spark):
    df = pd.read_parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    return {
        int(r.vec_id): (int(r.label), [float(x) for x in r.embedding])
        for r in df.itertuples()
    }


def _batches(corpus, rng, n_batches):
    """Seeded mixed batches mutating `corpus` in place: moves (negated
    embedding -> bucket flip), brand-new ids, and same-value rewrites."""
    dim = len(next(iter(corpus.values()))[1])
    next_id = max(corpus) + 1
    for _ in range(n_batches):
        batch = []
        for vid in rng.sample(sorted(corpus), k=rng.randint(2, 6)):  # movers
            lbl, emb = corpus[vid]
            emb2 = [-x for x in emb]
            corpus[vid] = (lbl, emb2)
            batch.append((vid, lbl, emb2))
        for _ in range(rng.randint(0, 2)):  # new vectors
            emb = [round(rng.uniform(-1, 1), 4) for _ in range(dim)]
            corpus[next_id] = (rng.randint(0, 24), emb)
            batch.append((next_id, corpus[next_id][0], emb))
            next_id += 1
        for vid in rng.sample(sorted(corpus), k=rng.randint(0, 2)):  # no-ops
            lbl, emb = corpus[vid]
            batch.append((vid, lbl, emb))
        # LWW within the batch: keep the LAST occurrence of a key, matching
        # the upsert's drop-ids-then-union semantics
        dedup = {}
        for row in batch:
            dedup[row[0]] = row
        yield list(dedup.values())


def _layout_state(spark, layout_dir, part_col):
    rows = spark.read.parquet(layout_dir).collect()
    return sorted(
        (int(r["vec_id"]), int(r["label"]), tuple(r["embedding"]), int(r[part_col]))
        for r in rows
    )


def _write_corpus(corpus, path):
    # float32 embeddings, matching both the source parquet and what the
    # upsert path stores (createDataFrame array<float>) — the comparison is
    # exact, so the rebuild source must go through the same double->float32
    # IEEE conversion
    import pyarrow as pa
    import pyarrow.parquet as papq

    items = sorted(corpus.items())
    t = pa.table(
        {
            "vec_id": pa.array([v for v, _ in items], pa.int64()),
            "label": pa.array([lbl for _, (lbl, _) in items], pa.int32()),
            "embedding": pa.array(
                [emb for _, (_, emb) in items], pa.list_(pa.float32())
            ),
        }
    )
    papq.write_table(t, path)


@pytest.mark.parametrize("kind", ["srp", "ivf"])
def test_churned_index_equals_rebuild_every_batch(spark, tmp_path, kind):
    build, upsert, layout, part_col = {
        "srp": (build_srp_index, srp_index_upsert, "buckets", "srp_bucket"),
        "ivf": (build_ivf_index, ivf_index_upsert, "cells", "label"),
    }[kind]
    idx = build(spark, SF_DIR, index_dir=str(tmp_path / "live"))
    corpus = _corpus(spark)
    rng = random.Random(20240817)
    src2 = str(tmp_path / "corpus.parquet")
    rebuild_dir = str(tmp_path / "rebuild")

    for i, batch in enumerate(_batches(corpus, rng, N_BATCHES)):
        upsert(spark, idx, spark.createDataFrame(batch, SCHEMA))
        # from-scratch oracle: rebuild the whole index from the current
        # corpus state and demand identical layout content AND identical
        # assign sidecar
        _write_corpus(corpus, src2)
        fake_sf = str(tmp_path / "sf")
        os.makedirs(fake_sf, exist_ok=True)
        os.replace(src2, os.path.join(fake_sf, "embeddings.parquet"))
        build(spark, fake_sf, index_dir=rebuild_dir, force=True)

        got = _layout_state(spark, os.path.join(idx, layout), part_col)
        want = _layout_state(spark, os.path.join(rebuild_dir, layout), part_col)
        assert got == want, f"{kind} batch {i}: layout diverged from rebuild"
        a_got = sorted(
            (int(r["vec_id"]), int(r[part_col]))
            for r in spark.read.parquet(os.path.join(idx, "assign")).collect()
        )
        assert a_got == sorted((v, b) for v, _, _, b in got), (
            f"{kind} batch {i}: assign sidecar diverged from layout"
        )
        if kind == "ivf":
            # the incrementally-refreshed centroid relation must equal the
            # rebuild's (both use the same ROUND(AVG) construction)
            c_got = sorted(
                (int(r["label"]), tuple(r["cv"]))
                for r in spark.read.parquet(os.path.join(idx, "centroids")).collect()
            )
            c_want = sorted(
                (int(r["label"]), tuple(r["cv"]))
                for r in spark.read.parquet(
                    os.path.join(rebuild_dir, "centroids")
                ).collect()
            )
            assert c_got == c_want, f"ivf batch {i}: centroids diverged"

    # after the churn the live index holds every corpus row exactly once
    ids = [v for v, _, _, _ in _layout_state(spark, os.path.join(idx, layout), part_col)]
    assert ids == sorted(corpus)


@pytest.mark.parametrize("kind", ["srp", "ivf"])
def test_index_follows_lake_changelog(spark, tmp_path, kind):
    """The full CDC->index loop (round 5): an embeddings MoR LakeTable takes
    insert/update/DELETE commits; after each commit the materialized layout
    is synced from ``LakeTable.read_changes`` via
    ``{srp,ivf}_index_sync_changelog`` and must equal a from-scratch rebuild
    of the table's live view — deletes leave their partition (tombstone rows
    in the upsert drop set). Both changelog image conventions are exercised
    (post-only and pre/post pairs; preimages must be ignored)."""
    from pyspark.sql import functions as F

    from data_warehouse_etl_spark.functions.similarity import (
        ivf_index_sync_changelog,
        srp_index_sync_changelog,
    )
    from data_warehouse_etl_spark.lake import LakeTable

    build, sync, layout, part_col = {
        "srp": (build_srp_index, srp_index_sync_changelog, "buckets", "srp_bucket"),
        "ivf": (build_ivf_index, ivf_index_sync_changelog, "cells", "label"),
    }[kind]

    corpus = _corpus(spark)
    lschema = "vec_id bigint, label int, embedding array<float>, _deleted boolean, _v bigint"
    t = LakeTable.create(
        str(tmp_path / "emb"),
        schema=[
            ("vec_id", "bigint"), ("label", "int"),
            ("embedding", "array<float>"), ("_deleted", "boolean"), ("_v", "bigint"),
        ],
        bucket_col="vec_id", num_buckets=8,
        row_key="vec_id", version_cols=["_v"],
    )
    t = t.append(
        spark.createDataFrame(
            [(v, lbl, emb, False, 0) for v, (lbl, emb) in sorted(corpus.items())],
            lschema,
        )
    )

    def live(df):
        return df.filter(~F.coalesce(F.col("_deleted"), F.lit(False)))

    fake_sf = str(tmp_path / "sf")
    os.makedirs(fake_sf, exist_ok=True)
    _write_corpus(corpus, os.path.join(fake_sf, "embeddings.parquet"))
    idx = build(spark, fake_sf, index_dir=str(tmp_path / "live"))
    rebuild_dir = str(tmp_path / "rebuild")

    rng = random.Random(20250818)
    dim = len(next(iter(corpus.values()))[1])
    next_id = max(corpus) + 1
    for i in range(6):
        v_from = t.manifest.version
        ver = i + 1
        batch = []
        for vid in rng.sample(sorted(corpus), k=3):  # movers (bucket flip)
            lbl, emb = corpus[vid]
            emb2 = [-x for x in emb]
            corpus[vid] = (lbl, emb2)
            batch.append((vid, lbl, emb2, False, ver))
        emb = [round(rng.uniform(-1, 1), 4) for _ in range(dim)]  # insert
        corpus[next_id] = (rng.randint(0, 24), emb)
        batch.append((next_id, corpus[next_id][0], emb, False, ver))
        next_id += 1
        for vid in rng.sample(sorted(set(corpus) - {r[0] for r in batch}), k=2):
            del corpus[vid]  # deletes (tombstone delta rows)
            batch.append((vid, None, None, True, ver))
        t = t.append_deltas(spark.createDataFrame(batch, lschema))

        cl = t.read_changes(
            spark, v_from,
            exclude=["_v", "_deleted"], row_filter=live,
            update_images="both" if i % 2 else "post",
        )
        sync(spark, idx, cl)

        _write_corpus(corpus, os.path.join(fake_sf, "embeddings.parquet"))
        build(spark, fake_sf, index_dir=rebuild_dir, force=True)
        got = _layout_state(spark, os.path.join(idx, layout), part_col)
        want = _layout_state(spark, os.path.join(rebuild_dir, layout), part_col)
        assert got == want, f"interval {i}: layout diverged from rebuild"
        a_got = sorted(
            (int(r["vec_id"]), int(r[part_col]))
            for r in spark.read.parquet(os.path.join(idx, "assign")).collect()
        )
        assert a_got == sorted((v, b) for v, _, _, b in got), (
            f"interval {i}: assign sidecar diverged"
        )
        # deleted ids are gone from the layout
        assert {v for v, _, _, _ in got} == set(corpus)
        if kind == "ivf":
            c_got = sorted(
                (int(r["label"]), tuple(r["cv"]))
                for r in spark.read.parquet(os.path.join(idx, "centroids")).collect()
            )
            c_want = sorted(
                (int(r["label"]), tuple(r["cv"]))
                for r in spark.read.parquet(
                    os.path.join(rebuild_dir, "centroids")
                ).collect()
            )
            assert c_got == c_want, f"interval {i}: centroids diverged"
