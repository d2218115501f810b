"""Feed ingest (CSV/JSON/XML) and multimodal column plumbing."""

import pandas as pd
from pyspark.sql import functions as F

from data_warehouse_etl_spark.functions.multimodal import (
    extract_media_features,
    sample_video_frames,
)
from data_warehouse_etl_spark.sources import (
    flatten_json_column,
    parse_xml_feed_udf,
    read_weekly_csv,
)


def test_read_weekly_csv(spark, tmp_path):
    p = tmp_path / "weekly.csv"
    p.write_text(
        "Date,Site Name,Cost\n2015-04-27,alpha,\" $1,234.56 \"\n2015-04-27,beta,$7.00\n"
    )
    df = read_weekly_csv(spark, str(p), money_cols=["Cost"])
    got = {r["Site Name"]: r["Cost"] for r in df.collect()}
    assert got == {"alpha": 1234.56, "beta": 7.0}


def test_flatten_json_column(spark):
    df = spark.createDataFrame(
        [(1, '{"score": {"count": 3}}'), (2, "{}")], "id int, js string"
    )
    out = flatten_json_column(df, "js", ["score.count"])
    got = {r["id"]: r["score_count"] for r in out.collect()}
    assert got == {1: 3.0, 2: 0.0}


def test_parse_xml_feed(spark):
    # shape of the reference's Bing/Booking listing feeds: unique listing ids
    doc = """<feed><listing><id>42</id><name>Caf&#233; A</name><phone>555</phone></listing>
             <listing><id>43</id><name>B</name><phone>556</phone></listing></feed>"""
    df = spark.createDataFrame([(doc,), ("<bad",), (None,)], "doc string")
    out = (
        df.select(F.explode(parse_xml_feed_udf(F.col("doc"))).alias("l"))
        .select("l.listing_id", "l.name")
    )
    got = {r["listing_id"]: r["name"] for r in out.collect()}
    assert got == {"42": "Café A", "43": "B"}


def _media_df(spark):
    rows = [
        (1, "image", b"\x00\x10\x40\x80\xff" * 100, "image/fake", 4, 4, None),
        (2, "video", b"\xaa" * 5000, "video/fake", 16, 16, 2000),
        (3, "image", None, "image/fake", 0, 0, None),
    ]
    from data_warehouse_etl_spark.functions.multimodal import MEDIA_SCHEMA

    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_extract_media_features(spark):
    out = extract_media_features(_media_df(spark)).toPandas()
    byid = out.set_index("media_id")
    assert byid.loc[1, "n_bytes"] == 500
    feat = byid.loc[1, "feature"]
    assert len(feat) == 8 and abs(sum(feat) - 1.0) < 1e-3
    assert byid.loc[3, "feature"] is None or pd.isna(byid.loc[3, "feature"])
    # determinism: same content → same hash and feature
    out2 = extract_media_features(_media_df(spark)).toPandas().set_index("media_id")
    assert out2.loc[1, "content_hash"] == byid.loc[1, "content_hash"]
    assert list(out2.loc[1, "feature"]) == list(feat)


def test_sample_video_frames(spark):
    out = sample_video_frames(_media_df(spark).filter("media_id = 2"), every_n_bytes=1024)
    offs = sorted(r["frame_offset"] for r in out.collect())
    assert offs == [0, 1024, 2048, 3072, 4096]


def test_xml_feed_export_roundtrip(spark):
    """Feed production side (S7): export listings → XML docs with
    LWW-enforced unique ids, re-parse with parse_xml_feed_udf, get exactly
    the deduped listing set back (XSD uniqueness + lossless round-trip,
    including XML-special characters)."""
    from data_warehouse_etl_spark.sources import export_xml_feed, parse_xml_feed_udf
    from pyspark.sql import functions as F

    rows = [
        ("L1", "Café <Central> & Co", "555-0001", 2),
        ("L1", "stale name", "555-9999", 1),  # older version: LWW must drop it
        ("L2", "Plain", None, 1),
        ("L3", 'Quote"s', "555-0003", 1),
    ]
    df = spark.createDataFrame(rows, "listing_id string, name string, phone string, version int")
    docs = export_xml_feed(df, n_docs=2, order_cols=["version"])
    assert docs.count() <= 2

    parsed = (
        docs.select(F.explode(parse_xml_feed_udf("xml")).alias("l"))
        .select("l.listing_id", "l.name", "l.phone")
        .collect()
    )
    got = {(r.listing_id, r.name, r.phone) for r in parsed}
    assert got == {
        ("L1", "Café <Central> & Co", "555-0001"),
        ("L2", "Plain", None),
        ("L3", 'Quote"s', "555-0003"),
    }
