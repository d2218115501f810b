"""Feed-boundary ingest: CSV drops, JSON flattening, XML listing feeds.

The reference's ingest surface (SURVEY.md §2.1 S7-S9):
- weekly CSV cost drops with money formatting
  (``/root/reference/MobileWeeklyData20150427.csv:1-5``),
- dotted-key JSON flattened to tabular (``/root/reference/Photos/makeit.rb:9-25``),
- Bing/Google/Booking XML listing feeds whose XSD enforces unique listing
  ids (``/root/reference/BookingRestaurantFeed_XSD_v1.xsd:17-27``).

Spark-first mapping: CSV → ``spark.read.csv`` + regexp cleanup (all JVM-side);
JSON → ``from_json``/``get_json_object``; XML → an Arrow-batched pandas UDF
over the raw document column (stdlib ElementTree; no spark-xml jar needed
offline), with post-parse uniqueness enforcement = the engine's LWW dedup.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_weekly_csv(spark: SparkSession, path: str, money_cols: list[str]) -> DataFrame:
    """CSV weekly drop: header row, money columns like `` $1,234.56 `` →
    double via JVM-side regexp (no UDF)."""
    df = spark.read.csv(path, header=True, inferSchema=False)
    for c in money_cols:
        df = df.withColumn(
            c, F.regexp_replace(F.col(c), r"[$, ]", "").cast("double")
        )
    return df


def flatten_json_column(
    df: DataFrame, json_col: str, keys: list[str], out_prefix: str = ""
) -> DataFrame:
    """Dotted-key JSON → columns (counts.json → report idiom). Missing keys
    default to 0 per the reference's coalesce behavior."""
    for k in keys:
        alias = (out_prefix + k).replace(".", "_")
        df = df.withColumn(
            alias,
            F.coalesce(
                F.get_json_object(F.col(json_col), "$." + k).cast("double"), F.lit(0.0)
            ),
        )
    return df


_LISTING_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("listing_id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("phone", T.StringType()),
        ]
    )
)


@F.pandas_udf(T.StringType())
def render_xml_feed_udf(listings: pd.Series) -> pd.Series:
    """Arrow-batched XML feed renderer: an array of (listing_id, name,
    phone) structs in, one well-formed feed document out (ElementTree does
    the escaping). Inverse of :func:`parse_xml_feed_udf`; listings are
    rendered in listing_id order so the document bytes are deterministic."""

    def render(arr) -> str:
        root = ET.Element("Feed")
        for item in sorted(arr, key=lambda r: r["listing_id"] or ""):
            listing = ET.SubElement(root, "Listing")
            for tag, key in (("Id", "listing_id"), ("Name", "name"), ("Phone", "phone")):
                # a null field is an ABSENT element (not an empty one), so
                # parse(render(x)) == x exactly — empty string ≠ null
                if item[key] is not None:
                    ET.SubElement(listing, tag).text = str(item[key])
        return ET.tostring(root, encoding="unicode")

    return listings.map(render)


def validate_feed_keyrefs(listings: DataFrame, coupons: DataFrame) -> DataFrame:
    """XSD keyref analog: every coupon must reference an exported listing
    (``/root/reference/BookingRestaurantFeed_XSD_v1.xsd:28-36`` couples
    coupon ``RestaurantIds`` to listing ids with ``xs:keyref``). Enforced
    relationally: returns the DANGLING coupons via a left-anti join — empty
    iff the feed validates. One broadcast-able join on listing_id; at
    100 TB the listing side is the dimension, so this is a map-side probe."""
    return coupons.join(
        listings.select("listing_id").distinct(), "listing_id", "left_anti"
    )


def export_xml_feed(
    df: DataFrame,
    n_docs: int = 16,
    order_cols: list[str] | None = None,
    coupons: DataFrame | None = None,
) -> DataFrame:
    """Feed *production* (the reference emits Bing/Google/Booking feeds, not
    just consumes them — ``bing-local-79.xml``, ``BingFeedsEU1.xml``): turn a
    listings DataFrame into ``n_docs`` XML documents with the XSD's
    listing-id uniqueness (``BookingRestaurantFeed_XSD_v1.xsd:17-27``)
    enforced by the engine's LWW primitive before rendering.

    Returns (doc_no int, xml string). Listings shard to documents by
    ``pmod(xxhash64(listing_id), n_docs)`` — deterministic, and each
    document builds from one aggregation group, so document size is bounded
    by sizing n_docs to the listing count (at 100 TB: n_docs ∝ |listings|,
    one shuffle, no driver collect).

    ``coupons`` (optional): a coupon table whose ``listing_id`` column must
    reference an exported listing — the XSD's ``xs:keyref`` constraint
    (``BookingRestaurantFeed_XSD_v1.xsd:28-36``). Dangling references fail
    the export with a ValueError naming offenders (bounded sample), the
    relational analog of schema validation rejecting the document."""
    if coupons is not None:
        bad = validate_feed_keyrefs(df, coupons).limit(5).collect()
        if bad:
            refs = sorted({str(r["listing_id"]) for r in bad})
            raise ValueError(
                f"feed keyref violation: coupons reference unknown listing ids {refs}"
            )
    value_cols = [c for c in df.columns if c != "listing_id"]
    order_cols = order_cols or value_cols
    uniq = (
        df.groupBy("listing_id")
        .agg(
            F.max_by(
                F.struct(*value_cols), F.struct(*[F.col(c) for c in order_cols])
            ).alias("_r")
        )
        .select("listing_id", "_r.*")
    )
    return (
        uniq.withColumn(
            "doc_no", F.pmod(F.xxhash64("listing_id"), F.lit(n_docs)).cast("int")
        )
        .groupBy("doc_no")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("listing_id", "name", "phone"))
            ).alias("listings")
        )
        .select("doc_no", render_xml_feed_udf("listings").alias("xml"))
    )


@F.pandas_udf(_LISTING_SCHEMA)
def parse_xml_feed_udf(xml_doc: pd.Series) -> pd.Series:
    """Arrow-batched XML listing-feed parser: one feed document in, the array
    of (listing_id, name, phone) out. Explode downstream, then dedup listing
    ids with the LWW primitive (the XSD's uniqueness constraint, enforced
    relationally)."""

    def parse(doc: str | None):
        if not doc:
            return []
        try:
            root = ET.fromstring(doc)
        except ET.ParseError:
            return []
        out = []
        for listing in root.iter():
            if listing.tag.lower().endswith("listing"):
                def _find(tag):
                    for child in listing:
                        if child.tag.lower().endswith(tag):
                            return (child.text or "").strip()
                    return None
                lid = _find("id")
                if lid:
                    out.append((lid, _find("name"), _find("phone")))
        return out

    return xml_doc.map(parse)
