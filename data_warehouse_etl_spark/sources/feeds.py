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
