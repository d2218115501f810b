"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched pandas UDFs over
``mapInPandas``.

The Spark-side machinery — schema, partitioning, UDF signatures, batch
shapes — is real and tested; the media *decode* itself is stubbed behind
``_decode_image`` (the codec libraries are not in this container), clearly
marked and swappable: a deployment installs pillow/av and replaces one
function. The reference's closest analog is its photo-count JSON pipeline
(``/root/reference/Photos/makeit.rb:9-25``) — media handled as opaque blobs
plus extracted tabular metadata.

Design points for 100 TB:
- media bytes never leave the executor except as Arrow batches;
- ``mapInPandas`` streams batch-iterators, so one task never materializes
  its whole partition of blobs;
- feature rows are small and columnar — the shuffle after extraction moves
  features, not media;
- frame sampling is deterministic (stride on content length, no RNG).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _decode_image(content: bytes) -> list[float]:
    """STUB — real deployments replace this with a pillow/torchvision decode.

    Deterministic fake: an 8-bucket byte histogram, normalized. Keeps every
    downstream contract (shape, dtype, determinism) honest without codec
    libraries in the container.
    """
    if not content:
        return [0.0] * 8
    hist = [0] * 8
    for b in content:
        hist[b >> 5] += 1
    n = float(len(content))
    return [round(h / n, 6) for h in hist]


def extract_media_features(df: DataFrame, batch_hint: int = 64) -> DataFrame:
    """media rows → small feature rows via mapInPandas (batch iterator in,
    batch iterator out; blobs never collected)."""
    import hashlib

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                    "content_hash": content.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest() if b is not None else None
                    ),
                    "feature": content.map(
                        lambda b: _decode_image(bytes(b)) if b is not None else None
                    ),
                }
            )

    return df.mapInPandas(gen, FEATURE_SCHEMA)


def sample_video_frames(df: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Deterministic frame sampling: emit one row per sampled offset
    (stand-in for per-frame decode; the offsets ARE the contract a real
    decoder slots into). Output explodes rows — done JVM-side with
    ``sequence`` + ``explode``; only the offset math touches the blob size."""
    with_n = df.withColumn("n_bytes", F.length("content").cast("long"))
    return (
        with_n.withColumn(
            "frame_offset",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("n_bytes") - 1, F.lit(0)),
                    F.lit(every_n_bytes),
                )
            ),
        )
        .select("media_id", "kind", "n_bytes", "frame_offset")
    )
