"""Structured Streaming variant of the CDC apply loop.

The batch engine (cdc/engine.py) replays deterministic offset ranges — that
is the north rule's verification mode (identical snapshot at any parallelism
/ batch slicing). This module is the *production tail* mode: a
``readStream`` over the ledger's data directory with ``foreachBatch``
applying each micro-batch through the SAME merge/dedup code path, plus an
event-time watermark for late-data accounting.

Semantics note: foreachBatch micro-batch boundaries are not deterministic
across runs — exactly-once still holds (the lake commit is atomic and LWW is
associative/commutative, so any batching reaches the same final state; see
test_batch_size_invariance), but per-batch metrics rows differ run-to-run.
The reference's idiom mapping is SURVEY.md §2.11: fixed lookback windows →
watermark, rename-swap publish → atomic snapshot commit, high-water-mark
table → checkpointLocation + in-manifest offsets.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..cdc.engine import CdcEngine, EngineConfig


class StreamingCdcApply:
    """Tail a ledger directory as a file stream and upsert into the lake.

    Uses ``availableNow`` trigger by default (drain-what-exists, then stop)
    so tests and sandbox runs terminate; pass ``available_now=False`` for a
    continuous tail.
    """

    def __init__(self, spark: SparkSession, cfg: EngineConfig,
                 checkpoint_dir: str | None = None,
                 watermark: str = "1 hour"):
        self.spark = spark
        self.cfg = cfg
        self.engine = CdcEngine(spark, cfg)
        self.checkpoint_dir = checkpoint_dir or cfg.pages_path + "_stream_ckpt"
        self.watermark = watermark

    def _apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # Same merge path as the batch engine; the stream batch id is
        # committed atomically with the data so a foreachBatch retry of an
        # already-committed micro-batch short-circuits (exactly-once).
        self.engine.apply_events(batch_df, stream_batch_id=batch_id)

    def start(self, available_now: bool = True):
        ledger_glob = os.path.join(self.cfg.ledger_path, "data")
        schema = self.engine.ledger.schema()
        reader = (
            self.spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "*.parquet")
            .parquet(ledger_glob)
        )
        stream = reader.withWatermark("warc_ts", self.watermark)
        writer = (
            stream.writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def run_to_completion(self, timeout_s: int = 600) -> None:
        q = self.start(available_now=True)
        q.awaitTermination(timeout_s)
        if q.isActive:
            q.stop()
