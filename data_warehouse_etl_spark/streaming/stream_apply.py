"""Structured Streaming variant of the CDC apply loop.

The batch engine (cdc/engine.py) replays deterministic offset ranges — that
is the north rule's verification mode (identical snapshot at any parallelism
/ batch slicing). This module is the *production tail* mode: a
``readStream`` over the ledger's data directory with ``foreachBatch``
applying each micro-batch through the SAME merge/dedup code path.

Manifest-faithful streaming (the two hazards of a naive file stream):

1. **Schema evolution.** A fixed current-schema ``readStream`` silently
   nulls out renamed columns in pre-evolution files (a file with ``lang``
   read under a schema expecting ``language``). The stream instead reads the
   SUPERSET of every historical schema version's columns and, per micro-
   batch, coalesces each current field across its historical names by field
   id (newest first) — the streaming analog of ``LakeTable.read``'s
   field-id mapping.
2. **Uncommitted files.** The data directory may contain files that never
   made a manifest commit (crashed writer's orphans). Each micro-batch is
   filtered to paths present in the ledger manifest (refreshed per batch),
   so orphans are consumed-and-dropped, never applied.

Late data: a ``withWatermark`` on a ``foreachBatch`` sink with no stateful
aggregation is a no-op, so the watermark law is enforced inside
``CdcEngine.apply_events`` (the same max(warc_ts) − ``watermark_delay_s``
filter the batch loop uses) — set ``EngineConfig.watermark_delay_s``.

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
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..cdc.engine import CdcEngine, EngineConfig
from ..lake.table import _spark_type


class StreamingCdcApply:
    """Tail a ledger directory as a file stream and upsert into the lake.

    Uses ``availableNow`` trigger by default (drain-what-exists, then stop)
    so tests and sandbox runs terminate; pass ``available_now=False`` for a
    continuous tail.
    """

    def __init__(self, spark: SparkSession, cfg: EngineConfig,
                 checkpoint_dir: str | None = None):
        self.spark = spark
        self.cfg = cfg
        self.engine = CdcEngine(spark, cfg)
        self.checkpoint_dir = checkpoint_dir or cfg.pages_path + "_stream_ckpt"

    # ------------------------------------------------------- schema mapping

    def _superset_schema(self) -> T.StructType:
        """Union of every historical schema version's (name, type) columns —
        a file of ANY schema version reads losslessly under it (absent
        columns are null, present ones keep their values)."""
        m = self.engine.ledger.manifest
        seen: dict[str, str] = {}
        for _sv, fields in sorted(m.schemas.items()):
            for f in fields:
                seen.setdefault(f.name, f.type)
        return T.StructType(
            [T.StructField(n, _spark_type(t), True) for n, t in seen.items()]
        )

    def _field_id_mapping(self, df: DataFrame) -> DataFrame:
        """Resolve the superset columns to the CURRENT schema by field id:
        each current field takes the first non-null among its historical
        names, newest version first (rename-safe; add-as-null)."""
        m = self.engine.ledger.manifest
        cols = []
        for f in m.current_fields:
            names: list[str] = []
            for _sv, fields in sorted(m.schemas.items(), reverse=True):
                for h in fields:
                    if h.id == f.id and h.name not in names and h.name in df.columns:
                        names.append(h.name)
            src = F.coalesce(*[F.col(n) for n in names]) if names else F.lit(None)
            cols.append(src.cast(_spark_type(f.type)).alias(f.name))
        return df.select(*cols)

    # ------------------------------------------------------------ the sink

    def _apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # refresh the manifest and drop rows from files that never made a
        # commit (orphans); then map historical columns to the current schema
        self.engine.ledger = self.engine.ledger.refresh()
        committed = {
            os.path.join(self.engine.ledger.path, f["path"])
            for f in self.engine.ledger.manifest.files
        }
        batch_df = batch_df.withColumn("_src", F.input_file_name())
        batch_df = batch_df.filter(
            F.col("_src").isin([f"file://{p}" for p in committed] + list(committed))
        ).drop("_src")
        events = self._field_id_mapping(batch_df)
        # Same merge path as the batch engine; the stream batch id is
        # committed atomically with the data so a foreachBatch retry of an
        # already-committed micro-batch short-circuits (exactly-once).
        self.engine.apply_events(events, stream_batch_id=batch_id)

    def start(self, available_now: bool = True):
        ledger_glob = os.path.join(self.cfg.ledger_path, "data")
        reader = (
            self.spark.readStream.schema(self._superset_schema())
            .option("recursiveFileLookup", "true")
            .option("pathGlobFilter", "*.parquet")
            .parquet(ledger_glob)
        )
        writer = (
            reader.writeStream.foreachBatch(self._apply_batch)
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
