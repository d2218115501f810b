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
   made a manifest commit — a crashed writer's orphans, or (the common,
   *transient* case) a live writer's files observed in the gap between its
   parquet write and its manifest commit. The file-stream source marks every
   file it reads as consumed, so simply dropping uncommitted rows would lose
   them forever once their commit lands. Each micro-batch therefore
   **defers** them instead: uncommitted file paths are recorded in a sidecar
   under the stream checkpoint directory, and every subsequent micro-batch
   re-reads any deferred file that has since appeared in the manifest and
   applies its rows together with the batch's own committed rows. Files that
   never get committed are never applied (true orphans just sit in the
   sidecar). Crash safety: the sidecar is written only after the engine's
   atomic commit; a crash in between re-applies the deferred rows in the
   next batch, which is harmless because the LWW merge is idempotent —
   re-upserting identical (url, warc_ts, seq) rows cannot change the argmax.
   (A deferred file the source later redelivers normally is likewise applied
   twice across batches — state-safe, but the observational ``events_in`` /
   per-batch metrics count its rows in both batches.)

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

import json
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

    # ------------------------------------------------- deferred-file sidecar

    @property
    def _deferred_path(self) -> str:
        return os.path.join(self.checkpoint_dir, "deferred_files.json")

    def _load_sidecar(self) -> dict:
        try:
            with open(self._deferred_path) as fh:
                data = json.load(fh)
        except (FileNotFoundError, json.JSONDecodeError):
            return {"deferred": [], "settled": {}}
        if isinstance(data, list):  # pre-r4 sidecar: bare deferred list
            return {"deferred": data, "settled": {}}
        return data

    def _load_deferred(self) -> list[str]:
        return self._load_sidecar()["deferred"]

    def _save_sidecar(self, deferred: list[str], settled: dict) -> None:
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        tmp = self._deferred_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"deferred": sorted(set(deferred)), "settled": settled}, fh)
        os.replace(tmp, self._deferred_path)

    def _scan_data_dir(
        self, data_dir: str, committed: set[str], settled: dict
    ) -> tuple[set[str], dict]:
        """List parquet files under the ledger data dir WITHOUT re-walking
        snapshot directories that are already settled.

        Ledger writes are write-once: every commit lands in a fresh
        ``data/snap-*`` directory and the manifest commit happens only after
        the parquet write finishes, so once every file observed inside a snap
        dir is in the manifest, that dir will never gain another file. Such
        dirs' listings are cached in the sidecar (``settled``) and reused, so
        a long-lived ledger costs O(new files) per micro-batch instead of an
        O(total files) driver-side walk. Returns (on_disk, new_settled).
        """
        on_disk: set[str] = set()
        new_settled: dict = {}
        try:
            entries = list(os.scandir(data_dir))
        except FileNotFoundError:
            return on_disk, new_settled
        for e in entries:
            if e.is_file():
                if e.name.endswith(".parquet"):
                    on_disk.add(e.path)
                continue
            cached = settled.get(e.name)
            if cached is not None:
                on_disk.update(os.path.join(e.path, rel) for rel in cached)
                new_settled[e.name] = cached
                continue
            rels = sorted(
                os.path.relpath(os.path.join(root, fn), e.path)
                for root, _dirs, fns in os.walk(e.path)
                for fn in fns
                if fn.endswith(".parquet")
            )
            paths = [os.path.join(e.path, rel) for rel in rels]
            on_disk.update(paths)
            if rels and all(p in committed for p in paths):
                new_settled[e.name] = rels
        return on_disk, new_settled

    # ------------------------------------------------------------ the sink

    def _apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # refresh the manifest; split this batch's rows into committed files
        # (apply now) vs not-yet-committed files (defer — the source has
        # already marked them consumed, so dropping them would be silent
        # permanent loss when their manifest commit lands a moment later)
        self.engine.ledger = self.engine.ledger.refresh()
        committed = {
            os.path.join(self.engine.ledger.path, f["path"])
            for f in self.engine.ledger.manifest.files
        }
        committed_uris = [f"file://{p}" for p in committed] + list(committed)
        batch_df = batch_df.withColumn("_src", F.input_file_name())
        # deferred files from earlier batches whose commit has since landed
        sidecar = self._load_sidecar()
        deferred = sidecar["deferred"]
        ready = [p for p in deferred if p in committed]
        still_deferred = [p for p in deferred if p not in committed]
        # uncommitted files by driver-side directory-vs-manifest diff —
        # incremental listing (settled snap dirs are never re-walked; see
        # _scan_data_dir), no extra scan over the batch's rows. This may
        # defer a file the source has not consumed yet (it will also deliver
        # it normally later); the resulting double-apply is a STATE no-op
        # because the LWW argmax over identical rows is idempotent, but the
        # observational events_in / per-batch metrics count the file's rows
        # in both batches — lineage consumers should expect that.
        data_dir = os.path.join(self.engine.ledger.path, "data")
        on_disk, settled = self._scan_data_dir(
            data_dir, committed, sidecar["settled"]
        )
        new_orphans = sorted(on_disk - committed - set(still_deferred))

        events = self._field_id_mapping(
            batch_df.filter(F.col("_src").isin(committed_uris)).drop("_src")
        )
        if ready:
            # re-read now-committed deferred files under the same superset
            # schema + field-id mapping the stream itself uses
            replay = self.spark.read.schema(self._superset_schema()).parquet(*ready)
            events = events.unionByName(self._field_id_mapping(replay))

        # Same merge path as the batch engine; the stream batch id is
        # committed atomically with the data so a foreachBatch retry of an
        # already-committed micro-batch short-circuits (exactly-once). The
        # sidecar updates only after a real commit: a crash between commit
        # and sidecar write re-applies `ready` next batch, which the LWW
        # merge makes a no-op (idempotent argmax on identical rows).
        applied = self.engine.apply_events(events, stream_batch_id=batch_id)
        if applied:
            self._save_sidecar(still_deferred + new_orphans, settled)
            # retention GC on the tail (the path that actually runs forever):
            # a stream committing one snapshot per micro-batch grows metadata
            # O(batches x files) unless bounded. Same contract as the batch
            # loop — state and resume unaffected, keep_last sized to cover
            # downstream changelog/IVM consumers' refresh cadence.
            if self.cfg.retain_snapshots:
                self.engine.pages.expire_snapshots(
                    keep_last=self.cfg.retain_snapshots
                )
        else:
            # foreachBatch retry of an already-committed micro-batch:
            # `ready` was NOT re-applied this time, so it must STAY deferred
            # (its rows may never have been applied if its commit landed
            # after the original attempt). Newly observed orphans are still
            # persisted — dropping them here would let a file consumed in
            # this retried batch, whose manifest commit lands before the
            # next walk, skip orphan classification forever (silent loss).
            self._save_sidecar(still_deferred + ready + new_orphans, settled)

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

    def drain_deferred(self) -> int:
        """Apply any deferred files whose manifest commit has since landed
        WITHOUT waiting for a next micro-batch (an availableNow drain ends
        when the source is empty, so a commit that lands after the last
        batch would otherwise wait for the next stream run). Returns the
        number of files applied. Idempotent (LWW argmax)."""
        self.engine.ledger = self.engine.ledger.refresh()
        committed = {
            os.path.join(self.engine.ledger.path, f["path"])
            for f in self.engine.ledger.manifest.files
        }
        sidecar = self._load_sidecar()
        deferred = sidecar["deferred"]
        ready = [p for p in deferred if p in committed]
        if ready:
            replay = self.spark.read.schema(self._superset_schema()).parquet(*ready)
            self.engine.apply_events(self._field_id_mapping(replay))
        self._save_sidecar(
            [p for p in deferred if p not in committed], sidecar["settled"]
        )
        return len(ready)

    def _last_stream_id(self) -> int:
        return int(
            self.engine.pages.manifest.properties.get("last_stream_batch_id", "-1")
        )

    def run_to_completion(self, timeout_s: int = 600) -> None:
        before = self._last_stream_id()
        q = self.start(available_now=True)
        q.awaitTermination(timeout_s)
        if q.isActive:
            q.stop()
        self.drain_deferred()
        # cadence registry row, like the batch loop's run() (the streaming
        # tail is the reference's "Run Time" frequency class)
        self.engine.schedule.record(
            os.path.basename(self.cfg.pages_path.rstrip("/")),
            self.cfg.schedule_frequency,
            self._last_stream_id() - before,
        )
