"""Structured Streaming apply reaches the same final state as batch replay."""

import os

from data_warehouse_etl_spark.cdc import CdcEngine, EngineConfig, LedgerSpec, generate_ledger
from data_warehouse_etl_spark.lake import state_hash
from data_warehouse_etl_spark.streaming import StreamingCdcApply

SPEC = LedgerSpec(n_urls=200, n_events=1500, n_parts=2, seed=11)


def test_stream_apply_matches_batch(spark, tmp_path):
    led = generate_ledger(str(tmp_path / "changes"), SPEC)

    batch = CdcEngine(
        spark,
        EngineConfig(ledger_path=led.path, pages_path=str(tmp_path / "pages_batch"),
                     batch_size=400, num_buckets=4),
    )
    batch.run()
    h_batch = state_hash(batch.read_pages())

    streaming = StreamingCdcApply(
        spark,
        EngineConfig(ledger_path=led.path, pages_path=str(tmp_path / "pages_stream"),
                     batch_size=400, num_buckets=4),
    )
    streaming.run_to_completion(timeout_s=300)
    h_stream = state_hash(streaming.engine.refresh_pages())
    assert h_stream == h_batch


def test_stream_batch_retry_is_noop(spark, tmp_path):
    led = generate_ledger(str(tmp_path / "changes"), SPEC)
    eng = CdcEngine(
        spark,
        EngineConfig(ledger_path=led.path, pages_path=str(tmp_path / "pages"),
                     batch_size=400, num_buckets=4),
    )
    events = led.read(spark)
    assert eng.apply_events(events, stream_batch_id=0) is True
    h = state_hash(eng.read_pages())
    # redelivery of the same micro-batch id (Spark's retry contract) is a no-op
    assert eng.apply_events(events, stream_batch_id=0) is False
    assert state_hash(eng.read_pages()) == h
