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
    # the streaming tail records a cadence-registry row like the batch loop
    sched = streaming.engine.schedule.read(spark).collect()
    assert len(sched) >= 1 and sched[0]["batches_applied"] >= 1


def test_stream_apply_matches_batch_on_evolved_ledger(spark, tmp_path):
    """Round-2 regression (ADVICE r1): a fixed current-schema file stream
    nulls out pre-evolution columns ('lang' files read as 'language'=null).
    The stream must map historical columns by field id, like batch reads."""
    spec = LedgerSpec(n_urls=200, n_events=1500, n_parts=2, seed=13, evolve_at_seq=700)
    led = generate_ledger(str(tmp_path / "changes"), spec)

    batch = CdcEngine(
        spark,
        EngineConfig(ledger_path=led.path, pages_path=str(tmp_path / "pages_batch"),
                     batch_size=400, num_buckets=4),
    )
    batch.run()
    h_batch = state_hash(batch.read_pages())
    # sanity: the evolved column carries real values in the batch state
    n_lang = batch.read_pages().filter("language IS NOT NULL").count()
    assert n_lang > 0

    streaming = StreamingCdcApply(
        spark,
        EngineConfig(ledger_path=led.path, pages_path=str(tmp_path / "pages_stream"),
                     batch_size=400, num_buckets=4),
    )
    streaming.run_to_completion(timeout_s=300)
    h_stream = state_hash(streaming.engine.refresh_pages())
    assert h_stream == h_batch
    assert (
        streaming.engine.read_pages().filter("language IS NOT NULL").count() == n_lang
    )


def test_stream_ignores_uncommitted_orphan_files(spark, tmp_path):
    """Files in the data dir that never made a manifest commit must not be
    applied (crashed writer's orphans)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    led = generate_ledger(str(tmp_path / "changes"), SPEC)
    # plant an orphan parquet with a poison row the stream must not apply —
    # sliced from a real committed file so the physical types match exactly
    orphan_dir = os.path.join(led.path, "data", "orphan")
    os.makedirs(orphan_dir, exist_ok=True)
    src = os.path.join(led.path, led.manifest.files[0]["path"])
    t = pq.read_table(src).slice(0, 1)
    t = t.set_column(
        t.schema.get_field_index("url"),
        t.schema.field("url"),
        pa.array(["http://poison.example/x"], type=t.schema.field("url").type),
    )
    t = t.set_column(
        t.schema.get_field_index("seq"),
        t.schema.field("seq"),
        pa.array([10**12], type=t.schema.field("seq").type),
    )
    pq.write_table(t, os.path.join(orphan_dir, "o.parquet"))

    streaming = StreamingCdcApply(
        spark,
        EngineConfig(ledger_path=led.path, pages_path=str(tmp_path / "pages_o"),
                     batch_size=400, num_buckets=4),
    )
    streaming.run_to_completion(timeout_s=300)
    pages = streaming.engine.refresh_pages()
    assert pages.filter("url = 'http://poison.example/x'").count() == 0


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


def test_stream_defers_then_applies_late_committed_files(spark, tmp_path):
    """A file the stream consumed BEFORE its manifest commit landed (the
    ledger writer's normal write-then-register sequence) must not be lost:
    it is deferred in the checkpoint sidecar and applied once committed
    (round-3 fix for the consumed-and-dropped data-loss hazard)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    led = generate_ledger(str(tmp_path / "changes"), SPEC)
    # a late-committed file: on disk now, manifest commit arrives later
    late_rel = os.path.join("data", "late", "l.parquet")
    late_abs = os.path.join(led.path, late_rel)
    os.makedirs(os.path.dirname(late_abs), exist_ok=True)
    src = os.path.join(led.path, led.manifest.files[0]["path"])
    t = pq.read_table(src).slice(0, 1)
    for col, val in (("url", "http://late.example/x"), ("seq", 10**12)):
        idx = t.schema.get_field_index(col)
        t = t.set_column(idx, t.schema.field(col), pa.array([val], type=t.schema.field(col).type))
    pq.write_table(t, late_abs)

    streaming = StreamingCdcApply(
        spark,
        EngineConfig(ledger_path=led.path, pages_path=str(tmp_path / "pages_l"),
                     batch_size=400, num_buckets=4),
    )
    streaming.run_to_completion(timeout_s=300)
    # consumed but uncommitted: not applied, but remembered in the sidecar
    assert streaming.engine.refresh_pages().filter(
        "url = 'http://late.example/x'"
    ).count() == 0
    assert late_abs in streaming._load_deferred()

    # the writer's commit lands; the next drain applies the deferred rows
    led.register_files([
        {"path": late_rel, "bucket": 0,
         "schema_version": led.manifest.files[0]["schema_version"],
         "stats": {"min_seq": 10**12, "max_seq": 10**12}}
    ])
    streaming.run_to_completion(timeout_s=300)
    assert streaming.engine.refresh_pages().filter(
        "url = 'http://late.example/x'"
    ).count() == 1
    assert streaming._load_deferred() == []


def test_stream_retry_persists_new_orphans(spark, tmp_path):
    """Round-4 ADVICE fix: a foreachBatch RETRY of an already-committed
    micro-batch (apply_events short-circuits, applied=False) must still
    persist newly observed uncommitted files as deferred — otherwise a file
    consumed in the retried batch whose manifest commit lands before the next
    directory walk is never classified an orphan (silent loss). Ready-but-
    unapplied deferred files must likewise STAY deferred."""
    import pyarrow.parquet as pq

    led = generate_ledger(str(tmp_path / "changes"), SPEC)
    streaming = StreamingCdcApply(
        spark,
        EngineConfig(ledger_path=led.path, pages_path=str(tmp_path / "pages_r"),
                     batch_size=400, num_buckets=4),
    )
    streaming.run_to_completion(timeout_s=300)
    assert streaming._load_deferred() == []

    # plant an uncommitted file AFTER the run (the retried batch will observe it)
    orphan = os.path.join(led.path, "data", "retry-orphan", "o.parquet")
    os.makedirs(os.path.dirname(orphan), exist_ok=True)
    committed_file = os.path.join(led.path, led.manifest.files[0]["path"])
    pq.write_table(pq.read_table(committed_file).slice(0, 1), orphan)

    # simulate crash-before-sidecar-save: a deferred file whose commit HAS
    # landed (ready) but that this retried attempt will not apply
    streaming._save_sidecar([committed_file], {})

    # redeliver stream batch 0 (already committed -> applied=False)
    batch_df = spark.read.schema(streaming._superset_schema()).parquet(committed_file)
    streaming._apply_batch(batch_df, 0)

    deferred = set(streaming._load_deferred())
    assert orphan in deferred, "new orphan dropped on retried batch"
    assert committed_file in deferred, "ready-but-unapplied file dropped on retry"


def test_stream_scan_skips_settled_dirs(spark, tmp_path):
    """The incremental walk must reuse cached listings for settled snap dirs
    (every file committed) and still fully discover files in new dirs."""
    led = generate_ledger(str(tmp_path / "changes"), SPEC)
    streaming = StreamingCdcApply(
        spark,
        EngineConfig(ledger_path=led.path, pages_path=str(tmp_path / "pages_s"),
                     batch_size=400, num_buckets=4),
    )
    committed = {
        os.path.join(led.path, f["path"]) for f in led.manifest.files
    }
    data_dir = os.path.join(led.path, "data")
    on_disk1, settled = streaming._scan_data_dir(data_dir, committed, {})
    assert on_disk1 == committed
    assert settled, "fully-committed snap dirs must settle"
    # second scan with the cache must see the same files WITHOUT walking
    # settled dirs — prove it by poisoning os.walk for settled paths
    import os as _os
    real_walk = _os.walk

    def guarded_walk(top, *a, **kw):
        for name in settled:
            assert not top.endswith(name), f"re-walked settled dir {name}"
        return real_walk(top, *a, **kw)

    try:
        _os.walk = guarded_walk
        on_disk2, settled2 = streaming._scan_data_dir(data_dir, committed, settled)
    finally:
        _os.walk = real_walk
    assert on_disk2 == on_disk1 and settled2 == settled


def _write_events(spark, path: str, rows: list[tuple]) -> None:
    import datetime as dt

    df = spark.createDataFrame(
        [(u, dt.datetime.utcfromtimestamp(ts), s) for u, ts, s in rows],
        "url string, warc_ts timestamp, seq long",
    )
    df.coalesce(1).write.mode("append").parquet(path)


def _run_sessionizer(spark, src: str, ckpt: str, out: str, gap_s: int) -> None:
    from data_warehouse_etl_spark.streaming.sessionize import sessionize_stream

    events = (
        spark.readStream.schema("url string, warc_ts timestamp, seq long")
        .parquet(src)
    )
    q = (
        sessionize_stream(events, gap_s=gap_s, watermark_delay="0 seconds")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_stateful_sessionize_stream(spark, tmp_path):
    """applyInPandasWithState sessionizer (the brief's custom stateful
    streaming operator): in-batch gap closes emit immediately; an open
    session survives the checkpoint across queries and is closed by the
    EVENT-TIME TIMEOUT when a later run's watermark passes its gap —
    bounded-state eviction, not an unbounded keep-everything store."""
    src, ckpt, out = (str(tmp_path / d) for d in ("events", "ckpt", "sessions"))
    base = 1_700_000_000

    # run 1: url A has two events 10s apart then a 100s gap then one more
    # (gap_s=60 => first session closes IN-batch); url B stays open.
    _write_events(spark, src, [
        ("A", base + 0, 1), ("A", base + 10, 2), ("A", base + 120, 3),
        ("B", base + 115, 4),
    ])
    _run_sessionizer(spark, src, ckpt, out, gap_s=60)
    got1 = {
        (r["url"], r["n_events"]): (r["session_start"], r["session_end"])
        for r in spark.read.parquet(out).collect()
    }
    assert ("A", 2) in got1  # the in-batch close
    assert not any(u == "B" for u, _ in got1)  # B is open state, not output

    # run 2 (same checkpoint): far-future events advance the watermark past
    # A's and B's open sessions + gap => both close via state timeout.
    _write_events(spark, src, [("C", base + 10_000, 5)])
    _run_sessionizer(spark, src, ckpt, out, gap_s=60)
    got2 = {(r["url"], r["n_events"]) for r in spark.read.parquet(out).collect()}
    assert ("A", 1) in got2 and ("B", 1) in got2
    # C is the only still-open session: emitted nowhere
    assert not any(u == "C" for u, _ in got2)

    # slicing invariance: the same five events in ONE run + a fresh
    # checkpoint reach the same closed-session set
    src2, ckpt2, out2 = (str(tmp_path / d) for d in ("e2", "c2", "s2"))
    _write_events(spark, src2, [
        ("A", base + 0, 1), ("A", base + 10, 2), ("A", base + 120, 3),
        ("B", base + 115, 4), ("C", base + 10_000, 5),
    ])
    _run_sessionizer(spark, src2, ckpt2, out2, gap_s=60)
    got_one = {(r["url"], r["n_events"]) for r in spark.read.parquet(out2).collect()}
    assert got_one == got2


def test_stateful_sessionize_drops_pre_watermark_events(spark, tmp_path):
    """Late-data contract of the stateful operator: Spark drops input rows
    older than the watermark BEFORE they reach applyInPandasWithState (the
    standard stateful-op gate), so a too-late event can neither resurrect
    closed state nor grow the store — and the query must not fail. With
    watermark_delay=0, run 1 advances the watermark to base+1000; run 2's
    base+100 event for url Y is pre-watermark and must vanish entirely
    (no Y session ever emitted, no error); X's open session still closes
    by its own timeout on the next advance."""
    src, ckpt, out = (str(tmp_path / d) for d in ("events", "ckpt", "sessions"))
    base = 1_700_000_000

    _write_events(spark, src, [("X", base + 1000, 1)])
    _run_sessionizer(spark, src, ckpt, out, gap_s=60)
    _write_events(spark, src, [("Y", base + 100, 2)])
    _run_sessionizer(spark, src, ckpt, out, gap_s=60)  # must not raise
    _write_events(spark, src, [("X", base + 2000, 3)])
    _run_sessionizer(spark, src, ckpt, out, gap_s=60)

    got = {(r["url"], r["n_events"]) for r in spark.read.parquet(out).collect()}
    assert ("X", 1) in got  # X's first session closed via timeout
    assert not any(u == "Y" for u, _ in got)  # late event was gated out


def test_sessionize_stream_equals_batch_sessionization(spark, tmp_path):
    """Streaming-batch equivalence law for the stateful sessionizer (the
    same law the engine pins for LWW replay): on a seeded random feed, the
    streaming operator's closed-session set — once a far-future sentinel
    advances the watermark past every real session + gap — must equal
    batch gap-sessionization (lag/cumsum over the same events), for BOTH a
    one-run and a two-run (checkpoint-resumed) slicing."""
    import random

    rng = random.Random(20260818)
    base = 1_700_000_000
    rows, seq = [], 0
    for url in ("u1", "u2", "u3"):
        t = base + rng.randrange(0, 30)
        for _ in range(30):
            seq += 1
            rows.append((url, t, seq))
            # mostly in-session gaps, occasionally a session break
            t += rng.choice([5, 10, 20, 200, 500]) if rng.random() < 0.3 else rng.randrange(1, 50)
    sentinel = [("__wm__", base + 1_000_000, seq + 1)]

    # batch oracle: gap>60s split per url via lag + running session count
    import datetime as dt
    batch_df = spark.createDataFrame(
        [(u, dt.datetime.utcfromtimestamp(ts), s) for u, ts, s in rows],
        "url string, warc_ts timestamp, seq long",
    )
    batch_df.createOrReplaceTempView("sess_events_v")
    want = {
        (r["url"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("""
            WITH flagged AS (
                SELECT url, warc_ts,
                       CASE WHEN unix_timestamp(warc_ts)
                                 - unix_timestamp(lag(warc_ts) OVER
                                   (PARTITION BY url ORDER BY warc_ts, seq)) > 60
                            OR lag(warc_ts) OVER
                               (PARTITION BY url ORDER BY warc_ts, seq) IS NULL
                            THEN 1 ELSE 0 END AS new_sess
                FROM sess_events_v),
            numbered AS (
                SELECT url, warc_ts,
                       SUM(new_sess) OVER (PARTITION BY url ORDER BY warc_ts
                                           ROWS UNBOUNDED PRECEDING) AS sid
                FROM flagged)
            SELECT url, MIN(warc_ts) AS session_start, MAX(warc_ts) AS session_end,
                   COUNT(*) AS n_events
            FROM numbered GROUP BY url, sid
        """).collect()
    }

    def run_streaming(slices: list[list[tuple]], tag: str) -> set:
        src, ckpt, out = (str(tmp_path / f"{d}_{tag}") for d in ("ev", "ck", "out"))
        for chunk in slices:
            _write_events(spark, src, chunk)
            _run_sessionizer(spark, src, ckpt, out, gap_s=60)
        return {
            (r["url"], r["session_start"], r["session_end"], r["n_events"])
            for r in spark.read.parquet(out).collect()
            if r["url"] != "__wm__"
        }

    one = run_streaming([rows + sentinel], "one")
    # slice by TIME, not arrival-list order: run 2's watermark starts at
    # run 1's max event time, so a run-2 event older than that is LATE and
    # correctly gated (pinned by the drops test above) — a real tail
    # delivers in rough time order, which time-slicing models
    rows_t = sorted(rows, key=lambda r: (r[1], r[2]))
    mid = len(rows_t) // 2
    two = run_streaming([rows_t[:mid], rows_t[mid:] + sentinel], "two")
    assert one == want
    assert two == want


def test_stream_tail_with_retention_and_ivm(spark, tmp_path):
    """Full production-tail integration (round 5): the streaming apply with
    snapshot retention GC reaches the batch replay's exact state with the
    snapshot count bounded, and a changelog-fed rollup refreshed afterwards
    equals a from-scratch recompute (the retention-expired interval start
    exercises ivm.py's recompute fallback on a real stream)."""
    from pyspark.sql import functions as F

    from data_warehouse_etl_spark.cdc.ivm import IncrementalAggregate
    from data_warehouse_etl_spark.lake import LakeTable

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
                     batch_size=400, num_buckets=4, retain_snapshots=3),
    )
    streaming.run_to_completion(timeout_s=300)
    eng = streaming.engine
    assert state_hash(eng.refresh_pages()) == h_batch
    assert len(eng.pages.snapshots()) <= 3

    agg = IncrementalAggregate(
        eng, str(tmp_path / "agg"), group_cols=["lang"], num_buckets=4
    )
    agg.refresh()
    expected = eng.read_pages().groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    assert state_hash(agg.read()) == state_hash(expected)
