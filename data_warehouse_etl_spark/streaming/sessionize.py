"""Custom stateful streaming operator: per-url session windows via
``applyInPandasWithState`` — the streaming analog of the batch lead/lag
sessionizer (operators/parity.py ``w3_lead_sessionize``; reference analog:
the attribution scripts' session stitching,
``/root/reference/Sql Scripts/STG_SP_ATTRIBUTION_ET.sql:305-344``).

Why not express this as a windowed aggregation: a session window's extent
depends on the DATA (gap-based), not the clock, so it needs keyed state
that survives micro-batches — exactly what the brief's
``applyInPandasWithState`` is for. Each url's open session lives in the
state store; event-time timeout (watermark-driven) closes it when no event
arrives within the gap, so state size is bounded by the number of urls
active inside one watermark horizon — the eviction contract that makes
stateful streaming survive an unbounded feed.

Scale shape: state is keyed by url (the same partitioning as every other
engine stage), per-batch work is one shuffle onto the state store's
partitioning, and the pandas hook receives Arrow batches (no per-row
Python). Emission is append-mode: a session row is emitted exactly once,
when it CLOSES (gap exceeded within a batch, or watermark timeout across
batches); still-open sessions are state, not output.

Determinism: within a batch events are sorted by (warc_ts, seq); sessions
close on ``gap_s`` measured in event time. The same feed sliced into
different micro-batches emits the same closed-session set once the
watermark passes (in-batch closes move between batches, but the session
rows themselves are identical — asserted by the resume test, which replays
the same files in one and in two availableNow runs against checkpoints).
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# state: (session_start_epoch_us, last_ts_epoch_us, n_events)
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _sessionize_fn(gap_s: int):
    gap_us = gap_s * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (url,) = key
        closed: list[tuple[Any, Any, int]] = []

        if state.hasTimedOut:
            # watermark passed last_ts + gap with no new events: close the
            # open session and drop the state (bounded-state eviction)
            start_us, last_us, n = state.get
            closed.append((start_us, last_us, n))
            state.remove()
        else:
            rows = pd.concat(list(pdfs), ignore_index=True)
            rows = rows.sort_values(["warc_ts", "seq"], kind="mergesort")
            # normalize to epoch MICROSECONDS regardless of the pandas
            # datetime64 unit Arrow hands over (ns in classic pandas, us
            # possible with newer pyarrow conversions)
            ts_us = rows["warc_ts"].astype("datetime64[us]").astype("int64").tolist()

            if state.exists:
                start_us, last_us, n = state.get
            else:
                # fresh key: the first event opens the session
                start_us = last_us = ts_us[0]
                n = 1
                ts_us = ts_us[1:]

            for t in ts_us:
                if t - last_us > gap_us:
                    closed.append((start_us, last_us, n))
                    start_us, n = t, 1
                else:
                    n += 1
                last_us = t

            state.update((start_us, last_us, n))
            # close via watermark: no event within gap_s of the open
            # session's last event ends it. Spark drops pre-watermark input
            # rows before they reach this operator (pinned by
            # test_stateful_sessionize_drops_pre_watermark_events), so any
            # event seen here has last+gap > watermark for gap_s > 0; the
            # clamp below is defensive for the gap_s=0 boundary, where
            # Spark rejects a timeout the watermark has already reached.
            timeout_ms = last_us // 1000 + gap_s * 1000
            state.setTimeoutTimestamp(max(timeout_ms, state.getCurrentWatermarkMs() + 1))

        if closed:
            yield pd.DataFrame(
                {
                    "url": [url] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame, gap_s: int = 1800, watermark_delay: str = "10 minutes"
) -> DataFrame:
    """Gap-based session windows over a STREAMING events DataFrame
    (columns: url, warc_ts timestamp, seq long). Returns an append-mode
    stream of closed sessions (SESSION_SCHEMA). State per url is one open
    session; the event-time timeout evicts it once the watermark passes
    ``last event + gap_s``."""
    return (
        events.withWatermark("warc_ts", watermark_delay)
        .groupBy("url")
        .applyInPandasWithState(
            _sessionize_fn(gap_s),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
