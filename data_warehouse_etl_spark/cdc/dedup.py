"""Last-writer-wins dedup — the engine's core reduce (SURVEY.md §2.5 W2).

The reference's pattern is ``rank() over (partition by key order by ts) = 1``
(``/root/reference/Sql Scripts/STG_SP_ATTRIBUTION_ET.sql:305,318``) and its
cross-feed LWW conflict resolution keeps the later action_timestamp
(``:273-292,322-344``). Generalized here to: **one surviving row per url,
the row with the greatest (warc_ts, seq)** — warc_ts is the version order,
seq the total-order tiebreaker (never rely on unordered ``first()``:
determinism across cluster sizes requires a total order).

Physical strategy — aggregation, not window. A window rank forces ALL events
of a key into one task and sorts them: a hot url with 10^7 events in a batch
becomes one straggler task. ``groupBy(key).agg(max_by(...))`` instead gets
map-side partial aggregation (each input partition pre-reduces to one
candidate per key before the shuffle), so the hot key ships
O(num_input_partitions) rows, not O(events).

``lww_dedup_salted`` goes one step further per the north rule ("salted
key-partitioned shuffle with explicit hot-url skew splitting"): a cheap
pre-count finds hot urls, hot rows get an explicit salt from ``pmod(
xxhash64(seq), k)`` and reduce in two phases — (url, salt) then url — while
cold rows take the single-phase path. The salt is derived from seq, so the
plan is deterministic; the reduce is associative+commutative, so the result
is identical at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _max_by_all(df: DataFrame, key: str, order: tuple[str, ...]) -> DataFrame:
    cols = df.columns
    return (
        df.groupBy(key)
        .agg(F.max_by(F.struct(*cols), F.struct(*[F.col(c) for c in order])).alias("_r"))
        .select("_r.*")
    )


def lww_dedup(
    df: DataFrame, key: str = "url", order: tuple[str, ...] = ("warc_ts", "seq")
) -> DataFrame:
    """One row per key: argmax over ``order`` (single hash-agg, map-side combine)."""
    return _max_by_all(df, key, order)


def lww_dedup_salted(
    df: DataFrame,
    key: str = "url",
    order: tuple[str, ...] = ("warc_ts", "seq"),
    n_salts: int = 16,
    hot_threshold: int = 100_000,
    salt_source: str = "seq",
) -> DataFrame:
    """LWW dedup with explicit hot-key splitting.

    1. count events per key (one extra pre-aggregated pass);
    2. keys with count > ``hot_threshold`` are *hot* — their rows are salted
       with ``pmod(xxhash64(salt_source), n_salts)`` and reduced per
       (key, salt), spreading each hot key over ``n_salts`` reducers;
    3. the per-salt winners (≤ n_salts rows per hot key) reduce again per key;
    4. cold keys take the plain single-phase path; union of the two is exact.

    The hot set is broadcast as a literal filter (bounded above by
    |batch| / hot_threshold keys, so driver-safe by construction).
    """
    counts = df.groupBy(key).count().filter(F.col("count") > hot_threshold)
    hot_keys = [r[key] for r in counts.collect()]
    if not hot_keys:
        return _max_by_all(df, key, order)

    is_hot = F.col(key).isin(hot_keys)
    cold = _max_by_all(df.filter(~is_hot), key, order)

    hot_df = df.filter(is_hot).withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_source)), F.lit(n_salts)).cast("int")
    )
    cols = [c for c in hot_df.columns if c != "_salt"]
    phase1 = (
        hot_df.groupBy(key, "_salt")
        .agg(F.max_by(F.struct(*cols), F.struct(*[F.col(c) for c in order])).alias("_r"))
        .select("_r.*")
    )
    hot = _max_by_all(phase1, key, order)
    return cold.unionByName(hot)
