"""Last-writer-wins dedup — the engine's core reduce (SURVEY.md §2.5 W2).

The reference's pattern is ``rank() over (partition by key order by ts) = 1``
(``/root/reference/Sql Scripts/STG_SP_ATTRIBUTION_ET.sql:305,318``) and its
cross-feed LWW conflict resolution keeps the later action_timestamp
(``:273-292,322-344``). Generalized here to: **one surviving row per url,
the row with the greatest (warc_ts, seq)** — warc_ts is the version order,
seq the total-order tiebreaker (never rely on unordered ``first()``:
determinism across cluster sizes requires a total order).

Physical strategy — HASH aggregation, never window, never sort-aggregate.
A window rank forces ALL events of a key into one task and sorts them. Less
obviously, ``max(struct(...))`` / ``max_by(struct(*cols), ...)`` are just as
bad: a struct-typed aggregation buffer is not UnsafeRow-mutable, so Spark
plans **SortAggregate** — the 30M-row winner reduce was measured sorting its
input on BOTH sides of the exchange (round 6 profile: 62s + 30s CPU at
local[4] for what hash aggregation does in a fraction). The argmax over the
(version, tie) pair is therefore decomposed into chained aggregations whose
buffers are all primitive (hash-aggregable, whole-stage codegen):

    phase 1:  groupBy(key, version).agg(max(tie))       -- collapses exact
              (duplicate events share (key, version))       duplicates
    phase 2:  groupBy(key).agg(max_by(tie, version))     -- unique version
              per group after phase 1, so no ties; null versions handled by
              an explicit null-branch max (struct ordering treats a null
              version as smallest, and so does this: a null-version row wins
              only when the key has no non-null version at all)

Equivalence with ``max(struct(version, tie))`` — including null versions and
the total (version, tie) order — is pinned by tests/test_dedup_*.

``winner_seqs``'s hot-key path goes one step further per the north rule
("salted key-partitioned shuffle with explicit hot-url skew splitting"):
hot rows get an explicit salt from ``pmod(xxhash64(tie), k)`` and reduce per
(key, salt) first — the salt is derived from the unique tie, so the plan is
deterministic, and every reduce is associative+commutative, so the result is
identical at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _argmax_tie(keys: DataFrame, key_cols: list[str], o1: str, tie: str) -> DataFrame:
    """Per-``key_cols`` argmax of the (``o1``, ``tie``) pair, returning
    ``key_cols + [tie]`` — the all-HashAggregate decomposition documented in
    the module docstring. ``keys`` must already be partitioned compatibly
    (or be small enough that the grouping exchanges are cheap)."""
    ph1 = keys.groupBy(*key_cols, o1).agg(F.max(tie).alias(tie))
    return (
        ph1.groupBy(*key_cols)
        .agg(
            F.max_by(tie, o1).alias("_w_nn"),
            F.max(F.when(F.col(o1).isNull(), F.col(tie))).alias("_w_null"),
        )
        .select(*key_cols, F.coalesce("_w_nn", "_w_null").alias(tie))
    )


def _winner_ties(
    df: DataFrame,
    key: str,
    order: tuple[str, ...],
    hot_keys: list | None = None,
    n_salts: int = 16,
    salted_all: bool = False,
    keep_key: bool = False,
) -> DataFrame:
    """The winning tiebreaker (``order[-1]``) per key — shared core of
    :func:`winner_seqs` and the full-row dedup paths. 1-column [tie] by
    default; ``keep_key`` returns [key, tie] so a join-back can key on the
    pair (robust even if a caller's tie is only unique *within* a key).

    Cold keys: one ``repartition(key)`` exchange (raw rows, no map-side
    combine — measured cheaper than paying a sort- or hash-map pass on the
    map side for the ~8% row reduction combine buys on spread-out keys),
    then the two chained hash aggregates of :func:`_argmax_tie` with no
    further exchange (hashpartitioning(key) satisfies both groupings).

    Hot keys (``hot_keys``, from the engine's amortized sampled detection;
    or every key when ``salted_all``): repartition by (key, salt) spreads a
    hot key over ``n_salts`` reducers; per-(key, salt) argmax, then a
    ≤ n_salts-rows-per-key fold — every aggregate hash-based, exact at any
    parallelism because MAX/argmax with the total (o1, tie) order is
    associative and commutative.
    """
    o1, tie = order
    keys = df.select(key, o1, tie)
    out_cols = [key, tie] if keep_key else [tie]

    def _cold(kdf: DataFrame) -> DataFrame:
        return _argmax_tie(kdf.repartition(key), [key], o1, tie).select(*out_cols)

    def _salted(kdf: DataFrame) -> DataFrame:
        salted = kdf.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(tie)), F.lit(n_salts)).cast("int")
        ).repartition(key, "_salt")
        # per (key, salt): the winning (o1, tie) pair. o1 of the winner is
        # max(o1) when any non-null o1 exists (argmax by (o1, tie) maximizes
        # o1 first); tie via the usual null-branched argmax.
        per_salt = (
            salted.groupBy(key, "_salt", o1)
            .agg(F.max(tie).alias(tie))
            .groupBy(key, "_salt")
            .agg(
                F.max_by(tie, o1).alias("_w_nn"),
                F.max(F.when(F.col(o1).isNull(), F.col(tie))).alias("_w_null"),
                F.max(o1).alias(o1),
            )
            .select(key, o1, F.coalesce("_w_nn", "_w_null").alias(tie))
        )
        # fold the ≤ n_salts candidates per key (ties in o1 across salts are
        # possible — duplicate events land in different salts — so run the
        # full two-phase argmax again; input is tiny)
        return _argmax_tie(per_salt, [key], o1, tie).select(*out_cols)

    if salted_all:
        return _salted(keys)
    if not hot_keys:
        return _cold(keys)
    # NULL-safe split: `~isin` is NULL for a NULL key and would drop those
    # rows from BOTH branches; a NULL key is an ordinary (cold) group
    is_hot = F.coalesce(F.col(key).isin(list(hot_keys)), F.lit(False))
    return _cold(keys.filter(~is_hot)).unionByName(_salted(keys.filter(is_hot)))


def _join_back(df: DataFrame, winners: DataFrame, key: str, tie: str) -> DataFrame:
    """Recover the full winning rows by a left-semi join on (key, tie).

    NULL-SAFE on both columns: a NULL key forms its own group in the winner
    aggregation (groupBy treats NULL as a value), and a plain equi join
    would silently drop its rows (NULL never equals NULL) — the pre-round-6
    aggregation form kept them. ``<=>`` conditions plan as hash-join keys,
    so the SHUFFLE_HASH shape is preserved.

    Precondition (documented on every caller): ``tie`` is unique per key
    across ``df``'s rows. Rows that duplicate their key's winning
    (key, tie) pair — only possible when the precondition is violated —
    all survive the semi join, where the old aggregation form kept an
    arbitrary one of them (``max_by`` is non-deterministic on order ties);
    neither behavior is deterministic on such input.
    """
    w = winners.hint("shuffle_hash").select(
        F.col(key).alias("_wk"), F.col(tie).alias("_wt")
    )
    cond = df[key].eqNullSafe(w["_wk"]) & df[tie].eqNullSafe(w["_wt"])
    return df.join(w, cond, "left_semi")


def _max_by_all(df: DataFrame, key: str, order: tuple[str, ...]) -> DataFrame:
    """One full row per key: argmax over ``order``.

    For the standard 2-tuple order with a per-key-unique tiebreaker (the
    engine's LWW law), winners are computed hash-aggregated on a
    (key, *order) projection and the full rows recovered by a null-safe
    equi join on (key, tie) — the payload never enters an aggregation
    buffer, and no operator sorts. The join is hinted SHUFFLE_HASH: the
    winner side is a fraction of the input and the build per partition is
    bounded, while a sort-merge join would re-introduce exactly the payload
    sort this rewrite removes. Falls back to the struct ``max_by`` form for
    other order shapes (general but SortAggregate-planned).
    """
    if len(order) == 2:
        tie = order[-1]
        winners = _winner_ties(df, key, order, keep_key=True)
        return _join_back(df, winners, key, tie)
    cols = df.columns
    return (
        df.groupBy(key)
        .agg(F.max_by(F.struct(*cols), F.struct(*[F.col(c) for c in order])).alias("_r"))
        .select("_r.*")
    )


def lww_dedup(
    df: DataFrame, key: str = "url", order: tuple[str, ...] = ("warc_ts", "seq")
) -> DataFrame:
    """One row per key: argmax over ``order`` (hash-aggregated winner keys +
    unique-tie join back; see :func:`_max_by_all`)."""
    return _max_by_all(df, key, order)


def lww_dedup_auto(
    df: DataFrame,
    key: str = "url",
    order: tuple[str, ...] = ("warc_ts", "seq"),
    mode: str = "detect",
    n_salts: int = 16,
    hot_threshold: int = 1_000_000,
    salt_source: str = "seq",
) -> DataFrame:
    """Mode dispatcher for the engine config.

    - ``plain``: winner keys via the cold two-phase hash argmax, full rows
      recovered by the unique-tie join.
    - ``detect`` (default): one sampled pre-aggregated counting pass; keys
      whose batch count exceeds ``hot_threshold`` take the explicit salted
      reduce, everything else the plain path. This is the north-rule
      "explicit hot-url skew splitting".
    - ``salted``: unconditionally salted (plan independent of data; no
      counting pass, no driver collect).
    """
    if mode == "plain":
        return _max_by_all(df, key, order)
    if mode == "salted":
        return lww_dedup_salted(
            df, key, order, n_salts=n_salts, hot_threshold=None, salt_source=salt_source
        )
    return lww_dedup_salted(
        df, key, order, n_salts=n_salts, hot_threshold=hot_threshold, salt_source=salt_source
    )


def winner_seqs(
    df: DataFrame,
    key: str = "url",
    order: tuple[str, ...] = ("warc_ts", "seq"),
    hot_keys: list | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """The winning tiebreaker (``order[-1]``) per key, as cheaply as possible.

    Because the LWW law is "greatest ``order`` tuple wins" and the tuple's
    last element is globally unique, the winner per key is a pure argmax
    over the (version, tie) pair — computed entirely with hash aggregations
    (see module docstring; the former ``max(struct(...))`` form planned
    SortAggregate and sorted the whole batch twice). The shuffle carries
    key + two scalars per row, never a full row copy.

    ``hot_keys`` (from the engine's amortized sampled detection) take the
    explicit salted path — (key, salt) partitioning spreads a hot key over
    ``n_salts`` reducers — while cold keys reduce in one exchange. Exact at
    any parallelism: every aggregate is associative/commutative over the
    total (version, tie) order.
    """
    if len(order) != 2:  # general fallback: the defining struct-max form,
        # with the same explicit salted split for hot keys (SortAggregate-
        # planned, but order tuples beyond (version, tie) are not an engine
        # path — generality over speed here)
        tie = order[-1]
        w = F.max(F.struct(*[F.col(c) for c in order])).alias("_w")
        keys = df.select(key, *order)
        if not hot_keys:
            return keys.groupBy(key).agg(w).select(F.col(f"_w.{tie}").alias(tie))
        is_hot = F.coalesce(F.col(key).isin(list(hot_keys)), F.lit(False))
        cold = keys.filter(~is_hot).groupBy(key).agg(w)
        phase1 = (
            keys.filter(is_hot)
            .withColumn(
                "_salt", F.pmod(F.xxhash64(F.col(tie)), F.lit(n_salts)).cast("int")
            )
            .groupBy(key, "_salt")
            .agg(w)
        )
        hot = phase1.select(key, "_w.*").groupBy(key).agg(w)
        return cold.unionByName(hot).select(F.col(f"_w.{tie}").alias(tie))
    return _winner_ties(df, key, order, hot_keys=hot_keys, n_salts=n_salts)


def lww_dedup_broadcast_keys(
    df: DataFrame,
    key: str = "url",
    order: tuple[str, ...] = ("warc_ts", "seq"),
    mode: str = "plain",
    n_salts: int = 16,
    hot_threshold: int = 1_000_000,
    hot_keys: list | None = None,
) -> DataFrame:
    """LWW dedup that never shuffles the payload.

    1. computes the winning tiebreaker per key over a (key, *order)
       PROJECTION (:func:`winner_seqs` — tens of bytes per row through the
       shuffle, 10-100x less volume, all-hash aggregation), with explicit
       salted splitting for ``hot_keys``;
    2. broadcasts the winners' globally-unique tiebreaker column
       (``order[-1]``, the ledger seq) and left-semi-joins the original
       rows — payload rows are filtered map-side, never exchanged.

    Exact: the winner set is identical (same argmax, unique tiebreaker), so
    the surviving rows are identical → byte-identical state. Use when the
    winner-key set fits a broadcast (≈8 bytes/key; a 10^6-event batch is a
    few MB). ``lww_dedup_auto`` remains for unbounded batch sizes.

    ``mode="salted"`` forces the unconditionally salted winner reduce (plan
    independent of data); any other mode reduces cold except for explicit
    ``hot_keys``. A detect-counting pass inside this function would cost a
    full keys scan per batch; the engine instead amortizes detection across
    batches (EngineConfig.hot_detect_every).
    """
    tie = order[-1]
    if mode == "salted":
        winners = _winner_ties(df, key, order, n_salts=n_salts, salted_all=True)
        return df.join(F.broadcast(winners), tie, "left_semi")
    winners = winner_seqs(df, key, order, hot_keys=hot_keys, n_salts=n_salts)
    return df.join(F.broadcast(winners), tie, "left_semi")


def sample_hot_keys(
    df: DataFrame,
    key: str = "url",
    hot_threshold: int = 1_000_000,
    salt_source: str = "seq",
    detect_sample_mod: int = 64,
) -> list:
    """Sampled hot-key detection: keys whose (estimated) event count in
    ``df`` exceeds ``hot_threshold``. Aggregates a deterministic 1/mod hash
    sample of the unique tiebreaker (same sample at any parallelism), with
    the threshold scaled down 4x extra for recall — misclassification is
    harmless because both the salted and plain reduce paths are exact.
    Result size is bounded by |df| / hot_threshold keys (driver-safe)."""
    counts_src = df
    eff_threshold = hot_threshold
    if detect_sample_mod and detect_sample_mod > 1:
        counts_src = df.filter(
            F.pmod(F.xxhash64(F.col(salt_source)), F.lit(detect_sample_mod)) == 0
        )
        eff_threshold = max(hot_threshold // (detect_sample_mod * 4), 1)
    counts = counts_src.groupBy(key).count().filter(F.col("count") > eff_threshold)
    return [r[key] for r in counts.collect()]


def lww_dedup_salted(
    df: DataFrame,
    key: str = "url",
    order: tuple[str, ...] = ("warc_ts", "seq"),
    n_salts: int = 16,
    hot_threshold: int | None = None,
    salt_source: str = "seq",
    detect_sample_mod: int | None = 64,
) -> DataFrame:
    """LWW dedup with explicit salted hot-key splitting (full-row result).

    Two modes:

    - ``hot_threshold=None``: **always salted**. Winner keys reduce per
      (key, salt) first — a hot key spreads over ``n_salts`` reducers — then
      fold; full rows are recovered by the unique-tie join. No pre-counting
      pass or driver collect: no plan dependency on the data.

    - ``hot_threshold=k``: detect-and-split. One sampled pre-aggregated
      counting pass finds keys with > k events; only those take the salted
      path, cold keys reduce in one exchange. The hot set is broadcast as a
      literal filter (bounded by |batch| / k keys, driver-safe).

    Both modes are exact: every reduce is associative+commutative with a
    total order, so the result is identical at any parallelism and batch
    slicing. Requires the 2-tuple order with unique tie (the engine's LWW
    law); other shapes fall back through :func:`_max_by_all`.
    """
    if len(order) != 2:
        return _max_by_all(df, key, order)
    tie = order[-1]
    if hot_threshold is None:
        winners = _winner_ties(
            df, key, order, n_salts=n_salts, salted_all=True, keep_key=True
        )
        return _join_back(df, winners, key, tie)

    hot_keys = sample_hot_keys(
        df,
        key,
        hot_threshold=hot_threshold,
        salt_source=salt_source,
        detect_sample_mod=detect_sample_mod or 0,
    )
    winners = _winner_ties(
        df, key, order, hot_keys=hot_keys, n_salts=n_salts, keep_key=True
    )
    return _join_back(df, winners, key, tie)
