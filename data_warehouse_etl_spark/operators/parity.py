"""Operator-parity queries: every operator family of SURVEY.md §2, as
idiomatic Spark DataFrame plans, each with a DuckDB oracle (ANSI SQL).

Conventions for driver hash-parity (CORRECTNESS gate):
- every computed column is aliased identically in Spark and SQL;
- double aggregates go through DECIMAL(38,6) (exact, associative — immune to
  partition-order float drift) and finish with ROUND(CAST(.. AS DOUBLE), 4);
- timestamps/dates in output are formatted to strings;
- every result is deterministic (total tiebreak order on any top-k/rank).

Each query's docstring cites the reference pattern it re-expresses
(file:line into /root/reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _dsum(col, alias, scale=4):
    return F.round(F.sum(F.col(col).cast("decimal(38,6)")).cast("double"), scale).alias(alias)


def _dsum_expr(expr, alias, scale=4):
    return F.round(F.sum(expr.cast("decimal(38,6)")).cast("double"), scale).alias(alias)


# --------------------------------------------------------------------------
# S/P — scans, projections, filters
# --------------------------------------------------------------------------


def q_pruned_scan(spark, sf):
    """S1: partition/predicate-pruned scan + narrow projection
    (FCT_OMNITURE_INTL.sql:94-97). Filter + 3-column ReadSchema pushed to
    parquet by Catalyst."""
    li = _t(spark, sf, "lineitem")
    return (
        li.filter((F.col("l_shipdate") < "1995-07-01") & (F.col("l_quantity") > 45))
        .select("l_orderkey", "l_linenumber", "l_quantity")
    )


def q_case_recode(spark, sf):
    """P2: literal CASE-mapping recode (15-way state map,
    FCT_ERBRESERVATION.sql:85-98; 27-way maps FCT_OMNITURE_INTL.sql:4-84)."""
    o = _t(spark, sf, "orders")
    tier = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "expedite")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "standard")
        .otherwise("relaxed")
    )
    return (
        o.withColumn("tier", tier)
        .groupBy("tier")
        .agg(F.count("*").alias("n_orders"), _dsum("o_totalprice", "total_price"))
    )


def q_blacklist_like(spark, sf):
    """P5+P6: NOT-IN blacklist + LIKE junk filters (test-reservation exclusion
    FCT_RESERVATION_UPD.sql:34-35; lname junk-list DM_FULL_BOOK.sql:49-57)."""
    c = _t(spark, sf, "customer")
    return (
        c.filter(~F.col("c_mktsegment").isin("MACHINERY", "HOUSEHOLD"))
        .filter(F.col("c_name").like("%1%"))
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def q_date_window(spark, sf):
    """P8: date-range watermark-window predicate (between current_date-7 and
    current_date-1, RestaurantDetails_Marta_v11_06152015.sql:121-144) —
    fixed-literal window for determinism."""
    e = _t(spark, sf, "events")
    return (
        e.filter(F.col("ts").between("2024-01-03 00:00:00", "2024-01-05 23:59:59"))
        .groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count("*").alias("n_events"), _dsum("value", "sum_value"))
    )


def q_composite_in(spark, sf):
    """P9: composite-tuple IN → left-semi join on multi-key
    ((USERID, DB_NAME) IN (...), SILVERPOP_USER_INCREMENTAL.sql:290-327)."""
    li = _t(spark, sf, "lineitem")
    big = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 90)
        .select("l_partkey", "l_suppkey")
    )
    return (
        li.join(big, ["l_partkey", "l_suppkey"], "left_semi")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_rows"))
    )


def q_json_flatten(spark, sf):
    """S9+P7: JSON → tabular flattening (dotted-key counts.json → report,
    Photos/makeit.rb:9-25) via get_json_object, plus regex validation of the
    extracted field (userid digit check, STG_SP_ATTRIBUTION_ET.sql:9,45,92,151)
    — count how many extracted values pass a 2-digit rlike check."""
    e = _t(spark, sf, "events")
    k_re = F.regexp_extract(F.col("props"), r'"k": (\d+)', 1)
    return (
        e.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .withColumn("k_str", k_re)
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n"),
            _dsum_expr(F.col("k"), "sum_k", 0),
            F.sum(
                F.when(F.col("k_str").rlike(r"^\d{2}$"), 1).otherwise(0)
            ).alias("n_valid_2digit"),
        )
    )


def q_tz_interval_calendar(spark, sf):
    """F1 (§2.8 time functions + J11 date-dimension join): the reference's
    most-used scalar patterns in one query —
    - timezone conversion ``convert_tz(ts,'GMT',r.time_zone)``
      (FCT_RESERVATION_UPD.sql:11, STG_SP_ATTRIBUTION_ET.sql:35-36) as
      ``from_utc_timestamp`` with a per-row zone;
    - interval arithmetic ``+ interval '1MIN' * servergmtoffsetmi``
      (FCT_RESERVATION_UPD.sql:300) and ``cast('6 month' as interval)``
      (RestaurantDetails_Marta_v11_06152015.sql:114);
    - 30-minute slot rounding (FCT_ERBRESERVATION.sql:53-68);
    - join to a generated date dimension (J11; DM_DATE usage,
      Monthly Stats - Agg Scripts.sql:22) built with sequence+explode and
      broadcast (a date dim is always broadcast-able).
    January 2024 only, so no DST transition ambiguity across engines."""
    e = _t(spark, sf, "events")
    tz = (
        F.when(F.col("user_id") % 3 == 0, "America/New_York")
        .when(F.col("user_id") % 3 == 1, "Europe/London")
        .otherwise("Asia/Tokyo")
    )
    cal = spark.sql(
        "SELECT explode(sequence(DATE'2024-01-01', DATE'2024-03-31')) AS cal_day"
    ).select("cal_day", F.dayofweek("cal_day").alias("dow"))
    enriched = (
        e.withColumn("tz", tz)
        .withColumn("local_day", F.to_date(F.from_utc_timestamp("ts", F.col("tz"))))
        .withColumn(
            "shifted", F.expr("ts + INTERVAL '1' MINUTE * CAST(user_id % 120 AS BIGINT)")
        )
        .withColumn(
            "slot30",
            F.expr(
                "date_trunc('hour', ts)"
                " + INTERVAL '30' MINUTE * CAST(floor(minute(ts) / 30) AS BIGINT)"
            ),
        )
        .withColumn("plus6mo", F.expr("ts + INTERVAL '6' MONTH"))
    )
    return (
        enriched.join(F.broadcast(cal), F.col("local_day") == F.col("cal_day"))
        .groupBy(
            "tz",
            F.date_format("local_day", "yyyy-MM-dd").alias("local_day"),
            "dow",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min("slot30"), "yyyy-MM-dd HH:mm:ss").alias("first_slot"),
            F.date_format(F.max("shifted"), "yyyy-MM-dd HH:mm:ss").alias("last_shifted"),
            F.date_format(F.max("plus6mo"), "yyyy-MM-dd HH:mm:ss").alias("max_plus_6mo"),
        )
    )


def q_string_parse_flags(spark, sf):
    """F2 (§2.8 string functions + bitwise flags + O1/O2): composite-id
    parsing and flag math —
    - ``substring``+``instr`` key split (FCT_RESERVATION_UPD.sql:24-26);
    - ``reverse``+``instr`` suffix strip (SILVERPOP_USER_INCREMENTAL.sql:415-424);
    - ``translate`` digit masking (STG_SP_ATTRIBUTION_ET.sql:9);
    - ``lpad`` zero-padding (Monthly Stats - Agg Scripts.sql:22);
    - bitwise OR across flag columns (FCT_USER_CALCS.sql:158);
    - deterministic ORDER BY + LIMIT export cut (O1/O2; unique sort key so
      the LIMIT is total-ordered)."""
    p = _t(spark, sf, "part")
    id_digits = F.expr("substring(p_brand, instr(p_brand, '#') + 1)")
    name_prefix = F.expr(
        "substring(p_name, 1, length(p_name) - instr(reverse(p_name), ' '))"
    )
    flags = F.expr(
        "(CASE WHEN p_size > 20 THEN 1 ELSE 0 END)"
        " | (CASE WHEN p_type = 'ECONOMY' THEN 2 ELSE 0 END)"
        " | (CASE WHEN p_partkey % 2 = 0 THEN 4 ELSE 0 END)"
    )
    return (
        p.select(
            "p_partkey",
            id_digits.alias("brand_digits"),
            id_digits.cast("bigint").alias("brand_num"),
            F.lpad(F.col("p_partkey").cast("string"), 12, "0").alias("padded_key"),
            F.translate("p_brand", "0123456789", "##########").alias("brand_masked"),
            name_prefix.alias("name_prefix"),
            flags.alias("flags"),
        )
        .orderBy(F.col("p_partkey").asc())
        .limit(100)
    )


# --------------------------------------------------------------------------
# J — joins
# --------------------------------------------------------------------------


def q_join_multikey(spark, sf):
    """J1: multi-key equi inner join (4-key shift join,
    fct_serverperformance_changes.sql:24-33) — lineitem joined back to its
    own (partkey, suppkey) aggregate."""
    li = _t(spark, sf, "lineitem")
    agg = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("ps_qty"))
    return (
        li.join(agg, ["l_partkey", "l_suppkey"], "inner")
        .filter(F.col("ps_qty") > 80)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n_rows"), _dsum("ps_qty", "sum_ps_qty"))
    )


def q_left_enrich(spark, sf):
    """J2: left-outer dim-enrichment chain (11 left joins,
    SILVERPOP_USER_INCREMENTAL.sql:214-228) — customer→nation→region with
    broadcast dims; unmatched keys surface as 'UNKNOWN' (P3 nvl defaulting)."""
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation")
    r = _t(spark, sf, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left")
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "left")
        .groupBy(F.coalesce(F.col("r_name"), F.lit("UNKNOWN")).alias("region_name"))
        .agg(F.count("*").alias("n_customers"), _dsum("c_acctbal", "sum_acctbal"))
    )


def q_semi_anti_join(spark, sf):
    """J4+J5: semi join via IN (FCT_RESERVATION_UPD.sql:112,115) and anti
    join for new-row detection (LEFT JOIN ... IS NULL idiom,
    SILVERPOP_USER_INCREMENTAL.sql:129-133; idempotent-insert guard
    FCT_ERBRESERVATION.sql:229-231) over the same probe set: customers
    with / without 'F'-status orders, per segment (both sides non-empty)."""
    c = _t(spark, sf, "customer")
    fo = _t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    semi = (
        c.join(fo, c.c_custkey == fo.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_with_f"))
    )
    anti = (
        c.join(fo, c.c_custkey == fo.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_without_f"))
    )
    return semi.join(anti, "c_mktsegment", "full").select(
        "c_mktsegment",
        F.coalesce(F.col("n_with_f"), F.lit(0).cast("bigint")).alias("n_with_f"),
        F.coalesce(F.col("n_without_f"), F.lit(0).cast("bigint")).alias("n_without_f"),
    )


def q_range_join(spark, sf):
    """J6: range/interval non-equi join (shiftdate between Start_Date and
    End_Date, FCT_RESTAURNT_WEEK_PROCESS.sql:94,230) — lineitems shipped
    within 30 days of their order date; equi key first so Catalyst plans a
    sort-merge on the key, not a BNLJ."""
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders")
    cond = (
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate >= o.o_orderdate)
        & (li.l_shipdate <= F.date_add(o.o_orderdate, 30))
    )
    return (
        li.join(o, cond, "inner")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_fast_ship"))
    )


def q_theta_join(spark, sf):
    """J8: theta join on a derived/cast expression (rr.webid =
    cast(r.rid as char(100)), DM_RESTAURANT_MOD.sql:6,41)."""
    n = _t(spark, sf, "nation")
    c = _t(spark, sf, "customer")
    c2 = c.withColumn("nk_str", F.col("c_nationkey").cast("string"))
    n2 = n.withColumn("nk_str", F.col("n_nationkey").cast("string"))
    return (
        c2.join(F.broadcast(n2), "nk_str", "inner")
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
    )


def q_right_join(spark, sf):
    """J3: right outer join (RestaurantDetails_Marta_v11_06152015.sql:109;
    QBR__RestPredictive_Benchmark Script.sql:193) — orders right-joined to
    the full customer roster, order-less customers kept."""
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .groupBy("c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.countDistinct("c_custkey").alias("n_customers"),
        )
    )


def q_first_event_attrs(spark, sf):
    """J9→W: argmin self-join replaced by window row_number()=1 (first-reso
    attrs via min-id self-join, FCT_USER_CALCS.sql:18-53) — the idiomatic
    Spark rewrite: one shuffle instead of a join against an aggregate."""
    e = _t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("first_event_type"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        )
    )


def q_asof_attribution(spark, sf):
    """J7: as-of / event-window attribution join (reservation within
    [click_ts, horizon), STG_SP_ATTRIBUTION_ET.sql:250-255,313-316 with the
    rank()=1 winner at :305) — each purchase attributed to the latest click
    by the same user within the preceding day; range join on the equi user
    key, then total-ordered rank picks the winner."""
    e = _t(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    buys = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("purchase_id"), "value"
    )
    cond = (
        (buys.user_id == clicks.c_user)
        & (clicks.click_ts <= buys.p_ts)
        & (clicks.click_ts >= buys.p_ts - F.expr("INTERVAL 1 DAY"))
    )
    w = W.partitionBy("purchase_id").orderBy(
        F.col("click_ts").desc(), F.col("click_id").desc()
    )
    return (
        buys.join(clicks, cond, "inner")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("purchase_id", "user_id", "click_id", F.round("value", 4).alias("value"))
    )


def q_yoy_self_join(spark, sf):
    """J12: year-over-year self-join of aggregates (PrevYr.Yr = CurYr.Yr-1,
    FCT_RESTAURNT_WEEK_PROCESS.sql:466-469) — month-over-month here (testdata
    spans months, not years)."""
    o = _t(spark, sf, "orders")
    m = o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month")).agg(
        _dsum("o_totalprice", "revenue")
    )
    cur, prev = m.alias("cur"), m.alias("prev")
    shifted = F.date_format(
        F.add_months(F.to_date(F.concat(F.col("prev.month"), F.lit("-01"))), 1), "yyyy-MM"
    )
    return (
        cur.join(prev, shifted == F.col("cur.month"), "inner")
        .select(
            F.col("cur.month").alias("month"),
            F.col("cur.revenue").alias("revenue"),
            F.col("prev.revenue").alias("prev_revenue"),
            F.round(F.col("cur.revenue") / F.col("prev.revenue"), 4).alias("mom_ratio"),
        )
    )


# --------------------------------------------------------------------------
# A — aggregations
# --------------------------------------------------------------------------


def q_groupby_agg(spark, sf):
    """A1: hash group-by with SUM/COUNT/MIN/MAX (everywhere; shape of
    fct_serverperformance_changes.sql:1-38). Partial (map-side) agg is
    automatic in the physical plan."""
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _dsum("l_quantity", "sum_qty"),
        _dsum_expr(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.count("*").alias("n_rows"),
        F.min("l_shipdate").cast("date").cast("string").alias("min_shipdate"),
        F.max("l_shipdate").cast("date").cast("string").alias("max_shipdate"),
    )


def q_conditional_agg(spark, sf):
    """A2: conditional pivot-style aggregation (12 party-size buckets,
    fct_serverperformance_changes.sql:11-22; platform buckets
    SILVERPOP_USER_INCREMENTAL.sql:4-13)."""
    li = _t(spark, sf, "lineitem")

    def bucket(lo, hi, name):
        return F.sum(
            F.when(F.col("l_quantity").between(lo, hi), 1).otherwise(0)
        ).alias(name)

    return li.groupBy("l_returnflag").agg(
        bucket(0, 10, "q_0_10"),
        bucket(11, 25, "q_11_25"),
        bucket(26, 40, "q_26_40"),
        bucket(41, 100, "q_41_plus"),
        F.count("*").alias("n_rows"),
    )


def q_count_distinct(spark, sf):
    """A3: COUNT(DISTINCT) incl. conditional distinct (count(distinct case
    when ... then metroarea end), SILVERPOP_USER_INCREMENTAL.sql:11)."""
    e = _t(spark, sf, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count_distinct(
            F.when(F.col("value") > 10, F.col("user_id"))
        ).alias("n_big_users"),
    )


def q_having_dup_probe(spark, sf):
    """A4: HAVING count(*)>1 duplicate-key probe (dup detection,
    FCT_RESERVATION_UPD.sql:158-162; DATAETL-132 GC dump.sql:14-15)."""
    o = _t(spark, sf, "orders")
    return (
        o.groupBy("o_custkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("day"))
        .agg(F.count("*").alias("n_dups"))
        .filter(F.col("n_dups") > 1)
    )


def q_ratio_vs_group_mean(spark, sf):
    """A5: multi-level aggregation — entity value vs group mean (restaurant
    rate vs metro average, RestaurantDetails_Marta_v11_06152015.sql:23-47) as
    a window avg over partition, with a zero-denominator guard."""
    s = _t(spark, sf, "supplier")
    w = W.partitionBy("s_nationkey")
    avg_bal = F.avg("s_acctbal").over(w)
    return s.select(
        "s_suppkey",
        "s_nationkey",
        F.round(
            F.when(avg_bal != 0, F.col("s_acctbal") / avg_bal).otherwise(F.lit(None)), 4
        ).alias("bal_vs_nation_avg"),
    )


def q_max_conflict(spark, sf):
    """A9: MAX-based conflict resolution — pick the billable one
    (max(case when billable...), FCT_RESERVATION_UPD.sql:45; max product
    Monthly Stats - Fact Scripts.sql:340-366) via max_by with a total
    (value, event_id) tiebreak."""
    e = _t(spark, sf, "events")
    return e.groupBy("user_id").agg(
        F.max_by(
            F.col("event_type"), F.struct(F.col("value"), F.col("event_id"))
        ).alias("top_event_type"),
        F.round(F.max("value"), 4).alias("max_value"),
    )


def q_weighted_score(spark, sf):
    """A10: weighted scoring projection (0.34*NO_COVERS + 0.26*NO_RR + ...,
    RestaurantDetails_Marta_v11_06152015.sql:254-260)."""
    e = _t(spark, sf, "events")
    agg = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("n_buy"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("n_click"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("n_view"),
    )
    return agg.select(
        "user_id",
        F.round(
            0.5 * F.col("n_buy") + 0.3 * F.col("n_click") + 0.2 * F.col("n_view"), 4
        ).alias("score"),
    )


def q_event_sourced_base(spark, sf):
    """A8/M9: event-sourced base reconstruction — next base = prev base +
    new − churn (Monthly Stats - Fact Scripts.sql:299-337), as a running-sum
    window over daily deltas."""
    e = _t(spark, sf, "events")
    daily = e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        (
            F.sum(F.when(F.col("event_type") == "signup", 1).otherwise(0))
            - F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        ).alias("delta")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return daily.select("day", "delta", F.sum("delta").over(w).alias("base"))


# --------------------------------------------------------------------------
# W/O — windows, top-k
# --------------------------------------------------------------------------


def q_lww_rank(spark, sf):
    """W2 — THE core engine op: last-writer-wins via rank()=1 per key
    (STG_SP_ATTRIBUTION_ET.sql:305,318; cross-feed LWW :273-292). Last event
    per user by (ts, event_id)."""
    e = _t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.round("value", 4).alias("last_value"),
        )
    )


def q_lead_sessionize(spark, sf):
    """W3: lead() sessionization / attribution horizon (lead(ts,1,ts+6d),
    STG_SP_ATTRIBUTION_ET.sql:180-183) — count 30-minute-gap sessions per
    user."""
    e = _t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev_ts = F.lag("ts").over(w)
    is_new = prev_ts.isNull() | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES"))
    return (
        e.withColumn("new_session", F.when(is_new, 1).otherwise(0))
        .groupBy("user_id")
        .agg(F.sum("new_session").alias("n_sessions"), F.count("*").alias("n_events"))
    )


def q_topk_per_group(spark, sf):
    """O3: top-k per key via window rank with total tiebreak
    (ranking=1 pattern, STG_SP_ATTRIBUTION_ET.sql:305-318) — top-3 orders by
    value per customer."""
    o = _t(spark, sf, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "rk", "o_orderkey", F.round("o_totalprice", 4).alias("price"))
    )


def q_global_surrogate_ids(spark, sf):
    """W1: global surrogate-key assignment (row_number() over (order by ...),
    DM_FULL_BOOK.sql:31, with the +5435020 collision offset of
    DM_FULLBOOK_CUSTOMER_NEW.sql:19,51). NOTE the single-partition hazard:
    a global orderBy window funnels all rows through one task — fine for a
    dimension publish (this query), wrong for facts; the engine uses
    content-derived keys instead."""
    n = _t(spark, sf, "nation")
    w = W.orderBy(F.col("n_name").asc())
    return n.select(
        (F.row_number().over(w) + 5435020).alias("surrogate_id"), "n_name"
    )


# --------------------------------------------------------------------------
# T — set operations
# --------------------------------------------------------------------------


def q_union_dedup_multisource(spark, sf):
    """S6/T1+T2: multi-source UNION ALL with per-source tag constants
    (ERB+GC tagging, FCT_ERBRESERVATION.sql:52,134; 3-region recon
    mayrecon_process.sql:1-122) followed by UNION-dedup
    (FCT_RESTAURNT_WEEK_PROCESS.sql:40, DM_FULL_BOOK.sql:68,92): distinct
    (source, nationkey) pairs across three tagged feeds."""

    def tagged(table, col, tag):
        return _t(spark, sf, table).select(
            F.lit(tag).alias("src"), F.col(col).cast("bigint").alias("nationkey")
        )

    u = (
        tagged("customer", "c_nationkey", "customer")
        .unionByName(tagged("supplier", "s_nationkey", "supplier"))
        .unionByName(tagged("nation", "n_nationkey", "nation"))
    )
    return u.distinct()


def q_except_recon(spark, sf):
    """T3: MINUS reconciliation diff — DW minus SOURCE should be empty
    (mayrecon_process.sql:129-132). Orderkeys seen in lineitem but absent
    from orders (non-empty here by construction of the filter)."""
    li = _t(spark, sf, "lineitem").select(F.col("l_orderkey").alias("orderkey")).distinct()
    o = (
        _t(spark, sf, "orders")
        .filter(F.col("o_totalprice") > 30000)
        .select(F.col("o_orderkey").alias("orderkey"))
        .distinct()
    )
    return li.exceptAll(o)


# --------------------------------------------------------------------------
# M — CDC / mutation patterns as queries
# --------------------------------------------------------------------------


def q_snapshot_diff_nullsafe(spark, sf):
    """M1+P4: full-row change detection via null-safe column compare
    (57-column nvl()<>nvl() diff, SILVERPOP_USER_INCREMENTAL.sql:329-394).
    Snapshot B is a deterministic mutation of customer; the diff finds
    exactly the mutated rows using NOT(a <=> b)."""
    c = _t(spark, sf, "customer")
    b = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.concat(F.col("c_name"), F.lit("_X")))
        .otherwise(F.col("c_name"))
        .alias("c_name"),
        F.when(F.col("c_custkey") % 11 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_mktsegment"),
    )
    a = c.select("c_custkey", "c_name", "c_mktsegment").alias("a")
    joined = a.join(b.alias("b"), "c_custkey", "inner")
    changed = ~(
        F.col("a.c_name").eqNullSafe(F.col("b.c_name"))
        & F.col("a.c_mktsegment").eqNullSafe(F.col("b.c_mktsegment"))
    )
    return joined.filter(changed).select(
        "c_custkey",
        F.col("b.c_name").alias("new_name"),
        F.col("b.c_mktsegment").alias("new_segment"),
    )


def q_cdc_lww_replay(spark, sf):
    """M2+M7+W2: the engine's apply law as a pure query — replay a change
    feed (events as the ledger: 'error' ⇒ delete, else upsert), keep the
    last writer per key by (ts, event_id), drop keys whose winner is a
    delete (DELETE+INSERT upsert SILVERPOP_USER_INCREMENTAL.sql:409-413;
    LWW conflict STG_SP_ATTRIBUTION_ET.sql:273-292)."""
    e = _t(spark, sf, "events")
    ops = e.withColumn(
        "op", F.when(F.col("event_type") == "error", "D").otherwise("U")
    )
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ops.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "user_id",
            F.col("event_type").alias("state_type"),
            F.round("value", 4).alias("state_value"),
        )
    )


def q_scd2_versions(spark, sf):
    """M4: SCD-2 versioning — effective ranges with close-out and a
    2099-12-31 open-end sentinel (effective_start/end_date_utc, current_flag,
    FCT_USER_OPTIN_TRACKING.sql:11-13,81-105). Each change of event_type per
    user opens a version."""
    e = _t(spark, sf, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    changes = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type")))
    )
    w2 = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("effective_start"),
        F.coalesce(
            F.date_format(F.lead("ts").over(w2), "yyyy-MM-dd HH:mm:ss"),
            F.lit("2099-12-31 00:00:00"),
        ).alias("effective_end"),
        F.when(F.lead("ts").over(w2).isNull(), 1).otherwise(0).alias("current_flag"),
    )


def q_entity_resolution(spark, sf):
    """M10: entity-resolution group id over a normalized key (dag_id per
    (lower(lname), phone), DM_FULL_BOOK.sql:27-128) — customers grouped by a
    normalized name-derived key; junk keys → -1 sentinel
    (DM_RESTAURANT_MOD.sql:124)."""
    c = _t(spark, sf, "customer")
    # normalized key: lower, strip non-alnum, take the 2-char tail; too-short
    # keys are junk → sentinel group -1 (rank only over non-null keys so the
    # group-id sequence is engine-agnostic — null ordering differs by engine)
    norm = F.expr("right(regexp_replace(lower(c_name), '[^a-z0-9]', ''), 2)")
    keyed = c.withColumn(
        "norm_key", F.when(F.length(norm) < 2, F.lit(None)).otherwise(norm)
    )
    grouped = (
        keyed.filter(F.col("norm_key").isNotNull())
        .groupBy("norm_key")
        .agg(F.count("*").alias("n_members"))
        .withColumn("group_id", F.dense_rank().over(W.orderBy("norm_key")))
    )
    junk = keyed.filter(F.col("norm_key").isNull()).agg(
        F.lit(-1).alias("group_id"), F.count("*").alias("n_members")
    )
    return (
        grouped.select("group_id", "n_members")
        .unionByName(junk.select("group_id", "n_members"))
        .filter(F.col("n_members") > 1)
    )


def q_flag_backfill(spark, sf):
    """M5: correlated UPDATE ... FROM flag backfill (payment flags from
    derived temp tables, FCT_RESERVATION_UPD.sql:278-313) — recompute-as-
    select: the fact gains a flag from an aggregate of its detail rows, the
    idiomatic Spark replacement for in-place UPDATE."""
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    agg = li.groupBy("l_orderkey").agg(
        F.max(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias("discounted_flg")
    )
    return (
        o.join(agg, o.o_orderkey == agg.l_orderkey, "left")
        .select(
            "o_orderkey",
            F.coalesce(F.col("discounted_flg"), F.lit(0)).alias("discounted_flg"),
        )
        .groupBy("discounted_flg")
        .agg(F.count("*").alias("n_orders"))
    )


def q_dedup_repair(spark, sf):
    """M6: dedup-by-delete repair — keys with multiplicity > 1 are dropped
    entirely (FCT_RESERVATION_UPD.sql:98-115,158-165; DM_FULL_BOOK.sql:75-82):
    window count per key, keep only singletons."""
    o = _t(spark, sf, "orders")
    w = W.partitionBy("o_custkey", F.date_format("o_orderdate", "yyyy-MM-dd"))
    return (
        o.withColumn("key_count", F.count("*").over(w))
        .filter(F.col("key_count") == 1)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_clean_orders"))
    )


def q_rolling_window_reload(spark, sf):
    """S2: rolling-window delete + re-insert (last-90/10-day reload,
    SP_ATTRIBUTION_ET.sql:1-31; STG_SP_ATTRIBUTION_ET.sql:27,220-228) as a
    query: rows outside the window carried, rows inside recomputed — in the
    engine this is a date-partition overwrite."""
    e = _t(spark, sf, "events")
    window_lo = "2024-01-25 00:00:00"
    outside = e.filter(F.col("ts") < window_lo).select(
        "event_id", F.round("value", 4).alias("value"), F.lit("carried").alias("origin")
    )
    reloaded = (
        e.filter(F.col("ts") >= window_lo)
        .select("event_id", F.round(F.col("value") * 2, 4).alias("value"),
                F.lit("reloaded").alias("origin"))
    )
    return (
        outside.unionByName(reloaded)
        .groupBy("origin")
        .agg(F.count("*").alias("n_rows"), _dsum("value", "sum_value"))
    )


def q_sticky_carry_forward(spark, sf):
    """M3: sticky-attribute carry-forward through upsert (TESTBUCKET copy
    from old master, deterministic default for new rows,
    SILVERPOP_USER_INCREMENTAL.sql:396-407 — the reference used random();
    the engine derives the default from the key so replay is deterministic)."""
    c = _t(spark, sf, "customer")
    old = c.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", (F.col("c_custkey") % 4).alias("bucket")
    )
    return (
        c.join(old, "c_custkey", "left")
        .select(
            "c_custkey",
            F.coalesce(F.col("bucket"), F.pmod(F.col("c_custkey"), F.lit(4)) + 10).alias(
                "bucket"
            ),
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


PARITY_QUERIES = {
    "s1_pruned_scan": q_pruned_scan,
    "p2_case_recode": q_case_recode,
    "p5_blacklist_like": q_blacklist_like,
    "p8_date_window": q_date_window,
    "p9_composite_in": q_composite_in,
    "s9_json_flatten": q_json_flatten,
    "f1_tz_interval_calendar": q_tz_interval_calendar,
    "f2_string_parse_flags": q_string_parse_flags,
    "j1_join_multikey": q_join_multikey,
    "j2_left_enrich": q_left_enrich,
    "j4_semi_anti_join": q_semi_anti_join,
    "j6_range_join": q_range_join,
    "j3_right_join": q_right_join,
    "j8_theta_join": q_theta_join,
    "j7_asof_attribution": q_asof_attribution,
    "j9_first_event_attrs": q_first_event_attrs,
    "j12_yoy_self_join": q_yoy_self_join,
    "a1_groupby_agg": q_groupby_agg,
    "a2_conditional_agg": q_conditional_agg,
    "a3_count_distinct": q_count_distinct,
    "a4_having_dup_probe": q_having_dup_probe,
    "a5_ratio_vs_group_mean": q_ratio_vs_group_mean,
    "a8_event_sourced_base": q_event_sourced_base,
    "a9_max_conflict": q_max_conflict,
    "a10_weighted_score": q_weighted_score,
    "w1_global_surrogate_ids": q_global_surrogate_ids,
    "w2_lww_rank": q_lww_rank,
    "w3_lead_sessionize": q_lead_sessionize,
    "o3_topk_per_group": q_topk_per_group,
    "t1_union_dedup_multisource": q_union_dedup_multisource,
    "t3_except_recon": q_except_recon,
    "s2_rolling_window_reload": q_rolling_window_reload,
    "m1_snapshot_diff_nullsafe": q_snapshot_diff_nullsafe,
    "m2_cdc_lww_replay": q_cdc_lww_replay,
    "m3_sticky_carry_forward": q_sticky_carry_forward,
    "m5_flag_backfill": q_flag_backfill,
    "m6_dedup_repair": q_dedup_repair,
    "m4_scd2_versions": q_scd2_versions,
    "m10_entity_resolution": q_entity_resolution,
}


PARITY_ORACLE = {
    "s1_pruned_scan": """
        SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1995-07-01' AND l_quantity > 45
    """,
    "p2_case_recode": """
        SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'expedite'
                    WHEN o_orderpriority = '3-MEDIUM' THEN 'standard'
                    ELSE 'relaxed' END AS tier,
               COUNT(*) AS n_orders,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 4) AS total_price
        FROM orders GROUP BY 1
    """,
    "p5_blacklist_like": """
        SELECT c_custkey, c_name, c_mktsegment FROM customer
        WHERE c_mktsegment NOT IN ('MACHINERY','HOUSEHOLD') AND c_name LIKE '%1%'
    """,
    "f1_tz_interval_calendar": """
        WITH cal AS (
            SELECT CAST(d AS DATE) AS cal_day, CAST(dayofweek(d) + 1 AS INT) AS dow
            FROM generate_series(DATE '2024-01-01', DATE '2024-03-31',
                                 INTERVAL 1 DAY) t(d)),
        e AS (
            SELECT *,
                   CASE WHEN user_id % 3 = 0 THEN 'America/New_York'
                        WHEN user_id % 3 = 1 THEN 'Europe/London'
                        ELSE 'Asia/Tokyo' END AS tz
            FROM events),
        x AS (
            SELECT tz,
                   CAST(timezone(tz, timezone('UTC', ts)) AS DATE) AS local_day,
                   ts + INTERVAL 1 MINUTE * (user_id % 120) AS shifted,
                   date_trunc('hour', ts)
                     + INTERVAL 30 MINUTE * CAST(floor(minute(ts) / 30) AS BIGINT) AS slot30,
                   ts + INTERVAL 6 MONTH AS plus6mo
            FROM e)
        SELECT tz, strftime(local_day, '%Y-%m-%d') AS local_day, dow,
               COUNT(*) AS n_events,
               strftime(MIN(slot30), '%Y-%m-%d %H:%M:%S') AS first_slot,
               strftime(MAX(shifted), '%Y-%m-%d %H:%M:%S') AS last_shifted,
               strftime(MAX(plus6mo), '%Y-%m-%d %H:%M:%S') AS max_plus_6mo
        FROM x JOIN cal ON local_day = cal_day
        GROUP BY 1, 2, 3
    """,
    "f2_string_parse_flags": """
        SELECT p_partkey,
               substring(p_brand, instr(p_brand, '#') + 1) AS brand_digits,
               CAST(substring(p_brand, instr(p_brand, '#') + 1) AS BIGINT) AS brand_num,
               lpad(CAST(p_partkey AS VARCHAR), 12, '0') AS padded_key,
               translate(p_brand, '0123456789', '##########') AS brand_masked,
               substring(p_name, 1,
                         length(p_name) - instr(reverse(p_name), ' ')) AS name_prefix,
               (CASE WHEN p_size > 20 THEN 1 ELSE 0 END)
                 | (CASE WHEN p_type = 'ECONOMY' THEN 2 ELSE 0 END)
                 | (CASE WHEN p_partkey % 2 = 0 THEN 4 ELSE 0 END) AS flags
        FROM part
        ORDER BY p_partkey ASC
        LIMIT 100
    """,
    "p8_date_window": """
        SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n_events,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_value
        FROM events
        WHERE ts BETWEEN TIMESTAMP '2024-01-03 00:00:00' AND TIMESTAMP '2024-01-05 23:59:59'
        GROUP BY 1
    """,
    "p9_composite_in": """
        SELECT l_returnflag, COUNT(*) AS n_rows FROM lineitem l
        WHERE EXISTS (
            SELECT 1 FROM (
                SELECT l_partkey AS pk, l_suppkey AS sk FROM lineitem
                GROUP BY 1, 2 HAVING SUM(l_quantity) > 90) b
            WHERE b.pk = l.l_partkey AND b.sk = l.l_suppkey)
        GROUP BY 1
    """,
    "s9_json_flatten": """
        SELECT event_type, COUNT(k) AS n,
               ROUND(CAST(SUM(CAST(k AS DECIMAL(38,6))) AS DOUBLE), 0) AS sum_k,
               CAST(SUM(CASE WHEN regexp_matches(k_str, '^\\d{2}$') THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_valid_2digit
        FROM (SELECT event_type,
                     CAST(json_extract_string(props, '$.k') AS INT) AS k,
                     regexp_extract(props, '"k": (\\d+)', 1) AS k_str
              FROM events)
        GROUP BY event_type
    """,
    "j1_join_multikey": """
        WITH agg AS (
            SELECT l_partkey, l_suppkey, SUM(l_quantity) AS ps_qty
            FROM lineitem GROUP BY 1, 2)
        SELECT l.l_returnflag, COUNT(*) AS n_rows,
               ROUND(CAST(SUM(CAST(a.ps_qty AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_ps_qty
        FROM lineitem l JOIN agg a USING (l_partkey, l_suppkey)
        WHERE a.ps_qty > 80 GROUP BY 1
    """,
    "j2_left_enrich": """
        SELECT COALESCE(r_name, 'UNKNOWN') AS region_name,
               COUNT(*) AS n_customers,
               ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_acctbal
        FROM customer
        LEFT JOIN nation ON c_nationkey = n_nationkey
        LEFT JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1
    """,
    "j4_semi_anti_join": """
        WITH s AS (
            SELECT c_mktsegment, COUNT(*) AS n_with_f FROM customer
            WHERE EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = customer.c_custkey
                            AND o.o_orderstatus = 'F')
            GROUP BY 1),
        a AS (
            SELECT c_mktsegment, COUNT(*) AS n_without_f FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = customer.c_custkey
                                AND o.o_orderstatus = 'F')
            GROUP BY 1)
        SELECT COALESCE(s.c_mktsegment, a.c_mktsegment) AS c_mktsegment,
               CAST(COALESCE(n_with_f, 0) AS BIGINT) AS n_with_f,
               CAST(COALESCE(n_without_f, 0) AS BIGINT) AS n_without_f
        FROM s FULL JOIN a ON s.c_mktsegment = a.c_mktsegment
    """,
    "j6_range_join": """
        SELECT o_orderpriority, COUNT(*) AS n_fast_ship
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          AND l_shipdate >= o_orderdate
          AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
        GROUP BY 1
    """,
    "j8_theta_join": """
        SELECT n_name, COUNT(*) AS n_customers
        FROM customer JOIN nation
          ON CAST(c_nationkey AS VARCHAR) = CAST(n_nationkey AS VARCHAR)
        GROUP BY 1
    """,
    "j7_asof_attribution": """
        WITH clicks AS (
            SELECT user_id AS c_user, ts AS click_ts, event_id AS click_id
            FROM events WHERE event_type = 'click'),
        buys AS (
            SELECT user_id, ts AS p_ts, event_id AS purchase_id, value
            FROM events WHERE event_type = 'purchase')
        SELECT purchase_id, user_id, click_id, ROUND(value, 4) AS value
        FROM buys JOIN clicks
          ON user_id = c_user
         AND click_ts <= p_ts AND click_ts >= p_ts - INTERVAL 1 DAY
        QUALIFY ROW_NUMBER() OVER (PARTITION BY purchase_id
                ORDER BY click_ts DESC, click_id DESC) = 1
    """,
    "j9_first_event_attrs": """
        SELECT user_id, event_type AS first_event_type,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                        ORDER BY ts ASC, event_id ASC) AS rn FROM events)
        WHERE rn = 1
    """,
    "j3_right_join": """
        SELECT c_mktsegment, COUNT(o_orderkey) AS n_orders,
               COUNT(DISTINCT c_custkey) AS n_customers
        FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
        GROUP BY 1
    """,
    "s2_rolling_window_reload": """
        WITH u AS (
            SELECT event_id, ROUND(value, 4) AS value, 'carried' AS origin
            FROM events WHERE ts < TIMESTAMP '2024-01-25 00:00:00'
            UNION ALL
            SELECT event_id, ROUND(value * 2, 4) AS value, 'reloaded' AS origin
            FROM events WHERE ts >= TIMESTAMP '2024-01-25 00:00:00')
        SELECT origin, COUNT(*) AS n_rows,
               ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_value
        FROM u GROUP BY 1
    """,
    "m5_flag_backfill": """
        WITH agg AS (
            SELECT l_orderkey,
                   MAX(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS discounted_flg
            FROM lineitem GROUP BY 1)
        SELECT COALESCE(discounted_flg, 0) AS discounted_flg, COUNT(*) AS n_orders
        FROM orders LEFT JOIN agg ON o_orderkey = l_orderkey
        GROUP BY 1
    """,
    "m6_dedup_repair": """
        SELECT o_orderstatus, COUNT(*) AS n_clean_orders
        FROM (SELECT *, COUNT(*) OVER (PARTITION BY o_custkey,
                    strftime(o_orderdate, '%Y-%m-%d')) AS key_count FROM orders)
        WHERE key_count = 1
        GROUP BY 1
    """,
    "j12_yoy_self_join": """
        WITH m AS (
            SELECT strftime(o_orderdate, '%Y-%m') AS month,
                   ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE), 4) AS revenue
            FROM orders GROUP BY 1)
        SELECT cur.month AS month, cur.revenue AS revenue,
               prev.revenue AS prev_revenue,
               ROUND(cur.revenue / prev.revenue, 4) AS mom_ratio
        FROM m cur JOIN m prev
          ON cur.month = strftime(CAST(prev.month || '-01' AS DATE) + INTERVAL 1 MONTH, '%Y-%m')
    """,
    "a1_groupby_agg": """
        SELECT l_returnflag, l_linestatus,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_qty,
               ROUND(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 4) AS revenue,
               COUNT(*) AS n_rows,
               strftime(MIN(l_shipdate), '%Y-%m-%d') AS min_shipdate,
               strftime(MAX(l_shipdate), '%Y-%m-%d') AS max_shipdate
        FROM lineitem GROUP BY 1, 2
    """,
    "a2_conditional_agg": """
        SELECT l_returnflag,
               CAST(SUM(CASE WHEN l_quantity BETWEEN 0 AND 10 THEN 1 ELSE 0 END) AS BIGINT) AS q_0_10,
               CAST(SUM(CASE WHEN l_quantity BETWEEN 11 AND 25 THEN 1 ELSE 0 END) AS BIGINT) AS q_11_25,
               CAST(SUM(CASE WHEN l_quantity BETWEEN 26 AND 40 THEN 1 ELSE 0 END) AS BIGINT) AS q_26_40,
               CAST(SUM(CASE WHEN l_quantity BETWEEN 41 AND 100 THEN 1 ELSE 0 END) AS BIGINT) AS q_41_plus,
               COUNT(*) AS n_rows
        FROM lineitem GROUP BY 1
    """,
    "a3_count_distinct": """
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
               COUNT(DISTINCT CASE WHEN value > 10 THEN user_id END) AS n_big_users
        FROM events GROUP BY 1
    """,
    "a4_having_dup_probe": """
        SELECT o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS day, COUNT(*) AS n_dups
        FROM orders GROUP BY 1, 2 HAVING COUNT(*) > 1
    """,
    "a5_ratio_vs_group_mean": """
        SELECT s_suppkey, s_nationkey,
               ROUND(CASE WHEN AVG(s_acctbal) OVER (PARTITION BY s_nationkey) <> 0
                     THEN s_acctbal / AVG(s_acctbal) OVER (PARTITION BY s_nationkey)
                     END, 4) AS bal_vs_nation_avg
        FROM supplier
    """,
    "a8_event_sourced_base": """
        WITH daily AS (
            SELECT strftime(ts, '%Y-%m-%d') AS day,
                   CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                      - SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS delta
            FROM events GROUP BY 1)
        SELECT day, delta,
               CAST(SUM(delta) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT) AS base
        FROM daily
    """,
    "a9_max_conflict": """
        SELECT user_id, event_type AS top_event_type, ROUND(value, 4) AS max_value
        FROM events QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
             ORDER BY value DESC, event_id DESC) = 1
    """,
    "a10_weighted_score": """
        SELECT user_id,
               ROUND(0.5e0 * SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)
                   + 0.3e0 * SUM(CASE WHEN event_type='click' THEN 1 ELSE 0 END)
                   + 0.2e0 * SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END), 4) AS score
        FROM events GROUP BY 1
    """,
    "w1_global_surrogate_ids": """
        SELECT ROW_NUMBER() OVER (ORDER BY n_name ASC) + 5435020 AS surrogate_id, n_name
        FROM nation
    """,
    "w2_lww_rank": """
        SELECT user_id, event_type AS last_event_type, ROUND(value, 4) AS last_value
        FROM events QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
             ORDER BY ts DESC, event_id DESC) = 1
    """,
    "w3_lead_sessionize": """
        WITH g AS (
            SELECT user_id,
                   CASE WHEN LAG(ts) OVER w IS NULL THEN 1
                        WHEN ts > LAG(ts) OVER w + INTERVAL 30 MINUTE THEN 1
                        ELSE 0 END AS new_session
            FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))
        SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
        FROM g GROUP BY 1
    """,
    "o3_topk_per_group": """
        SELECT o_custkey, rk, o_orderkey, ROUND(o_totalprice, 4) AS price
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk FROM orders)
        WHERE rk <= 3
    """,
    "t1_union_dedup_multisource": """
        SELECT DISTINCT * FROM (
            SELECT 'customer' AS src, CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
            UNION ALL
            SELECT 'supplier', CAST(s_nationkey AS BIGINT) FROM supplier
            UNION ALL
            SELECT 'nation', CAST(n_nationkey AS BIGINT) FROM nation)
    """,
    "t3_except_recon": """
        SELECT DISTINCT l_orderkey AS orderkey FROM lineitem
        EXCEPT
        SELECT DISTINCT o_orderkey FROM orders WHERE o_totalprice > 30000
    """,
    "m1_snapshot_diff_nullsafe": """
        WITH b AS (
            SELECT c_custkey,
                   CASE WHEN c_custkey % 7 = 0 THEN c_name || '_X' ELSE c_name END AS c_name,
                   CASE WHEN c_custkey % 11 = 0 THEN NULL ELSE c_mktsegment END AS c_mktsegment
            FROM customer)
        SELECT a.c_custkey, b.c_name AS new_name, b.c_mktsegment AS new_segment
        FROM customer a JOIN b USING (c_custkey)
        WHERE NOT (a.c_name IS NOT DISTINCT FROM b.c_name
               AND a.c_mktsegment IS NOT DISTINCT FROM b.c_mktsegment)
    """,
    "m2_cdc_lww_replay": """
        SELECT user_id, event_type AS state_type, ROUND(value, 4) AS state_value
        FROM (SELECT *, CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                         ORDER BY ts DESC, event_id DESC) AS rn
              FROM events)
        WHERE rn = 1 AND op <> 'D'
    """,
    "m3_sticky_carry_forward": """
        WITH old AS (
            SELECT c_custkey, c_custkey % 4 AS bucket FROM customer WHERE c_custkey % 2 = 0)
        SELECT COALESCE(old.bucket, (customer.c_custkey % 4) + 10) AS bucket, COUNT(*) AS n
        FROM customer LEFT JOIN old USING (c_custkey)
        GROUP BY 1
    """,
    "m4_scd2_versions": """
        WITH changes AS (
            SELECT user_id, event_type, ts, event_id
            FROM (SELECT *, LAG(event_type) OVER (PARTITION BY user_id
                        ORDER BY ts ASC, event_id ASC) AS prev_type FROM events)
            WHERE prev_type IS NULL OR prev_type <> event_type)
        SELECT user_id, event_type AS state,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS effective_start,
               COALESCE(strftime(LEAD(ts) OVER w, '%Y-%m-%d %H:%M:%S'),
                        '2099-12-31 00:00:00') AS effective_end,
               CASE WHEN LEAD(ts) OVER w IS NULL THEN 1 ELSE 0 END AS current_flag
        FROM changes WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
    "m10_entity_resolution": """
        WITH keyed AS (
            SELECT CASE WHEN LENGTH(right(regexp_replace(LOWER(c_name), '[^a-z0-9]', '', 'g'), 2)) < 2
                        THEN NULL
                        ELSE right(regexp_replace(LOWER(c_name), '[^a-z0-9]', '', 'g'), 2)
                   END AS norm_key
            FROM customer),
        grouped AS (
            SELECT norm_key, COUNT(*) AS n_members,
                   DENSE_RANK() OVER (ORDER BY norm_key) AS group_id
            FROM keyed WHERE norm_key IS NOT NULL GROUP BY norm_key),
        junk AS (
            SELECT -1 AS group_id, COUNT(*) AS n_members FROM keyed WHERE norm_key IS NULL)
        SELECT group_id, n_members FROM (
            SELECT group_id, n_members FROM grouped
            UNION ALL SELECT group_id, n_members FROM junk)
        WHERE n_members > 1
    """,
}
