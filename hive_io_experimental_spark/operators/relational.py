"""Relational operator surface, expressed as DataFrame query builders.

The reference has NO relational operators (SURVEY §2.2: no joins, aggs,
windows, sorts, set-ops) — Spark SQL supplies them. These builders exercise
every category end-to-end through the engine so the capability is tested and
benchmarked, with plan shapes chosen for the 100 TB design point:

  * dimension joins are broadcast (region/nation/supplier/customer are tiny
    relative to fact tables at any SF);
  * aggregations use exact decimal accumulation for money columns — this is
    both a correctness choice (reproducible across engines: double sums are
    order-dependent, decimal sums are exact) and free on the JVM;
  * sorts appear only where semantics need them (top-k), always with a
    unique tie-break so results are deterministic.

Money arithmetic convention: cast operands to SMALL decimals —
decimal(12,2) for amounts, decimal(4,2) for rates — BEFORE the arithmetic,
then aggregate and cast the final aggregate back to double. Small operand
precisions keep every intermediate type below precision 38 so neither
engine's decimal-promotion rules kick in; results are exact and
value-hash-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ensure_event_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Normalize the event-time column to TimestampType (epoch microseconds).

    This is the SINGLE entry point from whatever type storage hands us to the
    engine's event-time currency (a TIMESTAMP whose ``unix_micros`` equals the
    wall-clock microseconds since 1970-01-01 00:00:00). Storage drifts — the
    same logical column has arrived as three physical types across rounds:

    * ``bigint`` — TIMESTAMP(NANOS) parquet read under
      spark.sql.legacy.parquet.nanosAsLong (session.py). Floor-divide to
      micros, identical to DuckDB's nanos->micros truncation on read.
    * ``timestamp_ntz`` — TIMESTAMP(MICROS, isAdjustedToUTC=false) parquet
      (pandas writers) under spark.sql.parquet.inferTimestampNTZ. Convert
      tz-INDEPENDENTLY: take the NTZ wall-clock's offset from the NTZ epoch
      directly, so the result is the same long in any session timezone and
      matches DuckDB's naive-TIMESTAMP epoch() semantics.
    * ``timestamp`` — already the currency; pass through.

    Every operator that touches event time MUST route through here before
    calling ``unix_micros`` (enforced by tests/test_operators.py's dtype
    matrix) so the next storage drift breaks one function, not 15 queries.
    """
    dtype = dict(df.dtypes).get(ts_col)
    if dtype == "bigint":
        return df.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"`{ts_col}` div 1000"))
        )
    if dtype == "timestamp_ntz":
        return df.withColumn(
            ts_col,
            F.timestamp_micros(
                F.expr(
                    "timestampdiff(MICROSECOND, "
                    f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{ts_col}`)"
                )
            ),
        )
    return df


def month_epoch(ts_col: str):
    """Epoch seconds of the calendar-month start — timezone-INDEPENDENT.

    ``date_trunc('month', <timestamp>)`` truncates in the SESSION timezone,
    so its epoch value shifts when the driver host isn't UTC; the oracle
    (DuckDB over naive timestamps) truncates the UTC wall clock. This
    formulation stays in pure date arithmetic — epoch-us -> days-since-epoch
    -> DATE -> month-truncated DATE -> days -> seconds — which no session
    timezone touches, so Spark and the oracle agree under any TZ setting.
    """
    return F.expr(
        "cast(unix_date(trunc(date_add(DATE'1970-01-01', "
        f"cast(unix_micros(`{ts_col}`) div 86400000000 as int)), 'MM')) "
        "as bigint) * 86400"
    )


def _amt(col):
    return col.cast("decimal(12,2)")


def _rate(col):
    return col.cast("decimal(4,2)")


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped aggregate over lineitem (the flagship query).

    Single shuffle on a 6-value grouping key; partial aggregation map-side.
    """
    disc_price = _amt(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(4,2)") - _rate(F.col("l_discount"))
    )
    charge = disc_price * (
        F.lit(1).cast("decimal(4,2)") + _rate(F.col("l_tax"))
    )
    return (
        lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_amt(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.sum(_amt(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_amt(F.col("l_quantity"))).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(_amt(F.col("l_extendedprice"))).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def top_revenue_orders(customer: DataFrame, orders: DataFrame, lineitem: DataFrame,
                       segment: str = "BUILDING", k: int = 10) -> DataFrame:
    """TPC-H Q3-shaped: top-k orders by discounted revenue for a segment.

    customer is broadcast (dimension); orders⋈lineitem shuffles on orderkey.
    Deterministic: ties broken by o_orderkey.
    """
    revenue = _amt(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(4,2)") - _rate(F.col("l_discount"))
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer.filter(F.col("c_mktsegment") == segment)),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(k)
    )


def nation_revenue(region: DataFrame, nation: DataFrame, customer: DataFrame,
                   orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q5-shaped: revenue per nation (all regions, no date cut —
    the driver testdata has a reduced column set).

    region/nation/customer broadcast up the snowflake; the only large
    shuffle is lineitem⋈orders on orderkey.
    """
    revenue = _amt(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(4,2)") - _rate(F.col("l_discount"))
    )
    dim = (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy("r_name", "n_name")
    )


def local_supplier_volume(
    region: DataFrame, nation: DataFrame, customer: DataFrame,
    orders: DataFrame, lineitem: DataFrame, supplier: DataFrame,
) -> DataFrame:
    """TPC-H Q5 semantics: revenue per nation where the supplying supplier
    and the ordering customer share a nation (local fulfilment).

    The six-way join keeps ONE large shuffle (lineitem⋈orders on orderkey);
    customer/supplier/nation/region are all broadcast — at 100 TB lineitem
    is the only table that doesn't fit an executor, so this is the right
    asymmetry. The c_nationkey = s_nationkey co-location predicate rides on
    the supplier broadcast join.
    """
    revenue = _amt(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(4,2)") - _rate(F.col("l_discount"))
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def promo_revenue(part: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q14 semantics: percentage of revenue from PROMO parts.

    One broadcast join (part is the dimension) + conditional aggregation;
    exact decimal accumulation, one final double division.
    """
    disc = _amt(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(4,2)") - _rate(F.col("l_discount"))
    )
    promo = F.when(
        F.col("p_type").startswith("PROMO"), disc
    ).otherwise(F.lit(0).cast("decimal(12,2)"))
    return (
        lineitem.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(disc).cast("double"),
                6,
            ).alias("promo_pct"),
            F.sum(promo).cast("double").alias("promo_revenue"),
            F.sum(disc).cast("double").alias("total_revenue"),
        )
    )


def customer_order_ranks(orders: DataFrame, k: int = 3) -> DataFrame:
    """Window function: top-k orders per customer by total price.

    One shuffle on o_custkey; rank with unique tie-break.
    """
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    # rank cast to long: row_number is int in Spark but bigint in most other
    # engines; long keeps the cross-engine result schema stable.
    return (
        orders.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("o_custkey", "o_orderkey",
                F.col("o_totalprice").cast("double").alias("o_totalprice"), "rnk")
    )


def event_user_setops(
    events: DataFrame, min_purchase_value: float = 50.0, max_errors: int = 15
) -> DataFrame:
    """Set operations: high-value purchasers INTERSECT clickers, EXCEPT
    heavy-error users (more than ``max_errors`` error events).

    Exercises intersect/except through distinct-aggregation plans.
    Returns sorted user_ids (small result; the distincts shuffle on user_id).
    """
    high_purchasers = (
        events.filter(
            (F.col("event_type") == "purchase")
            & (F.col("value") >= min_purchase_value)
        )
        .select("user_id")
        .distinct()
    )
    clickers = (
        events.filter(F.col("event_type") == "click").select("user_id").distinct()
    )
    heavy_error = (
        events.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > max_errors)
        .select("user_id")
    )
    return (
        high_purchasers.intersect(clickers).exceptAll(heavy_error)
    )


def events_hourly(events: DataFrame) -> DataFrame:
    """Tumbling-hour aggregate per event type (batch twin of the streaming
    windowed aggregation in streaming/windows.py).

    Hour computed timezone-independently from epoch micros, so results are
    identical in any session timezone and any engine.
    """
    events = ensure_event_time(events)
    # integer division (`div`), not double division: exact at any epoch value
    hour_epoch = (F.expr("unix_micros(ts) div 3600000000") * F.lit(3600)).alias(
        "hour_epoch"
    )
    return (
        events.groupBy(hour_epoch, F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,4)")).cast("double").alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("hour_epoch", "event_type")
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization (batch twin of the stateful streaming
    version): a new session starts when a user's inter-event gap exceeds
    ``gap_minutes``. Returns per-user session counts + avg session length.

    Two window passes over (user_id, ts) — one shuffle on user_id.
    """
    events = ensure_event_time(events)
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    with_new = events.select(
        "user_id", "ts", "event_id",
        F.when(
            (us - F.lag(us).over(w)) > gap_us, F.lit(1)
        ).otherwise(F.lit(0)).alias("new_session"),
    )
    return (
        with_new.groupBy("user_id")
        .agg(
            (F.sum("new_session") + 1).alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def events_time_rollup(events: DataFrame) -> DataFrame:
    """Hypertable-style multi-resolution rollup: hour, day, and month
    aggregates of the event stream in ONE pass via GROUPING SETS.

    A timeseries store would maintain three continuous aggregates; here one
    shuffle feeds all three grains (Catalyst expands the sets map-side,
    partial aggregation still applies). gid identifies the grain:
    3=hour, 5=day, 6=month (GROUPING bit per unused column).
    """
    e = ensure_event_time(events)
    # integer `div`, not `/`: float division of epoch-us values is
    # precision-hazardous and DuckDB's // is integer floor-div.
    prep = e.select(
        F.expr("unix_micros(ts) div 3600000000 * 3600").alias("hour_epoch"),
        F.expr("unix_micros(ts) div 86400000000 * 86400").alias("day_epoch"),
        month_epoch("ts").alias("month_epoch"),
        "value",
    )
    return (
        prep.groupingSets(
            [["hour_epoch"], ["day_epoch"], ["month_epoch"]],
            "hour_epoch", "day_epoch", "month_epoch",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,4)"))
            .cast("double")
            .alias("sum_value"),
            F.grouping_id().alias("gid"),
        )
        .orderBy("gid", "hour_epoch", "day_epoch", "month_epoch")
    )


def customers_with_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """LEFT SEMI join: customers having at least one order.

    Semi joins never materialize the right side's columns — the shuffle
    carries only the join key, and Spark broadcasts the key set when small.
    """
    return (
        customer.join(
            orders, customer["c_custkey"] == orders["o_custkey"], "left_semi"
        )
        .select("c_custkey", "c_name")
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """LEFT ANTI join: customers with no orders (TPC-H Q22 flavor)."""
    return (
        customer.join(
            orders, customer["c_custkey"] == orders["o_custkey"], "left_anti"
        )
        .select("c_custkey", "c_name")
    )


def revenue_rollup(region: DataFrame, nation: DataFrame, customer: DataFrame,
                   orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """ROLLUP over (region, nation): per-nation revenue + regional and grand
    subtotals, with grouping_id to tag subtotal rows.

    Spark computes rollups with a single Expand+shuffle; at scale this is
    one pass regardless of the number of grouping sets.
    """
    revenue = _amt(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(4,2)") - _rate(F.col("l_discount"))
    )
    dim = (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dim), F.col("o_custkey") == F.col("c_custkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .orderBy(F.col("gid"), F.col("r_name"), F.col("n_name"))
    )


def part_scalar_profile(part: DataFrame) -> DataFrame:
    """Scalar-function surface over `part`: string, math and conditional
    functions in one projection (the reference has NO scalar functions at all
    — SURVEY §2.2; Spark's built-in library is exposed through the engine).

    Pure per-row map: no shuffle, whole-stage codegen, trivially scalable.
    """
    return part.select(
        "p_partkey",
        F.upper(F.col("p_brand")).alias("brand_upper"),
        F.length(F.col("p_name")).alias("name_len"),
        F.substring(F.col("p_type"), 1, 5).alias("type_prefix"),
        F.abs(F.col("p_size") - F.lit(25)).alias("size_dist"),
        F.pmod(F.col("p_partkey"), F.lit(7)).cast("long").alias("key_mod"),
        (F.col("p_retailprice").cast("decimal(12,2)")
         * F.lit(1.10).cast("decimal(4,2)"))
        .cast("double")
        .alias("price_plus_10pct"),
        F.when(F.col("p_size") >= 30, F.lit("large"))
        .when(F.col("p_size") >= 15, F.lit("medium"))
        .otherwise(F.lit("small"))
        .alias("size_class"),
    )


def orders_by_month(orders: DataFrame) -> DataFrame:
    """Calendar-month aggregate of orders (date/time function surface).

    o_orderdate arrives in whatever physical type storage chose (see
    ensure_event_time); month truncation uses pure date arithmetic
    (month_epoch) so the result is timezone- and engine-independent.
    """
    orders = ensure_event_time(orders, "o_orderdate")
    month = month_epoch("o_orderdate").alias("month_epoch")
    return (
        orders.groupBy(month)
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_totalprice"),
        )
        .orderBy("month_epoch")
    )


def late_ship_priority(
    orders: DataFrame, lineitem: DataFrame, late_days: int = 60
) -> DataFrame:
    """TPC-H Q4 shape: orders with at least one line shipped more than
    ``late_days`` after the order date, counted by priority.

    Semi-join with a cross-table predicate: the EXISTS subquery becomes a
    left-semi hash join on orderkey — Catalyst pushes the key equality into
    the join and evaluates the lateness predicate on matched pairs, so no
    row multiplication reaches the aggregate.

    Timestamps here are TIMESTAMP_NTZ (micros parquet without UTC
    adjustment); the timezone-free comparison for naive timestamps is
    INTERVAL arithmetic — identical in Spark and DuckDB regardless of
    session timezone. (Nanos-as-long columns get plain integer arithmetic;
    see ensure_event_time for the type taxonomy.)
    """
    o = orders.select("o_orderkey", "o_orderpriority", "o_orderdate")
    l = lineitem.select("l_orderkey", "l_shipdate")
    if dict(lineitem.dtypes).get("l_shipdate") == "bigint":
        lateness = F.col("l_shipdate") > (
            F.col("o_orderdate") + F.lit(late_days * 86_400 * 10**9)
        )
    else:
        lateness = F.expr(
            f"l_shipdate > o_orderdate + INTERVAL {late_days} DAYS"
        )
    late = o.join(
        l,
        (F.col("o_orderkey") == F.col("l_orderkey")) & lateness,
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("o_orderpriority")
    )


def large_volume_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    min_qty: float = 250.0,
) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds ``min_qty``,
    with their customer.

    The HAVING filter runs on the lineitem-side aggregate BEFORE the
    customer/orders joins (aggregate first, then join the few survivors) —
    at scale this is the difference between joining 100 TB of lineitem and
    joining a few thousand qualifying orderkeys. Dimension joins broadcast.
    """
    qty = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(_amt(F.col("l_quantity"))).cast("double").alias("sum_qty"))
        .filter(F.col("sum_qty") > min_qty)
    )
    return (
        qty.join(orders, qty["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(customer), orders["o_custkey"] == customer["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_totalprice").cast("decimal(12,2)").cast("double")
            .alias("o_totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("sum_qty").desc(), F.col("o_orderkey").asc())
    )


def user_event_paths(
    events: DataFrame,
    max_steps: int = 10,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per user: the first ``max_steps`` event types in time order, as a
    '>'-joined path string, plus the total event count.

    The behavioral-sequence shape (session path mining / markov features):
    ONE groupBy collecting (ts, id, type) structs, then pure array math —
    array_sort on the struct (ts, then event_id: deterministic under
    concurrent timestamps), slice, transform, join. Collect-then-sort keeps
    ordering engine-independent, unlike relying on input order.
    Returns (user_id, path, n_events).
    """
    ev = ensure_event_time(events, ts_col)
    item = F.struct(
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col("event_id").alias("eid"),
        F.col(type_col).alias("t"),
    )
    return (
        ev.groupBy(F.col(user_col).alias("user_id"))
        .agg(
            F.collect_list(item).alias("_items"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "user_id",
            F.concat_ws(
                ">",
                F.transform(
                    F.slice(F.array_sort("_items"), 1, max_steps),
                    lambda s: s["t"],
                ),
            ).alias("path"),
            "n_events",
        )
    )


def trailing_purchase_stats(
    events: DataFrame,
    days: int = 30,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per purchase: count and value of the same user's purchases in the
    trailing ``days`` window, current row included (RANGE frame analytics —
    the rolling-feature shape feature stores compute).

    One shuffle (partition by user), then a sort within partitions; the
    RANGE frame is evaluated with a sliding aggregate over the sorted run.
    Epoch-microsecond ordering keys keep the frame timezone-free; the value
    sum accumulates in exact decimals so the rolling feature is
    order-independent. Returns (event_id, user_id, ts_us, n_trailing,
    sum_trailing).
    """
    from pyspark.sql import Window as W

    ev = ensure_event_time(events, ts_col).filter(
        F.col(type_col) == "purchase"
    ).select(
        "event_id",
        F.col(user_col).alias("user_id"),
        F.unix_micros(F.col(ts_col)).alias("ts_us"),
        F.col("value").cast("decimal(18,4)").alias("_v"),
    )
    horizon = days * 86_400_000_000
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-horizon, W.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts_us",
        F.count(F.lit(1)).over(w).alias("n_trailing"),
        F.sum("_v").over(w).cast("double").alias("sum_trailing"),
    )


def funnel_counts(
    events: DataFrame,
    steps: tuple[str, ...] = ("signup", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel analysis: users completing each step prefix in order.

    The standard simplified funnel (first-touch semantics): per user take
    the MIN event time of each step type, and a user completes step k iff
    min(t_1) < min(t_2) < ... < min(t_k). One shuffle (the per-user
    conditional aggregation, map-side partial); the funnel cascade is pure
    column math on the aggregate row. Times compared as epoch micros —
    timezone-free. Returns (step_index, step, n_users) with step_index 1-N.
    """
    mins = _funnel_mins(events, steps, user_col, type_col, ts_col)
    # completed_k = all of t0..tk present and strictly increasing
    conds = []
    for k in range(len(steps)):
        c = F.col("t0").isNotNull()
        for j in range(1, k + 1):
            c = c & F.col(f"t{j}").isNotNull() & (
                F.col(f"t{j-1}") < F.col(f"t{j}")
            )
        conds.append(c)
    counts = mins.agg(
        *[
            F.sum(F.when(conds[k], 1).otherwise(0)).alias(f"n{k}")
            for k in range(len(steps))
        ]
    )
    spark = events.sparkSession
    steps_df = spark.createDataFrame(
        [(i + 1, s) for i, s in enumerate(steps)], "step_index int, step string"
    )
    melted = counts.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i + 1).alias("step_index"),
                        F.col(f"n{i}").alias("n_users"),
                    )
                    for i in range(len(steps))
                ]
            )
        ).alias("r")
    ).select(F.col("r.step_index").alias("step_index"), F.col("r.n_users").alias("n_users"))
    return (
        melted.join(F.broadcast(steps_df), "step_index")
        .select("step_index", "step", "n_users")
        .orderBy("step_index")
    )


def _funnel_mins(
    events: DataFrame,
    steps: tuple[str, ...],
    user_col: str,
    type_col: str,
    ts_col: str,
) -> DataFrame:
    """Shared funnel stage-1: per-user first-touch epoch-micros per step."""
    ev = ensure_event_time(events, ts_col)
    us = F.unix_micros(F.col(ts_col))
    return ev.filter(F.col(type_col).isin(*steps)).groupBy(user_col).agg(
        *[
            F.min(F.when(F.col(type_col) == s, us)).alias(f"t{i}")
            for i, s in enumerate(steps)
        ]
    )


def funnel_step_counts(
    events: DataFrame,
    steps: tuple[str, ...] = ("signup", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Diagnostic twin of funnel_counts: the same per-step cascade counts
    as ONE row of BIGINT columns (n0..nK), with no melt, no step-name
    strings, no broadcast join.

    Purpose: when an external harness disagrees with funnel_counts, this
    gate isolates whether the divergence is in the integer computation
    (this also fails) or in the melt/labels/hash of the 3-row shape (only
    funnel_counts fails). Integers hash identically across engines.
    """
    mins = _funnel_mins(events, steps, user_col, type_col, ts_col)
    conds = []
    for k in range(len(steps)):
        c = F.col("t0").isNotNull()
        for j in range(1, k + 1):
            c = c & F.col(f"t{j}").isNotNull() & (
                F.col(f"t{j-1}") < F.col(f"t{j}")
            )
        conds.append(c)
    return mins.agg(
        *[
            F.sum(F.when(conds[k], 1).otherwise(0))
            .cast("long")
            .alias(f"n{k}")
            for k in range(len(steps))
        ]
    )


def funnel_user_extrema(
    events: DataFrame,
    steps: tuple[str, ...] = ("signup", "click", "purchase"),
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Diagnostic: extrema of the funnel's per-user first-touch times.

    One row of pure BIGINTs — for each step i: how many users have a
    first touch (cnt_t{i}), and the min/max/sum of those epoch-micros.
    If an external harness disagrees with funnel_counts, these integers
    localize WHICH step's time extraction diverges (timestamp decode,
    timezone, or truncation) before any cascade comparison happens.
    """
    mins = _funnel_mins(events, steps, user_col, type_col, ts_col)
    aggs = []
    for i in range(len(steps)):
        t = F.col(f"t{i}")
        aggs += [
            F.count(t).alias(f"cnt_t{i}"),
            F.min(t).alias(f"min_t{i}"),
            F.max(t).alias(f"max_t{i}"),
            F.sum(t).alias(f"sum_t{i}"),
        ]
    return mins.agg(*aggs)


def event_props_stats(events: DataFrame, json_col: str = "props",
                      key: str = "k") -> DataFrame:
    """Semi-structured surface: extract a field from the JSON ``props``
    column and aggregate it per event type.

    get_json_object evaluates JVM-side (Jackson) inside the scan projection —
    no Python, no shuffle beyond the final small-key aggregate. At 100 TB the
    extraction cost rides the scan; only (event_type, k) pairs shuffle.
    Returns (event_type, n_events, n_with_key, distinct_keys, min_key,
    max_key, sum_key).
    """
    k = F.get_json_object(F.col(json_col), f"$.{key}").cast("long")
    return (
        events.select("event_type", k.alias("_k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("_k").alias("n_with_key"),
            F.countDistinct("_k").alias("distinct_keys"),
            F.min("_k").alias("min_key"),
            F.max("_k").alias("max_key"),
            F.sum("_k").alias("sum_key"),
        )
        .orderBy("event_type")
    )


def retention_cohorts(
    events: DataFrame,
    cohort_event: str = "signup",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their first
    ``cohort_event``; for each cohort × week-offset, how many distinct users
    were active (any event) that week.

    Plan shape: one shuffle builds the per-user cohort (groupBy user, MIN
    over the filtered signup scan); the activity scan then equi-joins on
    user_id (cohort side is one row per user — at 100 TB this is the
    users-dimension join every event pipeline already does) and the final
    aggregate shuffles (cohort_week, week_offset) pairs. All week math is
    integer epoch division — timezone-free and engine-exact.
    """
    week_us = 7 * 86_400_000_000
    ev = ensure_event_time(events, ts_col)
    us = F.unix_micros(F.col(ts_col))
    cohorts = (
        ev.filter(F.col(type_col) == cohort_event)
        .groupBy(F.col(user_col).alias("_cu"))
        .agg(F.min(us).alias("_signup_us"))
        .select(
            "_cu",
            (F.expr(f"_signup_us div {week_us}")).alias("_cohort_week"),
        )
    )
    activity = ev.select(
        F.col(user_col).alias("_au"), F.expr(f"unix_micros({ts_col}) div {week_us}").alias("_week")
    )
    return (
        activity.join(cohorts, F.col("_au") == F.col("_cu"))
        .filter(F.col("_week") >= F.col("_cohort_week"))
        .groupBy(
            (F.col("_cohort_week") * F.lit(7 * 86_400)).alias("cohort_week_epoch"),
            (F.col("_week") - F.col("_cohort_week")).alias("week_offset"),
        )
        .agg(F.countDistinct("_au").alias("n_active_users"))
        .orderBy("cohort_week_epoch", "week_offset")
    )


def cold_customers(
    customer: DataFrame, orders: DataFrame, max_orders: int = 5
) -> DataFrame:
    """TPC-H Q22 shape: per nation, count and total balance of
    low-engagement, high-balance customers — account balance above the
    positive-balance average, with at most ``max_orders`` orders (zero
    included).

    The global threshold is a one-row aggregate cross-joined (broadcast)
    onto the customer scan; order counts aggregate BEFORE the join so only
    (custkey, count) pairs shuffle, never order rows. Exact decimal
    accumulation; ONE double division for the threshold so both engines
    compute the identical cutoff.
    """
    thresh = (
        customer.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(_amt(F.col("c_acctbal"))).cast("double")
                / F.count(F.lit(1))
            ).alias("_avg_bal")
        )
    )
    order_counts = orders.groupBy(F.col("o_custkey").alias("_ock")).agg(
        F.count(F.lit(1)).alias("_n_orders")
    )
    return (
        customer.crossJoin(F.broadcast(thresh))
        .filter(
            F.col("c_acctbal").cast("decimal(12,2)").cast("double")
            > F.col("_avg_bal")
        )
        .join(order_counts, F.col("c_custkey") == F.col("_ock"), "left")
        .filter(F.coalesce(F.col("_n_orders"), F.lit(0)) <= max_orders)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_amt(F.col("c_acctbal"))).cast("double").alias("total_acctbal"),
        )
        .orderBy("nationkey")
    )


def order_count_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by how many orders they
    have (zero included).

    Orders aggregate to (custkey, count) BEFORE joining — the join input
    shrinks from order rows to one row per ordering customer; the LEFT
    join keeps order-less customers at count 0. Two small shuffles (both
    key-sized), then a tiny distribution aggregate.
    Returns (n_orders, n_customers).
    """
    counts = orders.groupBy(F.col("o_custkey").alias("_ock")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    return (
        customer.join(counts, F.col("c_custkey") == F.col("_ock"), "left")
        .select(F.coalesce(F.col("_n"), F.lit(0)).alias("n_orders"))
        .groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("n_orders")
    )


def orders_month_growth(orders: DataFrame) -> DataFrame:
    """Month-over-month revenue growth: calendar-month totals plus the
    percentage change from the previous month (lag window over the
    aggregate).

    The lag window is unpartitioned BY DESIGN and that is safe at any
    scale: it runs over the already-aggregated month table, whose row
    count is bounded by the calendar (a century is 1200 rows), not by the
    data. The only data-sized operation is the one month-key shuffle.
    """
    monthly = orders_by_month(orders)
    w = Window.orderBy("month_epoch")
    prev = F.lag("sum_totalprice").over(w)
    return monthly.select(
        "month_epoch",
        "n_orders",
        "sum_totalprice",
        F.round(
            (F.col("sum_totalprice") - prev) / prev * 100.0, 6
        ).alias("mom_growth_pct"),
    ).orderBy("month_epoch")


def brand_size_pivot(part: DataFrame) -> DataFrame:
    """PIVOT surface: per brand, part counts cross-tabulated by size class.

    Spark's pivot relies on the pivot values being enumerated (three
    classes here), so the plan is a single groupBy with one conditional
    aggregate per value — map-side combinable, one shuffle on brand.
    Returns (p_brand, small, medium, large).
    """
    size_class = (
        F.when(F.col("p_size") >= 30, F.lit("large"))
        .when(F.col("p_size") >= 15, F.lit("medium"))
        .otherwise(F.lit("small"))
    )
    pivoted = (
        part.select("p_brand", size_class.alias("_sc"))
        .groupBy("p_brand")
        .pivot("_sc", ["small", "medium", "large"])
        .count()
    )
    return pivoted.select(
        "p_brand",
        *[
            F.coalesce(F.col(c), F.lit(0)).alias(c)
            for c in ("small", "medium", "large")
        ],
    ).orderBy("p_brand")


def events_hourly_salted(events: DataFrame, n_salts: int = 16) -> DataFrame:
    """Hourly aggregate computed through the explicit two-stage salting
    path (functions/skew.py): stage 1 aggregates (hour, type, salt) so a
    pathologically hot hour spreads over ``n_salts`` tasks; stage 2 folds
    the per-salt partials.

    The salt comes from rand() — placement-only nondeterminism: counts and
    exact-decimal sums are associative, so the published result is
    bit-identical to the unsalted aggregate (the oracle). This is the
    template for skewed aggregates that partial aggregation can't save
    (collect_list, exact distinct); for plain count/sum it costs one extra
    tiny shuffle over the salted partials.
    """
    from hive_io_experimental_spark.functions.skew import with_salt

    ev = ensure_event_time(events)
    hour_epoch = (F.expr("unix_micros(ts) div 3600000000") * F.lit(3600)).alias(
        "hour_epoch"
    )
    salted = with_salt(
        ev.select(hour_epoch, "event_type",
                  F.col("value").cast("decimal(12,4)").alias("_v")),
        n_salts,
    )
    partial = salted.groupBy("hour_epoch", "event_type", "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_v").alias("_s"),
    )
    return (
        partial.groupBy("hour_epoch", "event_type")
        .agg(
            F.sum("_n").alias("n_events"),
            F.sum("_s").cast("double").alias("sum_value"),
        )
        .orderBy("hour_epoch", "event_type")
    )


def active_user_trends(events: DataFrame) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day — the engagement
    trend every event pipeline publishes.

    Exact sliding-window distinct WITHOUT a window-distinct (not
    mergeable) and without day² self-joins: each DISTINCT (user, day)
    activity pair explodes into its 7 covering days (bounded ×7), and
    WAU(d) is then a plain distinct count — fully partial-aggregatable.
    All day math is integer epoch division. Returns
    (day_epoch, dau, wau, stickiness) for days with activity.
    """
    ev = ensure_event_time(events)
    ud = ev.select(
        "user_id", F.expr("unix_micros(ts) div 86400000000").alias("_day")
    ).distinct()
    dau = ud.groupBy("_day").agg(F.count(F.lit(1)).alias("dau"))
    cover = (
        ud.select(
            "user_id",
            F.explode(
                F.sequence(F.col("_day"), F.col("_day") + 6)
            ).alias("_day"),
        )
        .distinct()
        .groupBy("_day")
        .agg(F.count(F.lit(1)).alias("wau"))
    )
    return (
        dau.join(cover, "_day")
        .select(
            (F.col("_day") * 86_400).alias("day_epoch"),
            "dau",
            "wau",
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
        .orderBy("day_epoch")
    )


# ---------------------------------------------------------------------------
# TPC-H query-shape completions (adapted to the reduced testdata schema:
# no partsupp table, no commit/receipt dates, no shipmode — each shape keeps
# the canonical plan structure on the columns that exist).
# ---------------------------------------------------------------------------


def min_cost_supplier(
    part: DataFrame, supplier: DataFrame, nation: DataFrame,
    lineitem: DataFrame, k: int = 100,
) -> DataFrame:
    """TPC-H Q2 shape: for every part, the supplier(s) offering it at the
    minimum observed price (correlated-MIN subquery), with supplier detail.

    Without partsupp, the "offer" is MIN(l_extendedprice) per
    (part, supplier) from lineitem. Plan: ONE shuffle builds the offer table
    (map-side partial MIN), a window-MIN over l_partkey finds the per-part
    floor without a second self-join shuffle (offers are already hash-
    distributed by l_partkey — reused by the window), and all ties survive
    exactly as TPC-H Q2 keeps them. part/supplier/nation broadcast.
    """
    offers = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_amt(F.col("l_extendedprice"))).alias("_offer")
    )
    w = Window.partitionBy("l_partkey")
    best = offers.withColumn("_floor", F.min("_offer").over(w)).filter(
        F.col("_offer") == F.col("_floor")
    )
    return (
        best.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name", "n_name",
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            F.col("_offer").cast("double").alias("offer"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), F.col("n_name").asc(),
            F.col("s_name").asc(), F.col("p_partkey").asc(),
            F.col("s_suppkey").asc(),
        )
        .limit(k)
    )


def nation_trade_volume(
    supplier: DataFrame, nation: DataFrame, customer: DataFrame,
    orders: DataFrame, lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q7 shape: shipped revenue between every (supplier nation,
    customer nation) pair per ship year, cross-border only.

    The only large shuffle is lineitem⋈orders on orderkey; supplier and
    customer ride in as broadcasts each pre-joined to its nation name (two
    independent aliases of the nation dim). year() on a TIMESTAMP_NTZ column
    is timezone-free in both engines.
    """
    supp_n = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    cust_n = customer.join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey", F.col("n_name").alias("cust_nation"))
    revenue = _amt(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(4,2)") - _rate(F.col("l_discount"))
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust_n), F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def market_share(
    region: DataFrame, nation: DataFrame, customer: DataFrame,
    supplier: DataFrame, part: DataFrame, orders: DataFrame,
    lineitem: DataFrame, target_nation: str = "BRAZIL",
    target_region: str = "AMERICA", part_type: str = "ECONOMY",
) -> DataFrame:
    """TPC-H Q8 shape: ``target_nation``'s share of ``part_type`` revenue
    sold to customers in ``target_region``, per order year.

    Conditional aggregation over one lineitem⋈orders shuffle; the region
    restriction prunes via the broadcast customer-side dim, the part-type
    restriction via the broadcast part dim (both filters applied before the
    broadcast, so the hashed relation only carries qualifying keys).
    """
    cust_r = (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == target_region)
        .select("c_custkey")
    )
    supp_n = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    parts = part.filter(F.col("p_type") == part_type).select("p_partkey")
    revenue = _amt(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(4,2)") - _rate(F.col("l_discount"))
    )
    target = F.when(
        F.col("supp_nation") == target_nation, revenue
    ).otherwise(F.lit(0).cast("decimal(12,2)"))
    return (
        lineitem.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_r), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.round(
                F.sum(target).cast("double") / F.sum(revenue).cast("double"), 6
            ).alias("mkt_share"),
            F.sum(target).cast("double").alias("nation_revenue"),
            F.sum(revenue).cast("double").alias("total_revenue"),
        )
        .orderBy("o_year")
    )


def product_profit(
    nation: DataFrame, supplier: DataFrame, part: DataFrame,
    orders: DataFrame, lineitem: DataFrame, name_fragment: str = "gear",
) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier nation per order year over parts
    whose name contains ``name_fragment``.

    Without partsupp, cost is modeled as p_retailprice × quantity (exact
    decimal product — both engines compute the identical value, so the
    declared intermediate precisions don't matter). The substring filter on
    p_name cuts the broadcast part dim before the join.
    """
    profit = _amt(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(4,2)") - _rate(F.col("l_discount"))
    ) - _amt(F.col("p_retailprice")) * _amt(F.col("l_quantity"))
    supp_n = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    parts = part.filter(F.col("p_name").contains(name_fragment)).select(
        "p_partkey", "p_retailprice"
    )
    return (
        lineitem.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp_n), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(
            "nation", F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


def returned_item_revenue(
    nation: DataFrame, customer: DataFrame, orders: DataFrame,
    lineitem: DataFrame, k: int = 20,
) -> DataFrame:
    """TPC-H Q10 shape: top-k customers by revenue lost to returned items
    (l_returnflag = 'R'), with nation detail.

    The returnflag filter pushes to the lineitem scan; one shuffle joins
    the survivors to orders; customer/nation broadcast. Deterministic ties
    via c_custkey.
    """
    revenue = _amt(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(4,2)") - _rate(F.col("l_discount"))
    )
    return (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "c_custkey", "c_name",
            F.col("c_acctbal").cast("double").alias("c_acctbal"), "n_name",
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(k)
    )


def important_parts(lineitem: DataFrame, fraction: float = 0.0006) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value exceeds ``fraction`` of the
    total traded value (HAVING against a scalar subquery).

    The global total is a one-row aggregate broadcast into the per-part
    HAVING filter — at 100 TB both aggregates are single-shuffle with
    map-side partials, and the scalar side is one row regardless of scale.
    Both engines derive threshold and per-part value from the SAME exact
    decimal sums (cast to double only at the comparison), so the predicate
    is engine-stable.
    """
    value = _amt(F.col("l_extendedprice"))
    per_part = lineitem.groupBy("l_partkey").agg(
        F.sum(value).cast("double").alias("part_value")
    )
    total = lineitem.agg(
        (F.sum(value).cast("double") * F.lit(fraction)).alias("_threshold")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("_threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), F.col("l_partkey").asc())
    )


def ship_latency_priority(
    orders: DataFrame, lineitem: DataFrame,
    fast_days: int = 30, slow_days: int = 60,
) -> DataFrame:
    """TPC-H Q12 shape: high- vs low-priority order line counts per
    ship-latency class (no shipmode column — latency buckets stand in).

    INTERVAL arithmetic on TIMESTAMP_NTZ keeps the bucket boundaries
    timezone-free (same convention as late_ship_priority). One shuffle
    (orders⋈lineitem on orderkey), then conditional counts.
    """
    bucket = (
        F.when(
            F.expr(f"l_shipdate < o_orderdate + INTERVAL {fast_days} DAYS"),
            F.lit("fast"),
        )
        .when(
            F.expr(f"l_shipdate < o_orderdate + INTERVAL {slow_days} DAYS"),
            F.lit("medium"),
        )
        .otherwise(F.lit("slow"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(bucket.alias("latency_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("latency_class")
    )


def top_supplier(supplier: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum shipped revenue
    (scalar-MAX subquery over a revenue view).

    Per-supplier revenue is one shuffle; the MAX is a one-row broadcast.
    Both sides of the equality are the same exact-decimal-then-double
    pipeline, so the float comparison is engine-stable. All tied suppliers
    are kept (TPC-H semantics).
    """
    revenue = _amt(F.col("l_extendedprice")) * (
        F.lit(1).cast("decimal(4,2)") - _rate(F.col("l_discount"))
    )
    per_supp = lineitem.groupBy("l_suppkey").agg(
        F.sum(revenue).cast("double").alias("total_revenue")
    )
    best = per_supp.agg(F.max("total_revenue").alias("_best"))
    return (
        per_supp.join(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("_best"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def supplier_part_counts(
    part: DataFrame, lineitem: DataFrame,
    excluded_brands: tuple[str, ...] = ("Brand#1", "Brand#2", "Brand#3"),
    excluded_type_prefix: str = "PROMO",
) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per (brand, type, size)
    excluding some brands and a type prefix (NOT IN + NOT LIKE).

    Without partsupp, the part→supplier relation is observed from lineitem.
    The exclusion filters cut the broadcast part dim before the join;
    COUNT(DISTINCT) shuffles once on the (brand, type, size) grouping key
    with a distinct-aggregate expansion.
    """
    parts = part.filter(
        ~F.col("p_brand").isin(*excluded_brands)
        & ~F.col("p_type").startswith(excluded_type_prefix)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        lineitem.join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), F.col("p_brand").asc(),
            F.col("p_type").asc(), F.col("p_size").asc(),
        )
    )


def waiting_orders(
    supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
    late_days: int = 60, k: int = 20,
) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY late supplier on a
    multi-supplier order (EXISTS + NOT EXISTS correlated pair).

    "Late" is l_shipdate > o_orderdate + ``late_days`` (no receipt/commit
    dates in the reduced schema). Plan: lineitem⋈orders once to derive
    lateness; the EXISTS becomes a left-semi and the NOT EXISTS a left-anti
    self-join, both hash-partitioned on orderkey — Spark reuses the
    exchange across the three orderkey-keyed joins instead of reshuffling.
    Deterministic: ties broken by s_name.
    """
    lo = (
        lineitem.join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .withColumn(
            "_late",
            F.expr(f"l_shipdate > o_orderdate + INTERVAL {late_days} DAYS"),
        )
        .select("l_orderkey", "l_suppkey", "_late")
    )
    l1 = lo.filter(F.col("_late")).select("l_orderkey", "l_suppkey")
    others = lo.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
        F.col("_late").alias("o2_late"),
    )
    with_other = l1.join(
        others,
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_semi",
    )
    sole_late = with_other.join(
        others.filter(F.col("o2_late")),
        (F.col("l_orderkey") == F.col("o2_orderkey"))
        & (F.col("l_suppkey") != F.col("o2_suppkey")),
        "left_anti",
    )
    return (
        sole_late.join(
            F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(k)
    )


def order_price_bands(orders: DataFrame, n_bands: int = 4) -> DataFrame:
    """Ranking-window breadth: ntile quartiles + percent_rank + cume_dist of
    order value WITHIN each priority class, summarized per band.

    Windows partition by o_orderpriority (never a global ORDER BY — a
    single-partition window is the classic scale trap), so each class
    ranks independently after one shuffle. Band summaries use min/max of
    the rank metrics — order-insensitive aggregates of values both engines
    derive from identical integer rank arithmetic.
    """
    price = F.col("o_totalprice").cast("decimal(12,2)").cast("double")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("_price").desc(), F.col("o_orderkey").asc()
    )
    banded = orders.select(
        "o_orderpriority", "o_orderkey", price.alias("_price")
    ).select(
        "o_orderpriority",
        "_price",
        F.ntile(n_bands).over(w).cast("long").alias("band"),
        F.percent_rank().over(w).alias("_pr"),
        F.cume_dist().over(w).alias("_cd"),
    )
    return (
        banded.groupBy("o_orderpriority", "band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("_price").alias("min_price"),
            F.max("_price").alias("max_price"),
            F.round(F.min("_pr"), 6).alias("first_pct_rank"),
            F.round(F.max("_cd"), 6).alias("last_cume_dist"),
        )
        .orderBy("o_orderpriority", "band")
    )


def run_sql(spark, sf_dir: str, query: str,
            tables: tuple[str, ...] = ("region", "nation", "customer",
                                       "supplier", "part", "orders",
                                       "lineitem")) -> DataFrame:
    """SQL entry point: register the warehouse tables as temp views and run
    an arbitrary SQL query through Spark SQL (the engine's `df.sql` surface).
    """
    for t in tables:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    return spark.sql(query)


def table_stats(df: DataFrame) -> DataFrame:
    """HiveStats-shaped row-count stats (numRows; sizes come from the
    catalog, common/HiveStats.java:34-108) as a degenerate aggregate."""
    return df.agg(F.count(F.lit(1)).alias("num_rows"))


def order_cube_summary(orders: DataFrame) -> DataFrame:
    """Full CUBE over (status, priority): every subtotal combination in
    one pass — the third member of the multi-aggregate trio (ROLLUP in
    revenue_rollup, GROUPING SETS in events_time_rollup, CUBE here). One
    Expand + one shuffle regardless of the 4 grouping combinations;
    grouping_id tags which dimensions each row aggregates away. Money is
    exact decimal summed then presented as double (engine convention)."""
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_totalprice"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .select(
            "o_orderstatus", "o_orderpriority", "gid", "n_orders",
            "sum_totalprice",
        )
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    )


def segment_user_overlap(events: DataFrame) -> DataFrame:
    """Audience overlap between every pair of event-type segments.

    For each unordered pair of event types: exact distinct-user counts of
    each segment, the intersection, and the Jaccard overlap — the
    audience-analysis primitive behind "how much do these cohorts
    overlap". Plan shape: ONE distinct (type, user) pass (shuffle on
    user), a self-equi-join on user_id (co-partitioned by the distinct's
    hash partitioning — no extra exchange on the probe side), then a
    groupBy on the type pair whose cardinality is types^2 — state-sized.
    At 100 TB the exact path is fine whenever (type, user) distinct fits
    a shuffle; the sketch path for when it doesn't is the HLL tier
    (union-mergeable; intersections via inclusion-exclusion)."""
    # no reuse()/persist needed here, unlike the dedup family: ALL THREE
    # consumers (both self-join sides AND the sizes aggregation) read the
    # distinct's exchange through identical subplans, so ReuseExchange
    # serves every branch from one shuffle output — confirmed by this
    # gate's absence from the r6 persist-removal regression list.
    tu = events.select("event_type", "user_id").distinct()
    sizes = tu.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    a = tu.alias("a")
    b = tu.alias("b")
    both = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("users_both"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        both.join(sa, F.col("type_a") == F.col("sa.event_type"))
        .join(sb, F.col("type_b") == F.col("sb.event_type"))
        .select(
            "type_a",
            "type_b",
            F.col("sa.n_users").alias("users_a"),
            F.col("sb.n_users").alias("users_b"),
            "users_both",
            F.round(
                F.col("users_both")
                / (
                    F.col("sa.n_users")
                    + F.col("sb.n_users")
                    - F.col("users_both")
                ),
                6,
            ).alias("jaccard"),
        )
        .orderBy("type_a", "type_b")
    )


def pricing_summary_unpivot(lineitem: DataFrame) -> DataFrame:
    """Wide -> long reshape of the Q1 aggregate (the unpivot/melt surface,
    the inverse of brand_size_pivot's pivot). The four exact-decimal sum
    measures melt into (flag, status, metric, value) rows; unpivot is a
    zero-shuffle projection+Expand over the already-aggregated rows, so
    the reshape itself adds no exchange however large the input was."""
    wide = pricing_summary(lineitem)
    return (
        wide.unpivot(
            ["l_returnflag", "l_linestatus"],
            ["sum_qty", "sum_base_price", "sum_disc_price", "sum_charge"],
            "metric",
            "value",
        )
        .orderBy("l_returnflag", "l_linestatus", "metric")
    )


def events_hopping(
    events: DataFrame,
    window_minutes: int = 60,
    slide_minutes: int = 15,
) -> DataFrame:
    """Hopping (sliding) window counts: ``window_minutes`` windows
    advancing every ``slide_minutes`` — each event lands in
    window/slide overlapping windows.

    Uses Spark's native windowing (F.window with a slide), which expands
    events to their covering windows map-side and partial-aggregates
    before the single shuffle — the plan a hand-rolled offset explode
    would build, with Catalyst owning the expansion. Window starts are
    epoch-aligned; because every real-world timezone offset is a
    multiple of 15 minutes, the emitted epoch starts are identical under
    any session timezone (same tz-independence contract as month_epoch).
    Returns (window_start, event_type, n_events, sum_value_e4) ordered —
    value sums in exact e4 fixed-point like the rollup family.
    """
    ev = ensure_event_time(events)
    win = F.window("ts", f"{window_minutes} minutes", f"{slide_minutes} minutes")
    v_e4 = (F.col("value").cast("decimal(14,4)") * 10_000).cast("long")
    return (
        ev.groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(v_e4).cast("long").alias("sum_value_e4"),
        )
        .select(
            (F.unix_micros(F.col("w.start")) / 1_000_000)
            .cast("long")
            .alias("window_start"),
            "event_type",
            "n_events",
            "sum_value_e4",
        )
        .orderBy("window_start", "event_type")
    )


def latest_by_key(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Keep each key's latest row — the CDC/log-compaction read: given an
    append-only change log, the current state is the newest row per key.

    ``order_cols`` must be a deterministic total order within a key
    (e.g. [ts, event_id]) or the kept row is engine-dependent; ties on
    the full order tuple would be nondeterministic, which is why the
    caller passes a tiebreaker column. One shuffle on the key for the
    rank window; at warehouse scale this is the dedup step a MERGE-based
    ingest runs before applying a batch (merge.scd1_merge composes it).
    Returns the input columns of the surviving rows.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def funnel_time_boxed(
    events: DataFrame,
    steps: tuple[str, ...] = ("signup", "click", "purchase"),
    window_hours: int = 24,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Sequential time-boxed funnel: step k must occur within
    ``window_hours`` AFTER the user's matched step k-1 time.

    Unlike funnel_counts (first-touch: global per-step mins compared),
    this is true sequential matching — t_k is the user's EARLIEST step-k
    event strictly after t_{k-1} and within the window, so a click that
    precedes the signup can't satisfy step 2 and a conversion window is
    enforced between consecutive steps (the semantics product analytics
    tools call a conversion window).

    Plan shape: one aggregate for t_0, then per subsequent step one
    co-partitioned join (user key) + windowed min — (steps-1) joins, all
    hash-partitioned on the same user key so exchange reuse keeps the
    re-shuffles cheap; no window functions, no per-user state, no driver
    actions (the per-step counts union into ONE lazy plan). Returns
    (step_index, step, n_users) with BIGINT counts, ordered.
    """
    ev = ensure_event_time(events, ts_col)
    us = F.unix_micros(F.col(ts_col))
    w_us = window_hours * 3600 * 1_000_000
    matched = (
        ev.filter(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("u"))
        .agg(F.min(us).alias("t"))
    )
    stages = [matched]
    for step in steps[1:]:
        matched = (
            ev.filter(F.col(type_col) == step)
            .select(F.col(user_col).alias("u"), us.alias("e"))
            .join(matched, "u")
            .filter(
                (F.col("e") > F.col("t")) & (F.col("e") <= F.col("t") + w_us)
            )
            .groupBy("u")
            .agg(F.min("e").alias("t"))
        )
        stages.append(matched)
    counts = [
        s.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(i + 1).alias("step_index"),
            F.lit(steps[i]).alias("step"),
            "n_users",
        )
        for i, s in enumerate(stages)
    ]
    from functools import reduce as _reduce

    return _reduce(DataFrame.unionByName, counts).orderBy("step_index")
