"""Relational analytics over the star schema — the query shapes a
TSBS/TPC-style workload adds around the signal store: multi-way joins
with broadcast dimensions, grouped pricing summaries, and the
majority-value/outlier profile (database/src/outlier/mod.rs:90-216).

Scale design: broadcast hints appear ONLY on fixed-cardinality
relations (nation/region, 1-row maxima, the part-type alphabet).
SF-proportional tables (lineitem/orders/customer/part/supplier) never
carry a hint — a hint is honored regardless of size, so a pinned
broadcast that is optimal at sf0.1 OOMs executors at 100 TB. AQE
promotes those joins to broadcast from runtime stats while the build
side fits and keeps shuffle joins beyond. The pricing summary is the
classic partial-agg showcase: 4 output groups regardless of input
size, so the shuffle carries one row per partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from timeseriesdb_spark.operators.common import dsum, dsum_sql, isum, isum_sql
from timeseriesdb_spark.tables import load_table


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary over lineitem (the largest
    fact): grouped sums/avgs/counts. Decimal-routed sums keep the
    result bit-stable at any parallelism."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            isum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by customer nation: lineitem ⋈ orders ⋈ customer ⋈
    nation. Only nation (fixed 25 rows) carries a broadcast hint;
    orders/customer are SF-proportional, so AQE picks broadcast at
    small SF from stats and falls back to shuffle joins at 100 TB —
    a pinned hint would OOM the executors there."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(dsum(rev, "revenue"), F.count("*").alias("n_items"))
    )


def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority counts for orders with at least one lineitem —
    an EXISTS/semi-join shape (TPC-H Q4 skeleton)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey").distinct()
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


def q_outlier_majority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-value / outlier profile (outlier/mod.rs:90-216): value
    histogram over a low-cardinality column with the majority share —
    the workload the reference's sparse codec optimizes; Parquet
    dictionary pages own it here."""
    li = load_table(spark, sf_dir, "lineitem")
    counts = li.groupBy(F.col("l_quantity").alias("qty")).agg(
        F.count("*").alias("cnt")
    )
    # total in-plan as a 1-row broadcast (r15, the q_bm25 treatment —
    # the count() job serialized before the main job; cast == float())
    totals = li.agg(F.count("*").alias("_total"))
    return counts.crossJoin(F.broadcast(totals)).select(
        "qty",
        "cnt",
        F.round(
            F.col("cnt") / F.col("_total").cast("double"), 6
        ).alias("share"),
    )


def _base_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Finest-grain partials for the grouping-set queries: aggregate to
    the (returnflag, linestatus) groups ONCE, then expand grouping sets
    over the handful of partial rows. Spark's Expand node otherwise
    replicates every INPUT row per grouping set before aggregation —
    at 100 TB that is N× the scan shuffled instead of |groups| rows
    (measured 1.9 s → 0.3 s at sf0.1 for the cube). Decimal partial
    sums keep the two-level total bit-exact (associative)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(rev.cast("decimal(38,6)")).alias("_psum"),
        F.count("*").alias("_pcnt"),
    )


def _grouping_set_agg(base: DataFrame, expand) -> DataFrame:
    return expand(base).agg(
        F.sum("_psum").cast("double").alias("revenue"),
        F.sum("_pcnt").alias("n_rows"),
        F.grouping_id().alias("gid"),
    )


def q_grouping_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (SURVEY §2.4: grouping sets are free in
    Spark — this declares it): lineitem revenue by
    (returnflag, linestatus) with subtotals and grand total.
    grouping_id disambiguates NULL-as-subtotal from NULL data.
    Two-level shape: see _base_groups."""
    return _grouping_set_agg(
        _base_groups(spark, sf_dir),
        lambda b: b.rollup("l_returnflag", "l_linestatus"),
    )


def q_grouping_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation — completes the grouping-sets family next to
    ROLLUP/PIVOT: all four (returnflag, linestatus) grouping sets from
    the same pre-aggregated partials (_base_groups)."""
    return _grouping_set_agg(
        _base_groups(spark, sf_dir),
        lambda b: b.cube("l_returnflag", "l_linestatus"),
    )


EXCEPT_NOISY_ERRORS = 10  # heavy-error threshold for the EXCEPT arm


def q_except_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops (§2.6): signals with 'purchase' events EXCEPT
    heavy-error signals (≥ EXCEPT_NOISY_ERRORS error events) — the
    HashSet union/difference surface (cr_predictor.rs:46) as engine
    set operators. r13: the old plain purchase-EXCEPT-error form was
    VACUOUSLY empty on the testdata (every purchaser also errors at
    least once at every SF), so its green hash verified nothing; the
    threshold keeps the identical EXCEPT plan shape while the result
    is non-empty at sf0.001/0.01/0.1 (2/22/229 rows)."""
    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id")
    err = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= EXCEPT_NOISY_ERRORS)
        .select("user_id")
    )
    return purch.distinct().subtract(err.distinct())


def q_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth: monthly decimal-exact revenue
    with the previous month's value, absolute delta and percent
    change — the reporting window every finance dashboard runs. The
    lag window is over the MONTHS frame (aggregate-sized), never
    rows; pct divides two exact decimal-summed doubles."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    monthly = li.groupBy(
        F.date_trunc("month", F.col("l_shipdate")).alias("month")
    ).agg(dsum(rev, "revenue"), F.count("*").alias("n_items"))
    w = Window.orderBy("month")
    prev = F.lag("revenue").over(w)
    return monthly.select(
        "month",
        "revenue",
        "n_items",
        prev.alias("prev_revenue"),
        F.round(F.col("revenue") - prev, 6).alias("mom_delta"),
        F.round((F.col("revenue") - prev) / prev * 100.0, 6).alias(
            "mom_pct"
        ),
    )


def q_intersect_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops (§2.6), INTERSECT member: signals with BOTH purchase
    and error events — completes the EXCEPT/INTERSECT pair next to
    q_except_signals (HashSet intersection, cr_predictor.rs:46)."""
    ev = load_table(spark, sf_dir, "events")
    purch = ev.filter(F.col("event_type") == "purchase").select("user_id")
    err = ev.filter(F.col("event_type") == "error").select("user_id")
    return purch.intersect(err)


def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue from a filtered scan — every predicate
    (date range, discount band, quantity cap) reaches PushedFilters,
    so at 100 TB this reads a fraction of one column's pages."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_quantity") < 24)
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))
    )


PROMO_TYPE = "ECONOMY"  # the Q14 "PROMO%" class in this catalog


def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: per ship-month, the share of revenue from one
    part class — a conditional aggregate over the lineitem ⋈ part
    broadcast join. Numerator and denominator are decimal sums
    (order-exact); the share is one double division of two exact
    quantities, so the percentage is engine-identical. At 100 TB:
    part is SF-proportional — no pinned broadcast hint; AQE picks
    broadcast while part fits and shuffle beyond, lineitem streams
    once, the month agg partial-aggregates map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo_rev = F.when(F.col("p_type") == PROMO_TYPE, rev).otherwise(
        F.lit(0.0)
    )
    month = F.date_trunc("month", F.col("l_shipdate"))
    return (
        li.join(
            part.select("p_partkey", "p_type"),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy(month.alias("ship_month"))
        .agg(
            dsum(promo_rev, "promo_revenue"),
            dsum(rev, "total_revenue"),
        )
        .select(
            "ship_month",
            "promo_revenue",
            "total_revenue",
            F.round(
                F.lit(100.0) * F.col("promo_revenue")
                / F.col("total_revenue"),
                6,
            ).alias("promo_share_pct"),
        )
    )


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 orders by revenue for one market
    segment — customer semi path + grouped agg + bounded top-k
    (TakeOrderedAndProject, never a full sort). customer and the
    surviving orders are SF-proportional: no pinned broadcast hints,
    AQE converts either join to broadcast only while the build side
    fits."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    sel_orders = orders.join(
        cust.select("c_custkey"),
        orders.o_custkey == F.col("c_custkey"),
        "semi",
    )
    return (
        li.join(sel_orders, li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(rev, "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-signal event counts spread into one column per event
    type — pivot compiles to conditional aggregation (shown literally
    in the oracle), one shuffle, fixed output width."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returned
    items (l_returnflag = 'R') with their nation. The returnflag
    filter is pushed to the lineitem scan; only nation (25 rows) is
    hint-broadcast — orders/customer are SF-proportional, AQE decides;
    bounded top-k via TakeOrderedAndProject. Decimal revenue makes
    the rank (and thus the top-20 set) deterministic."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            cust.select("c_custkey", "c_name", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(rev, "lost_revenue"), F.count("*").alias("n_items"))
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


TOP_SUPP_START, TOP_SUPP_END = "1996-01-01", "1996-04-01"


def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue over one
    quarter. The per-supplier aggregate is supplier-cardinality-sized,
    so the max is taken over a tiny relation and equality-joined back
    (broadcast) — never a global window over the fact table. Exact
    decimal revenue means 'equals the max' is well-defined."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    by_supp = (
        li.filter(
            (F.col("l_shipdate") >= F.lit(TOP_SUPP_START))
            & (F.col("l_shipdate") < F.lit(TOP_SUPP_END))
        )
        .groupBy("l_suppkey")
        .agg(dsum(rev, "total_revenue"))
    )
    top = by_supp.agg(F.max("total_revenue").alias("max_rev"))
    return (
        by_supp.join(
            F.broadcast(top),
            by_supp.total_revenue == F.col("max_rev"),
        )
        .join(
            supp.select("s_suppkey", "s_name"),
            by_supp.l_suppkey == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", "total_revenue")
    )


LARGE_ORDER_QTY = 300  # sum(l_quantity) threshold (Q18's "large")


def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a
    threshold, with the buying customer. The HAVING runs on the
    order-grain partial aggregate (map-side combinable); only the
    few qualifying orderkeys join back to orders/customer. No pinned
    hints — orders/customer are SF-proportional and `big` is the
    genuinely small side, which AQE broadcasts from runtime stats.
    Integer quantity sums are exact."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(isum("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > LARGE_ORDER_QTY)
    )
    return (
        big.join(
            orders.select(
                "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
            ),
            big.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            cust.select("c_custkey", "c_name"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "sum_qty",
        )
    )


EXCL_BRAND = "Brand#1"  # Q16's excluded brand in this catalog


def q_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers able to ship each
    (brand, type, size) part class, excluding one brand — here the
    part⇄supplier relation comes from observed lineitems (no partsupp
    table in this catalog). count_distinct shuffles (brand,type,size,
    suppkey) pairs — already deduplicated map-side — never raw rows."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") != EXCL_BRAND
    )
    return (
        li.join(
            part.select("p_partkey", "p_brand", "p_type", "p_size"),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


SHARE_NATION = "NATION_3"  # the "market share of ..." subject nation


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: per order-year, the share of total revenue
    shipped by suppliers of one nation — a conditional aggregate over
    lineitem ⋈ orders ⋈ supplier ⋈ nation. Both sums are decimal, so
    the share divides two exact quantities (engine-identical). At
    100 TB orders and supplier are the shuffle joins — both are
    SF-proportional, so neither carries a broadcast hint (AQE
    broadcasts them only while they fit); nation stays hinted."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    s_nat = supp.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        supp.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    nat_rev = F.when(F.col("n_name") == SHARE_NATION, rev).otherwise(
        F.lit(0.0)
    )
    return (
        li.join(
            orders.select("o_orderkey", "o_orderdate"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(s_nat, li.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(dsum(nat_rev, "nation_revenue"), dsum(rev, "total_revenue"))
        .select(
            "o_year",
            "nation_revenue",
            "total_revenue",
            F.round(
                F.col("nation_revenue") / F.col("total_revenue"), 6
            ).alias("mkt_share"),
        )
    )


def q_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity between part types: support and lift for
    every unordered type pair co-occurring in an order — the
    recommendation/cross-sell primitive.

    One pass builds each order's distinct type SET (collect_set rides
    the single l_orderkey shuffle — dedup and grouping in one
    exchange); unordered pairs then EXPAND from the sorted array
    (≤|types|²/2 per order, bounded by the tiny type alphabet, never
    by basket size) with no self-join and no re-scan — the naive
    distinct + self-join form planned 9 exchanges and read lineitem
    four times. The basket frame is lazily checkpointed so its three
    consumers (order count, per-type totals, pair counts) share one
    computation. Lift divides exact integer counts; per-type totals
    broadcast (|types| rows)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    baskets = (
        li.join(
            part.select("p_partkey", "p_type"),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("l_orderkey")
        .agg(F.array_sort(F.collect_set("p_type")).alias("types_s"))
        .localCheckpoint(eager=False)
    )
    n_orders = baskets.count()  # scalar literal
    singles = (
        baskets.select(F.explode("types_s").alias("p_type"))
        .groupBy("p_type")
        .agg(F.count("*").alias("n_t"))
    )
    pair_structs = F.flatten(
        F.expr(
            "transform(types_s, (x, i) -> "
            "transform(slice(types_s, i + 2, size(types_s) - i - 1), "
            "y -> struct(x AS type_a, y AS type_b)))"
        )
    )
    pairs = (
        baskets.select(F.explode(pair_structs).alias("p"))
        .select("p.type_a", "p.type_b")
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_ab"))
    )
    nd = float(n_orders)
    return (
        pairs.join(
            F.broadcast(singles.withColumnRenamed("p_type", "type_a")
                        .withColumnRenamed("n_t", "n_a")),
            "type_a",
        )
        .join(
            F.broadcast(singles.withColumnRenamed("p_type", "type_b")
                        .withColumnRenamed("n_t", "n_b")),
            "type_b",
        )
        .select(
            "type_a",
            "type_b",
            "n_ab",
            F.round(F.col("n_ab").cast("double") / F.lit(nd), 6).alias(
                "support"
            ),
            F.round(
                (F.col("n_ab").cast("double") * F.lit(nd))
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
                6,
            ).alias("lift"),
        )
    )


def q_order_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment-latency profile: days from order date to first and
    last shipment per order, aggregated into an exact day histogram of
    full-fulfillment lead time — the supply-chain SLA view. Calendar
    differences are integer days (exact); the histogram output is
    leadtime-support-sized."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    per_order = (
        li.groupBy("l_orderkey")
        .agg(
            F.min("l_shipdate").alias("first_ship"),
            F.max("l_shipdate").alias("last_ship"),
        )
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
    )
    lead = F.datediff(F.col("last_ship"), F.col("o_orderdate"))
    return (
        per_order.groupBy(lead.alias("lead_days"))
        .agg(
            F.count("*").alias("n_orders"),
            F.min(
                F.datediff(F.col("first_ship"), F.col("o_orderdate"))
            ).alias("min_first_ship_days"),
        )
    )


DISJ_BRANDS = ("Brand#2", "Brand#4")  # the Q19 OR-branch brands


def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue matching an OR of AND-predicate
    branches over lineitem ⋈ part — the disjunctive-pushdown stress
    case (each branch mixes fact columns with dimension columns).
    Catalyst extracts the common `l_quantity < 30` conjunct to the
    scan; the per-branch residuals evaluate post-join. One join (AQE
    broadcasts part only while it fits — part is SF-proportional),
    one agg shuffle; decimal revenue per branch tag so the split is
    exact."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    b1, b2 = DISJ_BRANDS
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    branch1 = (
        (F.col("p_brand") == b1)
        & (F.col("p_size") <= 10)
        & (F.col("l_quantity") < 15)
    )
    branch2 = (
        (F.col("p_brand") == b2)
        & (F.col("p_size") <= 25)
        & (F.col("l_quantity") >= 15)
        & (F.col("l_quantity") < 30)
    )
    return (
        li.join(
            part.select("p_partkey", "p_brand", "p_size"),
            li.l_partkey == F.col("p_partkey"),
        )
        .where(branch1 | branch2)
        .groupBy(
            F.when(branch1, F.lit("small_lot")).otherwise("mid_lot").alias(
                "branch"
            )
        )
        .agg(dsum(rev, "revenue"), F.count("*").alias("n_items"))
    )


# ---- remaining TPC-H shapes (round 6) ------------------------------
# The testdata schema drops partsupp, l_commitdate/receiptdate,
# c_phone and l_shipmode, so the shapes keep each query's PLAN
# structure (the thing that matters at 100 TB) and adapt the absent
# columns: distinct (l_partkey, l_suppkey) stands in for partsupp,
# l_shipdate vs o_orderdate lag for the commit/receipt lateness, and
# nation for the phone country code.

VOL_NATIONS = ("NATION_1", "NATION_2")  # Q7 trading pair
PROFIT_UNIT_COST = 0.5                  # Q9: unit cost = half retail
LAG_START, LAG_END = "1996-01-01", "1998-01-01"  # Q12 window
SMALLQTY_BRAND = "Brand#3"              # Q17 brand filter
WAIT_LATE_DAYS = 60                     # Q21 lateness bound
MINCOST_SIZE, MINCOST_REGION = 15, "EUROPE"      # Q2 filters
IMPORTANT_NATION, IMPORTANT_SHARE = "NATION_3", 500  # Q11: >1/500 of value
PROMO_PREFIX = "red"                    # Q20 part-name prefix
PROMO_YEAR_START, PROMO_YEAR_END = "1997-01-01", "1998-01-01"
IDLE_CUTOFF = "2000-01-01"              # Q22: no orders since


def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: shipped revenue between a pair of nations by
    ship-year — lineitem ⋈ orders ⋈ customer ⋈ nation(cust) plus
    supplier ⋈ nation(supp), keeping only the two (supp, cust) nation
    orientations of the pair.

    Scale: both nation joins carry hints (fixed 25 rows, aliased
    copies); supplier/orders/customer are SF-proportional — AQE
    decides those. The nation filters cut the fact EARLY: pushing the
    two-nation IN-list through the supplier/customer joins means only
    ~2/25 of lineitem survives to the final agg shuffle (8 groups)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    ).where(F.col("supp_nation").isin(*VOL_NATIONS))
    n2 = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    ).where(F.col("cust_nation").isin(*VOL_NATIONS))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(dsum(rev, "revenue"), F.count("*").alias("n_items"))
    )


def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order-year over
    parts matching a name pattern. partsupp is absent, so unit cost is
    PROFIT_UNIT_COST·p_retailprice — the amount expression keeps Q9's
    two-term form (revenue minus quantity·cost) and its per-row
    determinism (identical double ops in both engines, decimal-summed).

    Scale: the p_name LIKE filter prunes part BEFORE the fact join
    (predicate pushdown into the part scan); nation broadcasts by
    hint; part/supplier/orders stay AQE-decided."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(
        PROFIT_UNIT_COST
    ) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(
            part.where(F.col("p_name").like("%gear%")).select(
                "p_partkey", "p_retailprice"
            ),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(amount, "sum_profit"), F.count("*").alias("n_items"))
    )


def q_shipping_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per ship-lag bucket (days from order to ship,
    30-day buckets — the stand-in for the absent l_shipmode), how many
    line items belong to high- vs low-priority orders, over one
    two-year ship window. Keeps Q12's signature conditional-count agg
    (SUM(CASE priority IN urgent/high)). One fact join, date filter
    pushed to the lineitem scan, integer day arithmetic (exact in both
    engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    lag_days = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    return (
        li.where(
            (F.col("l_shipdate") >= LAG_START) & (F.col("l_shipdate") < LAG_END)
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.floor(lag_days / 30).alias("lag_bucket"))
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
    )


def q_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: yearly-averaged revenue from small-lot orders
    — line items of one brand whose quantity is below 20% of that
    part's average quantity. The per-part average is a grouped agg
    re-joined on l_partkey (Q17's correlated subquery, decorrelated),
    computed as exact-bigint sum / count so the 0.2·avg threshold is
    the same double in both engines (no order-dependent float sum
    deciding a boundary row).

    Scale: the avg-qty agg runs over the full lineitem but emits one
    row per part; the brand filter prunes the probe side before the
    join. Both shuffles key on l_partkey, so AQE can reuse the
    exchange; no window over the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pa = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (
            F.sum(F.col("l_quantity").cast("bigint")).cast("double")
            / F.count("*")
        ).alias("aq")
    )
    return (
        li.join(
            part.where(F.col("p_brand") == SMALLQTY_BRAND).select("p_partkey"),
            li.l_partkey == F.col("p_partkey"),
        )
        .join(pa, li.l_partkey == F.col("a_partkey"))
        .where(F.col("l_quantity") < F.lit(0.2) * F.col("aq"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(38,6)"))
                .cast("double")
                / F.lit(7.0),
                6,
            ).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


def q_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who single-handedly held up a
    multi-supplier finalized order — their line shipped late
    (l_shipdate > o_orderdate + WAIT_LATE_DAYS, the stand-in for the
    absent receipt/commit dates), some OTHER supplier contributed to
    the order (EXISTS → semi-join), and NO other supplier was also
    late (NOT EXISTS → anti-join). Top 20 by wait count.

    Scale: all three legs key the join on l_orderkey — the fact
    shuffles once per leg on the same key (AQE reuses the exchange
    layout); the anti/semi sides are the already-filtered late/all
    projections, never a crossJoin. The s_name ranking is a 100-row
    TakeOrdered, not a sort of the fact."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    late = (
        li.join(
            orders.where(F.col("o_orderstatus") == "F").select(
                "o_orderkey", "o_orderdate"
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .where(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {WAIT_LATE_DAYS} DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"),
        F.col("l_suppkey").alias("o2_suppkey"),
    )
    late2 = late.select(
        F.col("l_orderkey").alias("l2_orderkey"),
        F.col("l_suppkey").alias("l2_suppkey"),
    )
    waiting = (
        late.join(
            others,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "semi",
        )
        .join(
            late2,
            (F.col("l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l_suppkey") != F.col("l2_suppkey")),
            "anti",
        )
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
    )
    return (
        waiting.join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each part of one size in one region, the
    supplier(s) with the minimum cost — partsupp is absent, so the
    observed (l_partkey, l_suppkey) pairs stand in for it and
    s_acctbal for the supply cost. The correlated min decorrelates
    into a per-part window min over the joined frame (no second scan);
    top 100 by (s_acctbal desc, n_name, s_name, p_partkey) is a
    TakeOrdered.

    Scale: nation/region broadcast by hint (fixed); the
    distinct pair-set and supplier/part joins stay AQE-decided. The
    window partitions on p_partkey — bounded fan-in per part."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    joined = (
        pairs.join(
            part.where(F.col("p_size") == MINCOST_SIZE).select("p_partkey"),
            pairs.l_partkey == F.col("p_partkey"),
        )
        .join(supp, pairs.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.where(F.col("r_name") == MINCOST_REGION)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
    )
    w = Window.partitionBy("p_partkey")
    return (
        joined.withColumn("min_cost", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


def q_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: the parts representing a significant share of
    one nation's shipped inventory value, HAVING-filtered against a
    scalar fraction of the total. Value is exact integer cents
    (quantity · round(retail·100)) so the share threshold is an
    integer comparison — no float sum deciding membership in either
    engine.

    Scale: one fact pass groups value per part; the 1-row total
    broadcasts back (fixed cardinality — hint is safe); threshold
    compare is a map-side filter."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    cents = F.col("l_quantity").cast("bigint") * F.round(
        F.col("p_retailprice") * 100
    ).cast("bigint")
    v = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(nation.where(F.col("n_name") == IMPORTANT_NATION)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("l_partkey")
        .agg(F.sum(cents).alias("value_cents"))
    )
    total = v.agg(F.sum("value_cents").alias("total_cents"))
    return (
        v.join(F.broadcast(total))
        .where(F.col("value_cents") * IMPORTANT_SHARE > F.col("total_cents"))
        .select(
            "l_partkey",
            (F.col("value_cents").cast("double") / 100).alias("value"),
        )
    )


def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the distribution of orders-per-customer —
    left join customer → (priority-filtered) orders, count per
    customer including zeros, then histogram the counts. Two grouped
    aggs; the second runs on a customer-sized frame."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders.where(F.col("o_orderpriority") != "4-NOT SPECIFIED").select(
                "o_custkey", "o_orderkey"
            ),
            cust.c_custkey == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


def q_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped a significant volume of
    a name-filtered part family in one year — the partsupp/availqty
    HAVING becomes a shipped-quantity HAVING over the same join tree,
    then a semi-join back to supplier ⋈ nation. Integer quantity sum
    (exact)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    heavy = (
        li.where(
            (F.col("l_shipdate") >= PROMO_YEAR_START)
            & (F.col("l_shipdate") < PROMO_YEAR_END)
        )
        .join(
            part.where(F.col("p_name").like(f"{PROMO_PREFIX}%")).select(
                "p_partkey"
            ),
            li.l_partkey == F.col("p_partkey"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
        .where(F.col("qty") > 50)
    )
    return (
        supp.join(heavy, supp.s_suppkey == F.col("l_suppkey"), "semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
    )


def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers gone quiet — acctbal
    above the positive-balance average but no orders since
    IDLE_CUTOFF, grouped by nation (the stand-in for the absent phone
    country code). The average threshold is exact integer cents
    (round(bal·100) summed as bigint, compared cross-multiplied) so
    the boundary is engine-identical; the no-orders test is an
    anti-join on the date-filtered orders.

    Scale: the threshold is a 1-row agg (broadcast-safe); the
    anti-join keys on custkey; everything else is customer-sized."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    thr = cust.where(F.col("c_acctbal") > 0).agg(
        F.sum(cents).alias("sum_cents"), F.count("*").alias("n_pos")
    )
    return (
        cust.join(F.broadcast(thr))
        .where(cents * F.col("n_pos") > F.col("sum_cents"))
        .join(
            orders.where(F.col("o_orderdate") >= IDLE_CUTOFF).select(
                "o_custkey"
            ),
            cust.c_custkey == F.col("o_custkey"),
            "anti",
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("numcust"),
            dsum("c_acctbal", "totacctbal"),
        )
    )


QUERIES = {
    "q_volume_shipping": q_volume_shipping,
    "q_product_profit": q_product_profit,
    "q_shipping_lag": q_shipping_lag,
    "q_small_qty_revenue": q_small_qty_revenue,
    "q_waiting_suppliers": q_waiting_suppliers,
    "q_min_cost_supplier": q_min_cost_supplier,
    "q_important_parts": q_important_parts,
    "q_customer_distribution": q_customer_distribution,
    "q_promo_suppliers": q_promo_suppliers,
    "q_idle_customers": q_idle_customers,
    "q_promo_revenue": q_promo_revenue,
    "q_disjunctive_revenue": q_disjunctive_revenue,
    "q_basket_affinity": q_basket_affinity,
    "q_order_lead_time": q_order_lead_time,
    "q_returned_items": q_returned_items,
    "q_top_supplier": q_top_supplier,
    "q_large_orders": q_large_orders,
    "q_supplier_part_counts": q_supplier_part_counts,
    "q_market_share": q_market_share,
    "q_forecast_revenue": q_forecast_revenue,
    "q_shipping_priority": q_shipping_priority,
    "q_pivot_event_types": q_pivot_event_types,
    "q_grouping_rollup": q_grouping_rollup,
    "q_grouping_cube": q_grouping_cube,
    "q_except_signals": q_except_signals,
    "q_intersect_signals": q_intersect_signals,
    "q_revenue_growth": q_revenue_growth,
    "q_pricing_summary": q_pricing_summary,
    "q_revenue_by_nation": q_revenue_by_nation,
    "q_order_priority": q_order_priority,
    "q_outlier_majority": q_outlier_majority,
}

ORACLES = {
    "q_volume_shipping": f"""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(CAST(l_shipdate AS DATE)) AS INTEGER) AS l_year,
               {dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")},
               count(*) AS n_items
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_name IN ('{VOL_NATIONS[0]}', '{VOL_NATIONS[1]}')
          AND n2.n_name IN ('{VOL_NATIONS[0]}', '{VOL_NATIONS[1]}')
          AND n1.n_name <> n2.n_name
        GROUP BY 1, 2, 3
    """,
    "q_product_profit": f"""
        SELECT n_name AS nation,
               CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS o_year,
               {dsum_sql(
                   "l_extendedprice * (1 - l_discount) "
                   f"- {PROFIT_UNIT_COST} * p_retailprice * l_quantity",
                   "sum_profit")},
               count(*) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        WHERE p_name LIKE '%gear%'
        GROUP BY 1, 2
    """,
    "q_shipping_lag": f"""
        SELECT CAST(floor(date_diff('day', CAST(o_orderdate AS DATE),
                                    CAST(l_shipdate AS DATE)) / 30.0)
                    AS BIGINT) AS lag_bucket,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '{LAG_START}'
          AND l_shipdate < TIMESTAMP '{LAG_END}'
        GROUP BY 1
    """,
    "q_small_qty_revenue": f"""
        WITH pa AS (
            SELECT l_partkey AS a_partkey,
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)
                       / count(*) AS aq
            FROM lineitem GROUP BY 1
        )
        SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6)))
                          AS DOUBLE) / 7.0, 6) AS avg_yearly,
               count(*) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        JOIN pa ON l_partkey = a_partkey
        WHERE p_brand = '{SMALLQTY_BRAND}' AND l_quantity < 0.2 * aq
    """,
    "q_waiting_suppliers": f"""
        WITH late AS (
            SELECT l_orderkey, l_suppkey
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_orderstatus = 'F'
              AND l_shipdate > o_orderdate + INTERVAL {WAIT_LATE_DAYS} DAY
        )
        SELECT s_name, count(*) AS numwait
        FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        WHERE EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 20
    """,
    "q_min_cost_supplier": f"""
        WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
        j AS (
            SELECT s_acctbal, s_name, n_name, p_partkey,
                   min(s_acctbal) OVER (PARTITION BY p_partkey) AS mc
            FROM ps
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE p_size = {MINCOST_SIZE} AND r_name = '{MINCOST_REGION}'
        )
        SELECT s_acctbal, s_name, n_name, p_partkey
        FROM j WHERE s_acctbal = mc
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
    "q_important_parts": f"""
        WITH v AS (
            SELECT l_partkey,
                   SUM(CAST(l_quantity AS BIGINT)
                       * CAST(ROUND(p_retailprice * 100) AS BIGINT))
                       AS value_cents
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE n_name = '{IMPORTANT_NATION}'
            GROUP BY 1
        ),
        t AS (SELECT SUM(value_cents) AS total_cents FROM v)
        SELECT l_partkey,
               CAST(value_cents AS DOUBLE) / 100 AS value
        FROM v, t
        WHERE value_cents * {IMPORTANT_SHARE} > total_cents
    """,
    "q_customer_distribution": """
        WITH pc AS (
            SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                 AND o_orderpriority <> '4-NOT SPECIFIED'
            GROUP BY c_custkey
        )
        SELECT c_count, count(*) AS custdist FROM pc GROUP BY c_count
    """,
    "q_promo_suppliers": f"""
        SELECT s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE s_suppkey IN (
            SELECT l_suppkey
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE '{PROMO_PREFIX}%'
              AND l_shipdate >= TIMESTAMP '{PROMO_YEAR_START}'
              AND l_shipdate < TIMESTAMP '{PROMO_YEAR_END}'
            GROUP BY l_suppkey
            HAVING SUM(CAST(l_quantity AS BIGINT)) > 50
        )
    """,
    "q_idle_customers": f"""
        WITH thr AS (
            SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS sum_cents,
                   count(*) AS n_pos
            FROM customer WHERE c_acctbal > 0
        )
        SELECT n_name, count(*) AS numcust,
               {dsum_sql("c_acctbal", "totacctbal")}
        FROM customer, thr
        JOIN nation ON c_nationkey = n_nationkey
        WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * n_pos > sum_cents
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '{IDLE_CUTOFF}')
        GROUP BY n_name
    """,
    "q_disjunctive_revenue": f"""
        SELECT CASE WHEN p_brand = '{DISJ_BRANDS[0]}' AND p_size <= 10
                         AND l_quantity < 15
                    THEN 'small_lot' ELSE 'mid_lot' END AS branch,
               {dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")},
               count(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = '{DISJ_BRANDS[0]}' AND p_size <= 10
               AND l_quantity < 15)
           OR (p_brand = '{DISJ_BRANDS[1]}' AND p_size <= 25
               AND l_quantity >= 15 AND l_quantity < 30)
        GROUP BY 1
    """,
    "q_basket_affinity": """
        WITH ot AS (
            SELECT DISTINCT l_orderkey, p_type
            FROM lineitem JOIN part ON l_partkey = p_partkey
        ),
        t AS (SELECT count(DISTINCT l_orderkey) AS nd FROM ot),
        s AS (SELECT p_type, count(*) AS n_t FROM ot GROUP BY p_type),
        p AS (
            SELECT a.p_type AS type_a, b.p_type AS type_b,
                   count(*) AS n_ab
            FROM ot a JOIN ot b ON a.l_orderkey = b.l_orderkey
                              AND a.p_type < b.p_type
            GROUP BY 1, 2
        )
        SELECT type_a, type_b, n_ab,
               round(n_ab / CAST(nd AS DOUBLE), 6) AS support,
               round((n_ab * CAST(nd AS DOUBLE))
                     / (sa.n_t * CAST(sb.n_t AS DOUBLE)), 6) AS lift
        FROM p
        JOIN s sa ON p.type_a = sa.p_type
        JOIN s sb ON p.type_b = sb.p_type
        CROSS JOIN t
    """,
    "q_order_lead_time": """
        WITH po AS (
            SELECT l_orderkey,
                   min(l_shipdate) AS first_ship,
                   max(l_shipdate) AS last_ship
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT CAST(date_diff('day', CAST(o_orderdate AS DATE),
                              CAST(last_ship AS DATE)) AS INTEGER)
                   AS lead_days,
               count(*) AS n_orders,
               CAST(min(date_diff('day', CAST(o_orderdate AS DATE),
                                  CAST(first_ship AS DATE))) AS INTEGER)
                   AS min_first_ship_days
        FROM po JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1
    """,
    "q_returned_items": f"""
        SELECT c_custkey, c_name, n_name,
               {dsum_sql("l_extendedprice * (1 - l_discount)", "lost_revenue")},
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY SUM(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(38,6))) DESC, c_custkey
        LIMIT 20
    """,
    "q_top_supplier": f"""
        WITH r AS (
            SELECT l_suppkey,
                   {dsum_sql("l_extendedprice * (1 - l_discount)", "total_revenue")}
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '{TOP_SUPP_START}'
              AND l_shipdate <  TIMESTAMP '{TOP_SUPP_END}'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM r JOIN supplier ON l_suppkey = s_suppkey
        WHERE total_revenue = (SELECT max(total_revenue) FROM r)
    """,
    "q_large_orders": f"""
        SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
               sum_qty
        FROM (
            SELECT l_orderkey, {isum_sql("l_quantity", "sum_qty")}
            FROM lineitem GROUP BY l_orderkey
        )
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE sum_qty > {LARGE_ORDER_QTY}
    """,
    "q_supplier_part_counts": f"""
        SELECT p_brand, p_type, p_size,
               count(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> '{EXCL_BRAND}'
        GROUP BY p_brand, p_type, p_size
    """,
    "q_market_share": f"""
        SELECT o_year, nation_revenue, total_revenue,
               round(nation_revenue / total_revenue, 6) AS mkt_share
        FROM (
            SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
                   {dsum_sql(
                       f"CASE WHEN n_name = '{SHARE_NATION}' "
                       "THEN l_extendedprice * (1 - l_discount) "
                       "ELSE 0.0 END",
                       "nation_revenue",
                   )},
                   {dsum_sql(
                       "l_extendedprice * (1 - l_discount)",
                       "total_revenue",
                   )}
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY 1
        )
    """,
    "q_promo_revenue": f"""
        SELECT ship_month, promo_revenue, total_revenue,
               round(CAST(100.0 AS DOUBLE) * promo_revenue
                     / total_revenue, 6) AS promo_share_pct
        FROM (
            SELECT date_trunc('month', l_shipdate) AS ship_month,
                   {dsum_sql(
                       f"CASE WHEN p_type = '{PROMO_TYPE}' "
                       "THEN l_extendedprice * (1 - l_discount) "
                       "ELSE 0.0 END",
                       "promo_revenue",
                   )},
                   {dsum_sql(
                       "l_extendedprice * (1 - l_discount)",
                       "total_revenue",
                   )}
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1
        )
    """,
    "q_forecast_revenue": f"""
        SELECT {dsum_sql("l_extendedprice * l_discount", "revenue")}
        FROM lineitem
        WHERE l_quantity < 24 AND l_discount >= 0.05 AND l_discount <= 0.07
    """,
    "q_shipping_priority": f"""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               {dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        WHERE o_custkey IN
              (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY SUM(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(38,6))) DESC, l_orderkey
        LIMIT 10
    """,
    "q_pivot_event_types": """
        SELECT user_id,
               CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
               CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error,
               CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
               CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
               CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view
        FROM events GROUP BY user_id
    """,
    "q_grouping_rollup": f"""
        SELECT l_returnflag, l_linestatus,
               {dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")},
               count(*) AS n_rows,
               CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                    AS BIGINT) AS gid
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "q_grouping_cube": f"""
        SELECT l_returnflag, l_linestatus,
               {dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")},
               count(*) AS n_rows,
               CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus)
                    AS BIGINT) AS gid
        FROM lineitem
        GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    "q_except_signals": f"""
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'error'
        GROUP BY user_id HAVING count(*) >= {EXCEPT_NOISY_ERRORS}
    """,
    "q_intersect_signals": """
        SELECT user_id FROM events WHERE event_type = 'purchase'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'error'
    """,
    "q_revenue_growth": f"""
        WITH m AS (
            SELECT date_trunc('month', l_shipdate) AS month,
                   {dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")},
                   count(*) AS n_items
            FROM lineitem GROUP BY 1
        )
        SELECT month, revenue, n_items,
               lag(revenue) OVER w AS prev_revenue,
               round(revenue - lag(revenue) OVER w, 6) AS mom_delta,
               round((revenue - lag(revenue) OVER w)
                     / lag(revenue) OVER w * 100.0, 6) AS mom_pct
        FROM m WINDOW w AS (ORDER BY month)
    """,
    "q_pricing_summary": f"""
        SELECT l_returnflag, l_linestatus,
               {isum_sql("l_quantity", "sum_qty")},
               {dsum_sql("l_extendedprice", "sum_base_price")},
               {dsum_sql("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
               {dsum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
               round(avg(l_quantity), 6) AS avg_qty,
               round(avg(l_extendedprice), 6) AS avg_price,
               count(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "q_revenue_by_nation": f"""
        SELECT n_name,
               {dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")},
               count(*) AS n_items
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "q_order_priority": """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem)
        GROUP BY o_orderpriority
    """,
    "q_outlier_majority": """
        SELECT l_quantity AS qty, count(*) AS cnt,
               round(count(*) / (SELECT CAST(count(*) AS DOUBLE) FROM lineitem), 6)
                   AS share
        FROM lineitem GROUP BY l_quantity
    """,
}
