"""Relational core: filters, projections, distinct/sort, grouped
aggregations, top-k, joins (broadcast / sort-merge / semi / anti /
as-of), set ops, pivot-style conditional aggs, rollup.

The reference itself has no joins or SQL GROUP BY (SURVEY.md §2.F: the
Flink job `flink_processor/flink_processor.py:94-112` is single-table;
grouping is implicit per-symbol dict keys) — this module supplies the
relational backbone a complete engine needs, expressed declaratively so
Catalyst picks physical strategies:

* dim joins (region/nation/supplier/part/customer) broadcast — the dims
  stay small at any SF, so `F.broadcast` is correct at 100 TB too;
* fact-fact joins (orders ⋈ lineitem) shuffle on the join key and AQE
  handles skew;
* aggregates are partial (map-side combine) automatically.

All oracle-checked float aggregates go through the decimal-exact
`dsum`/`davg` helpers (see functions/__init__.py) so Spark and DuckDB
agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions import davg, davg_sql, dsum, dsum_sql
from ..tables import load_table


# ---------------------------------------------------------------------------
# Grouped aggregation (TPC-H Q1 shape)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan-filter-aggregate over lineitem. One shuffle on
    the (tiny-cardinality) group keys; filter + 7-column projection
    push down to the Parquet scan."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity')} AS sum_qty,
       {dsum_sql('l_extendedprice')} AS sum_base_price,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {davg_sql('l_quantity')} AS avg_qty,
       {davg_sql('l_extendedprice')} AS avg_price,
       {davg_sql('l_discount')} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Fact-fact join + group + top-k (TPC-H Q3 shape)
# ---------------------------------------------------------------------------

def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem: customer broadcasts (small at all
    SFs), orders⋈lineitem sort-merges on the orderkey; revenue is an
    exact decimal sum so the top-10 cutoff is engine-independent."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


_SHIPPING_PRIORITY_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# Multi-way star join (TPC-H Q5 shape)
# ---------------------------------------------------------------------------

def q_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table star join; every dim side broadcasts, so the only
    shuffles are lineitem⋈orders and the final tiny aggregation."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")))
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(supplier),
              (li.l_suppkey == supplier.s_suppkey)
              & (customer.c_nationkey == supplier.s_nationkey))
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


_REGION_REVENUE_SQL = f"""
SELECT n_name,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


# ---------------------------------------------------------------------------
# Simple relational primitives (SURVEY §2.B)
# ---------------------------------------------------------------------------

def q_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4-style equality filter + projection/rename (B1). Both the
    filter and the 3-column read schema reach the Parquet scan."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id"), F.col("user_id"),
                F.col("value").alias("close"))
    )


_FILTER_PROJECT_SQL = """
SELECT event_id, user_id, value AS close
FROM events WHERE event_type = 'purchase'
"""


def q_distinct_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: dimension extraction — distinct + sort
    (`streamlit_app/streamlit_app.py:332-333`)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_type").distinct().orderBy("event_type")


_DISTINCT_SORT_SQL = "SELECT DISTINCT event_type FROM events ORDER BY event_type"


def q_grouped_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped agg over the stream-shaped table: count / sum / avg /
    min / max per event_type."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            dsum(F.col("value")).alias("total_value"),
            davg(F.col("value")).alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("event_type")
    )


_GROUPED_EVENTS_SQL = f"""
SELECT event_type, COUNT(*) AS n,
       {dsum_sql('value')} AS total_value,
       {davg_sql('value')} AS avg_value,
       MIN(value) AS min_value, MAX(value) AS max_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E19/A10: ORDER BY ... DESC LIMIT — Spark plans
    TakeOrderedAndProject (no global sort materialized)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


_TOP_ORDERS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
"""


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — windowed rank, the scalable top-k
    (single shuffle on the partition key, no global sort)."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.withColumn("rank_in_cust", F.row_number().over(w))
        .filter(F.col("rank_in_cust") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank_in_cust")
    )


_TOPK_PER_GROUP_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rank_in_cust FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank_in_cust
  FROM orders) WHERE rank_in_cust <= 3
"""


# ---------------------------------------------------------------------------
# Semi / anti / outer joins, set ops
# ---------------------------------------------------------------------------

def q_customers_with_high_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers having an order > 300k.
    Broadcast of the filtered key set at scale; no row duplication."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


_SEMI_JOIN_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
"""


def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no urgent order.
    (Plain no-orders is empty at every SF — an empty result would make
    the parity check vacuous.)"""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


_ANTI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
"""


def q_order_fill_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join orders → lineitem with null-aware aggregation:
    per order, how many lines and summed quantity (0 for none)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left")
        .groupBy("o_orderkey")
        .agg(
            F.count("l_linenumber").alias("n_lines"),
            F.coalesce(dsum(F.col("l_quantity")), F.lit(0.0)).alias("total_qty"),
        )
    )


_ORDER_FILL_OUTER_SQL = f"""
SELECT o_orderkey, COUNT(l_linenumber) AS n_lines,
       COALESCE({dsum_sql('l_quantity')}, 0.0) AS total_qty
FROM orders LEFT JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderkey
"""


def q_union_account_holders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL + dedup of two differently-shaped inputs projected to
    a common schema (kind, key, acctbal)."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.lit("customer").alias("kind"),
        F.col("c_custkey").alias("key"),
        F.col("c_acctbal").alias("acctbal"))
    supp = load_table(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_suppkey").alias("key"),
        F.col("s_acctbal").alias("acctbal"))
    return cust.unionByName(supp).filter(F.col("acctbal") > 5000).distinct()


_UNION_SQL = """
SELECT * FROM (
  SELECT 'customer' AS kind, c_custkey AS key, c_acctbal AS acctbal FROM customer
  UNION ALL
  SELECT 'supplier' AS kind, s_suppkey AS key, s_acctbal AS acctbal FROM supplier
) WHERE acctbal > 5000
GROUP BY ALL
"""


def q_parts_never_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set difference): part keys minus parts ever shipped in
    bulk (quantity ≥ 45) — non-empty at every SF so the check bites."""
    part = load_table(spark, sf_dir, "part").select("p_partkey")
    bulk = (load_table(spark, sf_dir, "lineitem")
            .filter(F.col("l_quantity") >= 45)
            .select(F.col("l_partkey").alias("p_partkey")))
    return part.exceptAll(bulk.distinct()).orderBy("p_partkey")


_EXCEPT_SQL = """
SELECT p_partkey FROM part
EXCEPT
SELECT DISTINCT l_partkey AS p_partkey FROM lineitem WHERE l_quantity >= 45
ORDER BY p_partkey
"""


# ---------------------------------------------------------------------------
# Conditional aggregation (pivot shape) and rollup
# ---------------------------------------------------------------------------

def q_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type counts, pivot-style via conditional
    aggregation (one shuffle; avoids the two-pass .pivot() inference)."""
    ev = load_table(spark, sf_dir, "events")

    def cnt(t: str):
        return F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")

    return (
        ev.groupBy("user_id")
        .agg(cnt("click"), cnt("view"), cnt("purchase"), cnt("signup"), cnt("error"))
        .orderBy("user_id")
    )


_EVENTS_PIVOT_SQL = """
SELECT user_id,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS n_view,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS n_error
FROM events GROUP BY user_id ORDER BY user_id
"""


def q_orders_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (orderstatus, orderpriority): subtotal rows with
    NULL group keys, counts + exact sums."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), dsum(F.col("o_totalprice")).alias("total"))
    )


_ORDERS_ROLLUP_SQL = f"""
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       {dsum_sql('o_totalprice')} AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


# ---------------------------------------------------------------------------
# As-of join (no native Spark operator — union + last-non-null window)
# ---------------------------------------------------------------------------

def q_asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase event, the most recent prior (or
    simultaneous) signup ts of the same user.

    Spark has no ASOF JOIN; the scalable expression is a union of both
    sides tagged by kind, one window sort per user, and
    `last(signup_ts, ignorenulls)` — a single shuffle on user_id, no
    range cross-product, robust to skew. (DuckDB oracle uses its
    native ASOF JOIN.)
    """
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts",
        F.lit(1).alias("is_probe"), F.lit(None).cast("timestamp").alias("signup_ts"))
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.lit(None).cast("long").alias("event_id"), "ts",
        F.lit(0).alias("is_probe"), F.col("ts").alias("signup_ts"))
    unioned = purchases.unionByName(signups)
    # signups sort before probes at equal ts (is_probe asc) so an exact
    # tie counts as "prior or simultaneous" — matches ASOF JOIN's <=.
    w = (W.partitionBy("user_id").orderBy("ts", "is_probe")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    return (
        unioned.withColumn("last_signup_ts", F.last("signup_ts", ignorenulls=True).over(w))
        .filter(F.col("is_probe") == 1)
        .select("user_id", "event_id", "ts", "last_signup_ts")
    )


_ASOF_SQL = """
SELECT p.user_id, p.event_id, p.ts, s.ts AS last_signup_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.ts >= s.ts
"""


# ---------------------------------------------------------------------------
# Exact per-group quantiles (discrete, row-number selection)
# ---------------------------------------------------------------------------

_QUANTILES = (0.25, 0.5, 0.75, 0.95)


def q_order_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete quantiles of o_totalprice per order priority:
    the value at row ceil(p*n) of the per-group sort. One shuffle +
    per-group sort; at 100 TB swap in approx_percentile (t-digest
    sketch, no sort, mergeable map-side) — exact form kept here
    because the oracle demands bit-equality."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wall = W.partitionBy("o_orderpriority")
    ranked = (orders
              .select("o_orderpriority", "o_totalprice", "o_orderkey")
              .withColumn("rn", F.row_number().over(w))
              .withColumn("cnt", F.count("*").over(wall)))
    aggs = [
        F.max(F.when(F.col("rn") == F.ceil(F.lit(p) * F.col("cnt")),
                     F.col("o_totalprice"))).alias(f"p{int(p * 100)}")
        for p in _QUANTILES
    ]
    return (ranked.groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_orders"), *aggs)
            .orderBy("o_orderpriority"))


_ORDER_QUANTILES_SQL = """
WITH ranked AS (
  SELECT o_orderpriority, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS cnt
  FROM orders)
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders,
       MAX(CASE WHEN rn = ceil(0.25 * cnt) THEN o_totalprice END) AS p25,
       MAX(CASE WHEN rn = ceil(0.5 * cnt) THEN o_totalprice END) AS p50,
       MAX(CASE WHEN rn = ceil(0.75 * cnt) THEN o_totalprice END) AS p75,
       MAX(CASE WHEN rn = ceil(0.95 * cnt) THEN o_totalprice END) AS p95
FROM ranked GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# CUBE (all grouping-set combinations + grouping_id)
# ---------------------------------------------------------------------------

def q_orders_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping sets in one pass —
    Spark expands the sets and aggregates partially map-side, so the
    shuffle carries one partial row per (set, group), not a re-scan
    per set. grouping_id disambiguates NULL-as-total from NULL data."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.grouping_id().alias("gid"),
             F.count("*").alias("n_orders"),
             dsum(F.col("o_totalprice")).alias("total_price"))
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    )


_ORDERS_CUBE_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       COUNT(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY gid, o_orderstatus, o_orderpriority
"""


QUERIES = {
    "pricing_summary": (q_pricing_summary, _PRICING_SUMMARY_SQL),
    "order_quantiles": (q_order_quantiles, _ORDER_QUANTILES_SQL),
    "orders_cube": (q_orders_cube, _ORDERS_CUBE_SQL),
    "shipping_priority": (q_shipping_priority, _SHIPPING_PRIORITY_SQL),
    "region_revenue": (q_region_revenue, _REGION_REVENUE_SQL),
    "filter_project": (q_filter_project, _FILTER_PROJECT_SQL),
    "distinct_sort": (q_distinct_sort, _DISTINCT_SORT_SQL),
    "grouped_events": (q_grouped_events, _GROUPED_EVENTS_SQL),
    "top_orders": (q_top_orders, _TOP_ORDERS_SQL),
    "topk_per_group": (q_topk_per_group, _TOPK_PER_GROUP_SQL),
    "semi_join_high_orders": (q_customers_with_high_orders, _SEMI_JOIN_SQL),
    "anti_join_no_orders": (q_customers_without_orders, _ANTI_JOIN_SQL),
    "order_fill_outer": (q_order_fill_outer, _ORDER_FILL_OUTER_SQL),
    "union_account_holders": (q_union_account_holders, _UNION_SQL),
    "parts_never_ordered": (q_parts_never_ordered, _EXCEPT_SQL),
    "events_pivot": (q_events_pivot, _EVENTS_PIVOT_SQL),
    "orders_rollup": (q_orders_rollup, _ORDERS_ROLLUP_SQL),
    "asof_last_signup": (q_asof_last_signup, _ASOF_SQL),
}
