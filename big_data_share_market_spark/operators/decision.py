"""Remaining TPC-H decision-support shapes (Q6-Q22 analogs).

The reference has no relational queries at all (SURVEY.md §2.F — its
single SQL statement is a one-table projection,
`flink_processor/flink_processor.py:94-112`); operators/relational.py
and operators/advanced.py already ship the Q1/Q2/Q3/Q4/Q5/Q13/Q16/Q18
shapes. This module completes the classic decision-support family so
the engine plans every canonical join/agg/subquery pattern. Fixture
adaptations (FIXTURES.md has no partsupp table and lineitem carries no
commitdate/receiptdate/shipmode): supply cost is proxied by
p_retailprice, lateness by l_shipdate vs o_orderdate.

Scale notes (100 TB): every query keeps lineitem/orders on the
streamed side of at most one hash shuffle; dimension sides (part,
supplier, customer, nation) are broadcast; scalar-subquery thresholds
reduce to one-row broadcasts (a cross-join of a singleton, not a
per-row re-execution); aggregate-before-join is used wherever the
aggregate collapses the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions import dsum, dsum_sql
from ..tables import load_table

def _rev():
    """Revenue expression, built lazily (classic PySpark F.col needs an
    active SparkContext, so no module-level Column objects)."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


_REV_SQL = "l_extendedprice * (1 - l_discount)"


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change: pure scan-side predicate aggregation
# ---------------------------------------------------------------------------

def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: revenue from discounted small-quantity lines shipped in
    one year. Deliberately the simplest possible plan — every predicate
    is scan-pushable (shipdate range hits parquet row-group min/max
    stats, discount/quantity prune pages), then a single global
    partial+final aggregate with no shuffle wider than one row per
    task. The benchmark of predicate-pushdown health at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24))
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount"))
             .alias("revenue"),
             F.count("*").alias("n_lines"))
    )


_FORECAST_REVENUE_SQL = f"""
SELECT {dsum_sql('l_extendedprice * l_discount')} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# ---------------------------------------------------------------------------
# Q7 — bilateral shipping volume between two nations, by year
# ---------------------------------------------------------------------------

def q_bilateral_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: revenue flowing between two nations (supplier nation ->
    customer nation, both directions), grouped by year. Two broadcast
    joins map suppkey/custkey to nation names before the fact-fact
    orders join; the (2-nation x 2-nation) filter happens on the
    broadcast output so lineitem rows from other nations never reach
    the big shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    n1 = nation.select(F.col("n_nationkey").alias("s_nkey"),
                       F.col("n_name").alias("supp_nation"))
    n2 = nation.select(F.col("n_nationkey").alias("c_nkey"),
                       F.col("n_name").alias("cust_nation"))
    pair = F.col("supp_nation").isin("NATION_1", "NATION_2") & \
        F.col("cust_nation").isin("NATION_1", "NATION_2") & \
        (F.col("supp_nation") != F.col("cust_nation"))
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").alias("l_year"))
        .agg(dsum(_rev()).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


_BILATERAL_VOLUME_SQL = f"""
SELECT supp_nation, cust_nation, l_year, {dsum_sql('volume')} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(YEAR FROM l_shipdate) AS INT) AS l_year,
         {_REV_SQL} AS volume
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name IN ('NATION_1', 'NATION_2')
    AND n2.n_name IN ('NATION_1', 'NATION_2')
    AND n1.n_name <> n2.n_name)
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# Q8 — national market share within a region's market, by year
# ---------------------------------------------------------------------------

def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: the share of ASIA-market revenue for STANDARD-type
    parts captured by NATION_2 suppliers, per order year. The
    share-of-total is a conditional aggregate (sum(if)/sum), not a
    self-join — one pass over the joined fact rows."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")

    n_cust = (nation.join(region, nation.n_regionkey == region.r_regionkey)
              .filter(F.col("r_name") == "ASIA")
              .select(F.col("n_nationkey").alias("c_nkey")))
    n_supp = nation.select(F.col("n_nationkey").alias("s_nkey"),
                           F.col("n_name").alias("supp_nation"))
    joined = (
        li.join(F.broadcast(part.filter(F.col("p_type") == "STANDARD")),
                li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("s_nkey"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), F.col("c_nationkey") == F.col("c_nkey"),
              "left_semi")
    )
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((dsum(F.when(F.col("supp_nation") == "NATION_2", _rev())
                   .otherwise(F.lit(0.0)))
              / dsum(_rev())).alias("mkt_share"))
        .orderBy("o_year")
    )


_MARKET_SHARE_SQL = f"""
SELECT o_year,
       {dsum_sql("CASE WHEN supp_nation = 'NATION_2' THEN volume ELSE 0 END")}
         / {dsum_sql('volume')} AS mkt_share
FROM (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
         {_REV_SQL} AS volume, n1.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE p_type = 'STANDARD'
    AND c_nationkey IN (SELECT n_nationkey FROM nation
                        JOIN region ON n_regionkey = r_regionkey
                        WHERE r_name = 'ASIA'))
GROUP BY o_year
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# Q9 — product-line profit by supplier nation and year
# ---------------------------------------------------------------------------

def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit per supplier-nation per year over parts whose
    name contains a substring. No partsupp fixture -> supply cost is
    proxied as 60% of p_retailprice (deterministic, mirrored in the
    oracle). Part and supplier broadcast; the only wide shuffle is the
    lineitem⋈orders orderkey join, then a tiny (25 x years) group."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part")

    amount = _rev() - F.col("p_retailprice") * 0.6 * F.col("l_quantity")
    return (
        li.join(F.broadcast(part.filter(F.col("p_name").contains("e"))),
                li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"),
                 F.year("o_orderdate").alias("o_year"))
        .agg(dsum(amount).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


_PRODUCT_PROFIT_SQL = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS o_year,
       {dsum_sql(f'{_REV_SQL} - p_retailprice * 0.6 * l_quantity')}
         AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%e%'
GROUP BY n_name, CAST(EXTRACT(YEAR FROM o_orderdate) AS INT)
ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------------------
# Q10 — returned-item revenue: top customers who returned goods
# ---------------------------------------------------------------------------

def q_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: the 20 customers with the highest revenue on RETURNED
    lines for orders placed in one quarter. The returnflag filter
    reaches the lineitem scan; orders' date range prunes before its
    join; customer+nation broadcast onto the aggregated result (agg
    first, join the 20-row decoration last)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")

    q_orders = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-04-01")))
    per_cust = (
        li.filter(F.col("l_returnflag") == "R")
        .join(q_orders, li.l_orderkey == q_orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(dsum(_rev()).alias("revenue"))
    )
    return (
        per_cust.join(F.broadcast(cust),
                      per_cust.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "c_name", "revenue", "c_acctbal",
                F.col("n_name").alias("nation"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


_RETURNED_ITEM_SQL = f"""
SELECT c_custkey, c_name, revenue, c_acctbal, n_name AS nation
FROM (
  SELECT o_custkey, {dsum_sql(_REV_SQL)} AS revenue
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1997-01-01'
    AND o_orderdate <  TIMESTAMP '1997-04-01'
  GROUP BY o_custkey)
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q11 — important part value (global-threshold scalar subquery)
# ---------------------------------------------------------------------------

def q_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 adapted (no partsupp): parts whose total ordered value
    exceeds 0.1% of ALL ordered value. The global total is a one-row
    aggregate cross-joined (broadcast) onto the per-part aggregates —
    Catalyst plans the scalar subquery exactly once, never per row.
    Both aggregates ride the same shuffle of lineitem on l_partkey."""
    li = load_table(spark, sf_dir, "lineitem")
    value = F.col("l_extendedprice") * F.col("l_quantity")
    per_part = (li.groupBy("l_partkey")
                .agg(dsum(value).alias("part_value")))
    total = per_part.agg(
        dsum(F.col("part_value")).alias("total_value"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("total_value") * 0.0008)
        .select("l_partkey", "part_value")
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


_IMPORTANT_PART_SQL = f"""
WITH per_part AS (
  SELECT l_partkey, {dsum_sql('l_extendedprice * l_quantity')} AS part_value
  FROM lineitem GROUP BY l_partkey)
SELECT l_partkey, part_value
FROM per_part
WHERE part_value > (SELECT {dsum_sql('part_value')} FROM per_part) * 0.0008
ORDER BY part_value DESC, l_partkey ASC
"""


# ---------------------------------------------------------------------------
# Q12 — late-shipment priority split (conditional counts by group)
# ---------------------------------------------------------------------------

def q_late_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adapted (no shipmode/receiptdate): for lines shipped
    more than 60 days after order placement in one year, count
    critical-priority vs other orders per linestatus. The CASE folds
    into the aggregate — one join shuffle, one two-row group."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = li.filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01"))
        & (F.col("l_shipdate") < F.lit("1999-01-01")))
    return (
        late.join(orders, late.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy("l_linestatus")
        .agg(F.sum(F.when(crit, 1).otherwise(0)).alias("high_line_count"),
             F.sum(F.when(crit, 0).otherwise(1)).alias("low_line_count"))
        .orderBy("l_linestatus")
    )


_LATE_PRIORITY_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_shipdate <  TIMESTAMP '1999-01-01'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# ---------------------------------------------------------------------------
# Q14 — promotion revenue share (conditional-aggregate ratio)
# ---------------------------------------------------------------------------

def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percentage of one month's revenue from PROMO-type
    parts. Part broadcast; numerator and denominator computed in the
    same single aggregate pass (no second scan, no self-join)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    month = li.filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01"))
        & (F.col("l_shipdate") < F.lit("1997-07-01")))
    return (
        month.join(F.broadcast(part), month.l_partkey == part.p_partkey)
        .agg((dsum(F.when(F.col("p_type") == "PROMO", _rev())
                   .otherwise(F.lit(0.0))) * 100.0
              / dsum(_rev())).alias("promo_revenue_pct"))
    )


_PROMO_REVENUE_SQL = f"""
SELECT {dsum_sql(f"CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} ELSE 0 END")}
         * 100.0 / {dsum_sql(_REV_SQL)} AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-06-01'
  AND l_shipdate <  TIMESTAMP '1997-07-01'
"""


# ---------------------------------------------------------------------------
# Q15 — top supplier by quarterly revenue (max-equality on an aggregate)
# ---------------------------------------------------------------------------

def q_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) whose revenue over one quarter equals the
    maximum supplier revenue. The per-supplier aggregate is computed
    once and reused for both the maximum (one-row broadcast) and the
    probe — the view in the original query, a shared subplan here."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter((F.col("l_shipdate") >= F.lit("1997-01-01"))
                  & (F.col("l_shipdate") < F.lit("1997-04-01")))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(_rev()).alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


_TOP_REVENUE_SUPPLIER_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, {dsum_sql(_REV_SQL)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q17 — small-quantity order revenue (correlated per-part average)
# ---------------------------------------------------------------------------

def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: average yearly revenue lost if small-quantity orders
    (below 50% of the part's mean order quantity) for one brand were
    not filled. The correlated AVG decorrelates to a per-part
    aggregate joined back on partkey; with the brand filter broadcast-
    pruned into BOTH branches so the heavy aggregate only covers the
    brand's parts."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    brand_parts = part.filter(F.col("p_brand") == "Brand#11") \
                      .select("p_partkey")
    brand_li = li.join(F.broadcast(brand_parts),
                       li.l_partkey == F.col("p_partkey"), "left_semi")
    avg_qty = (brand_li.groupBy(F.col("l_partkey").alias("aq_partkey"))
               .agg((F.avg("l_quantity") * 0.5).alias("half_avg_qty")))
    return (
        brand_li.join(F.broadcast(avg_qty),
                      brand_li.l_partkey == F.col("aq_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg((dsum(F.col("l_extendedprice")) / 7.0).alias("avg_yearly"))
    )


_SMALL_QUANTITY_SQL = f"""
SELECT {dsum_sql('l_extendedprice')} / 7.0 AS avg_yearly
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#11'
  AND l_quantity < (SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = lineitem.l_partkey)
"""


# ---------------------------------------------------------------------------
# Q19 — disjunctive multi-attribute predicates (OR of ANDs)
# ---------------------------------------------------------------------------

def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: revenue from three alternative (brand, size-range,
    quantity-range) channels — an OR of AND-blocks spanning both join
    sides. Part broadcasts; the disjunction evaluates as a post-join
    residual inside codegen. The common sub-predicates (quantity >= 1)
    stay per-branch exactly as written so the oracle matches."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    b1 = ((F.col("p_brand") == "Brand#12") & (F.col("p_size").between(1, 15))
          & (F.col("l_quantity").between(1, 11)))
    b2 = ((F.col("p_brand") == "Brand#23") & (F.col("p_size").between(1, 25))
          & (F.col("l_quantity").between(10, 20)))
    b3 = ((F.col("p_brand") == "Brand#34") & (F.col("p_size").between(1, 35))
          & (F.col("l_quantity").between(20, 30)))
    return (j.filter(b1 | b2 | b3)
            .agg(dsum(_rev()).alias("revenue"),
                 F.count("*").alias("n_lines")))


_DISJUNCTIVE_SQL = f"""
SELECT {dsum_sql(_REV_SQL)} AS revenue, COUNT(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Q20 — suppliers of high-volume parts (nested semi-join chain)
# ---------------------------------------------------------------------------

def q_high_volume_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 adapted (no partsupp): suppliers who shipped more
    than 60 units of any 'red'-named part in 1997 — the nested
    IN(IN(...)) semi-join chain. Decorrelated inside-out: the part
    filter broadcast-semi-prunes lineitem, the (supplier, part)
    aggregate collapses it, the HAVING threshold filters, and a final
    left-semi picks the suppliers. Every reduction happens before the
    next join, so the chain's widest edge is one lineitem shuffle on
    the (suppkey, partkey) grain."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    red_parts = part.filter(F.col("p_name").contains("red")) \
                    .select("p_partkey")
    qualifying = (
        li.filter((F.col("l_shipdate") >= F.lit("1997-01-01"))
                  & (F.col("l_shipdate") < F.lit("1998-01-01")))
        .join(F.broadcast(red_parts), li.l_partkey == F.col("p_partkey"),
              "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 60)
        .select("l_suppkey")
    )
    return (supp.join(qualifying, supp.s_suppkey == F.col("l_suppkey"),
                      "left_semi")
            .select("s_suppkey", "s_name", "s_acctbal")
            .orderBy("s_suppkey"))


_HIGH_VOLUME_SUPPLIERS_SQL = f"""
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey, l_partkey
  HAVING {dsum_sql('l_quantity')} > 60)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept multi-supplier orders waiting
# ---------------------------------------------------------------------------

def q_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 adapted (no commit/receipt dates): per supplier, the
    number of multi-supplier orders where THIS supplier shipped the
    strictly-latest line. Decorrelated: one per-order aggregate
    computes the max shipdate and the distinct supplier count plus the
    max shipdate over OTHER suppliers; the strictly-latest test is
    max(own) > max(others) — same semantics as the EXISTS/NOT EXISTS
    pair, but ONE lineitem shuffle total instead of three lineitem
    scans: the pruned scan repartitions by l_orderkey once, and both
    the (order, supplier) aggregate and every window function reuse
    that exchange (hashpartitioning(o) satisfies the clustering
    requirement of a groupBy(o, s) AND of a window over o — guide
    §2.4 "two operations keyed the same way share one exchange").
    The r9-r10 form aggregated first and paid a second exchange to
    re-cluster the (o, s)-grain rows by order; at TPC-H line-per-
    order fan-out the partial aggregate barely compresses (the
    (o, s) grain is ~0.95× lineitem), so the old shape shuffled
    ~2× the bytes of this one (r11; plan: 3 → 2 hash exchanges,
    plans/r11/suppliers_kept_waiting_{before,after}.txt)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    pso = (li.select("l_orderkey", "l_suppkey", "l_shipdate")
           .repartition("l_orderkey")
           .groupBy("l_orderkey", "l_suppkey")
           .agg(F.max("l_shipdate").alias("supp_max_ship")))
    w = W.partitionBy("l_orderkey")
    waiting = (
        pso.withColumn("n_supps", F.count("*").over(w))
        .withColumn("order_max_ship", F.max("supp_max_ship").over(w))
        # strictly latest: nobody else ties at the max shipdate
        .withColumn(
            "n_at_max",
            F.sum(F.when(F.col("supp_max_ship")
                         == F.max("supp_max_ship").over(w), 1)
                  .otherwise(0)).over(w))
        .filter((F.col("n_supps") > 1)
                & (F.col("supp_max_ship") == F.col("order_max_ship"))
                & (F.col("n_at_max") == 1))
    )
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), F.asc("s_name"))
    )


_SUPPLIERS_WAITING_SQL = """
WITH per_order AS (
  SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supps,
         MAX(l_shipdate) AS order_max_ship
  FROM lineitem GROUP BY l_orderkey),
per_supplier_order AS (
  SELECT l_orderkey, l_suppkey, MAX(l_shipdate) AS supp_max_ship
  FROM lineitem GROUP BY l_orderkey, l_suppkey),
at_ship AS (
  SELECT l_orderkey, l_shipdate AS ship,
         COUNT(DISTINCT l_suppkey) AS n_at_ship
  FROM lineitem GROUP BY l_orderkey, l_shipdate)
SELECT s_name, COUNT(*) AS numwait
FROM per_supplier_order pso
JOIN per_order po ON pso.l_orderkey = po.l_orderkey AND po.n_supps > 1
JOIN at_ship a ON a.l_orderkey = pso.l_orderkey
              AND a.ship = pso.supp_max_ship
JOIN supplier ON pso.l_suppkey = s_suppkey
WHERE pso.supp_max_ship = po.order_max_ship AND a.n_at_ship = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
"""


# ---------------------------------------------------------------------------
# Q22 — idle high-balance customers (scalar-subquery threshold + anti join)
# ---------------------------------------------------------------------------

def q_idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: customers with above-average positive balances and no
    RECENT orders (none since 2000 — every fixture customer has some
    order, so the lapse window keeps Q22's anti-join shape with a
    non-empty result), grouped by nation. The average is a one-row
    broadcast; the no-orders test is a left-anti join (null-safe,
    unlike NOT IN with nulls); both reductions precede the final tiny
    group-by."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    recent = orders.filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
    avg_bal = (cust.filter(F.col("c_acctbal") > 0.0)
               .agg(F.avg("c_acctbal").alias("avg_bal")))
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("numcust"),
             dsum(F.col("c_acctbal")).alias("totacctbal"))
        .orderBy("nationkey")
    )


_IDLE_CUSTOMER_SQL = f"""
SELECT c_nationkey AS nationkey, COUNT(*) AS numcust,
       {dsum_sql('c_acctbal')} AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
ORDER BY nationkey
"""


QUERIES = {
    "forecast_revenue": (q_forecast_revenue, _FORECAST_REVENUE_SQL),
    "bilateral_volume": (q_bilateral_volume, _BILATERAL_VOLUME_SQL),
    "market_share": (q_market_share, _MARKET_SHARE_SQL),
    "product_profit": (q_product_profit, _PRODUCT_PROFIT_SQL),
    "returned_item_revenue": (q_returned_item_revenue, _RETURNED_ITEM_SQL),
    "important_part_value": (q_important_part_value, _IMPORTANT_PART_SQL),
    "late_priority_split": (q_late_priority_split, _LATE_PRIORITY_SQL),
    "promo_revenue": (q_promo_revenue, _PROMO_REVENUE_SQL),
    "top_revenue_supplier": (q_top_revenue_supplier, _TOP_REVENUE_SUPPLIER_SQL),
    "small_quantity_revenue": (q_small_quantity_revenue, _SMALL_QUANTITY_SQL),
    "disjunctive_revenue": (q_disjunctive_revenue, _DISJUNCTIVE_SQL),
    "high_volume_part_suppliers": (q_high_volume_part_suppliers,
                                   _HIGH_VOLUME_SUPPLIERS_SQL),
    "suppliers_kept_waiting": (q_suppliers_kept_waiting, _SUPPLIERS_WAITING_SQL),
    "idle_customer_balance": (q_idle_customer_balance, _IDLE_CUSTOMER_SQL),
}
