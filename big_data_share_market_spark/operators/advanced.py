"""Advanced decision-support shapes: correlated subqueries, group-on-
aggregate distributions, HAVING-join pipelines, correlated EXISTS with
inequality predicates, and gap-based sessionization.

The reference has no subqueries at all (SURVEY.md §2.F — its one SQL
query is a single-table projection, `flink_processor/
flink_processor.py:94-112`); these queries extend the relational core
(operators/relational.py) with the decision-support patterns a
complete engine must plan well. Each is written declaratively so
Catalyst rewrites the subquery into the join form it executes best:

* correlated scalar aggregate -> per-group agg + broadcast equi-join
  (no per-row re-execution, unlike a naive nested-loop);
* correlated EXISTS with a non-equi conjunct -> left-semi hash join on
  the equi key with the inequality as a post-join residual;
* group-on-aggregate (Q13 distribution) -> two cascaded shuffles, the
  second over a tiny domain (the distinct counts);
* HAVING over a fact-side aggregate (Q18) -> aggregate-then-join so
  the filter collapses the fact table before any join fan-out.

Scale notes (100 TB): every shape here keeps the big table (lineitem /
orders / events) on the streamed side of one hash shuffle; the
reduction (agg or semi) happens before any join multiplies rows.
Sessionization is one shuffle on user_id + an in-partition sort —
the same physical plan at any scale, skew-tolerant because a single
user's history fits one task by domain construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions import dsum, dsum_sql
from ..tables import load_table


# ---------------------------------------------------------------------------
# Correlated scalar aggregate (TPC-H Q2 flavor)
# ---------------------------------------------------------------------------

def q_top_supplier_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers whose account balance equals their nation's maximum —
    the correlated-scalar-subquery shape of TPC-H Q2 (`WHERE s_acctbal
    = (SELECT MAX(...) WHERE same nation)`), adapted to the fixture
    star schema (no partsupp table in FIXTURES.md).

    Spark expression: aggregate the 25-row per-nation maxima, broadcast
    them back onto supplier. The subquery never re-executes per row —
    one scan of supplier builds the maxima, a second probe joins them,
    and at 100 TB the broadcast side is still |nations| rows."""
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    maxima = (supp.groupBy(F.col("s_nationkey").alias("mx_nationkey"))
              .agg(F.max("s_acctbal").alias("max_acctbal")))
    return (
        supp.join(F.broadcast(maxima),
                  (F.col("s_nationkey") == F.col("mx_nationkey"))
                  & (F.col("s_acctbal") == F.col("max_acctbal")))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("n_name", "s_suppkey", "s_name", "s_acctbal")
        .orderBy("n_name", "s_suppkey")
    )


_TOP_SUPPLIER_SQL = """
SELECT n_name, s_suppkey, s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_acctbal = (SELECT MAX(s2.s_acctbal) FROM supplier s2
                   WHERE s2.s_nationkey = supplier.s_nationkey)
ORDER BY n_name, s_suppkey
"""


# ---------------------------------------------------------------------------
# Group-on-aggregate distribution (TPC-H Q13 shape)
# ---------------------------------------------------------------------------

def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: how many customers placed exactly N orders, zeros
    included. Left outer join keeps order-less customers; the first
    aggregation shuffles on c_custkey, the second over the tiny domain
    of distinct counts — the classic two-cascade plan whose second
    exchange is negligible at any scale."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count("*").alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


_CUSTOMER_DISTRIBUTION_SQL = """
SELECT n_orders, COUNT(*) AS n_customers FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS n_orders
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey)
GROUP BY n_orders
ORDER BY n_customers DESC, n_orders DESC
"""


# ---------------------------------------------------------------------------
# HAVING over fact-side aggregate + join back (TPC-H Q18 shape)
# ---------------------------------------------------------------------------

def q_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total lineitem quantity exceeds 250,
    with their customer. Aggregate lineitem FIRST (map-side partials +
    one shuffle on l_orderkey), filter on the aggregate, then join the
    surviving handful of orderkeys — the HAVING collapses the fact
    table before the join, so the join probe side is tiny at any SF."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (li.groupBy("l_orderkey")
           .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
           .filter(F.col("sum_qty") > 250))
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    )


_LARGE_VOLUME_SQL = f"""
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM orders
JOIN (SELECT l_orderkey, {dsum_sql('l_quantity')} AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING {dsum_sql('l_quantity')} > 250) big
  ON o_orderkey = big.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
"""


# ---------------------------------------------------------------------------
# Correlated EXISTS with inequality (TPC-H Q4 flavor)
# ---------------------------------------------------------------------------

def q_late_shipment_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority count of orders having at least one lineitem
    shipped more than 90 days after the order date — TPC-H Q4's
    correlated EXISTS, adapted to the fixture columns (no
    commit/receipt dates; l_shipdate vs o_orderdate + 90d instead).

    The left-semi join deduplicates matches before counting (an order
    with five late lines counts once), hash-partitioned on the equi
    key with the date inequality evaluated as a join residual."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    matched = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi")
    return (matched.groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_orders"))
            .orderBy("o_orderpriority"))


_LATE_SHIPMENT_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Gap-based sessionization (batch clickstream sessions)
# ---------------------------------------------------------------------------

_SESSION_GAP = "INTERVAL 12 HOURS"          # Spark literal
_SESSION_GAP_SQL = "INTERVAL 12 HOUR"       # DuckDB literal


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization of the events stream: a new session starts
    when a user's inter-event gap exceeds 12 hours; emit one row per
    session with start/end/count/value-sum. The batch twin of
    streaming session windows (streaming/pipeline session_windows) and
    the standard first step of clickstream / training-data pipelines.

    Plan: lag + a cumulative sum of new-session flags — one shuffle on
    user_id, one in-partition sort shared by both window functions,
    then a partial-aggregating groupBy on (user_id, session_seq) that
    rides the same partitioning. No self-join, no cross-product; the
    same plan at 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_s",
        F.when(F.lag("ts").over(w).isNull()
               | (F.col("ts") > F.lag("ts").over(w) + F.expr(_SESSION_GAP)),
               F.lit(1)).otherwise(F.lit(0)))
    cum = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sessions = flagged.withColumn("session_seq", F.sum("new_s").over(cum))
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(F.min("ts").alias("session_start"),
             F.max("ts").alias("session_end"),
             F.count("*").alias("n_events"),
             dsum(F.col("value")).alias("total_value"))
        .orderBy("user_id", "session_seq")
    )


_SESSIONIZE_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + {_SESSION_GAP_SQL}
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sessions AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_seq
  FROM flagged)
SELECT user_id, session_seq, MIN(ts) AS session_start,
       MAX(ts) AS session_end, COUNT(*) AS n_events,
       {dsum_sql('value')} AS total_value
FROM sessions
GROUP BY user_id, session_seq
ORDER BY user_id, session_seq
"""


QUERIES = {
    "top_supplier_per_nation": (q_top_supplier_per_nation, _TOP_SUPPLIER_SQL),
    "customer_order_distribution": (q_customer_order_distribution,
                                    _CUSTOMER_DISTRIBUTION_SQL),
    "large_volume_orders": (q_large_volume_orders, _LARGE_VOLUME_SQL),
    "late_shipment_priorities": (q_late_shipment_priorities, _LATE_SHIPMENT_SQL),
    "sessionize_events": (q_sessionize_events, _SESSIONIZE_SQL),
}
