"""Warehouse dimension maintenance: SCD2 (slowly-changing dimension,
type 2) history build and point-in-time snapshot.

The reference keeps only a last-write-wins current table
(`postgres/init.sql:12`, upserted by
`flink_processor/flink_processor.py:77-91`); an analytics engine also
needs the HISTORY form — per key, the validity interval of each
attribute version — to answer "what was the state when event X
happened". Built from the orders change stream: each order is a
change event carrying the customer's order priority; consecutive
equal values collapse (true SCD2 records changes, not events) and
validity is [change ts, next change ts).

Scale notes: both queries are two window passes over the SAME
partitioning (o_custkey) — Catalyst plans ONE hash exchange and
reuses the sort for the second window, so the whole history build is
a single shuffle of the fact table, no joins, no state. The snapshot
is a row-local filter over the history — at 100 TB you'd persist the
history bucketed by key and the snapshot never shuffles at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..tables import load_table

#: Snapshot instant for the point-in-time query (mid-history).
_SNAPSHOT_TS = "1996-06-01 00:00:00"


def _scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = (
        orders.select("o_custkey", "o_orderdate", "o_orderkey",
                      "o_orderpriority")
        .withColumn("prev", F.lag("o_orderpriority").over(w))
        .filter(F.col("prev").isNull()
                | (F.col("prev") != F.col("o_orderpriority")))
    )
    return (
        changes.withColumn("valid_to", F.lead("o_orderdate").over(w))
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def q_scd2_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history of each customer's order priority: one row per
    VERSION (consecutive duplicates collapsed), half-open validity
    [valid_from, valid_to), open-ended current row flagged."""
    return _scd2_history(spark, sf_dir).orderBy("custkey", "valid_from")


_SCD2_SQL = """
WITH ev AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
         lag(o_orderpriority) OVER w AS prev
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
changes AS (
  SELECT * FROM ev
  WHERE prev IS NULL OR prev <> o_orderpriority)
SELECT o_custkey AS custkey, o_orderpriority AS priority,
       o_orderdate AS valid_from,
       lead(o_orderdate) OVER w2 AS valid_to,
       lead(o_orderdate) OVER w2 IS NULL AS is_current
FROM changes
WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY custkey, valid_from
"""


def q_scd2_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup over the SCD2 history: the attribute
    version valid at the snapshot instant — the as-of read every
    history table exists to serve. Row-local interval filter; exactly
    one row per customer active at the instant."""
    hist = _scd2_history(spark, sf_dir)
    ts = F.lit(_SNAPSHOT_TS).cast("timestamp")
    return (
        hist.filter((F.col("valid_from") <= ts)
                    & (F.col("valid_to").isNull()
                       | (F.col("valid_to") > ts)))
        .select("custkey", "priority", "valid_from")
        .orderBy("custkey")
    )


_SCD2_SNAPSHOT_SQL = f"""
WITH ev AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
         lag(o_orderpriority) OVER w AS prev
  FROM orders
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
changes AS (
  SELECT * FROM ev
  WHERE prev IS NULL OR prev <> o_orderpriority),
hist AS (
  SELECT o_custkey AS custkey, o_orderpriority AS priority,
         o_orderdate AS valid_from,
         lead(o_orderdate) OVER w2 AS valid_to
  FROM changes
  WINDOW w2 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey))
SELECT custkey, priority, valid_from
FROM hist
WHERE valid_from <= TIMESTAMP '{_SNAPSHOT_TS}'
  AND (valid_to IS NULL OR valid_to > TIMESTAMP '{_SNAPSHOT_TS}')
ORDER BY custkey
"""


QUERIES = {
    "scd2_order_priority": (q_scd2_order_priority, _SCD2_SQL),
    "scd2_snapshot": (q_scd2_snapshot, _SCD2_SNAPSHOT_SQL),
}
