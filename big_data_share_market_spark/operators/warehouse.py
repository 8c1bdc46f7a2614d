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


_ERASE_LT = 8  # hash256 < 8 → ~3% of users on the deletion list


def q_gdpr_erasure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure propagation — the data-governance sweep every
    warehouse runs on a schedule: a deletion-request table (users
    whose salted content hash falls under `_ERASE_LT`, the
    deterministic stand-in for the request queue) is anti-joined
    against the event store, and the output is the per-event-type
    audit record (rows before / deleted / after + users erased) that
    the compliance log keeps.

    Scale shape: the deletion list is request-queue-sized (≪ corpus)
    and BROADCASTS into a left-anti join — the event store streams
    through map-side, nothing user-grain ever shuffles; the audit is
    two map-side-combined aggregates over (event_type). At 100 TB
    this is one scan + bytes-sized exchanges. The erase predicate
    lives in the request TABLE, not the query — adding requests never
    changes the plan."""
    ev = load_table(spark, sf_dir, "events")
    from .sampling import hash256
    dels = (ev.select("user_id").distinct()
            .filter(hash256(F.col("user_id"), "erase:") < _ERASE_LT))
    kept = ev.join(F.broadcast(dels), "user_id", "left_anti")
    before = (ev.groupBy("event_type")
              .agg(F.count("*").alias("rows_before"),
                   F.count_distinct("user_id").alias("users_before")))
    after = (kept.groupBy("event_type")
             .agg(F.count("*").alias("rows_after"),
                  F.count_distinct("user_id").alias("users_after")))
    return (before.join(after, "event_type")
            .select("event_type", "rows_before", "rows_after",
                    (F.col("rows_before") - F.col("rows_after"))
                    .alias("rows_deleted"),
                    (F.col("users_before") - F.col("users_after"))
                    .alias("users_erased"))
            .orderBy("event_type"))


def _gdpr_sql() -> str:
    from .sampling import hash256_sql
    return f"""
WITH dels AS (
  SELECT DISTINCT user_id FROM events
  WHERE {hash256_sql('user_id', 'erase:')} < {_ERASE_LT}),
kept AS (
  SELECT e.* FROM events e
  WHERE NOT EXISTS (SELECT 1 FROM dels d WHERE d.user_id = e.user_id)),
before AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS rows_before,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users_before
  FROM events GROUP BY event_type),
after AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS rows_after,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users_after
  FROM kept GROUP BY event_type)
SELECT b.event_type, b.rows_before, a.rows_after,
       b.rows_before - a.rows_after AS rows_deleted,
       b.users_before - a.users_after AS users_erased
FROM before b JOIN after a USING (event_type)
ORDER BY b.event_type
"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-to-snapshot CDC diff — given two versions of a
    PK-keyed table, emit the change stream between them (insert /
    delete / update rows, unchanged suppressed). This is the audit and
    downstream-sync primitive every warehouse needs: "what changed
    between yesterday's load and today's" without the source emitting
    a changelog. The two versions are carved deterministically from
    `orders`: v2 is missing some v1 keys (deletes), has keys v1 lacks
    (inserts), and bumps o_totalprice on an update stripe — so both
    engines derive identical snapshots.

    Scale shape: ONE full-outer sort-merge join on the PK — both
    sides hash-partition on o_orderkey, AQE coalesces, nothing else
    shuffles; the unchanged-row suppression is a row-local filter
    AFTER the join, so output is O(changes) even when input is
    O(table). With both snapshots bucketed by PK (the layout
    `bucketed_join_revenue` demonstrates) the exchange disappears
    entirely and the diff is a zero-shuffle zip of co-located
    buckets."""
    orders = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    v1 = (orders.filter(key % 97 != 3)
          .select("o_orderkey", F.col("o_totalprice").alias("old_price")))
    v2 = (orders.filter(key % 97 != 5)
          .select("o_orderkey",
                  (F.col("o_totalprice")
                   + F.when(key % 11 == 0, 1).otherwise(0))
                  .alias("new_price")))
    joined = v1.join(v2, "o_orderkey", "full_outer")
    change = (F.when(F.col("old_price").isNull(), "insert")
              .when(F.col("new_price").isNull(), "delete")
              .when(F.col("old_price") != F.col("new_price"), "update"))
    return (joined.withColumn("change_type", change)
            .filter(F.col("change_type").isNotNull())
            .select("o_orderkey", "change_type", "old_price", "new_price"))


_SNAPSHOT_DIFF_SQL = """
WITH v1 AS (
  SELECT o_orderkey, o_totalprice AS old_price
  FROM orders WHERE o_orderkey % 97 <> 3),
v2 AS (
  SELECT o_orderkey,
         o_totalprice + CASE WHEN o_orderkey % 11 = 0 THEN 1 ELSE 0 END
           AS new_price
  FROM orders WHERE o_orderkey % 97 <> 5)
SELECT COALESCE(v1.o_orderkey, v2.o_orderkey) AS o_orderkey,
       CASE WHEN v1.old_price IS NULL THEN 'insert'
            WHEN v2.new_price IS NULL THEN 'delete'
            ELSE 'update' END AS change_type,
       v1.old_price, v2.new_price
FROM v1 FULL OUTER JOIN v2 ON v1.o_orderkey = v2.o_orderkey
WHERE v1.old_price IS NULL OR v2.new_price IS NULL
   OR v1.old_price <> v2.new_price
"""


def q_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC APPLY — the consumer side of `snapshot_diff`: replay an
    ordered I/U/D changelog onto a PK-keyed base state and emit the
    resulting table. The changelog is carved deterministically from
    `orders` with overlapping stripes so the ordering semantics are
    actually exercised: two updates can hit one key (higher seq
    wins) and a delete can follow an update (delete wins).

    Scale shape: base and changelog union into one relation with a
    monotone `seq` (base rows seq 0); the final state is a single
    last-writer-wins window per PK (ONE hash shuffle), then a
    row-local `op != 'D'` filter — the standard "apply changes as of
    now" materialization, identical in cost to dedup_upsert no
    matter how many change batches the log contains. At 100 TB the
    changelog side is O(changes); only the PK shuffle touches the
    base."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    key = F.col("o_orderkey")
    base = (orders.filter(key % 97 != 3)
            .select("o_orderkey",
                    F.col("o_totalprice").alias("price"),
                    F.lit("B").alias("op"), F.lit(0).alias("seq")))
    upd1 = (orders.filter(key % 11 == 0)
            .select("o_orderkey",
                    (F.col("o_totalprice") + 1).alias("price"),
                    F.lit("U").alias("op"), F.lit(1).alias("seq")))
    upd2 = (orders.filter(key % 13 == 0)
            .select("o_orderkey",
                    (F.col("o_totalprice") + 2).alias("price"),
                    F.lit("U").alias("op"), F.lit(2).alias("seq")))
    ins = (orders.filter(key % 97 == 3)
           .select("o_orderkey",
                   F.col("o_totalprice").alias("price"),
                   F.lit("I").alias("op"), F.lit(1).alias("seq")))
    dels = (orders.filter(key % 97 == 5)
            .select("o_orderkey",
                    F.lit(None).cast("double").alias("price"),
                    F.lit("D").alias("op"), F.lit(3).alias("seq")))
    log = base.unionByName(upd1).unionByName(upd2) \
              .unionByName(ins).unionByName(dels)
    w = Window.partitionBy("o_orderkey").orderBy(
        F.desc("seq"), F.desc("op"), F.desc("price"))
    return (log.withColumn("rn", F.row_number().over(w))
            .filter((F.col("rn") == 1) & (F.col("op") != "D"))
            .select("o_orderkey", "price", F.col("op").alias("last_op"))
            .orderBy("o_orderkey"))


_CDC_APPLY_SQL = """
WITH log AS (
  SELECT o_orderkey, o_totalprice AS price, 'B' AS op, 0 AS seq
  FROM orders WHERE o_orderkey % 97 <> 3
  UNION ALL
  SELECT o_orderkey, o_totalprice + 1, 'U', 1
  FROM orders WHERE o_orderkey % 11 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice + 2, 'U', 2
  FROM orders WHERE o_orderkey % 13 = 0
  UNION ALL
  SELECT o_orderkey, o_totalprice, 'I', 1
  FROM orders WHERE o_orderkey % 97 = 3
  UNION ALL
  SELECT o_orderkey, CAST(NULL AS DOUBLE), 'D', 3
  FROM orders WHERE o_orderkey % 97 = 5),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderkey
                               ORDER BY seq DESC, op DESC,
                                        price DESC) AS rn
  FROM log)
SELECT o_orderkey, price, op AS last_op
FROM ranked WHERE rn = 1 AND op <> 'D'
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# Small-file compaction planning (OPTIMIZE-style bin packing)
# ---------------------------------------------------------------------------

#: Target output-bin size for the compaction plan, in bytes of
#: document text. Deliberately small so the sf fixtures produce
#: multi-bin plans per source.
_BIN_TARGET = 4096


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic small-file compaction plan, the planning half of a
    Delta/Iceberg-style OPTIMIZE: treat each document as a file in its
    `source` partition (size = n_chars) and assign files to output
    bins of ~_BIN_TARGET bytes by sorted-fill — order files largest
    first, running-sum their sizes, and cut a new bin every time the
    PRECEDING mass crosses a target boundary (bin = floor((cumsum -
    size) / target)). Output is one row per planned compaction job:
    file count, total bytes, and the doc-id range it covers.

    Scale: the input here stands in for a file MANIFEST — metadata,
    ~1 row per file, millions of rows at 100 TB, not the data itself.
    The window partitions by `source` (the table partition being
    compacted), so the global sort a naive planner would do never
    happens; all arithmetic is integer-exact."""
    docs = load_table(spark, sf_dir, "documents")
    files = docs.select("source", "doc_id", F.col("n_chars").alias("bytes"))
    w = (W.partitionBy("source")
         .orderBy(F.col("bytes").desc(), "doc_id")
         .rowsBetween(W.unboundedPreceding, 0))
    cum = F.sum("bytes").over(w)
    binned = files.withColumn(
        "bin_id", F.floor((cum - F.col("bytes")) / F.lit(_BIN_TARGET)))
    return (binned.groupBy("source", "bin_id")
            .agg(F.count("*").alias("n_files"),
                 F.sum("bytes").alias("total_bytes"),
                 F.min("doc_id").alias("first_doc"),
                 F.max("doc_id").alias("last_doc")))


_COMPACTION_SQL = f"""
WITH files AS (
  SELECT source, doc_id, n_chars AS bytes FROM documents),
binned AS (
  SELECT source, doc_id, bytes,
         CAST(floor((SUM(bytes) OVER (PARTITION BY source
                        ORDER BY bytes DESC, doc_id
                        ROWS UNBOUNDED PRECEDING) - bytes)
                    / {_BIN_TARGET}) AS BIGINT) AS bin_id
  FROM files)
SELECT source, bin_id,
       COUNT(*) AS n_files,
       CAST(SUM(bytes) AS BIGINT) AS total_bytes,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM binned
GROUP BY source, bin_id
"""


# ---------------------------------------------------------------------------
# Incremental materialized-view maintenance (mergeable partial aggregates)
# ---------------------------------------------------------------------------

def q_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance for a per-customer
    order summary: the BASE partition (o_orderkey % 10 < 8, the
    repo-wide base/delta convention) holds yesterday's materialized
    partial aggregates; the DELTA partition arrives and only ITS rows
    are aggregated, then the two partial-state relations merge with
    one customer-keyed FULL OUTER join — count/sum/min/max are
    mergeable states, so merge(base, delta) ≡ recompute(all), which
    is exactly what the oracle computes. This is the O(|delta|)
    refresh every warehouse's incremental view maintenance performs
    instead of an O(|table|) rebuild.

    Exactness: counts are integers; the price sum is held as
    DECIMAL(25,6) partial state so the merge ADD is associative and
    bit-equal to the oracle's single global sum (the reason real
    engines keep sum state wider than the display type); min/max
    merge via least/greatest. Scale shape: two map-side-combined
    partial aggregations (the base one would be a read of the stored
    MV, not a scan) + one keyed merge join — AQE broadcasts the
    delta side when small."""
    from ..functions import DEC

    orders = load_table(spark, sf_dir, "orders")

    def partial(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy("o_custkey").agg(
            F.count("*").alias(f"{tag}_n"),
            F.sum(F.col("o_totalprice").cast(DEC)).alias(f"{tag}_sum"),
            F.min("o_orderdate").alias(f"{tag}_min_d"),
            F.max("o_orderdate").alias(f"{tag}_max_d"))

    base = partial(orders.filter(F.col("o_orderkey") % 10 < 8), "b")
    delta = partial(orders.filter(F.col("o_orderkey") % 10 >= 8), "d")
    merged = base.join(delta, "o_custkey", "full_outer")
    zero = F.lit(0).cast("long")
    return (merged.select(
        "o_custkey",
        (F.coalesce("b_n", zero) + F.coalesce("d_n", zero))
        .alias("n_orders"),
        (F.coalesce(F.col("b_sum"), F.lit(0).cast(DEC))
         + F.coalesce(F.col("d_sum"), F.lit(0).cast(DEC)))
        .cast("double").alias("total_spend"),
        F.least(F.coalesce("b_min_d", "d_min_d"),
                F.coalesce("d_min_d", "b_min_d")).alias("first_order"),
        F.greatest(F.coalesce("b_max_d", "d_max_d"),
                   F.coalesce("d_max_d", "b_max_d")).alias("last_order"))
        .orderBy("o_custkey"))


_INCR_MERGE_SQL = """
SELECT o_custkey,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
         AS total_spend,
       MIN(o_orderdate) AS first_order,
       MAX(o_orderdate) AS last_order
FROM orders
GROUP BY o_custkey
ORDER BY o_custkey
"""


QUERIES = {
    "incremental_agg_merge": (q_incremental_agg_merge, _INCR_MERGE_SQL),
    "cdc_apply": (q_cdc_apply, _CDC_APPLY_SQL),
    "compaction_plan": (q_compaction_plan, _COMPACTION_SQL),
    "scd2_order_priority": (q_scd2_order_priority, _SCD2_SQL),
    "scd2_snapshot": (q_scd2_snapshot, _SCD2_SNAPSHOT_SQL),
    "gdpr_erasure": (q_gdpr_erasure, _gdpr_sql()),
    "snapshot_diff": (q_snapshot_diff, _SNAPSHOT_DIFF_SQL),
}
