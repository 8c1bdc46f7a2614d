"""Scale-machinery operators: the physical-layout and skew patterns a
100 TB deployment lives on, each expressed so the small-SF oracle can
prove the result is identical to the naive plan it replaces.

The reference runs single-host (SURVEY.md §6 — Docker Compose, one
Flink TaskManager with 2 slots, `flink_processor/flink-conf.yaml:1-4`)
and never needs these; at cluster scale they are the difference between
a job that finishes and one that dies on one hot partition:

* **salted aggregation** — two-stage agg (key, salt) -> key. A key
  holding 10% of 100 TB otherwise lands on one reducer; the salt fans
  it over 16, and the second shuffle moves only 16 partial rows per
  key. Decimal partials keep the result bit-identical to a one-stage
  sum (integer arithmetic is associative; see functions.dsum).
* **grouping sets** — one pass producing several aggregation levels;
  the alternative (N separate scans + union) reads the fact table N
  times.
* **multi-resolution rollup cascade** — day bars computed FROM hour
  bars, not from raw events: the hypertable/continuous-aggregate
  pattern. Input to the second rollup is |keys|x24 rows regardless of
  raw volume, so each coarser resolution costs ~nothing.
* **bucketed join** — both fact tables pre-bucketed on the join key:
  Spark's scan reports the hash distribution and the sort-merge join
  runs with ZERO Exchange (asserted in tests/test_plans.py). At 100 TB
  this converts every repeated orders x lineitem join from a full
  2-sided shuffle into a local merge.
* **partition-pruned store** — events written `partitionBy(event_type)`;
  a filtered read lists only the matching directories (PartitionFilters
  in the scan node), the 100 TB table scans like a 10 TB one.

Set-op and rank-distribution queries round out the relational surface
(operators/relational.py) with INTERSECT / EXCEPT / ntile /
percent_rank / cume_dist.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions import DEC, dsum_sql
from ..tables import load_table


# ---------------------------------------------------------------------------
# Salted two-stage aggregation (skew mitigation)
# ---------------------------------------------------------------------------

_SALTS = 16


def q_salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user value totals via salted two-stage aggregation.

    Stage 1 groups on (user_id, salt) — map-side combine plus a first
    shuffle whose partitions are bounded by fan-out, not by key
    frequency; stage 2 re-aggregates the <= _SALTS partial rows per
    key. Partials stay DECIMAL so the two-stage sum equals the
    one-stage oracle sum exactly."""
    ev = load_table(spark, sf_dir, "events")
    partial = (
        ev.withColumn("salt", F.pmod(F.hash("event_id"), F.lit(_SALTS)))
        .groupBy("user_id", "salt")
        .agg(F.sum(F.col("value").cast(DEC)).alias("part_sum"),
             F.count("*").alias("part_n"))
    )
    return (
        partial.groupBy("user_id")
        .agg(F.sum("part_sum").cast("double").alias("total_value"),
             F.sum("part_n").alias("n_events"))
        .orderBy("user_id")
    )


_SALTED_SQL = f"""
SELECT user_id, {dsum_sql('value')} AS total_value, COUNT(*) AS n_events
FROM events GROUP BY user_id ORDER BY user_id
"""


def q_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted JOIN — the companion to q_salted_skew_agg for the case
    where the SMALL side is still too big to broadcast (a
    billion-row user dimension): the fact side salts its join key
    with pmod(hash(event_id), S) and the dimension replicates each
    row S times with an exploded salt, so a hot key's rows spread
    over S reducers instead of one. Joining on (key, salt) is
    exactly equivalent to joining on key — each fact row meets its
    dimension row in precisely one salt bucket. The merge hint pins
    sort-merge so the demo survives AQE wanting to broadcast the
    fixture-sized dimension; at real scale neither side fits in an
    executor and this IS the plan.

    events.user_id is genuinely skewed (15 distinct users across
    the whole event stream), making this the honest shape: without
    salting, 1/15th of 100 TB lands on one task. Cost: the dim
    shuffle grows S-fold — the standard trade, paid on the small
    side; with AQE skew-join splitting available the same effect
    arrives automatically, but the salt works on ANY engine and on
    deterministic cluster layouts (bucketed facts) AQE can't touch.
    Decimal partials keep the grouped totals bit-identical to the
    unsalted oracle."""
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    fact = ev.withColumn("salt", F.pmod(F.hash("event_id"), F.lit(_SALTS)))
    dim = (cust.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
           .withColumn("salt", F.explode(F.sequence(F.lit(0),
                                                    F.lit(_SALTS - 1)))))
    joined = fact.hint("merge").join(dim, ["user_id", "salt"])
    return (joined.groupBy("c_mktsegment")
            .agg(F.sum(F.col("value").cast(DEC)).cast("double")
                 .alias("total_value"),
                 F.count("*").alias("n_events"))
            .orderBy("c_mktsegment"))


_SALTED_JOIN_SQL = f"""
SELECT c.c_mktsegment, {dsum_sql('e.value')} AS total_value,
       COUNT(*) AS n_events
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
"""


# ---------------------------------------------------------------------------
# AQE skew-join split (the engine-native alternative to salting)
# ---------------------------------------------------------------------------

def _aqe_skew_session(spark: SparkSession) -> SparkSession:
    """An isolated child session (shared SparkContext, OWN SQLConf)
    with AQE's skew-join split armed at fixture scale. Isolation
    matters: advisoryPartitionSizeInBytes this small would wreck
    every other query's post-shuffle coalescing if set globally."""
    s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # A reduce partition is "skewed" when size > max(threshold,
    # factor x median); with 64 shuffle partitions over the
    # low-cardinality user_id key, the non-empty partitions each hold
    # whole hot keys and clear 2x the median. Byte thresholds are
    # scaled down to fixture sizes (a real cluster keeps the 256 MB
    # defaults).
    s.conf.set("spark.sql.shuffle.partitions", "64")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1KB")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
    # Force the sort-merge path: AQE would otherwise (correctly)
    # broadcast the fixture-sized dimension, and skew split only
    # applies to SMJ/SHJ — the 100 TB premise is a dimension too big
    # to broadcast, q_salted_skew_join's exact setting.
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    return s


def q_aqe_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AQE skew-join demonstration (r6 verdict item 6) — the FIRST
    lever a 100 TB operator reaches for before hand-salting: let
    `OptimizeSkewedJoin` split hot reduce partitions at runtime.
    Same join, same aggregate, same oracle as q_salted_skew_join —
    the two queries are a deliberate A/B of the two skew strategies.

    Mechanics pinned by
    tests/test_plans.py::test_aqe_skew_join_splits_hot_partitions
    (EXECUTES the query — skew split is runtime-only): each oversize
    reduce partition of the events⋈customer shuffle is split into
    advisory-sized chunks at MAP-OUTPUT granularity, and the matching
    customer partition is duplicated per chunk — the effect salting
    buys manually, minus the S-fold dimension inflation and with
    sizes observed, not guessed. Two fixture-scale accommodations,
    each a non-issue at real scale: (a) the single-file fixture
    produces ONE map output, and a partition fed by one map block
    cannot split — `repartition(8)` gives the fact side the map
    parallelism any 100 TB table has natively; (b) byte thresholds
    scale down to fixture sizes (see _aqe_skew_session).

    When is manual salt still required? (a) non-AQE engines,
    (b) deterministic layouts AQE can't re-plan (bucketed /
    storage-partitioned joins), and (c) skewed AGGREGATIONS —
    OptimizeSkewedJoin only handles joins; q_salted_skew_agg's
    two-stage salt remains the only fix there."""
    s = _aqe_skew_session(spark)
    ev = load_table(s, sf_dir, "events").repartition(8)
    cust = load_table(s, sf_dir, "customer")
    dim = cust.select(F.col("c_custkey").alias("user_id"), "c_mktsegment")
    joined = ev.hint("merge").join(dim, "user_id")
    return (joined.groupBy("c_mktsegment")
            .agg(F.sum(F.col("value").cast(DEC)).cast("double")
                 .alias("total_value"),
                 F.count("*").alias("n_events"))
            .orderBy("c_mktsegment"))


#: Same result contract as the salted twin — shared oracle text.
_AQE_SKEW_SQL = _SALTED_JOIN_SQL


# ---------------------------------------------------------------------------
# Grouping sets (multi-level aggregate in one scan)
# ---------------------------------------------------------------------------

def q_orders_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts/revenue at (priority, status), (priority), and
    grand-total levels in ONE scan + one widened shuffle; grouping_id
    disambiguates the levels (both engines use the same bit order)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(f"""
        SELECT o_orderpriority, o_orderstatus,
               GROUPING_ID(o_orderpriority, o_orderstatus) AS grp,
               COUNT(*) AS n_orders,
               {dsum_sql('o_totalprice')} AS total_price
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), ())
        ORDER BY grp, o_orderpriority, o_orderstatus
    """)


_GROUPING_SETS_SQL = f"""
SELECT o_orderpriority, o_orderstatus,
       GROUPING_ID(o_orderpriority, o_orderstatus) AS grp,
       COUNT(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                        (o_orderpriority), ())
ORDER BY grp, o_orderpriority, o_orderstatus
"""


# ---------------------------------------------------------------------------
# Window distribution functions
# ---------------------------------------------------------------------------

def q_customer_balance_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist of customer balances within
    each market segment — the rank-distribution family missing from
    topk_per_group. Deterministic under the (acctbal, custkey) total
    order; one shuffle on the segment key."""
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_mktsegment", "c_custkey", "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cum_dist"),
    )


_BALANCE_RANKS_SQL = """
SELECT c_mktsegment, c_custkey, c_acctbal,
       ntile(4) OVER w AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cum_dist
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
"""


# ---------------------------------------------------------------------------
# Set operations: INTERSECT / EXCEPT
# ---------------------------------------------------------------------------

def _status_custkeys(spark, sf_dir, status):
    orders = load_table(spark, sf_dir, "orders")
    return (orders.filter(F.col("o_orderstatus") == status)
            .select(F.col("o_custkey").alias("custkey")))


def q_custkeys_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having both an 'F' and an 'O' order — INTERSECT
    (distinct semantics). Catalyst plans it as a left-semi over
    deduplicated sides; hashes partition on the full row."""
    f = _status_custkeys(spark, sf_dir, "F")
    o = _status_custkeys(spark, sf_dir, "O")
    return f.intersect(o).orderBy("custkey")


_INTERSECT_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
ORDER BY custkey
"""


def q_custkeys_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with an 'F' order but no 'O' order — EXCEPT
    (left-anti under the hood)."""
    f = _status_custkeys(spark, sf_dir, "F")
    o = _status_custkeys(spark, sf_dir, "O")
    return f.subtract(o).orderBy("custkey")


_EXCEPT_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
ORDER BY custkey
"""


# ---------------------------------------------------------------------------
# Multi-resolution rollup cascade (continuous-aggregate pattern)
# ---------------------------------------------------------------------------

def q_ohlc_day_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLCV bars computed FROM the hourly bars (not from raw
    events): open = first hour's open, close = last hour's close,
    extrema/volume re-aggregated. The second rollup's input is
    |keys| x 24 rows/day whatever the raw volume — the hypertable
    continuous-aggregate cascade. bar_ts is unique per key, so
    min_by/max_by are deterministic."""
    from .transforms import ohlc_bars
    hours = ohlc_bars(spark, sf_dir)
    return (
        hours.groupBy("user_id",
                      F.date_trunc("day", F.col("bar_ts")).alias("day_ts"))
        .agg(F.min_by("open", F.col("bar_ts")).alias("open"),
             F.max("high").alias("high"),
             F.min("low").alias("low"),
             F.max_by("close", F.col("bar_ts")).alias("close"),
             F.sum("volume").alias("volume"))
        .orderBy("user_id", "day_ts")
    )


_DAY_ROLLUP_SQL = """
WITH bars AS (
  SELECT user_id,
         date_trunc('hour', ts) AS bar_ts,
         first(value ORDER BY ts, event_id) AS open,
         MAX(value) AS high,
         MIN(value) AS low,
         last(value ORDER BY ts, event_id) AS close,
         COUNT(*) AS volume
  FROM events
  GROUP BY user_id, date_trunc('hour', ts))
SELECT user_id, CAST(date_trunc('day', bar_ts) AS TIMESTAMP) AS day_ts,
       first(open ORDER BY bar_ts) AS open,
       MAX(high) AS high, MIN(low) AS low,
       last(close ORDER BY bar_ts) AS close,
       CAST(SUM(volume) AS BIGINT) AS volume
FROM bars
GROUP BY user_id, date_trunc('day', bar_ts)
ORDER BY user_id, day_ts
"""


# ---------------------------------------------------------------------------
# Bucketed co-located join (zero-Exchange sort-merge)
# ---------------------------------------------------------------------------

_BUCKETS = 8


def bucketed_orders_lineitem(spark: SparkSession, sf_dir: str,
                             base_dir: str | None = None):
    """Write orders and lineitem bucketed+sorted on the join key and
    return the two catalog-backed DataFrames. Both sides hash into the
    same _BUCKETS distribution, so a sort-merge join needs no Exchange
    and no per-task Sort — the layout does the shuffle once at write
    time, every later join rides it free."""
    base = base_dir or os.path.join(tempfile.gettempdir(), "bdsm_bucketed")
    specs = [("orders", "o_orderkey"), ("lineitem", "l_orderkey")]
    for name, key in specs:
        tbl = f"bdsm_{name}_b"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (load_table(spark, sf_dir, name).write
         .bucketBy(_BUCKETS, key).sortBy(key)
         .option("path", os.path.join(base, tbl))
         .mode("overwrite").format("parquet")
         .saveAsTable(tbl))
    return spark.table("bdsm_orders_b"), spark.table("bdsm_lineitem_b")


def q_bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority gross revenue through the bucketed orders x
    lineitem join (MERGE hint pins sort-merge so the zero-Exchange
    plan is what actually runs; tests/test_plans.py asserts it)."""
    orders, li = bucketed_orders_lineitem(spark, sf_dir)
    joined = orders.hint("merge").join(
        li, orders.o_orderkey == li.l_orderkey)
    return (
        joined.groupBy("o_orderpriority")
        .agg(F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount")))
                   .cast(DEC)).cast("double").alias("revenue"),
             F.count("*").alias("n_lines"))
        .orderBy("o_orderpriority")
    )


_BUCKETED_JOIN_SQL = f"""
SELECT o_orderpriority,
       {dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue,
       COUNT(*) AS n_lines
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Partition-pruned storage layout
# ---------------------------------------------------------------------------

def partitioned_events(spark: SparkSession, sf_dir: str,
                       path: str | None = None) -> DataFrame:
    """Write events `partitionBy(event_type)` and read back — the
    directory layout IS the index: an event_type predicate prunes at
    file-listing time (PartitionFilters, asserted in test_plans).

    The write is STAGED like the zonemap store (a tag file records
    which sf_dir landed last): two queries read this layout and the
    full partitioned rewrite was re-running on every call — the
    store is a fixture of the layout, not part of the queries' work."""
    out = path or os.path.join(tempfile.gettempdir(), "bdsm_events_parted")
    tag = os.path.join(out, "_STAGED_FOR")
    staged = None
    if os.path.exists(tag):
        with open(tag) as fh:
            staged = fh.read()
    if staged != sf_dir:
        (load_table(spark, sf_dir, "events").write
         .partitionBy("event_type").mode("overwrite").parquet(out))
        with open(tag, "w") as fh:
            fh.write(sf_dir)
    return spark.read.parquet(out)


def q_partition_pruned_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event counts for ONE event_type over the partitioned
    layout — scans only that type's directory."""
    ev = partitioned_events(spark, sf_dir)
    return (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour_ts"))
        .agg(F.count("*").alias("n_events"),
             F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"))
        .orderBy("hour_ts")
    )


_PARTITION_PRUNED_SQL = f"""
SELECT date_trunc('hour', ts) AS hour_ts,
       COUNT(*) AS n_events, {dsum_sql('value')} AS total_value
FROM events WHERE event_type = 'purchase'
GROUP BY date_trunc('hour', ts)
ORDER BY hour_ts
"""


#: The event-type dimension: (event_type, category) — a tiny dim
#: whose CATEGORY filter only implies the fact's partition column
#: through the join, which is exactly the shape dynamic partition
#: pruning exists for.
_TYPE_DIM = (
    ("click", "engagement"), ("view", "engagement"),
    ("purchase", "conversion"), ("signup", "conversion"),
    ("error", "ops"),
)


def q_dpp_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type totals for 'engagement' events via a DIM JOIN over the
    partitionBy(event_type) layout — the dynamic-partition-pruning
    shape: the filter is on the dim's `category`, so no static
    predicate mentions the fact's partition column, yet the fact scan
    must still skip the non-engagement directories.

    Catalyst inserts a DynamicPruningExpression on the fact's
    PartitionFilters (asserted in test_plans): the broadcast of the
    filtered dim is REUSED as a runtime IN-set over event_type at
    file-listing time. At 100 TB this is the difference between
    scanning 2 of 5 partitions and scanning all of them — and it
    composes with any dim predicate, not just ones the author thought
    to duplicate onto the fact (cf. q_partition_pruned_agg, the
    static-literal case)."""
    ev = partitioned_events(spark, sf_dir)
    dim = spark.createDataFrame(
        list(_TYPE_DIM), "event_type string, category string")
    return (
        ev.join(F.broadcast(dim.filter(F.col("category") == "engagement")),
                "event_type")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_events"),
             F.sum(F.col("value").cast(DEC)).cast("double")
             .alias("total_value"))
        .orderBy("event_type")
    )


_DPP_SQL = f"""
WITH dim(event_type, category) AS (
  VALUES {", ".join(f"('{t}', '{c}')" for t, c in _TYPE_DIM)})
SELECT event_type, COUNT(*) AS n_events, {dsum_sql('value')} AS total_value
FROM events JOIN dim USING (event_type)
WHERE category = 'engagement'
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Z-order clustering key (multi-dimensional data skipping)
# ---------------------------------------------------------------------------

_Z_BITS = 16


def _interleave_expr(x: str, y: str) -> str:
    """Bit-interleave two {0..2^16-1} ints into one Morton (Z-order)
    code — identical integer shifts on both engines. x occupies even
    bits, y odd bits."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/Z-order clustering key over (user_id, event-hour): the
    layout key behind multi-dimensional data skipping (Delta
    OPTIMIZE ZORDER, Iceberg sort orders). Sorting a 100 TB table by
    this key makes parquet row-group min/max stats selective on BOTH
    dimensions at once, so either a user_id predicate or a time-range
    predicate prunes most of the file list — a plain (user_id, ts)
    sort only serves the leading column.

    The key itself is pure integer bit arithmetic inside codegen (no
    UDF); writing is `repartitionByRange(z).sortWithinPartitions(z)`.
    Output: each event with its z-code, ordered — verifying the exact
    interleave against the oracle's identical expression."""
    ev = load_table(spark, sf_dir, "events")
    dims = ev.select(
        "event_id",
        F.expr(f"CAST(user_id % {1 << _Z_BITS} AS BIGINT)").alias("xd"),
        F.expr(f"CAST((unix_timestamp(ts) div 3600) % {1 << _Z_BITS} "
               "AS BIGINT)").alias("yd"))
    return (dims.select(
        "event_id",
        F.expr(_interleave_expr("xd", "yd")).alias("z"))
        .orderBy("z", "event_id"))


_ZORDER_SQL = f"""
WITH dims AS (
  SELECT event_id,
         CAST(user_id % {1 << _Z_BITS} AS BIGINT) AS xd,
         -- date_trunc first: epoch() carries fractional seconds and a
         -- bare ::BIGINT cast ROUNDS, which can bump an hour boundary
         CAST((epoch(date_trunc('hour', ts))::BIGINT // 3600)
              % {1 << _Z_BITS} AS BIGINT) AS yd
  FROM events)
SELECT event_id, {_interleave_expr('xd', 'yd')} AS z
FROM dims ORDER BY z, event_id
"""


def q_incremental_ohlc_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance: the base 90% of
    events is the already-materialized hourly-bar table; the remaining
    10% (event_id % 10 = 0) arrives late. Bars are kept in MERGEABLE
    partial form — open/close carry their ordering key as a
    min/max struct(ts, event_id, value) — so maintenance is
    aggregate(DELTA ONLY) → keyed merge with the base. The base FACT
    rows are never rescanned; at 100 TB the delta agg touches only the
    late partitions and the merge is an equi-join on the bar key
    (restricted to delta keys in a real sink; emitted in full here so
    the oracle can certify merge ≡ full recompute over all events)."""
    ev = load_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"), F.col("value"))

    def bars(df: DataFrame) -> DataFrame:
        return (df.groupBy(
                    "user_id",
                    F.date_trunc("hour", F.col("ts")).alias("bar_ts"))
                .agg(F.min(key).alias("o"), F.max(key).alias("c"),
                     F.max("value").alias("high"),
                     F.min("value").alias("low"),
                     F.count("*").alias("volume")))

    base = bars(ev.filter(F.col("event_id") % 10 != 0)).alias("b")
    delta = bars(ev.filter(F.col("event_id") % 10 == 0)).alias("d")
    merged = base.join(delta, ["user_id", "bar_ts"], "full_outer")
    # least/greatest skip NULLs, so one-sided bars pass through.
    return (
        merged.select(
            "user_id", "bar_ts",
            F.least("b.o", "d.o").alias("o"),
            F.greatest("b.c", "d.c").alias("c"),
            F.greatest("b.high", "d.high").alias("high"),
            F.least("b.low", "d.low").alias("low"),
            (F.coalesce("b.volume", F.lit(0))
             + F.coalesce("d.volume", F.lit(0))).alias("volume"))
        .select("user_id", "bar_ts",
                F.col("o.value").alias("open"), "high", "low",
                F.col("c.value").alias("close"), "volume")
        .orderBy("user_id", "bar_ts")
    )


_INCREMENTAL_ROLLUP_SQL = """
SELECT user_id, date_trunc('hour', ts) AS bar_ts,
       first(value ORDER BY ts, event_id) AS open,
       MAX(value) AS high, MIN(value) AS low,
       last(value ORDER BY ts, event_id) AS close,
       COUNT(*) AS volume
FROM events
GROUP BY user_id, date_trunc('hour', ts)
ORDER BY user_id, bar_ts
"""


def compact_small_files(spark: SparkSession, src_dir: str, dst_dir: str,
                        target_rows_per_file: int) -> dict:
    """Small-files compaction — the table-maintenance job every
    long-lived parquet store schedules: rewrite a directory of many
    tiny files into ceil(rows / target) right-sized ones via ONE
    round-robin repartition (no key shuffle, no sort; pair with
    bucketed/zorder rewrites when layout matters). `maxRecordsPerFile`
    caps any residual imbalance. Returns an audit dict
    (rows, files_before, files_after) — the compaction log record.

    Scale notes: at 100 TB compaction runs per-partition (filtered
    rewrite of one `dt=.../` directory at a time), so the repartition
    width is bounded by a partition's row count, and readers swap to
    the compacted files atomically via directory rename/metastore
    pointer — the mechanism object stores provide; this function is
    the per-partition unit of that job."""
    import math

    df = spark.read.parquet(src_dir)
    n_rows = df.count()
    files_before = len([p for p in os.listdir(src_dir)
                        if p.endswith(".parquet")])
    n_files = max(1, math.ceil(n_rows / target_rows_per_file))
    (df.repartition(n_files)
     .write.mode("overwrite")
     .option("maxRecordsPerFile", target_rows_per_file)
     .parquet(dst_dir))
    files_after = len([p for p in os.listdir(dst_dir)
                       if p.endswith(".parquet")])
    return {"rows": n_rows, "files_before": files_before,
            "files_after": files_after}


_ZONEMAP_DIR = "/tmp/bdsm_zonemap"


def _zonemap_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage events range-clustered on ts: repartitionByRange +
    sortWithinPartitions, one parquet file per range — the layout
    whose per-file min/max stats ("zone maps") are disjoint.

    The stage path is FIXED (not sf-suffixed) because the oracle is a
    static SQL string reading the same files; a tag file records
    which sf_dir staged last and a different sf restages. Harness
    order (Spark query, then oracle) guarantees the oracle reads the
    files this query just audited."""
    tag = f"{_ZONEMAP_DIR}/_STAGED_FOR"
    staged = None
    if os.path.exists(tag):
        with open(tag) as fh:
            staged = fh.read()
    if staged != sf_dir:
        (load_table(spark, sf_dir, "events")
         .repartitionByRange(8, "ts", "event_id")
         .sortWithinPartitions("ts", "event_id")
         .write.mode("overwrite").parquet(_ZONEMAP_DIR))
        with open(tag, "w") as fh:
            fh.write(sf_dir)
    return _ZONEMAP_DIR


def q_file_zonemap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (per-file min/max) audit of a range-clustered layout —
    the data-skipping effectiveness metric: a time-range predicate
    can skip a file iff the file's [min_ts, max_ts] interval misses
    the predicate, so the fraction of files whose interval OVERLAPS
    its neighbor is exactly the fraction of wasted reads. Events are
    staged `repartitionByRange(ts).sortWithinPartitions(ts)` (the
    clustering a 100 TB time-series store maintains); the audit
    reads the files back and reports per-file row counts, the
    min/max ts zone map, and `overlaps_next` — all-false proves the
    layout skips perfectly. Run it against an unclustered landing
    zone and the same query quantifies how much a re-cluster buys.

    Scale shape: one file-grain aggregate (group on
    input_file_name(), map-side combined — file count rows, not data
    rows, reach the exchange) + a window over the file-stats frame
    (bytes-sized). The oracle reads the SAME staged files via
    read_parquet(filename=true), so both engines see identical
    physical metadata."""
    path = _zonemap_dir(spark, sf_dir)
    fname = F.regexp_extract(F.input_file_name(), r"[^/]+$", 0)
    stats = (spark.read.parquet(path)
             .groupBy(fname.alias("file"))
             .agg(F.count("*").alias("n_rows"),
                  F.min("ts").alias("min_ts"),
                  F.max("ts").alias("max_ts")))
    w = W.orderBy("min_ts", "file")
    return (stats.withColumn("next_min", F.lead("min_ts").over(w))
            .withColumn("overlaps_next",
                        F.coalesce(F.col("max_ts") >= F.col("next_min"),
                                   F.lit(False)))
            .select("file", "n_rows", "min_ts", "max_ts", "overlaps_next"))


# Every harness runs the Spark query before its oracle, so the staged
# files are always the ones this sf's query just audited.
_ZONEMAP_AUDIT_SQL = f"""
WITH stats AS (
  SELECT regexp_extract(filename, '[^/]+$') AS file,
         COUNT(*) AS n_rows, MIN(ts) AS min_ts, MAX(ts) AS max_ts
  FROM read_parquet('{_ZONEMAP_DIR}/*.parquet', filename=true)
  GROUP BY 1)
SELECT file, n_rows, min_ts, max_ts,
       COALESCE(max_ts >= lead(min_ts)
                OVER (ORDER BY min_ts, file), FALSE) AS overlaps_next
FROM stats
"""


QUERIES = {
    "zorder_key": (q_zorder_key, _ZORDER_SQL),
    "incremental_ohlc_rollup": (q_incremental_ohlc_rollup,
                                _INCREMENTAL_ROLLUP_SQL),
    "salted_skew_agg": (q_salted_skew_agg, _SALTED_SQL),
    "salted_skew_join": (q_salted_skew_join, _SALTED_JOIN_SQL),
    "aqe_skew_join": (q_aqe_skew_join, _AQE_SKEW_SQL),
    "file_zonemap_audit": (q_file_zonemap_audit, _ZONEMAP_AUDIT_SQL),
    "orders_grouping_sets": (q_orders_grouping_sets, _GROUPING_SETS_SQL),
    "customer_balance_ranks": (q_customer_balance_ranks, _BALANCE_RANKS_SQL),
    "custkeys_intersect": (q_custkeys_intersect, _INTERSECT_SQL),
    "custkeys_except": (q_custkeys_except, _EXCEPT_SQL),
    "ohlc_day_rollup": (q_ohlc_day_rollup, _DAY_ROLLUP_SQL),
    "bucketed_join_revenue": (q_bucketed_join_revenue, _BUCKETED_JOIN_SQL),
    "partition_pruned_agg": (q_partition_pruned_agg, _PARTITION_PRUNED_SQL),
    "dpp_join_prune": (q_dpp_join_prune, _DPP_SQL),
}
