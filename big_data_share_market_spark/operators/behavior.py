"""Behavioral analytics over the event stream: funnel conversion and
cohort retention — the decision-support queries every event pipeline
grows once sessionization (operators/advanced.q_sessionize_events)
exists. Beyond-reference scope (the reference's only event analysis is
the row-local signal CASE, `flink_processor/flink_processor.py:105-109`).

Scale notes (100 TB): both queries reduce the event stream to per-user
scalars FIRST (min-ts-per-stage / first-seen-week) with one map-side-
combined aggregate on user_id, then operate on the user-grain frame —
the event-sized table crosses exactly one shuffle, and the analytical
joins happen at user (funnel) or week (cohort) grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

_STAGES = ("view", "click", "purchase")


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view -> click -> purchase funnel: a user converts a
    stage only if it happens strictly after their (earliest) previous
    stage. One aggregate computes min-ts per stage per user
    (conditional min, no join); the stage-ordering comparison is then
    row-local. Output: one row per stage with converted-user counts
    and the conversion rate vs the stage before."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(*[
        F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{s}")
        for s in _STAGES
    ])
    flags = per_user.select(
        F.col("t_view").isNotNull().cast("int").alias("s1"),
        (F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view")))
        .cast("int").alias("s2"),
        (F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view"))
         & (F.col("t_purchase") > F.col("t_click")))
        .cast("int").alias("s3"),
    )
    counts = flags.agg(F.sum("s1").alias("n_view"),
                       F.sum("s2").alias("n_click"),
                       F.sum("s3").alias("n_purchase"))
    stages = counts.select(F.explode(F.array(
        F.struct(F.lit(1).alias("stage"), F.lit("view").alias("event_type"),
                 F.col("n_view").alias("n_users"),
                 F.col("n_view").alias("prev_users")),
        F.struct(F.lit(2).alias("stage"), F.lit("click").alias("event_type"),
                 F.col("n_click").alias("n_users"),
                 F.col("n_view").alias("prev_users")),
        F.struct(F.lit(3).alias("stage"),
                 F.lit("purchase").alias("event_type"),
                 F.col("n_purchase").alias("n_users"),
                 F.col("n_click").alias("prev_users")),
    )).alias("s")).select("s.*")
    return stages.select(
        "stage", "event_type", "n_users",
        (F.col("n_users") / F.nullif(F.col("prev_users"), F.lit(0)))
        .alias("conversion_rate")).orderBy("stage")


_FUNNEL_SQL = """
WITH per_user AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id),
counts AS (
  SELECT CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_view,
         CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
         CAST(SUM(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                   AND t_purchase > t_click THEN 1 ELSE 0 END)
              AS BIGINT) AS n_purchase
  FROM per_user)
SELECT stage, event_type, n_users,
       CAST(n_users AS DOUBLE) / nullif(prev_users, 0) AS conversion_rate
FROM (
  SELECT 1 AS stage, 'view' AS event_type, n_view AS n_users,
         n_view AS prev_users FROM counts
  UNION ALL
  SELECT 2, 'click', n_click, n_view FROM counts
  UNION ALL
  SELECT 3, 'purchase', n_purchase, n_click FROM counts)
ORDER BY stage
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week;
    for each (cohort week, activity week) the retained-user count and
    the share of the cohort. First-seen is one aggregate on user_id;
    activity is a distinct (user, week) reduction; the join back is at
    user grain and the final group is |weeks|^2 rows."""
    ev = load_table(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts"))
    first_seen = (ev.groupBy("user_id")
                  .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week")))
    active = (ev.select("user_id", week.alias("active_week")).distinct())
    cohort_sizes = first_seen.groupBy("cohort_week").agg(
        F.count("*").alias("cohort_size"))
    retained = (
        active.join(first_seen, "user_id")
        .groupBy("cohort_week", "active_week")
        .agg(F.count("*").alias("n_retained"))
    )
    return (
        retained.join(F.broadcast(cohort_sizes), "cohort_week")
        .withColumn("week_number",
                    F.datediff("active_week", "cohort_week") / 7)
        .select("cohort_week", "active_week",
                F.col("week_number").cast("int").alias("week_number"),
                "n_retained", "cohort_size",
                (F.col("n_retained") / F.col("cohort_size"))
                .alias("retention_rate"))
        .orderBy("cohort_week", "active_week")
    )


_COHORT_SQL = """
WITH first_seen AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
  FROM events GROUP BY user_id),
active AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS active_week
  FROM events),
cohort_sizes AS (
  SELECT cohort_week, COUNT(*) AS cohort_size
  FROM first_seen GROUP BY cohort_week),
retained AS (
  SELECT cohort_week, active_week, COUNT(*) AS n_retained
  FROM active JOIN first_seen USING (user_id)
  GROUP BY cohort_week, active_week)
SELECT cohort_week, active_week,
       CAST(date_diff('day', cohort_week, active_week) / 7 AS INT)
         AS week_number,
       n_retained, cohort_size,
       CAST(n_retained AS DOUBLE) / cohort_size AS retention_rate
FROM retained JOIN cohort_sizes USING (cohort_week)
ORDER BY cohort_week, active_week
"""


def q_ab_test_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on an A/B split of the user base — the
    experimentation readout every event pipeline serves: variant =
    user_id parity (the deterministic stand-in for an assignment
    table), conversion = user produced ≥ 1 'purchase' event. Emits
    per-variant user counts and conversion rates plus the pooled-
    variance z statistic ``(pA − pB) / sqrt(p̂(1−p̂)(1/nA + 1/nB))``.

    Exactness: the statistic is a single fixed expression over four
    INTEGER counts — divisions, one multiply chain, one IEEE sqrt
    (exactly rounded) — so Spark and DuckDB produce bit-identical
    doubles with no reduction-order concerns.

    Scale shape: events reduce to per-user scalars in ONE map-side-
    combined aggregate (the event table's only shuffle), the variant
    rollup is a 2-row aggregate, and the z arithmetic is a 1-row
    crossJoin of two broadcast scalars. Nothing wider than user-grain
    ever moves."""
    ev = load_table(spark, sf_dir, "events")
    users = (ev.groupBy("user_id")
             .agg(F.max((F.col("event_type") == "purchase").cast("int"))
                  .alias("converted"))
             .withColumn("variant",
                         F.when(F.col("user_id") % 2 == 0, "A")
                         .otherwise("B")))
    per = (users.groupBy("variant")
           .agg(F.count("*").alias("n"),
                F.sum("converted").cast("long").alias("conv")))
    a = per.filter(F.col("variant") == "A").select(
        F.col("n").alias("n_a"), F.col("conv").alias("conv_a"))
    b = per.filter(F.col("variant") == "B").select(
        F.col("n").alias("n_b"), F.col("conv").alias("conv_b"))
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ca, cb = F.col("conv_a").cast("double"), F.col("conv_b").cast("double")
    p_a, p_b = ca / na, cb / nb
    pool = (ca + cb) / (na + nb)
    z = (p_a - p_b) / F.sqrt(pool * (1.0 - pool) * (1.0 / na + 1.0 / nb))
    return (a.crossJoin(b)
            .select("n_a", "conv_a", "n_b", "conv_b",
                    p_a.alias("rate_a"), p_b.alias("rate_b"),
                    z.alias("z")))


_AB_ZTEST_SQL = """
WITH users AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted,
         CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS variant
  FROM events GROUP BY user_id),
per AS (
  SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(converted) AS BIGINT) AS conv
  FROM users GROUP BY variant),
ab AS (
  SELECT (SELECT n FROM per WHERE variant = 'A') AS n_a,
         (SELECT conv FROM per WHERE variant = 'A') AS conv_a,
         (SELECT n FROM per WHERE variant = 'B') AS n_b,
         (SELECT conv FROM per WHERE variant = 'B') AS conv_b)
SELECT n_a, conv_a, n_b, conv_b,
       CAST(conv_a AS DOUBLE) / n_a AS rate_a,
       CAST(conv_b AS DOUBLE) / n_b AS rate_b,
       (CAST(conv_a AS DOUBLE) / n_a - CAST(conv_b AS DOUBLE) / n_b)
       / sqrt(((CAST(conv_a AS DOUBLE) + conv_b) / (CAST(n_a AS DOUBLE) + n_b))
              * (1.0 - (CAST(conv_a AS DOUBLE) + conv_b)
                       / (CAST(n_a AS DOUBLE) + n_b))
              * (1.0 / n_a + 1.0 / n_b)) AS z
FROM ab
"""


#: Attribution lookback: a purchase converts its user's most recent
#: click no older than this many seconds.
_ATTR_WINDOW_S = 3600


def q_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST-TOUCH attribution — the conversion-credit assignment every
    event pipeline runs: each purchase is attributed to the same
    user's most recent preceding click if it happened within the
    1-hour lookback; purchases with no qualifying click are organic.
    Emits every purchase with its attributed click (event_id + ts +
    latency) or NULL-free organic marker.

    Scale shape: ONE window pass — events sort per user by time and
    the carried last-click timestamp/id propagate via running MAX of
    a (ts, event_id) STRUCT over clicks only (struct max orders
    lexicographically, so the id rides along with its own max ts
    instead of needing a self-join); the attribution decision is then
    row-local. The as-of SELF-JOIN this replaces would shuffle events
    twice and cost a range join; the window form is one exchange, and
    at 100 TB it is the same plan with more partitions.

    Cross-engine note: attributed_event_id is emitted as -1 (not
    NULL) for organic conversions — BIGINT NULLs inside the driver's
    pandas compare become NaN floats on one side only; latency uses
    the same -1 sentinel."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = (W.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(W.unboundedPreceding, -1))
    click_struct = F.when(
        F.col("event_type") == "click",
        F.struct(F.col("ts").alias("c_ts"),
                 F.col("event_id").alias("c_id")))
    last_click = F.max(click_struct).over(w)
    # The attribution predicate must reference the MATERIALIZED lc
    # column, not the window expression: an expression reused after
    # the purchase filter would re-evaluate its window over the
    # filtered (clickless) rows and attribute nothing.
    attributed = (
        F.col("lc").isNotNull()
        & (F.unix_timestamp("ts") - F.unix_timestamp(F.col("lc")["c_ts"])
           <= _ATTR_WINDOW_S))
    return (
        ev.withColumn("lc", last_click)
        .filter(F.col("event_type") == "purchase")
        .select(
            "event_id", "user_id", "ts",
            attributed.alias("is_attributed"),
            F.when(attributed, F.col("lc")["c_id"]).otherwise(-1)
            .alias("attributed_event_id"),
            F.when(attributed,
                   F.unix_timestamp("ts")
                   - F.unix_timestamp(F.col("lc")["c_ts"]))
            .otherwise(-1).alias("latency_s"))
        .orderBy("event_id")
    )


_ATTRIBUTION_SQL = f"""
WITH marked AS (
  SELECT event_id, user_id, ts, event_type,
         MAX(CASE WHEN event_type = 'click'
                  THEN {{'ts': ts, 'event_id': event_id}} END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS lc
  FROM events),
p AS (
  SELECT event_id, user_id, ts, lc,
         lc IS NOT NULL
         AND date_diff('second', (lc).ts, ts) <= {_ATTR_WINDOW_S}
           AS is_attributed
  FROM marked WHERE event_type = 'purchase')
SELECT event_id, user_id, ts, is_attributed,
       CASE WHEN is_attributed THEN (lc).event_id ELSE -1 END
         AS attributed_event_id,
       CASE WHEN is_attributed
            THEN date_diff('second', (lc).ts, ts) ELSE -1 END
         AS latency_s
FROM p
ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# Event-type transition matrix (first-order Markov view of user flows)
# ---------------------------------------------------------------------------

def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix over each user's event stream:
    for every consecutive (event, next event) pair in (ts, event_id)
    order, the pair count and the row-normalized transition
    probability — the Markov-chain view product analytics builds for
    flow diagrams and next-action models (funnel_conversion fixes the
    path; this measures ALL observed paths).

    Exactness: counts are integers; p divides two engine-identical
    integers as DOUBLE. Scale shape: one hash exchange on user_id for
    the lag, map-side-combined groupBy on (from, to) — the matrix is
    |types|² rows, the per-from totals ride a bytes-sized window."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (ev.select("user_id", "event_type", "ts", "event_id")
             .withColumn("to_type", F.lead("event_type").over(w))
             .filter(F.col("to_type").isNotNull()))
    counts = (pairs.groupBy(F.col("event_type").alias("from_type"),
                            "to_type")
              .agg(F.count("*").alias("n")))
    tot = Window.partitionBy("from_type")
    return (counts
            .withColumn("p", F.col("n").cast("double")
                        / F.sum("n").over(tot).cast("double"))
            .select("from_type", "to_type", "n", "p")
            .orderBy("from_type", "to_type"))


_TRANSITIONS_SQL = """
WITH d AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events)
SELECT event_type AS from_type, to_type, COUNT(*) AS n,
       CAST(COUNT(*) AS DOUBLE)
         / CAST(SUM(COUNT(*)) OVER (PARTITION BY event_type) AS DOUBLE) AS p
FROM d WHERE to_type IS NOT NULL
GROUP BY event_type, to_type
ORDER BY from_type, to_type
"""


QUERIES = {
    "click_attribution": (q_click_attribution, _ATTRIBUTION_SQL),
    "funnel_conversion": (q_funnel_conversion, _FUNNEL_SQL),
    "cohort_retention": (q_cohort_retention, _COHORT_SQL),
    "ab_test_ztest": (q_ab_test_ztest, _AB_ZTEST_SQL),
    "event_transitions": (q_event_transitions, _TRANSITIONS_SQL),
}
