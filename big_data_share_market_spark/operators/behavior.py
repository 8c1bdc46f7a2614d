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


QUERIES = {
    "funnel_conversion": (q_funnel_conversion, _FUNNEL_SQL),
    "cohort_retention": (q_cohort_retention, _COHORT_SQL),
}
