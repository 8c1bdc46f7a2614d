"""Distribution-drift and trend-significance testing: the statistical
QA layer a training-data pipeline runs next to its counters.

Beyond the reference (its dashboard eyeballs trends; nothing tests
them) — three classical nonparametric tests, each re-expressed as
exact distributed algebra with a full DuckDB oracle:

- `mann_kendall_trend`: IS there a monotone trend? The significance
  test next to `theil_sen_trend`'s slope estimate (the two are the
  standard pairing): S = Σ sign(v_j − v_i) over ordered pairs is an
  exact INTEGER, the tie-corrected variance is integer arithmetic
  over tie-group sizes, and the z-score is one sqrt+division with
  identical expression text in both engines.
- `ks_two_sample`: have two cohorts drifted apart? The
  Kolmogorov–Smirnov D statistic between two event types' value
  distributions, computed with an EXACT INTEGER numerator
  (max |cum_a·n_b − cum_b·n_a|, divided once at the end) so the max
  is over integers, never floats. The ECDF prefix sums are
  distributed two-level (fixed-width value buckets: per-bucket
  partials + a buckets-sized offset window + in-bucket windows) —
  the token_budget_mixture prefix-sum shape, so no global
  single-partition window at any scale; the oracle is the flat
  global-window formulation.
- `cusum_changepoint`: WHEN did the level shift? Per-key CUSUM
  S_i = Σ_{j≤i}(v_j − mean) via one decimal-exact cumulative window,
  reporting the max |S_i| and its position (the classic changepoint
  locator), deterministic argmax tiebreak to the earliest position.

Scale notes: mann_kendall shares theil_sen's bounded pair fanout
(series length per key is bounded by fixture design; cap pairs for
unbounded series). ks_two_sample shuffles counts per distinct value
(≤ one row per distinct value per bucket); cusum is one hash exchange
on the key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions import DEC
from ..tables import load_table


def q_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test per user (S, tie-corrected Var, z).

    S sums sign(v_j − v_i) over all (ts, event_id)-ordered pairs —
    exact integer. Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18.0
    with t the tie-group sizes of v per key. z applies the standard
    continuity correction ((S∓1)/sqrt(Var)); IEEE sqrt and one
    division, correctly rounded in both engines."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("t"),
        F.col("value").alias("v"))
    a, b = e.alias("a"), e.alias("b")
    ordered = ((F.col("a.t") < F.col("b.t"))
               | ((F.col("a.t") == F.col("b.t"))
                  & (F.col("a.event_id") < F.col("b.event_id"))))
    s = (a.join(b, (F.col("a.user_id") == F.col("b.user_id")) & ordered)
         .groupBy(F.col("a.user_id").alias("user_id"))
         .agg(F.sum(F.signum(F.col("b.v") - F.col("a.v")).cast("long"))
              .alias("s_stat")))
    n = e.groupBy("user_id").agg(F.count("*").alias("n"))
    ties = (e.groupBy("user_id", "v").agg(F.count("*").alias("tg"))
            .groupBy("user_id")
            .agg(F.sum(F.expr("tg * (tg - 1) * (2 * tg + 5)"))
                 .alias("tie_term")))
    out = (n.join(s, "user_id").join(ties, "user_id")
           # CAST ... AS DOUBLE on the integer numerator: Spark parses
           # the literal 18.0 as DECIMAL(3,1) (see verify-skill note),
           # which would make var_s a decimal and drift the division.
           .withColumn("var_s", F.expr(
               "CAST(n * (n - 1) * (2 * n + 5) - tie_term AS DOUBLE)"
               " / CAST(18.0 AS DOUBLE)"))
           .withColumn("z", F.expr(
               "CASE WHEN s_stat > 0 THEN (s_stat - 1) / sqrt(var_s) "
               "WHEN s_stat < 0 THEN (s_stat + 1) / sqrt(var_s) "
               "ELSE 0.0 END")))
    return out.select("user_id", "n", "s_stat", "var_s", "z").orderBy(
        "user_id")


_MK_SQL = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS t, value AS v FROM events),
s AS (
  SELECT a.user_id,
         CAST(SUM(CAST(sign(b.v - a.v) AS BIGINT)) AS BIGINT) AS s_stat
  FROM e a JOIN e b
    ON a.user_id = b.user_id
   AND (a.t < b.t OR (a.t = b.t AND a.event_id < b.event_id))
  GROUP BY a.user_id),
n AS (SELECT user_id, COUNT(*) AS n FROM e GROUP BY user_id),
ties AS (
  SELECT user_id,
         CAST(SUM(tg * (tg - 1) * (2 * tg + 5)) AS BIGINT) AS tie_term
  FROM (SELECT user_id, v, COUNT(*) AS tg FROM e GROUP BY user_id, v)
  GROUP BY user_id)
SELECT n.user_id, n.n, s.s_stat,
       CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_term AS DOUBLE)
         / CAST(18.0 AS DOUBLE) AS var_s,
       CASE WHEN s.s_stat > 0 THEN (s.s_stat - 1) / sqrt(
              CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_term
                   AS DOUBLE) / CAST(18.0 AS DOUBLE))
            WHEN s.s_stat < 0 THEN (s.s_stat + 1) / sqrt(
              CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_term
                   AS DOUBLE) / CAST(18.0 AS DOUBLE))
            ELSE 0.0 END AS z
FROM n JOIN s ON n.user_id = s.user_id
JOIN ties ON n.user_id = ties.user_id
ORDER BY n.user_id
"""


_KS_A, _KS_B = "click", "purchase"
#: Fixed-width value buckets for the distributed ECDF prefix sum —
#: width 16 over the fixture's [0, ~500] value range gives ~31
#: buckets; the two-level shape is invariant to the choice.
_KS_W = 16.0


def _two_sample_cum(spark: SparkSession, sf_dir: str):
    """Shared distributed two-sample ECDF machinery: per distinct
    value counts (ca, cb) with INCLUSIVE cumulative counts computed
    two-level (fixed-width value buckets: in-bucket window + a
    buckets-sized offset window broadcast back) — the
    token_budget_mixture prefix-sum shape, so no global
    single-partition window at any scale. Returns (per-value frame
    with ca/cb/cum_a/cum_b, one-row totals frame)."""
    e = (load_table(spark, sf_dir, "events")
         .where(F.col("event_type").isin(_KS_A, _KS_B))
         .select("value", (F.col("event_type") == _KS_A).alias("is_a")))
    per_val = (e.groupBy("value")
               .agg(F.sum(F.when(F.col("is_a"), 1).otherwise(0))
                    .alias("ca"),
                    F.sum(F.when(~F.col("is_a"), 1).otherwise(0))
                    .alias("cb"))
               .withColumn("bucket", F.floor(F.col("value") / _KS_W)))
    win = (Window.partitionBy("bucket").orderBy("value")
           .rowsBetween(Window.unboundedPreceding, 0))
    in_bucket = (per_val
                 .withColumn("ia", F.sum("ca").over(win))
                 .withColumn("ib", F.sum("cb").over(win)))
    per_bucket = (per_val.groupBy("bucket")
                  .agg(F.sum("ca").alias("ba"), F.sum("cb").alias("bb")))
    bwin = (Window.orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (per_bucket
               .withColumn("oa", F.coalesce(F.sum("ba").over(bwin),
                                            F.lit(0)))
               .withColumn("ob", F.coalesce(F.sum("bb").over(bwin),
                                            F.lit(0)))
               .select("bucket", "oa", "ob"))
    cum = (in_bucket.join(F.broadcast(offsets), "bucket")
           .select("value", "ca", "cb",
                   (F.col("oa") + F.col("ia")).alias("cum_a"),
                   (F.col("ob") + F.col("ib")).alias("cum_b")))
    tot = e.agg(F.sum(F.when(F.col("is_a"), 1).otherwise(0)).alias("n_a"),
                F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).alias("n_b"))
    return cum, tot


def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov D between the `_KS_A` ('click')
    and `_KS_B` ('purchase') event values, exact-integer numerator.
    Distributed ECDF via `_two_sample_cum` → max over INTEGER
    |cum_a·n_b − cum_b·n_a|; the single division happens on the
    one-row result."""
    cum, tot = _two_sample_cum(spark, sf_dir)
    return (cum.crossJoin(F.broadcast(tot))
            .agg(F.max("n_a").alias("n_a"), F.max("n_b").alias("n_b"),
                 F.max(F.abs(F.col("cum_a") * F.col("n_b")
                             - F.col("cum_b") * F.col("n_a")))
                 .alias("d_num"))
            .withColumn("d_stat", F.expr(
                "CAST(d_num AS DOUBLE) / (CAST(n_a AS DOUBLE)"
                " * CAST(n_b AS DOUBLE))")))


_KS_SQL = f"""
WITH e AS (
  SELECT value, event_type = '{_KS_A}' AS is_a FROM events
  WHERE event_type IN ('{_KS_A}', '{_KS_B}')),
per_val AS (
  SELECT value,
         SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS cb
  FROM e GROUP BY value),
cum AS (
  SELECT SUM(ca) OVER (ORDER BY value
                       ROWS UNBOUNDED PRECEDING) AS cum_a,
         SUM(cb) OVER (ORDER BY value
                       ROWS UNBOUNDED PRECEDING) AS cum_b
  FROM per_val),
tot AS (
  SELECT SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS n_b
  FROM e)
SELECT CAST(t.n_a AS BIGINT) AS n_a, CAST(t.n_b AS BIGINT) AS n_b,
       CAST(MAX(ABS(c.cum_a * t.n_b - c.cum_b * t.n_a)) AS BIGINT)
         AS d_num,
       CAST(MAX(ABS(c.cum_a * t.n_b - c.cum_b * t.n_a)) AS DOUBLE)
         / (CAST(t.n_a AS DOUBLE) * CAST(t.n_b AS DOUBLE)) AS d_stat
FROM cum c, tot t
GROUP BY t.n_a, t.n_b
"""


_VAR_U = ("CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)"
          " / CAST(12 AS DOUBLE)"
          " * (CAST(n_a + n_b + 1 AS DOUBLE)"
          "    - CAST(tie_sum AS DOUBLE)"
          "      / (CAST(n_a + n_b AS DOUBLE)"
          "         * CAST(n_a + n_b - 1 AS DOUBLE)))")
_Z_U = ("CAST(u2_a - n_a * n_b AS DOUBLE)"
        " / (CAST(2 AS DOUBLE) * sqrt(var_u))")


def q_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U (Wilcoxon rank-sum) between the same two
    cohorts as `ks_two_sample` — the LOCATION test next to KS's shape
    test (the standard two-sample pairing). Rank sums stay EXACT
    integers by working in doubled units: a tie group of size c
    starting after `start` rows has doubled-average-rank
    2·start + c + 1, so 2·R_A and 2·U_A are integers even with ties.
    The tie-corrected normal approximation
    z = (2U − n_a·n_b·? … written as (2U_A − n_a n_b)/(2√Var) — one
    sqrt + one division over identical operands in both engines.
    Shares `_two_sample_cum`'s two-level distributed prefix sums."""
    cum, tot = _two_sample_cum(spark, sf_dir)
    per = cum.select(
        "ca", "cb",
        (F.col("ca") + F.col("cb")).alias("c"),
        (F.col("cum_a") + F.col("cum_b")
         - F.col("ca") - F.col("cb")).alias("start"))
    agg = per.agg(
        F.sum(F.col("ca") * (2 * F.col("start") + F.col("c") + 1))
        .alias("ra2"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .alias("tie_sum"))
    out = (agg.crossJoin(F.broadcast(tot))
           .withColumn("u2_a", F.expr("ra2 - n_a * (n_a + 1)"))
           .withColumn("var_u", F.expr(_VAR_U))
           .withColumn("z", F.expr(_Z_U)))
    return out.select("n_a", "n_b", "u2_a",
                      (F.col("u2_a").cast("double")
                       / F.lit(2.0)).alias("u_a"),
                      "var_u", "z")


_MWU_SQL = f"""
WITH e AS (
  SELECT value, event_type = '{_KS_A}' AS is_a FROM events
  WHERE event_type IN ('{_KS_A}', '{_KS_B}')),
per_val AS (
  SELECT value,
         SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS cb
  FROM e GROUP BY value),
cum AS (
  SELECT ca, cb, ca + cb AS c,
         SUM(ca + cb) OVER (ORDER BY value
                            ROWS UNBOUNDED PRECEDING)
           - (ca + cb) AS start
  FROM per_val),
agg AS (
  SELECT CAST(SUM(ca * (2 * start + c + 1)) AS BIGINT) AS ra2,
         CAST(SUM(c * c * c - c) AS BIGINT) AS tie_sum
  FROM cum),
tot AS (
  SELECT CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
         CAST(SUM(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
  FROM e),
j AS (
  SELECT t.n_a, t.n_b,
         CAST(a.ra2 - t.n_a * (t.n_a + 1) AS BIGINT) AS u2_a,
         a.tie_sum
  FROM agg a, tot t),
k AS (
  SELECT n_a, n_b, u2_a,
         {_VAR_U} AS var_u
  FROM j)
SELECT n_a, n_b, u2_a,
       CAST(u2_a AS DOUBLE) / 2.0 AS u_a,
       var_u,
       {_Z_U} AS z
FROM k
"""



def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key CUSUM changepoint locator: S_i = Σ_{j≤i}(v_j − mean)
    over the (ts, event_id)-ordered series; report n, max |S_i| and
    the position (event_id, rank) where it occurs — the classic
    level-shift detector. The cumulative value sum is decimal-exact;
    S_i = cum_i − i·mean is the SAME double expression text in both
    engines; argmax ties break to the earliest position."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", F.col("value").alias("v"))
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    wk = Window.partitionBy("user_id")
    cur = (e.withColumn("cum", F.sum(F.col("v").cast(DEC)).over(w)
                        .cast("double"))
           .withColumn("i", F.row_number().over(
               Window.partitionBy("user_id").orderBy("ts", "event_id")))
           .withColumn("n", F.count("*").over(wk))
           .withColumn("mean", F.expr(
               "CAST(SUM(CAST(v AS DECIMAL(25,6))) OVER "
               "(PARTITION BY user_id) AS DOUBLE) / n"))
           .withColumn("s_i", F.expr("cum - i * mean")))
    ranked = cur.withColumn("rnk", F.row_number().over(
        Window.partitionBy("user_id").orderBy(F.abs("s_i").desc(), "i")))
    return (ranked.where(F.col("rnk") == 1)
            .select("user_id", "n",
                    F.abs("s_i").alias("max_abs_cusum"),
                    F.col("i").alias("argmax_rank"),
                    F.col("event_id").alias("argmax_event_id"))
            .orderBy("user_id"))


_CUSUM_SQL = """
WITH e AS (
  SELECT user_id, event_id, ts, value AS v FROM events),
cur AS (
  SELECT user_id, event_id,
         CAST(SUM(CAST(v AS DECIMAL(25,6))) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS i,
         COUNT(*) OVER (PARTITION BY user_id) AS n,
         CAST(SUM(CAST(v AS DECIMAL(25,6))) OVER (
           PARTITION BY user_id) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY user_id) AS mean
  FROM e),
s AS (
  SELECT user_id, event_id, n, i, cum - i * mean AS s_i FROM cur),
r AS (
  SELECT user_id, CAST(n AS BIGINT) AS n, ABS(s_i) AS max_abs_cusum,
         CAST(i AS INTEGER) AS argmax_rank, event_id AS argmax_event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ABS(s_i) DESC, i) AS rnk
  FROM s)
SELECT user_id, n, max_abs_cusum, argmax_rank, argmax_event_id
FROM r WHERE rnk = 1
ORDER BY user_id
"""


QUERIES = {
    "mann_kendall_trend": (q_mann_kendall_trend, _MK_SQL),
    "ks_two_sample": (q_ks_two_sample, _KS_SQL),
    "mannwhitney_u": (q_mannwhitney_u, _MWU_SQL),
    "cusum_changepoint": (q_cusum_changepoint, _CUSUM_SQL),
}
