"""Distributed model fitting: multiple linear regression by the
one-pass normal-equations method.

Beyond the reference (its only model-ish math is the pandas indicator
family) — this is the classic "OLS in one aggregation pass" shape for
a 100 TB engine: a single scan reduces the data to the 3x3 moment
matrix X'X and vector X'y (constant-size aggregation state), and the
solve is scalar arithmetic on one row. Compare beta_vs_market
(finance.py), the single-feature special case.

Model: price_cents ~ quantity + discount_cents over lineitem. (The
synthetic fixture draws price independently of quantity/discount, so
the fitted R² is ~0 — what is under test is the distributed-fitting
machinery and its cross-engine exactness, not the fit.) Features and
target are quantized to EXACT integers (prices/discounts have 2
decimal digits, quantities are integral), so every moment is an
exact integer sum — no float summation order anywhere — and the
closed-form Cramer solve runs the SAME double expression text in
Spark (`F.expr`) and DuckDB, giving bit-identical coefficients.

R² uses the algebraic identity SSE = Σy² − (b0·Σy + b1·Σx1y + b2·Σx2y),
so no second data pass is needed — the whole fit is ONE scan + a
single-row shuffle at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

#: Exact-integer sum capacity: Σy² terms reach ~1e14 per row — far
#: past int64 at corpus row counts — so moments accumulate in
#: DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), both exact.
_DEC0 = "decimal(38,0)"

#: The scalar solve, written once as SQL text and evaluated by BOTH
#: engines over identical double inputs (n, s1, s2, s11, s12, s22,
#: sy, s1y, s2y, syy): Cramer's rule on the 3x3 normal equations,
#: then the no-second-pass R².
_SOLVE = {
    "det": ("(n * (s11 * s22 - s12 * s12)"
            " - s1 * (s1 * s22 - s12 * s2)"
            " + s2 * (s1 * s12 - s11 * s2))"),
    "det0": ("(sy * (s11 * s22 - s12 * s12)"
             " - s1 * (s1y * s22 - s12 * s2y)"
             " + s2 * (s1y * s12 - s11 * s2y))"),
    "det1": ("(n * (s1y * s22 - s12 * s2y)"
             " - sy * (s1 * s22 - s12 * s2)"
             " + s2 * (s1 * s2y - s1y * s2))"),
    "det2": ("(n * (s11 * s2y - s1y * s12)"
             " - s1 * (s1 * s2y - s1y * s2)"
             " + sy * (s1 * s12 - s11 * s2))"),
}

_BETAS = {
    "b0": f"({_SOLVE['det0']} / {_SOLVE['det']})",
    "b1": f"({_SOLVE['det1']} / {_SOLVE['det']})",
    "b2": f"({_SOLVE['det2']} / {_SOLVE['det']})",
}

_FIT_EXPRS = {
    "n_rows": "CAST(n AS BIGINT)",
    "b_intercept": _BETAS["b0"],
    "b_quantity": _BETAS["b1"],
    "b_discount": _BETAS["b2"],
    "r2": (f"(1.0 - (syy - ({_BETAS['b0']} * sy + {_BETAS['b1']} * s1y"
           f" + {_BETAS['b2']} * s2y)) / (syy - sy * sy / n))"),
}


def q_ols_price_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit price_cents = b0 + b1*quantity + b2*discount_cents by
    one-pass normal equations over lineitem; returns a single row
    (n_rows, b_intercept, b_quantity, b_discount, r2).

    Plan: scan → exact-integer moment aggregate (constant state) →
    scalar Cramer solve on the one-row result. Nothing the driver
    touches, nothing quadratic, one shuffle of ONE row."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.round("l_quantity").cast("long").alias("x1"),
        F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
    )
    return ols_fit(li)


def ols_fit(df: DataFrame) -> DataFrame:
    """One-pass normal-equations fit over any (x1, x2, y) integer
    frame — split out so the Cramer formulas are testable against a
    crafted exact-recovery dataset (tests/test_invariants.py), not
    just the noise fixture."""
    def _s(expr):
        return F.sum(expr.cast(_DEC0)).cast("double")

    x1, x2, y = F.col("x1"), F.col("x2"), F.col("y")
    mo = df.agg(
        F.count("*").cast("double").alias("n"),
        _s(x1).alias("s1"), _s(x2).alias("s2"),
        _s(x1 * x1).alias("s11"), _s(x1 * x2).alias("s12"),
        _s(x2 * x2).alias("s22"),
        _s(y).alias("sy"), _s(x1 * y).alias("s1y"),
        _s(x2 * y).alias("s2y"), _s(y * y).alias("syy"),
    )
    return mo.select(
        *[F.expr(e).alias(name) for name, e in _FIT_EXPRS.items()])


_OLS_SQL = f"""
WITH q AS (
  SELECT CAST(round(l_quantity) AS BIGINT) AS x1,
         CAST(round(l_discount * 100) AS BIGINT) AS x2,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS y
  FROM lineitem),
mo AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(x1 AS HUGEINT)) AS DOUBLE) AS s1,
         CAST(SUM(CAST(x2 AS HUGEINT)) AS DOUBLE) AS s2,
         CAST(SUM(CAST(x1 AS HUGEINT) * x1) AS DOUBLE) AS s11,
         CAST(SUM(CAST(x1 AS HUGEINT) * x2) AS DOUBLE) AS s12,
         CAST(SUM(CAST(x2 AS HUGEINT) * x2) AS DOUBLE) AS s22,
         CAST(SUM(CAST(y AS HUGEINT)) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x1 AS HUGEINT) * y) AS DOUBLE) AS s1y,
         CAST(SUM(CAST(x2 AS HUGEINT) * y) AS DOUBLE) AS s2y,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS DOUBLE) AS syy
  FROM q)
SELECT {", ".join(f"{e} AS {name}" for name, e in _FIT_EXPRS.items())}
FROM mo
"""


def q_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per user: the MEDIAN of all pairwise
    slopes (value_j − value_i) / Δt_hours over each user's event
    series — the estimator that shrugs off the outliers an OLS slope
    chases (up to ~29% contamination). The robust twin of
    `beta_vs_market` / `ols_price_model` for data-quality trend
    screens.

    Plan: one self-equi-join on user_id (ts_i < ts_j) fans each key
    out to its O(n²/2) pairs — bounded, because series length per key
    is bounded by the fixture design (keys grow with data volume, not
    series length; see SCALING.md). One window over (user_id) ranks
    slopes and picks the lower median (percentile_disc semantics) with
    a deterministic (slope, i, j) tiebreak. For unbounded series, the
    stride-capped twin `stats.q_theil_sen_capped` (built on
    `stats.stride_sampled_pairs`) bounds pair generation per key.

    Cross-engine exactness: slope = double subtraction + one division
    over identical operands (Δvalue double, Δt exact integer micros
    cast to double), the same expression text in both engines — every
    slope is bit-identical, and the discrete median SELECTS one of
    them, so no rounding is needed anywhere."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id",
        # ts is TIMESTAMP_NTZ; the session runs UTC, so the cast to
        # TIMESTAMP (required by unix_micros) is an exact relabel and
        # matches DuckDB's epoch_us over the naive timestamp.
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("t"),
        F.col("value").alias("v"))
    return theil_sen_fit(e)


#: Two-phase median bucketization: unit-width slope buckets clamped
#: to ±512 per hour (the fixture's slopes live well inside). Bucket
#: id is monotone in slope, so global rank = strictly-lower-bucket
#: count + in-bucket rank — EXACT, with the degenerate all-one-bucket
#: case falling back to the full per-key sort for that key only.
_TS_BMAX = 512


def theil_sen_fit(e: DataFrame) -> DataFrame:
    """Median-of-pairwise-slopes over any (user_id, event_id, t, v)
    frame (t in integer micros) — split out so the estimator's
    robustness is testable against a crafted exact-recovery dataset
    with injected outliers (tests/test_sessions_and_trends.py), not
    just the noise fixture.

    TWO-PHASE exact median, because the naive formulation (shuffle
    every pair, sort within key, row_number) must move and sort ALL
    O(n²/2-per-key) pairs — measured as the repo's only one-box cliff
    at sf10 (322 M pair rows thrash an 8-48 g heap; SCALING.md
    addendum 15). Phase 1 re-aggregates the pair stream MAP-SIDE into
    per-(key, unit-width-slope-bucket) counts — the shuffle carries
    keys×buckets rows, not pairs — and a buckets-sized window locates
    each key's median bucket and the rank remaining inside it.
    Phase 2 recomputes the same pair join (CPU is cheap; bytes are
    not) but keeps ONLY pairs landing in their key's median bucket —
    a broadcast semi-filter applied before any exchange — and sorts
    those few per key to pick the exact element. Same deterministic
    (slope, i_id, j_id) tiebreak; the oracle stays the flat global
    formulation, so the equivalence is value-verified per row. The
    median-bucket relation is keys-sized (broadcast here; at 10⁹ keys
    make it a shuffle join on (user_id, bkt))."""
    from pyspark.sql import Window

    def pairs_frame():
        a, b = e.alias("a"), e.alias("b")
        return (a.join(b, (F.col("a.user_id") == F.col("b.user_id"))
                       & (F.col("a.t") < F.col("b.t")))
                .select(
            F.col("a.user_id").alias("user_id"),
            F.col("a.event_id").alias("i_id"),
            F.col("b.event_id").alias("j_id"),
            ((F.col("b.v") - F.col("a.v"))
             / ((F.col("b.t") - F.col("a.t")).cast("double")
                / 3600000000.0)).alias("slope"))
                .withColumn("bkt", F.least(
                    F.greatest(F.floor("slope"), F.lit(-_TS_BMAX)),
                    F.lit(_TS_BMAX - 1))))

    wk = Window.partitionBy("user_id")
    hist = (pairs_frame().groupBy("user_id", "bkt")
            .agg(F.count("*").alias("c"))
            .withColumn("cum", F.sum("c").over(
                wk.orderBy("bkt").rowsBetween(
                    Window.unboundedPreceding, 0)))
            .withColumn("n_pairs", F.sum("c").over(wk))
            .withColumn("target", F.expr("(n_pairs + 1) DIV 2")))
    med_bucket = (hist.where((F.col("cum") >= F.col("target"))
                             & (F.col("cum") - F.col("c")
                                < F.col("target")))
                  .select("user_id", "bkt",
                          (F.col("cum") - F.col("c")).alias("below"),
                          "n_pairs", "target"))
    in_bucket = pairs_frame().join(F.broadcast(med_bucket),
                                   ["user_id", "bkt"])
    ranked = in_bucket.withColumn("rn", F.row_number().over(
        wk.orderBy("slope", "i_id", "j_id")))
    return (ranked.where(F.col("rn") == F.col("target") - F.col("below"))
            .select("user_id", "n_pairs",
                    F.col("slope").alias("slope_per_hour"))
            .orderBy("user_id"))


_THEIL_SEN_SQL = """
WITH e AS (
  SELECT user_id, event_id,
         epoch_us(ts) AS t, value AS v
  FROM events),
pairs AS (
  SELECT a.user_id, a.event_id AS i_id, b.event_id AS j_id,
         (b.v - a.v) / (CAST(b.t - a.t AS DOUBLE) / 3600000000.0) AS slope
  FROM e a JOIN e b
    ON a.user_id = b.user_id AND a.t < b.t),
ranked AS (
  SELECT user_id, slope,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY slope, i_id, j_id) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_pairs
  FROM pairs)
SELECT user_id, n_pairs, slope AS slope_per_hour
FROM ranked WHERE rn = (n_pairs + 1) // 2
ORDER BY user_id
"""


QUERIES = {
    "ols_price_model": (q_ols_price_model, _OLS_SQL),
    "theil_sen_trend": (q_theil_sen_trend, _THEIL_SEN_SQL),
}
