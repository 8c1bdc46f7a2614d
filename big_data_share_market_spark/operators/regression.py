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

from ..tables import keyed_repartition, load_table

#: theil_sen_fit series-length guard (r10 ADVICE): the kernel
#: allocates O(n²/2) pair indices per key, so an unbounded series
#: must degrade LOUDLY (this error names the bounded-work lane)
#: instead of OOMing an executor. 8192 rows ≈ 33.5 M pairs ≈ ~0.8 GB
#: of transient numpy per key — the upper edge of one healthy task.
#: Fixture series are ~66 rows (sf-invariant by design, TESTDATA.md).
_THEIL_SEN_MAX_SERIES = 8192


def _check_series_len(n: int, uid) -> None:
    if n > _THEIL_SEN_MAX_SERIES:
        raise ValueError(
            f"theil_sen_fit: key {uid} has a {n}-row series "
            f"(> {_THEIL_SEN_MAX_SERIES}); the exact O(n^2/2) kernel "
            "is bounded-series-only — use stats.q_theil_sen_capped "
            "(stride-capped) for unbounded series.")

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


def theil_sen_fit(e: DataFrame) -> DataFrame:
    """Median-of-pairwise-slopes over any (user_id, event_id, t, v)
    frame (t in integer micros) — split out so the estimator's
    robustness is testable against a crafted exact-recovery dataset
    with injected outliers (tests/test_sessions_and_trends.py), not
    just the noise fixture.

    Per-key VECTORIZED kernel (r10; guide §2.3 "shuffle keys, not
    payloads" taken to its limit): pairs never exist as ROWS anywhere.
    The events shuffle ONCE by key into a grouped Arrow kernel, which
    generates every (i, j | t_i < t_j) pair index map-side in numpy,
    computes the slopes with the exact IEEE expression the oracle
    uses ((v_j − v_i) / (Δt_micros_as_double / 3.6e9) — identical op
    sequence, bit-identical doubles), and selects the lower-median
    element under the deterministic (slope, i_id, j_id) tiebreak via
    one lexsort. History: the flat join formulation shuffled all
    O(n²/2-per-key) pair rows (322 M at sf10 — the repo's one-box
    cliff, SCALING.md addendum 15); the r7-r9 two-phase bucketed
    form fixed the bytes but still ran the pair JOIN twice (measured
    87-98 s at sf10). Here the pair lattice is a numpy index
    expression inside one task: per-key memory is O(n²/2) doubles
    with series length n bounded by design (keys scale with data
    volume, not series length — TESTDATA.md); for genuinely
    unbounded series the stride-capped `stats.q_theil_sen_capped`
    remains the production screen. Keys with no qualifying pair
    (singletons / all-tied timestamps) emit nothing, exactly like
    the join formulation."""
    import numpy as np
    import pandas as pd

    def _key_median(uid, t, eid, v):
        """Exact lower-median slope for ONE key's sorted series; None
        when no strict pair exists (singleton / all-tied)."""
        _check_series_len(len(t), uid)
        i, j = np.triu_indices(len(t), k=1)
        keep = t[i] < t[j]  # strict: tied timestamps form no pair
        i, j = i[keep], j[keep]
        n_pairs = i.size
        if n_pairs == 0:
            return None
        # The same scalar op sequence as the SQL text on both engines:
        # double Δv divided by (double Δt_micros / 3600000000.0).
        slope = (v[j] - v[i]) / ((t[j] - t[i]).astype("float64")
                                 / 3600000000.0)
        target = (n_pairs + 1) // 2
        ordind = np.lexsort((eid[j], eid[i], slope))
        return (uid, n_pairs, float(slope[ordind[target - 1]]))

    def kern(batches):
        # Partition-wide pass (the _apply_ewm discipline: one shuffle,
        # no per-group Arrow round-trip — measured 1500 tiny grouped
        # batches cost more than the pair math itself). The partition
        # is buffered whole: per-key state is the full series, which
        # is bounded by design; partitions hold many keys.
        parts = [b for b in batches if len(b)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        uid = pdf["user_id"].to_numpy("int64")
        t = pdf["t"].to_numpy("int64")
        eid = pdf["event_id"].to_numpy("int64")
        v = pdf["v"].to_numpy("float64")
        order = np.lexsort((eid, t, uid))
        uid, t, eid, v = uid[order], t[order], eid[order], v[order]
        cuts = np.flatnonzero(uid[1:] != uid[:-1]) + 1
        rows = []
        for lo, hi in zip(np.concatenate(([0], cuts)),
                          np.concatenate((cuts, [len(uid)]))):
            r = _key_median(uid[lo], t[lo:hi], eid[lo:hi], v[lo:hi])
            if r is not None:
                rows.append(r)
        if rows:
            yield pd.DataFrame(rows, columns=["user_id", "n_pairs",
                                              "slope_per_hour"])

    return (keyed_repartition(e, "user_id")
            .mapInPandas(kern, "user_id bigint, n_pairs bigint, "
                               "slope_per_hour double")
            # Sort-sampler barrier (see dedup.q_ngram_jaccard_dedup):
            # without it the presentation orderBy's range sampler
            # re-executes the kernel pass. The exchange moves only the
            # keys-sized output.
            .repartition("user_id")
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
