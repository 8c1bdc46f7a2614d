"""The ewm family (SURVEY §2.E1, E4, E5, E6): EMA, TSI, MACD, ADX.

pandas `ewm(span/alpha, adjust=False).mean()` is the one reference
computation with no Spark SQL builtin (SURVEY §4). The scalable
expression: hash-shuffle on the key, sort within partitions, then ONE
`mapInPandas` pass per partition with accumulator state carried across
Arrow batches (see `_apply_ewm`). Partition-parallel across executors,
O(rows) in Python, and — unlike `groupBy(key).applyInPandas` — free of
per-group pandas overhead, which dominates when keys are small and
numerous (measured 5× faster at sf0.1's 1 500 keys; the gap widens
with key count, which is exactly the 100 TB regime).

Exactness contract (what the DuckDB oracle replays):

* recurrence `acc := acc + alpha * (x - acc)`, seeded with the first
  valid value — algebraically pandas' adjust=False form
  `y_t = (1-alpha)*y_{t-1} + alpha*x_t` and bit-identical to DuckDB's
  `list_reduce(l, (acc, x) -> acc + alpha*(x - acc))` (verified over
  the full sf0.01 series: 0 bit mismatches);
* NULL inputs are skipped, the accumulator carries through (mirrors
  `list_filter(l, v -> v IS NOT NULL)` in the oracle); positions
  before the first valid input are NULL;
* rolling means inside ADX go through Spark Window + decimal-exact
  sums, NOT the kernel, so they too match the oracle bit-for-bit;
* zero denominators yield NULL on both engines (pandas would give
  ±inf; deviation documented — the reference never guards it).

alpha literals are written as the same division expression on both
sides (`2.0/(span+1.0)`, `1.0/window`) so the doubles agree.
"""

from __future__ import annotations

import math
from collections.abc import Iterable

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions import DEC
from ..tables import keyed_repartition, load_table
from .transforms import BARS_CTE, bar_window, ohlc_bars

_ORACLE_KEY_WINDOW = (
    "(PARTITION BY user_id ORDER BY ts, event_id "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
_ORACLE_BAR_WINDOW = (
    "(PARTITION BY user_id ORDER BY bar_ts "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")


def ewm_mean(values: Iterable[float], alpha: float) -> np.ndarray:
    """pandas ewm(adjust=False).mean() with skip-NaN-carry semantics.

    Plain Python loop over float64 — IEEE ops in recurrence order, so
    the result is bit-identical to the oracle's list_reduce. O(n) per
    key; keys are independent, so this parallelizes across executors.
    """
    out = np.empty(len(values), dtype=np.float64)
    acc = math.nan
    started = False
    for i, x in enumerate(values):
        if x is None or (isinstance(x, float) and math.isnan(x)):
            out[i] = acc if started else math.nan
            continue
        if not started:
            acc = float(x)
            started = True
        else:
            acc = acc + alpha * (float(x) - acc)
        out[i] = acc
    return out


def _ewm_sql(expr: str, alpha_expr: str, over: str) -> str:
    """DuckDB mirror of :func:`ewm_mean` (NULL-skipping reduce)."""
    return (
        f"CASE WHEN COUNT({expr}) OVER {over} > 0 THEN "
        f"list_reduce(list_filter(list({expr}) OVER {over}, v -> v IS NOT NULL), "
        f"(acc, v) -> acc + ({alpha_expr}) * (v - acc)) END")


def _apply_ewm(df: DataFrame, order_cols: list[str], value_cols: dict[str, tuple[str, float]],
               key_col: str = "user_id", assume_sorted: bool = False) -> DataFrame:
    """Streaming-partition kernel: add one ewm column per entry of
    value_cols {out_name: (in_name, alpha)}.

    Physical shape: ONE hash shuffle on the key + in-partition sort,
    then a single `mapInPandas` pass over each partition — accumulator
    state carries across Arrow batches, resetting on key change. This
    beats `groupBy(key).applyInPandas` by ~5× here: with thousands of
    small keys the per-group pandas-object overhead dominates, while a
    partition-wide pass costs O(rows) regardless of key count. At
    100 TB the same plan holds: one exchange, Python touches each row
    once, no driver involvement.

    Set `assume_sorted=True` when the input is already hash-partitioned
    by the key and sorted by (key, *order_cols) within partitions — true
    after a Window stage over the same key/order, or after a previous
    `_apply_ewm` (mapInPandas preserves in-partition row order) — to
    skip the redundant exchange+sort entirely.

    NaN outputs are surfaced as NULL (nanvl) to match the oracle.

    Kernel vectorization (r7): the EMA update is element-wise, so per
    Arrow batch the contiguous key segments are laid out as a
    (segments × max_len) NaN-padded matrix and the recurrence steps
    once per IN-SERIES POSITION across all keys simultaneously —
    max_len vector steps instead of one Python iteration per row.
    Every element still sees the exact scalar op sequence
    (`acc + α(x−acc)`, seed-at-first-valid, NaN keeps the
    accumulator), so outputs are BIT-IDENTICAL to :func:`ewm_mean` —
    property-tested in tests/test_pandas_parity.py with random NaN
    patterns and batch splits. Series length is ~constant while key
    count scales with data (TESTDATA.md), so batches stay wide and
    the step count flat: the ewm family's former 100 TB CPU cliff
    (r6 verdict item 4) drops to ~1/10th the Python-interpreter work.
    """
    out_fields = ", ".join(f"{name} double" for name in value_cols)
    in_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    schema = f"{in_schema}, {out_fields}"

    if assume_sorted:
        staged = df
    else:
        # Width scales with input bytes (r11, guide §5): identical
        # plan at fixture scale, bounded partition bytes at 100 TB.
        staged = keyed_repartition(df, key_col).sortWithinPartitions(
            key_col, *order_cols)
    res = staged.mapInPandas(_ewm_kernel(list(value_cols.items()), key_col),
                             schema=schema)
    for out_name in value_cols:
        res = res.withColumn(out_name, F.nanvl(F.col(out_name), F.lit(None)))
    return res


#: Driver-side A/B switch (tools/ab_ewm_kernel.py): when True, kernel
#: FACTORIES capture a force-scalar flag into the closure they ship to
#: the workers, routing every batch through the scalar reference loop.
#: A closure-captured value is the only reliable transport — workers
#: re-import this module, so a driver-side monkeypatch never reaches
#: them. Bit-identical output either way (the property tests pin it);
#: this only selects which CPU path computes it.
FORCE_SCALAR_KERNEL = False


def _dense_layout_ok(n: int, n_segs: int, max_len: int) -> bool:
    """Guard for the across-key matrix layout: a (segments × max_len)
    NaN-padded matrix is O(segments · longest-segment) cells, which
    under SKEWED per-key lengths (one 50k-row key + 10k singleton
    keys) blows up quadratically where the scalar loop is O(n). Allow
    the dense path when padding waste is bounded (≤4× the real rows)
    or the matrix is small outright; otherwise the kernels fall back
    to the exact same scalar recurrence (bit-identical either way —
    the fallback IS the reference loop the property tests pin
    against)."""
    cells = n_segs * max_len
    return cells <= max(4 * n, 1 << 16)


def _ewm_scalar(keys, xs, alpha: float, carry_key, acc: float,
                started: bool):
    """Reference row loop (the pre-r7 kernel body): one EMA pass over
    a batch with NaN-skip-carry semantics. Returns (out, acc,
    started)."""
    res = np.empty(len(xs), dtype=np.float64)
    prev_key = carry_key
    for i in range(len(xs)):
        if keys[i] != prev_key:
            acc, started = math.nan, False
            prev_key = keys[i]
        x = xs[i]
        if math.isnan(x):
            res[i] = acc if started else math.nan
        elif not started:
            acc, started = x, True
            res[i] = acc
        else:
            acc = acc + alpha * (x - acc)
            res[i] = acc
    return res, acc, started


def _ewm_kernel(specs: list[tuple[str, tuple[str, float]]], key_col: str):
    """Arrow kernel for :func:`_apply_ewm` (see its docstring for the
    across-key vectorization argument; skewed-segment batches take
    the scalar fallback, see :func:`_dense_layout_ok`). Module-level
    factory so tests/test_pandas_parity.py can drive it directly with
    synthetic batch splits and assert bit-equality against
    :func:`ewm_mean`."""
    force_scalar = FORCE_SCALAR_KERNEL  # captured at plan-build time

    def kernel(batches):
        carry_key = None
        carry: dict[str, tuple[float, bool]] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keys = pdf[key_col].to_numpy()
            n = len(pdf)
            starts = np.concatenate(
                ([0], np.nonzero(keys[1:] != keys[:-1])[0] + 1))
            seg_lens = np.concatenate((starts[1:], [n])) - starts
            n_segs = len(starts)
            max_len = int(seg_lens.max())
            continues = keys[0] == carry_key
            outs = {}
            if force_scalar or not _dense_layout_ok(n, n_segs, max_len):
                for out_name, (in_name, alpha) in specs:
                    xs = pdf[in_name].to_numpy(dtype=np.float64,
                                               na_value=np.nan)
                    acc, started = carry.get(out_name, (math.nan, False))
                    res, acc, started = _ewm_scalar(
                        keys, xs, alpha, carry_key, acc, started)
                    carry[out_name] = (acc, started)
                    outs[out_name] = res
                carry_key = keys[-1]
                yield pdf.assign(**outs)
                continue
            seg_of_row = np.repeat(np.arange(n_segs), seg_lens)
            pos_of_row = np.arange(n) - starts[seg_of_row]
            for out_name, (in_name, alpha) in specs:
                xs = pdf[in_name].to_numpy(dtype=np.float64, na_value=np.nan)
                xmat = np.full((n_segs, max_len), np.nan)
                xmat[seg_of_row, pos_of_row] = xs
                rmat = np.empty_like(xmat)
                acc = np.full(n_segs, np.nan)
                started = np.zeros(n_segs, dtype=bool)
                if continues:
                    acc[0], started[0] = carry.get(out_name,
                                                   (math.nan, False))
                for t in range(max_len):
                    x = xmat[:, t]
                    valid = ~np.isnan(x)
                    upd = acc + alpha * (x - acc)
                    acc = np.where(valid, np.where(started, upd, x), acc)
                    started = started | valid
                    rmat[:, t] = acc
                carry[out_name] = (float(acc[-1]), bool(started[-1]))
                outs[out_name] = rmat[seg_of_row, pos_of_row]
            carry_key = keys[-1]
            yield pdf.assign(**outs)

    return kernel


def _series(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (load_table(spark, sf_dir, "events")
            .select("user_id", "event_id", "ts", F.col("value").alias("close")))


# ---------------------------------------------------------------------------
# E1 — EMA(5), EMA(15)
# ---------------------------------------------------------------------------

def q_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`streamlit_app/streamlit_app.py:165-166` (spans 5 and 15,
    called at :346-347)."""
    s = _series(spark, sf_dir)
    return _apply_ewm(
        s, ["ts", "event_id"],
        {"ema_5": ("close", 2.0 / (5.0 + 1.0)),
         "ema_15": ("close", 2.0 / (15.0 + 1.0))})


_EMA_SQL = f"""
SELECT user_id, event_id, ts, value AS close,
       {_ewm_sql('value', '2.0/(5.0+1.0)', _ORACLE_KEY_WINDOW)} AS ema_5,
       {_ewm_sql('value', '2.0/(15.0+1.0)', _ORACLE_KEY_WINDOW)} AS ema_15
FROM events
"""


# ---------------------------------------------------------------------------
# E5 — MACD(12, 26, 9)
# ---------------------------------------------------------------------------

def q_macd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`streamlit_app/streamlit_app.py:186-191`: macd = ema12 − ema26;
    signal = ewm9 of the macd series (chained ewm — second kernel pass
    over the derived column)."""
    s = _series(spark, sf_dir)
    s = _apply_ewm(
        s, ["ts", "event_id"],
        {"ema_12": ("close", 2.0 / (12.0 + 1.0)),
         "ema_26": ("close", 2.0 / (26.0 + 1.0))})
    s = s.withColumn("macd", F.col("ema_12") - F.col("ema_26"))
    # The projection preserves the first kernel's (key, ts) layout —
    # chain the second kernel with no second shuffle.
    s = _apply_ewm(s, ["ts", "event_id"],
                   {"macd_signal": ("macd", 2.0 / (9.0 + 1.0))},
                   assume_sorted=True)
    return s.select("user_id", "event_id", "ts", "close", "macd", "macd_signal")


_MACD_SQL = f"""
WITH m AS (
  SELECT user_id, event_id, ts, value AS close,
         {_ewm_sql('value', '2.0/(12.0+1.0)', _ORACLE_KEY_WINDOW)}
           - {_ewm_sql('value', '2.0/(26.0+1.0)', _ORACLE_KEY_WINDOW)} AS macd
  FROM events)
SELECT user_id, event_id, ts, close, macd,
       {_ewm_sql('macd', '2.0/(9.0+1.0)', _ORACLE_KEY_WINDOW)} AS macd_signal
FROM m
"""


# ---------------------------------------------------------------------------
# E4 — TSI(25, 13)
# ---------------------------------------------------------------------------

def q_tsi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`streamlit_app/streamlit_app.py:178-184`: double-smoothed diff
    over double-smoothed |diff|, ×100. diff is NULL on each key's first
    row; the kernel skips it (seed = second row), as does the oracle's
    list_filter."""
    s = _series(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    s = s.withColumn("d", F.col("close") - F.lag("close").over(w))
    s = s.withColumn("ad", F.abs(F.col("d")))
    # The lag Window already hash-partitioned by user_id and sorted by
    # (user_id, ts, event_id); both kernels ride that layout shuffle-free.
    s = _apply_ewm(s, ["ts", "event_id"],
                   {"d_e25": ("d", 2.0 / (25.0 + 1.0)),
                    "ad_e25": ("ad", 2.0 / (25.0 + 1.0))},
                   assume_sorted=True)
    s = _apply_ewm(s, ["ts", "event_id"],
                   {"d_e25_13": ("d_e25", 2.0 / (13.0 + 1.0)),
                    "ad_e25_13": ("ad_e25", 2.0 / (13.0 + 1.0))},
                   assume_sorted=True)
    return (
        s.withColumn(
            "tsi",
            F.lit(100.0) * (F.col("d_e25_13")
                            / F.nullif(F.col("ad_e25_13"), F.lit(0.0))))
        .select("user_id", "event_id", "ts", "close", "tsi")
    )


_TSI_SQL = f"""
WITH d AS (
  SELECT user_id, event_id, ts, value AS close,
         value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS d,
         abs(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS ad
  FROM events),
e1 AS (
  SELECT user_id, event_id, ts, close,
         {_ewm_sql('d', '2.0/(25.0+1.0)', _ORACLE_KEY_WINDOW)} AS d_e25,
         {_ewm_sql('ad', '2.0/(25.0+1.0)', _ORACLE_KEY_WINDOW)} AS ad_e25
  FROM d)
SELECT user_id, event_id, ts, close,
       100.0 * ({_ewm_sql('d_e25', '2.0/(13.0+1.0)', _ORACLE_KEY_WINDOW)}
                / nullif({_ewm_sql('ad_e25', '2.0/(13.0+1.0)', _ORACLE_KEY_WINDOW)}, 0.0)) AS tsi
FROM e1
"""


# ---------------------------------------------------------------------------
# E6 — ADX(14), reference's non-standard variant
# ---------------------------------------------------------------------------

def q_adx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`streamlit_app/streamlit_app.py:193-204`, replicated AS WRITTEN
    including the non-standard −DM mask (`low.diff()` with
    `(low_diff > high_diff) & (low_diff > 0)`; standard ADX uses
    −low.diff() — SURVEY §2.E6 documents the deviation).

    Hybrid plan: diffs/TR/ATR/DX-rolling are Window expressions
    (decimal-exact); the three ewm recurrences run in the grouped
    kernel. Two kernel passes, both on the already-shuffled key.
    """
    bars = ohlc_bars(spark, sf_dir)
    w = bar_window()
    bars = (
        bars.withColumn("high_diff", F.col("high") - F.lag("high").over(w))
        .withColumn("low_diff", F.col("low") - F.lag("low").over(w))
        .withColumn("prev_close", F.lag("close").over(w))
    )
    bars = (
        bars.withColumn(
            "plus_dm",
            F.when((F.col("high_diff") > F.col("low_diff"))
                   & (F.col("high_diff") > 0), F.col("high_diff"))
            .otherwise(F.lit(0.0)))
        .withColumn(
            "minus_dm",
            F.when((F.col("low_diff") > F.col("high_diff"))
                   & (F.col("low_diff") > 0), F.col("low_diff"))
            .otherwise(F.lit(0.0)))
        # pandas row-wise max skips NaN: first row TR = high - low.
        .withColumn(
            "tr",
            F.greatest(
                F.col("high") - F.col("low"),
                F.coalesce(F.abs(F.col("high") - F.col("prev_close")),
                           F.lit(float("-inf"))),
                F.coalesce(F.abs(F.col("low") - F.col("prev_close")),
                           F.lit(float("-inf")))))
    )
    w14 = w.rowsBetween(-13, 0)
    atr = F.when(F.count("tr").over(w14) == 14,
                 F.sum(F.col("tr").cast(DEC)).over(w14).cast("double")
                 / F.count("tr").over(w14))
    bars = bars.withColumn("atr", atr)
    alpha = 1.0 / 14.0
    # The atr Window stage leaves data hash(user_id)-partitioned and
    # (user_id, bar_ts)-sorted — kernel 1 needs no shuffle. Project to
    # the 6 columns the kernel and the rest of the query actually use
    # BEFORE the Python boundary (guide §4.1: mapInPandas ships every
    # column it is given, both directions — high/low/diffs/tr/volume
    # would cross twice for nothing); a select changes neither the
    # partitioning nor the in-partition order assume_sorted relies on.
    bars = bars.select("user_id", "bar_ts", "close",
                       "plus_dm", "minus_dm", "atr")
    bars = _apply_ewm(bars, ["bar_ts"],
                      {"pdm_e": ("plus_dm", alpha), "mdm_e": ("minus_dm", alpha)},
                      assume_sorted=True)
    bars = (
        bars.withColumn("plus_di",
                        F.lit(100.0) * (F.col("pdm_e")
                                        / F.nullif(F.col("atr"), F.lit(0.0))))
        .withColumn("minus_di",
                    F.lit(100.0) * (F.col("mdm_e")
                                    / F.nullif(F.col("atr"), F.lit(0.0))))
        .withColumn(
            "dx_base",
            F.lit(100.0) * F.abs(F.col("plus_di") - F.col("minus_di"))
            / F.nullif(F.col("plus_di") + F.col("minus_di"), F.lit(0.0)))
    )
    w14b = bar_window().rowsBetween(-13, 0)
    dx = F.when(F.count("dx_base").over(w14b) == 14,
                F.sum(F.col("dx_base").cast(DEC)).over(w14b).cast("double")
                / F.count("dx_base").over(w14b))
    bars = bars.withColumn("dx", dx)
    # The dx rolling Window re-established the sorted layout. Same
    # §4.1 projection before kernel 2: only (key, order, dx, close)
    # cross the boundary.
    bars = bars.select("user_id", "bar_ts", "close", "dx")
    bars = _apply_ewm(bars, ["bar_ts"], {"adx": ("dx", alpha)},
                      assume_sorted=True)
    return bars.select("user_id", "bar_ts", "close", "adx")


_ADX_SQL = f"""
WITH {BARS_CTE},
diffs AS (
  SELECT user_id, bar_ts, close, high, low,
         high - lag(high) OVER w AS high_diff,
         low - lag(low) OVER w AS low_diff,
         lag(close) OVER w AS prev_close
  FROM bars
  WINDOW w AS (PARTITION BY user_id ORDER BY bar_ts)),
dm AS (
  SELECT user_id, bar_ts, close,
         CASE WHEN high_diff > low_diff AND high_diff > 0
              THEN high_diff ELSE 0.0 END AS plus_dm,
         CASE WHEN low_diff > high_diff AND low_diff > 0
              THEN low_diff ELSE 0.0 END AS minus_dm,
         greatest(high - low,
                  COALESCE(abs(high - prev_close), '-infinity'::DOUBLE),
                  COALESCE(abs(low - prev_close), '-infinity'::DOUBLE)) AS tr
  FROM diffs),
smoothed AS (
  SELECT user_id, bar_ts, close,
         CASE WHEN COUNT(tr) OVER w14 = 14 THEN
           CAST(SUM(CAST(tr AS DECIMAL(25,6))) OVER w14 AS DOUBLE)
             / COUNT(tr) OVER w14 END AS atr,
         {_ewm_sql('plus_dm', '1.0/14.0', _ORACLE_BAR_WINDOW)} AS pdm_e,
         {_ewm_sql('minus_dm', '1.0/14.0', _ORACLE_BAR_WINDOW)} AS mdm_e
  FROM dm
  WINDOW w14 AS (PARTITION BY user_id ORDER BY bar_ts
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)),
di AS (
  SELECT user_id, bar_ts, close,
         100.0 * (pdm_e / nullif(atr, 0.0)) AS plus_di,
         100.0 * (mdm_e / nullif(atr, 0.0)) AS minus_di
  FROM smoothed),
dxb AS (
  SELECT user_id, bar_ts, close,
         100.0 * abs(plus_di - minus_di)
           / nullif(plus_di + minus_di, 0.0) AS dx_base
  FROM di),
dxr AS (
  SELECT user_id, bar_ts, close,
         CASE WHEN COUNT(dx_base) OVER w14 = 14 THEN
           CAST(SUM(CAST(dx_base AS DECIMAL(25,6))) OVER w14 AS DOUBLE)
             / COUNT(dx_base) OVER w14 END AS dx
  FROM dxb
  WINDOW w14 AS (PARTITION BY user_id ORDER BY bar_ts
                 ROWS BETWEEN 13 PRECEDING AND CURRENT ROW))
SELECT user_id, bar_ts, close,
       {_ewm_sql('dx', '1.0/14.0', _ORACLE_BAR_WINDOW)} AS adx
FROM dxr
"""


# ---------------------------------------------------------------------------
# Holt linear-trend forecast (coupled two-state recurrence)
# ---------------------------------------------------------------------------

#: Holt smoothing constants (level, trend) and forecast horizons.
_HOLT_A = 0.2
_HOLT_B = 0.1
_HOLT_H = (1, 2, 3)


def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key Holt linear-trend state + h-step-ahead forecasts
    (Holt 1957 / Hyndman & Athanasopoulos FPP, public method):
    ``l_t = α·y_t + (1−α)(l_{t−1}+b_{t−1});
    b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}``, init l₁=y₁, b₁=0;
    ``ŷ_{T+h} = l_T + h·b_T``. The coupled two-state recurrence the
    single-accumulator ewm kernel cannot express — so it gets its own
    partition-wide Arrow kernel with (level, trend) carried jointly
    across batches.

    Cross-engine exactness: the kernel executes the recurrence with
    the EXACT operation order mirrored in the oracle's recursive CTE
    (`l2 = α*y + (1−α)*(l+b)` then `β*(l2−l) + (1−β)*b`); sequential
    per-key evaluation is deterministic in both engines, so five
    hundred chained steps stay bit-identical. (A DuckDB 1.0.0
    list_reduce STRUCT-accumulator fold silently mis-evaluates
    cross-referencing fields — hence the recursive-CTE oracle, not a
    lambda fold.)

    Scale shape: one hash exchange on the key + in-partition sort,
    one Python pass over every row (same contract as _apply_ewm).
    The last-row rank (rn) and per-key count (n_obs) are computed
    BEFORE the kernel on the same window layout (the
    dashboard_snapshot pattern): mapInPandas erases known output
    partitioning, so a post-kernel Window would force a second hash
    exchange — pre-computing them keeps the whole query on ONE
    exchange, and the post-kernel last-row pick is a row-local
    rn = n_obs filter. Output is |keys| rows."""
    from pyspark.sql.window import Window

    s = (_series(spark, sf_dir)
         .filter(F.col("close").isNotNull()))
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    staged = (s.withColumn("rn", F.row_number().over(wo))
              .withColumn("n_obs", F.count("*").over(
                  Window.partitionBy("user_id"))))
    in_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in staged.schema.fields)
    schema = f"{in_schema}, holt_level double, holt_trend double"
    a, b_const = _HOLT_A, _HOLT_B

    def kernel(batches):
        carry_key = None
        lvl = trend = math.nan
        started = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keys = pdf["user_id"].to_numpy()
            ys = pdf["close"].to_numpy(dtype=np.float64)
            out_l = np.empty(len(pdf), dtype=np.float64)
            out_b = np.empty(len(pdf), dtype=np.float64)
            for i in range(len(pdf)):
                if keys[i] != carry_key:
                    started = False
                    carry_key = keys[i]
                y = ys[i]
                if not started:
                    lvl, trend, started = y, 0.0, True
                else:
                    l2 = a * y + (1.0 - a) * (lvl + trend)
                    trend = b_const * (l2 - lvl) + (1.0 - b_const) * trend
                    lvl = l2
                out_l[i] = lvl
                out_b[i] = trend
            yield pdf.assign(holt_level=out_l, holt_trend=out_b)

    fitted = staged.mapInPandas(kernel, schema=schema)
    last = (fitted
            .filter(F.col("rn") == F.col("n_obs"))
            .select("user_id", "n_obs",
                    F.col("holt_level").alias("level"),
                    F.col("holt_trend").alias("trend")))
    return last.select(
        "user_id", "n_obs", "level", "trend",
        *[(F.col("level") + F.lit(float(h)) * F.col("trend"))
          .alias(f"fc_{h}") for h in _HOLT_H]).orderBy("user_id")


def _holt_sql() -> str:
    a = f"CAST({_HOLT_A} AS DOUBLE)"
    b = f"CAST({_HOLT_B} AS DOUBLE)"
    fc = ", ".join(
        f"level + CAST({float(h)} AS DOUBLE) * trend AS fc_{h}"
        for h in _HOLT_H)
    return f"""
WITH RECURSIVE s AS (
  SELECT user_id, CAST(value AS DOUBLE) AS y,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE value IS NOT NULL),
h AS (
  SELECT user_id, rn, y AS l, CAST(0 AS DOUBLE) AS b
  FROM s WHERE rn = 1
  UNION ALL
  SELECT q.user_id, q.rn, q.l2 AS l,
         {b}*(q.l2 - q.l) + (1.0-{b})*q.b AS b
  FROM (
    SELECT s.user_id, s.rn, h.l, h.b,
           {a}*s.y + (1.0-{a})*(h.l + h.b) AS l2
    FROM h JOIN s ON s.user_id = h.user_id AND s.rn = h.rn + 1) q),
fin AS (
  SELECT user_id, MAX(rn) AS n_obs FROM h GROUP BY user_id)
SELECT fin.user_id, fin.n_obs, h.l AS level, h.b AS trend, {fc}
FROM fin JOIN h ON h.user_id = fin.user_id AND h.rn = fin.n_obs
ORDER BY fin.user_id
"""


# ---------------------------------------------------------------------------
# Holt-Winters additive seasonal (triple exponential smoothing)
# ---------------------------------------------------------------------------

#: Smoothing constants (level, trend, seasonal), season length, and
#: forecast horizons (h <= _HW_M so no seasonal wraparound logic).
_HW_A = 0.3
_HW_B = 0.1
_HW_G = 0.2
_HW_M = 4


def q_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters ADDITIVE seasonal smoothing per key (triple
    exponential; Winters 1960 / Hyndman & Athanasopoulos FPP):
    ``l_t = α(y_t − s_{t−m}) + (1−α)(l_{t−1}+b_{t−1});
    b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1};
    s_t = γ(y_t − l_t) + (1−γ)s_{t−m}``, m = 4, classical
    deterministic init at t = m (l = sequential mean of the first m
    observations, b = 0, s_i = y_i − l). Output: one row per key with
    the final (level, trend) and ŷ_{T+h} = l + h·b + s_{T+h−m} for
    h = 1..3.

    Kernel: the m-vector seasonal state rides with (level, trend) in
    the same partition-wide pass as the Holt kernel; the key's final
    summary row is emitted on key change (keys are contiguous after
    the sort), so output is |keys| rows with no window stage at all.

    Oracle: per-key recursive CTE whose rows carry the seasonal
    DOUBLE[] and rotate it with list_append(seas[2:m], s_new) —
    verified bit-identical to the sequential Python recurrence (the
    struct-accumulator fold bug does not affect recursive CTEs).
    Both sides compute the init mean as a SEQUENTIAL fold over the
    first m values (a parallel SUM could round differently)."""
    s = (_series(spark, sf_dir)
         .filter(F.col("close").isNotNull()))
    schema = ("user_id bigint, n_obs bigint, level double, "
              "trend double, " + ", ".join(
                  f"fc_{h} double" for h in (1, 2, 3)))
    a, bc, g, m = _HW_A, _HW_B, _HW_G, _HW_M

    def kernel(batches):
        cur_key = None
        buf: list[float] = []
        lvl = trend = math.nan
        seas: list[float] = []
        n = 0
        started = False

        def summary_row():
            if n < m:
                return None
            fcs = {f"fc_{h}": lvl + float(h) * trend + seas[h - 1]
                   for h in (1, 2, 3)}
            return {"user_id": cur_key, "n_obs": n,
                    "level": lvl, "trend": trend, **fcs}

        for pdf in batches:
            if len(pdf) == 0:
                continue
            keys = pdf["user_id"].to_numpy()
            ys = pdf["close"].to_numpy(dtype=np.float64)
            rows = []
            for i in range(len(pdf)):
                if keys[i] != cur_key:
                    row = summary_row()
                    if row is not None:
                        rows.append(row)
                    cur_key = keys[i]
                    buf, seas = [], []
                    lvl, trend, n, started = math.nan, math.nan, 0, False
                y = float(ys[i])
                n += 1
                if not started:
                    buf.append(y)
                    if len(buf) == m:
                        acc = buf[0]
                        for v in buf[1:]:
                            acc = acc + v
                        lvl = acc / float(m)
                        trend = 0.0
                        seas = [v - lvl for v in buf]
                        started = True
                else:
                    l2 = a * (y - seas[0]) + (1.0 - a) * (lvl + trend)
                    trend = bc * (l2 - lvl) + (1.0 - bc) * trend
                    snew = g * (y - l2) + (1.0 - g) * seas[0]
                    seas = seas[1:] + [snew]
                    lvl = l2
            if rows:
                yield pd.DataFrame(rows)
        row = summary_row()
        if row is not None:
            yield pd.DataFrame([row])

    staged = keyed_repartition(s, "user_id").sortWithinPartitions(
        "user_id", "ts", "event_id")
    return staged.mapInPandas(kernel, schema=schema).orderBy("user_id")


def _holt_winters_sql() -> str:
    a = f"CAST({_HW_A} AS DOUBLE)"
    b = f"CAST({_HW_B} AS DOUBLE)"
    g = f"CAST({_HW_G} AS DOUBLE)"
    m = _HW_M
    fc = ", ".join(
        f"level + CAST({float(h)} AS DOUBLE) * trend + seas[{h}] AS fc_{h}"
        for h in (1, 2, 3))
    return f"""
WITH RECURSIVE s AS (
  SELECT user_id, CAST(value AS DOUBLE) AS y,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE value IS NOT NULL),
anchor AS (
  SELECT user_id,
         list_reduce(list(y ORDER BY rn) FILTER (WHERE rn <= {m}),
                     (acc, v) -> acc + v) / CAST({m} AS DOUBLE) AS l0,
         list(y ORDER BY rn) FILTER (WHERE rn <= {m}) AS first_m
  FROM s GROUP BY user_id HAVING COUNT(*) >= {m}),
h AS (
  SELECT user_id, {m} AS rn, l0 AS l, CAST(0 AS DOUBLE) AS b,
         list_transform(first_m, v -> v - l0) AS seas
  FROM anchor
  UNION ALL
  SELECT q.user_id, q.rn, q.l2 AS l,
         {b}*(q.l2 - q.l) + (1.0-{b})*q.b AS b,
         list_append(q.seas[2:{m}],
                     {g}*(q.y - q.l2) + (1.0-{g})*q.seas[1]) AS seas
  FROM (
    SELECT s.user_id, s.rn, s.y, h.l, h.b, h.seas,
           {a}*(s.y - h.seas[1]) + (1.0-{a})*(h.l + h.b) AS l2
    FROM h JOIN s ON s.user_id = h.user_id AND s.rn = h.rn + 1) q),
fin AS (SELECT user_id, MAX(rn) AS n_obs FROM h GROUP BY user_id)
SELECT fin.user_id, fin.n_obs, h.l AS level, h.b AS trend, {fc}
FROM fin JOIN h ON h.user_id = fin.user_id AND h.rn = fin.n_obs
ORDER BY fin.user_id
"""


# ---------------------------------------------------------------------------
# Forecast-residual anomaly detection (Holt one-step-ahead + EW variance)
# ---------------------------------------------------------------------------

#: EW variance decay for the residual scale and the |z| flag cutoff.
_ANOM_RHO = 0.1
_ANOM_Z = 3.0


def _anomaly_fitted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared residual-scoring pass for forecast_anomalies and
    forecast_backtest: the per-key rank (rn) and count (n_rows) are
    computed BEFORE the Arrow kernel on the same window layout the
    kernel needs anyway (mapInPandas erases known output
    partitioning, so computing them after would cost a second hash
    exchange — the dashboard_snapshot pattern). Output carries the
    anomaly columns plus rn/n_rows for the backtest's row-local
    eval-tail filter."""
    from pyspark.sql.window import Window

    s = (_series(spark, sf_dir)
         .filter(F.col("close").isNotNull()))
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    staged = (s.withColumn("rn", F.row_number().over(wo))
              .withColumn("n_rows", F.count("*").over(
                  Window.partitionBy("user_id"))))
    in_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in staged.schema.fields)
    schema = (f"{in_schema}, resid double, z double, "
              f"is_anomaly boolean")
    a, bc, rho, zcut = _HOLT_A, _HOLT_B, _ANOM_RHO, _ANOM_Z

    def kernel(batches):
        cur_key = None
        lvl = trend = var = math.nan
        started = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keys = pdf["user_id"].to_numpy()
            ys = pdf["close"].to_numpy(dtype=np.float64)
            out_r = np.empty(len(pdf), dtype=np.float64)
            out_z = np.empty(len(pdf), dtype=np.float64)
            out_f = np.zeros(len(pdf), dtype=bool)
            for i in range(len(pdf)):
                if keys[i] != cur_key:
                    cur_key = keys[i]
                    lvl = trend = var = math.nan
                    started = False
                y = float(ys[i])
                if not started:
                    lvl, trend, started = y, 0.0, True
                    out_r[i] = math.nan
                    out_z[i] = math.nan
                    continue
                resid = y - (lvl + trend)
                z = resid / math.sqrt(var) if not math.isnan(var) \
                    else math.nan
                var = (resid * resid if math.isnan(var)
                       else (1.0 - rho) * var + rho * (resid * resid))
                l2 = a * y + (1.0 - a) * (lvl + trend)
                trend = bc * (l2 - lvl) + (1.0 - bc) * trend
                lvl = l2
                out_r[i] = resid
                out_z[i] = z
                out_f[i] = (not math.isnan(z)) and abs(z) > zcut
            yield pdf.assign(resid=out_r, z=out_z, is_anomaly=out_f)

    return staged.mapInPandas(kernel, schema=schema)


def q_forecast_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-shaped anomaly detection: each observation is scored
    against its own one-step-ahead Holt forecast — resid_t =
    y_t − (l_{t−1} + b_{t−1}), normalized by the exponentially
    weighted residual variance v (ρ = 0.1, seeded with the first
    residual's square), flagged when |z| > 3. The standard
    model-based change detector for metric streams: the forecast
    absorbs trend, so flags mean "departed from recent behavior",
    not "is large".

    Per-row output (y, resid, z, is_anomaly); warmup rows carry NULL
    resid/z and is_anomaly = false. (The kernel writes NaN into the
    pandas batch, which Arrow maps to SQL NULL on transfer — so the
    oracle's sentinel is NULL here, while pure-SQL producers like
    contract_check_lineitem must use NaN: double NULLs round-trip
    consistently, it is only non-double NULLs inside pandas object
    columns that diverge.)

    Scale shape: identical to the Holt kernel — one key exchange,
    one sequential Arrow pass carrying (l, b, v); the oracle's
    recursive CTE executes the same ops in the same order, so z
    scores are bit-identical (one exchange total; see
    _anomaly_fitted for the pre-kernel rank trick)."""
    return _anomaly_fitted(spark, sf_dir).drop("rn", "n_rows")


def _anomaly_sql() -> str:
    a = f"CAST({_HOLT_A} AS DOUBLE)"
    b = f"CAST({_HOLT_B} AS DOUBLE)"
    rho = f"CAST({_ANOM_RHO} AS DOUBLE)"
    return f"""
WITH RECURSIVE s AS (
  SELECT user_id, event_id, ts, CAST(value AS DOUBLE) AS y,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE value IS NOT NULL),
h AS (
  SELECT user_id, event_id, ts, rn, y, y AS l, CAST(0 AS DOUBLE) AS b,
         CAST(NULL AS DOUBLE) AS v,
         CAST(NULL AS DOUBLE) AS resid, CAST(NULL AS DOUBLE) AS z
  FROM s WHERE rn = 1
  UNION ALL
  SELECT q.user_id, q.event_id, q.ts, q.rn, q.y,
         {a}*q.y + (1.0-{a})*(q.l + q.b) AS l,
         {b}*(({a}*q.y + (1.0-{a})*(q.l + q.b)) - q.l)
           + (1.0-{b})*q.b AS b,
         CASE WHEN q.v IS NULL THEN q.resid2 * q.resid2
              ELSE (1.0-{rho})*q.v + {rho}*(q.resid2*q.resid2) END AS v,
         q.resid2 AS resid,
         q.resid2 / sqrt(q.v) AS z
  FROM (
    SELECT s.user_id, s.event_id, s.ts, s.rn, s.y, h.l, h.b, h.v,
           s.y - (h.l + h.b) AS resid2
    FROM h JOIN s ON s.user_id = h.user_id AND s.rn = h.rn + 1) q)
SELECT user_id, event_id, ts, y AS close, resid, z,
       CASE WHEN z IS NULL THEN FALSE ELSE abs(z) > {_ANOM_Z} END
         AS is_anomaly
FROM h
"""


#: Fraction of each key's history that is TRAINING in the backtest;
#: the remaining tail is scored out-of-sample.
_BT_TRAIN_FRAC = 0.8


def q_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin forecast evaluation — the model-selection loop
    for the Holt family: every row's one-step-ahead residual is
    already produced by the `forecast_anomalies` pass (the forecast
    at t uses only state through t−1, so each residual IS an
    out-of-sample error at origin t−1); the backtest scores only the
    final 20% of each key's history, where the state no longer
    remembers its warmup. Per key: n_eval, MAE, RMSE — the numbers a
    model registry compares across candidate smoothing configs.

    Scale shape: the residual pass is the one-exchange sequential
    kernel, and the eval-tail rank/count it needs are computed
    BEFORE the kernel on that same window layout (_anomaly_fitted —
    mapInPandas erases known output partitioning, so a post-kernel
    Window would cost a second full-data exchange + sort; the tail
    selection is now a row-local filter). The only post-kernel
    exchange is the partial-aggregated per-key rollup. The error
    aggregate is decimal-exact (parallel double SUM order would
    diverge across engines — same discipline as dsum everywhere
    else). RMSE derives from the exact sum of squares, so both
    engines take sqrt of the identical double."""
    tail = (_anomaly_fitted(spark, sf_dir)
            .filter((F.col("rn") > F.col("n_rows") * _BT_TRAIN_FRAC)
                    & F.col("resid").isNotNull()))
    abs_r = F.abs(F.col("resid"))
    return (tail.groupBy("user_id")
            .agg(F.count("*").alias("n_eval"),
                 (F.sum(abs_r.cast(DEC)).cast("double")
                  / F.count("*")).alias("mae"),
                 F.sqrt(F.sum((abs_r * abs_r).cast(DEC)).cast("double")
                        / F.count("*")).alias("rmse"))
            .orderBy("user_id"))


def _backtest_sql() -> str:
    from ..functions import dsum_sql

    # The residual trajectory is the forecast_anomalies oracle; wrap
    # it, select the per-key eval tail, aggregate decimal-exact.
    return f"""
WITH scored AS ({_anomaly_sql()}),
sized AS (
  SELECT user_id, resid,
         COUNT(*) OVER (PARTITION BY user_id) AS n_rows,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM scored)
SELECT user_id, COUNT(*) AS n_eval,
       {dsum_sql('abs(resid)')} / COUNT(*) AS mae,
       sqrt({dsum_sql('abs(resid) * abs(resid)')} / COUNT(*)) AS rmse
FROM sized
WHERE rn > n_rows * {_BT_TRAIN_FRAC} AND resid IS NOT NULL
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# Dashboard snapshot: the reference console's per-refresh payload
# ---------------------------------------------------------------------------

def q_dashboard_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole dashboard refresh as ONE query: per
    symbol, the latest tick decorated with the indicator suite the
    Streamlit console shows side by side — BUY/SELL/HOLD signal (B2,
    `flink_processor/flink_processor.py:105-109`), EMA 5/15 (E1),
    SMA 20 (E2), RSI 14 (E3), and support/resistance (D1/E7), all
    `streamlit_app/streamlit_app.py:165-204,346-347`. The reference
    recomputes each of these eagerly per refresh over separate pandas
    frames; here every indicator shares ONE hash exchange on the key —
    the window stages reuse the partitioning, the ewm kernel runs over
    the already-sorted layout, and the final latest-row filter is a
    rank over the same key. Output: one row per symbol."""
    from .indicators import _rolling_mean

    s = _series(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    wk = W.partitionBy("user_id").rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing)
    prev = F.lag("close").over(w)
    s = (s.withColumn("prev_value", prev)
         .withColumn("support", F.min("close").over(wk))
         .withColumn("resistance", F.max("close").over(wk))
         .withColumn("sma_20", _rolling_mean(F.col("close"), w, 20))
         .withColumn("delta", F.col("close") - F.lag("close").over(w)))
    gain = F.when(F.col("delta") > 0, F.col("delta")).otherwise(F.lit(0.0))
    loss = F.when(F.col("delta") < 0, -F.col("delta")).otherwise(F.lit(0.0))
    s = (s.withColumn("gain_avg", _rolling_mean(gain, w, 14))
         .withColumn("loss_avg", _rolling_mean(loss, w, 14)))
    rs = F.col("gain_avg") / F.nullif(F.col("loss_avg"), F.lit(0.0))
    s = s.withColumn(
        "rsi_14", F.lit(100.0) - (F.lit(100.0) / (F.lit(1.0) + rs)))
    # Latest-row rank is precomputed ASCENDING (rn == n_rows) so it
    # rides the same exchange/sort as every other window — ranking
    # after the kernel would force a second exchange, since
    # mapInPandas erases the known output partitioning.
    s = (s.withColumn("rn", F.row_number().over(w))
         .withColumn("n_rows", F.count("*").over(wk)))
    # Window stages left the layout hash(user_id)-partitioned and
    # (ts, event_id)-sorted — the kernel adds no exchange.
    s = _apply_ewm(s, ["ts", "event_id"],
                   {"ema_5": ("close", 2.0 / (5.0 + 1.0)),
                    "ema_15": ("close", 2.0 / (15.0 + 1.0))},
                   assume_sorted=True)
    return (s.filter(F.col("rn") == F.col("n_rows"))
            .withColumn(
                "signal",
                F.when(F.col("prev_value").isNull(), "HOLD")
                .when(F.col("close") > F.col("prev_value"), "BUY")
                .when(F.col("close") < F.col("prev_value"), "SELL")
                .otherwise("HOLD"))
            .select("user_id", "ts", "close", "prev_value", "signal",
                    "ema_5", "ema_15", "sma_20", "rsi_14",
                    "support", "resistance"))


def _dashboard_sql() -> str:
    from .indicators import _rolling_mean_sql

    kw = "(PARTITION BY user_id ORDER BY ts, event_id)"
    return f"""
WITH d AS (
  SELECT user_id, event_id, ts, value AS close,
         lag(value) OVER w AS prev_value,
         MIN(value) OVER wk AS support,
         MAX(value) OVER wk AS resistance,
         {_ewm_sql('value', '2.0/(5.0+1.0)', _ORACLE_KEY_WINDOW)} AS ema_5,
         {_ewm_sql('value', '2.0/(15.0+1.0)', _ORACLE_KEY_WINDOW)} AS ema_15,
         {_rolling_mean_sql('value', 20, kw)} AS sma_20,
         value - lag(value) OVER w AS delta,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
  WINDOW w AS {kw}, wk AS (PARTITION BY user_id)),
g AS (
  SELECT *,
         {_rolling_mean_sql("CASE WHEN delta > 0 THEN delta ELSE 0.0 END",
                            14, kw)} AS gain_avg,
         {_rolling_mean_sql("CASE WHEN delta < 0 THEN -delta ELSE 0.0 END",
                            14, kw)} AS loss_avg
  FROM d)
SELECT user_id, ts, close, prev_value,
       CASE WHEN prev_value IS NULL THEN 'HOLD'
            WHEN close > prev_value THEN 'BUY'
            WHEN close < prev_value THEN 'SELL'
            ELSE 'HOLD' END AS signal,
       ema_5, ema_15, sma_20,
       100.0 - (100.0 / (1.0 + gain_avg / nullif(loss_avg, 0.0))) AS rsi_14,
       support, resistance
FROM g WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Kalman local-level filter (coupled state + variance recurrence)
# ---------------------------------------------------------------------------

#: Process / observation noise for the local-level model. Q/R = 0.01
#: gives a steady-state gain ≈ 0.095 — a smoother that trusts history
#: ~10× more than each new tick.
_KAL_Q = 0.01
_KAL_R = 1.0


def q_kalman_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kalman filter for the local-level model per key (Kalman 1960 /
    Durbin & Koopman, public): the adaptive-gain generalization of
    the EMA — the smoothing weight is not a constant α but the
    running posterior variance: ``P⁻ = P + Q; K = P⁻/(P⁻ + R);
    l ← l + K(y − l); P ← (1−K)P⁻``, init l₁ = y₁, P₁ = 1. Early
    observations get large gains (uncertain state), converging to the
    steady-state gain — exactly why trading systems use it over a
    fixed-α EMA after gaps. Output: one row per key with the final
    (level, p_var, gain) — level is also the one-step-ahead forecast
    of the local-level model.

    Kernel + oracle follow the q_holt_forecast discipline to the
    letter: the recurrence runs in one partition-wide Arrow pass with
    the last-row rank precomputed on the same window layout (one
    exchange total), mirrored by a per-key recursive CTE executing
    the IDENTICAL operation order — sequential doubles, bit-exact on
    both engines.

    Kernel vectorization (r7, verdict item 4 — the former per-row
    Python loop measured 22.6 s at sf10, the worst probe in the
    tree): two structural facts make the local-level filter
    vectorizable WITHOUT reassociating a single float op:

    * the (P, gain) recurrence never reads the data — ``P⁻ = P + Q``,
      ``K = P⁻/(P⁻+R)``, ``P = (1−K)P⁻`` depend only on the row's
      per-key RANK — so both are a precomputed table indexed by `rn`
      (computed once by the same scalar ops, grown on demand);
    * the level update ``l ← l + K(y − l)`` is element-wise, so rows
      of DIFFERENT keys at the same rank step together: lay the
      batch's per-key segments out as a (segments × max_len) matrix
      and run max_len vectorized steps across all keys at once. Each
      element still sees exactly the scalar op sequence (numpy
      element-wise ops are per-element IEEE in order), so the result
      is BIT-IDENTICAL to the row loop — asserted by
      tests/test_pandas_parity.py's kalman property test and the
      unchanged oracle. Keys scale with data here (66 rows/user at
      every SF — TESTDATA.md), so batches are wide and step counts
      stay ~66 regardless of corpus size; measured 22.6 s → well
      under the ≤10 s sf10 target (SCALING.md addendum 13)."""
    from pyspark.sql.window import Window

    s = (_series(spark, sf_dir)
         .filter(F.col("close").isNotNull()))
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    staged = (s.withColumn("rn", F.row_number().over(wo))
              .withColumn("n_obs", F.count("*").over(
                  Window.partitionBy("user_id"))))
    in_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                          for f in staged.schema.fields)
    schema = f"{in_schema}, kal_level double, kal_p double, kal_gain double"
    fitted = staged.mapInPandas(_kalman_kernel(), schema=schema)
    # Single-observation keys never compute a gain: the kernel carries
    # NaN, the oracle NULL — normalize to NULL (the dtype-honest
    # "undefined", matching the recursive CTE's first row).
    return (fitted
            .filter(F.col("rn") == F.col("n_obs"))
            .select("user_id", "n_obs",
                    F.col("kal_level").alias("level"),
                    F.col("kal_p").alias("p_var"),
                    F.when(F.col("n_obs") > 1, F.col("kal_gain"))
                    .alias("gain"))
            .orderBy("user_id"))


def _kalman_kernel():
    """Arrow kernel for the local-level filter (see q_kalman_level's
    docstring for the vectorization argument). Module-level factory so
    tests/test_pandas_parity.py can drive it directly with synthetic
    batch splits and assert bit-equality against the scalar loop."""
    force_scalar = FORCE_SCALAR_KERNEL  # captured at plan-build time

    def kernel(batches):
        q_noise, r_noise = _KAL_Q, _KAL_R
        # Rank-indexed gain/variance tables (index 0 unused; rank 1 =
        # first observation: P=1, gain undefined). Grown on demand by
        # the same scalar recurrence the row loop ran.
        k_tab = np.array([np.nan, np.nan])
        p_tab = np.array([np.nan, 1.0])

        def extend(need: int):
            nonlocal k_tab, p_tab
            have = len(k_tab) - 1
            if need <= have:
                return
            k2 = np.empty(need + 1)
            p2 = np.empty(need + 1)
            k2[:have + 1] = k_tab
            p2[:have + 1] = p_tab
            p = p_tab[have]
            for rn in range(have + 1, need + 1):
                pp = p + q_noise
                k = pp / (pp + r_noise)
                p = (1.0 - k) * pp
                k2[rn] = k
                p2[rn] = p
            k_tab, p_tab = k2, p2

        carry_key = None
        carry_lvl = math.nan
        for pdf in batches:
            if len(pdf) == 0:
                continue
            keys = pdf["user_id"].to_numpy()
            rns = pdf["rn"].to_numpy()
            ys = pdf["close"].to_numpy(dtype=np.float64)
            n = len(pdf)
            # Contiguous per-key segments (partition is sorted by
            # (user_id, ts, event_id) — the window stage's layout).
            starts = np.concatenate(
                ([0], np.nonzero(keys[1:] != keys[:-1])[0] + 1))
            ends = np.concatenate((starts[1:], [n]))
            seg_lens = ends - starts
            offsets = rns[starts] - 1  # 0-based rank before each seg
            extend(int((offsets + seg_lens).max()))
            n_segs = len(starts)
            max_len = int(seg_lens.max())
            if force_scalar or not _dense_layout_ok(n, n_segs, max_len):
                # Skewed segment lengths: the padded matrix would be
                # far larger than the batch — run the level recurrence
                # as the reference row loop (gains/variances stay
                # table lookups; identical arithmetic either way).
                # rn == 1 IS the key-reset marker (row_number per
                # key), so no key tracking is needed here.
                out_l = np.empty(n, dtype=np.float64)
                lvl = carry_lvl
                for i in range(n):
                    rn = rns[i]
                    y = ys[i]
                    if rn == 1:
                        lvl = y
                    else:
                        k = k_tab[rn]
                        lvl = lvl + k * (y - lvl)
                    out_l[i] = lvl
            else:
                seg_of_row = np.repeat(np.arange(n_segs), seg_lens)
                pos_of_row = np.arange(n) - starts[seg_of_row]
                ymat = np.full((n_segs, max_len), np.nan)
                ymat[seg_of_row, pos_of_row] = ys
                lmat = np.empty_like(ymat)
                lprev = np.zeros(n_segs)
                if keys[0] == carry_key:  # seg 0 continues last batch
                    lprev[0] = carry_lvl
                for t in range(max_len):
                    y = ymat[:, t]
                    rn_t = offsets + t + 1
                    k = k_tab[np.minimum(rn_t, len(k_tab) - 1)]
                    lvl = np.where(rn_t == 1, y, lprev + k * (y - lprev))
                    lvl = np.where(t < seg_lens, lvl, lprev)
                    lmat[:, t] = lvl
                    lprev = lvl
                out_l = lmat[seg_of_row, pos_of_row]
            out_p = p_tab[rns]
            out_k = k_tab[rns]
            carry_key = keys[-1]
            carry_lvl = out_l[-1]
            yield pdf.assign(kal_level=out_l, kal_p=out_p,
                             kal_gain=out_k)

    return kernel


def _kalman_sql() -> str:
    q, r = f"CAST({_KAL_Q} AS DOUBLE)", f"CAST({_KAL_R} AS DOUBLE)"
    return f"""
WITH RECURSIVE s AS (
  SELECT user_id, CAST(value AS DOUBLE) AS y,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE value IS NOT NULL),
h AS (
  SELECT user_id, rn, y AS l, CAST(1.0 AS DOUBLE) AS p,
         CAST(NULL AS DOUBLE) AS k
  FROM s WHERE rn = 1
  UNION ALL
  SELECT q2.user_id, q2.rn,
         q2.l + q2.k * (q2.y - q2.l) AS l,
         (1.0 - q2.k) * q2.pp AS p,
         q2.k
  FROM (
    SELECT s.user_id, s.rn, s.y, h.l, h.p + {q} AS pp,
           (h.p + {q}) / ((h.p + {q}) + {r}) AS k
    FROM h JOIN s ON s.user_id = h.user_id AND s.rn = h.rn + 1) q2),
fin AS (
  SELECT user_id, MAX(rn) AS n_obs FROM h GROUP BY user_id)
SELECT fin.user_id, fin.n_obs, h.l AS level, h.p AS p_var, h.k AS gain
FROM fin JOIN h ON h.user_id = fin.user_id AND h.rn = fin.n_obs
ORDER BY fin.user_id
"""


QUERIES = {
    "dashboard_snapshot": (q_dashboard_snapshot, _dashboard_sql()),
    "kalman_level": (q_kalman_level, _kalman_sql()),
    "holt_forecast": (q_holt_forecast, _holt_sql()),
    "holt_winters": (q_holt_winters, _holt_winters_sql()),
    "forecast_anomalies": (q_forecast_anomalies, _anomaly_sql()),
    "forecast_backtest": (q_forecast_backtest, _backtest_sql()),
    "ema": (q_ema, _EMA_SQL),
    "macd": (q_macd, _MACD_SQL),
    "tsi": (q_tsi, _TSI_SQL),
    "adx": (q_adx, _ADX_SQL),
}
