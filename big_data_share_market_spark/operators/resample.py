"""Time-grid resampling and anomaly scoring over the keyed series.

The reference renders per-symbol charts straight off whatever bars
yfinance returned — market closures leave silent holes in the time
axis (`streamlit_app/streamlit_app.py:267-315` plots row-index order).
A real time-series engine makes the grid explicit: `resample_ffill`
regularizes each key onto a fixed interval grid with
last-observation-carried-forward (the hypertable
`time_bucket_gapfill + locf` shape, here pure DataFrame algebra), and
`rolling_zscore` flags bars that sit far outside their own trailing
distribution — the data-quality tripwire an ingest pipeline runs
before trusting a feed.

Scale notes: the grid is generated per key from that key's own
[min, max] extent (`sequence` + `explode` — rows ∝ keys × span/step,
never a cartesian), and the fill join is an equi-join on
(key, bar_ts) — one shuffle, AQE-coalesced. The LOCF is
`last(ignorenulls)` over the per-key window: the same single sort the
bar pipeline already pays. The z-score reuses the decimal-exact
rolling power sums from indicators.py, so flags are bit-identical on
both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .indicators import (_rolling_mean, _rolling_mean_sql, _rolling_std,
                         _rolling_std_sql, _series, _w)
from .transforms import BARS_CTE, ohlc_bars

# ---------------------------------------------------------------------------
# Gap-fill + LOCF resampling
# ---------------------------------------------------------------------------


def q_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize each key's hourly bars onto a dense hourly grid
    between that key's first and last bar; carry the last close
    forward over the holes, zero-fill volume, and mark filled rows.
    The first grid slot per key is the key's first real bar, so the
    carried-forward close is total (never NULL)."""
    bars = ohlc_bars(spark, sf_dir)
    extents = bars.groupBy("user_id").agg(
        F.min("bar_ts").alias("g0"), F.max("bar_ts").alias("g1"))
    # explode_outer: avoids the inferred size()>0 filter evaluating
    # the sequence() twice (the grid can never be empty — g1 >= g0).
    grid = (extents.select(
        "user_id",
        F.explode_outer(F.sequence("g0", "g1", F.expr("INTERVAL 1 HOUR")))
        .alias("bar_ts"))
        .filter(F.col("bar_ts").isNotNull()))
    filled = grid.join(bars, ["user_id", "bar_ts"], "left")
    w = (W.partitionBy("user_id").orderBy("bar_ts")
         .rowsBetween(W.unboundedPreceding, 0))
    return filled.select(
        "user_id", "bar_ts",
        F.last("close", ignorenulls=True).over(w).alias("close"),
        F.coalesce("volume", F.lit(0)).alias("volume"),
        F.col("close").isNull().alias("is_gap"),
    )


_RESAMPLE_FFILL_SQL = f"""
WITH {BARS_CTE},
extents AS (
  SELECT user_id, MIN(bar_ts) AS g0, MAX(bar_ts) AS g1
  FROM bars GROUP BY user_id),
grid AS (
  SELECT user_id, unnest(generate_series(g0, g1, INTERVAL 1 HOUR)) AS bar_ts
  FROM extents)
SELECT g.user_id, g.bar_ts,
       last_value(b.close IGNORE NULLS)
         OVER (PARTITION BY g.user_id ORDER BY g.bar_ts
               ROWS UNBOUNDED PRECEDING) AS close,
       COALESCE(b.volume, 0) AS volume,
       b.close IS NULL AS is_gap
FROM grid g LEFT JOIN bars b
  ON g.user_id = b.user_id AND g.bar_ts = b.bar_ts
"""


# ---------------------------------------------------------------------------
# Rolling z-score anomaly flags
# ---------------------------------------------------------------------------

_Z_N = 20
_Z_THRESHOLD = 2.0


def q_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key trailing-window z-score of each event value against its
    previous {n}-row distribution (mean/std exclude the current row —
    a point can't vouch for itself), NULL until the trailing frame is
    full; |z| > 2 flags the anomaly. Decimal-exact power sums make z
    — and therefore the flag — bit-identical to the oracle."""
    s = _series(spark, sf_dir)
    w = _w()
    # Shift the frame one row back: rolling stats over rows -20..-1.
    prev = F.lag("close").over(w)
    s = s.withColumn("prev_close", prev)
    mean = _rolling_mean(F.col("prev_close"), w, _Z_N)
    std = _rolling_std(F.col("prev_close"), w, _Z_N)
    z = (F.col("close") - mean) / F.nullif(std, F.lit(0.0))
    return (s.withColumn("zscore", z)
            .withColumn("is_anomaly",
                        F.coalesce(F.abs(z) > _Z_THRESHOLD, F.lit(False)))
            .select("user_id", "event_id", "ts", "close",
                    "zscore", "is_anomaly"))


_ROLLING_ZSCORE_SQL = f"""
WITH lagged AS (
  SELECT user_id, event_id, ts, value AS close,
         lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_close
  FROM events)
SELECT user_id, event_id, ts, close,
       (close - {_rolling_mean_sql('prev_close', _Z_N)})
         / nullif({_rolling_std_sql('prev_close', _Z_N)}, 0.0) AS zscore,
       COALESCE(abs((close - {_rolling_mean_sql('prev_close', _Z_N)})
         / nullif({_rolling_std_sql('prev_close', _Z_N)}, 0.0))
         > {_Z_THRESHOLD}, FALSE) AS is_anomaly
FROM lagged
"""


QUERIES = {
    "resample_ffill": (q_resample_ffill, _RESAMPLE_FFILL_SQL),
    "rolling_zscore": (q_rolling_zscore, _ROLLING_ZSCORE_SQL),
}
