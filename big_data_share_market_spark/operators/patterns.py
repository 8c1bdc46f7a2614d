"""Chart-pattern detectors (SURVEY §2.E12-E14) over OHLC bars, pure
Window expressions.

Replicated AS WRITTEN from the reference
(`streamlit_app/streamlit_app.py:242-257`): the triangle conditions
compare consecutive rolling extrema (not trendline fits), and
rounding-bottom is a rolling mean of the first difference of a rolling
mean. pandas NaN-compare-is-False becomes COALESCE(..., FALSE) so the
boolean flags are never NULL (matching the reference's boolean
columns, SURVEY §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import DEC
from .transforms import BARS_CTE, bar_window, ohlc_bars

_ORACLE_BAR_WINDOW = "(PARTITION BY user_id ORDER BY bar_ts)"


def _rolling5_extrema(bars: DataFrame) -> DataFrame:
    w5 = bar_window().rowsBetween(-4, 0)
    full = F.count("high").over(w5) == 5
    return (bars
            .withColumn("highs", F.when(full, F.max("high").over(w5)))
            .withColumn("lows", F.when(full, F.min("low").over(w5))))


_EXTREMA_CTE = f"""
ext AS (
  SELECT user_id, bar_ts, high, low, close,
         CASE WHEN COUNT(high) OVER w5 = 5 THEN MAX(high) OVER w5 END AS highs,
         CASE WHEN COUNT(low) OVER w5 = 5 THEN MIN(low) OVER w5 END AS lows
  FROM bars
  WINDOW w5 AS (PARTITION BY user_id ORDER BY bar_ts
                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))
"""


def q_ascending_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E12 (`streamlit_app/streamlit_app.py:242-246`):
    prev(rolling5 max high) < current AND prev(rolling5 min low) > current."""
    bars = _rolling5_extrema(ohlc_bars(spark, sf_dir))
    w = bar_window()
    flag = (F.lag("highs").over(w) < F.col("highs")) & (
        F.lag("lows").over(w) > F.col("lows"))
    return (bars.withColumn("ascending_triangle",
                            F.coalesce(flag, F.lit(False)))
            .select("user_id", "bar_ts", "high", "low", "ascending_triangle"))


_ASC_TRIANGLE_SQL = f"""
WITH {BARS_CTE}, {_EXTREMA_CTE}
SELECT user_id, bar_ts, high, low,
       COALESCE(lag(highs) OVER w < highs AND lag(lows) OVER w > lows,
                FALSE) AS ascending_triangle
FROM ext
WINDOW w AS {_ORACLE_BAR_WINDOW}
"""


def q_descending_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E13: mirror of E12 (`streamlit_app/streamlit_app.py:248-252`)."""
    bars = _rolling5_extrema(ohlc_bars(spark, sf_dir))
    w = bar_window()
    flag = (F.lag("highs").over(w) > F.col("highs")) & (
        F.lag("lows").over(w) < F.col("lows"))
    return (bars.withColumn("descending_triangle",
                            F.coalesce(flag, F.lit(False)))
            .select("user_id", "bar_ts", "high", "low", "descending_triangle"))


_DESC_TRIANGLE_SQL = f"""
WITH {BARS_CTE}, {_EXTREMA_CTE}
SELECT user_id, bar_ts, high, low,
       COALESCE(lag(highs) OVER w > highs AND lag(lows) OVER w < lows,
                FALSE) AS descending_triangle
FROM ext
WINDOW w AS {_ORACLE_BAR_WINDOW}
"""


def q_rounding_bottom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E14 (`streamlit_app/streamlit_app.py:254-257`): rolling-5 mean
    of the first difference of the rolling-20 mean of close; flag > 0.
    Nested windows — the outer mean only counts rows where the inner
    difference is non-NULL (pandas drops NaN windows entirely via
    min_periods=window)."""
    bars = ohlc_bars(spark, sf_dir)
    w = bar_window()
    w20 = w.rowsBetween(-19, 0)
    rm = F.when(F.count("close").over(w20) == 20,
                F.sum(F.col("close").cast(DEC)).over(w20).cast("double")
                / F.count("close").over(w20))
    bars = bars.withColumn("rm", rm)
    bars = bars.withColumn("d", F.col("rm") - F.lag("rm").over(bar_window()))
    w5 = bar_window().rowsBetween(-4, 0)
    bottom = F.when(F.count("d").over(w5) == 5,
                    F.sum(F.col("d").cast(DEC)).over(w5).cast("double")
                    / F.count("d").over(w5))
    return (bars.withColumn("bottom", bottom)
            .withColumn("rounding_bottom",
                        F.coalesce(F.col("bottom") > 0, F.lit(False)))
            .select("user_id", "bar_ts", "close", "rounding_bottom"))


_ROUNDING_BOTTOM_SQL = f"""
WITH {BARS_CTE},
rm AS (
  SELECT user_id, bar_ts, close,
         CASE WHEN COUNT(close) OVER w20 = 20 THEN
           CAST(SUM(CAST(close AS DECIMAL(25,6))) OVER w20 AS DOUBLE)
             / COUNT(close) OVER w20 END AS rm
  FROM bars
  WINDOW w20 AS (PARTITION BY user_id ORDER BY bar_ts
                 ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)),
d AS (
  SELECT user_id, bar_ts, close,
         rm - lag(rm) OVER (PARTITION BY user_id ORDER BY bar_ts) AS d
  FROM rm)
SELECT user_id, bar_ts, close,
       COALESCE(
         CASE WHEN COUNT(d) OVER w5 = 5 THEN
           CAST(SUM(CAST(d AS DECIMAL(25,6))) OVER w5 AS DOUBLE)
             / COUNT(d) OVER w5 END > 0,
         FALSE) AS rounding_bottom
FROM d
WINDOW w5 AS (PARTITION BY user_id ORDER BY bar_ts
              ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""


QUERIES = {
    "ascending_triangle": (q_ascending_triangle, _ASC_TRIANGLE_SQL),
    "descending_triangle": (q_descending_triangle, _DESC_TRIANGLE_SQL),
    "rounding_bottom": (q_rounding_bottom, _ROUNDING_BOTTOM_SQL),
}
