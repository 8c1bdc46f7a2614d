"""Driver-checkable streaming queries: each runs the REAL Structured
Streaming query over the fixture (availableNow trigger) and returns
the materialized result, so the DuckDB oracle verifies streaming
semantics — watermarked windows, stateful buffers, idempotent upsert —
not just that the code runs.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..operators.transforms import BARS_CTE
from .pipeline import (events_stream, run_available_now, signal_over_bars,
                       stream_ohlc_bars, with_watermark)
from .state import last_n_per_key
from .upsert import upsert_stream


def q_stream_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G5: watermarked tumbling-window OHLCV from the replayed stream;
    oracle = the batch bars CTE (stream/batch parity is exact because
    the aggregate expressions are shared)."""
    return run_available_now(stream_ohlc_bars(events_stream(spark, sf_dir)),
                             spark)


_STREAM_BARS_SQL = f"WITH {BARS_CTE} SELECT * FROM bars"


def q_stream_signal_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full reference pipeline shape (`flink_processor/
    flink_processor.py:94-112`): stream → bars → BUY/SELL/HOLD CASE."""
    bars = stream_ohlc_bars(events_stream(spark, sf_dir))
    return run_available_now(signal_over_bars(bars), spark)


_STREAM_SIGNAL_SQL = f"""
WITH {BARS_CTE}
SELECT *, CASE WHEN close > open THEN 'BUY'
               WHEN close < open THEN 'SELL'
               ELSE 'HOLD' END AS indicator
FROM bars
"""


def q_stream_last20_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G6: applyInPandasWithState bounded buffer; oracle = the batch
    window-rank form (operators/keyed.q_latest_n_per_key)."""
    sdf = events_stream(spark, sf_dir)
    return run_available_now(last_n_per_key(sdf, n=20), spark,
                             output_mode="update")


_STREAM_LAST20_SQL = """
SELECT user_id, event_id, ts, value, rn FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn <= 20
"""


def q_stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 in its native streaming form: the source is replayed TWICE
    (union of two replays — the reference's producer re-sends the full
    day every cycle, `kafka_producer/yahoo_finance_producer.py:95-119`)
    and `dropDuplicatesWithinWatermark` on the event key collapses the
    duplicates with watermark-bounded state — the scalable alternative
    to unbounded-state dropDuplicates. Oracle = each event exactly
    once."""
    doubled = events_stream(spark, sf_dir).unionByName(
        events_stream(spark, sf_dir))
    deduped = with_watermark(doubled).dropDuplicatesWithinWatermark(["event_id"])
    return run_available_now(deduped, spark, output_mode="append")


_STREAM_DEDUP_SQL = """
SELECT event_id, ts, user_id, event_type, value, props FROM events
"""


def q_stream_upsert_idempotent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G3/G4: replay the stream TWICE through the foreachBatch
    last-write-wins upsert; the final table must equal a single pass —
    oracle = the batch dedup_upsert SQL. This is the property the
    reference's whole at-least-once design rests on."""
    with tempfile.TemporaryDirectory(prefix="bdsm_upsert_") as tmp:
        target = f"{tmp}/target"
        for replay in range(2):
            upsert_stream(events_stream(spark, sf_dir), spark, target,
                          checkpoint_dir=f"{tmp}/ckpt{replay}")
        # Materialize before the TemporaryDirectory vanishes.
        rows = spark.read.parquet(target)
        return spark.createDataFrame(rows.collect(), rows.schema).select(
            "event_id", "ts", "user_id", "event_type", "value", "props")


_STREAM_UPSERT_SQL = """
SELECT event_id, ts, user_id, event_type, value, props FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
                               ORDER BY event_id DESC) AS rn
  FROM events) WHERE rn = 1
"""


QUERIES = {
    "stream_ohlc_bars": (q_stream_ohlc_bars, _STREAM_BARS_SQL),
    "stream_signal_bars": (q_stream_signal_bars, _STREAM_SIGNAL_SQL),
    "stream_last20_per_key": (q_stream_last20_per_key, _STREAM_LAST20_SQL),
    "stream_dedup_within_watermark": (q_stream_dedup_within_watermark,
                                      _STREAM_DEDUP_SQL),
    "stream_upsert_idempotent": (q_stream_upsert_idempotent, _STREAM_UPSERT_SQL),
}
