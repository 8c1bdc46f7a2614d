"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over big_data_share_market_spark.registry — the engine's
single source of truth for implemented queries and their DuckDB
oracles (see SURVEY.md §2 for the operator inventory each name maps
to).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from big_data_share_market_spark.registry import all_queries  # noqa: E402
from big_data_share_market_spark.session import prep  # noqa: E402

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference's signal
    pipeline (B2 CASE + lag over per-key event time)."""
    prep(spark)
    fn, _ = all_queries()["signal_case"]
    return fn(spark, _SF0001)


def _wrap(fn) -> Callable[[SparkSession, str], DataFrame]:
    def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
        prep(spark)
        return fn(spark, sf_dir)
    return runner


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, (fn, _) in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in all_queries().items() if sql is not None}
