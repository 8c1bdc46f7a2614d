"""Aggregate query registry: name -> (fn, duckdb_oracle_sql | None).

Single source of truth consumed by __spark_entry__.py (driver
contract), tests/test_parity.py (local oracle harness), and bench.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = []


def _collect() -> dict[str, tuple[QueryFn, str | None]]:
    from .operators import relational, keyed
    mods = [relational, keyed]
    for name in ("operators.advanced", "operators.decision",
                 "operators.behavior", "operators.profile",
                 "operators.scale",
                 "operators.sketches", "operators.packing",
                 "operators.indicators", "operators.ewm",
                 "operators.resample",
                 "operators.patterns", "operators.transforms",
                 "operators.dedup", "operators.similarity",
                 "operators.text", "operators.corpus",
                 "operators.multimodal",
                 "operators.sampling",
                 "sources.json_io", "streaming.batch_parity"):
        modpath = f"{__package__}.{name}"
        try:
            mods.append(__import__(modpath, fromlist=[name.split(".")[-1]]))
        except ModuleNotFoundError as exc:
            # Only swallow "module not written yet", never a missing
            # dependency inside an existing module.
            if exc.name != modpath:
                raise
    merged: dict[str, tuple[QueryFn, str | None]] = {}
    for mod in mods:
        for key, val in getattr(mod, "QUERIES", {}).items():
            if key in merged:
                raise ValueError(f"duplicate query name: {key}")
            merged[key] = val
    return merged


def all_queries() -> dict[str, tuple[QueryFn, str | None]]:
    return _collect()
