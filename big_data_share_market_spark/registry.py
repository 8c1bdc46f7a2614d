"""Aggregate query registry: name -> (fn, duckdb_oracle_sql | None).

Single source of truth consumed by __spark_entry__.py (driver
contract), tests/test_parity.py (local oracle harness), and bench.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: The driver's hard correctness gate checks the FIRST 50 registry
#: entries. Front-load one-or-more representatives of every SURVEY §2
#: family (streaming G1-G6, the full §2.E indicator library, patterns,
#: transforms, keyed, JSON I/O) plus the LLM-pipeline components
#: (dedup, ANN, text quality, packing, sampling, resample, multimodal)
#: so the driver-visible window covers the operator inventory — the
#: TPC-H relational long tail was hard-verified green in round 1
#: (CORRECTNESS_r01.json) and now follows after.
_FIRST_50 = (
    # §2.G streaming (batch-parity oracles)
    "stream_ohlc_bars", "stream_signal_bars", "stream_sliding_bars",
    "stream_session_windows", "stream_last20_per_key", "stream_ema_per_key",
    "stream_dedup_within_watermark", "stream_upsert_idempotent",
    "stream_static_enrich", "stream_interval_join",
    "stream_left_outer_interval_join",
    # §2.E indicators + strategies
    "sma", "rsi", "scalping_strategy", "range_trading_strategy",
    "momentum_strategy", "breakout_strategy",
    # §2.E ewm family (Arrow kernels)
    "ema", "macd", "tsi", "adx",
    # §2.E chart patterns
    "ascending_triangle", "descending_triangle", "rounding_bottom",
    # §2.E/B transforms
    "ohlc_bars", "heikin_ashi", "renko", "raindrop",
    # §2.A/B/D keyed
    "signal_case", "last_per_key", "latest_n_per_key", "dedup_upsert",
    # §2.C JSON I/O
    "flatten_nested", "props_map_explode",
    # LLM pipeline: dedup / ANN / text / packing / sampling / resample /
    # multimodal
    "minhash_lsh_dedup", "simhash_pairs", "clean_corpus",
    "cosine_topk", "ann_ivf_topk", "embedding_neardup",
    "quality_score", "corpus_to_training_set", "hash_split",
    "resample_ffill", "media_metadata_stats", "repetition_score",
    # round-1 hash-only failures, oracle types fixed this round
    "sessionize_events", "late_priority_split", "funnel_conversion",
    "dq_profile_lineitem",
)


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
                 "operators.finance",
                 "operators.dedup", "operators.similarity",
                 "operators.text", "operators.corpus",
                 "operators.multimodal",
                 "operators.sampling", "operators.warehouse",
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
    # Degrade, never crash: a missing priority name (module failed to
    # import, query renamed) must not take the whole registry — and
    # with it the driver's entry()/queries() surface — down with it.
    # tests/test_invariants.py asserts _FIRST_50 ⊆ registry so the
    # mismatch is still caught at test time.
    ordered = {name: merged[name] for name in _FIRST_50 if name in merged}
    ordered.update((k, v) for k, v in merged.items() if k not in ordered)
    return ordered


def all_queries() -> dict[str, tuple[QueryFn, str | None]]:
    return _collect()
