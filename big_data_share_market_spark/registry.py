"""Aggregate query registry: name -> (fn, duckdb_oracle_sql | None).

Single source of truth consumed by __spark_entry__.py (driver
contract), tests/test_parity.py (local oracle harness), and bench.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: The driver's hard correctness gate checks the FIRST 50 registry
#: entries. Rounds 1-5 drove 234 distinct queries green
#: (CORRECTNESS_r01 ∪ ... ∪ r05; the r5 window itself was 50/50).
#: Round 6 window =
#:   (a) the 15 never-driver-verified queries — the 12 round-5
#:       additions {roc, ultimate_oscillator, ngram_novelty,
#:       embedding_dim_stats, pca_power_iteration, part_triangles,
#:       event_transitions, source_token_entropy, var_cvar, bq_topk,
#:       stream_event_transitions, return_autocorr} plus the 3
#:       indicator siblings deferred from r5 {force_index, elder_ray,
#:       ease_of_movement}. After this window every oracle-backed
#:       registry query has been in a driver window at least once;
#:   (b) the round-6 additions (alternating-algorithm connected
#:       components, streaming BQ top-k serving, and siblings);
#:   (c) re-verification of the r5 bench-drift cluster
#:       (embedding_neardup, cosine_topk, quality_score, bpe_encode,
#:       dashboard_snapshot) and the r5-restructured forecast family
#:       (holt_forecast, forecast_backtest, forecast_anomalies) —
#:       plan-adjacent code was touched in r5/r6 perf work, so a
#:       fresh green row re-anchors them.
#: Remaining slots rotate long-unverified r1/r2 queries (oldest
#: driver contact first) so no green row goes stale.
#:
#: ROUND-7 ROTATION NOTE: if this round's driver window runs as laid
#: out, EVERY oracle-backed registry query will have at least one
#: green driver CORRECTNESS row (the r6 additions are all in-window;
#: rounds 1-6 cover the rest). Round 7 should (a) front-load any r7
#: additions, (b) re-verify whatever r7 perf work touches, then
#: (c) rotate the queries with the OLDEST driver contact (r1: the
#: relational/TPC-H family — heikin_ashi, renko, raindrop, tsi, macd,
#: ema, exact_dedup siblings went green in r1/r2 and have not been
#: re-driven since).
_FIRST_50 = (
    # --- (a) never driver-verified: r5 additions ---
    "roc", "ultimate_oscillator", "ngram_novelty",
    "embedding_dim_stats", "pca_power_iteration", "part_triangles",
    "event_transitions", "source_token_entropy", "var_cvar",
    "bq_topk", "stream_event_transitions", "return_autocorr",
    # --- (a) never driver-verified: r5-deferred indicator siblings ---
    "force_index", "elder_ray", "ease_of_movement",
    # --- (b) round-6 additions ---
    "cc_alternating", "stream_bq_topk", "part_kcore",
    "sma_crossover_backtest", "kalman_level", "lang_confusion",
    "l_diversity_audit", "incremental_agg_merge",
    "stream_kalman_per_key", "priority_sample",
    "dedup_survivorship", "stoch_rsi", "dpo", "chaikin_oscillator",
    "bq_recall_eval", "part_bfs_hops", "stream_mv_merge",
    "ulcer_index", "mass_index", "coppock_curve",
    "tokenizer_fertility", "dedup_cluster_stats", "amihud_illiq",
    # --- (c) r5 bench-drift cluster + restructured forecast family ---
    "embedding_neardup", "cosine_topk", "quality_score", "bpe_encode",
    "dashboard_snapshot", "holt_forecast", "forecast_backtest",
    "forecast_anomalies",
    # --- rotation: oldest driver contact (r1/r2) first ---
    "signal_case", "sma", "rsi", "adx",
)


def _collect() -> dict[str, tuple[QueryFn, str | None]]:
    from .operators import relational, keyed
    mods = [relational, keyed]
    for name in ("operators.advanced", "operators.decision",
                 "operators.behavior", "operators.profile",
                 "operators.scale",
                 "operators.sketches", "operators.packing",
                 "operators.indicators", "operators.ewm",
                 "operators.channels",
                 "operators.resample",
                 "operators.patterns", "operators.transforms",
                 "operators.finance",
                 "operators.dedup", "operators.similarity",
                 "operators.graph", "operators.regression",
                 "operators.text", "operators.corpus", "operators.bpe",
                 "operators.retrieval",
                 "operators.multimodal",
                 "operators.sampling", "operators.warehouse",
                 "sources.json_io", "sources.formats",
                 "streaming.batch_parity"):
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
    # mismatch is still caught at test time; warn loudly so a shrunken
    # driver-verified window is also visible at runtime.
    dropped = [name for name in _FIRST_50 if name not in merged]
    if dropped:
        import warnings
        warnings.warn(
            f"registry: {len(dropped)} priority queries missing from the "
            f"merged registry (module import failure or rename?): {dropped}",
            RuntimeWarning, stacklevel=2)
    ordered = {name: merged[name] for name in _FIRST_50 if name in merged}
    ordered.update((k, v) for k, v in merged.items() if k not in ordered)
    return ordered


def all_queries() -> dict[str, tuple[QueryFn, str | None]]:
    return _collect()
