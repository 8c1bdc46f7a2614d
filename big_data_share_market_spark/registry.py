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
#: ROUND-8 WINDOW (executed as the r7 rotation note laid out): the
#: r8 additions close the last surveyed capability seams — Wilcoxon
#: signed-rank (paired twin of mannwhitney_u), day-of-week seasonal
#: decomposition, the live CUSUM/Page drift detector (restart-tested),
#: the Arrow-UDTF A/B twin, and the stride-capped bounded-work forms
#: of the two O(n²) pair statistics — then everything r8 review fixes
#: touched, then the 28 deferred r1 relational rows, then the start
#: of the r2 family.
#:
#: ROUND-9 ROTATION NOTE: continue the r2 family — scalping_strategy, heikin_ashi,
#: renko, raindrop (bumped from the r8 window by the wave-2/3
#: additions),
#: then the remaining streams {stream_signal_bars, stream_sliding_bars,
#: stream_session_windows, stream_ema_per_key,
#: stream_dedup_within_watermark, stream_static_enrich,
#: stream_interval_join, stream_left_outer_interval_join}, the
#: strategy/pattern family {range_trading_strategy, momentum_strategy,
#: breakout_strategy, ascending_triangle, descending_triangle,
#: rounding_bottom}, chart transforms {ohlc_bars, candle_color,
#: last_per_key, dedup_upsert, latest_n_per_key, flatten_nested,
#: json_envelope_roundtrip, jsonl_corrupt_tolerant_scan,
#: props_json_extract}, and the r3+ dedup/text/similarity families
#: oldest-first — plus, as always, front-load r9 additions and
#: anything r9 code changes touch.
_FIRST_50 = (
    # --- (a) round-8 additions ---
    # Statistical-QA completions: the paired-location test, weekly
    # seasonality screen, the live drift detector, and the
    # stride-capped bounded-work twins of the O(n²) pair statistics.
    "wilcoxon_signed_rank", "seasonal_decompose_dow",
    "stream_cusum_drift", "mann_kendall_capped", "theil_sen_capped",
    # Wave 2: the nonparametric correlation pair on the shared
    # subject pairing.
    "spearman_corr", "kendall_tau_pairs", "cusum_binary_seg",
    "seasonal_strength_dow",
    # Arrow-serializer UDTF A/B twin.
    "udtf_sessionize_arrow",
    # --- (b) re-verification of everything r8 code touched ---
    # udtfs.py oracle tie-order fix; state.py session disorder fix;
    # sqlfeatures.py conf handling; pydatasource.py restart cursor;
    # stats.py docstring + new shared helpers next to the r7 tests.
    "udtf_sessionize", "stream_session_timeout", "recursive_cte_kalman",
    "python_datasource_ticks", "stream_python_datasource",
    "python_datasource_sink", "stream_python_datasource_sink",
    "ks_two_sample", "mann_kendall_trend", "theil_sen_trend",
    # --- (c) rotation: the 28 deferred r1 rows (last driver contact
    # round 1; staging/session/plan-report code has changed since) ---
    "returned_item_revenue", "important_part_value", "promo_revenue",
    "small_quantity_revenue", "disjunctive_revenue",
    "high_volume_part_suppliers", "suppliers_kept_waiting",
    "idle_customer_balance", "cohort_retention", "zorder_key",
    "salted_skew_agg", "orders_grouping_sets", "top_revenue_supplier",
    "forecast_revenue", "bilateral_volume", "market_share",
    "product_profit", "late_shipment_priorities", "large_volume_orders",
    "customer_order_distribution", "minmax_per_key", "trend_per_key",
    "top_supplier_per_nation", "orders_rollup", "asof_last_signup",
    "range_join_pairs", "events_pivot", "parts_never_ordered",
    # --- (d) rotation: start of the r2 family (oldest next) ---
    "stream_ohlc_bars", "stream_last20_per_key",
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
                 "operators.udtfs", "operators.sqlfeatures",
                 "operators.stats",
                 "operators.retrieval",
                 "operators.multimodal",
                 "operators.sampling", "operators.warehouse",
                 "sources.json_io", "sources.formats",
                 "sources.pydatasource",
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
