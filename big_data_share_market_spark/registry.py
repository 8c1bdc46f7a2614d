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
#: ROUND-7 WINDOW (executed as the r6 rotation note laid out):
#:   (a) r7 additions — aqe_skew_join (AQE skew-split demo, plan
#:       pinned) and quantile_sketch_merge (mergeable fixed-bucket
#:       quantile summary, merge ≡ recompute oracle);
#:   (b) newly ORACLED formerly-rows-only queries —
#:       approx_value_quantiles (GK rank-bound emitted as the result)
#:       and cosine_topk_numpy (exact re-rank of the numpy shortlist,
#:       shares cosine_topk's oracle). Only the two HLL sketches
#:       remain rows-only by design;
#:   (c) re-verification of everything r7 perf/refactor work touched:
#:       the across-key vectorized Arrow kernels (_ewm_kernel /
#:       _kalman_kernel rewrite — every _apply_ewm rider) and the
#:       restart-safe MV-merge sink (batch-id-anchored generations);
#:       cosine_topk shares the re-shaped numpy twin's oracle;
#:       stream_upsert_idempotent re-anchors the upsert sink the
#:       restart test exercises;
#:   (d) rotation: 29 of the 42 queries whose last green driver row
#:       is STILL round 1 (the relational/TPC-H family).
#:
#: ROUND-8 ROTATION NOTE: rotate the 28 deferred r1 rows
#: {returned_item_revenue, important_part_value, promo_revenue,
#: small_quantity_revenue,
#: disjunctive_revenue, high_volume_part_suppliers,
#: suppliers_kept_waiting, idle_customer_balance, cohort_retention,
#: zorder_key, salted_skew_agg, orders_grouping_sets,
#: top_revenue_supplier, forecast_revenue, bilateral_volume,
#: market_share, product_profit, late_shipment_priorities,
#: large_volume_orders, customer_order_distribution, minmax_per_key,
#: trend_per_key, top_supplier_per_nation, orders_rollup,
#: asof_last_signup, range_join_pairs, events_pivot,
#: parts_never_ordered — the last fifteen bumped from
#: the r7 window by the third/fourth/fifth-wave additions} first, then the
#: r2 family (streams,
#: strategies, patterns, heikin_ashi/renko/raindrop, exact-dedup
#: siblings) — plus, as always, front-load r8 additions and anything
#: r8 code changes touch.
#:
#: R8 CANDIDATE CAPABILITY SPACE (surveyed at the end of r7; all of
#: the obvious operator families are now covered, so these are the
#: remaining genuinely-new seams): a streaming CUSUM/Page-Hinkley
#: drift detector (live twin of cusum_changepoint; running-mean
#: recursion has a recursive-CTE oracle), Arrow-optimized UDTF
#: (useArrow=True) A/B against the row UDTF, a Wilcoxon SIGNED-rank
#: test (paired twin of mannwhitney_u), per-key seasonal
#: decomposition by day-of-week means (oracle-friendly), and pair
#: subsampling for theil_sen on UNBOUNDED series (hash-stride the
#: (i, j) lattice — the documented production fallback).
_FIRST_50 = (
    # --- (a) round-7 additions ---
    "aqe_skew_join", "quantile_sketch_merge", "kmv_distinct_merge",
    "stream_quantile_sketch", "grouped_quantile_sketch",
    # (a, continued) r7 third wave: timeout sessionization A/B/C,
    # Spark-4 extensibility APIs (custom Python data source, UDTF),
    # robust regression, sketch set-ops.
    "stream_session_timeout", "udtf_sessionize",
    "python_datasource_ticks", "stream_python_datasource",
    "python_datasource_sink", "stream_python_datasource_sink",
    "theil_sen_trend", "kmv_intersection",
    # (a, continued) r7 fourth wave: the Spark-4 SQL surface —
    # recursive CTE, decorrelated LATERAL top-k, RANGE time frames.
    "recursive_cte_kalman", "lateral_topk_orders", "rolling_24h_value",
    # (a, continued) r7 fifth wave: the statistical QA layer —
    # trend significance, distribution drift, changepoint location.
    "mann_kendall_trend", "ks_two_sample", "mannwhitney_u",
    "cusum_changepoint",
    # --- (b) upgraded rows-only -> full oracle ---
    "approx_value_quantiles", "cosine_topk_numpy",
    # --- (c) r7 perf/refactor re-verification ---
    "ema", "macd", "tsi", "adx", "dashboard_snapshot",
    "atr_wilder", "chandelier_exit", "force_index", "elder_ray",
    "chaikin_oscillator", "kalman_level", "cosine_topk",
    "stream_mv_merge", "stream_upsert_idempotent",
    # --- (d) rotation: last green row is r1 ---
    "pricing_summary", "order_quantiles", "orders_cube",
    "shipping_priority", "region_revenue", "filter_project",
    "distinct_sort", "grouped_events", "top_orders",
    "topk_per_group", "semi_join_high_orders", "anti_join_no_orders",
    "order_fill_outer", "union_account_holders",
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
