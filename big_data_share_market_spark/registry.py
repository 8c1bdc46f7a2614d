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
#: ROUND-9 WINDOW (executes the r8 rotation note): after this window
#: every r2-last-green query has a fresh row — nothing oracle-backed
#: is older than r3.
#:
#: ROUND-10 WINDOW (executes the r9 rotation note): r10 additions +
#: everything the r10 diff touched (the shared _s/_sq moment helpers
#: now convert decimal→double through STRING, so every consumer gets
#: a fresh row; the FK audit was fused to one-scan-per-child; the
#: recursive-CTE Kalman gained checkpoint lifecycle management), then
#: 41 of the 49 r3-last-green queries. The spill below goes first
#: next round.
#:
#: ROUND-11 ROTATION NOTE: first the 7 r3 spill queries
#: {source_quality_stats, stochastic_oscillator, stratified_sample,
#: stream_drawdown_per_key, tfidf_top_terms, vwap_daily,
#: winnowing_fingerprint}, then the r4 family oldest-first — plus,
#: as always, front-load r11 additions and anything r11 code
#: changes touch.
_FIRST_50 = (
    # --- (a) round-10 additions: AR order selection (composes the
    # ACF/PACF/Ljung-Box kit), rolling pairwise covariance/
    # correlation (the bounded-universe risk-model input), the
    # Lo-MacKinlay variance-ratio random-walk screen, and the
    # per-day Fama-MacBeth cross-sectional momentum regression ---
    "ar_order_select", "rolling_covariance", "variance_ratio",
    "cross_sectional_momentum",
    # --- (b) re-verification of everything r10 code touched:
    # the five _s/_sq consumers (string-path double conversion),
    # the fused FK audit, and the recursive-CTE Kalman's
    # checkpoint-unpersist lifecycle ---
    "realized_volatility", "beta_vs_market", "corr_pairs",
    "return_autocorr", "acf_multi_lag", "fk_integrity_audit",
    "recursive_cte_kalman",
    # --- (c) rotation: 39 of the 49 r3-last-green queries (three of
    # the 49 — beta_vs_market/corr_pairs/realized_volatility — are
    # already in (b); the 7-query spill is listed in the ROUND-11
    # note above) ---
    "json_envelope_roundtrip", "jsonl_corrupt_tolerant_scan",
    "props_json_extract", "exact_dedup", "token_count",
    "ann_lsh_topk", "ann_recall_eval", "bigram_counts",
    "bigram_lm_score", "bollinger_bands", "bucketed_join_revenue",
    "chunk_documents", "cross_split_contamination",
    "custkeys_intersect", "customer_balance_ranks",
    "dedup_components", "doc_fingerprint", "dow_seasonality",
    "incremental_ohlc_rollup", "lang_id", "length_histogram",
    "max_drawdown", "media_audio_segments", "media_decode_features",
    "media_frame_sample", "media_resize", "missing_bars",
    "mixture_sample", "nested_array_roundtrip",
    "ngram_jaccard_capped", "ngram_jaccard_dedup", "obv",
    "ohlc_day_rollup", "pack_tokens", "partition_pruned_agg",
    "pii_scrub", "rolling_zscore", "scd2_order_priority",
    "scd2_snapshot",
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
