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
#: ROUND-11 WINDOW (r10 verdict item 3 + the r10 rotation note): the
#: r10 window was frozen before that round's optimizer ran, so the
#: driver never re-oracled the heaviest r10 rewrites — this window
#: leads with every r10-rewritten path and everything the r11
#: optimization round touches, then the 7 r3 spill queries, then the
#: r4 family oldest-first.
#:
#: ROUND-12 ROTATION NOTE: the remaining 18 r4-last-green queries
#: {kmeans_lloyd_step, label_centroids, lsh_bucket_health,
#: media_phash_dedup, minhash_est_quality, neardup_split_leakage,
#: normalized_dedup, orc_roundtrip_agg, psi_drift,
#: quality_classifier, rrf_hybrid_topk, salted_skew_join,
#: schema_evolution_read, semantic_dedup, snapshot_diff, sq8_topk,
#: stream_ingest_dedup_gate, vocab_coverage}, then the r5 family
#: oldest-first — plus, as always, front-load r12 additions and
#: anything r12 code changes touch.
_FIRST_50 = (
    # --- (a) r11-touched paths: the pagerank frontier-width fix,
    # the PCA driver-overhead restructure, and the scale-adaptive
    # keyed_repartition width in theil_sen_fit/_apply_ewm (every
    # consumer of the changed unsorted kernel path gets a fresh
    # driver row) ---
    "part_pagerank", "pca_power_iteration", "theil_sen_trend",
    "ema", "macd", "tsi", "adx", "atr_wilder", "chandelier_exit",
    "force_index", "elder_ray", "chaikin_oscillator",
    "dashboard_snapshot", "holt_winters", "holt_forecast",
    # --- (b) r10 rewrites the driver has not yet re-oracled (the
    # r10 window predated the optimizer): one-pass triangles, the
    # vectorized session-timeout kernel, the 3 sort-barrier dedups,
    # and the staged daily-returns consumers ---
    "part_triangles", "stream_session_timeout",
    "ngram_jaccard_dedup", "ngram_jaccard_capped",
    "containment_neardup",
    "rolling_covariance", "corr_pairs", "cross_sectional_momentum",
    "variance_ratio",
    # --- (c) the 7 r3-last-green spill queries (oldest rows in the
    # evidence chain) ---
    "source_quality_stats", "stochastic_oscillator",
    "stratified_sample", "stream_drawdown_per_key",
    "tfidf_top_terms", "vwap_daily", "winnowing_fingerprint",
    # --- (d) rotation: the r4 family oldest-first (19 of 45;
    # containment_neardup is already in (b); the rest spill to r12
    # per the note above) ---
    "ab_test_ztest", "ann_batch_topk", "ann_pq_topk",
    "binaryfile_ingest", "bloom_incremental_dedup", "bm25_topk",
    "candle_color", "csv_roundtrip", "curriculum_stages",
    "custkeys_except", "dedup_keep_longest", "dsir_weights",
    "eval_ngram_contamination", "file_zonemap_audit", "gdpr_erasure",
    "gopher_filters", "heavy_hitters", "incremental_dedup",
    # r11-touched (narrow cells-shaped Lloyd recompute), so it takes
    # the r4-rotation seat its sibling kmeans_lloyd_step held; the
    # sibling moves to the r12 spill.
    "kmeans_train",
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
