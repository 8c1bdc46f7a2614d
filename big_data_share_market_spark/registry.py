"""Aggregate query registry: name -> (fn, duckdb_oracle_sql | None).

Single source of truth consumed by __spark_entry__.py (driver
contract), tests/test_parity.py (local oracle harness), and bench.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: The driver's hard correctness gate checks the FIRST 50 registry
#: entries. Rounds 1-3 drove 141 distinct queries green
#: (CORRECTNESS_r01 ∪ r02 ∪ r03). This round front-loads the 35
#: remaining never-driver-checked queries — the r3-added operator
#: wave (semantic dedup, k-means, PQ/batch ANN, gopher/DSIR, BM25,
#: sketches, format round-trips, streaming corpus accounting) plus
#: label_centroids (r3 FAIL: array column broke the driver's value
#: hasher; output is now scalar rows) — and fills the remaining 15
#: slots with the round-4 continuation wave (bloom dedup, CDC diff,
#: salted join, BPE, SQ8, zone-map audit, PSI, A/B z-test, RRF,
#: GDPR, binary ingest, schema evolution, streaming ingest gate),
#: which are also never-driver-checked. After this round the union
#: covers the whole registry except lang_temperature_sample and
#: domain_cap_sample (sampling-family siblings driver-green; next
#: rotation) and the 4 rows-only sketch/numpy queries (no SQL oracle
#: by design; the driver records rows-only checks for them here).
#:
#: ROUND-5 ROTATION NOTE: after this round's driver run, the
#: never-driver-verified set is exactly the round-4 continuation
#: additions — lang_temperature_sample, domain_cap_sample (deferred
#: from r4), segment_dedup_rebuild, part_pagerank, ols_price_model,
#: dpp_join_prune, tfidf_cosine_pairs, cms_token_counts,
#: edit_distance_neardup, variant_props_stats, holt_forecast,
#: holt_winters, forecast_anomalies, stream_holt_per_key, cdc_apply,
#: contract_check_lineitem — plus the late-r4 wave: forecast_backtest,
#: click_attribution, atr_wilder, williams_r, cci, mfi, cmf,
#: keltner_channels, ichimoku, pivot_points, parabolic_sar,
#: compaction_plan, mmr_rerank, stream_atr_per_key,
#: hard_negative_mining, dashboard_snapshot, supertrend,
#: donchian_channels, chandelier_exit, volume_profile,
#: drawdown_duration, kama, trix, vortex, k_anonymity_audit,
#: aroon, force_index, elder_ray, ease_of_movement,
#: stream_supertrend_per_key.
#: That never-verified set is now ~46 — nearly a full window;
#: front-load ALL of it next rotation (the remaining ~4 slots:
#: lang_temperature_sample, domain_cap_sample, and two perf-touched
#: re-verifications from the staged dedup family).
_FIRST_50 = (
    # --- never driver-verified (35) ---
    # changed this round: scalar-row output / pruned verify / oracle fix
    "label_centroids", "containment_neardup", "ann_batch_topk",
    "csv_roundtrip",
    # sketches (rows-only by design: HLL/KLL have no DuckDB twin)
    "approx_distinct_users", "approx_value_quantiles",
    "hll_merge_consistency", "cosine_topk_numpy",
    # dedup long tail
    "incremental_dedup", "dedup_keep_longest", "dup_ngram_spans",
    "neardup_split_leakage", "minhash_est_quality", "semantic_dedup",
    # ANN / clustering long tail
    "ann_pq_topk", "kmeans_lloyd_step", "kmeans_train",
    "lsh_bucket_health",
    # corpus / quality long tail
    "vocab_coverage", "gopher_filters", "dsir_weights",
    "length_outliers", "eval_ngram_contamination", "bm25_topk",
    "quality_classifier", "curriculum_stages", "token_budget_mixture",
    "heavy_hitters",
    # multimodal / sharding / formats
    "media_phash_dedup", "shard_manifest", "orc_roundtrip_agg",
    # plan-shape siblings rotated out earlier
    "candle_color", "custkeys_except",
    # streaming corpus accounting
    "stream_corpus_token_totals", "stream_quality_gate",
    # --- round-4 continuation wave (15, also never driver-checked;
    # the re-verification picks they displaced were all driver-green
    # in r1/r2 and unchanged since, so every slot now buys new
    # coverage; lang_temperature_sample and domain_cap_sample wait
    # for the next rotation — their sampling-family siblings are
    # driver-green) ---
    "bloom_incremental_dedup", "snapshot_diff", "salted_skew_join",
    "normalized_dedup", "winsorized_stats", "sq8_topk", "bpe_encode",
    "file_zonemap_audit", "psi_drift", "ab_test_ztest",
    "rrf_hybrid_topk", "gdpr_erasure", "binaryfile_ingest",
    "schema_evolution_read", "stream_ingest_dedup_gate",
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
