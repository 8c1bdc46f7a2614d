"""Aggregate query registry: name -> (fn, duckdb_oracle_sql | None).

Single source of truth consumed by __spark_entry__.py (driver
contract), tests/test_parity.py (local oracle harness), and bench.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: The driver's hard correctness gate checks the FIRST 50 registry
#: entries. Rounds 1-4 drove 187 distinct queries green
#: (CORRECTNESS_r01 ∪ r02 ∪ r03 ∪ r04). Round 5 window =
#:   (a) the 7 round-4 hash FAILs, all one root cause now fixed
#:       (DuckDB SUM(integer) → HUGEINT/decimal128 vs Spark int64;
#:       oracles now CAST ... AS BIGINT, and length_outliers aligns
#:       med/mad to BIGINT on both engines) — re-driven first for
#:       green CORRECTNESS rows;
#:   (b) 43 of the 46 never-driver-verified round-4 additions
#:       (channel/trend indicator wave, Holt/forecast family, CDC,
#:       pagerank, OLS, MMR, hard-negative mining, compaction,
#:       attribution, k-anonymity, VARIANT props, the 3 stream state
#:       machines, and the deferred sampling pair). The two latent
#:       HUGEINT bugs in this set (segment_dedup_rebuild.n_removed,
#:       variant_props_stats.sum_k) are fixed pre-contact.
#: Three row-local indicator siblings are deferred to round 6 for
#: lack of slots: force_index, elder_ray, ease_of_movement — the
#: lowest-risk defers available; they share the staged-hourly-bars
#: path and arithmetic shape with atr_wilder/cci/mfi/cmf, which ARE
#: in-window, and all three are strict-type oracle-green locally.
#:
#: ROUND-6 ROTATION NOTE: after this round's driver run the
#: never-driver-verified set is exactly the 3 deferred indicator
#: siblings {force_index, elder_ray, ease_of_movement} plus the 8
#: round-5 additions {roc, ultimate_oscillator, ngram_novelty,
#: embedding_dim_stats, pca_power_iteration, part_triangles,
#: event_transitions, source_token_entropy, var_cvar, bq_topk,
#: stream_event_transitions, return_autocorr} — 15 queries.
#: Front-load all 15, then
#: spend the free slots re-verifying perf-touched
#: queries (the similarity explode rewrite touched
#: embedding_dim_stats/pca only; holt_forecast/forecast_backtest/
#: forecast_anomalies were restructured this round and deserve a
#: re-check even though they are in the r5 window).
_FIRST_50 = (
    # --- (a) round-4 FAILs, HUGEINT/typing root cause fixed ---
    "dup_ngram_spans", "length_outliers", "token_budget_mixture",
    "shard_manifest", "stream_corpus_token_totals",
    "stream_quality_gate", "winsorized_stats",
    # --- (b) never driver-verified: r4 continuation wave ---
    "lang_temperature_sample", "domain_cap_sample",
    "segment_dedup_rebuild", "part_pagerank", "ols_price_model",
    "dpp_join_prune", "tfidf_cosine_pairs", "cms_token_counts",
    "edit_distance_neardup", "variant_props_stats",
    "holt_forecast", "holt_winters", "forecast_anomalies",
    "stream_holt_per_key", "cdc_apply", "contract_check_lineitem",
    # --- (b) never driver-verified: late-r4 wave ---
    "forecast_backtest", "click_attribution", "atr_wilder",
    "williams_r", "cci", "mfi", "cmf", "keltner_channels",
    "ichimoku", "pivot_points", "parabolic_sar", "compaction_plan",
    "mmr_rerank", "stream_atr_per_key", "hard_negative_mining",
    "dashboard_snapshot", "supertrend", "donchian_channels",
    "chandelier_exit", "volume_profile", "drawdown_duration",
    "kama", "trix", "vortex", "k_anonymity_audit", "aroon",
    "stream_supertrend_per_key",
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
