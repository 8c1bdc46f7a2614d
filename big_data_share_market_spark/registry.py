"""Aggregate query registry: name -> (fn, duckdb_oracle_sql | None).

Single source of truth consumed by __spark_entry__.py (driver
contract), tests/test_parity.py (local oracle harness), and bench.py.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: The driver's hard correctness gate checks the FIRST 50 registry
#: entries. Rounds 1+2 drove 92 distinct queries green
#: (CORRECTNESS_r01.json ∪ CORRECTNESS_r02.json); this round front-loads
#: 50 oracle-backed queries the driver has NEVER checked — the
#: finance/sketch/text/corpus/multimodal/sampling/warehouse long tail.
#: Still outside the window after this round (rotate these in round 4):
#: candle_color and custkeys_except (plan-shape siblings of driver-green
#: signal_case / custkeys_intersect), the 4 rows-only sketch/numpy
#: queries (no SQL oracle by design), and the operators added after the
#: rotation froze — gopher_filters, dup_ngram_spans, semantic_dedup,
#: media_phash_dedup, kmeans_lloyd_step, ann_batch_topk,
#: neardup_split_leakage, lsh_bucket_health, token_budget_mixture,
#: heavy_hitters, ann_pq_topk, incremental_dedup, dedup_keep_longest,
#: length_outliers, eval_ngram_contamination, vocab_coverage,
#: minhash_est_quality, bm25_topk, quality_classifier, shard_manifest,
#: containment_neardup, dsir_weights, stream_corpus_token_totals,
#: stream_quality_gate — every one locally parity-green at
#: sf0.001, sf0.01 AND sf0.1 via the driver-identical harness.
_FIRST_50 = (
    # finance indicators (window + Arrow kernels)
    "bollinger_bands", "stochastic_oscillator", "obv", "rolling_zscore",
    "vwap_daily", "max_drawdown", "realized_volatility", "beta_vs_market",
    "corr_pairs",
    # time-grid / seasonality
    "missing_bars", "dow_seasonality",
    # rollups + scale patterns
    "incremental_ohlc_rollup", "ohlc_day_rollup", "bucketed_join_revenue",
    "partition_pruned_agg",
    # relational long tail
    "customer_balance_ranks", "custkeys_intersect",
    # warehouse / SCD2
    "scd2_order_priority", "scd2_snapshot",
    # dedup family
    "exact_dedup", "dedup_components", "ngram_jaccard_dedup",
    "ngram_jaccard_capped",
    # ANN / similarity
    "ann_lsh_topk", "ann_recall_eval", "label_centroids",
    # text analysis
    "token_count", "tfidf_top_terms", "pii_scrub", "bigram_counts",
    "winnowing_fingerprint", "lang_id", "doc_fingerprint",
    # corpus statistics
    "bigram_lm_score", "cross_split_contamination", "source_quality_stats",
    "length_histogram",
    # chunking / packing
    "chunk_documents", "pack_tokens",
    # multimodal plumbing
    "media_audio_segments", "media_resize", "media_decode_features",
    "media_frame_sample",
    # sampling
    "stratified_sample", "mixture_sample",
    # JSON I/O long tail
    "props_json_extract", "json_envelope_roundtrip",
    "jsonl_corrupt_tolerant_scan", "nested_array_roundtrip",
    # streaming long tail
    "stream_drawdown_per_key",
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
