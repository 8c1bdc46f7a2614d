"""Approximate-aggregation sketches: HyperLogLog distinct counts,
approximate quantiles, and sketch mergeability.

The reference computes nothing approximate — its working set is 3
symbols x a few thousand rows (`kafka_producer/yahoo_finance_producer.
py:94`), so exact counts are free. At 100 TB, COUNT(DISTINCT) over a
high-cardinality key is one of the most expensive plans Spark can run
(a full shuffle of every distinct value); the sketch versions below are
the standard fix:

* `approx_count_distinct` — HyperLogLog++, fixed ~KB of state per
  group, one map-side-combinable pass, rsd-tunable error;
* `percentile_approx` — streaming quantile sketch (bounded state vs an
  exact percentile's per-group sort);
* `hll_sketch_agg` / `hll_union_agg` — Datasketches HLL with an
  explicit binary sketch column: partial sketches computed per
  partition/day can be UNIONED later, which is what makes incremental
  100 TB pipelines possible (sketch the new day, merge with
  yesterday's, never rescan history).

These queries return BOTH the approximation and the exact answer with
the realized error, so the correctness claim is quantified rather than
hash-matched: DuckDB's approx sketches are different implementations,
so these register rows-only (no oracle_sql); tests/test_sketches.py
asserts the error bounds instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table


def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct users: HLL++ estimate (rsd=2%) next to
    the exact count and the realized relative error. The exact branch
    exists to *measure* the sketch; a production 100 TB run keeps only
    the approx branch and skips the distinct shuffle entirely."""
    ev = load_table(spark, sf_dir, "events")
    agg = (ev.groupBy("event_type")
           .agg(F.count_distinct("user_id").alias("exact_users"),
                F.approx_count_distinct("user_id", 0.02).alias("approx_users")))
    return (agg.withColumn(
        "rel_err",
        F.abs(F.col("approx_users") - F.col("exact_users"))
        / F.col("exact_users"))
        .orderBy("event_type"))


def q_approx_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of event value per type: percentile_approx (bounded
    sketch state) next to the exact discrete percentile (per-group
    sort), with the worst relative deviation across the three probes.
    Both sides use DISC semantics (return a member value, no
    interpolation) so the comparison isolates pure sketch rank
    error."""
    ev = load_table(spark, sf_dir, "events")
    probes = "array(0.5D, 0.9D, 0.99D)"
    exact = ", ".join(
        f"percentile_disc({p}) WITHIN GROUP (ORDER BY value)"
        for p in ("0.5", "0.9", "0.99"))
    agg = (ev.groupBy("event_type")
           .agg(F.expr(f"percentile_approx(value, {probes}, 10000)")
                .alias("approx_q"),
                F.expr(f"array({exact})").alias("exact_q")))
    return (agg.select(
        "event_type",
        F.col("approx_q")[0].alias("p50"),
        F.col("approx_q")[1].alias("p90"),
        F.col("approx_q")[2].alias("p99"),
        F.aggregate(
            F.zip_with("approx_q", "exact_q",
                       lambda a, e: F.abs(a - e) / (F.abs(e) + F.lit(1e-9))),
            F.lit(0.0), lambda acc, x: F.greatest(acc, x)).alias("max_rel_err"))
        .orderBy("event_type"))


def q_hll_merge_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch mergeability — the property incremental pipelines rely
    on: per-type HLL sketches UNIONed must estimate the same global
    cardinality as one sketch built over all rows. Returns one row
    with both estimates; tests assert they are identical (same sketch
    algorithm, associative merge)."""
    ev = load_table(spark, sf_dir, "events")
    per_type = (ev.groupBy("event_type")
                .agg(F.hll_sketch_agg("user_id").alias("sk")))
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_estimate"))
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
        .alias("direct_estimate"))
    return merged.crossJoin(direct).select(
        "merged_estimate", "direct_estimate",
        (F.col("merged_estimate") == F.col("direct_estimate"))
        .alias("consistent"))


QUERIES = {
    "approx_distinct_users": (q_approx_distinct_users, None),
    "approx_value_quantiles": (q_approx_value_quantiles, None),
    "hll_merge_consistency": (q_hll_merge_consistency, None),
}
