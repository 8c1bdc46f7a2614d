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

from collections.abc import Iterator

import pandas as pd

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


# ---------------------------------------------------------------------------
# Heavy hitters (Misra-Gries candidates + exact recount)
# ---------------------------------------------------------------------------

#: Misra-Gries counter budget per partition. The guarantee: every token
#: whose GLOBAL frequency exceeds N/(k+1) appears in the union of the
#: per-partition summaries (if it were absent from a partition's
#: summary, its local count was <= n_p/(k+1); summing that bound over
#: partitions contradicts the global frequency). So candidates ⊇ true
#: heavy hitters, and the exact recount pass makes the output EXACT —
#: which is why this sketch query can carry a DuckDB oracle while the
#: HLL ones above cannot.
_MG_K = 64


def mg_update(counters: dict[str, int], token: str, w: int, k: int) -> None:
    """One weighted Misra-Gries update: add w to token's counter; if
    that overflows the k-counter budget, subtract the minimum counter
    value from every counter and drop zeros (the generalized decrement
    step — each subtraction removes equal mass from k+1 distinct
    tokens, bounding total undercount by N/(k+1))."""
    counters[token] = counters.get(token, 0) + w
    if len(counters) > k:
        m = min(counters.values())
        for t in list(counters):
            counters[t] -= m
            if counters[t] <= 0:
                del counters[t]


def _mg_candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-partition MG summary over whitespace tokens (lowered,
    str.split == trim + split-on-\\s+). Batches are value_counts'd
    first so the Python loop runs over UNIQUE tokens per batch, not
    rows — the update cost is O(vocab-per-batch), not O(tokens)."""
    counters: dict[str, int] = {}
    for pdf in batches:
        toks = pdf["text"].str.lower().str.split().explode().dropna()
        for token, w in toks.value_counts().items():
            mg_update(counters, token, int(w), _MG_K)
    yield pd.DataFrame({"token": list(counters.keys())})


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact tokens with frequency > N/(k+1) over the corpus, found
    WITHOUT a full-vocabulary shuffle: per-partition Misra-Gries
    summaries (bounded k counters each, map-side only) propose ≤
    k·partitions candidate tokens; an exact recount scans again and
    counts ONLY candidate tokens (broadcast semi-join before the
    groupBy, so the shuffle carries ≤ candidates rows, not the
    vocabulary). At 100 TB with a billions-of-terms vocabulary the
    naive groupBy(token) shuffle is the job-killer; this caps shuffle
    width at k·partitions regardless of vocabulary size.

    The MG superset guarantee (see _MG_K) makes the final answer
    exact, so the oracle is plain exact SQL."""
    docs = load_table(spark, sf_dir, "documents")
    cands = (docs.select("text")
             .mapInPandas(_mg_candidates, "token string")
             .distinct())

    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    total = docs.agg(F.sum(F.size(toks)).cast("long").alias("total"))
    exploded = (docs.select(F.explode_outer(toks).alias("token"))
                .filter(F.col("token").isNotNull()))
    return (
        exploded.join(F.broadcast(cands), "token", "left_semi")
        .groupBy("token").agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * (_MG_K + 1) > F.col("total"))
        .select("token", "cnt",
                (F.col("cnt") / F.col("total").cast("double")).alias("share"))
    )


_HEAVY_HITTERS_SQL = f"""
WITH t AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
  FROM documents),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM t),
c AS (SELECT token, COUNT(*) AS cnt FROM t GROUP BY token)
SELECT token, cnt, cnt / CAST((SELECT total FROM tot) AS DOUBLE) AS share
FROM c
WHERE cnt * {_MG_K + 1} > (SELECT total FROM tot)
"""


# ---------------------------------------------------------------------------
# Count-min sketch (deterministic, therefore ORACLE-checked)
# ---------------------------------------------------------------------------

#: CMS geometry: depth (independent hash rows) × width (buckets).
#: eps = e/width ≈ 1.1%, delta = e^-depth ≈ 1.8% — overcount of any
#: estimate is <= eps * total_tokens with prob 1 - delta.
_CMS_D = 4
_CMS_W = 256


def _cms_bucket_spark(seed: int) -> str:
    return (f"CAST(conv(substring(md5(concat('{seed}:', term)), 1, 15), "
            f"16, 10) AS BIGINT) % {_CMS_W}")


def _cms_bucket_duck(seed: int) -> str:
    return (f"CAST(('0x' || substring(md5('{seed}:' || term), 1, 15)) "
            f"AS BIGINT) % {_CMS_W}")


def q_cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over corpus token occurrences, then point
    estimates for the top-10 exact terms next to their true counts —
    (term, exact_cnt, cms_est, overcount). Unlike the HLL/KLL family
    (engine-native sketches, rows-only checks), this CMS uses FIXED
    md5-derived hash rows, so the whole sketch is deterministic
    integer arithmetic and the DuckDB oracle certifies it exactly —
    including the CMS guarantee overcount >= 0.

    Scale shape: the sketch is built from the (term, cnt) aggregate
    — one shuffle over corpus tokens, identical to what exact
    counting already needs map-side — and collapses to d×w = 1024
    integer cells regardless of corpus size; cells and the probe
    rows broadcast. Mergeability is the point at 100 TB: per-shard
    CMS cells ADD (sum per (row, bucket)), so sketching the new day
    and merging with yesterday's cells never rescans history —
    exactly the HLL-union story, but for point frequencies."""
    from .text import staged_tokens

    tf = (staged_tokens(spark, sf_dir)
          .select(F.explode_outer("toks").alias("term"))
          .filter(F.col("term").isNotNull())
          .groupBy("term").agg(F.count("*").alias("cnt")))
    buckets = [(s, F.expr(_cms_bucket_spark(s))) for s in range(_CMS_D)]
    cells = (
        tf.select("cnt", F.explode(F.array(*[
            F.struct(F.lit(s).alias("seed"), b.alias("bucket"))
            for s, b in buckets])).alias("sb"))
        .groupBy("sb.seed", "sb.bucket")
        .agg(F.sum("cnt").alias("cell"))
    )
    top = (tf.orderBy(F.desc("cnt"), F.asc("term")).limit(10)
           .select("term", F.col("cnt").alias("exact_cnt")))
    probes = top.select(
        "term", "exact_cnt", F.explode(F.array(*[
            F.struct(F.lit(s).alias("seed"), b.alias("bucket"))
            for s, b in buckets])).alias("sb"))
    est = (probes.join(F.broadcast(cells),
                       (F.col("sb.seed") == F.col("seed"))
                       & (F.col("sb.bucket") == F.col("bucket")))
           .groupBy("term", "exact_cnt")
           .agg(F.min("cell").alias("cms_est")))
    return est.select(
        "term", "exact_cnt", "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"))


_CMS_SQL = f"""
WITH tok AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents),
tf AS (SELECT term, COUNT(*) AS cnt FROM tok GROUP BY term),
sb AS (
  {" UNION ALL ".join(
      f"SELECT term, cnt, {s} AS seed, {_cms_bucket_duck(s)} AS bucket FROM tf"
      for s in range(_CMS_D))}),
cells AS (SELECT seed, bucket, SUM(cnt) AS cell
          FROM sb GROUP BY seed, bucket),
top AS (SELECT term, cnt AS exact_cnt FROM tf
        ORDER BY cnt DESC, term ASC LIMIT 10),
probe AS (
  {" UNION ALL ".join(
      f"SELECT term, exact_cnt, {s} AS seed, {_cms_bucket_duck(s)} AS bucket FROM top"
      for s in range(_CMS_D))}),
est AS (
  SELECT p.term, p.exact_cnt, MIN(c.cell) AS cms_est
  FROM probe p JOIN cells c ON p.seed = c.seed AND p.bucket = c.bucket
  GROUP BY p.term, p.exact_cnt)
SELECT term, exact_cnt, CAST(cms_est AS BIGINT) AS cms_est,
       CAST(cms_est - exact_cnt AS BIGINT) AS overcount
FROM est
"""


QUERIES = {
    "cms_token_counts": (q_cms_token_counts, _CMS_SQL),
    "approx_distinct_users": (q_approx_distinct_users, None),
    "approx_value_quantiles": (q_approx_value_quantiles, None),
    "hll_merge_consistency": (q_hll_merge_consistency, None),
    "heavy_hitters": (q_heavy_hitters, _HEAVY_HITTERS_SQL),
}
