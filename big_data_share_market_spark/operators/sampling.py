"""Deterministic sampling / split operators for training-data
pipelines: reproducible train/val/test assignment and stratified
downsampling over `documents`.

Both are built on a portable content hash: the first two hex chars of
`md5(salt || doc_id)` mapped to an integer 0..255 via
`strpos('0123456789abcdef', c)` — every engine (Spark, DuckDB, any
SQL) computes the identical value, so split membership is stable
across engines, re-runs, and cluster sizes. No RNG, no
`rand()`-with-seed (whose sequence is partitioning-dependent in a
distributed engine and therefore NOT reproducible at scale).

Scale notes: both operators are narrow scans (hash + filter per row,
zero shuffle for the split; one tiny counts-aggregate broadcast back
for the stratified rates). At 100 TB the split is embarrassingly
parallel and the counts table is bytes-sized (one row per stratum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..tables import load_table

_HEX = "0123456789abcdef"

#: 0..255 thresholds for the 80/10/10 split: hash < 204 -> train
#: (204/256 = 79.7%), < 230 -> val (10.2%), else test.
_TRAIN_LT = 204
_VAL_LT = 230


def hash256(col, salt: str):
    """Integer 0..255 from the first two hex chars of md5(salt||col) —
    engine-portable (strpos over a hex alphabet, no hex->int casts)."""
    h = F.md5(F.concat(F.lit(salt), col.cast("string")))
    c1 = F.substring(h, 1, 1)
    c2 = F.substring(h, 2, 1)
    return ((F.instr(F.lit(_HEX), c1) - 1) * 16
            + (F.instr(F.lit(_HEX), c2) - 1))


def hash256_sql(expr: str, salt: str) -> str:
    """DuckDB mirror of :func:`hash256`."""
    h = f"md5('{salt}' || CAST({expr} AS VARCHAR))"
    return (f"((strpos('{_HEX}', substring({h}, 1, 1)) - 1) * 16"
            f" + (strpos('{_HEX}', substring({h}, 2, 1)) - 1))")


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 80/10/10 train/val/test assignment per document.
    Pure row-local expression — no shuffle, no state; adding documents
    never reassigns existing ones (the property that matters for
    incremental 100 TB corpus builds)."""
    docs = load_table(spark, sf_dir, "documents")
    h = hash256(F.col("doc_id"), "split:")
    return docs.select(
        "doc_id",
        h.alias("bucket"),
        F.when(h < _TRAIN_LT, "train")
        .when(h < _VAL_LT, "val")
        .otherwise("test").alias("split"),
    )


_HASH_SPLIT_SQL = f"""
SELECT doc_id,
       {hash256_sql('doc_id', 'split:')} AS bucket,
       CASE WHEN {hash256_sql('doc_id', 'split:')} < {_TRAIN_LT} THEN 'train'
            WHEN {hash256_sql('doc_id', 'split:')} < {_VAL_LT} THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balancing downsample: each language stratum is kept at
    rate min_count/count (the minority class survives whole), decided
    by integer cross-multiply `hash256 * cnt < 256 * min_cnt` — exact,
    no float thresholds. The per-stratum counts aggregate is one row
    per language; it broadcast-joins back onto the scan, so the only
    shuffle is over the tiny counts side."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").alias("cnt"))
    # Global min over the stratum counts via an unpartitioned window:
    # the counts frame is one row per language, so the single-partition
    # window is bytes-sized — no cartesian/BNLJ shape in the plan.
    rates = counts.withColumn("min_cnt", F.min("cnt").over(W.partitionBy()))
    h = hash256(F.col("doc_id"), "sample:")
    return (
        docs.join(F.broadcast(rates), "lang")
        .filter(h * F.col("cnt") < 256 * F.col("min_cnt"))
        .select("doc_id", "lang")
    )


_STRATIFIED_SQL = f"""
WITH counts AS (SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY lang),
rates AS (SELECT lang, cnt, (SELECT MIN(cnt) FROM counts) AS min_cnt FROM counts)
SELECT d.doc_id, d.lang
FROM documents d JOIN rates r USING (lang)
WHERE {hash256_sql('d.doc_id', 'sample:')} * r.cnt < 256 * r.min_cnt
"""


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture sampling: downsample each source so the kept
    corpus matches target mixture WEIGHTS (here 3:1 for even-/odd-
    numbered sources — the "more web, less forum" knob of a real
    pretraining mix) at the largest feasible total without
    upsampling. All-integer math: the feasible scale T* =
    min_s floor(cnt_s * Wsum / w_s), and a row survives iff
    h * cnt_s * Wsum < 256 * w_s * T* — exact cross-multiply, no
    float rates, so Spark and the oracle agree row-for-row.

    Scale: counts aggregate is one row per source (broadcast back);
    the keep decision is row-local. Same shape as stratified_sample —
    the only shuffle is over the bytes-sized counts side."""
    docs = load_table(spark, sf_dir, "documents")
    src_num = F.regexp_extract("source", r"(\d+)", 1).cast("int")
    weight = F.when(src_num % 2 == 0, F.lit(3)).otherwise(F.lit(1))
    counts = (docs.groupBy("source")
              .agg(F.count("*").alias("cnt"))
              .withColumn("w", weight))
    sized = (counts
             .withColumn("wsum", F.sum("w").over(W.partitionBy()))
             .withColumn("tstar",
                         F.min(F.expr("(cnt * wsum) div w"))
                         .over(W.partitionBy())))
    h = hash256(F.col("doc_id"), "mix:")
    return (
        docs.join(F.broadcast(sized), "source")
        .filter(h * F.col("cnt") * F.col("wsum")
                < 256 * F.col("w") * F.col("tstar"))
        .select("doc_id", "source", F.col("w").alias("weight"))
    )


_MIXTURE_SQL = f"""
WITH counts AS (
  SELECT source, COUNT(*) AS cnt,
         CASE WHEN TRY_CAST(regexp_extract(source, '(\\d+)', 1) AS INT) % 2 = 0
              THEN 3 ELSE 1 END AS w
  FROM documents GROUP BY source),
sized AS (
  SELECT source, cnt, w,
         (SELECT SUM(w) FROM counts) AS wsum,
         (SELECT MIN(cnt * (SELECT SUM(w) FROM counts) // w) FROM counts)
           AS tstar
  FROM counts)
SELECT d.doc_id, d.source, s.w AS weight
FROM documents d JOIN sized s USING (source)
WHERE {hash256_sql('d.doc_id', 'mix:')} * s.cnt * s.wsum
      < 256 * s.w * s.tstar
"""


def q_token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture: allocate a global TOKEN budget (40% of the
    corpus) across sources by the same 3:1 even/odd weights as
    `mixture_sample`, then take documents per source in a reproducible
    hash order until each source's budget is filled. This is the
    token-weighted form of mixture sampling — the knob real
    pretraining mixes are specified in (tokens per source, not
    documents per source).

    The greedy take needs a running token total per source in a fixed
    order. A flat `SUM OVER (PARTITION BY source ORDER BY ...)` sorts
    every row of a hot source on ONE task — the classic window skew.
    Instead this uses the distributed two-level prefix sum:

      1. bucket each doc by hash256 (0..255) — the ORDER is
         (bucket, doc_id), so bucket prefixes are order prefixes;
      2. per (source, bucket) partial token sums — map-side combinable
         aggregate, ≤256 rows per source;
      3. exclusive per-source prefix over those 256 partials — a
         window over a bytes-sized frame;
      4. running sum WITHIN each (source, bucket) + the bucket's
         offset — 256-way parallel per source instead of one task.

    Identical output to the flat window (the oracle IS the flat
    window), but no single-task sort of a 100 TB source."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    t = docs.select(
        "doc_id", "source", n_tokens.alias("n_tokens"),
        hash256(F.col("doc_id"), "budget:").alias("bucket"))

    src_num = F.regexp_extract("source", r"(\d+)", 1).cast("int")
    weight = F.when(src_num % 2 == 0, F.lit(3)).otherwise(F.lit(1))
    budgets = (t.groupBy("source")
               .agg(F.sum("n_tokens").alias("src_tokens"))
               .withColumn("w", weight.cast("long"))
               .withColumn("g", F.sum("src_tokens").over(W.partitionBy()))
               .withColumn("wsum", F.sum("w").over(W.partitionBy()))
               .withColumn(
                   "budget",
                   F.expr("((g * 2) div 5) * w div wsum"))
               .select("source", "budget"))

    partials = (t.groupBy("source", "bucket")
                .agg(F.sum("n_tokens").alias("bsum")))
    offsets = partials.withColumn(
        "off",
        F.coalesce(
            F.sum("bsum").over(
                W.partitionBy("source").orderBy("bucket")
                .rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0)))

    running = F.sum("n_tokens").over(
        W.partitionBy("source", "bucket").orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, 0))
    return (
        t.join(F.broadcast(offsets.select("source", "bucket", "off")),
               ["source", "bucket"])
        .withColumn("cum_tokens", F.col("off") + running)
        .join(F.broadcast(budgets), "source")
        .filter(F.col("cum_tokens") <= F.col("budget"))
        .select("doc_id", "source", "n_tokens", "cum_tokens")
    )


_TOKEN_BUDGET_SQL = f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
           AS n_tokens,
         {hash256_sql('doc_id', 'budget:')} AS bucket
  FROM documents),
budgets AS (
  SELECT source,
         ((SELECT SUM(n_tokens) FROM t) * 2 // 5)
           * (CASE WHEN TRY_CAST(regexp_extract(source, '(\\d+)', 1) AS INT)
                        % 2 = 0 THEN 3 ELSE 1 END)
           // (SELECT SUM(CASE WHEN TRY_CAST(regexp_extract(source, '(\\d+)', 1)
                                             AS INT) % 2 = 0
                               THEN 3 ELSE 1 END)
               FROM (SELECT DISTINCT source FROM documents))
           AS budget
  FROM (SELECT DISTINCT source FROM documents)),
c AS (
  SELECT doc_id, source, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY source ORDER BY bucket,
                  doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM t)
SELECT c.doc_id, c.source, c.n_tokens, c.cum_tokens
FROM c JOIN budgets b USING (source)
WHERE c.cum_tokens <= b.budget
"""


def q_curriculum_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum data ordering: bucket each document into one of 4
    difficulty stages (by length quartile WITHIN its source — short
    docs first is the usual text-curriculum heuristic) plus a
    reproducible shuffle key, so a trainer reading
    ORDER BY (stage, shuffle_bucket, doc_id) gets easy→hard stages,
    each internally well-mixed.

    Scale shape — deliberately NOT an exact ntile: a global (or
    per-source) ntile needs a total sort of the corpus on one task
    chain. Instead the stage boundaries are the per-source
    percentile_disc quartiles — one bytes-per-source aggregate
    broadcast back — and the stage assignment is a row-local
    comparison. Same pattern as length_outliers: the only thing that
    shuffles is the quartile table."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars")
    qs = docs.groupBy("source").agg(*[
        F.expr(f"percentile_disc({p}) WITHIN GROUP (ORDER BY n_chars)")
        .alias(f"q{i}")
        for i, p in enumerate(("0.25", "0.5", "0.75"), start=1)])
    stage = (F.lit(1)
             + (F.col("n_chars") > F.col("q1")).cast("int")
             + (F.col("n_chars") > F.col("q2")).cast("int")
             + (F.col("n_chars") > F.col("q3")).cast("int"))
    return (docs.join(F.broadcast(qs), "source")
            .select("doc_id", "source", "n_chars",
                    stage.alias("stage"),
                    hash256(F.col("doc_id"), "order:")
                    .alias("shuffle_bucket")))


_CURRICULUM_SQL = f"""
WITH qs AS (
  SELECT source,
         quantile_disc(n_chars, 0.25) AS q1,
         quantile_disc(n_chars, 0.5)  AS q2,
         quantile_disc(n_chars, 0.75) AS q3
  FROM documents GROUP BY source)
SELECT d.doc_id, d.source, d.n_chars,
       1 + CAST(d.n_chars > q.q1 AS INT)
         + CAST(d.n_chars > q.q2 AS INT)
         + CAST(d.n_chars > q.q3 AS INT) AS stage,
       {hash256_sql('d.doc_id', 'order:')} AS shuffle_bucket
FROM documents d JOIN qs q USING (source)
"""


def q_lang_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based multilingual rebalancing (the XLM-R / mT5
    α-sampling scheme): sample language ``l`` proportionally to
    ``n_l^α`` so low-resource languages are over-represented relative
    to their natural share. Here α = 0.5 with the scale anchored at
    the smallest language (it keeps 100%), which collapses the target
    to ``t_l = floor(sqrt(min_cnt * n_l))`` — the GEOMETRIC MEAN of
    each language's count with the smallest count.

    α = 0.5 is chosen deliberately for engine parity: IEEE-754 sqrt
    is exactly rounded, so Spark and DuckDB compute bit-identical
    targets from the same BIGINT product — a pow(x, 0.7) would risk
    last-ulp drift between libm implementations and flip a
    floor-boundary row. Membership is the usual engine-portable
    hash-threshold cross-multiply (h * n_l < 256 * t_l), so the kept
    set is reproducible across engines, re-runs, and cluster sizes.

    Scale: one bytes-sized per-language counts aggregate broadcast
    back onto a narrow scan; the keep decision is row-local. Zero
    corpus-sized shuffles at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (docs.groupBy("lang").agg(F.count("*").alias("cnt"))
              .withColumn("min_cnt", F.min("cnt").over(W.partitionBy()))
              .withColumn("target", F.floor(
                  F.sqrt((F.col("min_cnt") * F.col("cnt")).cast("double"))))
              .select("lang", "cnt", "target"))
    h = hash256(F.col("doc_id"), "temp:")
    return (docs.join(F.broadcast(counts), "lang")
            .filter(h * F.col("cnt") < 256 * F.col("target"))
            .select("doc_id", "lang", "target"))


_LANG_TEMPERATURE_SQL = f"""
WITH counts AS (
  SELECT lang, COUNT(*) AS cnt,
         (SELECT MIN(c) FROM (SELECT COUNT(*) AS c
                              FROM documents GROUP BY lang)) AS min_cnt
  FROM documents GROUP BY lang),
targets AS (
  SELECT lang, cnt,
         CAST(floor(sqrt(CAST(min_cnt * cnt AS DOUBLE))) AS BIGINT)
           AS target
  FROM counts)
SELECT d.doc_id, d.lang, t.target
FROM documents d JOIN targets t USING (lang)
WHERE {hash256_sql('d.doc_id', 'temp:')} * t.cnt < 256 * t.target
"""


_DOMAIN_CAP = 20


def q_domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (the Dolma / RefinedWeb "no domain may
    dominate" rule): keep at most ``_DOMAIN_CAP`` documents per
    source, chosen in a reproducible hash order so the kept subset is
    an unbiased sample of the domain, not its first rows.

    The rank every doc needs is per-source over ORDER BY
    (hash-bucket, doc_id). A flat ``row_number() OVER (PARTITION BY
    source ORDER BY ...)`` sorts every row of a hot domain on ONE
    task — exactly the skew this operator exists to police. Instead,
    the same two-level distributed rank as `token_budget_mixture`:

      1. bucket each doc by hash256 (0..255);
      2. per (source, bucket) COUNTS — map-side combinable, ≤256
         rows per source;
      3. exclusive prefix over those counts — a window over a
         bytes-sized frame;
      4. row_number WITHIN each (source, bucket) + the bucket's
         offset — 256-way parallel per source.

    Output includes the dropped rows (keep = false) so the caller
    can audit how much each domain lost — the no-silent-caps rule."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "source",
        hash256(F.col("doc_id"), "cap:").alias("bucket"))
    partials = t.groupBy("source", "bucket").agg(F.count("*").alias("bn"))
    offsets = partials.withColumn(
        "off",
        F.coalesce(
            F.sum("bn").over(
                W.partitionBy("source").orderBy("bucket")
                .rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0)))
    rn = F.row_number().over(
        W.partitionBy("source", "bucket").orderBy("doc_id"))
    return (
        t.join(F.broadcast(offsets.select("source", "bucket", "off")),
               ["source", "bucket"])
        .withColumn("rank", (F.col("off") + rn).cast("long"))
        .select("doc_id", "source", "rank",
                (F.col("rank") <= _DOMAIN_CAP).alias("keep"))
    )


_DOMAIN_CAP_SQL = f"""
WITH t AS (
  SELECT doc_id, source,
         {hash256_sql('doc_id', 'cap:')} AS bucket
  FROM documents)
SELECT doc_id, source,
       row_number() OVER (PARTITION BY source ORDER BY bucket, doc_id)
         AS rank,
       row_number() OVER (PARTITION BY source ORDER BY bucket, doc_id)
         <= {_DOMAIN_CAP} AS keep
FROM t
"""


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (priority sampling, top-k)
# ---------------------------------------------------------------------------

#: Sample size for the priority sample — deliberately smaller than
#: every fixture's corpus (500 docs at sf0.001/0.01) so the weighted
#: cut is actually exercised.
_PRIO_K = 200


def q_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample WITHOUT replacement by priority sampling
    (Duffield, Lund & Thorup 2007, public): each row gets priority
    u/w — u a deterministic 60-bit hash uniform, w its mixture weight
    (the 3:1 even/odd-source convention of q_mixture_sample) — and
    the k smallest priorities are the sample. Weight-3 rows draw
    priorities from a 3×-compressed range, so they are ~3× more
    likely to make the cut: the fixed-size counterpart of
    mixture_sample's rate-based thinning (a pipeline uses THIS when
    it needs exactly k rows — eval panels, human-review batches —
    and thinning when it needs a fraction).

    Scale shape: the priority is row-local codegen; top-k is
    TakeOrderedAndProject — no global sort, no per-group state, the
    same one-pass selection at any corpus size (distributed reservoir
    semantics without reservoir state).

    Exactness: u is an integer, w a small integer, and u/w a single
    IEEE division — bit-identical on both engines with zero
    transcendentals (the reason for priority sampling's u/w key over
    A-ES's u^(1/w): pow() drifts cross-engine, division cannot);
    ties break by doc_id."""
    docs = load_table(spark, sf_dir, "documents")
    src_num = F.regexp_extract("source", r"(\d+)", 1).cast("int")
    weight = F.when(src_num % 2 == 0, F.lit(3)).otherwise(F.lit(1))
    u60 = F.conv(F.substring(
        F.md5(F.concat(F.lit("prio:"), F.col("doc_id").cast("string"))),
        1, 15), 16, 10).cast("long")
    prio = u60.cast("double") / weight.cast("double")
    return (docs.select("doc_id", "source", weight.alias("weight"),
                        prio.alias("priority"))
            .orderBy("priority", "doc_id")
            .limit(_PRIO_K))


_PRIORITY_SAMPLE_SQL = f"""
WITH w AS (
  SELECT doc_id, source,
         CASE WHEN TRY_CAST(regexp_extract(source, '(\\d+)', 1) AS INT)
                   % 2 = 0
              THEN 3 ELSE 1 END AS weight
  FROM documents)
SELECT doc_id, source, weight,
       CAST(CAST(('0x' || substring(
              md5('prio:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
            AS DOUBLE) / CAST(weight AS DOUBLE) AS priority
FROM w
ORDER BY priority, doc_id
LIMIT {_PRIO_K}
"""


QUERIES = {
    "priority_sample": (q_priority_sample, _PRIORITY_SAMPLE_SQL),
    "hash_split": (q_hash_split, _HASH_SPLIT_SQL),
    "lang_temperature_sample": (q_lang_temperature_sample,
                                _LANG_TEMPERATURE_SQL),
    "domain_cap_sample": (q_domain_cap_sample, _DOMAIN_CAP_SQL),
    "curriculum_stages": (q_curriculum_stages, _CURRICULUM_SQL),
    "stratified_sample": (q_stratified_sample, _STRATIFIED_SQL),
    "mixture_sample": (q_mixture_sample, _MIXTURE_SQL),
    "token_budget_mixture": (q_token_budget_mixture, _TOKEN_BUDGET_SQL),
}
