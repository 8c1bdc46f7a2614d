"""Deduplication operators for large-scale training-data pipelines:
exact (hash-groupBy), n-gram Jaccard, MinHash+LSH, SimHash.

Beyond the reference (its only dedup is the upsert PK, SURVEY §2.D5) —
these are the document-level dedup family a 100 TB text corpus needs.

Scale design:
* exact dedup is one shuffle on the fingerprint;
* n-gram Jaccard joins on the shingle — at corpus scale the shingle
  join explodes on hot shingles, which is exactly why MinHash+LSH
  exists: the LSH variant only joins on (band, signature) buckets,
  turning the candidate search into an equi-join with bounded fanout,
  then verifies true Jaccard only for candidates;
* all hashing is md5-derived (64-bit prefix) so Spark and the DuckDB
  oracle agree exactly; at production scale xxhash64 would be the
  faster drop-in.

Tokenization contract (shared with text.py): lowercase, trim, split
on \\s+, word 3-gram shingles, distinct.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import fan_out, load_table

# Spark-side word-3-gram shingles (0-based); DuckDB mirror is 1-based.
_SHINGLES_EXPR = (
    "array_distinct(transform(sequence(0, size(w) - 3), "
    "i -> concat_ws(' ', w[i], w[i+1], w[i+2])))")

_SHINGLES_CTE = """
sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(w) - 1),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingles
  FROM (SELECT doc_id,
               string_split_regex(trim(lower(text)), '\\s+') AS w
        FROM documents)
  WHERE len(w) >= 3)
"""


#: Staged shingle corpus per (SparkContext, sf_dir) — see _shingled.
_SH_CACHE: dict[tuple[str, str], DataFrame] = {}


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """doc_id → distinct word-3-gram shingle array, ≥3-word docs only,
    STAGED: persisted MEMORY_AND_DISK and cached per
    (SparkContext, sf_dir).

    Staging rationale: five operators (Jaccard/containment/minhash
    dedup, clean-corpus, minhash-quality eval) each reference this
    relation 2-4 times in one plan — candidate generation, stats, and
    the two verify-join sides — and Spark does NOT dedupe common plan
    subtrees, so without staging the interpreted higher-order shingle
    transform re-runs over the corpus once per reference (measured:
    minhash_lsh_dedup 2.04 s → 1.06 s at sf0.1 with staging). A 100 TB
    deployment does exactly this: shingle the corpus once into a
    staging store, run every dedup sweep off the staged relation —
    MEMORY_AND_DISK is Spark's local-mode equivalent of that stage.
    Cache keys include applicationId, so a new SparkContext never sees
    a stale handle.

    The <3-words filter is a CHEAP predicate on the raw text placed
    below the fan_out shuffle on purpose: a filter written on the
    shingle array would be substituted through the Project and pushed
    below the repartition, dragging the expensive interpreted
    higher-order shingle expression onto the narrow scan side (single
    task on the fixture). Keeping the heavy transform above the
    exchange runs it at full width."""
    from pyspark import StorageLevel

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _SH_CACHE.get(key)
    if cached is not None:
        return cached
    docs = load_table(spark, sf_dir, "documents").filter(
        F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")) >= 3)
    sh = (
        fan_out(spark, docs)
        .withColumn("w", F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
        .withColumn("shingles", F.expr(_SHINGLES_EXPR))
        .select("doc_id", "shingles")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _SH_CACHE[key] = sh
    return sh


# ---------------------------------------------------------------------------
# Exact dedup (prefix fingerprint)
# ---------------------------------------------------------------------------

def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content fingerprint — md5 of the first-8-word
    normalized prefix (full-text md5 finds nothing in this corpus; the
    planted near-dups share prefixes, which is the CommonCrawl-style
    URL/prefix dedup). Keep = min doc_id per group.

    ONE shuffle total: min/count as window aggs over partitionBy(fp)
    instead of groupBy + join-back (which shuffles the table twice and
    re-reads the scan)."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.concat_ws(" ", F.slice(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 1, 8)))
    w = Window.partitionBy("fp")
    return (
        docs.select("doc_id", fp.alias("fp"))
        .withColumn("keep_doc_id", F.min("doc_id").over(w))
        .withColumn("n_copies", F.count("*").over(w))
        .withColumn("keep", F.col("doc_id") == F.col("keep_doc_id"))
        .select("doc_id", "fp", "keep_doc_id", "n_copies", "keep")
    )


_EXACT_DEDUP_SQL = """
WITH f AS (
  SELECT doc_id,
         md5(array_to_string(list_slice(
           string_split_regex(trim(lower(text)), '\\s+'), 1, 8), ' ')) AS fp
  FROM documents),
g AS (SELECT fp, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_copies
      FROM f GROUP BY fp)
SELECT f.doc_id, f.fp, g.keep_doc_id, g.n_copies,
       f.doc_id = g.keep_doc_id AS keep
FROM f JOIN g USING (fp)
"""


# ---------------------------------------------------------------------------
# n-gram Jaccard near-dup (shingle join)
# ---------------------------------------------------------------------------

_DF_CAP = 32

_PAIR_EXPAND = (
    "flatten(transform(ids, (x, i) -> "
    "transform(slice(ids, i + 2, size(ids)), "
    "y -> struct(x AS a_id, y AS b_id))))")


#: Staged shingle document-frequency index per (SparkContext, sf_dir).
_DF_CACHE: dict[tuple[str, str], DataFrame] = {}


def _shingle_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(shingle, df) document-frequency index over the staged shingle
    corpus, STAGED itself: four operators (Jaccard dedup ×2,
    containment candidates, duplicate-span counting) each need df to
    split rare from hot shingles, and the 450 k-row explode + count
    agg otherwise re-runs once per reference (twice within
    `_pruned_pair_candidates` alone — the rare and hot branches are
    separate subtree executions). A production set-similarity join
    materializes exactly this relation as the posting-list/df side of
    its index."""
    from pyspark import StorageLevel

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _DF_CACHE.get(key)
    if cached is not None:
        return cached
    sh = _shingled(spark, sf_dir)
    dfc = (sh.select(F.explode_outer("shingles").alias("shingle"))
           .filter(F.col("shingle").isNotNull())
           .groupBy("shingle").agg(F.count("*").alias("df"))
           .persist(StorageLevel.MEMORY_AND_DISK))
    _DF_CACHE[key] = dfc
    return dfc


def _pruned_pair_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate (a_id, b_id) pairs from the df-capped shingle
    expansion, annotated with everything a PROVABLE similarity upper
    bound needs — the prefix-filter step of a set-similarity join
    (PPJoin-style): verify arithmetic only ever runs on pairs that
    could clear the threshold.

    Columns: a_id, b_id, shared_rare (exact count of shared shingles
    with df in (1, _DF_CAP] — each contributes exactly one pair row
    because per-doc shingles are distinct), n_a/n_b (full shingle-set
    sizes), h_a/h_b (count of HOT shingles, df > _DF_CAP, per doc).
    Since df=1 shingles cannot be shared, the true intersection
    satisfies  inter <= shared_rare + least(h_a, h_b)  — callers prune
    on that bound, which is exact-recall (never drops a qualifying
    pair) and on the fixture cuts 1.13M candidates to the ~256
    survivors BEFORE the wide array-verify join.

    Scale: every step is a bounded equi-shuffle — df counts come from
    the staged `_shingle_df` index (constant-size agg buffers,
    computed once per corpus), pair expansion is capped at
    _DF_CAP²/2 rows per shingle, the hot-shingle doc-count join
    touches only hot occurrences (AQE broadcasts the tiny hot list),
    and the verify join downstream sees survivors only."""
    sh = _shingled(spark, sf_dir)
    exploded = (sh.select("doc_id",
                          F.explode_outer("shingles").alias("shingle"))
                .filter(F.col("shingle").isNotNull()))
    dfc = _shingle_df(spark, sf_dir)
    rare = (dfc.filter((F.col("df") > 1) & (F.col("df") <= _DF_CAP))
            .select("shingle"))
    hot = dfc.filter(F.col("df") > _DF_CAP).select("shingle")
    n_hot = (exploded.join(hot, "shingle")
             .groupBy("doc_id").agg(F.count("*").alias("n_hot")))
    stats = (sh.select("doc_id", F.size("shingles").alias("n_sh"))
             .join(n_hot, "doc_id", "left")
             .fillna(0, subset=["n_hot"]))
    pairs = (
        exploded.join(rare, "shingle")
        .groupBy("shingle")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .select(F.explode(F.expr(_PAIR_EXPAND)).alias("p"))
        .groupBy("p.a_id", "p.b_id")
        .agg(F.count("*").alias("shared_rare"))
        .select(F.col("a_id"), F.col("b_id"), "shared_rare")
    )
    sa = stats.select(F.col("doc_id").alias("a_id"),
                      F.col("n_sh").alias("n_a"),
                      F.col("n_hot").alias("h_a"))
    sb = stats.select(F.col("doc_id").alias("b_id"),
                      F.col("n_sh").alias("n_b"),
                      F.col("n_hot").alias("h_b"))
    return pairs.join(sa, "a_id").join(sb, "b_id")


def _ub_inter() -> Column:
    """Provable upper bound on the TRUE shingle intersection of a
    candidate pair: inter <= shared_rare + least(h_a, h_b). Shared hot
    shingles are at most the smaller per-doc hot count; shared rare
    shingles are counted exactly; df=1 shingles cannot be shared.
    Built lazily — constructing a Column requires an active
    SparkContext, so module import must not do it."""
    return F.col("shared_rare") + F.least("h_a", "h_b")


def _verify_shingle_pairs(sh: DataFrame, cand: DataFrame) -> DataFrame:
    """Join surviving candidate pairs back to the FULL shingle sets and
    compute the exact intersection size once. Output: a_id, b_id,
    inter, plus the sizes (sz_a, sz_b) the caller's exact score needs."""
    sa = sh.select(F.col("doc_id").alias("a_id"),
                   F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("b_id"),
                   F.col("shingles").alias("sh_b"))
    return (
        cand.select("a_id", "b_id").join(sa, "a_id").join(sb, "b_id")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("sz_a", F.size("sh_a"))
        .withColumn("sz_b", F.size("sh_b"))
        .select("a_id", "b_id", "inter", "sz_a", "sz_b")
    )


def q_ngram_jaccard_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs with word-3-gram Jaccard ≥ 0.8 — the
    join-based candidate generator: shingle equi-join
    (a.doc_id < b.doc_id) restricted to shingles with document
    frequency ≤ _DF_CAP, then an exact-Jaccard verify over the FULL
    shingle sets (array_intersect), so scores are exact and only
    recall is capped (a pair sharing exclusively hot boilerplate
    shingles is missed — the thing the cap is FOR).

    The cap is what makes the self-join scale-safe: without it a
    stop-phrase shingle appearing in k docs emits k² join rows — a
    job-killing skew key at 100 TB. With it, fan-out is ≤ cap²/2 rows
    per shingle. The oracle applies the identical cap, so parity is
    exact. Sibling `q_ngram_jaccard_capped` produces the same pairs
    from a groupBy pair-expansion instead of a self-join (one scan of
    the shingle stream instead of two)."""
    sh = _shingled(spark, sf_dir)
    # explode_outer + IS NOT NULL: plain explode makes the optimizer
    # infer `size(shingles) > 0` and push the WHOLE shingle transform
    # below the fan_out exchange into the scan filter, re-running it
    # serially (see eval_ngram_contamination for the measurement).
    exploded = (sh.select("doc_id",
                          F.explode_outer("shingles").alias("shingle"))
                .filter(F.col("shingle").isNotNull()))
    rare = (_shingle_df(spark, sf_dir)
            .filter((F.col("df") > 1) & (F.col("df") <= _DF_CAP))
            .select("shingle"))
    capped = exploded.join(rare, "shingle")
    a = capped.alias("a")
    b = capped.alias("b")
    cand = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("a_id"),
                F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("a_id"),
                   F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("b_id"),
                   F.col("shingles").alias("sh_b"))
    return (
        cand.join(sa, "a_id").join(sb, "b_id")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("jaccard",
                    F.col("inter")
                    / (F.size("sh_a") + F.size("sh_b") - F.col("inter")))
        .filter(F.col("jaccard") >= 0.8)
        .select("a_id", "b_id", "jaccard")
        # Barrier before the presentation sort (r10): a global orderBy
        # range-samples its child, which RE-EXECUTES everything since
        # the last exchange — here the whole broadcast-join +
        # array_intersect verify (measured: the duplicated pass was
        # ~40% of this query's wall). The hash exchange materializes
        # the tiny survivor set once; the sampler then reads shuffle
        # files. Same rows, same final order.
        .repartition("a_id")
        .orderBy("a_id", "b_id")
    )


_NGRAM_JACCARD_SQL = f"""
WITH {_SHINGLES_CTE},
e AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
df AS (SELECT shingle, COUNT(*) AS n_docs FROM e GROUP BY shingle),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN df ON df.shingle = a.shingle
  WHERE df.n_docs <= {_DF_CAP})
SELECT a_id, b_id,
       len(list_intersect(sa.shingles, sb.shingles))
         / (len(sa.shingles) + len(sb.shingles)
            - len(list_intersect(sa.shingles, sb.shingles))) AS jaccard
FROM cand
JOIN sh sa ON sa.doc_id = a_id
JOIN sh sb ON sb.doc_id = b_id
WHERE len(list_intersect(sa.shingles, sb.shingles))
        / (len(sa.shingles) + len(sb.shingles)
           - len(list_intersect(sa.shingles, sb.shingles))) >= 0.8
ORDER BY a_id, b_id
"""


def q_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale-safe form of the shingle-join baseline: shingles with
    document frequency > _DF_CAP (32) are excluded from CANDIDATE
    generation (they are the join-explosion source — a shingle shared
    by n docs contributes n² candidate rows), and candidates come from
    a bounded in-bucket pair expansion instead of a self-join. The
    exact-Jaccard verify still runs on FULL shingle sets, so scores
    are exact; only recall is capped: a pair sharing exclusively hot
    shingles is missed — by construction those pairs are
    overwhelmingly boilerplate, the thing near-dup capping is FOR.
    The oracle applies the identical cap, so parity is exact.
    Fan-out bound: ≤ cap²/2 candidate rows per shingle vs unbounded
    in the naive join."""
    sh = _shingled(spark, sf_dir)
    # explode_outer + IS NOT NULL: plain explode makes the optimizer
    # infer `size(shingles) > 0` and push the WHOLE shingle transform
    # below the fan_out exchange into the scan filter, re-running it
    # serially (see eval_ngram_contamination for the measurement).
    exploded = (sh.select("doc_id",
                          F.explode_outer("shingles").alias("shingle"))
                .filter(F.col("shingle").isNotNull()))
    # Two-step cap: COUNT first (constant-size aggregation buffer even
    # for a shingle shared by millions of docs — the staged
    # `_shingle_df` index), join the surviving rare shingles back, and
    # only then collect the ≤ cap ids per shingle. A single
    # collect_list-then-filter pass would build the full id array for
    # exactly the hot shingles the cap neutralizes.
    rare = (_shingle_df(spark, sf_dir)
            .filter((F.col("df") > 1) & (F.col("df") <= _DF_CAP))
            .select("shingle"))
    cand = (
        exploded.join(rare, "shingle")
        .groupBy("shingle")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .select(F.explode(F.expr(
            "flatten(transform(ids, (x, i) -> "
            "transform(slice(ids, i + 2, size(ids)), "
            "y -> struct(x AS a_id, y AS b_id))))")).alias("p"))
        .select("p.a_id", "p.b_id")
        .distinct()
    )
    sa = sh.select(F.col("doc_id").alias("a_id"),
                   F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("b_id"),
                   F.col("shingles").alias("sh_b"))
    return (
        cand.join(sa, "a_id").join(sb, "b_id")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("jaccard",
                    F.col("inter")
                    / (F.size("sh_a") + F.size("sh_b") - F.col("inter")))
        .filter(F.col("jaccard") >= 0.8)
        .select("a_id", "b_id", "jaccard")
        # Sort-sampler barrier — see q_ngram_jaccard_dedup (measured
        # here: 3.8-4.0 s -> 2.4-2.5 s, the map-side verify no longer
        # runs twice).
        .repartition("a_id")
        .orderBy("a_id", "b_id")
    )


_NGRAM_CAPPED_SQL = f"""
WITH {_SHINGLES_CTE},
e AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
df AS (SELECT shingle, COUNT(*) AS n_docs FROM e GROUP BY shingle),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN df ON df.shingle = a.shingle
  WHERE df.n_docs <= {_DF_CAP})
SELECT a_id, b_id,
       len(list_intersect(sa.shingles, sb.shingles))
         / (len(sa.shingles) + len(sb.shingles)
            - len(list_intersect(sa.shingles, sb.shingles))) AS jaccard
FROM cand
JOIN sh sa ON sa.doc_id = a_id
JOIN sh sb ON sb.doc_id = b_id
WHERE len(list_intersect(sa.shingles, sb.shingles))
        / (len(sa.shingles) + len(sb.shingles)
           - len(list_intersect(sa.shingles, sb.shingles))) >= 0.8
ORDER BY a_id, b_id
"""


# ---------------------------------------------------------------------------
# Bounded in-bucket pair expansion (shared by MinHash / SimHash /
# embedding LSH candidate generation)
# ---------------------------------------------------------------------------

#: Max ids per LSH bucket entering pair expansion. Fixture buckets top
#: out at ~190 (sf0.1 embeddings), so the cap never bites on test data;
#: at scale ONE degenerate bucket (e.g. all-zero vectors, empty docs)
#: would otherwise collect every id into a single array on one task —
#: the cap bounds that to O(cap²) pairs.
_BUCKET_CAP = 256


def capped_pair_expand(buckets: DataFrame, cap: int = _BUCKET_CAP,
                       ) -> tuple[DataFrame, DataFrame]:
    """Bounded in-bucket pair expansion over a frame with a sorted
    `ids` array column: pairs come from only the first `cap` ids per
    bucket, so a degenerate bucket costs O(cap²) rows instead of O(n²).

    Returns ``(pairs, stats)``. ``pairs``: distinct (a_id < b_id).
    ``stats``: one row — n_buckets, n_truncated, dropped_pairs — so
    truncation is VISIBLE (the no-silent-caps rule); callers log or
    assert on it, tests/test_invariants.py exercises the degenerate
    path. The DuckDB oracles mirror the identical cap (row_number ≤
    cap by ascending id over the same sorted order), so oracle parity
    holds even when the cap bites."""
    sized = (buckets
             .withColumn("n", F.size("ids").cast("long"))
             .withColumn("kept", F.least(F.col("n"), F.lit(cap).cast("long"))))
    stats = sized.agg(
        F.count("*").alias("n_buckets"),
        F.sum((F.col("n") > cap).cast("long")).alias("n_truncated"),
        F.sum(((F.col("n") * (F.col("n") - 1)
                - F.col("kept") * (F.col("kept") - 1)) / F.lit(2))
              .cast("long")).alias("dropped_pairs"))
    pairs = (
        sized.filter(F.col("n") > 1)
        .select(F.slice("ids", 1, cap).alias("ids_c"))
        .select(F.explode(F.expr(
            "flatten(transform(ids_c, (x, i) -> "
            "transform(slice(ids_c, i + 2, size(ids_c)), "
            "y -> struct(x AS a_id, y AS b_id))))")).alias("p"))
        .select("p.a_id", "p.b_id")
        .distinct()
    )
    return pairs, stats


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (the 100 TB path)
# ---------------------------------------------------------------------------

_N_HASHES = 8
_BAND_ROWS = 2  # 4 bands × 2 rows
_MH_P = 2147483647  # 2^31 − 1; a·h fits int64 (a < 2^17, h < 2^31)
_MH_A = (769, 1543, 3079, 6151, 12289, 24593, 49157, 98317)
_MH_B = (12345, 20264, 28183, 36102, 44021, 51940, 59859, 67778)


#: Staged MinHash signature store per (SparkContext, sf_dir).
_MH_CACHE: dict[tuple[str, str], DataFrame] = {}


def _minhash_sigs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, mh0..mh7) MinHash signatures, STAGED like `_shingled`:
    persisted MEMORY_AND_DISK once per (SparkContext, sf_dir).

    Hash family: ONE md5-derived base hash per shingle, then 8 affine
    permutations h_i = (a_i·h + b_i) mod (2³¹−1) — the classic
    MinHash family. Computed entirely MAP-SIDE off the staged shingle
    corpus (transform() for h0, array_min(transform(...)) per
    permutation) — no explode + groupBy(doc_id) shuffle ever.

    Staging rationale: three operators (LSH dedup, signature-quality
    eval, split-leakage) reference the signature transform 1-3× per
    plan, and a production MinHash deployment persists exactly this
    relation as its signature store (signatures are the index; the
    corpus is re-read only to verify candidates)."""
    from pyspark import StorageLevel

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _MH_CACHE.get(key)
    if cached is not None:
        return cached
    sh = _shingled(spark, sf_dir)
    h0s = F.expr(
        "transform(shingles, s -> CAST(conv(substring(md5(s), 1, 15), 16, 10) "
        f"AS BIGINT) % {_MH_P})")
    sigs = (
        sh.withColumn("h0s", h0s)
        .select("doc_id", *[
            F.expr(f"array_min(transform(h0s, h -> ({a} * h + {b}) % {_MH_P}))")
            .alias(f"mh{i}")
            for i, (a, b) in enumerate(zip(_MH_A, _MH_B))])
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    _MH_CACHE[key] = sigs
    return sigs


def minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verified near-dup pairs (a_id < b_id, jaccard ≥ 0.8) — the
    reusable core of q_minhash_lsh_dedup, also consumed by
    q_clean_corpus.

    MinHash(8) signatures (`_minhash_sigs`, staged) → 4 LSH bands →
    bucket equi-join for candidates → exact Jaccard verify ≥ 0.8.

    The join key is (band, signature-pair) — bounded fanout at any
    corpus size, unlike the raw shingle join.

    Shuffle budget (the 100 TB concern): candidates come from ONE
    groupBy(band, sig) over 4·|docs| short rows with in-bucket pair
    expansion, not a bands⋈bands self-join (which would execute the
    whole minhash subtree twice — Spark does not dedupe common plan
    subtrees). Integer arithmetic is exact on both engines, so the
    oracle mirrors it verbatim."""
    sh = _shingled(spark, sf_dir)
    minhash = _minhash_sigs(spark, sf_dir)
    bands = minhash.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(k).alias("band"),
                     F.concat_ws(",", f"mh{2 * k}", f"mh{2 * k + 1}").alias("sig"))
            for k in range(_N_HASHES // _BAND_ROWS)])).alias("bs")
    ).select("doc_id", "bs.band", "bs.sig")
    cand, _ = capped_pair_expand(
        bands.groupBy("band", "sig")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids")))
    # verify candidates with true Jaccard on the shingle sets
    sa = sh.select(F.col("doc_id").alias("a_id"), F.col("shingles").alias("sh_a"))
    sb = sh.select(F.col("doc_id").alias("b_id"), F.col("shingles").alias("sh_b"))
    return (
        cand.join(sa, "a_id").join(sb, "b_id")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("jaccard",
                    F.col("inter")
                    / (F.size("sh_a") + F.size("sh_b") - F.col("inter")))
        .filter(F.col("jaccard") >= 0.8)
        .select("a_id", "b_id", "jaccard")
    )


def q_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """See :func:`minhash_pairs`."""
    return minhash_pairs(spark, sf_dir).orderBy("a_id", "b_id")


def q_minhash_est_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality eval for the MinHash index (sibling of
    ann_recall_eval and lsh_bucket_health): for every LSH candidate
    pair, the signature-agreement ESTIMATE of Jaccard (matching
    minhash components / 8 — the unbiased estimator the sketch
    promises) next to the EXACT shingle-set Jaccard and the signed
    error. This is the number that justifies — or refutes — trusting
    an 8-hash signature before a 100 TB dedup sweep.

    Same staged signature store + one bucket groupBy as
    minhash_pairs; the eval joins back signatures AND shingle sets
    (both staged relations, read from cache per reference — the m
    subtree appears 3× in this plan) for candidate rows only.
    All-integer agreement counts, so the oracle matches exactly."""
    sh = _shingled(spark, sf_dir)
    m = _minhash_sigs(spark, sf_dir).join(sh, "doc_id")
    bands = m.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(F.lit(k).alias("band"),
                     F.concat_ws(",", f"mh{2 * k}", f"mh{2 * k + 1}").alias("sig"))
            for k in range(_N_HASHES // _BAND_ROWS)])).alias("bs")
    ).select("doc_id", "bs.band", "bs.sig")
    cand, _ = capped_pair_expand(
        bands.groupBy("band", "sig")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids")))
    ma = m.select(F.col("doc_id").alias("a_id"),
                  F.col("shingles").alias("sh_a"),
                  *[F.col(f"mh{i}").alias(f"a{i}") for i in range(_N_HASHES)])
    mb = m.select(F.col("doc_id").alias("b_id"),
                  F.col("shingles").alias("sh_b"),
                  *[F.col(f"mh{i}").alias(f"b{i}") for i in range(_N_HASHES)])
    agree = sum(F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
                for i in range(_N_HASHES))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    return (
        cand.join(ma, "a_id").join(mb, "b_id")
        .withColumn("est_jaccard", agree / F.lit(float(_N_HASHES)))
        .withColumn("jaccard",
                    inter / (F.size("sh_a") + F.size("sh_b") - inter))
        .withColumn("est_err", F.col("est_jaccard") - F.col("jaccard"))
        .select("a_id", "b_id", "est_jaccard", "jaccard", "est_err")
    )


_MINHASH_CTES = f"""{_SHINGLES_CTE},
hashed AS (
  SELECT doc_id,
         list_transform(shingles,
           s -> CAST(('0x' || substring(md5(s), 1, 15)) AS BIGINT) % {_MH_P}
         ) AS h0s
  FROM sh),
minhash AS (
  SELECT doc_id,
         {", ".join(f"list_min(list_transform(h0s, h -> ({a} * h + {b}) % {_MH_P})) AS mh{i}"
                    for i, (a, b) in enumerate(zip(_MH_A, _MH_B)))}
  FROM hashed),
bands AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {k} AS band, mh{2 * k} || ',' || mh{2 * k + 1} AS sig FROM minhash"
      for k in range(_N_HASHES // _BAND_ROWS))}),
ranked AS (
  SELECT doc_id, band, sig,
         row_number() OVER (PARTITION BY band, sig ORDER BY doc_id) AS rn
  FROM bands),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM ranked a JOIN ranked b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
  WHERE a.rn <= {_BUCKET_CAP} AND b.rn <= {_BUCKET_CAP}),
neardup_pairs AS (
  SELECT a_id, b_id,
         len(list_intersect(sa.shingles, sb.shingles))
           / (len(sa.shingles) + len(sb.shingles)
              - len(list_intersect(sa.shingles, sb.shingles))) AS jaccard
  FROM cand
  JOIN sh sa ON sa.doc_id = a_id
  JOIN sh sb ON sb.doc_id = b_id
  WHERE len(list_intersect(sa.shingles, sb.shingles))
          / (len(sa.shingles) + len(sb.shingles)
             - len(list_intersect(sa.shingles, sb.shingles))) >= 0.8)"""

_MINHASH_SQL = f"""
WITH {_MINHASH_CTES}
SELECT a_id, b_id, jaccard FROM neardup_pairs
ORDER BY a_id, b_id
"""

_MINHASH_EST_SQL = f"""
WITH {_MINHASH_CTES}
SELECT c.a_id, c.b_id,
       ({" + ".join(f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END"
                    for i in range(_N_HASHES))})
         / CAST({_N_HASHES} AS DOUBLE) AS est_jaccard,
       len(list_intersect(sa.shingles, sb.shingles))
         / (len(sa.shingles) + len(sb.shingles)
            - len(list_intersect(sa.shingles, sb.shingles))) AS jaccard,
       ({" + ".join(f"CASE WHEN a.mh{i} = b.mh{i} THEN 1 ELSE 0 END"
                    for i in range(_N_HASHES))})
         / CAST({_N_HASHES} AS DOUBLE)
         - len(list_intersect(sa.shingles, sb.shingles))
           / (len(sa.shingles) + len(sb.shingles)
              - len(list_intersect(sa.shingles, sb.shingles))) AS est_err
FROM cand c
JOIN minhash a ON a.doc_id = c.a_id
JOIN minhash b ON b.doc_id = c.b_id
JOIN sh sa ON sa.doc_id = c.a_id
JOIN sh sb ON sb.doc_id = c.b_id
"""


# Reusable CTE chain (shingles → signatures → bands → candidates →


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 32

def _simhash_kernel(batches):
    """Arrow-batched 32-bit SimHash, bit-identical to the SQL oracle:
    token hash = int(md5(token).hexdigest()[:15], 16) (60 bits, fits
    int64), per-bit votes = 2·popcount_of_column − n_tokens, bit set
    iff votes > 0. The bit matrix is vectorized with numpy; only the
    md5 per unique-ish token runs in Python."""
    import hashlib

    import numpy as np
    import pandas as pd

    import re

    shifts = np.arange(_SIMHASH_BITS, dtype=np.int64)
    for pdf in batches:
        ids, hashes = [], []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            # exactly split(trim(lower(text)), '\s+'): an empty or
            # all-whitespace doc yields [''], NOT [] — the '' token is
            # hashed, as the expression form and the oracle do.
            toks = re.split(r"\s+", (text or "").lower().strip())
            hs = np.array(
                [int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                 for t in toks], dtype=np.int64)
            bits = (hs[:, None] >> shifts) & 1
            votes = 2 * bits.sum(axis=0) - len(hs)
            sh = int(((votes > 0).astype(np.int64) << shifts).sum())
            ids.append(doc_id)
            hashes.append(sh)
        yield pd.DataFrame({"doc_id": np.array(ids, dtype=np.int64),
                            "simhash": np.array(hashes, dtype=np.int64)})


#: Staged SimHash table per (SparkContext, sf_dir).
_SIMHASH_CACHE: dict[tuple[str, str], DataFrame] = {}


def _simhash_staged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash) — the numpy Arrow kernel's output, STAGED
    like the shingle corpus and the MinHash signature store: the
    kernel hashes every token with Python md5, and the simhash
    relation is referenced three times per plan (chunk branch + the
    two verify-join sides) — Spark does not dedupe common subtrees,
    so without staging the per-token hashing re-runs once per
    reference. The kernel replays the oracle's exact integer
    arithmetic (md5-prefix token hash, bit votes = 2·ones − n, bit
    set iff votes > 0), so values are identical; zero shuffle (the
    stage is a narrow map pass over the corpus scan)."""
    from pyspark import StorageLevel

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _SIMHASH_CACHE.get(key)
    if cached is not None:
        return cached
    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    simhash = (docs.select("doc_id", "text")
               .mapInPandas(_simhash_kernel, "doc_id long, simhash long")
               .persist(StorageLevel.MEMORY_AND_DISK))
    _SIMHASH_CACHE[key] = simhash
    return simhash


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per doc (token-hash bit votes), then near-dup
    pairs at Hamming distance ≤ 1 via bit_count(xor) (a 32-bit
    simhash over a shared-vocabulary corpus is noisy past distance 1).

    Candidate generation uses the pigeonhole chunk split: any pair at
    distance ≤ d must agree exactly on ≥ 1 of (d+1) disjoint chunks,
    so with d=1 the 32-bit hash splits into two 16-bit halves and
    candidates come from ONE groupBy(chunk, value) + in-bucket pair
    expansion — an equi-shuffle with bounded fanout instead of the
    all-pairs O(n²) broadcast-nested-loop join. Exact Hamming verify
    runs on candidates only. The oracle mirrors the chunk split AND
    the bucket cap (lossless for d ≤ 1 below the cap), so the result
    sets are equal even when a degenerate bucket truncates."""
    simhash = _simhash_staged(spark, sf_dir)
    chunks = simhash.select(
        "doc_id",
        F.explode(F.array(
            F.struct(F.lit(0).alias("chunk"),
                     F.expr("simhash >> 16").alias("val")),
            F.struct(F.lit(1).alias("chunk"),
                     F.expr("simhash & 65535").alias("val")))).alias("cv")
    ).select("doc_id", "cv.chunk", "cv.val")
    cand, _ = capped_pair_expand(
        chunks.groupBy("chunk", "val")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids")))
    sa = simhash.select(F.col("doc_id").alias("a_id"),
                        F.col("simhash").alias("sh_a"))
    sb = simhash.select(F.col("doc_id").alias("b_id"),
                        F.col("simhash").alias("sh_b"))
    return (
        cand.join(sa, "a_id").join(sb, "b_id")
        .withColumn("hamming", F.bit_count(
            F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= 1)
        .select("a_id", "b_id", "hamming")
        .orderBy("a_id", "b_id")
    )


_SIMHASH_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) AS h
  FROM (SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok
        FROM documents)),
votes AS (
  SELECT doc_id, b.b AS b,
         SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM toks, (SELECT unnest(range({_SIMHASH_BITS})) AS b) b
  GROUP BY doc_id, b.b),
simhash AS (
  SELECT doc_id,
         SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS simhash
  FROM votes GROUP BY doc_id),
chunks AS (
  SELECT doc_id, 0 AS chunk, simhash >> 16 AS val FROM simhash
  UNION ALL
  SELECT doc_id, 1 AS chunk, simhash & 65535 AS val FROM simhash),
ranked AS (
  SELECT doc_id, chunk, val,
         row_number() OVER (PARTITION BY chunk, val ORDER BY doc_id) AS rn
  FROM chunks),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM ranked a JOIN ranked b
    ON a.chunk = b.chunk AND a.val = b.val AND a.doc_id < b.doc_id
  WHERE a.rn <= {_BUCKET_CAP} AND b.rn <= {_BUCKET_CAP})
SELECT a_id, b_id,
       bit_count(xor(sa.simhash, sb.simhash)) AS hamming
FROM cand
JOIN simhash sa ON sa.doc_id = a_id
JOIN simhash sb ON sb.doc_id = b_id
WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 1
ORDER BY a_id, b_id
"""


# ---------------------------------------------------------------------------
# Composed training-data cleaning pipeline
# ---------------------------------------------------------------------------

def q_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical corpus-cleaning pipeline, composed end-to-end:

      1. quality gate   — drop docs under 5 tokens;
      2. exact dedup    — keep min doc_id per prefix fingerprint
                          (among quality survivors);
      3. near-dup sweep — drop the higher doc_id of every
                          MinHash-LSH-verified pair (jaccard ≥ 0.8,
                          pairs computed corpus-wide via
                          :func:`minhash_pairs`).

    One declarative plan: Catalyst fuses the quality filter into the
    scan, the fingerprint keep-rule is a single window shuffle, and
    the near-dup drop is a broadcast anti-join (the pair list is tiny
    relative to the corpus at any scale — it's bounded by the
    duplicate rate, not the corpus)."""
    from pyspark.sql.window import Window

    docs = fan_out(spark, load_table(spark, sf_dir, "documents"))
    w = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    quality = (docs
               .withColumn("n_tokens", F.size(w).cast("long"))
               .filter(F.col("n_tokens") >= 5))
    fp = F.md5(F.concat_ws(" ", F.slice(w, 1, 8)))
    survivors = (
        quality.withColumn("fp", fp)
        .withColumn("keep_id", F.min("doc_id").over(Window.partitionBy("fp")))
        .filter(F.col("doc_id") == F.col("keep_id"))
        .select("doc_id", "n_tokens")
    )
    drops = minhash_pairs(spark, sf_dir).select(
        F.col("b_id").alias("doc_id")).distinct()
    return (
        survivors.join(F.broadcast(drops), "doc_id", "left_anti")
        .orderBy("doc_id")
    )


#: Reusable cleaning CTEs (quality gate -> exact-dedup survivors ->
#: near-dup removal); `kept` is the cleaned doc set. Shared by the
#: clean_corpus oracle and the composed training-set pipeline
#: (operators/packing.q_corpus_to_training_set).
_CLEAN_CTES = """
quality AS (
  SELECT doc_id,
         len(string_split_regex(trim(lower(text)), '\\s+')) AS n_tokens,
         md5(array_to_string(list_slice(
           string_split_regex(trim(lower(text)), '\\s+'), 1, 8), ' ')) AS fp
  FROM documents
  WHERE len(string_split_regex(trim(lower(text)), '\\s+')) >= 5),
survivors AS (
  SELECT doc_id, n_tokens FROM (
    SELECT doc_id, n_tokens,
           MIN(doc_id) OVER (PARTITION BY fp) AS keep_id
    FROM quality)
  WHERE doc_id = keep_id),
kept AS (
  SELECT doc_id, n_tokens FROM survivors
  WHERE doc_id NOT IN (SELECT DISTINCT b_id FROM neardup_pairs))
"""


_CLEAN_CORPUS_SQL = f"""
WITH {_MINHASH_CTES},
{_CLEAN_CTES.strip()}
SELECT doc_id, n_tokens FROM kept
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Connected components over the near-dup graph (transitive closure)
# ---------------------------------------------------------------------------

def q_dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive dedup clusters: pairwise near-dup decisions are not
    enough to pick keepers (A~B, B~C must collapse A,B,C together even
    if A!~C), so the verified MinHash pair graph is closed into
    connected components by iterative min-label propagation — the
    Pregel pattern expressed on DataFrames.

    Per iteration: one shuffle joining labels onto edges + a min-agg
    back onto nodes; `localCheckpoint` truncates the lineage so plan
    depth stays constant; the driver reads ONE boolean per iteration
    (did any label change) — not the data. Iteration count is the
    cluster diameter, which for near-dup graphs is tiny (dup clusters
    are cliques-ish); the same loop at 100 TB runs the same handful of
    bounded shuffles. Oracle: DuckDB recursive CTE computing the same
    min-reachable-id per node."""
    pairs = minhash_pairs(spark, sf_dir).select("a_id", "b_id")
    edges = (pairs.union(pairs.select("b_id", "a_id"))
             .toDF("src", "dst").cache())
    labels = (edges.select(F.col("src").alias("node")).distinct()
              .withColumn("lbl", F.col("node")).localCheckpoint())
    while True:
        nbr_min = (
            edges.join(labels.select(F.col("node").alias("dst"),
                                     F.col("lbl").alias("dst_lbl")), "dst")
            .groupBy("src").agg(F.min("dst_lbl").alias("nbr_lbl")))
        new_labels = (
            labels.join(nbr_min.withColumnRenamed("src", "node"), "node", "left")
            .select("node",
                    F.least("lbl", F.coalesce("nbr_lbl", "lbl")).alias("lbl"))
            .localCheckpoint())
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "node")
                   .filter(F.col("n.lbl") != F.col("o.lbl"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            break
    return (labels.select(F.col("node").alias("doc_id"),
                          F.col("lbl").alias("component_id"))
            .orderBy("doc_id"))


#: Shared recursive-CTE block: symmetrized near-dup edges + the
#: min-reachable-id closure. The THREE oracles over component labels
#: (_COMPONENTS_SQL, _CLUSTER_STATS_SQL, _SURVIVORSHIP_SQL) must stay
#: provably identical on the component definition — one constant, no
#: drift.
_REACH_CTES = """
edges AS (
  SELECT a_id AS src, b_id AS dst FROM neardup_pairs
  UNION ALL
  SELECT b_id, a_id FROM neardup_pairs),
reach(node, lbl) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.node = e.dst)"""


_COMPONENTS_SQL = f"""
WITH RECURSIVE {_MINHASH_CTES},
{_REACH_CTES.strip()}
SELECT node AS doc_id, MIN(lbl) AS component_id
FROM reach GROUP BY node ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Alternating large-star/small-star connected components (O(log n) rounds)
# ---------------------------------------------------------------------------

def cc_alternating_edges(
        edges: DataFrame, max_rounds: int = 40) -> tuple[DataFrame, int]:
    """Connected components by the Alternating algorithm of Kiveris,
    Lattanzi, Mirrokni, Rastogi & Vassilvitskii 2014 ("Connected
    Components in MapReduce and Beyond", public) — the O(log n)-round
    replacement for min-label propagation, whose round count is the
    component DIAMETER (a 10⁶-doc chain-shaped dup cluster would need
    10⁶ propagation rounds; this needs ~20).

    Input: undirected edge relation (src, dst), any orientation,
    self-loops ignored. Returns (labels, n_rounds) where labels is
    (node, lbl) for every endpoint and lbl is the component minimum.

    One round = large-star then small-star, each ONE groupBy + ONE
    join on the current edge set:
    * large-star(u): m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u),
      v > u — run over the SYMMETRIZED edge view, so every edge is
      emitted by its smaller endpoint's group and output edges always
      point strictly downhill (big, small).
    * small-star(u) on the downhill set: m = min(Γ(u)); emit (u, m)
      and (v, m) for v ∈ Γ(u) \\ {m} — re-parents u's whole neighbor
      list onto its best-known root.
    At the fixpoint the edge set is a forest of STARS rooted at each
    component's minimum; labels read straight off the edges.

    Scale shape: per round, two map-side-combined groupBys + two
    equi-joins over an edge set that never exceeds the input size
    (star-contraction monotonically shrinks it); `localCheckpoint`
    truncates lineage so plan depth stays O(1) per round instead of
    O(rounds); the driver reads one boolean (did the edge set
    change), never data. No collect, no diameter dependence — the
    round count is what survives a 10¹²-edge graph."""
    e = (edges.filter(F.col("src") != F.col("dst"))
         .select(F.greatest("src", "dst").alias("u"),
                 F.least("src", "dst").alias("v"))
         .distinct().localCheckpoint())
    rounds = 0
    prev_stats = None
    while rounds < max_rounds:
        rounds += 1
        # large-star over the symmetrized view
        nbrs = e.select("u", "v").unionAll(
            e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (nbrs.groupBy("u").agg(F.min("v").alias("mv"))
                .select("u", F.least("mv", "u").alias("m")))
        ls = (nbrs.filter(F.col("v") > F.col("u"))
              .join(mins, "u")
              .select(F.col("v").alias("u"), F.col("m").alias("v"))
              .distinct())
        # small-star over the downhill set (all v < u by construction)
        ss_mins = ls.groupBy("u").agg(F.min("v").alias("m"))
        new_e = (ls.join(ss_mins, "u")
                 .filter(F.col("v") != F.col("m"))
                 .select(F.col("v").alias("u"), F.col("m").alias("v"))
                 .unionAll(ss_mins.select(
                     F.col("u"), F.col("m").alias("v")))
                 .distinct().localCheckpoint())
        # Convergence probe in ONE driver-side scalar read per round:
        # (count, order-free hash checksum) of the edge set. Only when
        # the pair repeats — which for distinct sets means "almost
        # surely unchanged" — pay the exact anti-join verify, so the
        # steady-state loop costs 2 jobs/round (checkpoint + agg)
        # instead of 4 (the checksum never falsely BREAKS the loop;
        # the verify guards the 2⁻⁶⁴ collision).
        n, h = new_e.agg(
            F.count("*"), F.sum(F.xxhash64("u", "v"))).first()
        if (n, h) == prev_stats:
            if (new_e.join(e, ["u", "v"], "left_anti")
                    .limit(1).count()) == 0:
                e = new_e
                break
        prev_stats = (n, h)
        e = new_e
    else:
        # Loop exhausted without the checksum repeating. The set may
        # STILL have converged exactly in the final round (detection
        # needs one extra no-change round), so check the fixpoint
        # PROPERTY directly: a star forest has no edge whose parent v
        # is itself some edge's child u. Only a genuinely non-star
        # set — whose labels would map nodes to intermediate parents,
        # silently splitting components — raises. The theory bound is
        # O(log² n) rounds; a true non-convergence at 40 means the
        # input is pathological and wrong labels must never be
        # returned quietly.
        non_root_parents = (
            e.join(e.select(F.col("u").alias("v")).distinct(),
                   "v", "left_semi")
            .limit(1).count())
        if non_root_parents != 0:
            raise RuntimeError(
                f"cc_alternating did not converge within {max_rounds} "
                "rounds; raise max_rounds for this graph")
    labels = (e.select(F.col("u").alias("node"), F.col("v").alias("lbl"))
              .unionAll(e.select(F.col("v").alias("node"),
                                 F.col("v").alias("lbl")))
              .distinct())
    return labels, rounds


#: Staged component labels per (applicationId, sf_dir): the CC loop's
#: output is consumed by q_cc_alternating AND q_dedup_survivorship —
#: both in the driver window and bench — and the labels are
#: localCheckpointed anyway, so re-running the multi-round loop per
#: consumer would be pure waste.
_CC_CACHE: dict = {}


def _cc_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark import StorageLevel

    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _CC_CACHE.get(key)
    if cached is not None:
        return cached
    pairs = minhash_pairs(spark, sf_dir).select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst"))
    labels, _rounds = cc_alternating_edges(pairs)
    # persist(), not localCheckpoint(): staging.unpersist_staged()
    # releases registry entries via DataFrame.unpersist(), which is a
    # no-op on checkpoint blocks — persist keeps the release
    # deterministic (the loop's internal checkpoints are method-local
    # and fall to the ContextCleaner once this returns).
    labels = labels.persist(StorageLevel.MEMORY_AND_DISK)
    labels.count()
    _CC_CACHE[key] = labels
    return labels


def q_cc_alternating(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-cluster labels over the verified MinHash near-dup graph —
    semantically identical to q_dedup_components (node → component
    minimum) but computed by alternating star contraction instead of
    min-label propagation, so the round count is O(log n) in the
    largest cluster size instead of O(diameter). Oracle: the same
    recursive min-reachable-id CTE (the label set is algorithm-
    independent). tests/test_invariants.py pins the round count on a
    64-node chain at ≤ 8 (propagation needs 63)."""
    labels = _cc_labels(spark, sf_dir)
    return (labels.select(F.col("node").alias("doc_id"),
                          F.col("lbl").alias("component_id"))
            .orderBy("doc_id"))


def q_dedup_cluster_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component-size histogram of the near-dup graph — the dedup
    health dashboard row (a sudden mass of huge clusters means the
    threshold or the shingler broke; a healthy corpus shows mostly
    pairs and triples): per cluster size, how many components and how
    many documents live in them. Two tiny aggregates over the STAGED
    label relation (components-sized, then sizes-sized) — nothing
    data-scale shuffles."""
    labels = _cc_labels(spark, sf_dir)
    sizes = labels.groupBy("lbl").agg(F.count("*").alias("size"))
    return (sizes.groupBy("size")
            .agg(F.count("*").alias("n_components"))
            .select("size", "n_components",
                    (F.col("size") * F.col("n_components"))
                    .alias("n_docs"))
            .orderBy("size"))


_CLUSTER_STATS_SQL = f"""
WITH RECURSIVE {_MINHASH_CTES},
{_REACH_CTES.strip()},
comp AS (
  SELECT node, MIN(lbl) AS component_id FROM reach GROUP BY node),
sizes AS (
  SELECT component_id, COUNT(*) AS size FROM comp GROUP BY component_id)
SELECT size, COUNT(*) AS n_components,
       size * COUNT(*) AS n_docs
FROM sizes GROUP BY size ORDER BY size
"""


def q_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship (golden-record selection) over the near-dup
    clusters — the MDM/entity-resolution step AFTER transitive
    closure: every component elects one SURVIVOR by the
    keep-longest rule (n_chars DESC, doc_id ASC — the RefinedWeb
    representative choice) and every member row maps to it. This is
    the table a dedup pipeline actually writes downstream: member →
    canonical id, with is_survivor marking the kept rows.

    Composes cc_alternating's O(log n) closure (labels STAGED per
    (appId, sf_dir) — both consumers share one loop execution) with
    ONE window over the members relation (components are small, the
    window frame is bounded by cluster size); the doc-metadata join
    is id-keyed and AQE-broadcastable since the pair graph is
    dup-rate-sized. Oracle = the recursive min-reachable-id CTE +
    the identical window."""
    labels = _cc_labels(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    members = (labels.withColumnRenamed("node", "doc_id")
               .withColumnRenamed("lbl", "component_id")
               .join(docs, "doc_id"))
    w = Window.partitionBy("component_id")
    wfull = (Window.partitionBy("component_id")
             .orderBy(F.desc("n_chars"), F.asc("doc_id"))
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    survivor = F.first("doc_id").over(wfull)
    return (members
            .select("doc_id", "component_id", "n_chars",
                    F.count("*").over(w).alias("n_members"),
                    survivor.alias("survivor_id"),
                    (survivor == F.col("doc_id")).alias("is_survivor"))
            .orderBy("doc_id"))


_SURVIVORSHIP_SQL = f"""
WITH RECURSIVE {_MINHASH_CTES},
{_REACH_CTES.strip()},
comp AS (
  SELECT node AS doc_id, MIN(lbl) AS component_id
  FROM reach GROUP BY node),
m AS (
  SELECT c.doc_id, c.component_id, d.n_chars
  FROM comp c JOIN documents d USING (doc_id))
SELECT doc_id, component_id, n_chars,
       COUNT(*) OVER (PARTITION BY component_id) AS n_members,
       first_value(doc_id) OVER (
         PARTITION BY component_id
         ORDER BY n_chars DESC, doc_id ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS survivor_id,
       first_value(doc_id) OVER (
         PARTITION BY component_id
         ORDER BY n_chars DESC, doc_id ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         = doc_id AS is_survivor
FROM m ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Near-dup split leakage (eval-contamination the exact-match check
# misses)
# ---------------------------------------------------------------------------

def q_neardup_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs that STRADDLE the train/val/test boundary —
    the eval-contamination failure mode an exact-fingerprint
    cross-split check (`cross_split_contamination`) cannot see: a
    paraphrased or lightly-edited copy of a training document landing
    in the eval split inflates every benchmark run on it. Composes the
    verified MinHash pair graph with the deterministic hash split;
    output is the quarantine list (pair, both splits, jaccard).

    Scale shape: the pair set is bounded by the true-duplicate rate
    (not corpus size), the split columns are zero-shuffle row-local
    hashes, and the two id-joins let stats/AQE broadcast the small
    pair side — no hints, no new data-sized shuffle."""
    from .sampling import _TRAIN_LT, _VAL_LT, hash256

    pairs = minhash_pairs(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    h = hash256(F.col("doc_id"), "split:")
    split = docs.select(
        "doc_id",
        F.when(h < _TRAIN_LT, "train")
        .when(h < _VAL_LT, "val")
        .otherwise("test").alias("split"))
    sa = split.select(F.col("doc_id").alias("a_id"),
                      F.col("split").alias("split_a"))
    sb = split.select(F.col("doc_id").alias("b_id"),
                      F.col("split").alias("split_b"))
    return (
        pairs.join(sa, "a_id").join(sb, "b_id")
        .filter(F.col("split_a") != F.col("split_b"))
        .select("a_id", "b_id", "split_a", "split_b", "jaccard")
        .orderBy("a_id", "b_id")
    )


def _split_leakage_sql() -> str:
    from .sampling import _TRAIN_LT, _VAL_LT, hash256_sql
    h = hash256_sql("doc_id", "split:")
    return f"""
WITH {_MINHASH_CTES},
splits AS (
  SELECT doc_id,
         CASE WHEN {h} < {_TRAIN_LT} THEN 'train'
              WHEN {h} < {_VAL_LT} THEN 'val'
              ELSE 'test' END AS split
  FROM documents)
SELECT a_id, b_id, sa.split AS split_a, sb.split AS split_b, jaccard
FROM neardup_pairs
JOIN splits sa ON sa.doc_id = a_id
JOIN splits sb ON sb.doc_id = b_id
WHERE sa.split <> sb.split
ORDER BY a_id, b_id
"""


# ---------------------------------------------------------------------------
# Exact-substring duplication signal (duplicated n-gram span coverage)
# ---------------------------------------------------------------------------

_SPAN_N = 8


def q_dup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document duplicated-substring coverage — the distributable
    counting form of exact-substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better", public
    paper; the suffix-array span finder collapsed to fixed-length
    8-gram hits): for every word-8-gram POSITION in every document,
    is that 8-gram present in any OTHER document? Emits per doc the
    span count, duplicated-span count, coverage fraction, and the
    hottest gram's document frequency — the signal used to cut
    boilerplate spans (dup_frac ≈ 1 → mirror; 0 < dup_frac < 1 →
    shared boilerplate worth span-level excision).

    Scale shape — and why THIS needs no df cap while the pairwise
    shingle JOIN does: the gram table is never self-joined. Stage 1
    shuffles gram rows on the gram hash where a window collect_set
    computes document frequency (map-side partial dedup of doc_ids;
    a hot stop-phrase gram costs O(k) rows, never the O(k²) a
    pair-join would emit). Stage 2 re-aggregates on doc_id. Two
    bounded data shuffles past the fan-out repartition, linear in
    corpus grams, at any scale. Gram keys are the 60-bit fp64
    fingerprint (8-byte longs through both shuffles, not 32-char md5
    hex — the ngram_novelty lesson: 3.7× at sf10); a collision
    merges the same grams in both engines, parity unaffected."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")) >= _SPAN_N)
    grams = (
        fan_out(spark, docs)
        .withColumn("w", F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
        .select(
            "doc_id",
            F.posexplode_outer(F.expr(
                f"CASE WHEN size(w) < {_SPAN_N} THEN array() ELSE "
                f"transform(sequence(0, size(w) - {_SPAN_N}), "
                f"i -> CAST(conv(substring(md5(concat_ws(' ', "
                f"slice(w, i + 1, {_SPAN_N}))), 1, 15), 16, 10) AS BIGINT)) "
                f"END"
            )).alias("pos", "gh"))
    )
    from pyspark.sql.window import Window
    wg = Window.partitionBy("gh")
    span_df = grams.withColumn(
        "gram_df", F.size(F.collect_set("doc_id").over(wg)))
    return (
        span_df.groupBy("doc_id").agg(
            F.count("*").alias("n_spans"),
            F.sum((F.col("gram_df") > 1).cast("long")).alias("n_dup_spans"),
            F.max("gram_df").alias("max_gram_df"))
        .withColumn("dup_frac",
                    F.col("n_dup_spans")
                    / F.col("n_spans").cast("double"))
        .select("doc_id", "n_spans", "n_dup_spans", "max_gram_df",
                "dup_frac")
    )


_DUP_SPANS_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
  FROM documents),
g AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(
           array_to_string(list_slice(w, i + 1, i + {_SPAN_N}), ' ')),
           1, 15)) AS BIGINT) AS gh
  FROM (SELECT doc_id, w,
               unnest(range(0, len(w) - {_SPAN_N - 1})) AS i
        FROM toks WHERE len(w) >= {_SPAN_N})),
df AS (SELECT gh, COUNT(DISTINCT doc_id) AS gram_df FROM g GROUP BY gh)
SELECT g.doc_id,
       COUNT(*) AS n_spans,
       CAST(SUM(CASE WHEN df.gram_df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
       MAX(df.gram_df) AS max_gram_df,
       SUM(CASE WHEN df.gram_df > 1 THEN 1 ELSE 0 END)
         / CAST(COUNT(*) AS DOUBLE) AS dup_frac
FROM g JOIN df USING (gh)
GROUP BY g.doc_id
"""


# ---------------------------------------------------------------------------
# Incremental (delta-vs-base) dedup
# ---------------------------------------------------------------------------

def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-against-base dedup — the shape every INCREMENTAL corpus
    build runs daily: today's crawl (delta = doc_id % 10 >= 8) is
    deduped against the accumulated corpus (base) by consulting ONLY
    the base's fingerprint index, never rescanning base text. A delta
    doc survives iff its prefix fingerprint (same key as exact_dedup)
    is absent from the base index AND it is the first occurrence
    within the delta itself.

    Scale shape: the base side is a stored bytes-per-doc fingerprint
    index, not the 100 TB text — the join is fp-to-fp. The delta is
    orders of magnitude smaller than base, so AQE broadcasts the
    delta-side aggregates; with a partitioned index the join prunes to
    the delta's fp ranges. History is never reprocessed — the property
    that makes daily 100 TB ingestion O(delta), not O(corpus)."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.concat_ws(" ", F.slice(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 1, 8)))
    tagged = docs.select("doc_id", fp.alias("fp"),
                         (F.col("doc_id") % 10 >= 8).alias("is_delta"))
    base_index = (tagged.filter(~F.col("is_delta"))
                  .select("fp").distinct()
                  .withColumn("in_base", F.lit(True)))
    delta = tagged.filter(F.col("is_delta")).drop("is_delta")
    w = Window.partitionBy("fp")
    return (
        delta.join(base_index, "fp", "left")
        .withColumn("in_base", F.coalesce("in_base", F.lit(False)))
        .withColumn("first_in_delta",
                    F.col("doc_id") == F.min("doc_id").over(w))
        .withColumn("keep", ~F.col("in_base") & F.col("first_in_delta"))
        .select("doc_id", "fp", "in_base", "first_in_delta", "keep")
    )


_INCREMENTAL_DEDUP_SQL = """
WITH f AS (
  SELECT doc_id,
         md5(array_to_string(list_slice(
           string_split_regex(trim(lower(text)), '\\s+'), 1, 8), ' ')) AS fp,
         doc_id % 10 >= 8 AS is_delta
  FROM documents),
base AS (SELECT DISTINCT fp FROM f WHERE NOT is_delta),
delta AS (
  SELECT doc_id, fp,
         MIN(doc_id) OVER (PARTITION BY fp) AS first_id
  FROM f WHERE is_delta)
SELECT d.doc_id, d.fp,
       b.fp IS NOT NULL AS in_base,
       d.doc_id = d.first_id AS first_in_delta,
       b.fp IS NULL AND d.doc_id = d.first_id AS keep
FROM delta d LEFT JOIN base b USING (fp)
"""


# ---------------------------------------------------------------------------
# Bloom-filter pre-filtered incremental dedup (the O(delta) scale path)
# ---------------------------------------------------------------------------

_HEX = "0123456789abcdef"
_BLOOM_M = 4096   # bits (64 x 64-bit words); MB-sized at 10^9 base fps
_BLOOM_K = 3      # hash functions


def _bloom_pos(col: Column, salt: str) -> Column:
    """Bit position 0..M-1 from the first 3 hex chars of
    md5(salt||fp) — engine-portable (strpos arithmetic, no hex
    casts), same trick as sampling.hash256."""
    h = F.md5(F.concat(F.lit(salt), col))
    p = F.lit(0)
    for i in (1, 2, 3):
        c = F.substring(h, i, 1)
        p = p * 16 + (F.instr(F.lit(_HEX), c) - 1)
    return p


def _bloom_pos_sql(expr: str, salt: str) -> str:
    h = f"md5('{salt}' || {expr})"
    return (f"((strpos('{_HEX}', substring({h}, 1, 1)) - 1) * 256"
            f" + (strpos('{_HEX}', substring({h}, 2, 1)) - 1) * 16"
            f" + (strpos('{_HEX}', substring({h}, 3, 1)) - 1))")


def q_bloom_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental delta-vs-base dedup with a BLOOM-FILTER pre-join
    prune — the refinement of :func:`q_incremental_dedup` that makes
    daily ingestion against a multi-billion-row fingerprint index
    cheap: the base index is folded ONCE into an m-bit Bloom bitmap
    (k md5-derived bit positions per fingerprint, bit_or-aggregated
    into m/64 words — a BYTES-sized relation that broadcast-joins),
    and every delta row answers "might fp be in base?" map-side.
    Bloom filters have NO false negatives, so a delta row missing any
    of its k bits is DEFINITELY new and never touches the exact join;
    only the candidate fraction (false-positive rate ~(1-e^(-kn/m))^k,
    ~1.6% at this fixture's load factor) shuffles into the exact
    fp-to-fp anti-join. Output is EXACT — identical keep decisions to
    q_incremental_dedup — because candidates are verified against the
    real index; the bloom only routes.

    Scale shape (100 TB): the bitmap build is one pass over the
    stored fingerprint index (and is itself incrementally maintainable
    by OR-ing the delta's bits in); the broadcast is m/8 bytes
    (a few hundred MB at 10^10 fps with m sized for 1% fp-rate); the
    exact join shrinks from O(|delta|) to O(|delta| * fp_rate + dups).
    Deterministic md5 positions keep Spark and the oracle bit-for-bit
    equal — even `bloom_candidate` matches.
    """
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.concat_ws(" ", F.slice(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 1, 8)))
    tagged = docs.select("doc_id", fp.alias("fp"),
                         (F.col("doc_id") % 10 >= 8).alias("is_delta"))
    base = tagged.filter(~F.col("is_delta")).select("fp").distinct()

    poss = F.array(*[_bloom_pos(F.col("fp"), f"bloom{i}:")
                     for i in range(_BLOOM_K)])
    # 63 usable bits per word: DuckDB's checked BIGINT shift overflows
    # at 1<<63, so both engines pack bits 0..62 only.
    word = F.floor(F.col("pos") / 63).cast("long").alias("word")
    mask = F.expr("shiftleft(cast(1 as bigint), int(pos % 63))").alias("mask")
    base_bits = (base.select(F.explode(poss).alias("pos"))
                 .select(word, mask)
                 .groupBy("word").agg(F.bit_or("mask").alias("bits")))

    delta = tagged.filter(F.col("is_delta")).drop("is_delta")
    hit = (F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))
           == F.col("mask"))
    flagged = (delta.select("doc_id", "fp", F.explode(poss).alias("pos"))
               .select("doc_id", "fp", word, mask)
               .join(F.broadcast(base_bits), "word", "left")
               .groupBy("doc_id", "fp")
               .agg(F.bool_and(hit).alias("bloom_candidate")))
    w = Window.partitionBy("fp")
    flagged = flagged.withColumn(
        "first_in_delta", F.col("doc_id") == F.min("doc_id").over(w))

    base_index = base.withColumn("in_base", F.lit(True))
    cand = (flagged.filter(F.col("bloom_candidate"))
            .join(base_index, "fp", "left")
            .withColumn("in_base", F.coalesce("in_base", F.lit(False))))
    definite_new = (flagged.filter(~F.col("bloom_candidate"))
                    .withColumn("in_base", F.lit(False)))
    cols = ["doc_id", "fp", "bloom_candidate", "first_in_delta", "in_base"]
    return (cand.select(*cols).unionByName(definite_new.select(*cols))
            .withColumn("keep", ~F.col("in_base") & F.col("first_in_delta")))


def _bloom_sql() -> str:
    p = [_bloom_pos_sql("fp", f"bloom{i}:") for i in range(_BLOOM_K)]
    return f"""
WITH f AS (
  SELECT doc_id,
         md5(array_to_string(list_slice(
           string_split_regex(trim(lower(text)), '\\s+'), 1, 8), ' ')) AS fp,
         doc_id % 10 >= 8 AS is_delta
  FROM documents),
base AS (SELECT DISTINCT fp FROM f WHERE NOT is_delta),
bwords AS (
  SELECT CAST(floor(pos / 63) AS BIGINT) AS word,
         (CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS mask
  FROM (SELECT unnest([{p[0]}, {p[1]}, {p[2]}]) AS pos FROM base)),
bits AS (SELECT word, bit_or(mask) AS bits FROM bwords GROUP BY word),
delta AS (SELECT doc_id, fp FROM f WHERE is_delta),
dwords AS (
  SELECT doc_id, fp,
         CAST(floor(pos / 63) AS BIGINT) AS word,
         (CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS mask
  FROM (SELECT doc_id, fp, unnest([{p[0]}, {p[1]}, {p[2]}]) AS pos
        FROM delta)),
flagged AS (
  SELECT d.doc_id, d.fp,
         bool_and((COALESCE(b.bits, 0) & d.mask) = d.mask)
           AS bloom_candidate
  FROM dwords d LEFT JOIN bits b USING (word)
  GROUP BY d.doc_id, d.fp),
firsts AS (
  SELECT doc_id, fp, bloom_candidate,
         doc_id = MIN(doc_id) OVER (PARTITION BY fp) AS first_in_delta
  FROM flagged)
SELECT fl.doc_id, fl.fp, fl.bloom_candidate, fl.first_in_delta,
       fl.bloom_candidate AND b.fp IS NOT NULL AS in_base,
       NOT (fl.bloom_candidate AND b.fp IS NOT NULL)
         AND fl.first_in_delta AS keep
FROM firsts fl LEFT JOIN base b USING (fp)
"""


# ---------------------------------------------------------------------------
# Dedup keeping the LONGEST copy (RefinedWeb-style representative)
# ---------------------------------------------------------------------------

def q_dedup_keep_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup groups keeping the LONGEST member instead of the
    lowest id — the RefinedWeb/CCNet representative rule (duplicates
    often differ by truncation; the longest copy preserves the most
    content). Same ONE-shuffle window shape as q_exact_dedup, with a
    deterministic (n_chars DESC, doc_id ASC) argmax."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.concat_ws(" ", F.slice(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 1, 8)))
    w = Window.partitionBy("fp")
    rn = F.row_number().over(
        Window.partitionBy("fp")
        .orderBy(F.desc("n_chars"), F.asc("doc_id")))
    return (
        docs.select("doc_id", "n_chars", fp.alias("fp"))
        .withColumn("n_copies", F.count("*").over(w))
        .withColumn("keep", rn == 1)
        .select("doc_id", "fp", "n_chars", "n_copies", "keep")
    )


_KEEP_LONGEST_SQL = """
WITH f AS (
  SELECT doc_id, n_chars,
         md5(array_to_string(list_slice(
           string_split_regex(trim(lower(text)), '\\s+'), 1, 8), ' ')) AS fp
  FROM documents)
SELECT doc_id, fp, n_chars,
       COUNT(*) OVER (PARTITION BY fp) AS n_copies,
       row_number() OVER (PARTITION BY fp
                          ORDER BY n_chars DESC, doc_id ASC) = 1 AS keep
FROM f
"""


# ---------------------------------------------------------------------------
# Containment near-dup (asymmetric: catches near-SUBSET duplicates)
# ---------------------------------------------------------------------------

_CONTAIN_T = 0.9


def q_containment_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by shingle CONTAINMENT
    ``C(A→B) = |A ∩ B| / |A|`` — the asymmetric measure that catches a
    short document embedded verbatim in a longer one (quote farms,
    aggregator pages), which symmetric Jaccard misses: a 50-shingle
    doc inside a 5000-shingle doc has J ≈ 0.01 but C = 1.0.

    Candidate generation is the df-capped shape of
    `q_ngram_jaccard_capped` (hot shingles excluded, bounded pair
    fan-out), annotated by `_pruned_pair_candidates` with the
    prefix-filter statistics of a set-similarity join: since
    ``greatest(c_ab, c_ba) = inter / least(|A|, |B|)`` and the true
    intersection provably satisfies ``inter <= shared_rare +
    least(h_a, h_b)`` (`_ub_inter`), any pair whose bound falls below
    ``C * least(n_a, n_b)`` cannot clear the threshold and is pruned
    BEFORE the wide array-verify join — exact recall, verify
    arithmetic only on survivors. Same shuffle count as the Jaccard
    sibling, same 100 TB safety argument."""
    sh = _shingled(spark, sf_dir)
    cand = _pruned_pair_candidates(spark, sf_dir)
    survivors = cand.filter(
        _ub_inter() >= F.lit(_CONTAIN_T) * F.least("n_a", "n_b"))
    return (
        _verify_shingle_pairs(sh, survivors)
        .withColumn("c_ab", F.col("inter") / F.col("sz_a").cast("double"))
        .withColumn("c_ba", F.col("inter") / F.col("sz_b").cast("double"))
        .filter(F.greatest("c_ab", "c_ba") >= _CONTAIN_T)
        .select("a_id", "b_id", "c_ab", "c_ba")
        # Sort-sampler barrier — see q_ngram_jaccard_dedup.
        .repartition("a_id")
        .orderBy("a_id", "b_id")
    )


_CONTAINMENT_SQL = f"""
WITH {_SHINGLES_CTE},
e AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
df AS (SELECT shingle, COUNT(*) AS n_docs FROM e GROUP BY shingle),
cand AS (
  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
  FROM e a JOIN e b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  JOIN df ON df.shingle = a.shingle
  WHERE df.n_docs > 1 AND df.n_docs <= {_DF_CAP}),
scored AS (
  SELECT a_id, b_id,
         len(list_intersect(sa.shingles, sb.shingles))
           / CAST(len(sa.shingles) AS DOUBLE) AS c_ab,
         len(list_intersect(sa.shingles, sb.shingles))
           / CAST(len(sb.shingles) AS DOUBLE) AS c_ba
  FROM cand
  JOIN sh sa ON sa.doc_id = a_id
  JOIN sh sb ON sb.doc_id = b_id)
SELECT a_id, b_id, c_ab, c_ba
FROM scored
WHERE greatest(c_ab, c_ba) >= {_CONTAIN_T}
ORDER BY a_id, b_id
"""


# ---------------------------------------------------------------------------
# Segment-level dedup with text reconstruction (C4 line-dedup analog)
# ---------------------------------------------------------------------------

#: Tokens per segment and the removal threshold: a segment occurring
#: >= _SEG_MAXOCC times corpus-wide is boilerplate and excised from
#: EVERY document (the C4 rule is "any three-sentence span occurring
#: more than once"; the threshold is data-dependent, 3 here).
_SEG_W = 10
_SEG_MAXOCC = 3


def q_segment_dedup_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide SEGMENT dedup with document reconstruction — the
    C4/RefinedWeb "line dedup" re-expressed for a corpus without line
    boundaries: split each document into consecutive `_SEG_W`-token
    segments (trailing partial included), count every segment's
    occurrences across the WHOLE corpus, excise segments occurring
    >= `_SEG_MAXOCC` times from every document, and rebuild the
    surviving text in original order. Unlike `dup_ngram_spans`
    (which only scores duplication), this emits the cleaned corpus —
    per doc: segment count, removed count, and the rebuilt text.

    Scale shape: two data shuffles, both linear in corpus tokens.
    (1) segment rows shuffle on the md5 segment fingerprint, where a
    window count computes corpus occurrence — no self-join, so a
    boilerplate segment in k docs costs O(k) rows, never O(k²);
    (2) survivors re-shuffle on doc_id where array_sort(collect_list)
    restores segment order (collect_list skips the nulls that
    when(keep, …) leaves for excised segments, so the filter rides
    inside the aggregate — no extra pass). Reads the staged token
    relation, so the interpreted tokenizer does not re-run."""
    from .text import staged_tokens

    return segment_rebuild(staged_tokens(spark, sf_dir))


def segment_rebuild(tok: DataFrame) -> DataFrame:
    """Core of q_segment_dedup_rebuild over any (doc_id, toks)
    relation — split out so edge cases (1-token docs, exact-boundary
    lengths, corpus-wide boilerplate) are unit-testable on crafted
    frames (tests/test_invariants.py)."""
    segs_expr = (
        f"transform(sequence(0, cast(ceil(size(toks) / {_SEG_W}.0) as int) - 1), "
        f"i -> struct(cast(i as long) as seg_idx, "
        f"concat_ws(' ', slice(toks, i * {_SEG_W} + 1, {_SEG_W})) as seg))")
    seg = (
        tok
        .filter(F.size("toks") >= 1)
        .select("doc_id", F.explode_outer(F.expr(segs_expr)).alias("s"))
        .filter(F.col("s").isNotNull())
        .select("doc_id", "s.seg_idx", "s.seg",
                F.md5(F.col("s.seg")).alias("fp"))
    )
    occ = F.count("*").over(Window.partitionBy("fp"))
    kept_struct = F.when(
        F.col("n_occ") < _SEG_MAXOCC, F.struct("seg_idx", "seg"))
    return (
        seg.withColumn("n_occ", occ)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segments"),
            F.sum((F.col("n_occ") >= _SEG_MAXOCC).cast("long"))
            .alias("n_removed"),
            F.concat_ws(
                " ",
                F.transform(F.array_sort(F.collect_list(kept_struct)),
                            lambda s: s["seg"])).alias("rebuilt_text"),
        )
    )


_SEGMENT_DEDUP_SQL = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
  FROM documents
  WHERE len(string_split_regex(trim(lower(text)), '\\s+')) >= 1),
seg AS (
  SELECT doc_id, i AS seg_idx,
         array_to_string(list_slice(w, i * {_SEG_W} + 1,
                                    i * {_SEG_W} + {_SEG_W}), ' ') AS seg
  FROM t, UNNEST(range(0, CAST(ceil(len(w) / {_SEG_W}.0) AS INT))) AS u(i)),
c AS (SELECT *, COUNT(*) OVER (PARTITION BY seg) AS n_occ FROM seg)
SELECT doc_id, COUNT(*) AS n_segments,
       CAST(SUM(CASE WHEN n_occ >= {_SEG_MAXOCC} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_removed,
       array_to_string(
         list(seg ORDER BY seg_idx) FILTER (WHERE n_occ < {_SEG_MAXOCC}),
         ' ') AS rebuilt_text
FROM c GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# Edit-distance near-dup verify (candidate-pruned Levenshtein)
# ---------------------------------------------------------------------------

#: Per-group pair cap, per-doc comparison prefix (Levenshtein is
#: O(len²) per pair — production systems bound the operand, not the
#: pair count alone), and the near-dup similarity threshold.
_LEV_GROUP_CAP = 8
_LEV_PREFIX = 512
_LEV_T = 0.8


def q_edit_distance_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level near-dup verification: candidate pairs from
    the 8-word-prefix fingerprint blocks (the exact_dedup key),
    verified with normalized Levenshtein similarity
    ``1 − lev(a, b) / max(|a|, |b|)`` over the first 512 normalized
    chars — the instruction-/short-document fuzzy-dedup shape, where
    token shingles are too coarse and edit distance is the similarity
    that matters. Emits every verified pair with its similarity and
    the `is_neardup` decision at 0.8.

    Scale shape: Levenshtein is QUADRATIC in operand length and runs
    JVM-side per candidate pair — so both factors are bounded:
    (1) pairs come only from fingerprint blocks (equi-shuffle on fp,
    never all-pairs), ranked and capped at 8 docs per block
    (cap²/2 = 32 pairs max per block, degenerate blocks truncate
    deterministically by doc_id rather than exploding);
    (2) each operand is the first 512 normalized chars, making the
    per-pair cost a constant ~512² cell DP regardless of document
    length. Both caps mirror the df-capped Jaccard discipline."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    fp = F.md5(F.concat_ws(" ", F.slice(
        F.split(F.trim(F.lower(F.col("text"))), r"\s+"), 1, 8)))
    base = docs.select("doc_id", fp.alias("fp"),
                       F.substring(norm, 1, _LEV_PREFIX).alias("t"))
    w = Window.partitionBy("fp").orderBy("doc_id")
    capped = (base.withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") <= _LEV_GROUP_CAP))
    a = capped.select("fp", F.col("doc_id").alias("a_id"),
                      F.col("t").alias("ta"))
    b = capped.select("fp", F.col("doc_id").alias("b_id"),
                      F.col("t").alias("tb"))
    pairs = (a.join(b, "fp")
             .filter(F.col("a_id") < F.col("b_id")))
    lev = F.levenshtein("ta", "tb")
    mx = F.greatest(F.length("ta"), F.length("tb"))
    sim = F.lit(1.0) - lev.cast("double") / mx.cast("double")
    return (pairs.select("a_id", "b_id", lev.alias("lev"),
                         sim.alias("sim"),
                         (sim >= _LEV_T).alias("is_neardup"))
            .orderBy("a_id", "b_id"))


_EDIT_NEARDUP_SQL = f"""
WITH base AS (
  SELECT doc_id,
         md5(array_to_string(list_slice(
           string_split_regex(trim(lower(text)), '\\s+'), 1, 8), ' ')) AS fp,
         substring(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'),
                   1, {_LEV_PREFIX}) AS t
  FROM documents),
capped AS (
  SELECT * FROM (
    SELECT doc_id, fp, t,
           row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
    FROM base)
  WHERE rn <= {_LEV_GROUP_CAP}),
pairs AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         levenshtein(a.t, b.t) AS lev,
         1.0 - CAST(levenshtein(a.t, b.t) AS DOUBLE)
             / CAST(greatest(length(a.t), length(b.t)) AS DOUBLE) AS sim
  FROM capped a JOIN capped b
    ON a.fp = b.fp AND a.doc_id < b.doc_id)
SELECT a_id, b_id, lev, sim, sim >= {_LEV_T} AS is_neardup
FROM pairs
ORDER BY a_id, b_id
"""


QUERIES = {
    "segment_dedup_rebuild": (q_segment_dedup_rebuild, _SEGMENT_DEDUP_SQL),
    "edit_distance_neardup": (q_edit_distance_neardup, _EDIT_NEARDUP_SQL),
    "exact_dedup": (q_exact_dedup, _EXACT_DEDUP_SQL),
    "containment_neardup": (q_containment_neardup, _CONTAINMENT_SQL),
    "incremental_dedup": (q_incremental_dedup, _INCREMENTAL_DEDUP_SQL),
    "bloom_incremental_dedup": (q_bloom_incremental_dedup, _bloom_sql()),
    "dedup_keep_longest": (q_dedup_keep_longest, _KEEP_LONGEST_SQL),
    "dup_ngram_spans": (q_dup_ngram_spans, _DUP_SPANS_SQL),
    "neardup_split_leakage": (q_neardup_split_leakage, _split_leakage_sql()),
    "dedup_components": (q_dedup_components, _COMPONENTS_SQL),
    "cc_alternating": (q_cc_alternating, _COMPONENTS_SQL),
    "dedup_survivorship": (q_dedup_survivorship, _SURVIVORSHIP_SQL),
    "dedup_cluster_stats": (q_dedup_cluster_stats, _CLUSTER_STATS_SQL),
    "clean_corpus": (q_clean_corpus, _CLEAN_CORPUS_SQL),
    "ngram_jaccard_dedup": (q_ngram_jaccard_dedup, _NGRAM_JACCARD_SQL),
    "ngram_jaccard_capped": (q_ngram_jaccard_capped, _NGRAM_CAPPED_SQL),
    "minhash_lsh_dedup": (q_minhash_lsh_dedup, _MINHASH_SQL),
    "minhash_est_quality": (q_minhash_est_quality, _MINHASH_EST_SQL),
    "simhash_pairs": (q_simhash_pairs, _SIMHASH_SQL),
}
