"""Corpus-level quality operators for training-data pipelines over the
`documents` table: Gopher-style repetition signals, cross-split
contamination detection, per-source quality rollups, and length
histograms.

Beyond-reference scope (the reference computes no text analytics —
SURVEY.md §2 has no text operators; these extend the engine's
training-data family alongside operators/text.py and dedup.py, reusing
the same tokenization contract: lower, squeeze \\s+, split on ' ').

Scale notes (100 TB): every query is explode -> map-side-combined
aggregate or a pure row-local projection; the widest shuffle key is
(doc_id, term) which is near-unique, so no skew. Contamination joins
hash-partition both sides on the fingerprint — the standard layout for
corpus-vs-benchmark decontamination at web scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import davg, davg_sql
from ..tables import fan_out, load_table
from .sampling import _TRAIN_LT, _VAL_LT, hash256, hash256_sql


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _toks():
    return F.split(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "), " ")


_TOKS_SQL = "string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' ')"


# ---------------------------------------------------------------------------
# Repetition score (Gopher-style quality signals)
# ---------------------------------------------------------------------------

def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals, the Gopher/FineWeb filters:
    distinct-word fraction, top-word dominance (count of the most
    frequent word / total words), and duplicate-bigram fraction.
    Highly repetitive machine-generated text scores low/high on these
    and is dropped before training.

    Plan: the distinct fractions are ROW-LOCAL array expressions
    (size/array_distinct inside codegen — no fan-out, no shuffle);
    only the top-word count needs a histogram, which is the single
    explode + two-stage aggregate. The (doc_id, word) group is
    map-side combined and near-unique, so no skew; the per-doc
    reduction rides the same partitioning (doc_id is a key prefix).
    The top-word count folds over the SORTED token array (longest run
    of equal adjacent tokens == max frequency) so the whole query is
    one scan of row-local array expressions — no explode, no shuffle,
    no self-join. fan_out widens the CPU-bound stage across cores
    (the single-file fixture scan otherwise pins it to one task; a
    no-op at real scale where the scan already splits)."""
    docs = fan_out(spark, _docs(spark, sf_dir))
    toks = docs.select("doc_id", _toks().alias("toks")) \
               .filter(F.size("toks") >= 2)
    bigrams = F.expr("transform(sequence(0, size(toks) - 2),"
                     " i -> concat(toks[i], ' ', toks[i + 1]))")
    top_cnt = F.expr("""
        aggregate(
          array_sort(toks),
          struct(CAST('' AS STRING) AS prev, 0L AS run, 0L AS best),
          (acc, x) -> struct(
            x AS prev,
            IF(x = acc.prev, acc.run + 1, 1L) AS run,
            GREATEST(acc.best, IF(x = acc.prev, acc.run + 1, 1L)) AS best),
          acc -> acc.best)""")
    return (
        toks.select(
            "doc_id",
            F.size("toks").cast("long").alias("n_words"),
            (F.size(F.array_distinct("toks")) / F.size("toks"))
            .alias("distinct_word_frac"),
            (top_cnt / F.size("toks")).alias("top_word_frac"),
            (1.0 - F.size(F.array_distinct(bigrams))
             / (F.size("toks") - 1)).alias("dup_bigram_frac"))
        .orderBy("doc_id")
    )


_REPETITION_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS t FROM documents
  WHERE len({_TOKS_SQL}) >= 2),
words AS (SELECT doc_id, unnest(t) AS word FROM toks),
per_word AS (SELECT doc_id, word, COUNT(*) AS cnt
             FROM words GROUP BY doc_id, word),
word_stats AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_words, COUNT(*) AS n_distinct,
         MAX(cnt) AS top_cnt
  FROM per_word GROUP BY doc_id),
bigrams AS (
  SELECT doc_id, unnest(list_transform(range(1, len(t)),
                                       i -> t[i] || ' ' || t[i + 1])) AS bg
  FROM toks),
per_bg AS (SELECT doc_id, bg, COUNT(*) AS cnt FROM bigrams
           GROUP BY doc_id, bg),
bg_stats AS (
  SELECT doc_id, SUM(cnt) AS n_bigrams, COUNT(*) AS n_distinct_bg
  FROM per_bg GROUP BY doc_id)
SELECT w.doc_id, w.n_words,
       CAST(w.n_distinct AS DOUBLE) / w.n_words AS distinct_word_frac,
       CAST(w.top_cnt AS DOUBLE) / w.n_words AS top_word_frac,
       1.0 - CAST(b.n_distinct_bg AS DOUBLE) / b.n_bigrams
         AS dup_bigram_frac
FROM word_stats w JOIN bg_stats b ON w.doc_id = b.doc_id
ORDER BY w.doc_id
"""


# ---------------------------------------------------------------------------
# Cross-split contamination (train/eval leakage detection)
# ---------------------------------------------------------------------------

def q_cross_split_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Evaluation-split documents whose 8-word-prefix fingerprint also
    appears in the train split — the decontamination check every
    benchmark-aware corpus build runs before training. Reuses the
    hash_split assignment (sampling.py) and the prefix fingerprint
    contract (text.q_doc_fingerprint).

    Plan: one scan computes (split, prefix_fp) row-locally; the
    self-join hash-partitions both sides on the 128-bit fingerprint
    (near-unique key, no skew). At 100 TB the train side would be
    written bucketed by fingerprint once and reused across eval
    sets."""
    docs = _docs(spark, sf_dir)
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    prefix_fp = F.md5(F.concat_ws(" ", F.slice(F.split(norm, " "), 1, 8)))
    tagged = docs.select(
        "doc_id",
        F.when(hash256(F.col("doc_id"), "split:") < _TRAIN_LT, "train")
        .otherwise("eval").alias("split"),
        prefix_fp.alias("prefix_fp"))
    train = (tagged.filter(F.col("split") == "train")
             .select(F.col("doc_id").alias("train_doc_id"), "prefix_fp"))
    ev = (tagged.filter(F.col("split") == "eval")
          .select(F.col("doc_id").alias("eval_doc_id"), "prefix_fp"))
    return (ev.join(train, "prefix_fp")
            .select("eval_doc_id", "train_doc_id", "prefix_fp")
            .orderBy("eval_doc_id", "train_doc_id"))


_CONTAMINATION_SQL = f"""
WITH tagged AS (
  SELECT doc_id,
         CASE WHEN {hash256_sql('doc_id', 'split:')} < {_TRAIN_LT}
              THEN 'train' ELSE 'eval' END AS split,
         md5(array_to_string(list_slice(string_split(
           regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' '),
           1, 8), ' ')) AS prefix_fp
  FROM documents)
SELECT e.doc_id AS eval_doc_id, t.doc_id AS train_doc_id, e.prefix_fp
FROM tagged e JOIN tagged t ON e.prefix_fp = t.prefix_fp
WHERE e.split = 'eval' AND t.split = 'train'
ORDER BY eval_doc_id, train_doc_id
"""


# ---------------------------------------------------------------------------
# Per-source quality rollup
# ---------------------------------------------------------------------------

def q_source_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (source, lang) corpus health: doc count, average length,
    average token count, and the fraction of short documents (< 200
    chars) — the dashboard that decides which crawl sources to keep.
    One map-side-combined aggregate over a tiny (source x lang)
    domain; the token count is a row-local array size, so the whole
    query is a single shuffle of partial aggregates."""
    docs = _docs(spark, sf_dir)
    return (
        docs.groupBy("source", "lang")
        .agg(F.count("*").alias("n_docs"),
             davg(F.col("n_chars").cast("double")).alias("avg_chars"),
             davg(F.size(_toks()).cast("double")).alias("avg_tokens"),
             davg(F.when(F.col("n_chars") < 200, 1.0).otherwise(0.0))
             .alias("short_doc_frac"))
        .orderBy("source", "lang")
    )


_SOURCE_QUALITY_SQL = f"""
SELECT source, lang, COUNT(*) AS n_docs,
       {davg_sql('CAST(n_chars AS DOUBLE)')} AS avg_chars,
       {davg_sql(f'CAST(len({_TOKS_SQL}) AS DOUBLE)')} AS avg_tokens,
       {davg_sql('CASE WHEN n_chars < 200 THEN 1.0 ELSE 0.0 END')}
         AS short_doc_frac
FROM documents
GROUP BY source, lang
ORDER BY source, lang
"""


# ---------------------------------------------------------------------------
# Length histogram (order-of-magnitude buckets)
# ---------------------------------------------------------------------------

def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length distribution in decimal order-of-magnitude
    buckets (bucket = digit count of n_chars — exact integer
    arithmetic on both engines, unlike floor(log10) whose FP rounding
    can flip at bucket edges). Per (lang, bucket): count, min/max,
    and corpus share."""
    docs = _docs(spark, sf_dir)
    bucket = F.length(F.col("n_chars").cast("string")).alias("magnitude")
    per = (docs.groupBy("lang", bucket)
           .agg(F.count("*").alias("n_docs"),
                F.min("n_chars").alias("min_chars"),
                F.max("n_chars").alias("max_chars")))
    total = per.agg(F.sum("n_docs").alias("n_total"))
    return (per.join(F.broadcast(total))
            .select("lang", "magnitude", "n_docs", "min_chars", "max_chars",
                    (F.col("n_docs") / F.col("n_total")).alias("corpus_frac"))
            .orderBy("lang", "magnitude"))


_LENGTH_HISTOGRAM_SQL = """
WITH per AS (
  SELECT lang, length(CAST(n_chars AS VARCHAR)) AS magnitude,
         COUNT(*) AS n_docs, MIN(n_chars) AS min_chars,
         MAX(n_chars) AS max_chars
  FROM documents GROUP BY lang, magnitude)
SELECT lang, magnitude, n_docs, min_chars, max_chars,
       CAST(n_docs AS DOUBLE) / (SELECT SUM(n_docs) FROM per) AS corpus_frac
FROM per
ORDER BY lang, magnitude
"""


# ---------------------------------------------------------------------------
# Bigram language-model scoring (perplexity-style quality signal)
# ---------------------------------------------------------------------------

def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean bigram log-probability under an add-one-
    smoothed corpus bigram model: score(d) = mean over bigrams of
    ln((c(w1 w2) + 1) / (c(w1) + V)). The self-trained flavor of the
    perplexity filters (CCNet/Gopher) used to drop incoherent text —
    documents far below the corpus mean are outliers.

    Plan: two count aggregates (bigram, unigram) over one explode;
    the model tables join back onto the exploded fact side keyed by
    near-unique n-grams (no skew), then one per-doc reduction. At
    100 TB the model side is vocabulary-sized — still orders of
    magnitude under the corpus, broadcast or bucketed once. Scores
    round to 6 decimals on both engines so ln() ULP noise cannot flip
    the hash compare."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", _toks().alias("toks")) \
               .filter(F.size("toks") >= 2)
    # explode_outer + IS NOT NULL throughout: plain explode lets the
    # optimizer infer size()>0 and push the tokenization below the
    # exchange into the scan filter (see eval_ngram_contamination).
    words = (toks.select("doc_id", F.explode_outer("toks").alias("w"))
             .filter(F.col("w").isNotNull()))
    uni = words.groupBy("w").agg(F.count("*").alias("c1"))
    vocab = uni.agg(F.count("*").alias("v"))
    bigrams = (toks.select(
        "doc_id",
        F.explode_outer(F.expr(
            "transform(sequence(0, size(toks) - 2),"
            " i -> struct(toks[i] AS w1, toks[i + 1] AS w2))")).alias("bg"))
        .filter(F.col("bg").isNotNull())
        .select("doc_id", "bg.w1", "bg.w2"))
    model = (bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c12")))
    scored = (
        bigrams
        .join(model, ["w1", "w2"])
        .join(uni.withColumnRenamed("w", "w1"), "w1")
        .join(F.broadcast(vocab))
        .withColumn("logp", F.log((F.col("c12") + 1.0)
                                  / (F.col("c1") + F.col("v"))))
    )
    return (scored.groupBy("doc_id")
            .agg(F.count("*").alias("n_bigrams"),
                 F.round(F.avg("logp"), 6).alias("avg_logprob"))
            .orderBy("doc_id"))


_BIGRAM_LM_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS t FROM documents
  WHERE len({_TOKS_SQL}) >= 2),
words AS (SELECT doc_id, unnest(t) AS w FROM toks),
uni AS (SELECT w, COUNT(*) AS c1 FROM words GROUP BY w),
bigrams AS (
  SELECT doc_id, unnest(list_transform(range(1, len(t)),
    i -> {{'w1': t[i], 'w2': t[i + 1]}})) AS bg
  FROM toks),
flat AS (SELECT doc_id, bg.w1 AS w1, bg.w2 AS w2 FROM bigrams),
model AS (SELECT w1, w2, COUNT(*) AS c12 FROM flat GROUP BY w1, w2),
scored AS (
  SELECT f.doc_id,
         ln((m.c12 + 1.0) / (u.c1 + (SELECT COUNT(*) FROM uni))) AS logp
  FROM flat f
  JOIN model m ON f.w1 = m.w1 AND f.w2 = m.w2
  JOIN uni u ON f.w1 = u.w)
SELECT doc_id, COUNT(*) AS n_bigrams,
       round(AVG(logp), 6) AS avg_logprob
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Robust length-outlier detection (median / MAD)
# ---------------------------------------------------------------------------

#: 1 / Φ⁻¹(3/4): scales MAD to estimate σ under normality — the
#: standard robust-z consistency constant.
_MAD_K = 1.4826


def q_length_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source robust length outliers: flag documents whose length
    deviates from the SOURCE median by more than 3 robust standard
    deviations (1.4826·MAD). Mean/stddev outlier gates are themselves
    corrupted by the outliers they hunt (a few 100 MB pathological
    docs drag the mean); median/MAD is the screen real corpus QA uses.

    Both medians use percentile_disc — a member value, no
    interpolation — so Spark and DuckDB agree exactly on integer
    lengths; both are cast to BIGINT on output (Spark's
    percentile_disc returns DOUBLE, DuckDB's quantile_disc over a
    BIGINT column returns BIGINT — a member value of an integer
    column is integral, so the cast is lossless and aligns the
    engines' output types). Shape: two bytes-per-source aggregates (median, then MAD
    of deviations) broadcast back onto the scan; the flag itself is
    row-local. No full-data shuffle at any point."""
    docs = _docs(spark, sf_dir).select("doc_id", "source", "n_chars")
    med = docs.groupBy("source").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)")
        .alias("med"))
    dev = (docs.join(F.broadcast(med), "source")
           .withColumn("adev", F.abs(F.col("n_chars") - F.col("med"))))
    mad = dev.groupBy("source").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)")
        .alias("mad"))
    z = ((F.col("n_chars") - F.col("med")).cast("double")
         / F.nullif(F.lit(_MAD_K) * F.col("mad").cast("double"), F.lit(0.0)))
    return (dev.join(F.broadcast(mad), "source")
            .withColumn("robust_z", z)
            .withColumn("is_outlier",
                        F.coalesce(F.abs(F.col("robust_z")) > 3.0,
                                   F.lit(False)))
            .select("doc_id", "source", "n_chars",
                    F.col("med").cast("long").alias("med"),
                    F.col("mad").cast("long").alias("mad"),
                    "robust_z", "is_outlier"))


_LENGTH_OUTLIERS_SQL = f"""
WITH med AS (
  SELECT source, quantile_disc(n_chars, 0.5) AS med
  FROM documents GROUP BY source),
dev AS (
  SELECT d.doc_id, d.source, d.n_chars, m.med,
         abs(d.n_chars - m.med) AS adev
  FROM documents d JOIN med m USING (source)),
mad AS (
  SELECT source, quantile_disc(adev, 0.5) AS mad
  FROM dev GROUP BY source)
SELECT dev.doc_id, dev.source, dev.n_chars, dev.med, mad.mad,
       CAST(dev.n_chars - dev.med AS DOUBLE)
         / nullif({_MAD_K} * CAST(mad.mad AS DOUBLE), 0.0) AS robust_z,
       COALESCE(abs(CAST(dev.n_chars - dev.med AS DOUBLE)
         / nullif({_MAD_K} * CAST(mad.mad AS DOUBLE), 0.0)) > 3.0, FALSE)
         AS is_outlier
FROM dev JOIN mad USING (source)
"""


# ---------------------------------------------------------------------------
# Benchmark decontamination by fractional 13-gram overlap
# ---------------------------------------------------------------------------

_DECON_N = 13     # the GPT-3/PaLM-style decontamination gram width
_DECON_FRAC = 0.25


def q_eval_ngram_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional 13-gram decontamination — the standard published
    recipe: a train document is contaminated if a fraction of its
    distinct 13-grams also occurs in the held-out (test-split) set.
    Sharper than whole-doc fingerprints (cross_split_contamination),
    which miss partial inclusions of an eval item inside a larger
    train doc.

    Scale shape: the eval side (a benchmark) is tiny next to a 100 TB
    corpus, so its distinct gram hashes BROADCAST; train grams never
    shuffle — each train doc's distinct grams are checked map-side
    against the broadcast set (left-semi), and only MATCHED gram rows
    reach the per-doc count shuffle. The per-doc denominator is a
    row-local array expression, never an exploded aggregate."""
    docs = _docs(spark, sf_dir)
    split_h = hash256(F.col("doc_id"), "split:")
    # NB 1: Spark's sequence(1, 0) yields the DESCENDING [1, 0], so a
    # short doc must short-circuit to array() instead of relying on an
    # empty sequence.
    # NB 2: the gram transform MUST run over a materialized token
    # column `w` — writing slice(split(text)) inside the lambda makes
    # Spark re-split the whole text once per gram position, turning a
    # linear pass into O(tokens²) (measured 9x slower at sf1.0).
    grams = F.expr(
        f"CASE WHEN size(w) < {_DECON_N} "
        f"THEN array() ELSE array_distinct(transform("
        f"sequence(1, size(w) - {_DECON_N - 1}), "
        f"i -> md5(array_join(slice(w, i, {_DECON_N}), ' ')))) END")
    # fan_out: the fixture's documents.parquet is a single row group,
    # so without it the gram transform + explode + semi-join all run
    # on ONE task (measured 3.5 s at sf0.1, 30 s serial at sf1.0); at
    # scale the scan is already wide and this is a guarded no-op.
    base = (fan_out(spark, docs)
            .withColumn("w", F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
            .select("doc_id", grams.alias("grams"), split_h.alias("h")))
    # explode_outer + IS NOT NULL instead of explode: explode makes
    # InferFiltersFromGenerate add `size(grams) > 0`, which predicate
    # pushdown SUBSTITUTES through the projection and pushes below the
    # exchange — the entire gram computation then re-runs inside the
    # scan filter on the narrow (single-task) side. Measured 34 s vs
    # 1 s at sf1.0 for the identical row set. explode_outer infers no
    # such filter; the null filter on the OUTPUT column cannot sink
    # below the Generate.
    eval_grams = (base.filter(F.col("h") >= _VAL_LT)
                  .select(F.explode_outer("grams").alias("gram"))
                  .filter(F.col("gram").isNotNull()).distinct())
    # The per-doc denominator rides ALONG the exploded gram rows
    # (constant per doc, recovered with max) instead of a second
    # branch off `base` — Spark does not dedupe common plan subtrees,
    # so a separate size(grams) branch + join-back would execute the
    # whole gram-computation scan a third time.
    train = base.filter(F.col("h") < _TRAIN_LT)
    matched = (train.select("doc_id",
                            F.size("grams").alias("n_grams"),
                            F.explode_outer("grams").alias("gram"))
               .filter(F.col("gram").isNotNull())
               .join(F.broadcast(eval_grams), "gram", "left_semi")
               .groupBy("doc_id").agg(F.max("n_grams").alias("n_grams"),
                                      F.count("*").alias("n_matched")))
    return (matched
            .withColumn("overlap_frac",
                        F.col("n_matched")
                        / F.col("n_grams").cast("double"))
            .withColumn("contaminated",
                        F.col("overlap_frac") >= _DECON_FRAC)
            .select("doc_id", "n_grams", "n_matched", "overlap_frac",
                    "contaminated"))


_EVAL_CONTAMINATION_SQL = f"""
WITH g AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, greatest(len(string_split_regex(trim(lower(text)),
                                                    '\\s+'))
                             - {_DECON_N - 1}, 0) + 1),
           i -> md5(array_to_string(list_slice(
                  string_split_regex(trim(lower(text)), '\\s+'),
                  i, i + {_DECON_N - 1}), ' ')))) AS grams,
         {hash256_sql('doc_id', 'split:')} AS h
  FROM documents),
eval_grams AS (
  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE h >= {_VAL_LT}),
train AS (SELECT doc_id, grams FROM g WHERE h < {_TRAIN_LT}),
matched AS (
  SELECT t.doc_id, COUNT(*) AS n_matched
  FROM (SELECT doc_id, unnest(grams) AS gram FROM train) t
  JOIN eval_grams e USING (gram)
  GROUP BY t.doc_id)
SELECT t.doc_id, len(t.grams) AS n_grams, m.n_matched,
       m.n_matched / CAST(len(t.grams) AS DOUBLE) AS overlap_frac,
       m.n_matched / CAST(len(t.grams) AS DOUBLE) >= {_DECON_FRAC}
         AS contaminated
FROM train t JOIN matched m USING (doc_id)
"""


# ---------------------------------------------------------------------------
# DSIR-style hashed-n-gram importance weights
# ---------------------------------------------------------------------------

#: Feature-hash buckets. DSIR (Xie et al. 2023, "Data Selection for
#: Language Models via Importance Resampling") hashes n-grams into a
#: fixed bucket space so the target/raw models stay BOUNDED no matter
#: how large the corpus grows; 4096 here, 10k in the paper.
_DSIR_B = 4096


def _bucket4096(col):
    """0..4095 from the first three hex chars of md5 — the 3-char
    extension of sampling.hash256, equally engine-portable."""
    h = F.md5(col)
    out = None
    for i in (1, 2, 3):
        d = F.instr(F.lit("0123456789abcdef"), F.substring(h, i, 1)) - 1
        out = d if out is None else out * 16 + d
    return out


def _bucket4096_sql(expr: str) -> str:
    h = f"md5({expr})"
    return ("(((strpos('0123456789abcdef', substring({h}, 1, 1)) - 1) * 16"
            " + (strpos('0123456789abcdef', substring({h}, 2, 1)) - 1)) * 16"
            " + (strpos('0123456789abcdef', substring({h}, 3, 1)) - 1))"
            ).format(h=h)


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: per document, the mean log-ratio of
    hashed-bigram probabilities under a TARGET distribution (here the
    `lang = 'en'` slice, standing in for the paper's "formal text"
    target) vs the RAW corpus, with add-one smoothing. Documents with
    high `avg_log_ratio` look like the target — importance RESAMPLING
    then keeps doc d with probability ∝ exp(weight), which is exactly
    `mixture_sample`'s thresholded-hash machinery applied to these
    weights.

    Scale shape: feature hashing bounds both models at _DSIR_B rows
    REGARDLESS of corpus size, so the model table (bucket,
    c_target, c_raw) is a broadcast join onto the exploded bigram
    stream — corpus-sized shuffle only for the per-doc mean. Scores
    round to 6 decimals so ln() ULP noise cannot flip the compare."""
    docs = _docs(spark, sf_dir)
    toked = (fan_out(spark, docs.filter(
        F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")) >= 2))
        .select("doc_id", "lang", _toks().alias("toks")))
    bg = (toked.select(
        "doc_id", "lang",
        F.explode_outer(F.expr(
            "transform(sequence(0, size(toks) - 2),"
            " i -> concat(toks[i], ' ', toks[i + 1]))")).alias("bg"))
        .filter(F.col("bg").isNotNull())
        .select("doc_id", "lang", _bucket4096(F.col("bg")).alias("bucket")))
    model = (bg.groupBy("bucket").agg(
        F.count("*").alias("c_raw"),
        F.sum((F.col("lang") == "en").cast("long")).alias("c_target")))
    totals = model.agg(F.sum("c_raw").cast("double").alias("n_raw"),
                       F.sum("c_target").cast("double").alias("n_target"))
    log_ratio = (
        F.log((F.col("c_target") + 1.0) / (F.col("n_target") + float(_DSIR_B)))
        - F.log((F.col("c_raw") + 1.0) / (F.col("n_raw") + float(_DSIR_B))))
    return (bg.join(F.broadcast(model.crossJoin(F.broadcast(totals))), "bucket")
            .groupBy("doc_id")
            .agg(F.count("*").alias("n_bigrams"),
                 F.round(F.avg(log_ratio), 6).alias("avg_log_ratio"))
            .orderBy("doc_id"))


_DSIR_SQL = f"""
WITH toked AS (
  SELECT doc_id, lang, {_TOKS_SQL} AS t FROM documents
  WHERE len(string_split_regex(trim(lower(text)), '\\s+')) >= 2),
bg AS (
  SELECT doc_id, lang,
         {_bucket4096_sql("bgs")} AS bucket
  FROM (SELECT doc_id, lang,
               unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i + 1])) AS bgs
        FROM toked)),
model AS (
  SELECT bucket, COUNT(*) AS c_raw,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS c_target
  FROM bg GROUP BY bucket),
tot AS (
  SELECT CAST(SUM(c_raw) AS DOUBLE) AS n_raw,
         CAST(SUM(c_target) AS DOUBLE) AS n_target
  FROM model)
SELECT doc_id, COUNT(*) AS n_bigrams,
       round(AVG(ln((m.c_target + 1.0) / (t.n_target + {float(_DSIR_B)}))
                 - ln((m.c_raw + 1.0) / (t.n_raw + {float(_DSIR_B)}))), 6)
         AS avg_log_ratio
FROM bg JOIN model m USING (bucket), tot t
GROUP BY doc_id ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Distribution drift: population stability index (PSI) per event type
# ---------------------------------------------------------------------------

_PSI_BINS = 10
_PSI_BIN_W = 50.0


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the `value` distribution per
    event_type between a reference window (days 1-15) and the current
    window (rest of the month) — the day-over-day drift alarm every
    production feature pipeline runs before trusting new data
    (PSI < 0.1 stable, 0.1-0.25 drifting, > 0.25 broken, the standard
    credit-scoring thresholds).

    Fixed-width bins (10 × 50.0, top bin open) so binning is
    data-independent and row-local; Laplace-smoothed shares
    ``(n_b + 1) / (N + bins)`` make empty bins well-defined with
    all-integer numerators, so both engines divide the same integers.
    The PSI sum folds the per-bin contributions SEQUENTIALLY in bin
    order (`aggregate` over a sorted struct array ≡ DuckDB
    `list_reduce` over `list(... ORDER BY bin)`) — float addition is
    not associative, and a parallel SUM would drift between engines —
    and the result is rounded to 6 decimals because JVM Math.log and
    libm log can disagree in the last ulp (observed 1-ulp drift on
    the fixture); 1e-6 is far below any PSI decision threshold.

    Scale shape: one scan → groupBy(event_type, bin) with map-side
    combine (≤ types × bins rows shuffle); totals via a window over
    the bins frame (bytes-sized); the fold runs on 10-element arrays.
    Nothing corpus-sized moves."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    win_ref = F.dayofmonth("ts") <= 15
    b = F.least(F.floor(F.col("value") / _PSI_BIN_W),
                F.lit(_PSI_BINS - 1)).cast("int")
    counts = (ev.select("event_type", win_ref.alias("is_ref"), b.alias("bin"))
              .groupBy("event_type", "bin")
              .agg(F.sum(F.col("is_ref").cast("long")).alias("ref_n"),
                   F.sum((~F.col("is_ref")).cast("long")).alias("cur_n")))
    # densify: every (event_type, bin) cell, absent bins = 0
    bins = spark.range(_PSI_BINS).select(F.col("id").cast("int").alias("bin"))
    grid = (counts.select("event_type").distinct().crossJoin(F.broadcast(bins))
            .join(counts, ["event_type", "bin"], "left")
            .fillna(0, subset=["ref_n", "cur_n"]))
    w = W.partitionBy("event_type")
    dens = (grid
            .withColumn("ref_t", F.sum("ref_n").over(w))
            .withColumn("cur_t", F.sum("cur_n").over(w)))
    p = (F.col("ref_n") + 1) / (F.col("ref_t") + _PSI_BINS)
    q = (F.col("cur_n") + 1) / (F.col("cur_t") + _PSI_BINS)
    contrib = (p - q) * F.log(p / q)
    per_bin = dens.select("event_type", "bin", "ref_t", "cur_t",
                          contrib.alias("contrib"))
    return (per_bin.groupBy("event_type")
            .agg(F.max("ref_t").alias("n_ref"),
                 F.max("cur_t").alias("n_cur"),
                 F.round(F.aggregate(
                     F.array_sort(F.collect_list(
                         F.struct("bin", "contrib"))),
                     F.lit(0.0),
                     lambda acc, s: acc + s["contrib"]), 6).alias("psi"))
            .orderBy("event_type"))


_PSI_SQL = f"""
WITH c AS (
  SELECT event_type,
         CAST(least(floor(value / {_PSI_BIN_W}), {_PSI_BINS - 1}) AS INT)
           AS bin,
         SUM(CASE WHEN date_part('day', ts) <= 15 THEN 1 ELSE 0 END)
           AS ref_n,
         SUM(CASE WHEN date_part('day', ts) <= 15 THEN 0 ELSE 1 END)
           AS cur_n
  FROM events GROUP BY 1, 2),
grid AS (
  SELECT t.event_type, b.bin,
         COALESCE(c.ref_n, 0) AS ref_n, COALESCE(c.cur_n, 0) AS cur_n
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT unnest(range({_PSI_BINS})) AS bin) b
  LEFT JOIN c ON c.event_type = t.event_type AND c.bin = b.bin),
dens AS (
  SELECT *, SUM(ref_n) OVER (PARTITION BY event_type) AS ref_t,
            SUM(cur_n) OVER (PARTITION BY event_type) AS cur_t
  FROM grid),
contribs AS (
  SELECT event_type, bin, ref_t, cur_t,
         (((ref_n + 1) / CAST(ref_t + {_PSI_BINS} AS DOUBLE))
          - ((cur_n + 1) / CAST(cur_t + {_PSI_BINS} AS DOUBLE)))
         * ln(((ref_n + 1) / CAST(ref_t + {_PSI_BINS} AS DOUBLE))
              / ((cur_n + 1) / CAST(cur_t + {_PSI_BINS} AS DOUBLE)))
           AS contrib
  FROM dens)
SELECT event_type,
       CAST(MAX(ref_t) AS BIGINT) AS n_ref,
       CAST(MAX(cur_t) AS BIGINT) AS n_cur,
       round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                      list(contrib ORDER BY bin)),
                         (acc, v) -> acc + v), 6) AS psi
FROM contribs GROUP BY event_type ORDER BY event_type
"""


def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-type value statistics over the event stream: the
    p05/p95 member values (percentile_disc — no interpolation, so
    Spark and DuckDB pick the identical element), row-local clamping,
    and the decimal-exact mean of the clamped values. The robust
    cousin of a plain AVG — one corrupted feed emitting 1e12s shifts
    a mean arbitrarily but cannot move a winsorized mean past the
    p95 fence; this is the metric ingest monitoring alarms on.

    Scale shape: one bytes-per-type percentile aggregate broadcast
    back onto the scan, then one map-side-combined grouped aggregate
    over the clamped column — same two-aggregate layout as
    q_length_outliers, no full-data shuffle."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    pct = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY value)")
        .alias("p05"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY value)")
        .alias("p95"))
    clamped = (ev.join(F.broadcast(pct), "event_type")
               .withColumn("cl", F.greatest("p05", F.least("p95", "value"))))
    return (clamped.groupBy("event_type")
            .agg(F.first("p05").alias("p05"), F.first("p95").alias("p95"),
                 F.count("*").alias("n"),
                 F.sum((F.col("value") < F.col("p05")).cast("long"))
                 .alias("n_clamped_low"),
                 F.sum((F.col("value") > F.col("p95")).cast("long"))
                 .alias("n_clamped_high"),
                 davg(F.col("cl")).alias("winsorized_mean"))
            .orderBy("event_type"))


_WINSORIZED_SQL = f"""
WITH pct AS (
  SELECT event_type,
         quantile_disc(value, 0.05) AS p05,
         quantile_disc(value, 0.95) AS p95
  FROM events GROUP BY event_type),
cl AS (
  SELECT e.event_type, p.p05, p.p95, e.value,
         greatest(p.p05, least(p.p95, e.value)) AS cl
  FROM events e JOIN pct p USING (event_type))
SELECT event_type, MIN(p05) AS p05, MIN(p95) AS p95,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN value < p05 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clamped_low,
       CAST(SUM(CASE WHEN value > p95 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clamped_high,
       {davg_sql('cl')} AS winsorized_mean
FROM cl GROUP BY event_type ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# N-gram novelty (incremental-ingest freshness of each document)
# ---------------------------------------------------------------------------

#: Gram width for the novelty signal (narrower than dup_ngram_spans'
#: 8: novelty asks "have we seen this phrase at all", duplication
#: asks "is this span a copy" — shorter grams saturate earlier, which
#: is the point of a freshness metric).
_NOV_N = 5


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty at ingest order: for every word-
    5-gram position, was that gram FIRST seen in an earlier document
    (min doc_id over the corpus < this doc_id)? Emits per doc the
    gram count, the count already seen, and novelty_frac = fraction
    of positions that are corpus-new. This is the curve data
    curation teams watch as a crawl matures — novelty decaying
    toward 0 means additional ingest is re-buying the same text
    (cf. the duplication-growth analyses in the public
    CCNet/RefinedWeb pipeline papers); dup_ngram_spans answers
    "is this doc a copy", novelty answers "is this doc NEW".

    Scale shape — same two-bounded-shuffle layout as dup_ngram_spans
    and no self-join: stage 1 shuffles gram rows on the gram hash
    where a window MIN computes the first-occurrence doc; stage 2
    re-aggregates on doc_id. A hot stop-phrase gram costs O(k) rows
    in one partition, never O(k²); linear in corpus grams at any
    scale, and the ingest-order semantics need no global sort —
    MIN(doc_id) is order-free. Gram keys are the repo's 60-bit md5
    fingerprint (doc_fingerprint's fp64 idiom), not the 32-char hex
    string: both bounded shuffles move 8-byte longs instead of ~40-
    byte strings (a collision merges the same two grams in BOTH
    engines, so parity is unaffected; at 150 M grams the birthday
    odds of even one 60-bit collision are ~1%)."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").filter(
        F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+")) >= _NOV_N)
    grams = (
        fan_out(spark, docs)
        .withColumn("w", F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
        .select(
            "doc_id",
            F.posexplode_outer(F.expr(
                f"CASE WHEN size(w) < {_NOV_N} THEN array() ELSE "
                f"transform(sequence(0, size(w) - {_NOV_N}), "
                f"i -> CAST(conv(substring(md5(concat_ws(' ', "
                f"slice(w, i + 1, {_NOV_N}))), 1, 15), 16, 10) AS BIGINT)) "
                f"END"
            )).alias("pos", "gh"))
    )
    wg = Window.partitionBy("gh")
    first = grams.withColumn("first_doc", F.min("doc_id").over(wg))
    return (
        first.groupBy("doc_id").agg(
            F.count("*").alias("n_grams"),
            F.sum((F.col("first_doc") < F.col("doc_id")).cast("long"))
            .alias("n_seen"))
        .withColumn("novelty_frac",
                    (F.col("n_grams") - F.col("n_seen"))
                    / F.col("n_grams").cast("double"))
        .select("doc_id", "n_grams", "n_seen", "novelty_frac")
    )


_NOVELTY_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS w
  FROM documents),
g AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(
           array_to_string(list_slice(w, i + 1, i + {_NOV_N}), ' ')),
           1, 15)) AS BIGINT) AS gh
  FROM (SELECT doc_id, w,
               unnest(range(0, len(w) - {_NOV_N - 1})) AS i
        FROM toks WHERE len(w) >= {_NOV_N})),
fo AS (SELECT gh, MIN(doc_id) AS first_doc FROM g GROUP BY gh)
SELECT g.doc_id,
       COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN fo.first_doc < g.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_seen,
       (COUNT(*) - SUM(CASE WHEN fo.first_doc < g.doc_id THEN 1 ELSE 0 END))
         / CAST(COUNT(*) AS DOUBLE) AS novelty_frac
FROM g JOIN fo USING (gh)
GROUP BY g.doc_id
"""


# ---------------------------------------------------------------------------
# Per-source token entropy (corpus diversity)
# ---------------------------------------------------------------------------

def q_source_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each source's token distribution — the
    corpus-diversity number mixture designers watch next to the raw
    counts (a low-entropy source is template/boilerplate-heavy and
    buys fewer effective tokens than its size suggests; cf. the
    diversity analyses in the public Gopher/Dolma corpus reports).

    Exactness: p = c/N divides engine-identical integers; the
    −p·ln p contributions fold SEQUENTIALLY in word order (the
    psi_drift discipline — float addition is not associative and a
    parallel SUM would drift), rounded 1e-6 for the JVM-vs-libm ln
    ulp. Scale shape: explode → map-side-combined (source, word)
    histogram (near-unique key, no skew); the fold runs over each
    source's vocab list, vocab-sized, never corpus-sized."""
    words = (fan_out(spark, _docs(spark, sf_dir))
             .select("source", F.explode(_toks()).alias("w")))
    pw = words.groupBy("source", "w").agg(F.count("*").alias("c"))
    from pyspark.sql.window import Window
    ws = Window.partitionBy("source")
    pw = (pw.withColumn("n_tokens", F.sum("c").over(ws))
          .withColumn("vocab_size", F.count("*").over(ws)))
    p = F.col("c").cast("double") / F.col("n_tokens").cast("double")
    contrib = (-p * F.log(p)).alias("contrib")
    per_word = pw.select("source", "w", "n_tokens", "vocab_size", contrib)
    return (per_word.groupBy("source")
            .agg(F.max("n_tokens").alias("n_tokens"),
                 F.max("vocab_size").alias("vocab_size"),
                 F.round(F.aggregate(
                     F.array_sort(F.collect_list(F.struct("w", "contrib"))),
                     F.lit(0.0),
                     lambda acc, s: acc + s["contrib"]), 6)
                 .alias("entropy"))
            .orderBy("source"))


_ENTROPY_SQL = f"""
WITH words AS (
  SELECT source, unnest({_TOKS_SQL}) AS w FROM documents),
pw AS (SELECT source, w, COUNT(*) AS c FROM words GROUP BY source, w),
tot AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
               COUNT(*) AS vocab_size
        FROM pw GROUP BY source),
contribs AS (
  SELECT p.source, p.w,
         -(CAST(p.c AS DOUBLE) / CAST(t.n_tokens AS DOUBLE))
           * ln(CAST(p.c AS DOUBLE) / CAST(t.n_tokens AS DOUBLE)) AS contrib
  FROM pw p JOIN tot t USING (source))
SELECT t.source, t.n_tokens, t.vocab_size,
       round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                      list(c.contrib ORDER BY c.w)),
                         (acc, x) -> acc + x), 6) AS entropy
FROM tot t JOIN contribs c USING (source)
GROUP BY t.source, t.n_tokens, t.vocab_size
ORDER BY t.source
"""


QUERIES = {
    "repetition_score": (q_repetition_score, _REPETITION_SQL),
    "winsorized_stats": (q_winsorized_stats, _WINSORIZED_SQL),
    "psi_drift": (q_psi_drift, _PSI_SQL),
    "dsir_weights": (q_dsir_weights, _DSIR_SQL),
    "length_outliers": (q_length_outliers, _LENGTH_OUTLIERS_SQL),
    "eval_ngram_contamination": (q_eval_ngram_contamination,
                                 _EVAL_CONTAMINATION_SQL),
    "bigram_lm_score": (q_bigram_lm_score, _BIGRAM_LM_SQL),
    "cross_split_contamination": (q_cross_split_contamination,
                                  _CONTAMINATION_SQL),
    "source_quality_stats": (q_source_quality_stats, _SOURCE_QUALITY_SQL),
    "length_histogram": (q_length_histogram, _LENGTH_HISTOGRAM_SQL),
    "ngram_novelty": (q_ngram_novelty, _NOVELTY_SQL),
    "source_token_entropy": (q_source_token_entropy, _ENTROPY_SQL),
}
