"""Similarity search over embedding columns (`embeddings.embedding:
array<float>`, 64-dim): brute-force cosine top-k as the exact baseline,
random-hyperplane LSH bucketing as the scale path, and per-label
centroids as the aggregate form.

Float determinism: all element arithmetic is done in DOUBLE with a
sequential left-to-right reduce on both engines (Spark
`aggregate(zip_with(...))` ≡ DuckDB `list_reduce(list_transform(...))`
— IEEE ops in the same order), so cosine values, and therefore top-k
cutoffs, are bit-identical to the oracle.

Scale notes: brute-force top-k against one query is a broadcast of the
query vector + a single TakeOrdered — linear scan, embarrassingly
parallel, the right baseline even at 10^9 vectors for one-off probes.
The LSH variant prunes to a bucket before scoring; for batch ANN
(many queries) the bucketed equi-join replaces the crossJoin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

#: dot(a, b) with double casts and sequential summation (Spark SQL).
_DOT = ("aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")

def _dot_sql(a: str, b: str) -> str:
    """DuckDB mirror of :data:`_DOT` (1-based lists)."""
    return (f"list_reduce(list_transform(range(1, len({a}) + 1), "
            f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), "
            f"(acc, v) -> acc + v)")


def _with_cosine(df: DataFrame, a: str, b: str) -> DataFrame:
    dot = F.expr(_DOT.format(a=a, b=b))
    na = F.sqrt(F.expr(_DOT.format(a=a, b=a)))
    nb = F.sqrt(F.expr(_DOT.format(a=b, b=b)))
    return df.withColumn("cosine", dot / F.nullif(na * nb, F.lit(0.0)))


def _cosine_sql(a: str, b: str) -> str:
    return (f"{_dot_sql(a, b)} / nullif(sqrt({_dot_sql(a, a)}) * "
            f"sqrt({_dot_sql(b, b)}), 0.0)")


# ---------------------------------------------------------------------------
# Brute-force cosine top-k
# ---------------------------------------------------------------------------

def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 nearest neighbors of vec_id 0 by cosine. The query
    vector broadcasts; the scan is one pass, topped by
    TakeOrderedAndProject (no global sort)."""
    emb = load_table(spark, sf_dir, "embeddings")
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"))
    cand = emb.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(query))
    return (
        _with_cosine(cand, "embedding", "q_emb")
        .select("vec_id", "label", "cosine")
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


_COSINE_TOPK_SQL = f"""
WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0)
SELECT vec_id, label,
       {_cosine_sql('embedding', 'q_emb')} AS cosine
FROM embeddings, q
WHERE vec_id <> 0
ORDER BY cosine DESC, vec_id ASC
LIMIT 10
"""


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (random hyperplanes, deterministic)
# ---------------------------------------------------------------------------

_N_PLANES = 4

def _bucket_expr(emb_col: str) -> str:
    """LSH bucket id: sign bit per hyperplane. Plane p's weight for
    dimension i is ±1 from md5(p||'_'||i) (deterministic, engine-
    portable: +1 iff the first hex digit is 0-7)."""
    bits = []
    for p in range(_N_PLANES):
        proj = (f"aggregate(zip_with({emb_col}, sequence(0, size({emb_col}) - 1), "
                f"(x, i) -> CAST(x AS DOUBLE) * "
                f"(CASE WHEN substring(md5(concat('{p}', '_', CAST(i AS STRING))), 1, 1) "
                f"IN ('0','1','2','3','4','5','6','7') THEN 1.0 ELSE -1.0 END)), "
                f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
        bits.append(f"(CASE WHEN ({proj}) > 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(bits)


def _bucket_sql(emb_col: str) -> str:
    bits = []
    for p in range(_N_PLANES):
        proj = (f"list_reduce(list_transform(range(1, len({emb_col}) + 1), "
                f"i -> CAST({emb_col}[i] AS DOUBLE) * "
                f"(CASE WHEN substring(md5('{p}' || '_' || CAST(i - 1 AS VARCHAR)), 1, 1) "
                f"IN ('0','1','2','3','4','5','6','7') THEN 1.0 ELSE -1.0 END)), "
                f"(acc, v) -> acc + v)")
        bits.append(f"(CASE WHEN ({proj}) > 0 THEN {1 << p} ELSE 0 END)")
    return " + ".join(bits)


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-5 neighbors of vec_id 0: score only vectors in
    the query's hyperplane-sign bucket. Recall < 1 by design — the
    scale path that avoids scoring the whole corpus."""
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", F.expr(_bucket_expr("embedding")))
    query = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb"), F.col("bucket").alias("q_bucket"))
    cand = (emb.crossJoin(F.broadcast(query))
            .filter((F.col("bucket") == F.col("q_bucket"))
                    & (F.col("vec_id") != 0)))
    return (
        _with_cosine(cand, "embedding", "q_emb")
        .select("vec_id", "label", "bucket", "cosine")
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(5)
    )


_ANN_LSH_SQL = f"""
WITH b AS (
  SELECT vec_id, label, embedding,
         {_bucket_sql('embedding')} AS bucket
  FROM embeddings),
q AS (SELECT embedding AS q_emb, bucket AS q_bucket FROM b WHERE vec_id = 0)
SELECT vec_id, label, bucket,
       {_cosine_sql('embedding', 'q_emb')} AS cosine
FROM b, q
WHERE bucket = q_bucket AND vec_id <> 0
ORDER BY cosine DESC, vec_id ASC
LIMIT 5
"""


# ---------------------------------------------------------------------------
# Per-label centroids (array aggregation)
# ---------------------------------------------------------------------------

def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean embedding per label: posexplode → decimal-exact mean per
    (label, dim) → re-assembled order statistic. At scale this is the
    reduce side of k-means/IVF training — one shuffle on (label, dim)."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label", F.posexplode("embedding").alias("dim", "x"))
    per_dim = (
        dims.groupBy("label", "dim")
        .agg((F.sum(F.col("x").cast("double").cast("decimal(25,6)"))
              .cast("double") / F.count("x")).alias("mean_x"))
    )
    return (
        per_dim.groupBy("label")
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mean_x"))),
            lambda s: s["mean_x"]).alias("centroid"),
            F.count("*").alias("n_dims"))
        .orderBy("label")
    )


_LABEL_CENTROIDS_SQL = """
WITH dims AS (
  SELECT label, u.i - 1 AS dim, CAST(embedding[u.i] AS DOUBLE) AS x
  FROM embeddings, (SELECT unnest(range(1, 65)) AS i) u),
per_dim AS (
  SELECT label, dim,
         CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE) / COUNT(x) AS mean_x
  FROM dims GROUP BY label, dim)
SELECT label,
       list(mean_x ORDER BY dim) AS centroid,
       COUNT(*) AS n_dims
FROM per_dim GROUP BY label ORDER BY label
"""


QUERIES = {
    "cosine_topk": (q_cosine_topk, _COSINE_TOPK_SQL),
    "ann_lsh_topk": (q_ann_lsh_topk, _ANN_LSH_SQL),
    "label_centroids": (q_label_centroids, _LABEL_CENTROIDS_SQL),
}
