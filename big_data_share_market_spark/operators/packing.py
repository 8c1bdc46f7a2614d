"""Training-sequence preparation: document chunking and token packing.

Nothing in the reference (its texts are ticker symbols); these are the
two operators that turn a cleaned corpus (operators/dedup.q_clean_corpus)
into model-ready training sequences, shaped for 100 TB:

* **chunking** — split each document into fixed-size token windows with
  overlap (the RAG / long-doc training prep). Pure array expressions
  (sequence -> slice -> explode): per-row work only, embarrassingly
  parallel, no shuffle at all until the caller aggregates.
* **packing** — pretraining packs corpora by concatenating all tokens
  and cutting every `seq_len`: each doc maps to a [tok_start, tok_end)
  span and the sequences it straddles. The global running offset is the
  only sequential dependency, and it is per-BUCKET here: docs are
  sharded by a deterministic key (doc_id % n_buckets), offsets are a
  window cumsum within the bucket — one shuffle, each bucket an
  independent token stream. At 100 TB you raise n_buckets; no stage is
  global.

Tokenization contract shared with text.py: lower, squeeze \\s+, split
on ' '.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..tables import load_table

_CHUNK = 64        # tokens per chunk
_STRIDE = 48       # overlap = _CHUNK - _STRIDE = 16 tokens
_SEQ_LEN = 2048    # packed sequence length
_BUCKETS = 8       # independent token streams


def _tokens(col):
    return F.split(F.regexp_replace(F.lower(col), r"\s+", " "), " ")


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunks (64 tokens, stride 48): chunk i
    covers tokens [i*48, i*48+64). Emits (doc_id, chunk_id, n_tokens,
    chunk_text); the final partial window is kept iff non-empty.
    n_chunks = ceil(max(n-CHUNK+STRIDE, 1) / STRIDE) via integer
    arithmetic shared with the oracle."""
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select("doc_id", _tokens(F.col("text")).alias("toks"))
    n_chunks = F.expr(
        f"greatest(1, cast(ceil((size(toks) - {_CHUNK}) / {_STRIDE}) as int)"
        " + 1)")
    chunks = F.expr(
        f"transform(sequence(0, greatest(1, cast(ceil((size(toks) - {_CHUNK})"
        f" / {_STRIDE}) as int) + 1) - 1),"
        f" i -> struct(i AS chunk_id,"
        f" slice(toks, i * {_STRIDE} + 1, {_CHUNK}) AS ctoks))")
    return (
        toked.withColumn("n_chunks", n_chunks)
        .select("doc_id", F.explode_outer(chunks).alias("c"))
        .filter(F.col("c").isNotNull())
        .select("doc_id", F.col("c.chunk_id").alias("chunk_id"),
                F.size("c.ctoks").alias("n_tokens"),
                F.array_join("c.ctoks", " ").alias("chunk_text"))
        .filter(F.col("n_tokens") > 0)
        .orderBy("doc_id", "chunk_id")
    )


_CHUNK_SQL = rf"""
WITH toked AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' ')
           AS toks
  FROM documents),
chunked AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, greatest(1, CAST(ceil((len(toks) - {_CHUNK})
                                          / {_STRIDE}) AS INT) + 1)),
           i -> struct_pack(chunk_id := i,
                            ctoks := toks[i * {_STRIDE} + 1
                                          : i * {_STRIDE} + {_CHUNK}])))
           AS c
  FROM toked)
SELECT doc_id, c.chunk_id AS chunk_id, len(c.ctoks) AS n_tokens,
       array_to_string(c.ctoks, ' ') AS chunk_text
FROM chunked
WHERE len(c.ctoks) > 0
ORDER BY doc_id, chunk_id
"""


def q_pack_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-cut packing bookkeeping: within each of 8 buckets
    (doc_id % 8), documents concatenate in doc_id order into one token
    stream cut every 2048 tokens. Each doc's [tok_start, tok_end) span
    and the first/last sequence it lands in are window cumsums — one
    shuffle on the bucket key, sequences materialize later by joining
    spans to sequence ids (not needed for the bookkeeping contract)."""
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", (F.col("doc_id") % _BUCKETS).alias("bucket"),
        F.size(_tokens(F.col("text"))).alias("n_tokens"))
    w = (W.partitionBy("bucket").orderBy("doc_id")
         .rowsBetween(W.unboundedPreceding, W.currentRow))
    spans = toked.withColumn("tok_end", F.sum("n_tokens").over(w)) \
                 .withColumn("tok_start", F.col("tok_end") - F.col("n_tokens"))
    return (spans.select(
        "doc_id", "bucket", "n_tokens", "tok_start", "tok_end",
        F.floor(F.col("tok_start") / _SEQ_LEN).alias("first_seq"),
        F.floor((F.col("tok_end") - 1) / _SEQ_LEN).alias("last_seq"))
        .orderBy("doc_id"))


_PACK_SQL = rf"""
WITH toked AS (
  SELECT doc_id, doc_id % {_BUCKETS} AS bucket,
         len(string_split(regexp_replace(lower(text), '\s+', ' ', 'g'), ' '))
           AS n_tokens
  FROM documents),
spans AS (
  SELECT *, CAST(SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS tok_end
  FROM toked)
SELECT doc_id, bucket, n_tokens, tok_end - n_tokens AS tok_start, tok_end,
       CAST(floor((tok_end - n_tokens) / {_SEQ_LEN}) AS BIGINT) AS first_seq,
       CAST(floor((tok_end - 1) / {_SEQ_LEN}) AS BIGINT) AS last_seq
FROM spans ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# Composed pipeline: cleaned corpus -> train split -> chunks
# ---------------------------------------------------------------------------

def training_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data pipeline as ONE declarative plan:

      quality gate -> exact dedup -> near-dup removal   (clean_corpus)
      -> deterministic train-split assignment           (hash_split)
      -> overlapping token-window chunks                (chunk_documents)

    emitting (doc_id, chunk_id, n_tokens, chunk_md5) for every chunk
    of every train-split document that survived cleaning. Catalyst
    sees the whole composition: the split predicate and the cleaning
    anti-joins all land before the chunk fan-out, so the expensive
    explode runs only on kept train docs. Each stage is the
    oracle-checked operator it reuses — the composition adds no new
    semantics, just the plan.

    UNORDERED on purpose: this is the frame a production write
    consumes (`write_training_shards` — partitionBy sharding needs no
    global sort; see tools/composed_pipeline_probe.py for the
    end-to-end sf10 probe). The registry query below adds the
    deterministic ORDER BY the oracle compare wants."""
    from .dedup import q_clean_corpus
    from .sampling import _TRAIN_LT, hash256

    kept = q_clean_corpus(spark, sf_dir).select("doc_id")
    train = kept.filter(hash256(F.col("doc_id"), "split:") < _TRAIN_LT)
    docs = load_table(spark, sf_dir, "documents").join(train, "doc_id")
    toked = docs.select("doc_id", _tokens(F.col("text")).alias("toks"))
    chunks = F.expr(
        f"transform(sequence(0, greatest(1, cast(ceil((size(toks) - {_CHUNK})"
        f" / {_STRIDE}) as int) + 1) - 1),"
        f" i -> struct(i AS chunk_id,"
        f" slice(toks, i * {_STRIDE} + 1, {_CHUNK}) AS ctoks))")
    return (
        toked.select("doc_id", F.explode_outer(chunks).alias("c"))
        .filter(F.col("c").isNotNull())
        .select("doc_id", F.col("c.chunk_id").alias("chunk_id"),
                F.size("c.ctoks").alias("n_tokens"),
                F.md5(F.array_join("c.ctoks", " ")).alias("chunk_md5"))
        .filter(F.col("n_tokens") > 0)
    )


def q_corpus_to_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry form of :func:`training_chunks` with the deterministic
    sort the DuckDB value compare expects."""
    return training_chunks(spark, sf_dir).orderBy("doc_id", "chunk_id")


def _training_set_sql() -> str:
    from .dedup import _CLEAN_CTES, _MINHASH_CTES
    from .sampling import _TRAIN_LT, hash256_sql

    return rf"""
WITH {_MINHASH_CTES},
{_CLEAN_CTES.strip()},
train AS (
  SELECT doc_id FROM kept
  WHERE {hash256_sql('doc_id', 'split:')} < {_TRAIN_LT}),
toked AS (
  SELECT d.doc_id,
         string_split(regexp_replace(lower(d.text), '\s+', ' ', 'g'), ' ')
           AS toks
  FROM documents d JOIN train USING (doc_id)),
chunked AS (
  SELECT doc_id,
         unnest(list_transform(
           range(0, greatest(1, CAST(ceil((len(toks) - {_CHUNK})
                                          / {_STRIDE}) AS INT) + 1)),
           i -> struct_pack(chunk_id := i,
                            ctoks := toks[i * {_STRIDE} + 1
                                          : i * {_STRIDE} + {_CHUNK}])))
           AS c
  FROM toked)
SELECT doc_id, c.chunk_id AS chunk_id, len(c.ctoks) AS n_tokens,
       md5(array_to_string(c.ctoks, ' ')) AS chunk_md5
FROM chunked
WHERE len(c.ctoks) > 0
ORDER BY doc_id, chunk_id
"""


# ---------------------------------------------------------------------------
# Output sharding (the training-set writer's layout contract)
# ---------------------------------------------------------------------------

_N_SHARDS = 8
_SHARD_SALT = "shard:"


def shard_col():
    """Deterministic shard id 0.._N_SHARDS-1 per document — the same
    engine-portable md5 hash as the train/val/test split (sampling.py),
    so shard membership is stable across engines, re-runs, and cluster
    sizes, and adding documents never moves existing ones between
    shards (the property that makes incremental shard refresh O(new
    docs))."""
    from .sampling import hash256
    return hash256(F.col("doc_id"), _SHARD_SALT) % _N_SHARDS


def q_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest of the sharded training-set write: per shard, the doc
    count, total token count, and doc-id range — what a downstream
    trainer's data loader reads instead of listing files.

    Scale shape: shard assignment is row-local (no shuffle); the
    manifest is one _N_SHARDS-row aggregate. The write itself
    (`write_training_shards`) uses `partitionBy("shard")` +
    `maxRecordsPerFile`, so each shard is a directory of bounded
    files writable in parallel by every executor — no
    single-writer funnel, no repartition(1)."""
    docs = load_table(spark, sf_dir, "documents")
    return (docs
            .select("doc_id", shard_col().alias("shard"),
                    F.size(_tokens(F.col("text"))).alias("n_tokens"))
            .groupBy("shard")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_tokens").alias("shard_tokens"),
                 F.min("doc_id").alias("min_doc"),
                 F.max("doc_id").alias("max_doc"))
            .orderBy("shard"))


def _shard_manifest_sql() -> str:
    from .sampling import hash256_sql
    h = hash256_sql("doc_id", _SHARD_SALT)
    return f"""
WITH s AS (
  SELECT doc_id, {h} % {_N_SHARDS} AS shard,
         len(string_split(regexp_replace(lower(text), '\\s+', ' ', 'g'), ' '))
           AS n_tokens
  FROM documents)
SELECT shard, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
       MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
FROM s GROUP BY shard ORDER BY shard
"""


def write_training_shards(df: DataFrame, path: str,
                          max_records_per_file: int = 10_000) -> None:
    """Write a training set as hash-sharded parquet:
    `path/shard=K/part-*.parquet` with at most `max_records_per_file`
    rows per file. `partitionBy` keeps every executor writing its own
    shard files concurrently; `maxRecordsPerFile` bounds file size so
    a skewed shard still yields loader-friendly pieces. The caller's
    frame must carry `doc_id`; all its columns are preserved."""
    (df.withColumn("shard", shard_col())
       .write.mode("overwrite")
       .option("maxRecordsPerFile", str(max_records_per_file))
       .partitionBy("shard")
       .parquet(path))


QUERIES = {
    "chunk_documents": (q_chunk_documents, _CHUNK_SQL),
    "pack_tokens": (q_pack_tokens, _PACK_SQL),
    "corpus_to_training_set": (q_corpus_to_training_set, _training_set_sql()),
    "shard_manifest": (q_shard_manifest, _shard_manifest_sql()),
}
