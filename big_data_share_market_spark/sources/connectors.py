"""Connector builders (SURVEY §2.A5-A9): Kafka source/sink, JDBC
upsert sink, console dry-run sink.

No Kafka broker or Postgres exists in the test container, so these
return configured (but unstarted) readers/writers; tests assert the
configuration shape and exercise the JDBC-upsert semantics through its
`foreachBatch` function against Parquet. The builders mirror the
reference exactly:

- Kafka source: `flink_processor/flink_processor.py:52-74` — earliest
  offsets, JSON decode, parse-error tolerance.
- Kafka sink:   `kafka_producer/yahoo_finance_producer.py:90-119` —
  keyed JSON envelope per topic.
- JDBC upsert:  `flink_processor/flink_processor.py:77-91` +
  `postgres/init.sql:12` — composite PK (symbol, datetime),
  last-write-wins.
- console dry-run: `flink_processor/flink_processor.py:6,19-24`.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import DataStreamReader, DataStreamWriter

from .json_io import decode_envelope, encode_envelope


def kafka_stream_reader(spark: SparkSession, bootstrap: str,
                        topics: str,
                        starting_offsets: str = "earliest") -> DataStreamReader:
    """Configured Kafka stream reader (A6). `earliest` replicates
    `'scan.startup.mode' = 'earliest-offset'`
    (`flink_processor/flink_processor.py:70`). Call `.load()` when a
    broker exists; pipe through :func:`decode_stream` for typed rows."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        # At-least-once replay tolerance (SURVEY §2.G4): the upsert
        # sink dedups, so failing on data loss is unnecessary.
        .option("failOnDataLoss", "false")
    )


def decode_stream(raw: DataFrame, schema: T.StructType | str) -> DataFrame:
    """Kafka (key, value-bytes) → typed rows, malformed dropped (A6)."""
    return decode_envelope(raw, schema, value_col="value")


def kafka_stream_writer(df: DataFrame, bootstrap: str, topic: str,
                        key_col: str, checkpoint: str) -> DataStreamWriter:
    """Keyed JSON envelope → Kafka topic (A5). Exactly the producer's
    message shape: key=symbol, value=json record
    (`kafka_producer/yahoo_finance_producer.py:107-116`)."""
    return (
        encode_envelope(df, key_col=key_col)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )


def console_writer(df: DataFrame, identifier: str = "dry_run") -> DataStreamWriter:
    """A8 dry-run print sink (`flink_processor/flink_processor.py:19-24`)."""
    return df.writeStream.format("console").queryName(identifier)


# ---------------------------------------------------------------------------
# A7: JDBC upsert sink via foreachBatch (last-write-wins on a key)

def upsert_batch_fn(keys: list[str],
                    write: Callable[[DataFrame], None],
                    order_col: str | None = None) -> Callable[[DataFrame, int], None]:
    """Build a `foreachBatch` function that collapses each micro-batch
    to one row per key (last-write-wins, G3) before handing it to
    `write` — the idempotent-sink half of the reference's PK upsert
    (`flink_processor/flink_processor.py:89`, `postgres/init.sql:12`).

    `write` is the storage adapter: JDBC `INSERT ... ON CONFLICT` in
    production, Delta `MERGE`, or a Parquet last-write-wins rewrite in
    tests (see streaming/upsert.py). Dedup inside the batch keeps the
    per-key write idempotent under producer replay (G4: the reference
    re-sends the full day every 60 s).
    """
    from pyspark.sql import Window as W

    def fn(batch: DataFrame, _batch_id: int) -> None:
        if order_col is not None:
            w = W.partitionBy(*keys).orderBy(F.desc(order_col))
            deduped = (batch.withColumn("_rn", F.row_number().over(w))
                       .filter(F.col("_rn") == 1).drop("_rn"))
        else:
            deduped = batch.dropDuplicates(keys)
        write(deduped)

    return fn


def jdbc_upsert_sql(table: str, columns: list[str], keys: list[str]) -> str:
    """The `INSERT ... ON CONFLICT DO UPDATE` statement a JDBC writer
    executes per row/batch — PK semantics of `postgres/init.sql:12`."""
    collist = ", ".join(columns)
    placeholders = ", ".join(["?"] * len(columns))
    keylist = ", ".join(keys)
    updates = ", ".join(f"{c} = EXCLUDED.{c}" for c in columns
                        if c not in keys)
    return (f"INSERT INTO {table} ({collist}) VALUES ({placeholders}) "
            f"ON CONFLICT ({keylist}) DO UPDATE SET {updates}")
