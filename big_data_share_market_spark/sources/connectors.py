"""Connector builders (SURVEY §2.A5-A9): Kafka source/sink, JDBC
upsert sink, console dry-run sink.

No Kafka broker exists in the test container, so the Kafka builders
return configured (but unstarted) readers/writers and tests pin the
configuration contract. The JDBC upsert path DOES run end-to-end:
Spark ships embedded Derby, and `tests/test_connectors.py` replays
the event stream through `jdbc_merge_write` (distributed staging
write + one MERGE INTO a composite-PK table) and verifies
idempotence. The builders mirror the reference exactly:

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


#: A6 source options, mirroring `'scan.startup.mode' =
#: 'earliest-offset'` and json.ignore-parse-errors
#: (`flink_processor/flink_processor.py:66-74`). `failOnDataLoss`
#: off because the upsert sink dedups under at-least-once replay
#: (SURVEY §2.G4). Module-level so tests pin the contract.
KAFKA_SOURCE_OPTIONS = {
    "startingOffsets": "earliest",
    "failOnDataLoss": "false",
}


def kafka_stream_reader(spark: SparkSession, bootstrap: str,
                        topics: str,
                        starting_offsets: str | None = None) -> DataStreamReader:
    """Configured Kafka stream reader (A6). Call `.load()` when a
    broker exists; pipe through :func:`decode_stream` for typed rows."""
    opts = dict(KAFKA_SOURCE_OPTIONS)
    if starting_offsets is not None:
        opts["startingOffsets"] = starting_offsets
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topics)
        .options(**opts)
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
    if not updates:  # key-only table: nothing to update on conflict
        return (f"INSERT INTO {table} ({collist}) VALUES ({placeholders}) "
                f"ON CONFLICT ({keylist}) DO NOTHING")
    return (f"INSERT INTO {table} ({collist}) VALUES ({placeholders}) "
            f"ON CONFLICT ({keylist}) DO UPDATE SET {updates}")


def merge_upsert_sql(target: str, staging: str, columns: list[str],
                     keys: list[str]) -> str:
    """ANSI `MERGE INTO` equivalent of :func:`jdbc_upsert_sql` for
    engines without ON CONFLICT (Derby, SQL Server, Oracle). Paired
    with a distributed staging-table write this is the scalable upsert:
    executors append the micro-batch to `staging` in parallel, then ONE
    driver-side statement merges it — no per-row round-trips."""
    # Identifiers are double-quoted: Spark's JDBC writers create
    # staging columns as case-sensitive quoted names, so an unquoted
    # reference would be case-folded by the engine and not resolve.
    def q(c: str) -> str:
        return f'"{c}"'

    on = " AND ".join(f"t.{q(k)} = s.{q(k)}" for k in keys)
    updates = ", ".join(f"t.{q(c)} = s.{q(c)}" for c in columns
                        if c not in keys)
    collist = ", ".join(q(c) for c in columns)
    vals = ", ".join(f"s.{q(c)}" for c in columns)
    # Key-only table: a bare "UPDATE SET" is a syntax error; a MERGE
    # with only the NOT MATCHED branch is valid and means insert-new.
    matched = f"WHEN MATCHED THEN UPDATE SET {updates} " if updates else ""
    return (f"MERGE INTO {target} t USING {staging} s ON {on} "
            f"{matched}"
            f"WHEN NOT MATCHED THEN INSERT ({collist}) VALUES ({vals})")


def jdbc_execute(spark: SparkSession, url: str, *statements: str) -> None:
    """Run DDL/DML statements over a plain JDBC connection (py4j →
    java.sql.DriverManager) — the driver-side half of the staged-merge
    upsert. One connection, autocommitted statements, always closed."""
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)  # noqa: SLF001
    try:
        stmt = conn.createStatement()
        try:
            for sql in statements:
                stmt.execute(sql)
        finally:
            stmt.close()
    finally:
        conn.close()


def jdbc_merge_write(spark: SparkSession, url: str, target: str,
                     keys: list[str],
                     driver: str = "org.apache.derby.jdbc.EmbeddedDriver",
                     create_col_types: str | None = None):
    """Storage adapter for :func:`upsert_batch_fn` performing a REAL
    JDBC upsert (A7): distributed append of the deduped micro-batch
    into a staging table, then one MERGE INTO the PK'd target —
    `flink_processor/flink_processor.py:77-91` semantics. The staging
    write scales with executors; the merge is one statement regardless
    of batch size, so nothing is ever collected to the driver."""
    def write(deduped: DataFrame) -> None:
        # Unique staging table per batch: a fixed name would let two
        # concurrent writers on the same target (live stream +
        # backfill) truncate each other's staging rows between write
        # and MERGE — silently merging the wrong batch.
        import uuid
        staging = f"{target}_stg_{uuid.uuid4().hex[:8]}"
        w = (deduped.write.format("jdbc")
             .option("url", url).option("dbtable", staging)
             .option("driver", driver))
        if create_col_types:
            # e.g. "event_type VARCHAR(32), props VARCHAR(4000)" —
            # Derby's default StringType mapping is CLOB, which its
            # MERGE cannot copy; bounded VARCHAR staging avoids that.
            w = w.option("createTableColumnTypes", create_col_types)
        w.mode("overwrite").save()
        try:
            jdbc_execute(
                spark, url,
                merge_upsert_sql(target, staging, deduped.columns, keys))
        finally:
            # Drop even when the MERGE fails — a retried micro-batch
            # would otherwise leak one orphan staging table per attempt.
            try:
                jdbc_execute(spark, url, f"DROP TABLE {staging}")
            except Exception:
                pass  # staging may not exist if the write itself failed

    return write
